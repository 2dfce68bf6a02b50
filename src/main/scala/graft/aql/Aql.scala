package graft.aql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Filters

/** Minimal AQL front-end (SURVEY §0.1): the reference's query language is
  * AQL — `FROM <tag-expr> [FILTER e] [SELECT e,…] [AGGREGATE a,…]` — and
  * this parses that subset and lowers it onto the same DataFrame plans the
  * q1x/q2x/q40 builders produce. The parser is a plain recursive-descent
  * over a regex tokenizer (no parser deps); the output is a declarative
  * `DataFrame`, so Catalyst still does all pushdown/pruning — the
  * front-end adds zero execution machinery.
  *
  * Lowered semantics:
  *  - `FROM 'a' & ('b' | 'c')` → `array_contains`/boolean algebra over the
  *    derived tag-SET view ([[Filters.tagged]]); `allEvents` → the `all` tag.
  *  - `from(2024-01-08)` / `to(2024-01-15T06:00:00Z)` tag atoms → the
  *    `[from, to)` time bounds (SURVEY §2.2 q13 origin): top-level `&`
  *    conjuncts are peeled off by [[splitBounds]] and land on the RAW
  *    Parquet scan column via `Tables.eventsRange` (pushed → row-group
  *    pruning, the reference's time-range skipping); OR-nested bounds stay
  *    per-row predicates.
  *  - `_.field` → envelope column when `field` is one of the envelope
  *    names; otherwise a JSON payload path `props.$.field` (schema-on-read,
  *    string-typed until context forces a numeric cast).
  *  - `e1 ?? e2` → `coalesce` (AQL's alternative/null-fallback operator);
  *    a JSON path coalesced with an integer literal is cast to int first,
  *    mirroring q17's convention.
  *  - `FILTER` → `.filter`; `SELECT` → `.select` (columns named by path
  *    leaf); `AGGREGATE` → global `.agg` with `SUM/MIN/MAX/AVG/COUNT`.
  *  - `AGGREGATE … BY k1, k2` → `groupBy(k1, k2).agg(…)`, output ordered
  *    by the group keys (q41's shape). An EXTENSION: the reference's AQL
  *    aggregates globally only — `BY` exists because the grouped form is
  *    the first thing every analytics user reaches for; group keys lower
  *    through the same Path rules (JSON payload paths included).
  *  - `CASE p => e … ENDCASE` → chained `when()` (no match → NULL; write
  *    `CASE TRUE => e` for a default arm).
  *  - `` `a {e} b` `` backtick templates → `concat` of literal parts and
  *    string-cast holes (q25's convention).
  *  - `LET x := e` (zero or more, after FROM) → named bindings usable in
  *    FILTER/SELECT/AGGREGATE/BY and inside subQuery bodies (inner LETs
  *    shadow outer ones); a binding is pure sugar — [[expand]] inlines
  *    it before lowering, so both the DataFrame and the SQL paths share
  *    one semantics, and `SELECT x` names its column `x` (late-2.x AQL's
  *    named-binding surface, reconstructed; the reference's LET also
  *    covered sub-query results, which here stay FILTER-side subQuery).
  *  - `LIMIT n` → `.limit(n)` over the lamport-ordered stream (plans as
  *    TakeOrderedAndProject, the q00 shape).
  *  - `subQuery(…)` in FILTER → the q67–q69 decorrelated joins:
  *    `x IN subQuery(… SELECT y)` → left-semi join; `x <op> subQuery(…
  *    AGGREGATE a)` → broadcast 1-row scalar; with `^.k = _.k`
  *    correlation conjuncts → aggregate + equi-join on the keys.
  *  - Non-aggregate results come back in event-key order (`event_id` —
  *    the lamport total order), matching the reference's merge order.
  */
object Aql {

  // ---------- AST ----------
  sealed trait TagExpr
  case object AllEvents extends TagExpr
  final case class Tag(name: String) extends TagExpr
  final case class TagAnd(l: TagExpr, r: TagExpr) extends TagExpr
  final case class TagOr(l: TagExpr, r: TagExpr) extends TagExpr
  /** `from(2024-01-08[T00:00:00[.ffffff][Z]])` — inclusive lower time
    * bound, epoch-ns; a tag-expression atom like the reference's AQL
    * bounds shorthand (SURVEY §2.2 q13 origin, §3.1).
    */
  final case class TagFrom(ns: Long) extends TagExpr
  /** `to(…)` — EXCLUSIVE upper time bound (the `[from, to)` convention). */
  final case class TagTo(ns: Long) extends TagExpr

  sealed trait Expr
  final case class Path(parts: Seq[String]) extends Expr // _.a.b ; Path(Nil) = `_`
  /** A ROW-ANCHORED path — the user wrote `_.a.b`, explicitly naming
    * this row's field, vs a bare identifier (which parses as [[Path]]
    * and may resolve to a LET binding). Exists only between parse and
    * [[expand]]: expansion never substitutes a binding into a RowPath
    * (VERDICT r14 #6 — `_.k` under an outer `LET k` used to be
    * silently captured because the parser erased the `_.` anchor),
    * then rewrites it to the equivalent [[Path]], so the lowerings see
    * one path node. Same parts convention (Nil = bare `_`).
    */
  final case class RowPath(parts: Seq[String]) extends Expr
  final case class OuterPath(parts: Seq[String]) extends Expr // ^.a — enclosing query's row (subQuery correlation)
  final case class NumLit(v: Double, isInt: Boolean) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  /** CASE p1 => e1 CASE p2 => e2 … ENDCASE; no match → NULL. */
  final case class Case(arms: Seq[(Expr, Expr)]) extends Expr
  /** `lit0{e1}lit1{e2}…` backtick template; parts.size == holes.size + 1. */
  final case class Interp(parts: Seq[String], holes: Seq[Expr]) extends Expr
  final case class SubQuery(q: Query) extends Expr
  /** A LET-binding reference kept only at the TOP level of SELECT/BY
    * items after [[expand]] substitutes bindings away — so `SELECT x`
    * still names its output column `x` while lowering the bound
    * expression. Never nested inside another expression.
    */
  final case class Named(name: String, e: Expr) extends Expr

  final case class Query(from: TagExpr, filter: Option[Expr],
                         select: Seq[Expr], aggregate: Seq[Expr],
                         by: Seq[Expr] = Nil,
                         limit: Option[Int] = None,
                         lets: Seq[(String, Expr)] = Nil)

  // ---------- tokenizer ----------
  // unary minus is a parser concern (else `a - 1` lexes the `-1`), so
  // numbers are unsigned here; keywords need the \b or they'd prefix-match
  // identifiers.
  private val tokenRe =
    ("""\s*(FROM\b|FILTER\b|SELECT\b|AGGREGATE\b|BY\b|LIMIT\b|LET\b|ENDCASE\b|CASE\b|IN\b|TRUE\b|FALSE\b|allEvents\b|:=""" +
      // ISO date/time — the from()/to() bound literal. DOCUMENTED corner
      // (ADVICE r11): this alternative wins in ALL contexts, so an
      // unspaced \d{4}-\d{2}-\d{2} inside a FILTER expression (e.g.
      // `_.value > 2024-01-08`) lexes as one date atom and fails LOUDLY
      // in atomE ("bad expression atom"), never silently as arithmetic;
      // spaced subtraction (`2024 - 1 - 8`) still parses as arithmetic.
      // AqlSpec pins both sides of this trade.
      """|\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d{1,9})?Z?)?""" +
      """|'[^']*'|`[^`]*`|[A-Za-z_][A-Za-z0-9_]*|\d+\.\d+|\d+|=>|\?\?|&&|\|\||!=|>=|<=|==|[&|!=<>+\-*/().,^])""").r

  private def tokenize(s: String): List[String] = {
    var rest = s.trim
    val out = List.newBuilder[String]
    while (rest.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) => out += m.group(1); rest = rest.substring(m.end).trim
        case None => throw new IllegalArgumentException(s"AQL: cannot tokenize at: $rest")
      }
    }
    out.result()
  }

  // ---------- parser (recursive descent over a token cursor) ----------
  private final class Cursor(var ts: List[String]) {
    def peek: Option[String] = ts.headOption
    def pop(): String = ts match {
      case h :: t => ts = t; h
      case Nil => throw new IllegalArgumentException("AQL: unexpected end of input")
    }
    def eat(t: String): Unit =
      if (peek.contains(t)) pop()
      else throw new IllegalArgumentException(s"AQL: expected '$t', found ${peek.getOrElse("<end>")}")
    def accept(t: String): Boolean = if (peek.contains(t)) { pop(); true } else false
  }

  def parse(aql: String): Query = {
    val c = new Cursor(tokenize(aql))
    val q = parseBody(c)
    if (c.peek.nonEmpty)
      throw new IllegalArgumentException(s"AQL: trailing tokens: ${c.ts.mkString(" ")}")
    q
  }

  /** One FROM…LIMIT body; leaves unconsumed tokens for the caller (so a
    * `subQuery( … )` body can stop at its closing paren).
    */
  private def parseBody(c: Cursor): Query = {
    c.eat("FROM")
    val from = tagOr(c)
    // LET name := expr, zero or more, between FROM and FILTER; each
    // binding sees the earlier ones. Names must not shadow envelope
    // columns or the from()/to()/subQuery grammar atoms — a bound `value`
    // would silently capture every `_.value`-shorthand reference.
    val lets = Seq.newBuilder[(String, Expr)]
    val letNames = collection.mutable.Set.empty[String]
    while (c.accept("LET")) {
      val n = c.pop()
      if (!n.matches("[A-Za-z_][A-Za-z0-9_]*"))
        throw new IllegalArgumentException(s"AQL: LET expects a name, found '$n'")
      if (envelope.contains(n) || Set("from", "to", "subQuery").contains(n))
        throw new IllegalArgumentException(
          s"AQL: LET name '$n' shadows a built-in column or grammar atom")
      if (!letNames.add(n))
        throw new IllegalArgumentException(s"AQL: duplicate LET name '$n'")
      c.eat(":=")
      lets += n -> expr(c)
    }
    val filter = if (c.accept("FILTER")) Some(expr(c)) else None
    val select = if (c.accept("SELECT")) exprList(c) else Nil
    val aggregate = if (c.accept("AGGREGATE")) exprList(c) else Nil
    val by = if (c.accept("BY")) {
      if (aggregate.isEmpty)
        throw new IllegalArgumentException("AQL: BY requires AGGREGATE")
      exprList(c)
    } else Nil
    val limit = if (c.accept("LIMIT")) {
      val t = c.pop()
      if (!t.matches("\\d+")) throw new IllegalArgumentException(s"AQL: LIMIT expects an integer, found '$t'")
      Some(t.toInt)
    } else None
    Query(from, filter, select, aggregate, by, limit, lets.result())
  }

  /** Substitutes LET bindings away (inline expansion — a binding is
    * sugar for its expression, so BOTH lowerings get LET support from
    * this one pass; the SQL differential then covers it for free).
    * Top-level `SELECT x` / `BY x` references keep their name via
    * [[Named]]. subQuery bodies expand recursively: outer bindings are
    * visible inside, inner LETs shadow them. `^.x` (outer-row field
    * references) are COLUMN references by definition and never
    * substitute. Idempotent (the result carries no lets).
    *
    * Capture rule (r15, closing ADVICE r13 properly): JSON props are
    * open-world, so the shadow-name validation above can only reject
    * envelope columns and grammar atoms — a BARE name that matches a
    * LET in scope resolves to the BINDING (standard lexical scoping,
    * inner LETs shadowing outer), including inside subQuery bodies.
    * But a ROW-ANCHORED `_.x` reference is the row's field by the
    * user's own spelling and is NEVER captured ([[RowPath]] — before
    * r15 the parser erased the `_.` anchor, so `_.k` inside a subQuery
    * under an outer `LET k` silently became the binding; now the inner
    * reference wins, at every nesting level, without making scoping
    * depend on runtime payload shape). `^.x` similarly never
    * substitutes (outer-ROW fields by definition).
    */
  private[aql] def expand(q: Query): Query = expandWith(q, Map.empty)

  private def expandWith(q: Query, outer: Map[String, Expr]): Query = {
    val env = q.lets.foldLeft(outer) { case (e, (n, ex)) =>
      e + (n -> subst(ex, e))
    }
    def top(e: Expr): Expr = e match {
      case Path(Seq(n)) if env.contains(n) => Named(n, env(n))
      case other => subst(other, env)
    }
    Query(q.from, q.filter.map(subst(_, env)),
      q.select.map(top), q.aggregate.map(subst(_, env)),
      q.by.map(top), q.limit, Nil)
  }

  private def subst(e: Expr, env: Map[String, Expr]): Expr = e match {
    case Path(parts) if parts.nonEmpty && env.contains(parts.head) =>
      if (parts.size > 1)
        throw new IllegalArgumentException(
          s"AQL: '${parts.head}' is a LET binding, not a record " +
            s"(no .${parts(1)} access)")
      env(parts.head)
    // `_.x` is the row's field by the user's own spelling — never a
    // binding reference (r15); substitution done, drop the anchor
    case RowPath(parts) => Path(parts)
    case Bin(op, l, r) => Bin(op, subst(l, env), subst(r, env))
    case Un(op, x) => Un(op, subst(x, env))
    case Call(fn, args) => Call(fn, args.map(subst(_, env)))
    case Case(arms) =>
      Case(arms.map { case (p, v) => (subst(p, env), subst(v, env)) })
    case Interp(parts, holes) => Interp(parts, holes.map(subst(_, env)))
    case SubQuery(iq) => SubQuery(expandWith(iq, env))
    case other => other // literals, envelope/JSON paths, ^.paths
  }

  private def tagOr(c: Cursor): TagExpr = {
    var l = tagAnd(c)
    while (c.accept("|") || c.accept("||")) l = TagOr(l, tagAnd(c))
    l
  }
  private def tagAnd(c: Cursor): TagExpr = {
    var l = tagAtom(c)
    while (c.accept("&") || c.accept("&&")) l = TagAnd(l, tagAtom(c))
    l
  }
  private def tagAtom(c: Cursor): TagExpr = c.pop() match {
    case "allEvents" => AllEvents
    case "(" => val t = tagOr(c); c.eat(")"); t
    case kw @ ("from" | "to") if c.peek.contains("(") =>
      c.eat("(")
      val t = c.pop()
      c.eat(")")
      if (kw == "from") TagFrom(isoNs(t)) else TagTo(isoNs(t))
    case q if q.startsWith("'") => Tag(q.substring(1, q.length - 1))
    case other => throw new IllegalArgumentException(s"AQL: bad tag atom '$other'")
  }

  /** ISO date / datetime token → epoch-ns, UTC. A bare date is midnight;
    * trailing `Z` is optional (bounds are UTC either way, matching the
    * fixture's UTC wall-time convention — FIXTURES.md ts contract).
    */
  private def isoNs(t: String): Long = {
    val iso = """(\d{4}-\d{2}-\d{2})(?:T(\d{2}:\d{2}:\d{2}(?:\.\d{1,9})?)Z?)?""".r
    t match {
      case iso(d, null) =>
        java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli * 1000000L
      case iso(d, tm) =>
        val i = java.time.LocalDateTime.parse(s"${d}T$tm")
          .toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000000L + i.getNano
      case other =>
        throw new IllegalArgumentException(
          s"AQL: from()/to() expect an ISO date or datetime, found '$other'")
    }
  }

  /** Splits a FROM tag expression into pushable time bounds and the
    * residual tag predicate: from()/to() atoms at the TOP-LEVEL `&` chain
    * become scan bounds (max of lowers, min of uppers — `&` is
    * intersection) that [[run]] feeds to `Tables.eventsRange` for Parquet
    * row-group pruning; atoms nested under `|` stay in the residual and
    * evaluate per-row via [[lowerTag]] (an OR'd bound can't prune the
    * scan without changing semantics).
    */
  private[aql] def splitBounds(t: TagExpr): (Option[Long], Option[Long], Option[TagExpr]) = {
    def conj(t: TagExpr): Seq[TagExpr] = t match {
      case TagAnd(l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    val cs = conj(t)
    val lo = cs.collect { case TagFrom(n) => n }.reduceOption(_ max _)
    val hi = cs.collect { case TagTo(n) => n }.reduceOption(_ min _)
    val rest = cs.filterNot(x => x.isInstanceOf[TagFrom] || x.isInstanceOf[TagTo])
    (lo, hi, rest.reduceOption(TagAnd))
  }

  private def exprList(c: Cursor): Seq[Expr] = {
    val b = Seq.newBuilder[Expr]
    b += expr(c)
    while (c.accept(",")) b += expr(c)
    b.result()
  }

  // precedence: | < & < ! < comparison < ?? < +- < */ < unary/atom
  private def expr(c: Cursor): Expr = orE(c)
  private def orE(c: Cursor): Expr = {
    var l = andE(c)
    while (c.accept("|") || c.accept("||")) l = Bin("|", l, andE(c))
    l
  }
  private def andE(c: Cursor): Expr = {
    var l = notE(c)
    while (c.accept("&") || c.accept("&&")) l = Bin("&", l, notE(c))
    l
  }
  private def notE(c: Cursor): Expr =
    if (c.accept("!")) Un("!", notE(c)) else cmpE(c)
  private def cmpE(c: Cursor): Expr = {
    val l = altE(c)
    c.peek match {
      case Some(op @ ("=" | "==" | "!=" | ">" | ">=" | "<" | "<=")) =>
        c.pop(); Bin(if (op == "==") "=" else op, l, altE(c))
      case Some("IN") =>
        c.pop(); Bin("IN", l, altE(c))
      case _ => l
    }
  }
  private def altE(c: Cursor): Expr = {
    var l = addE(c)
    while (c.accept("??")) l = Bin("??", l, addE(c))
    l
  }
  private def addE(c: Cursor): Expr = {
    var l = mulE(c)
    while (c.peek.exists(t => t == "+" || t == "-")) l = Bin(c.pop(), l, mulE(c))
    l
  }
  private def mulE(c: Cursor): Expr = {
    var l = atomE(c)
    while (c.peek.exists(t => t == "*" || t == "/")) l = Bin(c.pop(), l, atomE(c))
    l
  }
  private def atomE(c: Cursor): Expr = c.pop() match {
    case "(" => val e = expr(c); c.eat(")"); e
    case "-" => atomE(c) match { // fold so `?? -1` still sees a literal
      case NumLit(v, i) => NumLit(-v, i)
      case e => Un("-", e)
    }
    case "_" =>
      val parts = Seq.newBuilder[String]
      while (c.accept(".")) parts += c.pop()
      RowPath(parts.result()) // `_.` anchors to the row; LET-proof
    case "^" => // enclosing query's row, only meaningful inside subQuery(…)
      val parts = Seq.newBuilder[String]
      while (c.accept(".")) parts += c.pop()
      val p = parts.result()
      if (p.isEmpty) throw new IllegalArgumentException("AQL: '^' needs a field (^.col)")
      OuterPath(p)
    case "TRUE" => BoolLit(true)
    case "FALSE" => BoolLit(false)
    case "CASE" =>
      val arms = Seq.newBuilder[(Expr, Expr)]
      var more = true
      while (more) {
        val cond = expr(c)
        c.eat("=>")
        arms += cond -> expr(c)
        more = c.accept("CASE")
      }
      c.eat("ENDCASE")
      Case(arms.result())
    case "subQuery" if c.peek.contains("(") =>
      c.eat("(")
      val q = parseBody(c)
      c.eat(")")
      SubQuery(q)
    case t if t.startsWith("'") => StrLit(t.substring(1, t.length - 1))
    case t if t.startsWith("`") => parseInterp(t.substring(1, t.length - 1))
    case t if t.matches("\\d+") => NumLit(t.toDouble, isInt = true)
    case t if t.matches("\\d+\\.\\d+") => NumLit(t.toDouble, isInt = false)
    case fn if c.peek.contains("(") && fn.matches("[A-Za-z][A-Za-z0-9_]*") =>
      c.eat("(")
      val args = if (c.accept(")")) Nil else { val a = exprList(c); c.eat(")"); a }
      Call(fn.toUpperCase, args)
    case t if t.matches("[A-Za-z][A-Za-z0-9_]*") =>
      // bare identifier = envelope column shorthand (AQL writes _.x; accept x)
      Path(Seq(t))
    case other => throw new IllegalArgumentException(s"AQL: bad expression atom '$other'")
  }

  /** Splits a backtick template body into literal parts and `{expr}` holes;
    * each hole is parsed with the full expression grammar.
    */
  private def parseInterp(body: String): Interp = {
    val holeRe = """\{([^{}]*)\}""".r
    val parts = Seq.newBuilder[String]
    val holes = Seq.newBuilder[Expr]
    var last = 0
    for (m <- holeRe.findAllMatchIn(body)) {
      parts += body.substring(last, m.start)
      val hc = new Cursor(tokenize(m.group(1)))
      holes += expr(hc)
      if (hc.peek.nonEmpty)
        throw new IllegalArgumentException(
          s"AQL: trailing tokens in interpolation hole: ${hc.ts.mkString(" ")}")
      last = m.end
    }
    parts += body.substring(last)
    val ps = parts.result()
    if (ps.exists(p => p.contains('{') || p.contains('}')))
      throw new IllegalArgumentException(s"AQL: unbalanced brace in template: $body")
    Interp(ps, holes.result())
  }

  // ---------- lowering ----------
  private[aql] val envelope =
    Set("event_id", "ts", "ts_us", "user_id", "event_type", "value", "props", "tags")

  private[aql] def isJsonPath(e: Expr): Boolean = e match {
    case Path(parts) => parts.nonEmpty && !envelope.contains(parts.head)
    case _ => false
  }
  private[aql] def isNumeric(e: Expr): Boolean = e match {
    case NumLit(_, _) => true
    case Bin(op, l, r) if "+-*/".contains(op) => isNumeric(l) || isNumeric(r)
    case Un("-", x) => isNumeric(x)
    case _ => false
  }

  private def lowerTag(t: TagExpr): Column = t match {
    case AllEvents => array_contains(col("tags"), "all")
    case Tag(n) => array_contains(col("tags"), n)
    case TagAnd(l, r) => lowerTag(l) && lowerTag(r)
    case TagOr(l, r) => lowerTag(l) || lowerTag(r)
    // residual (OR-nested, or sink-path) bounds: per-row predicates on the
    // normalized epoch-ns column — the pushable top-level case is peeled
    // off by splitBounds before this runs
    case TagFrom(ns) => col("ts") >= ns
    case TagTo(ns) => col("ts") < ns
  }

  /** The bounded, tagged event source every batch lowering starts from:
    * top-level from()/to() bounds land on the RAW scan column via
    * `Tables.eventsRange` (pushed to Parquet row-group pruning — the
    * reference's time-range skipping, SURVEY §4.1), the residual tag
    * predicate evaluates post-scan.
    */
  private def source(spark: SparkSession, sfDir: String, from: TagExpr): DataFrame = {
    val (lo, hi, residual) = splitBounds(from)
    val df = Filters.withTags(
      graft.sources.Tables.eventsRange(spark, sfDir, lo, hi)
        .withColumn("ts_us", graft.sources.Tables.tsUs))
    residual.map(t => df.filter(lowerTag(t))).getOrElse(df)
  }

  /** Lowers an expression; JSON payload paths are string-typed and get a
    * numeric cast only where the surrounding expression forces one
    * (comparison/arithmetic against a numeric, or `?? <int>`).
    */
  private def lower(e: Expr): Column = e match {
    case Named(_, x) => lower(x) // naming is selectName's job
    case Path(Nil) => lit(1) // bare `_` only appears inside COUNT(_)
    case Path(parts) if envelope.contains(parts.head) => col(parts.mkString("."))
    case Path(parts) => get_json_object(col("props"), "$." + parts.mkString("."))
    case NumLit(v, true) => lit(v.toLong)
    case NumLit(v, false) => lit(v)
    case StrLit(s) => lit(s)
    case BoolLit(b) => lit(b)
    case Case(arms) =>
      // chained when(); no otherwise → NULL for an unmatched row (write
      // `CASE TRUE => e` as the final arm for a default)
      arms.tail.foldLeft(when(lower(arms.head._1), lower(arms.head._2))) {
        case (w, (p, v)) => w.when(lower(p), lower(v))
      }
    case Interp(parts, holes) =>
      // template → concat of literal parts and string-cast holes; a NULL
      // hole nulls the whole string (concat semantics), like q25's concat
      val pieces = parts.map(lit(_): Column).zipAll(
        holes.map(lower(_).cast("string")), lit(""), lit(""))
        .flatMap { case (p, h) => Seq(p, h) }
      concat(pieces: _*)
    case Un("!", x) => !lower(x)
    case Un("-", x) => -lower(x)
    case Bin("??", l, r) =>
      val lc = (l, r) match {
        case (p, NumLit(_, true)) if isJsonPath(p) => lower(p).cast("int")
        case (p, NumLit(_, false)) if isJsonPath(p) => lower(p).cast("double")
        case _ => lower(l)
      }
      coalesce(lc, lower(r))
    case Bin(op, l, r) =>
      def side(x: Expr, other: Expr): Column =
        if (isJsonPath(x) && (isNumeric(other) || "+-*/".contains(op)))
          lower(x).cast("double")
        else lower(x)
      val (lc, rc) = (side(l, r), side(r, l))
      op match {
        case "&" => lc && rc
        case "|" => lc || rc
        case "=" => lc === rc
        case "!=" => lc =!= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "IN" => throw new IllegalArgumentException(
          "AQL: IN is only supported as `x IN subQuery(…)` in FILTER")
        case other => throw new IllegalArgumentException(s"AQL: bad operator '$other'")
      }
    case Call(fn, args) => lowerAgg(fn, args)
    case OuterPath(_) =>
      throw new IllegalArgumentException(
        "AQL: '^.field' (outer reference) is only meaningful inside subQuery(…)")
    case SubQuery(_) =>
      throw new IllegalArgumentException(
        "AQL: subQuery is only supported in FILTER, as `x IN subQuery(…)` " +
          "or compared against a single-AGGREGATE subQuery")
    case Un(op, _) => throw new IllegalArgumentException(s"AQL: bad unary '$op'")
  }

  private def lowerAggRaw(fn: String, args: Seq[Expr]): Column = fn match {
    case "COUNT" => count(args.headOption.map(lower).getOrElse(lit(1)))
    case "SUM" => sum(lower(args.head))
    case "MIN" => min(lower(args.head))
    case "MAX" => max(lower(args.head))
    case "AVG" => avg(lower(args.head))
    case other => throw new IllegalArgumentException(s"AQL: unknown aggregate '$other'")
  }

  private def lowerAgg(fn: String, args: Seq[Expr]): Column = {
    val name = fn.toLowerCase + (args match {
      case Seq(Path(parts)) if parts.nonEmpty => "_" + parts.last
      case _ => ""
    })
    lowerAggRaw(fn, args).as(name)
  }

  private def selectName(e: Expr, i: Int): String = e match {
    case Named(n, _) => n
    case Path(parts) if parts.nonEmpty => parts.last
    case Bin("??", Path(parts), _) if parts.nonEmpty => parts.last
    case _ => s"expr$i"
  }

  /** Lowers an AQL query's FROM + FILTER stages to one boolean `Column`
    * over a tagged event DataFrame — batch or STREAMING alike (this is
    * the subscription path: the events-to-db pipeline applies it to the
    * live stream before the sink). SELECT/AGGREGATE are rejected rather
    * than silently dropped.
    */
  /** Why from()/to() bounds are PER-ROW here but a scan prune on the
    * batch path (decided round 12, VERDICT r11 #5): the batch path scans
    * a historical lake, where a time bound prunes Parquet row groups —
    * O(selected), via `Tables.eventsRange`. A streaming micro-batch's
    * input is already bounded by SOURCE OFFSETS (the file source hands
    * each trigger only its newly-discovered files; maxFilesPerTrigger
    * caps them), so there is no historical scan to prune — a bound can
    * only ever exclude rows from the current micro-batch, and a per-row
    * predicate over rows the trigger must read anyway is the same O as
    * the read itself. The asymmetry is therefore intentional, not an
    * omission; AqlPipelineSpec runs a bounds subscription end-to-end to
    * pin the semantics match the batch lowering row-for-row.
    */
  def predicate(aql: String): Column = {
    val q = expand(parse(aql))
    require(q.select.isEmpty && q.aggregate.isEmpty && q.limit.isEmpty,
      "AQL predicate: only FROM and FILTER are allowed on the sink path " +
        "(the landed row is the flattened envelope; a stream has no LIMIT)")
    q.filter.map(f => lowerTag(q.from) && lower(f)).getOrElse(lowerTag(q.from))
  }

  /** FROM/FILTER/SELECT lowering for the SINK path over a tagged envelope
    * frame — batch or STREAMING (no ordering: stream delivery order IS
    * the order). The reference lands extracted payload fields as DB
    * columns, so SELECT is the event→row mapping here; `event_id` (the
    * MERGE key) is always carried, prepended unless selected explicitly.
    * Without SELECT the full envelope passes through. AGGREGATE is
    * rejected — a sink row is per-event.
    */
  def sinkProjection(events: DataFrame, aql: String): DataFrame = {
    val q = expand(parse(aql))
    require(q.aggregate.isEmpty, "AQL sink path: AGGREGATE is not supported")
    require(q.limit.isEmpty, "AQL sink path: a stream has no LIMIT")
    var df = events.filter(lowerTag(q.from))
    q.filter.foreach(f => df = df.filter(lower(f)))
    if (q.select.isEmpty) df.drop("tags")
    else {
      val named = q.select.zipWithIndex.map { case (e, i) => selectName(e, i) -> lower(e) }
      require(named.map(_._1).distinct.size == named.size,
        s"AQL sink path: duplicate column names in SELECT: ${named.map(_._1)}")
      val withKey =
        if (named.exists(_._1 == "event_id")) named
        else ("event_id" -> col("event_id")) +: named
      df.select(withKey.map { case (n, c) => c.as(n) }: _*)
    }
  }

  // ---------- subQuery lowering ----------
  private[aql] def conjuncts(e: Expr): Seq[Expr] = e match {
    case Bin("&", l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private[aql] def hasSub(e: Expr): Boolean = e match {
    case SubQuery(_) => true
    case Named(_, x) => hasSub(x)
    case Bin(_, l, r) => hasSub(l) || hasSub(r)
    case Un(_, x) => hasSub(x)
    case Call(_, as) => as.exists(hasSub)
    case Case(arms) => arms.exists(a => hasSub(a._1) || hasSub(a._2))
    case Interp(_, hs) => hs.exists(hasSub)
    case _ => false
  }

  private[aql] val cmpOps = Set("=", "!=", ">", ">=", "<", "<=")

  private def cmp(op: String)(l: Column, r: Column): Column = op match {
    case "=" => l === r
    case "!=" => l =!= r
    case ">" => l > r
    case ">=" => l >= r
    case "<" => l < r
    case "<=" => l <= r
  }

  /** Lowers one FILTER conjunct containing a subQuery onto the q67–q69
    * decorrelated shapes (SURVEY §2.9): `x IN subQuery(… SELECT y)` →
    * left-semi join; `x <op> subQuery(… AGGREGATE a)` → broadcast of the
    * 1-row aggregate (scalar) or aggregate + equi-join on the `^.k = _.k`
    * correlation keys (correlated). Only these shapes are accepted — the
    * reference's subQuery was a beta feature and these are its cited uses.
    */
  private def applySubFilter(spark: SparkSession, sfDir: String,
                             df: DataFrame, conj: Expr): DataFrame = conj match {
    case Bin("IN", lhs, SubQuery(sq)) =>
      require(sq.aggregate.isEmpty && sq.select.size == 1,
        "AQL: IN subQuery needs exactly one SELECT column and no AGGREGATE")
      var inner = source(spark, sfDir, sq.from)
      sq.filter.foreach(f => inner = inner.filter(lower(f)))
      // LIMIT inside an IN subQuery keeps run()'s semantics: lamport
      // (event_id) order bounds WHICH events contribute
      sq.limit.foreach(n => inner = inner.orderBy("event_id").limit(n))
      val sub = inner.select(lower(sq.select.head).as("__in"))
      df.join(sub, lower(lhs) === col("__in"), "left_semi")

    case Bin(op, lhs, SubQuery(sq)) if cmpOps(op) =>
      require(sq.aggregate.size == 1 && sq.select.isEmpty && sq.limit.isEmpty
          && sq.by.isEmpty,
        "AQL: a compared subQuery must have exactly one AGGREGATE " +
          "(and no SELECT/LIMIT/BY — grouping comes from ^.k correlation)")
      val aggRaw = sq.aggregate.head match {
        case cl: Call => lowerAggRaw(cl.fn, cl.args)
        case other => throw new IllegalArgumentException(s"AQL: AGGREGATE expects calls, got $other")
      }
      // correlation conjuncts (^.outer = _.inner) vs residual inner filter
      val (corr, residual) = sq.filter.map(conjuncts).getOrElse(Nil).partition {
        case Bin("=", OuterPath(_), _) | Bin("=", _, OuterPath(_)) => true
        case _ => false
      }
      var inner = source(spark, sfDir, sq.from)
      residual.foreach(r => inner = inner.filter(lower(r)))
      val lhsCol = if (isJsonPath(lhs)) lower(lhs).cast("double") else lower(lhs)
      if (corr.isEmpty) {
        // scalar: the 1-row aggregate broadcasts; a NULL scalar drops all
        // rows through the filter, matching SQL comparison-with-NULL
        df.crossJoin(broadcast(inner.agg(aggRaw.as("__sq"))))
          .filter(cmp(op)(lhsCol, col("__sq")))
          .drop("__sq")
      } else {
        val keys = corr.map {
          case Bin("=", OuterPath(o), i) => (o, i)
          case Bin("=", i, OuterPath(o)) => (o, i)
          case other => throw new IllegalArgumentException(s"AQL: bad correlation $other")
        }
        val grouped = inner
          .groupBy(keys.zipWithIndex.map { case ((_, ie), i) => lower(ie).as(s"__k$i") }: _*)
          .agg(aggRaw.as("__sq"))
        // outer correlation keys go through the same Path lowering as any
        // field reference (JSON payload paths included), not a bare col()
        val cond = keys.zipWithIndex
          .map { case ((o, _), i) => lower(Path(o)) === col(s"__k$i") }
          .reduce(_ && _)
        val isCount = sq.aggregate.head match {
          case Call(fn, _) => fn == "COUNT"
          case _ => false
        }
        if (isCount)
          // the classic correlated-COUNT case: an outer row with NO inner
          // group counts 0 (not NULL, not dropped) → left join + coalesce
          df.join(grouped, cond, "left")
            .filter(cmp(op)(lhsCol, coalesce(col("__sq"), lit(0L))))
            .drop("__sq" +: keys.indices.map(i => s"__k$i"): _*)
        else
          // SUM/MIN/MAX/AVG over no rows is NULL; NULL comparisons drop
          // the row in SQL, which the inner join reproduces
          df.join(grouped, cond)
            .filter(cmp(op)(lhsCol, col("__sq")))
            .drop("__sq" +: keys.indices.map(i => s"__k$i"): _*)
      }

    case other => throw new IllegalArgumentException(
      "AQL: unsupported subQuery shape (use `x IN subQuery(… SELECT y)` or " +
        s"`x <op> subQuery(… AGGREGATE a)`): $other")
  }

  /** Parses and runs an AQL query over the events table at `sfDir`. */
  def run(spark: SparkSession, sfDir: String, aql: String): DataFrame = {
    val q = expand(parse(aql))
    var df = source(spark, sfDir, q.from)
    q.filter.foreach { f =>
      // top-level conjuncts apply as successive filters so a subQuery
      // conjunct can lower to its own join without disturbing the rest
      conjuncts(f).foreach { cj =>
        df = if (hasSub(cj)) applySubFilter(spark, sfDir, df, cj)
             else df.filter(lower(cj))
      }
    }
    val out = if (q.aggregate.nonEmpty) {
      val aggs = q.aggregate.map {
        case c: Call => lowerAgg(c.fn, c.args)
        case other => throw new IllegalArgumentException(s"AQL: AGGREGATE expects calls, got $other")
      }
      if (q.by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else {
        // grouped form → groupBy.agg (q41's plan: map-side partial agg,
        // one shuffle on the group keys); output ordered BY the keys so
        // results are deterministic like every non-stream registry query
        val names = q.by.zipWithIndex.map { case (e, i) => selectName(e, i) }
        require(names.distinct.size == names.size,
          s"AQL: duplicate group-key names in BY: $names")
        val keys = q.by.zip(names).map { case (e, n) => lower(e).as(n) }
        val grouped = df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        // a group-key leaf name that equals a derived aggregate alias
        // (e.g. `AGGREGATE COUNT(_) BY _.count` → two `count` columns)
        // would make orderBy(col(name)) throw an opaque ambiguous-
        // reference error — reject it up front with the fix spelled out
        val aggNames = grouped.columns.drop(names.size).toSet
        val clash = names.filter(aggNames)
        require(clash.isEmpty,
          s"AQL: group-key name(s) ${clash.mkString(", ")} collide with an " +
            "AGGREGATE alias; ordering by them would be ambiguous — rename " +
            "the key field or the aggregate")
        grouped.orderBy(names.map(col): _*)
      }
    } else {
      // event-key order first, then project: the projection is
      // order-preserving, so results stream out in lamport order.
      df = df.orderBy("event_id")
      if (q.select.nonEmpty)
        df.select(q.select.zipWithIndex.map { case (e, i) => lower(e).as(selectName(e, i)) }: _*)
      else df.drop("tags")
    }
    // LIMIT bounds the lamport-ordered stream (orderBy+limit plans as
    // TakeOrderedAndProject — the q00 shape, no global sort)
    q.limit.fold(out)(out.limit)
  }
}
