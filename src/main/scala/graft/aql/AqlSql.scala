package graft.aql

/** Lowers a parsed AQL [[Aql.Query]] to ANSI SQL over the `events`
  * parquet table — the DIFFERENTIAL-ORACLE path (VERDICT r8 #4): the
  * same AST the DataFrame lowering ([[Aql.run]]) consumes renders to SQL
  * that DuckDB (the harness oracle) and Spark SQL both execute, so
  * fuzz-generated queries can be hash-compared across engines exactly
  * like the 91 registry oracle queries. Two dialects differ only in
  * function spellings (JSON extraction, array literals, string cast);
  * the SEMANTICS mirrored here are the lowering's own:
  *
  *  - the tagged view: a CTE deriving `ts_us` (the §7.4.1 µs convention)
  *    and the tag SET exactly as [[graft.operators.Filters.withTags]];
  *  - JSON paths string-typed, cast to numeric only where the
  *    surrounding expression forces it (same rules as `Aql.lower`);
  *  - `??` → COALESCE with the q17 cast convention;
  *  - backtick templates → null-propagating `||` concatenation (Spark's
  *    `concat` and DuckDB's `||` both null out the whole string);
  *  - non-aggregate results drawn from the lamport-ordered stream
  *    (ORDER BY event_id inside the derived table, so LIMIT selects the
  *    same events the DataFrame path's orderBy+limit selects);
  *  - `AGGREGATE … BY` → GROUP BY with the keys leading the output;
  *  - `subQuery` filters → IN subqueries (uncorrelated, q68's shape)
  *    and scalar-compare subqueries; `^.k = _.k` correlation conjuncts
  *    (q69's shape) render as a CORRELATED scalar subquery — the outer
  *    table is aliased `__o`, the inner `__i`, every inner column
  *    reference is `__i.`-qualified and every `^.` reference becomes
  *    `__o.`-qualified, so both engines bind the correlation the same
  *    way the DataFrame lowering's groupBy+join decorrelation does
  *    (round 10: this puts the q69 family under the differential too).
  *
  * Output columns are aliased positionally `c0…cN` — the comparison
  * renames the DataFrame side the same way, which also sidesteps
  * duplicate leaf names (`SELECT _.value, _.value` is legal AQL).
  *
  * Engine-difference notes: division by zero is NULL in DuckDB and in
  * non-ANSI Spark, so the differential runs with
  * `spark.sql.ansi.enabled=false`; `_.ts` (raw ns) is rejected — the
  * cross-engine time view is `ts_us`, per the fixture convention.
  */
object AqlSql {
  import Aql._

  val Spark = "spark"
  val Duck = "duckdb"

  def toSql(q0: Query, dialect: String): String = {
    require(dialect == Spark || dialect == Duck, s"unknown dialect $dialect")
    // LET bindings substitute away before rendering (idempotent), so the
    // SQL differential exercises them through the same expansion run()
    // lowers — both engines see post-expansion expressions only.
    val q = Aql.expand(q0)
    val duck = dialect == Duck
    val strT = if (duck) "VARCHAR" else "STRING"

    def arr(xs: Seq[String]): String =
      if (duck) xs.mkString("[", ", ", "]") else xs.mkString("array(", ", ", ")")
    def strLit(s: String): String = "'" + s.replace("'", "''") + "'"
    // `pre` is the table-alias qualifier for column references: "" in the
    // outer query (single table in scope), "__i." inside a subquery body
    // — where a bare name would capture the INNER table, so outer (`^.`)
    // references must spell `__o.` explicitly (the outer FROM is always
    // aliased `__o` for exactly this reason)
    def contains(t: String, pre: String): String =
      if (duck) s"list_contains(${pre}tags, ${strLit(t)})"
      else s"array_contains(${pre}tags, ${strLit(t)})"
    def jsonCol(parts: Seq[String], pre: String): String = {
      val path = "$." + parts.mkString(".")
      if (duck) s"json_extract_string(${pre}props, '$path')"
      else s"get_json_object(${pre}props, '$path')"
    }

    val cte = {
      val tsUs = if (duck) "epoch_us(ts)" else "ts div 1000"
      s"WITH tagged AS (SELECT *, $tsUs AS ts_us, " +
        s"CASE WHEN value > 100 THEN ${arr(Seq("event_type", "'all'", "'big'"))} " +
        s"ELSE ${arr(Seq("event_type", "'all'"))} END AS tags FROM events)"
    }

    def tagSql(t: TagExpr, pre: String): String = t match {
      case AllEvents => contains("all", pre)
      case Tag(n) => contains(n, pre)
      case TagAnd(l, r) => s"(${tagSql(l, pre)} AND ${tagSql(r, pre)})"
      case TagOr(l, r) => s"(${tagSql(l, pre)} OR ${tagSql(r, pre)})"
      // from()/to() bounds render against the cross-engine µs view with
      // the same ns→µs ceiling the DataFrame lowering applies
      // (ts_ns ≥ ns ⟺ ts_us ≥ ⌈ns/1000⌉ on µs-granularity data)
      case TagFrom(ns) => s"(${pre}ts_us >= ${Math.floorDiv(ns + 999L, 1000L)})"
      case TagTo(ns) => s"(${pre}ts_us < ${Math.floorDiv(ns + 999L, 1000L)})"
    }

    def scalarPath(parts: Seq[String], pre: String): String = {
      require(parts.head != "ts" && parts.head != "tags",
        s"AQL→SQL: '${parts.head}' has no cross-engine scalar view " +
          "(use ts_us for time; tag tests belong in FROM)")
      pre + parts.mkString(".")
    }

    def sqlE(e: Expr, pre: String): String = e match {
      case Named(_, x) => sqlE(x, pre) // output aliasing is positional
      case Path(Nil) => "1" // bare `_` only appears inside COUNT(_)
      case Path(parts) if envelope.contains(parts.head) =>
        scalarPath(parts, pre)
      case Path(parts) => jsonCol(parts, pre)
      // `^.` binds the ENCLOSING query's row: only meaningful inside a
      // subquery body (pre = "__i."), where it qualifies against the
      // outer alias instead — the same scoping Aql.run's correlation
      // partition enforces
      case OuterPath(parts) =>
        require(pre == "__i.",
          "AQL→SQL: '^.field' is only meaningful inside subQuery(…)")
        if (parts.nonEmpty && envelope.contains(parts.head))
          scalarPath(parts, "__o.")
        else jsonCol(parts, "__o.")
      case NumLit(v, true) => v.toLong.toString
      case NumLit(v, false) => v.toString
      case StrLit(s) => strLit(s)
      case BoolLit(b) => if (b) "TRUE" else "FALSE"
      case Un("!", x) => s"(NOT ${sqlE(x, pre)})"
      case Un("-", x) => s"(- ${sqlE(x, pre)})"
      case Case(arms) =>
        arms.map { case (p, v) => s"WHEN ${sqlE(p, pre)} THEN ${sqlE(v, pre)}" }
          .mkString("CASE ", " ", " END")
      case Interp(parts, holes) =>
        // null-propagating concatenation, like the lowering's concat()
        val pieces = parts.map(strLit).zipAll(
          holes.map(h => s"CAST(${sqlE(h, pre)} AS $strT)"), "''", "''")
          .flatMap { case (p, h) => Seq(p, h) }
        pieces.mkString("(", " || ", ")")
      case Bin("??", l, r) =>
        val lc = (l, r) match {
          case (p, NumLit(_, true)) if isJsonPath(p) =>
            s"CAST(${sqlE(p, pre)} AS INTEGER)"
          case (p, NumLit(_, false)) if isJsonPath(p) =>
            s"CAST(${sqlE(p, pre)} AS DOUBLE)"
          case _ => sqlE(l, pre)
        }
        s"COALESCE($lc, ${sqlE(r, pre)})"
      case Bin(op, l, r) =>
        def side(x: Expr, other: Expr): String =
          if (isJsonPath(x) && (isNumeric(other) || "+-*/".contains(op)))
            s"CAST(${sqlE(x, pre)} AS DOUBLE)"
          else sqlE(x, pre)
        val (lc, rc) = (side(l, r), side(r, l))
        val sqlOp = op match {
          case "&" => "AND"
          case "|" => "OR"
          case "=" => "="
          case "!=" => "<>"
          case ">" | ">=" | "<" | "<=" | "+" | "-" | "*" | "/" => op
          case other =>
            throw new IllegalArgumentException(s"AQL→SQL: bad operator '$other'")
        }
        s"($lc $sqlOp $rc)"
      case Call(_, _) =>
        throw new IllegalArgumentException(
          "AQL→SQL: aggregate calls are only valid in AGGREGATE")
      case SubQuery(_) =>
        throw new IllegalArgumentException(
          "AQL→SQL: subQuery only as a FILTER conjunct")
      case Un(op, _) =>
        throw new IllegalArgumentException(s"AQL→SQL: bad unary '$op'")
    }

    def aggSql(c: Call, pre: String): String = {
      require(!c.args.exists(isJsonPath),
        "AQL→SQL: aggregates over JSON paths are outside the differential subset")
      c.fn match {
        case "COUNT" => s"COUNT(${c.args.headOption.map(sqlE(_, pre)).getOrElse("1")})"
        case "SUM" | "MIN" | "MAX" | "AVG" => s"${c.fn}(${sqlE(c.args.head, pre)})"
        case other =>
          throw new IllegalArgumentException(s"AQL→SQL: unknown aggregate '$other'")
      }
    }

    /** One inner query body (shared by IN / scalar subqueries). With
      * pre = "__i." the correlation conjuncts `^.k = _.k` render
      * directly as `__o.k = __i.k` through sqlE — SQL needs no
      * decorrelation split, the qualified names ARE the correlation.
      */
    def subWhere(sq: Query, pre: String): String = {
      val fs = sq.filter.map(conjuncts).getOrElse(Nil)
      require(!fs.exists(hasSub), "AQL→SQL: nested subQuery is out of scope")
      (tagSql(sq.from, pre) +: fs.map(sqlE(_, pre))).mkString("(", ") AND (", ")")
    }

    def conjSql(e: Expr): String = e match {
      case Bin("IN", lhs, SubQuery(sq)) =>
        require(sq.aggregate.isEmpty && sq.select.size == 1,
          "AQL→SQL: IN subQuery needs exactly one SELECT column")
        val inner = sq.limit match {
          case Some(n) =>
            s"SELECT ${sqlE(sq.select.head, "")} FROM (SELECT * FROM tagged " +
              s"WHERE ${subWhere(sq, "")} ORDER BY event_id LIMIT $n) __sub"
          case None =>
            s"SELECT ${sqlE(sq.select.head, "")} FROM tagged WHERE ${subWhere(sq, "")}"
        }
        s"${sqlE(lhs, "")} IN ($inner)"
      case Bin(op, lhs, SubQuery(sq)) if cmpOps(op) =>
        require(sq.aggregate.size == 1 && sq.select.isEmpty && sq.limit.isEmpty
            && sq.by.isEmpty,
          "AQL→SQL: a compared subQuery must be a single AGGREGATE " +
            "(correlation via ^.k conjuncts)")
        val agg = sq.aggregate.head match {
          case c: Call => aggSql(c, "__i.")
          case other =>
            throw new IllegalArgumentException(s"AQL→SQL: AGGREGATE expects calls, got $other")
        }
        val lhsSql =
          if (isJsonPath(lhs)) s"CAST(${sqlE(lhs, "")} AS DOUBLE)" else sqlE(lhs, "")
        val sqlOp = if (op == "!=") "<>" else op
        s"($lhsSql $sqlOp (SELECT $agg FROM tagged __i WHERE ${subWhere(sq, "__i.")}))"
      case x if hasSub(x) =>
        throw new IllegalArgumentException(
          "AQL→SQL: subQuery must be a top-level FILTER conjunct")
      case x => sqlE(x, "")
    }

    val where =
      (tagSql(q.from, "") +: q.filter.map(conjuncts).getOrElse(Nil).map(conjSql))
        .mkString("(", ") AND (", ")")

    // the outer table is ALWAYS aliased __o so correlated subqueries can
    // name its columns unambiguously; outer-scope references stay bare
    // (one table in scope) and resolve to __o
    if (q.aggregate.nonEmpty) {
      val keySqls = q.by.map(sqlE(_, ""))
      val aggSqls = q.aggregate.map {
        case c: Call => aggSql(c, "")
        case other =>
          throw new IllegalArgumentException(s"AQL→SQL: AGGREGATE expects calls, got $other")
      }
      val items = (keySqls ++ aggSqls).zipWithIndex
        .map { case (s, i) => s"$s AS c$i" }.mkString(", ")
      val grouped =
        if (q.by.isEmpty) s"SELECT $items FROM tagged __o WHERE $where"
        else s"SELECT $items FROM tagged __o WHERE $where" +
          s" GROUP BY ${(1 to q.by.size).mkString(", ")}" +
          // NULLS FIRST pins Spark's ASC default so both dialects agree
          s" ORDER BY ${(1 to q.by.size).map(i => s"$i ASC NULLS FIRST").mkString(", ")}"
      cte + " " + grouped + q.limit.map(n => s" LIMIT $n").getOrElse("")
    } else {
      // lamport order decides LIMIT membership, exactly like run()'s
      // orderBy("event_id") before the projection
      val inner = s"SELECT * FROM tagged __o WHERE $where" +
        q.limit.map(n => s" ORDER BY event_id LIMIT $n").getOrElse("")
      val items =
        if (q.select.nonEmpty) q.select.zipWithIndex
          .map { case (e, i) => s"${sqlE(e, "")} AS c$i" }
        else
          // the envelope minus ts (no cross-engine scalar view) and tags
          Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")
            .zipWithIndex.map { case (n, i) => s"$n AS c$i" }
      s"$cte SELECT ${items.mkString(", ")} FROM ($inner) __t"
    }
  }
}
