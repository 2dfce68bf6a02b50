package graft

import org.scalacheck.Gen
import graft.aql.Aql._

/** Shared AQL fuzz machinery: well-typed-by-construction query generators
  * and the fully-parenthesized renderer, used by AqlFuzzSpec (round-trip /
  * robustness properties) and AqlOracleSpec (the cross-engine
  * differential). Deterministic via pinned seeds.
  */
object AqlGen {

  // ---------- generators (well-typed by construction) ----------
  val tagG: Gen[String] =
    Gen.oneOf("purchase", "signup", "error", "click", "big", "all")

  // from()/to() bound instants around the fixture span (2024-01-01 …):
  // whole days (rendered as bare dates) and whole seconds (datetimes) —
  // [2023-12-28, 2024-02-11) keeps bounds selective but often non-empty
  val boundNsG: Gen[Long] = for {
    day <- Gen.chooseNum(0, 45)
    secs <- Gen.frequency(2 -> Gen.const(0L), 1 -> Gen.chooseNum(0L, 86399L))
  } yield ((java.time.LocalDate.of(2023, 12, 28).toEpochDay + day) * 86400L + secs) * 1000000000L
  val boundG: Gen[TagExpr] =
    Gen.oneOf(boundNsG.map(TagFrom), boundNsG.map(TagTo))

  def tagExprG(depth: Int): Gen[TagExpr] =
    if (depth <= 0) Gen.frequency(
      4 -> tagG.map(Tag), 1 -> Gen.const(AllEvents), 1 -> boundG)
    else Gen.frequency(
      3 -> tagG.map(Tag),
      1 -> Gen.const(AllEvents),
      // bounds appear both at the top-level & chain (→ pushed scan range
      // via splitBounds) and nested under | (→ residual per-row predicate)
      1 -> boundG,
      2 -> (for { l <- tagExprG(depth - 1); r <- tagExprG(depth - 1) } yield TagAnd(l, r)),
      2 -> (for { l <- tagExprG(depth - 1); r <- tagExprG(depth - 1) } yield TagOr(l, r)))

  val numPathG: Gen[Expr] = Gen.oneOf(
    Path(Seq("value")), Path(Seq("user_id")), Path(Seq("event_id")))
  // JSON props in both spellings (r15): bare (`k` — LET-or-row
  // shorthand) and row-anchored (`_.k` / `_.x.y` — RowPath, never a
  // binding reference), so the capture rule sits under the fuzz
  val jsonPathG: Gen[Expr] = Gen.oneOf(
    Path(Seq("k")), RowPath(Seq("k")), RowPath(Seq("x", "y")))
  val numLitG: Gen[Expr] = Gen.chooseNum(-500, 500).map(n => NumLit(n.toDouble, isInt = true))

  def numExprG(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(numPathG, numLitG)
    else Gen.frequency(
      3 -> numPathG,
      2 -> numLitG,
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- numExprG(depth - 1); r <- numExprG(depth - 1)
      } yield Bin(op, l, r)),
      1 -> (for { p <- jsonPathG; f <- numLitG } yield Bin("??", p, f)))

  def boolExprG(depth: Int): Gen[Expr] =
    if (depth <= 0)
      for {
        op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
        l <- numExprG(1); r <- numExprG(1)
      } yield Bin(op, l, r)
    else Gen.frequency(
      3 -> boolExprG(0),
      1 -> (for { t <- tagG } yield Bin("=", Path(Seq("event_type")), StrLit(t))),
      2 -> (for {
        op <- Gen.oneOf("&", "|")
        l <- boolExprG(depth - 1); r <- boolExprG(depth - 1)
      } yield Bin(op, l, r)),
      1 -> boolExprG(depth - 1).map(Un("!", _)))

  val aggG: Gen[Expr] = Gen.frequency(
    3 -> Gen.oneOf("SUM", "MIN", "MAX", "AVG").flatMap(f => numPathG.map(p => Call(f, Seq(p)))),
    // aggregates over DERIVED expressions (r10 widening): both lowerings
    // accept any numeric expr as the aggregate argument, so fuzz that —
    // depth 1, envelope-only (aggSql rejects JSON paths in aggregates)
    1 -> (for {
      f <- Gen.oneOf("SUM", "MIN", "MAX", "AVG")
      op <- Gen.oneOf("+", "-", "*")
      l <- numPathG; r <- Gen.oneOf(numPathG, numLitG)
    } yield Call(f, Seq(Bin(op, l, r)))),
    1 -> Gen.const(Call("COUNT", Seq(RowPath(Nil)))))

  // CASE arms share one value type (mixed string/numeric arms would be an
  // analysis error, and the generator stays well-typed by construction)
  val templatePartG: Gen[String] = Gen.oneOf("alpha ", " beta", "x: ", "")
  val caseG: Gen[Expr] =
    Gen.oneOf(true, false).flatMap { numeric =>
      val vg: Gen[Expr] =
        if (numeric) numExprG(1)
        else Gen.oneOf("lo", "mid", "hi").map(StrLit(_))
      Gen.chooseNum(1, 3).flatMap { n =>
        Gen.listOfN(n, boolExprG(1).flatMap(p => vg.map(v => (p, v))))
          .flatMap { arms =>
            Gen.oneOf(true, false).map { dflt =>
              Case(if (dflt) arms :+ ((BoolLit(true): Expr, arms.head._2)) else arms)
            }
          }
      }
    }
  val interpG: Gen[Expr] = for {
    p0 <- templatePartG; p1 <- templatePartG; p2 <- templatePartG
    h0 <- Gen.oneOf(numPathG, jsonPathG)
    h1 <- numExprG(0)
  } yield Interp(Seq(p0, p1, p2), Seq(h0, h1))

  // subQuery filters: the three supported shapes — uncorrelated
  // scalar-compare, IN, and (r10 widening) the q69 CORRELATED
  // scalar-compare with a `^.k = _.k` conjunct (plus an optional
  // residual inner filter), now that AqlSql renders correlation
  val subFilterG: Gen[Expr] = Gen.oneOf(
    for {
      op <- Gen.oneOf(">", "<", ">=", "<=")
      lhs <- numPathG
      fn <- Gen.oneOf("AVG", "MIN", "MAX", "SUM")
      from <- tagExprG(1)
    } yield Bin(op, lhs,
      SubQuery(Query(from, None, Nil, Seq(Call(fn, Seq(Path(Seq("value")))))))),
    for {
      from <- tagExprG(1)
      f <- Gen.option(boolExprG(0))
    } yield Bin("IN", Path(Seq("user_id")),
      SubQuery(Query(from, f, Seq(Path(Seq("user_id"))), Nil))),
    for {
      op <- Gen.oneOf(">", "<", ">=", "<=")
      lhs <- numPathG
      fn <- Gen.oneOf("AVG", "MIN", "MAX", "SUM", "COUNT")
      from <- tagExprG(1)
      key <- Gen.oneOf("user_id", "event_type")
      flip <- Gen.oneOf(true, false) // both correlation spellings parse
      residual <- Gen.option(boolExprG(0))
    } yield {
      val corr: Expr =
        if (flip) Bin("=", Path(Seq(key)), OuterPath(Seq(key)))
        else Bin("=", OuterPath(Seq(key)), Path(Seq(key)))
      val filt = residual.fold(corr)(r => Bin("&", corr, r))
      val agg =
        if (fn == "COUNT") Call("COUNT", Seq(RowPath(Nil)))
        else Call(fn, Seq(Path(Seq("value"))))
      Bin(op, lhs, SubQuery(Query(from, Some(filt), Nil, Seq(agg))))
    })

  val queryG: Gen[Query] = for {
    from <- tagExprG(2)
    // LET bindings (r13): zero, one, or two — x0 is any numeric expr,
    // x1 (when present) REFERENCES x0, so chained-binding expansion is
    // under the same differential as everything else
    nLets <- Gen.frequency(3 -> Gen.const(0), 2 -> Gen.const(1),
      1 -> Gen.const(2))
    let0 <- numExprG(1)
    lets = (if (nLets >= 1) Seq("x0" -> let0) else Nil) ++
      (if (nLets >= 2)
         Seq("x1" -> (Bin("+", Path(Seq("x0")), NumLit(1, true)): Expr))
       else Nil)
    useLetFilter <- Gen.oneOf(true, false)
    letBound <- Gen.chooseNum(-200, 200)
    filter0 <- Gen.option(Gen.frequency(
      4 -> boolExprG(2),
      1 -> subFilterG,
      1 -> (for { b <- boolExprG(1); s <- subFilterG } yield Bin("&", b, s))))
    filter1 = if (lets.isEmpty || !useLetFilter) filter0
      else {
        val use: Expr =
          Bin(">", Path(Seq(lets.last._1)), NumLit(letBound.toDouble, true))
        Some(filter0.fold(use)(f => Bin("&", f, use)))
      }
    // r15 shadowing shape: under a LET, a subQuery body references the
    // SAME name both ways — `_.x0` (row-anchored → the inner rows' own
    // JSON prop, absent here → the ?? fallback) and bare `x0` (→ the
    // binding, inlined over the inner rows) — so the capture rule sits
    // under the cross-engine differential, not just a unit pin
    useShadow <- Gen.oneOf(true, false)
    shadowTag <- tagG
    shadowCut <- Gen.chooseNum(-300, 300)
    filter = if (lets.isEmpty || !useShadow) filter1
      else {
        val nm = lets.head._1
        val inner: Expr = Bin("&",
          Bin(">=", Bin("??", RowPath(Seq(nm)), NumLit(0, true)),
            NumLit(0, true)),
          Bin("<", Path(Seq(nm)), NumLit(shadowCut.toDouble, true)))
        val sub: Expr = Bin("IN", Path(Seq("user_id")),
          SubQuery(Query(Tag(shadowTag), Some(inner),
            Seq(Path(Seq("user_id"))), Nil)))
        Some(filter1.fold(sub)(f => Bin("&", f, sub)))
      }
    // r16 nested-LET-in-subQuery shape (VERDICT r15 #7): the subQuery
    // body declares its OWN binding — named to SHADOW the outer LET
    // when one exists — and the inner filter references the name both
    // bare (→ the INNER binding under lexical scoping) and row-anchored
    // `_.name` (→ the inner rows' JSON prop, never any binding). These
    // are the exact shapes the r13 LET expansion and the r15
    // row-anchoring fix (bf31e21) changed; the 120-query differential
    // now covers them structurally, not just as AqlSpec unit pins.
    useNestedLet <- Gen.oneOf(true, false)
    nestedTag <- tagG
    nestedCut <- Gen.chooseNum(-300, 300)
    nestedBody <- numExprG(1)
    filterN = if (!useNestedLet) filter
      else {
        val nm = if (lets.nonEmpty) lets.head._1 else "x0"
        val innerFilter: Expr = Bin("&",
          Bin("<", Path(Seq(nm)), NumLit(nestedCut.toDouble, true)),
          Bin(">=", Bin("??", RowPath(Seq(nm)), NumLit(0, true)),
            NumLit(0, true)))
        val innerQ = Query(Tag(nestedTag), Some(innerFilter),
          Seq(Path(Seq("user_id"))), Nil, Nil, None,
          Seq(nm -> nestedBody))
        val sub: Expr = Bin("IN", Path(Seq("user_id")), SubQuery(innerQ))
        Some(filter.fold(sub)(f => Bin("&", f, sub)))
      }
    n <- Gen.chooseNum(0, 3)
    sels0 <- Gen.listOfN(n, Gen.frequency(
      3 -> numExprG(1), 2 -> jsonPathG, 1 -> caseG, 1 -> interpG))
    useLetSel <- Gen.oneOf(true, false)
    m <- Gen.chooseNum(0, 2)
    aggs <- if (sels0.nonEmpty) Gen.const(Nil) else Gen.listOfN(m, aggG)
    // `SELECT x0` exercises the Named-preserving top-level reference
    // (only on the select path: aggregates reject derived JSON casts)
    sels = if (lets.isEmpty || !useLetSel || aggs.nonEmpty) sels0
      else sels0 :+ (Path(Seq(lets.head._1)): Expr)
    // BY only with AGGREGATE (parse rule); keys drawn name-distinct
    by <- if (aggs.isEmpty) Gen.const(Nil: List[Expr])
          else Gen.someOf(Path(Seq("event_type")), Path(Seq("user_id")))
            .map(_.toList: List[Expr])
    lim <- Gen.option(Gen.chooseNum(1, 500))
  } yield Query(from, filterN, sels, aggs, by, lim, lets)

  // ---------- renderer (fully parenthesized → unambiguous) ----------
  private val isoFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private def renderIso(ns: Long): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L).toInt,
      java.time.ZoneOffset.UTC)
    if (ldt.toLocalTime == java.time.LocalTime.MIDNIGHT) ldt.toLocalDate.toString
    else ldt.format(isoFmt) + "Z"
  }
  def renderTag(t: TagExpr): String = t match {
    case AllEvents => "allEvents"
    case Tag(n) => s"'$n'"
    case TagAnd(l, r) => s"(${renderTag(l)} & ${renderTag(r)})"
    case TagOr(l, r) => s"(${renderTag(l)} | ${renderTag(r)})"
    case TagFrom(ns) => s"from(${renderIso(ns)})"
    case TagTo(ns) => s"to(${renderIso(ns)})"
  }
  def render(e: Expr): String = e match {
    // mirrors the parser (r15): a bare identifier is the LET-or-row
    // shorthand and round-trips to Path; `_.`-anchored spellings
    // round-trip to RowPath (multi-part Paths have no bare spelling,
    // so they render anchored — the generator never emits them)
    case Path(Nil) => "_"
    case Path(Seq(n)) => n
    case Path(parts) => "_." + parts.mkString(".")
    case RowPath(Nil) => "_"
    case RowPath(parts) => "_." + parts.mkString(".")
    case OuterPath(parts) => "^." + parts.mkString(".")
    case NumLit(v, true) => v.toLong.toString
    case NumLit(v, false) => v.toString
    case StrLit(s) => s"'$s'"
    case BoolLit(b) => if (b) "TRUE" else "FALSE"
    case Un(op, x) => s"$op(${render(x)})"
    case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case Call(f, Nil) => s"$f()"
    case Call(f, args) => s"$f(${args.map(render).mkString(", ")})"
    case Case(arms) =>
      arms.map { case (p, v) => s"CASE ${render(p)} => ${render(v)}" }
        .mkString(" ") + " ENDCASE"
    case Interp(parts, holes) =>
      parts.zipAll(holes.map(h => "{" + render(h) + "}"), "", "")
        .map { case (p, h) => p + h }.mkString("`", "", "`")
    case SubQuery(q) => s"subQuery(${render(q)})"
  }
  def render(q: Query): String = {
    val b = new StringBuilder("FROM " + renderTag(q.from))
    q.lets.foreach { case (n, e) =>
      b.append(" LET ").append(n).append(" := ").append(render(e)) }
    q.filter.foreach(f => b.append(" FILTER ").append(render(f)))
    if (q.select.nonEmpty) b.append(" SELECT ").append(q.select.map(render).mkString(", "))
    if (q.aggregate.nonEmpty) b.append(" AGGREGATE ").append(q.aggregate.map(render).mkString(", "))
    if (q.by.nonEmpty) b.append(" BY ").append(q.by.map(render).mkString(", "))
    q.limit.foreach(n => b.append(" LIMIT ").append(n))
    b.toString
  }

  def samples(n: Int): Seq[Query] = {
    val params = Gen.Parameters.default
    (0 until n).map { i =>
      queryG.pureApply(params, org.scalacheck.rng.Seed(20260812L + i))
    }
  }
}
