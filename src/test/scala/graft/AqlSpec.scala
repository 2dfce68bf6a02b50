package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.aql.Aql

/** The AQL front-end must lower onto the SAME results the hand-built
  * DataFrame plans produce: each test runs an AQL string and the
  * corresponding q1x/q4x registry plan (or an inline DSL equivalent) on
  * sf0.001 and asserts row-for-row equality.
  */
class AqlSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case l: Long => l
      case i: Int => i.toLong // int/long width is a lowering detail, not semantics
      case x => x
    })

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)
  private def aql(s: String) = Aql.run(spark, sf0001, s)

  test("FROM 'purchase' SELECT … == q10_filter_tag") {
    val got = aql("FROM 'purchase' SELECT _.event_id, _.ts_us, _.user_id, _.value")
    assert(got.columns.toSeq == Seq("event_id", "ts_us", "user_id", "value"))
    assert(rows(got) == rows(q("q10_filter_tag")))
  }

  test("FROM 'signup' | 'error' == q11_filter_tag_or") {
    val got = aql("FROM 'signup' | 'error' SELECT _.event_id, _.ts_us, _.user_id, _.event_type")
    assert(rows(got) == rows(q("q11_filter_tag_or")))
  }

  test("FROM 'purchase' FILTER _.value > 100 == q12_filter_tag_and") {
    val got = aql("FROM 'purchase' FILTER _.value > 100 SELECT _.event_id, _.user_id, _.value")
    assert(rows(got) == rows(q("q12_filter_tag_and")))
  }

  test("tag conjunction FROM 'purchase' & 'big' == FILTER value > 100") {
    val got = aql("FROM 'purchase' & 'big' SELECT _.event_id, _.user_id, _.value")
    assert(rows(got) == rows(q("q12_filter_tag_and")))
  }

  test("payload null-fallback _.k ?? -1 matches q17's projection") {
    val got = aql("FROM allEvents SELECT _.k ?? -1").collect().map(_.getLong(0)).sorted.toSeq
    val want = graft.sources.Tables.events(spark, sf0001)
      .select(coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(-1)))
      .collect().map(_.getInt(0).toLong).sorted.toSeq
    assert(got == want)
  }

  test("payload filter FROM allEvents FILTER _.k ?? -1 = 7") {
    val got = aql("FROM allEvents FILTER _.k ?? -1 = 7 SELECT _.event_id")
      .collect().map(_.getLong(0)).toSet
    val want = graft.sources.Tables.events(spark, sf0001)
      .filter(coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(-1)) === 7)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("FROM 'purchase' AGGREGATE … == q40_agg_global") {
    val got = aql(
      "FROM 'purchase' AGGREGATE SUM(_.value), MIN(_.value), MAX(_.value), COUNT(_)")
    assert(got.columns.toSeq == Seq("sum_value", "min_value", "max_value", "count"))
    val Array(g) = got.collect()
    val Array(w) = q("q40_agg_global").collect() // (round(sum,4), min, max, n)
    assert(math.abs(g.getDouble(0) - w.getDouble(0)) < 1e-3)
    assert(g.getDouble(1) == w.getDouble(1) && g.getDouble(2) == w.getDouble(2))
    assert(g.getLong(3) == w.getLong(3))
  }

  test("grouping: parenthesised tag expr and boolean FILTER algebra") {
    val got = aql(
      "FROM ('signup' | 'error') & 'all' FILTER _.value > 50 & !(_.event_type = 'error') SELECT _.event_id")
      .collect().map(_.getLong(0)).toSet
    val want = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup" && col("value") > 50)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("parse errors are reported, not swallowed") {
    intercept[IllegalArgumentException](Aql.parse("SELECT _.x"))
    intercept[IllegalArgumentException](Aql.parse("FROM 'a' SELECT _.x extra"))
    intercept[IllegalArgumentException](Aql.parse("FROM 'a' FILTER _.value >"))
    intercept[IllegalArgumentException](Aql.parse("FROM 'a' SELECT CASE _.value > 1 => 1")) // no ENDCASE
    intercept[IllegalArgumentException](Aql.parse("FROM 'a' LIMIT ten"))
    intercept[IllegalArgumentException](Aql.parse("FROM 'a' SELECT `un{closed`"))
  }

  test("ISO-date atoms are reserved for from()/to(): loud in expressions, " +
       "spaced subtraction still arithmetic (ADVICE r11 pin)") {
    // unspaced date-shaped sequence in expression position: one date
    // token, rejected loudly by atomE — never silent arithmetic
    val e = intercept[IllegalArgumentException](
      Aql.parse("FROM 'a' FILTER _.value > 2024-01-08 SELECT _.event_id"))
    assert(e.getMessage.contains("bad expression atom"))
    // the spaced form is ordinary subtraction and still parses
    val q = Aql.parse("FROM 'a' FILTER _.value > 2024 - 1 - 8 SELECT _.event_id")
    assert(q.filter.nonEmpty)
  }

  test("CASE … ENDCASE == q21's tier expression (when/otherwise chain)") {
    val got = aql(
      "FROM allEvents SELECT CASE _.value < 50 => 'small' CASE _.value < 150 => 'mid' CASE TRUE => 'large' ENDCASE, _.value")
    val want = graft.sources.Tables.events(spark, sf0001)
      .orderBy("event_id")
      .select(
        when(col("value") < 50, "small").when(col("value") < 150, "mid")
          .otherwise("large"),
        col("value"))
    assert(rows(got) == rows(want) && got.count() > 0)
  }

  test("CASE without a default arm yields NULL for unmatched rows") {
    val got = aql("FROM allEvents SELECT CASE _.value < 50 => 'small' ENDCASE, _.value")
      .collect()
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
    got.foreach(r => assert(r.isNullAt(0) == (r.getDouble(1) >= 50)))
  }

  test("backtick interpolation == q25's concat convention") {
    val got = aql("FROM 'purchase' SELECT `user {_.user_id}: {_.event_type} at {_.value}`")
    val want = graft.operators.Filters.tagged(spark, sf0001)
      .filter(array_contains(col("tags"), "purchase"))
      .orderBy("event_id")
      .select(concat(lit("user "), col("user_id").cast("string"), lit(": "),
        col("event_type"), lit(" at "), col("value").cast("string")))
    assert(rows(got) == rows(want) && got.count() > 0)
  }

  test("LIMIT bounds the lamport-ordered stream == q00_scan_limit") {
    val got = aql(
      "FROM allEvents SELECT _.event_id, _.ts_us, _.user_id, _.event_type, _.value, _.props LIMIT 100")
    assert(rows(got) == rows(q("q00_scan_limit")))
  }

  test("scalar subQuery: rows above the global average (q67 shape)") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val gavg = ev.agg(avg("value")).collect()(0).getDouble(0)
    val got = aql(
      "FROM allEvents FILTER _.value > subQuery(FROM allEvents AGGREGATE AVG(_.value)) SELECT _.event_id")
      .collect().map(_.getLong(0)).toSet
    val want = ev.filter(col("value") > gavg).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty && got.size < ev.count())
  }

  test("IN subQuery: left-semi join (q68 shape)") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val errUsers = ev.filter(col("event_type") === "error" && col("value") > 180)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val got = aql(
      "FROM allEvents FILTER _.user_id IN subQuery(FROM 'error' FILTER _.value > 180 SELECT _.user_id) SELECT _.event_id")
      .collect().map(_.getLong(0)).toSet
    val want = ev.filter(col("user_id").isInCollection(errUsers))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty && got.size < ev.count())
  }

  test("correlated subQuery (^.user_id) == q69_subq_correlated") {
    val got = aql(
      "FROM allEvents FILTER _.value > subQuery(FROM allEvents FILTER _.user_id = ^.user_id AGGREGATE AVG(_.value)) " +
        "SELECT _.event_id, _.user_id, _.value")
    assert(rows(got) == rows(q("q69_subq_correlated")))
  }

  test("subQuery outside FILTER and stray outer refs are rejected") {
    intercept[IllegalArgumentException](
      aql("FROM 'a' SELECT subQuery(FROM 'b' SELECT _.user_id)").collect())
    intercept[IllegalArgumentException](
      aql("FROM 'a' FILTER _.value > ^.value SELECT _.event_id").collect())
  }

  test("correlated COUNT counts 0 for outer rows with no inner group") {
    // users with FEWER than 2 high-value errors — including users with
    // NONE, who must compare against 0, not silently drop (the classic
    // correlated-COUNT decorrelation bug)
    val ev = graft.sources.Tables.events(spark, sf0001)
    val errCnt = ev.filter(col("event_type") === "error" && col("value") > 190)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ev.select("user_id").distinct().collect().map(_.getLong(0))
      .filter(u => errCnt.getOrElse(u, 0L) < 2).toSet
    assert(want.exists(u => !errCnt.contains(u)),
      "fixture must include zero-group users for this test to bite")
    val got = aql(
      "FROM allEvents FILTER 2 > subQuery(FROM 'error' FILTER _.user_id = ^.user_id & _.value > 190 AGGREGATE COUNT(_)) " +
        "SELECT _.user_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("IN outside a subQuery comparison is a clean rejection, not a MatchError") {
    intercept[IllegalArgumentException](
      aql("FROM 'a' FILTER _.user_id IN 5 SELECT _.event_id").collect())
  }

  test("AGGREGATE … BY event_type lowers onto q41's groupBy.agg plan") {
    // the grouped extension (VERDICT r7 #8): same grouping, aggregates,
    // and key order as the q41 registry plan; COUNT/MIN/MAX compare
    // exactly, SUM/AVG at 1e-6 (AQL does not inject q41's round())
    val got = aql("FROM allEvents AGGREGATE COUNT(_), SUM(_.value), " +
      "AVG(_.value), MIN(_.value), MAX(_.value) BY _.event_type")
    assert(got.columns.toSeq == Seq("event_type", "count", "sum_value",
      "avg_value", "min_value", "max_value"))
    val want = graft.sources.Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)), sum("value"), avg("value"), min("value"), max("value"))
      .orderBy("event_type").collect()
    val rowsGot = got.collect()
    assert(rowsGot.length == want.length)
    rowsGot.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) <= 1e-6)
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) <= 1e-6)
      assert(g.getDouble(4) == w.getDouble(4))
      assert(g.getDouble(5) == w.getDouble(5))
    }
    // and the lowering genuinely is the q41 shape: one hash aggregate
    // pair around one exchange on the group key, no window, no join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("AGGREGATE … BY: multi-key, filtered, and fuzz vs the DSL (seeded)") {
    // multi-key exact case
    val got = aql("FROM 'purchase' FILTER _.value > 100 " +
      "AGGREGATE COUNT(_), MAX(_.value) BY _.event_type, _.user_id")
    // the 'purchase' tag is derived from event_type (Filters.tagged), so
    // the DSL twin filters the envelope column directly
    val want = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("count"), max("value").as("max_value"))
      .orderBy("event_type", "user_id")
    assert(rows(got) == rows(want))

    // fuzz: random key subset × random aggregate list, AQL vs DSL
    val rnd = new scala.util.Random(23)
    val keyPool = Seq("event_type", "user_id")
    val aggPool = Seq(
      ("COUNT(_)", count(lit(1))),
      ("MIN(_.value)", min(col("value"))),
      ("MAX(_.value)", max(col("value"))),
      ("COUNT(_.event_id)", count(col("event_id"))))
    for (_ <- 1 to 8) {
      val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(2))
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      val gotF = aql(s"FROM allEvents AGGREGATE ${aggs.map(_._1).mkString(", ")} " +
        s"BY ${keys.map("_." + _).mkString(", ")}")
      val wantF = graft.sources.Tables.events(spark, sf0001)
        .groupBy(keys.map(col): _*)
        .agg(aggs.head._2, aggs.tail.map(_._2): _*)
        .orderBy(keys.map(col): _*)
      assert(rows(gotF) == rows(wantF), s"keys=$keys aggs=${aggs.map(_._1)}")
    }
  }

  test("BY without AGGREGATE is a parse error") {
    intercept[IllegalArgumentException](
      aql("FROM allEvents BY _.event_type"))
  }

  test("from()/to() bounds == q13_filter_time_range") {
    val got = aql("FROM allEvents & from(2024-01-08) & to(2024-01-15) " +
      "SELECT _.event_id, _.ts_us, _.user_id, _.event_type")
    assert(rows(got) == rows(q("q13_filter_time_range")))
    // datetime spelling, with and without the Z, same instant
    val got2 = aql("FROM allEvents & from(2024-01-08T00:00:00Z) & " +
      "to(2024-01-15T00:00:00) SELECT _.event_id, _.ts_us, _.user_id, _.event_type")
    assert(rows(got2) == rows(q("q13_filter_time_range")))
  }

  test("from()/to() push to the Parquet scan; OR-nested bounds stay residual") {
    val p = aql("FROM 'purchase' & from(2024-01-08) & to(2024-01-15) SELECT _.event_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"), p)

    // an OR'd bound cannot prune the scan — it must NOT appear pushed,
    // and the per-row semantics must still hold
    val orQ = "FROM 'purchase' | from(2024-01-08)"
    val pOr = aql(orQ + " SELECT _.event_id").queryExecution.executedPlan.toString
    assert(!pOr.contains("GreaterThanOrEqual(ts,"), pOr)
    val t0 = 1704672000L * 1000000000L
    val want = graft.operators.Filters.tagged(spark, sf0001)
      .filter(array_contains(col("tags"), "purchase") || col("ts") >= t0)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val gotOr = aql(orQ + " SELECT _.event_id").collect().map(_.getLong(0)).toSeq
    assert(gotOr.sorted == want.sorted && gotOr.nonEmpty)
  }

  test("bounds compose: tightest from/to pair wins in an & chain") {
    val got = aql("FROM from(2024-01-01) & from(2024-01-08) & to(2024-01-20) & " +
      "to(2024-01-15) SELECT _.event_id, _.ts_us, _.user_id, _.event_type")
    assert(rows(got) == rows(q("q13_filter_time_range")))
  }

  test("a malformed bound is a parse error, not a silent empty result") {
    intercept[IllegalArgumentException](aql("FROM from(notadate)"))
    intercept[IllegalArgumentException](aql("FROM from()"))
  }

  test("bounds work on the sink/predicate path (streaming lowering)") {
    // the subscription path has no scan to push into — bounds lower as
    // per-row predicates on the normalized ns column via lowerTag
    val t0 = 1704672000L * 1000000000L
    val tagged = graft.operators.Filters.tagged(spark, sf0001)
    val got = tagged
      .filter(Aql.predicate("FROM 'purchase' & from(2024-01-08) & to(2024-01-15)"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = tagged
      .filter(col("event_type") === "purchase" &&
        col("ts") >= t0 && col("ts") < 1705276800L * 1000000000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("LET: bindings inline into FILTER/SELECT, SELECT keeps the name") {
    val got = aql("FROM 'purchase' LET v2 := _.value * 2 " +
      "FILTER v2 > 100 SELECT _.event_id, v2")
    assert(got.columns.toSeq == Seq("event_id", "v2"))
    val want = aql("FROM 'purchase' FILTER _.value * 2 > 100 " +
      "SELECT _.event_id, _.value * 2")
    assert(rows(got) == rows(want) && rows(got).nonEmpty)
  }

  test("LET: later bindings see earlier ones (chained expansion)") {
    val got = aql("FROM 'purchase' LET v2 := _.value * 2 " +
      "LET v3 := v2 + 1 AGGREGATE MAX(v3)")
    val want = aql("FROM 'purchase' AGGREGATE MAX(_.value * 2 + 1)")
    assert(rows(got) == rows(want))
  }

  test("LET: visible inside subQuery bodies; inner LETs shadow outer") {
    val got = aql("FROM 'purchase' LET cut := 400 " +
      "FILTER _.user_id IN subQuery(FROM 'error' FILTER _.value > cut " +
      "SELECT _.user_id) SELECT _.event_id")
    val want = aql("FROM 'purchase' " +
      "FILTER _.user_id IN subQuery(FROM 'error' FILTER _.value > 400 " +
      "SELECT _.user_id) SELECT _.event_id")
    assert(rows(got) == rows(want))
    // inner LET of the same name wins inside the subquery body; the
    // outer binding still governs the outer conjunct
    val sh = aql("FROM 'purchase' LET cut := 400 " +
      "FILTER _.user_id IN subQuery(FROM 'error' LET cut := 0 " +
      "FILTER _.value > cut SELECT _.user_id) & _.value > cut " +
      "SELECT _.event_id")
    val shWant = aql("FROM 'purchase' " +
      "FILTER _.user_id IN subQuery(FROM 'error' FILTER _.value > 0 " +
      "SELECT _.user_id) & _.value > 400 SELECT _.event_id")
    assert(rows(sh) == rows(shWant))
  }

  test("LET: row-anchored `_.x` is never captured — the inner reference wins (r15)") {
    // Before r15 the parser erased the `_.` anchor, so `_.k` inside the
    // subQuery body was silently substituted by the outer `LET k` (the
    // 999999 binding would make the prop filter vacuously empty —
    // caught by the nonEmpty assert). `_.k` is the row's JSON prop by
    // the user's own spelling, at every nesting level.
    val got = aql("FROM 'purchase' LET k := 999999 " +
      "FILTER _.user_id IN subQuery(FROM allEvents FILTER _.k ?? -1 = 7 " +
      "SELECT _.user_id) SELECT _.event_id")
    val want = aql("FROM 'purchase' " +
      "FILTER _.user_id IN subQuery(FROM allEvents FILTER _.k ?? -1 = 7 " +
      "SELECT _.user_id) SELECT _.event_id")
    assert(rows(got) == rows(want) && rows(got).nonEmpty)
    // same rule at the TOP level: `_.k` beside a live `LET k` is the
    // prop, and bare `k` is the binding — both in one SELECT
    val top = aql("FROM allEvents LET k := 42 " +
      "SELECT _.event_id, _.k ?? -1, k LIMIT 10").collect()
    assert(top.nonEmpty)
    assert(top.forall(_.getLong(2) == 42L))
    assert(top.exists(_.getLong(1) != 42L)) // props don't echo the binding
  }

  test("LET: works on the predicate (streaming) path") {
    val tagged = graft.operators.Filters.tagged(spark, sf0001)
    val got = tagged
      .filter(Aql.predicate("FROM 'purchase' LET lim := 200 FILTER _.value > lim"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = tagged
      .filter(col("event_type") === "purchase" && col("value") > 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("LET: shadowing, duplicates, record access, and misuse are loud errors") {
    // shadows an envelope column
    intercept[IllegalArgumentException](aql("FROM 'a' LET value := 1 SELECT value"))
    // shadows a grammar atom
    intercept[IllegalArgumentException](aql("FROM 'a' LET from := 1"))
    // duplicate name
    intercept[IllegalArgumentException](
      aql("FROM 'a' LET x := 1 LET x := 2 SELECT x"))
    // a binding is not a record
    intercept[IllegalArgumentException](
      aql("FROM 'a' LET x := 1 SELECT x.field"))
    // missing :=
    intercept[IllegalArgumentException](aql("FROM 'a' LET x = 1 SELECT x"))
    // NO forward references: a name used before its LET is the ordinary
    // JSON-payload path (schema-on-read → NULL here), never a silent
    // capture of the later binding
    val fwd = aql("FROM 'purchase' LET y := x + 1 LET x := 5 SELECT y LIMIT 5")
      .collect()
    assert(fwd.nonEmpty && fwd.forall(_.isNullAt(0)))
  }
}
