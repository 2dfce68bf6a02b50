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
  }
}
