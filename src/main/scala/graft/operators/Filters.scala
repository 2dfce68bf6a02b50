package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.2 — filters / predicates: the AQL `FROM <tag-expr>` + `FILTER`
  * surface (SURVEY.md §2.2). Tags are collapsed to the scalar `event_type`
  * in the fixtures; tag conjunction/disjunction become plain predicates.
  *
  * Scale posture: every predicate here is a deterministic Catalyst
  * expression over scan columns, so it pushes down to the parquet reader
  * (`PushedFilters` in explain) — row-group min/max skipping does the
  * tag-index / offset-range pruning the reference engine does (SURVEY §4.1).
  */
object Filters {
  type Q = (SparkSession, String) => DataFrame

  // [2024-01-08, 2024-01-15) in epoch-ns — events.ts is a LongType ns
  // column on the Spark side (SURVEY.md §7.4.1); whole-second bounds are
  // exact in both engines.
  private val t0Ns = 1704672000L * 1000000000L
  private val t1Ns = 1705276800L * 1000000000L

  private def ev(s: SparkSession, d: String): DataFrame = Tables.eventsUs(s, d)

  val queries: Map[String, Q] = Map(
    // FROM 'purchase'
    "q10_filter_tag" -> ((s, d) =>
      ev(s, d).filter(col("event_type") === "purchase")
        .select("event_id", "ts_us", "user_id", "value")
        .orderBy("event_id")),

    // FROM 'signup' | 'error'
    "q11_filter_tag_or" -> ((s, d) =>
      ev(s, d).filter(col("event_type").isin("signup", "error"))
        .select("event_id", "ts_us", "user_id", "event_type")
        .orderBy("event_id")),

    // FROM 'purchase' & FILTER value > 100
    "q12_filter_tag_and" -> ((s, d) =>
      ev(s, d).filter(col("event_type") === "purchase" && col("value") > 100)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")),

    // from(2024-01-08)/to(2024-01-15) bounds → row-group skipping
    "q13_filter_time_range" -> ((s, d) =>
      ev(s, d).filter(col("ts") >= t0Ns && col("ts") < t1Ns)
        .select("event_id", "ts_us", "user_id", "event_type")
        .orderBy("event_id")),

    "q14_filter_like" -> ((s, d) =>
      Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .orderBy("p_partkey")),

    "q15_filter_regex" -> ((s, d) =>
      Tables.documents(s, d).filter(col("text").rlike("\\bjoin\\b"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    "q16_filter_in_between" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(10, 20) && col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        // lineitem has no unique key → order by all output columns
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // AQL null-fallback: payload key with a default when absent.
    "q17_filter_null_fallback" -> ((s, d) =>
      ev(s, d)
        .select(coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(-1)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"))
  )

  val oracle: Map[String, String] = Map(
    "q10_filter_tag" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q11_filter_tag_or" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events
        |WHERE event_type IN ('signup', 'error') ORDER BY event_id""".stripMargin,
    "q12_filter_tag_and" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id""".stripMargin,
    "q13_filter_time_range" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q14_filter_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey""".stripMargin,
    "q15_filter_regex" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE regexp_matches(text, '\bjoin\b') ORDER BY doc_id""".stripMargin,
    "q16_filter_in_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin,
    "q17_filter_null_fallback" ->
      """SELECT COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin
  )
}
