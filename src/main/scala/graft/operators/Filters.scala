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

  /** Derived tag-SET view — the reference's real `Set[String]` tag index
    * (SURVEY §1.2): the fixtures collapse tags to the scalar `event_type`,
    * so this view re-derives a genuine `ArrayType(StringType)` set per
    * event (its type tag, the universal `all` tag, and a `big` tag for
    * high-value events) over which `&`/`|` tag expressions run as
    * `array_contains`/`arrays_overlap`. Scale: the array is built in-row
    * inside the scan's codegen stage — no shuffle, no inflation; the
    * residual array predicate evaluates post-scan per-row just like the
    * reference's tag-index probe. */
  def tagged(s: SparkSession, d: String): DataFrame = withTags(ev(s, d))

  /** The tag-derivation alone, applicable to any envelope DataFrame —
    * batch or STREAMING (the AQL subscription pipeline tags the live
    * stream with exactly this expression).
    */
  def withTags(events: DataFrame): DataFrame =
    events.withColumn("tags",
      array_compact(array(col("event_type"), lit("all"),
        when(col("value") > 100, lit("big")))))

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

    // from(2024-01-08)/to(2024-01-15) bounds → row-group skipping. The
    // range goes through Tables.eventsRange so it lands on the RAW ts
    // column (pushable in every fixture generation), not the normalized
    // epoch-ns expression (PlanSpec pins the PushedFilters pair).
    "q13_filter_time_range" -> ((s, d) =>
      Tables.eventsRange(s, d, Some(t0Ns), Some(t1Ns))
        .withColumn("ts_us", Tables.tsUs)
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
        .orderBy("k")),

    // FROM 'signup' | 'error' over the real tag SET: set-overlap, not a
    // scalar equality — the reference's tag-disjunction surface.
    "q18_tags_overlap" -> ((s, d) =>
      tagged(s, d)
        .filter(arrays_overlap(col("tags"), array(lit("signup"), lit("error"))))
        .select(col("event_id"), col("user_id"),
          array_join(col("tags"), ",").as("tag_list"))
        .orderBy("event_id")),

    // FROM 'purchase' & 'big': tag conjunction = set membership of every
    // required tag.
    "q19_tags_contains_all" -> ((s, d) =>
      tagged(s, d)
        .filter(array_contains(col("tags"), "purchase") &&
          array_contains(col("tags"), "big"))
        .select(col("event_id"), col("user_id"), col("value"),
          array_join(col("tags"), ",").as("tag_list"))
        .orderBy("event_id"))
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
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q18_tags_overlap" ->
      """WITH tagged AS (
        |  SELECT *, CASE WHEN value > 100 THEN [event_type, 'all', 'big']
        |                 ELSE [event_type, 'all'] END AS tags
        |  FROM events)
        |SELECT event_id, user_id, array_to_string(tags, ',') AS tag_list
        |FROM tagged
        |WHERE list_contains(tags, 'signup') OR list_contains(tags, 'error')
        |ORDER BY event_id""".stripMargin,
    "q19_tags_contains_all" ->
      """WITH tagged AS (
        |  SELECT *, CASE WHEN value > 100 THEN [event_type, 'all', 'big']
        |                 ELSE [event_type, 'all'] END AS tags
        |  FROM events)
        |SELECT event_id, user_id, value, array_to_string(tags, ',') AS tag_list
        |FROM tagged
        |WHERE list_contains(tags, 'purchase') AND list_contains(tags, 'big')
        |ORDER BY event_id""".stripMargin
  )
}
