package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.5 — aggregations: AQL `AGGREGATE` + DB-side OLAP rollups.
  *
  * All aggregates are Spark built-ins (Declarative/TypedImperative
  * aggregates with partial/map-side combine): the shuffle after a
  * `groupBy` carries only per-partition partial states, which is the
  * property that keeps these linear at 100 TB. Doubles are rounded to 4
  * decimals AFTER aggregation on both engines (partition-order-dependent
  * FP noise sits far below 1e-4; SURVEY.md §2.0/§7.4.3).
  */
object Aggregations {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // AGGREGATE SUM(_.value) over one tag — a single global group.
    "q40_agg_global" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .agg(
          round(sum("value"), 4).as("sum_v"),
          min("value").as("min_v"),
          max("value").as("max_v"),
          count(lit(1)).as("n"))),

    "q41_agg_group" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(sum("value"), 4).as("sum_v"),
          round(avg("value"), 4).as("avg_v"),
          min("value").as("min_v"),
          max("value").as("max_v"))
        .orderBy("event_type")),

    // FIRST()/LAST() per stream (order = event_id): min_by/max_by, the
    // Spark twins of DuckDB's arg_min/arg_max.
    "q42_agg_first_last" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min_by(col("value"), col("event_id")).as("first_v"),
          max_by(col("value"), col("event_id")).as("last_v"))
        .orderBy("user_id")),

    "q43_agg_count_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("nd_users"))
        .orderBy("event_type")),

    // HLL sketch — the 100 TB posture for distinct counts. Hash-seeded →
    // no SQL oracle; property-tested against q43 (±5%).
    "q44_agg_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // HAVING over per-user rollups.
    "q45_agg_having" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_v"))
        .filter(col("n") >= 60 && col("avg_v").between(40, 60))
        .orderBy("user_id")),

    // OLAP: GROUPING SETS ((event_type),(user_bucket),()) — Expand-based.
    // Pure DataFrame DSL: no session-level temp-view side effects, so
    // entries stay safe to build concurrently.
    "q46_grouping_sets" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 10).as("user_bucket"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("user_bucket")), Seq.empty),
          col("event_type"), col("user_bucket"))
        .agg(count(lit(1)).as("cnt"), grouping_id().cast("long").as("gid"))
        .orderBy("gid", "event_type", "user_bucket")),

    "q47_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          col("o_totalprice"))
        .rollup(col("yr"), col("mo"))
        .agg(
          round(sum("o_totalprice"), 4).as("sum_price"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy("gid", "yr", "mo")),

    "q48_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          grouping_id().cast("long").as("gid"))
        .orderBy("gid", "l_returnflag", "l_linestatus")),

    // FILTER-clause / manual pivot: one conditional sum per tag. Portable
    // (vs .pivot) and a single pass over the data.
    "q49_agg_filtered" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "click", col("value"))), 4).as("sum_click"),
          round(sum(when(col("event_type") === "purchase", col("value"))), 4).as("sum_purchase"),
          round(sum(when(col("event_type") === "error", col("value"))), 4).as("sum_error"),
          round(sum(when(col("event_type") === "signup", col("value"))), 4).as("sum_signup"),
          round(sum(when(col("event_type") === "view", col("value"))), 4).as("sum_view"))
        .orderBy("user_id")),

    "q4A_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))),

    // exact interpolated median ↔ DuckDB quantile_cont
    "q4B_agg_median" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 4).as("median_v"))
        .orderBy("event_type")),

    // approximate median — q4B's 100 TB sibling, the same pairing as
    // q43/q44 for distinct counts: exact percentile buffers every value
    // per group; approx_percentile keeps a bounded mergeable sketch, so
    // the shuffle carries sketch state instead of the column. Sketch
    // internals are engine-specific → no oracle; OperatorSpec pins the
    // approx-vs-exact error band at this accuracy.
    "q4E_agg_approx_median" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(approx_percentile(col("value"), lit(0.5), lit(10000)), 4)
          .as("approx_median_v"))
        .orderBy("event_type")),

    // dynamic→wide pivot: per-user event counts spread into one column
    // per tag. The tag vocabulary is passed EXPLICITLY — the form that
    // skips pivot's extra distinct-scan job, which is how it must be run
    // at 100 TB (and keeps the output schema static for the oracle).
    "q4C_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // wide→long unpivot (q4C's inverse): three lineitem measures melted
    // to (measure, value) rows, then summarized per measure. stack() is
    // pure row-local projection — no shuffle before the aggregate.
    "q4D_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(expr(
          """stack(3, 'quantity', l_quantity,
            |         'extendedprice', l_extendedprice,
            |         'discount', l_discount) AS (measure, val)""".stripMargin))
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("val"), 4).as("sum_val"))
        .orderBy("measure"))
  )

  val oracle: Map[String, String] = Map(
    "q40_agg_global" ->
      """SELECT round(sum(value), 4) AS sum_v, min(value) AS min_v,
        |  max(value) AS max_v, count(*) AS n
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q41_agg_group" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_v,
        |  round(avg(value), 4) AS avg_v, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q42_agg_first_last" ->
      """SELECT user_id, arg_min(value, event_id) AS first_v,
        |  arg_max(value, event_id) AS last_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q43_agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS nd_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q45_agg_having" ->
      """SELECT user_id, count(*) AS n, round(avg(value), 4) AS avg_v
        |FROM events GROUP BY user_id
        |HAVING count(*) >= 60 AND round(avg(value), 4) BETWEEN 40 AND 60
        |ORDER BY user_id""".stripMargin,
    "q46_grouping_sets" ->
      """SELECT event_type, user_bucket, count(*) AS cnt,
        |  CAST(GROUPING(event_type, user_bucket) AS BIGINT) AS gid
        |FROM (SELECT event_type, user_id % 10 AS user_bucket FROM events)
        |GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        |ORDER BY gid, event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin,
    "q47_rollup" ->
      """SELECT yr, mo, round(sum(o_totalprice), 4) AS sum_price, count(*) AS n,
        |  CAST(GROUPING(yr, mo) AS BIGINT) AS gid
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |             CAST(month(o_orderdate) AS BIGINT) AS mo, o_totalprice
        |      FROM orders)
        |GROUP BY ROLLUP (yr, mo)
        |ORDER BY gid, yr NULLS FIRST, mo NULLS FIRST""".stripMargin,
    "q48_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q49_agg_filtered" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS sum_click,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS sum_purchase,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS sum_error,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS sum_signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS sum_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q4A_agg_stats" ->
      """SELECT round(avg(l_extendedprice), 4) AS avg_price,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
        |FROM lineitem""".stripMargin,
    "q4B_agg_median" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q4C_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q4D_unpivot" ->
      """SELECT measure, count(*) AS n, round(sum(val), 4) AS sum_val FROM (
        |  SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'discount', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin
  )
}
