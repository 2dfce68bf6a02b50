package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.6 — window functions: time-series analytics over the event stream
  * (per-user sequences, deltas, running/moving/time-range frames,
  * sessionization, funnels).
  *
  * Ordering convention: all windows order by (ts_us, event_id) — µs so
  * both engines see identical instants (SURVEY.md §7.4.1), event_id as the
  * unique tiebreak. One shuffle on the partition key per window spec;
  * specs sharing (partitionBy, orderBy) reuse the same sort.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  private def byUser =
    Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))

  private def ev(s: SparkSession, d: String): DataFrame = Tables.eventsUs(s, d)

  /** Gap-based sessionization (30 min), the classic two-window idiom:
    * lag → new-session flag → running sum = session id → aggregate.
    * Input needs (user_id, ts_us, event_id); output is per-user session
    * count + avg length. Public so tests drive it with synthetic streams
    * (its streaming twin is S4's `session_window` — StreamOps).
    */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val flagged = events
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1)
          .when(lag(col("ts_us"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("session_len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), round(avg("session_len"), 4).as("avg_len"))
  }

  val queries: Map[String, Q] = Map(
    "q50_win_row_number" -> ((s, d) =>
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"))
        .withColumn("rn", row_number().over(byUser))
        .drop("ts_us")
        .orderBy("user_id", "rn")),

    // rank/dense_rank are pure functions of value ties → deterministic
    // without a tiebreak in the window order itself.
    "q51_win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // inter-event gap per user (lag). Gap stays in exact integer µs:
    // dividing µs by 1e6 yields exact .xxxx5 halfway values that Spark
    // (decimal-string HALF_UP) and DuckDB (binary-double) round apart.
    "q52_win_lag_lead" -> ((s, d) =>
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
        .drop("ts_us")
        .orderBy("event_id")),

    // running total per user (purchases)
    "q53_win_running" -> ((s, d) =>
      ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"), col("ts_us"))
        .withColumn("running",
          round(sum(col("value")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .drop("value", "ts_us")
        .orderBy("event_id")),

    // 3-event moving average
    "q54_win_moving" -> ((s, d) =>
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("ts_us"))
        .withColumn("mov_avg",
          round(avg(col("value")).over(byUser.rowsBetween(-2, 0)), 4))
        .drop("value", "ts_us")
        .orderBy("event_id")),

    // time-valued frame: trailing-1h sum per user. RANGE frames include
    // all peers of the current second → tie-safe on both engines.
    "q55_win_range_time" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-3600, 0)
      ev(s, d)
        .withColumn("ts_sec", Tables.tsSec)
        .select(col("event_id"), col("user_id"), col("value"), col("ts_sec"))
        .withColumn("trail_1h", round(sum(col("value")).over(w), 4))
        .drop("value", "ts_sec")
        .orderBy("event_id")
    }),

    // distribution: account-balance quartiles. A bare `ntile(4) OVER
    // (ORDER BY ...)` would move the whole table into ONE task; instead
    // the global rank comes from [[Ranks.rowNumber]] (value-derived
    // buckets → local numbering → metadata prefix-sum) and the exact
    // ntile bucket is derived from it in closed form. Bit-identical to
    // ntile(4). The total row count is one column-pruned count —
    // metadata-scale, same as the similarity kernel's grid sizing.
    "q56_win_ntile" -> ((s, d) => {
      val buckets = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      // ONE metadata probe (r17): count + lead-key range in a single
      // column-pruned job — rowNumber's own min/max probe would re-scan.
      val pre = base.agg(count(lit(1)),
        min(col("c_acctbal")).cast("double"),
        max(col("c_acctbal")).cast("double")).head()
      val total = pre.getLong(0)
      val stats = if (pre.isNullAt(1)) None
        else Some((pre.getDouble(1), pre.getDouble(2)))
      val ranked = Ranks.rowNumber(base, Nil, col("c_acctbal"),
        Seq(col("c_custkey")), buckets, "rn", stats)
      // ntile(k): first (N mod k) tiles hold ceil(N/k) rows, the rest
      // floor(N/k); invert that boundary function at the row's global rank.
      val k = 4
      val bsz = total / k
      val rem = total % k
      ranked
        .withColumn("quartile",
          when(col("rn") <= rem * (bsz + 1), ceil(col("rn") / (bsz + 1)))
            .otherwise(lit(rem) + ceil((col("rn") - rem * (bsz + 1)) / bsz))
            .cast("int"))
        .select(col("c_custkey"), col("c_acctbal"), col("quartile"))
        .orderBy("c_custkey")
    }),

    // first/last value in an explicit full frame per user-day.
    // r17 (guide §2.3 "aggregate before you shuffle"): the window +
    // DISTINCT spelling shuffled every event row into the window sort
    // and then paid a SECOND exchange for the distinct; first/last over
    // the full frame under the unique (ts_us, event_id) order are
    // exactly min_by/max_by on that key, so one groupBy computes them
    // with map-side partial aggregation — the one exchange carries a
    // 4-column partial state per (user, day) per task, not every event.
    "q57_win_first_last_value" -> ((s, d) =>
      ev(s, d)
        .withColumn("day_id", expr("ts_us div 86400000000"))
        .groupBy("user_id", "day_id")
        .agg(
          min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("first_v"),
          max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("last_v"))
        .orderBy("user_id", "day_id")),

    // gap-based sessionization (30 min) — see [[sessionize]].
    "q58_sessionize" -> ((s, d) =>
      sessionize(ev(s, d).select(col("user_id"), col("ts_us"), col("event_id")))
        .orderBy("user_id")),

    // signup→purchase funnel: first signup, first purchase at-or-after it
    "q59_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      ev(s, d)
        .select(col("user_id"), col("ts_us"), col("event_type"))
        .withColumn("first_signup",
          min(when(col("event_type") === "signup", col("ts_us"))).over(w))
        .filter(col("first_signup").isNotNull)
        .groupBy("user_id")
        .agg(
          min(col("first_signup")).as("signup_us"),
          min(when(col("event_type") === "purchase" &&
            col("ts_us") >= col("first_signup"), col("ts_us"))).as("purchase_us"))
        .withColumn("converted", col("purchase_us").isNotNull)
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q50_win_row_number" ->
      """SELECT event_id, user_id, CAST(row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn
        |FROM events ORDER BY user_id, rn""".stripMargin,
    "q51_win_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
        |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q52_win_lag_lead" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q53_win_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q54_win_moving" ->
      """SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY event_id""".stripMargin,
    "q55_win_range_time" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS trail_1h
        |FROM (SELECT event_id, user_id, value, epoch_us(ts) // 1000000 AS ts_sec
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q56_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q57_win_first_last_value" ->
      """SELECT DISTINCT user_id, day_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER w AS last_v
        |FROM (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
        |             epoch_us(ts) AS ts_us, event_id, value FROM events)
        |WINDOW w AS (PARTITION BY user_id, day_id ORDER BY ts_us, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, day_id""".stripMargin,
    "q58_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session,
        |    epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |lens AS (
        |  SELECT user_id, session_id, count(*) AS session_len
        |  FROM sessions GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions, round(avg(session_len), 4) AS avg_len
        |FROM lens GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q59_funnel" ->
      """SELECT user_id, min(first_signup) AS signup_us,
        |  min(CASE WHEN event_type = 'purchase' AND ts_us >= first_signup
        |           THEN ts_us END) AS purchase_us,
        |  (min(CASE WHEN event_type = 'purchase' AND ts_us >= first_signup
        |            THEN ts_us END) IS NOT NULL) AS converted
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS first_signup
        |  FROM events)
        |WHERE first_signup IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
