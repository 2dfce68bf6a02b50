package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.4 — joins over the landed star schema + the event stream.
  *
  * Scale posture: dimension sides (part, supplier, nation) get explicit
  * `broadcast()` hints → BroadcastHashJoin, no shuffle of the fact table.
  * Fact-fact joins shuffle on their equi keys (AQE handles skew). The
  * as-of join (q37) deliberately avoids the naive range-join explosion:
  * it is the union-and-carry-forward idiom — union both streams, one
  * window pass per key — which is one shuffle + one sort, linear in
  * events, independent of how many matches each row would have.
  *
  * Fixture reality check (FIXTURES.md): orders are 1995–2001 while events
  * are Jan-2024, so order↔event *temporal* joins would be empty; the as-of
  * and interval joins therefore pair event streams (click→purchase,
  * signup→follow-up), which is also the reference's natural shape
  * (streams joined to streams, SURVEY.md §2.4).
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  private val hourUs = 3600L * 1000000L
  private val weekUs = 7L * 24 * 3600 * 1000000L

  val queries: Map[String, Q] = Map(
    // equi join of two fact tables → shuffled hash / sort-merge
    "q30_join_inner" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // fact ⋈ two broadcast dims → BroadcastHashJoin, lineitem never shuffles
    "q31_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val sup = Tables.supplier(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "s_name", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "p_name", "s_name", "l_quantity")
    }),

    // LEFT join with observable null-extension (only big orders survive)
    "q32_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    // FULL OUTER over partially-overlapping keysets
    "q33_join_full" -> ((s, d) => {
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 8000)
        .select("c_custkey", "c_acctbal")
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 480000)
        .select("o_custkey").distinct()
      rich.join(big, rich("c_custkey") === big("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_custkey").isNotNull.as("is_rich"),
          col("o_custkey").isNotNull.as("has_big_order"))
        .orderBy("k")
    }),

    // EXISTS → left semi
    "q34_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // NOT EXISTS → left anti
    "q35_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // theta/range join: same user, e2 strictly within 1h after e1.
    // r17 (guide §2.4): the join spelling (equi key + range conjunct)
    // materialized the whole PAIR STREAM — every (a, b) match crossed
    // the join just to be counted — and shuffled/broadcast the events
    // table twice (once per side). The pair count per user is exactly
    // Σ_a |{b : a < b ≤ a + 1h}|, i.e. a RANGE-frame count over each
    // user's time-sorted events, so ONE exchange on user_id + one sort
    // replaces the self-join, the pair stream never exists as rows, and
    // the groupBy reuses the window's partitioning (no second
    // exchange). Frame [cur+1µs, cur+1h] over integer µs ≡ the old
    // (b_us > a_us AND b_us <= a_us + 1h) predicate; the isNotNull
    // filter reproduces the inner join's null-key drop. Users with zero
    // pairs produced no join rows before → filter n_pairs > 0.
    "q36_join_theta" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(1L, hourUs)
      Tables.eventsUs(s, d).select("user_id", "ts_us")
        .filter(col("user_id").isNotNull)
        .withColumn("cnt", count(lit(1)).over(w))
        .groupBy("user_id")
        .agg(sum(col("cnt")).as("n_pairs"))
        .filter(col("n_pairs") > 0)
        .orderBy("user_id")
    }),

    // AS-OF join: for each purchase, the latest click at-or-before it by
    // the same user. No Spark primitive → union-and-carry-forward: union
    // both streams, sort per user by (ts, kind), carry the last click
    // forward with last_value(ignoreNulls). One window pass, linear.
    "q37_join_asof" -> ((s, d) => {
      val ev = Tables.eventsUs(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"),
          col("value").as("click_value"), lit(null).cast("long").as("purchase_id"),
          lit(0).as("kind"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), lit(null).cast("long").as("click_id"),
          lit(null).cast("double").as("click_value"), col("event_id").as("purchase_id"),
          lit(1).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_click_value", last(col("click_value"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("asof_click_id").isNotNull)
        .select(col("purchase_id").as("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"), col("asof_click_value").as("click_value"))
        .orderBy("event_id")
    }),

    // interval join: follow-up events within [signup, signup+7d) per user
    "q38_join_interval" -> ((s, d) => {
      val ev = Tables.eventsUs(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts_us").as("s_us"),
          col("event_id").as("signup_id"))
      val e = ev.select(col("user_id"), col("ts_us"), col("value"))
      signups.join(e, e("user_id") === signups("s_user") &&
          e("ts_us") >= signups("s_us") && e("ts_us") < signups("s_us") + weekUs)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n_follow"), round(sum("value"), 4).as("sum_value"))
        .orderBy("signup_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q30_join_inner" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q31_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, s_name, l_quantity
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, p_name, s_name, l_quantity""".stripMargin,
    "q32_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q33_join_full" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS k,
        |  (c_custkey IS NOT NULL) AS is_rich,
        |  (o_custkey IS NOT NULL) AS has_big_order
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) c
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 480000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY k""".stripMargin,
    "q34_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q35_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q36_join_theta" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q37_join_asof" ->
      """SELECT event_id, user_id, click_id, click_value FROM (
        |  SELECT p.event_id, p.user_id, c.event_id AS click_id,
        |    c.value AS click_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM events p JOIN events c
        |    ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |  WHERE p.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q38_join_interval" ->
      """SELECT s.event_id AS signup_id, count(*) AS n_follow,
        |  round(sum(e.value), 4) AS sum_value
        |FROM events s JOIN events e
        |  ON e.user_id = s.user_id
        |  AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 7 DAY
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin
  )
}
