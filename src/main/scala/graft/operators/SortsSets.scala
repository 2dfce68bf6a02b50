package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.7 sorts / limits / top-k + §2.8 set operations.
  *
  * Scale posture: `orderBy.limit(k)` plans as TakeOrderedAndProject (each
  * partition keeps its top-k, only k rows per partition reach the driver
  * stage) — the global sort only exists for the full-sort query q60, which
  * range-partitions. Set ops are hash shuffles with partial distinct.
  */
object SortsSets {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // multi-key mixed asc/desc sort; lineitem has no unique key → order by
    // every output column for a total, engine-independent order.
    "q60_sort_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)),

    // global top-20 → TakeOrderedAndProject, no full sort
    "q61_topk" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(20)),

    // grouped top-k: row_number ≤ 3 per orderpriority. r17 two-phase
    // (the q78 shape, guide §2.5): the one-window spelling put each
    // priority's ENTIRE group in a single task — 5 groups = 5 tasks
    // sorting 1/5 of the table each no matter the cluster size. Phase 1
    // ranks within (group, salt) — salt is a DETERMINISTIC hash of the
    // unique key (never rand(): re-run tasks must re-derive the same
    // salt, SPARK-38388), so per-task input is bounded and the exchange
    // spreads over group·salts partitions — and keeps each salt's top-3,
    // a provable superset of the global top-3 (any subset rank ≤ the
    // full-data rank under the same total order). Phase 2 ranks the
    // ≤ 3·salts survivors per group exactly; ranks ≤ 3 equal the
    // one-window ranks because every higher-ranked row also survived
    // phase 1. Salt count follows the session's partitioning conf —
    // scale-adaptive, not a local constant.
    "q62_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val salts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val wLocal = Window.partitionBy(col("o_orderpriority"), col("salt"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("salt", pmod(hash(col("o_orderkey")), lit(salts)))
        .withColumn("rn", row_number().over(wLocal))
        .filter(col("rn") <= 3)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "o_totalprice", "o_orderkey", "rn")
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // stream merge (bag union)
    "q63_union_all" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .unionAll(ev.filter(col("event_type") === "signup").select("user_id"))
        .orderBy("user_id")
    }),

    "q64_union_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .union(ev.filter(col("event_type") === "signup").select("user_id"))
        .distinct()
        .orderBy("user_id")
    }),

    "q65_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .intersect(ev.filter(col("event_type") === "error").select("user_id"))
        .orderBy("user_id")
    }),

    // purchasers minus users with a high-value error (threshold keeps the
    // result non-trivial on the fixtures: every user has every event type)
    "q66_except" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .except(ev.filter(col("event_type") === "error" && col("value") > 250)
          .select("user_id"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q60_sort_multi" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "q61_topk" ->
      """SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q62_topk_per_group" ->
      """SELECT o_orderpriority, o_totalprice, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q63_union_all" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id""".stripMargin,
    "q64_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id""".stripMargin,
    "q65_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "q66_except" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 250
        |ORDER BY user_id""".stripMargin
  )
}
