package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.9 — subquery shapes (AQL `subQuery`; DB-side SQL). The Spark side
  * builds each as the decorrelated plan Catalyst would produce anyway:
  * scalar subquery → broadcast of a 1-row aggregate; IN → left-semi join;
  * correlated agg → aggregate + equi join. No driver-side collect: the
  * scalar lives in a broadcast relation, never in driver code.
  */
object Subqueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // scalar subquery: rows above the global average
    "q67_subq_scalar" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val globalAvg = li.agg(avg("l_extendedprice").as("gavg"))
      li.join(broadcast(globalAvg))
        .filter(col("l_extendedprice") > col("gavg"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // IN subquery: orders of the top-10 spending customers (spend rounded
    // before ranking so the cross-engine tie-break is stable)
    "q68_subq_in" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val top10 = o.groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 4).as("spend"))
        .orderBy(col("spend").desc, col("o_custkey"))
        .limit(10)
        .select(col("o_custkey").as("top_custkey"))
      o.join(broadcast(top10), o("o_custkey") === top10("top_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // correlated subquery: events above their own user's average →
    // decorrelated to aggregate + join on the correlation key
    "q69_subq_correlated" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val userAvg = ev.groupBy(col("user_id").as("u")).agg(avg("value").as("uavg"))
      ev.join(userAvg, ev("user_id") === userAvg("u"))
        .filter(col("value") > col("uavg"))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q67_subq_scalar" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q68_subq_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  ORDER BY round(sum(o_totalprice), 4) DESC, o_custkey LIMIT 10)
        |ORDER BY o_orderkey""".stripMargin,
    "q69_subq_correlated" ->
      """SELECT event_id, user_id, value FROM events e
        |WHERE value > (SELECT avg(value) FROM events e2 WHERE e2.user_id = e.user_id)
        |ORDER BY event_id""".stripMargin
  )
}
