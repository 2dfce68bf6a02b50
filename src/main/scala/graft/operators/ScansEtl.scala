package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.1 — scans, projections-at-scan, and the reference's core ETL shape:
  * event envelope + JSON payload → relational row (SURVEY.md §2.1, §3.1
  * EP-3). The flatten/route pair is the batch twin of the streaming
  * events→DB pipeline in [[graft.streaming]].
  *
  * Determinism: every query ends in an ORDER BY over a unique column set
  * and rounds double aggregates to 4 decimals (SURVEY.md §2.0).
  */
object ScansEtl {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Bounded query with LIMIT: Catalyst plans orderBy+limit as
    // TakeOrderedAndProject — no global sort, each partition keeps top-100.
    "q00_scan_limit" -> ((s, d) =>
      Tables.eventsUs(s, d)
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
        .limit(100)),

    // Flagship: TPC-H Q1-style pricing summary. Partial aggregation
    // (map-side combine) happens before the 2-key shuffle, so the shuffle
    // carries ≤ (#groups × #partitions) rows regardless of input size.
    "q01_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Column-pruned scan: ReadSchema must show 3 of 11 lineitem columns.
    // lineitem has NO unique key in the fixtures (FIXTURES.md), so
    // row-level lineitem outputs ORDER BY every output column — duplicate
    // rows are then interchangeable and the hash-compare is deterministic.
    "q02_scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")),

    // The reference's core op: envelope + JSON payload → typed row
    // (SURVEY.md §2.1 q03). get_json_object is a codegen'd Catalyst
    // expression — schema-on-read without a UDF.
    "q03_etl_flatten" -> ((s, d) =>
      Tables.eventsUs(s, d)
        .select(
          col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
          col("value"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    // Fan-out routing: per-destination-table row counts + value checksum
    // (the per-tag table routing the reference does on the DB side).
    "q04_etl_route" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), round(sum("value"), 4).as("checksum"))
        .orderBy("event_type"))
  )

  val oracle: Map[String, String] = Map(
    "q00_scan_limit" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q03_etl_flatten" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q04_etl_route" ->
      """SELECT event_type, count(*) AS n_rows, round(sum(value), 4) AS checksum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
