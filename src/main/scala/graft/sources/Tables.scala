package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the fixture tables (FIXTURES.md).
  *
  * The reference's data model is an append-only tagged event stream
  * (envelope + JSON payload) landed into relational tables (SURVEY.md §1;
  * the reference checkout is empty, SURVEY.md §0, so citations point at the
  * survey's reconstruction): `events` is the stream, the TPC-H-ish tables
  * are the landed/DB side.
  *
  * Scale posture: loaders are plain `spark.read.parquet` so Catalyst sees
  * the file relation directly — predicate pushdown, column pruning and
  * partition pruning all stay available; schema comes from the parquet
  * footer (no inference scan), and nothing is collected to the driver.
  */
object Tables {

  /** `events.ts` is Parquet TIMESTAMP(NANOS); Spark 4.x reads it only with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (→ LongType epoch-ns).
    * DuckDB (the oracle) reads the same column truncated to µs TIMESTAMP,
    * so all cross-engine logic works at µs: `ts div 1000` ≡ `epoch_us(ts)`
    * (SURVEY.md §7.4.1). The conf is runtime-settable; it is set defensively
    * on every load because Verify/Bench/tests each build their own session.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** epoch-µs view of the ns event timestamp (floor; all fixture ns are
    * positive, so `div` matches DuckDB's truncate-to-µs read).
    */
  val tsUs: Column = expr("ts div 1000")

  /** epoch-seconds view (floor), for time-valued RANGE window frames. */
  val tsSec: Column = expr("ts div 1000000000")

  /** Events with the envelope flattened to the µs convention. */
  def eventsUs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts_us", tsUs)
}
