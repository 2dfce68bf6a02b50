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

  /** Fixture generations have written `events.ts` two ways: Parquet
    * TIMESTAMP(NANOS) (rounds ≤9; Spark 4.x reads it only with
    * `spark.sql.legacy.parquet.nanosAsLong=true` → LongType epoch-ns) and
    * TIMESTAMP(MICROS) (the r10 driver refresh → TIMESTAMP_NTZ). The
    * engine-wide convention stays LongType epoch-ns — [[events]]
    * normalizes the µs generation to it at load, so every consumer keeps
    * `ts div 1000` ≡ DuckDB's `epoch_us(ts)` (SURVEY.md §7.4.1). Both
    * confs are runtime-settable; set defensively on every load because
    * Verify/Bench/tests each build their own session.
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
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // NANOS read as epoch-ns
      case _ =>
        // µs-generation fixture (TIMESTAMP_NTZ): normalize to the engine's
        // epoch-ns LongType convention. The cast NTZ → TIMESTAMP reads the
        // wall time in the SESSION zone, so pin UTC first (every entry
        // point already does; this is the same defensive pattern as the
        // nanosAsLong set above) — then unix_micros is the exact epoch-µs
        // integer and ·1000 the exact ns. Stays a per-row projection over
        // the scan: pushdown/pruning on every other column is unaffected.
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
    }
  }
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
