package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — micro-batch file-source ingest of the `events` stream (SURVEY.md
  * §2.11), the Spark analog of the reference's AQL subscription: a
  * replayable, offset-checkpointed source of envelope rows.
  *
  * The fixture is one parquet file; [[stage]] replays it as an ordered
  * sequence of chunk files (range-partitioned on `ts`, so arrival order ≈
  * event-time order, matching how a live event stream lands) and
  * [[read]] tails the directory one file per micro-batch. The
  * `checkpointLocation` each test passes to its query is the OffsetMap
  * analog: progress survives restarts (S8).
  */
object EventStream {

  /** Staged-event schema: `ts` is already an epoch-ns long here (the
    * batch loader normalizes whatever physical type the fixture
    * generation wrote — FIXTURES.md "Generations & the ts contract" —
    * and staging writes the normalized LongType), so a streaming read
    * needs no legacy flag.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Adds the µs convention columns + an event-time TimestampType column
    * (`ts_t`, required by window()/watermark). Applied identically to the
    * batch and streaming sides so parity tests compare like with like.
    */
  def withEventTime(events: DataFrame): DataFrame =
    events
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))

  /** Splits the fixture events into `chunks` time-ordered parquet files
    * under `stagingDir` — the micro-batch replay source (see [[Staging]]
    * for the mtime-ordering caveat the sequential writes absorb).
    */
  def stage(spark: SparkSession, sfDir: String, stagingDir: String, chunks: Int): Unit =
    Staging.chunked(graft.sources.Tables.events(spark, sfDir),
      Seq(col("ts"), col("event_id")), chunks, stagingDir)

  /** Streaming read of a staged directory, one file per trigger. */
  def read(spark: SparkSession, stagingDir: String): DataFrame =
    withEventTime(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stagingDir))

  /** Batch read of the same staged directory (parity twin of [[read]]). */
  def readBatch(spark: SparkSession, stagingDir: String): DataFrame =
    withEventTime(spark.read.schema(schema).parquet(stagingDir))

  /** Appends a single sentinel event far in the future. Append-mode
    * windowed/session aggregations only emit a window once the watermark
    * passes its end; a final far-future row pushes the watermark past every
    * real window so tests can observe the complete result. Sentinel rows
    * use user_id = -1 and are excluded from comparisons.
    */
  def appendFlush(spark: SparkSession, stagingDir: String, tsNs: Long): Unit = {
    import spark.implicits._
    Seq((-1L, tsNs, -1L, "flush", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("append").parquet(stagingDir)
  }
}
