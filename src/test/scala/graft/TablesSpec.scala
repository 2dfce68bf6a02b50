package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Fixture-generation contract for `events.ts` (FIXTURES.md "Generations
  * & the ts contract"): whatever physical type the driver's refresh writes,
  * `Tables.events` must present the same epoch-ns LongType column, and
  * `Tables.eventsRange` must land its bounds on the RAW column so they
  * push to the scan (the r10 regression: filtering the normalized
  * expression lost row-group pruning on a 100 TB-shaped table).
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestBase._

  // [2024-01-08, 2024-01-15) — q13's bounds
  private val t0Ns = 1704672000L * 1000000000L
  private val t1Ns = 1705276800L * 1000000000L

  /** The live fixture rewritten with ts as epoch-ns LongType (the rounds-≤9
    * nanosAsLong read shape), for cross-generation equivalence.
    */
  private lazy val longGenDir: String = {
    val d = tmpDir("graft-events-longgen")
    Tables.events(spark, sf0001)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("events normalizes the us generation to epoch-ns LongType") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    // all fixture timestamps are whole us -> ns divisible by 1000
    assert(df.filter(col("ts") % 1000 =!= 0).count() == 0)
  }

  test("eventsRange bounds push to the raw scan in the NTZ generation") {
    val p = Tables.eventsRange(spark, sf0001, Some(t0Ns), Some(t1Ns))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"), p)
  }

  test("eventsRange agrees across fixture generations (NTZ vs long) and " +
    "with the post-normalization filter") {
    def key(dir: String) =
      Tables.eventsRange(spark, dir, Some(t0Ns), Some(t1Ns))
        .select("event_id", "ts").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ntz  = key(sf0001)
    val long = key(longGenDir)
    assert(ntz.nonEmpty && ntz == long)
    val post = Tables.events(spark, sf0001)
      .filter(col("ts") >= t0Ns && col("ts") < t1Ns)
      .select("event_id", "ts").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ntz == post)
  }

  test("open bounds: lo-only / hi-only / none partition the table") {
    val all  = Tables.events(spark, sf0001).count()
    val lo   = Tables.eventsRange(spark, sf0001, Some(t0Ns), None).count()
    val hi   = Tables.eventsRange(spark, sf0001, None, Some(t0Ns)).count()
    val none = Tables.eventsRange(spark, sf0001, None, None).count()
    assert(lo + hi == all && none == all && lo > 0 && hi > 0)
  }

  test("a TIMESTAMP (instant) generation normalizes and pushes down too") {
    // the third contract branch: a future refresh writing zoned µs
    // timestamps (instant semantics) must behave like the other two
    val d = tmpDir("graft-events-tzgen")
    Tables.events(spark, sf0001)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    assert(Tables.events(spark, d).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val key = Tables.eventsRange(spark, d, Some(t0Ns), Some(t1Ns))
      .select("event_id", "ts").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Tables.eventsRange(spark, sf0001, Some(t0Ns), Some(t1Ns))
      .select("event_id", "ts").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(key == want && key.nonEmpty)
    val p = Tables.eventsRange(spark, d, Some(t0Ns), Some(t1Ns))
      .queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"), p)
  }

  test("an unexpected ts physical type fails loudly, naming the type") {
    val d = tmpDir("graft-events-badgen")
    Tables.events(spark, sf0001).withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, d))
    assert(e.getMessage.contains("StringType"))
  }
}
