package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase._
import graft.sources.Lake
import graft.streaming.EventStream

/** Partitioned-lake landing: the layout must round-trip, a partition
  * predicate must prune DIRECTORIES (PartitionFilters at the scan, data
  * filters empty for a partition-only query), and the streaming sink
  * must stay exactly-once across a checkpointed restart.
  */
class LakeSpec extends AnyFunSuite {

  test("partitioned landing round-trips and prunes partitions at the scan") {
    val path = tmpDir("graft-lake")
    val events = graft.sources.Tables.events(spark, sf0001)
    Lake.write(events, path, "event_type")

    // layout: hive-style directories per tag
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("event_type=")).sorted
    val want = events.select("event_type").distinct()
      .collect().map("event_type=" + _.getString(0)).sorted
    assert(dirs.toSeq == want.toSeq)

    // round-trip: same rows (partition col moves to the end, so compare sets)
    val back = Lake.read(spark, path)
    assert(back.count() == events.count())
    val q = back.filter(col("event_type") === "purchase")
    val wantN = events.filter(col("event_type") === "purchase").count()
    assert(q.count() == wantN)

    // the predicate is a PartitionFilter — nothing reaches the row scan
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "partition predicate did not reach partition pruning")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "event_type")),
      s"event_type leaked into data filters: ${scan.dataFilters}")
  }

  test("streaming lake sink is exactly-once across a checkpointed restart") {
    val staging = tmpDir("graft-lake-stage")
    val path = tmpDir("graft-lake-sink")
    val ckpt = tmpDir("graft-lake-ckpt")
    EventStream.stage(spark, sf0001, staging, chunks = 2)

    def run(): Unit = {
      val q = Lake.attach(
        EventStream.read(spark, staging)
          .select("event_id", "ts", "user_id", "event_type", "value"),
        path, ckpt, "event_type").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(Lake.read(spark, path).count() == total)

    // restart from the SAME checkpoint: committed batches never re-land
    run()
    assert(Lake.read(spark, path).count() == total,
      "restart re-landed already-committed batches")

    val sparkS = spark
    import sparkS.implicits._
    Seq((900001L, 1234L, 7L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(staging)
    run()
    assert(Lake.read(spark, path).count() == total + 1,
      "new chunk after restart did not land exactly once")
  }
}
