package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase._

/** EP-3 resume-from-the-database: after a full run, the DB's OffsetMap
  * must equal each stream's max landed event_id, and a complete replay
  * with a FRESH Spark checkpoint must write ZERO rows — the suppression
  * comes from the DB-resident OffsetMap alone, observable in the stats
  * table, not from Spark's own checkpoint.
  */
class DbResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    System.setProperty("derby.system.home", tmpDir("graft-dbresume-home"))
    super.beforeAll()
  }

  test("OffsetMap lives in the DB; a fresh-checkpoint replay writes nothing") {
    val url = s"jdbc:derby:${tmpDir("graft-dbresume")}/db;create=true"
    val staging = tmpDir("graft-dbresume-stage")
    EventStream.stage(spark, sf0001, staging, chunks = 3)

    val q1 = DbResume.attach(spark, staging, url,
      tmpDir("graft-dbresume-ckpt1"), runId = "run1").start()
    try q1.processAllAvailable() finally q1.stop()

    val events = graft.sources.Tables.events(spark, sf0001)
    val total = events.count()
    assert(DbResume.rowsWritten(url) == total, "first run must write every event")

    // the stored OffsetMap == per-stream max event_id
    val wantOffsets = events.groupBy("user_id").agg(max("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(DbResume.readOffsets(url) == wantOffsets)

    // full replay, FRESH checkpoint: Spark re-delivers everything; the
    // DB OffsetMap must suppress every row before the sink
    val q2 = DbResume.attach(spark, staging, url,
      tmpDir("graft-dbresume-ckpt2"), runId = "run2").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(DbResume.rowsWritten(url) == total,
      "replay wrote rows despite the DB OffsetMap lowerBound")

    // and the landed table is complete and duplicate-free
    val c = DerbySink.connect(url)
    try {
      val rs = c.createStatement().executeQuery(
        s"SELECT COUNT(*), COUNT(DISTINCT event_id) FROM ${DbResume.SINK}")
      rs.next()
      assert(rs.getLong(1) == total && rs.getLong(2) == total)
    } finally c.close()
  }
}
