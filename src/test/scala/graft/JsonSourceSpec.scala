package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase._
import graft.sources.EventJson

/** The JSON event source must round-trip the fixture exactly (batch and
  * streaming), and malformed lines must land in the corrupt lane without
  * failing the read or polluting the parsed rows.
  */
class JsonSourceSpec extends AnyFunSuite {

  /** Fixture events re-serialized as JSONL + two malformed lines. */
  private lazy val jsonDir: String = {
    val dir = tmpDir("graft-json-events")
    graft.sources.Tables.events(spark, sf0001)
      .coalesce(2).write.mode("append").json(dir)
    // two producer bugs: truncated JSON and a type-violating envelope
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad-lines.json"),
      "{\"event_id\": 1, \"ts\": \ntotal garbage\n".getBytes("UTF-8"))
    dir
  }

  test("batch JSONL read round-trips the fixture exactly") {
    val want = graft.sources.Tables.events(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val got = EventJson.wellFormed(EventJson.read(spark, jsonDir))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("malformed lines land in the corrupt lane, not in the rows and not as a crash") {
    val df = EventJson.read(spark, jsonDir)
    val rejects = EventJson.rejects(df).collect().map(_.getString(0))
    assert(rejects.length == 2, rejects.mkString("; "))
    assert(rejects.exists(_.contains("total garbage")))
    assert(rejects.exists(_.contains("\"event_id\": 1")))
    // and the well-formed side lost nothing
    val n = graft.sources.Tables.events(spark, sf0001).count()
    assert(EventJson.wellFormed(df).count() == n)
  }

  test("streaming JSONL read equals the batch read") {
    val q = EventJson.wellFormed(EventJson.readStream(spark, jsonDir))
      .select("event_id")
      .writeStream.format("memory").queryName("jsonl").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("jsonl").collect().map(_.getLong(0)).sorted.toSeq
    val want = graft.sources.Tables.events(spark, sf0001)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }
}
