package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OffsetBounds
import graft.sources.Tables

/** EP-1 offset-bounded query semantics (SURVEY §3.1): the OffsetMap is the
  * reference's unit of progress, so the load-bearing property is that a
  * consumer which checkpoints at OffsetMap C and resumes sees exactly the
  * events it skipped — `(∅, C] ⊎ (C, head] = (∅, head]`, disjoint, no loss,
  * no duplicates.
  */
class OffsetBoundsSpec extends AnyFunSuite {
  import SparkTestBase._

  private val streams = Seq(1L, 2L, 3L)

  test("offsets are per-stream contiguous from 0") {
    val offs = OffsetBounds.withOffsets(Tables.eventsUs(spark, sf0001))
      .filter(col("user_id").isin(streams: _*))
      .select("user_id", "stream_offset").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.map(_.getLong(1)).sorted }
    offs.foreach { case (u, seq) =>
      assert(seq.head == 0L, s"stream $u does not start at offset 0")
      assert(seq.last == seq.length - 1, s"stream $u offsets not contiguous")
    }
  }

  test("resume from a checkpoint OffsetMap yields exactly the skipped suffix") {
    val ev = Tables.eventsUs(spark, sf0001)
    // head OffsetMap = each stream's current max offset (the "present").
    val head = OffsetBounds.withOffsets(ev)
      .filter(col("user_id").isin(streams: _*))
      .groupBy("user_id").agg(max("stream_offset").as("hi"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val checkpoint = head.map { case (u, hi) => u -> hi / 2 }

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("event_id").collect().map(_.getLong(0)).toSet

    val upTo = ids(OffsetBounds.queryBounded(ev, Map.empty, checkpoint))
    val after = ids(OffsetBounds.queryBounded(ev, checkpoint, head))
    val all = ids(OffsetBounds.queryBounded(ev, Map.empty, head))

    assert(upTo.intersect(after).isEmpty, "prefix and resume overlap (duplicates)")
    assert(upTo.union(after) == all, "prefix + resume loses or invents events")
    assert(upTo.nonEmpty && after.nonEmpty)
  }

  test("property: queryBounded == the Scala reference model on random OffsetMaps") {
    // the fixture's per-stream offsets, computed once in plain Scala
    val byStream: Map[Long, Seq[Long]] = Tables.eventsUs(spark, sf0001)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ev = Tables.eventsUs(spark, sf0001)
    val rnd = new scala.util.Random(20260812L)
    val streamIds = byStream.keys.toSeq.sorted

    (1 to 8).foreach { _ =>
      val picked = rnd.shuffle(streamIds).take(1 + rnd.nextInt(4))
      val upper = picked.map { u =>
        u -> rnd.nextInt(byStream(u).size + 5).toLong // may exceed the stream
      }.toMap
      val lower = picked.filter(_ => rnd.nextBoolean()).map { u =>
        u -> (rnd.nextInt(byStream(u).size).toLong - 1)
      }.toMap

      val got = OffsetBounds.queryBounded(ev, lower, upper)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val want = upper.flatMap { case (u, hi) =>
        val lo = lower.getOrElse(u, -1L)
        byStream(u).zipWithIndex
          .filter { case (_, off) => off > lo && off <= hi }
          .map(_._1)
      }.toSet
      assert(got == want, s"lower=$lower upper=$upper")
    }
  }

  test("streams absent from the upper OffsetMap are excluded") {
    val got = OffsetBounds.queryBounded(
      Tables.eventsUs(spark, sf0001), Map.empty, Map(2L -> 10L))
    assert(got.select("user_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(got.count() == 11) // offsets 0..10 inclusive
  }
}
