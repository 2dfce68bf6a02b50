package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §3.1 EP-1 — offset-bounded queries: the reference's bounded `query`
  * endpoint takes `lowerBound`/`upperBound` OffsetMaps
  * (`Map[StreamId, Offset]`, offsets per-stream contiguous) and returns
  * exactly the events strictly after `lower` and at-or-before `upper` in
  * each stream (SURVEY §3.1). Fixture mapping per SURVEY §1.2:
  * `user_id` ≈ stream, and the per-stream offset is the event's rank
  * within its stream in `event_id` (lamport) order.
  *
  * Scale posture: in a production ingest the stream offset is assigned
  * once at append time and stored; [[withOffsets]] derives it on the fly
  * for the fixtures — one hash-partition-by-stream shuffle with
  * per-stream sort, embarrassingly parallel across streams, no global
  * ordering anywhere. The OffsetMap itself is metadata-scale (one row per
  * stream), so [[queryBounded]] applies it as a broadcast hash join
  * against the event scan — the big side never shuffles for the bounds.
  */
object OffsetBounds {
  type Q = (SparkSession, String) => DataFrame

  /** Adds `stream_offset`: the per-stream contiguous sequence number
    * (0-based rank within `user_id` by `event_id`).
    */
  def withOffsets(events: DataFrame): DataFrame =
    events.withColumn("stream_offset",
      row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")).cast("long") - 1)

  /** Events with `lower(stream) < offset <= upper(stream)` per stream.
    * Actyx bound semantics: `lower` exclusive, `upper` inclusive; streams
    * absent from `upper` are excluded (the upper OffsetMap defines the
    * snapshot); streams absent from `lower` start from offset 0.
    */
  def queryBounded(events: DataFrame,
                   lower: Map[Long, Long],
                   upper: Map[Long, Long]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val bounds = upper.toSeq
      .map { case (uid, hi) => (uid, lower.getOrElse(uid, -1L), hi) }
      .toDF("user_id", "lo", "hi")
    // r17 (guide §2.3/§2.4): streams absent from `upper` are EXCLUDED by
    // the inner bounds join anyway, and `stream_offset` is ranked per
    // stream — so dropping the un-queried streams BEFORE the ranking
    // window leaves every surviving row's offset identical while the
    // window exchange shrinks from the whole corpus to just the queried
    // streams. The predicate is a scan-pushable IN over the stream key
    // (PushedFilters: In(user_id)); at 100 TB this is the difference
    // between shuffling every stream and shuffling the requested ones.
    withOffsets(events.filter(col("user_id").isin(upper.keys.toSeq: _*)))
      .join(broadcast(bounds), "user_id")
      .filter(col("stream_offset") > col("lo") && col("stream_offset") <= col("hi"))
      .drop("lo", "hi")
  }

  // The registry entry's fixed OffsetMaps (chosen to select rows at every
  // fixture SF: each stream holds ≳50 events at sf0.001 and grows with SF).
  val lowerFixture: Map[Long, Long] = Map(1L -> 5L, 3L -> 10L)
  val upperFixture: Map[Long, Long] = Map(1L -> 40L, 2L -> 25L, 3L -> 50L)

  val queries: Map[String, Q] = Map(
    "q1A_offset_bounded" -> ((s, d) =>
      queryBounded(Tables.eventsUs(s, d), lowerFixture, upperFixture)
        .select("event_id", "user_id", "stream_offset", "event_type", "value")
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "q1A_offset_bounded" ->
      """WITH offs AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
        |    AS stream_offset
        |  FROM events),
        |bounds(user_id, lo, hi) AS (VALUES (1, 5, 40), (2, -1, 25), (3, 10, 50))
        |SELECT o.event_id, o.user_id, o.stream_offset, o.event_type, o.value
        |FROM offs o JOIN bounds b USING (user_id)
        |WHERE o.stream_offset > b.lo AND o.stream_offset <= b.hi
        |ORDER BY o.event_id""".stripMargin
  )
}
