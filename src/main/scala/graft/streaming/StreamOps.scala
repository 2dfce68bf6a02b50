package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row as seen by the stateful op (S9). */
case class EvRow(user_id: Long, value: Double)

/** Running per-user balance emitted by S9 after each micro-batch.
  * `n_events` is strictly increasing per user, so "the row with the
  * largest n_events" is the final state regardless of sink row order.
  */
case class Balance(user_id: Long, n_events: Long, balance: Double)

/** One monotonic-subscription delivery (S10): an `event` in per-stream
  * key order, or a `timeTravel` reset naming the key to rewind to.
  */
case class Delivery(user_id: Long, kind: String, event_id: Long)

/** One (band, band-hash) bucket observation of a document (S12). */
case class DocBand(band: Int, bh: Long, doc_id: Long,
    ts_t: java.sql.Timestamp)

/** One streaming near-dup CANDIDATE pair (S12), id_a < id_b. */
case class CandPair(id_a: Long, id_b: Long)

/** One bucket observation carrying the doc's sorted shingle-hash set
  * (S13 — the verify needs the exact sets, not just ids).
  */
case class ShingleBand(band: Int, bh: Long, doc_id: Long,
    sh: Array[Long], ts_t: java.sql.Timestamp)

/** One VERIFIED streaming near-dup pair (S13), id_a < id_b, `jac_bp` the
  * exact Jaccard in basis points — the same output row as q7N's batch
  * pair table.
  */
case class SurvivorPair(id_a: Long, id_b: Long, jac_bp: Long)

/** S2–S6, S9–S10 — the streaming transforms (SURVEY.md §2.11).
  *
  * Every transform is a plain `DataFrame => DataFrame` applied identically
  * to a `readStream` source or a batch read: Structured Streaming's
  * incrementalization (`IncrementalExecution`) is what makes the same
  * declarative plan run as a stateful micro-batch pipeline. Parity tests
  * (StreamingParitySpec) assert stream(chunks) == batch(all) per op.
  *
  * These are deliberately NOT in `SparkEntry.queries`: the bench harness
  * calls `.count()` on every registry entry, which streaming DataFrames
  * don't support (SURVEY.md §2.0).
  */
object StreamOps {

  /** 100 TB state posture: the default HDFS-backed state store keeps
    * every key's state deserialized on the executor heap, which is fine
    * while keyed state is O(streams) but becomes the memory wall once a
    * deployment tracks hundreds of millions of keys. RocksDB keeps state
    * on executor-local disk with incremental snapshot checkpointing, so
    * state size is bounded by disk, not heap. Session-wide; queries read
    * the provider at start. StreamingParitySpec re-runs S9/S10 under
    * this provider to pin that the stateful ops don't depend on
    * HDFS-backed semantics.
    */
  def useRocksDBStateStore(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** S2 — tumbling 1 h counts per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** S3 — sliding 1 h window every 15 min: count + value sum. */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_v"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_v"))

  /** S4 — session windows with a 30 min gap, per user (streaming twin of
    * the batch q58 sessionizer). Streaming use requires a watermark on
    * `ts_t` upstream.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_t"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("session_len"))
      .select(col("user_id"), col("w.start").as("s_start"), col("session_len"))

  /** S5 — watermarked tumbling counts: rows later than `lateness` behind
    * the max seen event time are dropped (the engine-side replacement for
    * the reference's client-side `timeTravel` late-data signal).
    */
  def watermarkedCounts(events: DataFrame, lateness: String): DataFrame =
    tumblingCounts(events.withWatermark("ts_t", lateness))

  /** S6 — streaming dedup by event_id within the watermark (the
    * at-least-once → effectively-exactly-once half that doesn't need the
    * sink: duplicate deliveries inside the lateness bound are suppressed
    * engine-side).
    */
  def dedup(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts_t", lateness).dropDuplicates("event_id")

  /** S11 — stream-stream interval join: every purchase joined to the
    * same user's clicks at most 30 minutes earlier (the streaming twin of
    * the batch q38 interval join). BOTH sides carry a watermark and the
    * join predicate bounds purchase_ts relative to click_ts, which is
    * what lets the engine EVICT state: a buffered click can be dropped
    * once the purchase-side watermark passes click_ts + 30 min, so join
    * state is O(events in the lateness+interval horizon), never O(all
    * events seen). Without both pieces Spark must buffer every row
    * forever — the unbounded-state trap this op exists to demonstrate
    * avoiding. Inner joins emit matches eagerly (the watermark bounds
    * state, it does not delay output), so append-mode parity with the
    * batch twin is exact.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_t").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_t").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** S9 — custom stateful op: running per-user (event count, balance) via
    * flatMapGroupsWithState, emitting the updated state each micro-batch.
    * State is one (count, sum) pair per user — O(users), not O(events).
    */
  /** S10 — `subscribe_monotonic` (SURVEY §3.1 EP-2): delivers each
    * stream's events in event-key (lamport) order; when a micro-batch
    * brings a key at or below the highest key already DELIVERED — a past
    * event arriving late via gossip — it emits one `timeTravel` marker
    * carrying the smallest such key, which is where the reference ends
    * the subscription and the client rewinds to. In-batch disorder is
    * absorbed by the per-batch sort (the merge over pre-sorted per-node
    * runs); only cross-batch regressions time-travel. State is one long
    * per stream — O(streams), like every op here.
    */
  def monotonic(events: DataFrame): Dataset[Delivery] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val maxSeen = state.getOption.getOrElse(Long.MinValue)
          val keys = rows.map(_._2).toArray.sorted
          val late = keys.filter(_ <= maxSeen)
          val fresh = keys.filter(_ > maxSeen)
          if (keys.nonEmpty) state.update(math.max(maxSeen, keys.last))
          val tt = late.headOption.map(k => Delivery(uid, "timeTravel", k)).iterator
          tt ++ fresh.iterator.map(k => Delivery(uid, "event", k))
      }
  }

  /** S12 — STREAMING near-dup candidate detection: q7A's MinHash + LSH
    * banding run ON THE STREAM, so a 100 TB ingest can flag near-dups at
    * arrival instead of re-scanning the lake in batch. The per-row part
    * is identical to q7A by construction (shared shingle SQL via
    * [[graft.operators.LlmOps.ShingleSql]], the same codegen'd
    * `graft_minhash_row` signature, the same 32 bands of 2): each doc
    * explodes to its (band, band_hash) bucket keys, and a
    * `flatMapGroupsWithState` keyed BY BUCKET keeps the doc ids seen in
    * that bucket, emitting a candidate pair the moment a new doc lands in
    * a bucket with history — pairs among same-batch arrivals included.
    *
    * State is WATERMARK-BOUNDED: `docs` must carry a watermarked `ts_t`
    * ingest time, and each bucket's timeout re-arms to (the bucket's
    * running max event time + horizonMs); once the watermark passes that — no arrivals in
    * the bucket for a full horizon — the bucket's id list is dropped
    * (EventTimeTimeout), so state is O(buckets active in the horizon),
    * never O(corpus). A doc arriving after its twin's bucket expired is
    * not flagged — the declared trade of any horizon-bounded streaming
    * dedup; the batch q7A/q7N sweep remains the exhaustive pass.
    *
    * Like q7A, docs with EMPTY shingle sets are excluded before banding
    * (their all-identical signatures would pile into one hot bucket),
    * and a pair colliding in several bands emits once per band — the
    * downstream verify/apply stage deduplicates, exactly as q7A's
    * `.distinct()` does before its Jaccard verify.
    *
    * Engine surface, not a registry entry (`queries` stays batch-only,
    * SURVEY §2.0); parity + eviction pinned in StreamingParitySpec.
    *
    * STATE SCHEMA v2 (r9): bucket state is `(maxEventMs, ids)` — the r8
    * shape was bare `Array[Long]`. Spark's state-store schema check
    * rejects a v1 checkpoint on restart; an upgrading deployment must
    * start this query from a FRESH checkpointLocation (the horizon
    * re-warms within one TTL; the batch q7A/q7N sweep covers the gap),
    * the same operational rule Spark itself applies to stateful-operator
    * schema changes.
    */
  def nearDupCandidates(docs: DataFrame,
      horizonMs: Long = 3600L * 1000): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.MinHash.register(spark)
    graft.functions.Shingles.register(spark)
    val nBands = graft.functions.MinHash.K / 2
    val banded = docs
      .select(col("doc_id"), col("ts_t"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ts_t"),
        expr(graft.operators.LlmOps.ShingleSql).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("ts_t"),
        expr("graft_minhash_row(shingles)").as("sig"))
      .select(col("doc_id"), col("ts_t"),
        explode(expr(graft.operators.LlmOps.bandSql(nBands))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("doc_id"), col("ts_t"))
      .as[DocBand]
    banded.groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[DocBand],
            state: GroupState[(Long, Array[Long])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toArray
            val (seenMaxTs, seen) =
              state.getOption.getOrElse((Long.MinValue, Array.empty[Long]))
            val seenSet = seen.toSet
            val fresh = batch.map(_.doc_id).distinct.sorted
              .filterNot(seenSet)
            // every pair with ≥1 fresh member, enumerated as fresh×seen
            // plus fresh×fresh directly — NOT a filter over all (seen ∪
            // fresh)² pairs, which would re-scan a hot bucket's full
            // history quadratically on every batch that adds one doc.
            // Each pair still emits exactly once per bucket lifetime
            // (its later-arriving member is fresh exactly once).
            val out = (for {
              f <- fresh.iterator
              s <- seen.iterator
            } yield if (s < f) CandPair(s, f) else CandPair(f, s)) ++ (for {
              i <- fresh.indices.iterator
              j <- (i + 1 until fresh.length).iterator
            } yield CandPair(fresh(i), fresh(j)))
            // re-arm the TTL off the bucket's RUNNING max event time, kept
            // in state (not getCurrentWatermarkMs, which batch parity runs
            // don't have). A late-but-within-watermark arrival with a
            // smaller ts must never LOWER an already-armed timeout, or the
            // bucket could evict before "one full horizon after the latest
            // arrival" — hence max(stored, batch).
            val maxTs = math.max(seenMaxTs, batch.map(_.ts_t.getTime).max)
            state.update((maxTs, seen ++ fresh))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out
          }
      }
  }

  /** S13 — STREAMING near-dup SURVIVORS: S12's candidate detection with
    * the exact-Jaccard verify moved INTO the stream, so an ingest
    * pipeline gets drop verdicts at arrival instead of candidate pairs
    * it must re-check in batch. Each bucket's state carries, besides the
    * ids, every member doc's sorted shingle-HASH set (xxhash64 per
    * 3-shingle — 8 bytes/shingle instead of a string; two sets' hashed
    * Jaccard equals their exact Jaccard absent a 64-bit collision inside
    * one pair's union, odds ~|union|²/2⁶⁴); when a fresh doc lands in a
    * bucket with history, the candidate pairs verify IN-STATE with
    * [[graft.functions.SortedIntersect.isectGeSortedLongs]] — the same
    * threshold-aware early-exit walk as q7N's batch kernel, same τ = 3/5
    * and integer jac_bp — and only SURVIVORS are emitted.
    *
    * Emission is AT-LEAST-ONCE per pair: a surviving pair verifies once
    * per bucket lifetime per colliding band (a true near-dup collides in
    * most of the 32 bands). Verified pairs are rare by the near-dup
    * premise, and every sink in this engine already absorbs replays via
    * idempotent keyed MERGE — consumers dedup by (id_a, id_b), exactly
    * as the S12 scaladoc prescribes for candidates. (A once-globally
    * emission would need cross-bucket coordination — a second stateful
    * stage Spark does not allow after flatMapGroupsWithState, or
    * min-band election that silently LOSES pairs when the elected band's
    * bucket evicts before a hot sibling bucket pairs them.)
    *
    * Same watermark/TTL contract as [[nearDupCandidates]]: state is
    * O(docs in active buckets within the horizon) — each doc's shingle
    * set is held once per band bucket, the declared memory trade for
    * in-stream verification; a doc arriving after its twin's bucket
    * expired is not flagged, and the batch q7N sweep remains the
    * exhaustive pass. Parity vs q7N's batch pairs, TTL eviction, and
    * RocksDB are pinned in StreamingParitySpec.
    *
    * Picking `horizonMs` (measured, `graft.Scale ingest` / SCALING.md
    * r12 soak): recall of the keep-all run's distinct drop verdicts was
    * 0.65 / 0.76 / 0.89 at 5 s / 10 s / 20 s horizons over a ~50 s
    * event span, while the state plateau grew roughly linearly with the
    * horizon (383 k / 542 k / 858 k rows) — so size the horizon from
    * the target dedup recall (recall's marginal gain falls; state is
    * the cheaper axis) and leave the tail to the batch q7N sweep.
    */
  def nearDupSurvivors(docs: DataFrame,
      horizonMs: Long = 3600L * 1000): Dataset[SurvivorPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.MinHash.register(spark)
    graft.functions.Shingles.register(spark)
    val nBands = graft.functions.MinHash.K / 2
    val banded = docs
      .select(col("doc_id"), col("ts_t"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ts_t"),
        expr(graft.operators.LlmOps.ShingleSql).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("ts_t"),
        // hash each shingle; re-sort and re-distinct because xxhash64
        // does not preserve the strings' order (and could collide)
        expr("array_sort(array_distinct(transform(shingles, x -> xxhash64(x))))")
          .as("sh"),
        expr("graft_minhash_row(shingles)").as("sig"))
      .select(col("doc_id"), col("ts_t"), col("sh"),
        explode(expr(graft.operators.LlmOps.bandSql(nBands))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("doc_id"), col("sh"), col("ts_t"))
      .as[ShingleBand]
    banded.groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[ShingleBand],
            state: GroupState[(Long, Array[Long], Array[Array[Long]])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toArray
            val (seenMaxTs, seenIds, seenSh) = state.getOption
              .getOrElse((Long.MinValue, Array.empty[Long],
                Array.empty[Array[Long]]))
            val seenSet = seenIds.toSet
            // one row per doc per bucket key by construction; replays of
            // an already-seen id are dropped like S12's
            val fresh = batch.filterNot(b => seenSet(b.doc_id))
              .groupBy(_.doc_id).map(_._2.head).toArray.sortBy(_.doc_id)
            // fresh×seen plus fresh×fresh — the S12 enumeration (linear
            // in history per fresh doc, never a rescan of all pairs) —
            // but each pair VERIFIES before it may emit
            def verified(aId: Long, aSh: Array[Long],
                bId: Long, bSh: Array[Long]): Option[SurvivorPair] = {
              val inter = graft.functions.SortedIntersect
                .isectGeSortedLongs(aSh, bSh, 3, 5)
              if (inter < 0) None
              else {
                val uni = aSh.length.toLong + bSh.length - inter
                Some(SurvivorPair(math.min(aId, bId), math.max(aId, bId),
                  inter.toLong * 10000 / uni))
              }
            }
            val out = (for {
              f <- fresh.iterator
              k <- seenIds.indices.iterator
              p <- verified(f.doc_id, f.sh, seenIds(k), seenSh(k)).iterator
            } yield p) ++ (for {
              i <- fresh.indices.iterator
              j <- (i + 1 until fresh.length).iterator
              p <- verified(fresh(i).doc_id, fresh(i).sh,
                fresh(j).doc_id, fresh(j).sh).iterator
            } yield p)
            // TTL re-arms off the bucket's RUNNING max event time — the
            // same never-lower-an-armed-timeout rule as S12
            val maxTs = math.max(seenMaxTs, batch.map(_.ts_t.getTime).max)
            state.update((maxTs, seenIds ++ fresh.map(_.doc_id),
              seenSh ++ fresh.map(_.sh)))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out
          }
      }
  }

  def runningBalance(events: DataFrame): Dataset[Balance] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[EvRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EvRow], state: GroupState[(Long, Double)]) =>
          val (n0, b0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var b = b0
          rows.foreach { r => n += 1; b += r.value }
          state.update((n, b))
          Iterator(Balance(uid, n, b))
      }
  }
}
