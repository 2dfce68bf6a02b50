package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase._
import graft.operators.Windows

/** S1–S6 + S9 batch-parity tests (SURVEY.md §5.4): each streaming op,
  * replayed over the fixture split into micro-batch chunks, must equal its
  * batch twin computed over the same rows in one pass. Exact equality for
  * counts/keys/window bounds; 1e-6 tolerance for floating sums (stream
  * state accumulates in arrival order, batch in partition order).
  */
class StreamingParitySpec extends AnyFunSuite {

  private lazy val stagedDir: String = {
    val dir = tmpDir("graft-stream")
    EventStream.stage(spark, sf0001, dir, chunks = 4)
    dir
  }

  /** Runs a streaming transform to a memory sink until exhausted. */
  private def runStream(name: String, out: DataFrame, mode: String): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("S1: micro-batch file ingest delivers every event exactly once") {
    val got = runStream("s1",
      EventStream.read(spark, stagedDir).select("event_id"), "append")
    val ids = got.collect().map(_.getLong(0))
    val want = EventStream.readBatch(spark, stagedDir)
      .select("event_id").collect().map(_.getLong(0))
    assert(ids.length == want.length)
    assert(ids.toSet == want.toSet)
  }

  test("S2: tumbling 1h counts — stream == batch") {
    val got = runStream("s2",
      StreamOps.tumblingCounts(EventStream.read(spark, stagedDir)), "complete")
    val want = StreamOps.tumblingCounts(EventStream.readBatch(spark, stagedDir))
    assert(rowsOf(got) == rowsOf(want))
  }

  test("S3: sliding 1h/15m stats — stream == batch (sums at 1e-6)") {
    val got = runStream("s3",
      StreamOps.slidingStats(EventStream.read(spark, stagedDir)), "complete")
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = StreamOps.slidingStats(EventStream.readBatch(spark, stagedDir))
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) <= 1e-6, k) }
  }

  test("S4: session windows — stream == batch == q58 session counts") {
    // separate staging dir: the flush sentinel must not pollute other tests
    val dir = tmpDir("graft-s4")
    EventStream.stage(spark, sf0001, dir, chunks = 4)
    val maxTs = EventStream.readBatch(spark, dir).agg(max("ts")).collect()(0).getLong(0)

    val stream = StreamOps.sessionCounts(
      EventStream.read(spark, dir).withWatermark("ts_t", "10 minutes"))
    val q = stream.writeStream.format("memory").queryName("s4").outputMode("append").start()
    try {
      q.processAllAvailable()
      // push the watermark past every real session so append mode emits them
      EventStream.appendFlush(spark, dir, maxTs + 10L * 86400 * 1000000000L)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s4").filter(col("user_id") =!= -1L)

    val want = StreamOps.sessionCounts(
      EventStream.readBatch(spark, dir).filter(col("user_id") =!= -1L))
    assert(rowsOf(got) == rowsOf(want))

    // cross-check against the batch q58 sessionizer: same per-user session
    // count (session_window's >=gap split vs q58's >gap split only differ
    // on exact-30-min gaps, absent from the random-ns fixture)
    val gotPerUser = got.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q58 = Windows.sessionize(
      EventStream.readBatch(spark, dir).filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("ts_us"), col("event_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPerUser == q58)
  }

  test("S5: watermark drops data later than the lateness bound") {
    import spark.implicits._
    val dir = tmpDir("graft-s5")
    val H = 3600L * 1000000000L // 1h in ns
    def ev(id: Long, tsNs: Long) = (id, tsNs, 1L, "click", 1.0, "{}")
    // file 1: three events in hour 0, two in hour 2
    Seq(ev(1, 10), ev(2, H / 2), ev(3, H - 1), ev(4, 2 * H + 10), ev(5, 2 * H + 20))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1) // ONE file → one micro-batch → deterministic watermark
      .write.mode("append").parquet(dir)

    val stream = StreamOps.watermarkedCounts(EventStream.read(spark, dir), "10 minutes")
    val q = stream.writeStream.format("memory").queryName("s5").outputMode("append").start()
    try {
      q.processAllAvailable() // watermark now ≈ 2h50m — hour-0 window expired
      // file 2: one too-late event for hour 0, one fresh event in hour 3
      Seq(ev(6, 20), ev(7, 3 * H + 10))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      // flush: close all remaining windows
      EventStream.appendFlush(spark, dir, 30 * H)
      q.processAllAvailable()
    } finally q.stop()

    val counts = spark.table("s5").filter(col("event_type") === "click")
      .collect().map(r => r.getTimestamp(0).toInstant.getEpochSecond -> r.getLong(2)).toMap
    // hour-0 window counted 3 events — the late 4th was dropped
    assert(counts(0L) == 3L, s"late event leaked into hour-0: $counts")
    assert(counts(7200L) == 2L)
    assert(counts(10800L) == 1L)
  }

  test("S6: streaming dedup by event_id suppresses replayed chunks") {
    val dir = tmpDir("graft-s6")
    EventStream.stage(spark, sf0001, dir, chunks = 2)
    // replay the whole corpus a second time = duplicate delivery
    graft.sources.Tables.events(spark, sf0001)
      .repartitionByRange(2, col("ts"), col("event_id"))
      .write.mode("append").parquet(dir)
    val got = runStream("s6",
      StreamOps.dedup(EventStream.read(spark, dir), "30 days")
        .select("event_id"), "append")
    val ids = got.collect().map(_.getLong(0))
    val want = graft.sources.Tables.events(spark, sf0001)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids.length == want.size, "duplicates leaked through dedup")
    assert(ids.toSet == want)
  }

  /** S10's scenario + assertions, parameterized so it can run under more
    * than one state-store provider.
    */
  private def checkMonotonic(name: String): Unit = {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmpDir(s"graft-$name")
    def drop(rows: Seq[(Long, Long)]): Unit = {
      rows.map { case (u, k) => (k, k * 1000L, u, "e", 0.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5) // distinct mtimes → deterministic micro-batch order
    }
    // batch 1: stream 1 gets keys 5,1,2 (disordered IN batch — no reset),
    // stream 2 gets 10. batch 2: stream 1 gets key 3 — BELOW delivered 5
    // → timeTravel(3); stream 2 gets 11 — plain delivery.
    drop(Seq((1L, 5L), (1L, 1L), (1L, 2L), (2L, 10L)))
    drop(Seq((1L, 3L), (2L, 11L)))

    val got = runStream(name,
      StreamOps.monotonic(EventStream.read(spark, dir)).toDF, "append")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val s1 = got.filter(_._1 == 1L).toSeq
    val s2 = got.filter(_._1 == 2L).toSeq
    // batch-1 disorder was absorbed by the in-batch sort: events 1,2,5 in
    // key order, no timeTravel yet; batch 2's key 3 < delivered 5 → reset
    assert(s1 == Seq((1L, "event", 1L), (1L, "event", 2L), (1L, "event", 5L),
      (1L, "timeTravel", 3L)), s"stream 1 deliveries: $s1")
    assert(s2 == Seq((2L, "event", 10L), (2L, "event", 11L)), s"stream 2: $s2")
  }

  /** S9's parity assertions, parameterized like [[checkMonotonic]]. */
  private def checkRunningBalance(name: String): Unit = {
    val got = runStream(name,
      StreamOps.runningBalance(EventStream.read(spark, stagedDir)).toDF, "update")
    // the row with the largest n_events per user is the final state
    val finalRows = got.collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.maxBy(_.getLong(1)) }
    val want = EventStream.readBatch(spark, stagedDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finalRows.keySet == want.keySet)
    finalRows.foreach { case (u, row) =>
      val (n, s) = want(u)
      assert(row.getLong(1) == n, s"user $u event count")
      assert(math.abs(row.getDouble(2) - s) <= 1e-6, s"user $u balance")
    }
  }

  test("S10: monotonic subscription orders in-batch, time-travels on cross-batch late keys") {
    checkMonotonic("s10")
  }

  test("S9: stateful running balance — final state == batch aggregate") {
    checkRunningBalance("s9")
  }

  test("S9+S10+S12+S13 under the RocksDB state store (the 100 TB keyed-state posture)") {
    StreamOps.useRocksDBStateStore(spark)
    try {
      checkRunningBalance("s9rocks")
      checkMonotonic("s10rocks")
      checkNearDupTtl("s12rocks")
      checkSurvivorTtl("s13rocks")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Stages the fixture documents as time-ordered chunk files with a
    * fabricated ingest time (`ts` epoch-µs, doc_id-spaced) — the S12
    * replay source.
    */
  private def stageDocs(dir: String, chunks: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id"))
    val bucketed = graft.sources.Tables.documents(spark, sf0001)
      // base offset: the initial watermark is epoch 0, and a row AT the
      // watermark is late — doc 0 must not sit exactly on it
      .select(col("doc_id"), col("text"),
        (lit(86400000000L) + col("doc_id") * 1000000L).as("ts"))
      .withColumn("__bucket", ntile(chunks).over(w))
      .cache()
    try (1 to chunks).foreach { b =>
      bucketed.filter(col("__bucket") === b).drop("__bucket")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5)
    } finally bucketed.unpersist()
  }

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.LongType)))

  private def readDocs(dir: String): DataFrame =
    spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts_t", timestamp_micros(col("ts")))
      .withWatermark("ts_t", "10 minutes")

  private def readDocsBatch(dir: String): DataFrame =
    spark.read.schema(docSchema).parquet(dir)
      .withColumn("ts_t", timestamp_micros(col("ts")))

  test("S12: streaming near-dup candidates — stream == batch, q7A pairs ⊆ candidates") {
    val dir = tmpDir("graft-s12")
    stageDocs(dir, 4)
    val wide = 10L * 365 * 86400 * 1000 // horizon >> fixture span: no eviction
    val got = runStream("s12",
      StreamOps.nearDupCandidates(readDocs(dir), wide).toDF, "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = StreamOps.nearDupCandidates(readDocsBatch(dir), wide)
      .collect().map(p => (p.id_a, p.id_b)).toSet
    assert(want.nonEmpty, "fixture has no band collisions — precondition broken")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // the batch q7A VERIFIED near-dups must all have been flagged as
    // candidates on the stream (banding is shared by construction)
    val q7a = graft.SparkEntry.queries("q7A_dedup_minhash")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q7a.nonEmpty && q7a.subsetOf(got),
      s"q7A pairs lost on the stream: ${(q7a -- got).take(5)}")
  }

  /** S12's eviction scenario + assertions, parameterized (like
    * [[checkMonotonic]]) so it can run under more than one state-store
    * provider.
    */
  private def checkNearDupTtl(name: String): Unit = {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmpDir(s"graft-$name")
    val H = 3600L * 1000000L // 1h in µs
    def drop(id: Long, text: String, tsUs: Long): Unit = {
      Seq((id, text, tsUs)).toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5)
    }
    val dup = "alpha beta gamma delta epsilon"
    drop(1, dup, H) // NOT epoch 0: a row at the initial watermark is late
    val stream = StreamOps.nearDupCandidates(readDocs(dir),
      horizonMs = 3600L * 1000).toDF // 1h TTL
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // doc 1 seeds its buckets (TTL arms at 2h)
      drop(2, "omega psi chi phi upsilon", 4 * H)
      q.processAllAvailable() // wm → 3h50m after this batch
      drop(3, "one two three four five", 4 * H + 60000000L)
      q.processAllAvailable() // doc-1 buckets (idle, TTL 2h < wm) evict HERE
      drop(4, dup, 4 * H + 120000000L)
      q.processAllAvailable() // twin of doc 1 — but the bucket is gone
      drop(5, dup, 4 * H + 180000000L)
      q.processAllAvailable() // control: same-horizon twin pairs normally
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 4L)),
      "pair across the expired horizon — bucket state not evicted")
    assert(got.contains((4L, 5L)),
      "in-horizon twin not paired — eviction test over-evicted")
  }

  test("S12: bucket state is watermark-bounded — expired buckets stop pairing") {
    checkNearDupTtl("s12ttl")
  }

  test("S13: streaming near-dup SURVIVORS ≡ q7N's batch pair table, exact jac_bp") {
    // the ingest-time dedup story end-to-end: candidates verify IN the
    // stream and only true near-dups (τ = 3/5, exact integer jac_bp)
    // come out — the set must equal what the batch PPJoin+verify (q7N)
    // computes over the same corpus, basis points included
    val dir = tmpDir("graft-s13")
    stageDocs(dir, 4)
    val wide = 10L * 365 * 86400 * 1000 // horizon >> fixture span
    val got = runStream("s13",
      StreamOps.nearDupSurvivors(readDocs(dir), wide).toDF, "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "q7N finds no pairs at sf0.001 — precondition broken")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  /** S13's eviction scenario: same staging as [[checkNearDupTtl]], but
    * the stream emits VERIFIED pairs (the duplicate docs are identical,
    * Jaccard 10000 bp) — eviction must behave identically with the
    * shingle-carrying state.
    */
  private def checkSurvivorTtl(name: String): Unit = {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmpDir(s"graft-$name")
    val H = 3600L * 1000000L
    def drop(id: Long, text: String, tsUs: Long): Unit = {
      Seq((id, text, tsUs)).toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5)
    }
    val dup = "alpha beta gamma delta epsilon"
    drop(1, dup, H)
    val stream = StreamOps.nearDupSurvivors(readDocs(dir),
      horizonMs = 3600L * 1000).toDF
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      drop(2, "omega psi chi phi upsilon", 4 * H)
      q.processAllAvailable()
      drop(3, "one two three four five", 4 * H + 60000000L)
      q.processAllAvailable() // doc-1 buckets evict here
      drop(4, dup, 4 * H + 120000000L)
      q.processAllAvailable()
      drop(5, dup, 4 * H + 180000000L)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L),
      "pair across the expired horizon — shingle state not evicted")
    assert(got.contains((4L, 5L, 10000L)),
      "in-horizon identical twin not verified at 10000 bp")
  }

  test("S13: survivor state is watermark-bounded — expired buckets stop verifying") {
    checkSurvivorTtl("s13ttl")
  }

  test("S11: stream-stream click→purchase interval join — stream == batch") {
    val got = runStream("s11",
      StreamOps.clickToPurchase(
        EventStream.read(spark, stagedDir), EventStream.read(spark, stagedDir)),
      "append")
    val want = StreamOps.clickToPurchase(
      EventStream.readBatch(spark, stagedDir),
      EventStream.readBatch(spark, stagedDir))
    assert(got.count() > 0, "join produced no pairs — fixture too sparse?")
    assert(rowsOf(got) == rowsOf(want))
  }
}
