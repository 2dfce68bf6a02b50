package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase._
import graft.operators.LlmOps

/** S15: the streamed vec_index registry must equal q7S's batch serving
  * index row-for-row (cell id, bit-packed residual codes, exact norm) —
  * THROUGH the Derby MERGE table, so the replay machinery is in the
  * loop — because the encode is stateless and both paths share
  * LlmOps.pqEncodeRows and the same driver-resident models.
  */
class VecIngestSpec extends AnyFunSuite {

  /** The sf0.001 embeddings staged as time-ordered parquet chunks. */
  private def stageVecs(dir: String, chunks: Int): Unit =
    Staging.chunked(
      graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding")),
      Seq(col("vec_id")), chunks, dir)

  private val vecSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  private def readVecs(dir: String): DataFrame =
    spark.readStream.schema(vecSchema).option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Batch expectation: q7S's own serving index with codes re-packed
    * the registry way.
    */
  private def wantRows(): Map[Long, (Int, Long, Double)] =
    LlmOps.pqIndex(spark, sf0001).collect().map { r =>
      val packed = r.getSeq[Int](r.fieldIndex("codes"))
        .foldLeft(0L)((acc, c) => acc * 256L + c)
      r.getLong(r.fieldIndex("n_id")) ->
        ((r.getInt(r.fieldIndex("cid")), packed,
          r.getDouble(r.fieldIndex("nn"))))
    }.toMap

  test("S15: streamed vec_index ≡ q7S's batch serving index, replay is a MERGE no-op") {
    val dir = tmpDir("graft-s15")
    stageVecs(dir, 4)
    val url = s"jdbc:derby:${tmpDir("graft-s15-db")}/db;create=true"

    val q = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-ckpt"), spark, sf0001)
    try q.processAllAvailable() finally q.stop()

    def tableRows(): Map[Long, (Int, Long, Double)] = spark.read
      .format("jdbc").option("url", url).option("dbtable", VecIngest.TABLE)
      .load()
      // Derby reports upper-cased names; analyzer resolution is
      // case-insensitive where Row.fieldIndex is not
      .select("vec_id", "cid", "codes_packed", "nsq")
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))
      }.toMap

    val want = wantRows()
    val got = tableRows()
    assert(got.size == want.size)
    // exact equality including the double norm: both paths run the SAME
    // kernels over the same cast, so even the FP bits agree
    assert(got == want,
      s"first diff: ${(want.keySet ++ got.keySet).toSeq.sorted
        .find(k => want.get(k) != got.get(k))
        .map(k => s"$k want=${want.get(k)} got=${got.get(k)}")}")

    // full replay over fresh checkpoints: the keyed MERGE must no-op
    val r2 = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-ckpt2"), spark, sf0001)
    try r2.processAllAvailable() finally r2.stop()
    assert(tableRows() == want, "replay must be a MERGE no-op")

    // the registry is SERVABLE: q7S's search pipeline over the
    // stream-maintained JDBC index returns exactly the registry
    // entry's answers (same plan, same models, row-identical)
    val viaRegistry = VecIngest.search(spark, sf0001, url)
      .collect().map(_.toSeq).toSeq
    val viaLake = graft.SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaRegistry.nonEmpty && viaRegistry == viaLake)
  }

  test("S15: a stream-fresh vector is searchable once its payload is provided") {
    val lake = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    // the fresh arrival: an exact copy of query vector 0 under a new id
    // — by construction the UNIQUE nearest neighbor of query 0
    // (cosine 1.0; every other pair on this corpus ranks below)
    val freshId = 999999L
    val fresh = lake.filter(col("vec_id") === 0)
      .select(lit(freshId).as("vec_id"), col("embedding"))
    val dir = tmpDir("graft-s15-fresh")
    stageVecs(dir, 3)
    fresh.coalesce(1).write.mode("append").parquet(dir)
    val url = s"jdbc:derby:${tmpDir("graft-s15-fresh-db")}/db;create=true"
    val q = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-fresh-ckpt"), spark, sf0001)
    try q.processAllAvailable() finally q.stop()

    // WITHOUT a payload covering the fresh id: the registry row makes
    // the shortlist but the rerank's inner join drops it — the
    // documented trade, pinned so it can't silently change
    val lakeOnly = VecIngest.search(spark, sf0001, url)
      .filter(col("q_id") === 0).collect()
    assert(lakeOnly.length == 5 &&
      !lakeOnly.exists(_.getLong(1) == freshId))

    // WITH payload = lake ∪ landing: the fresh vector is query 0's top
    // answer at sim 1.0 — ingest-time index freshness end-to-end. The
    // payload OVERLAPS deliberately (half the lake appears twice, the
    // open-compaction-window shape): a twice-present id must not claim
    // two result slots
    val overlapping = lake.union(fresh)
      .union(lake.filter(col("vec_id") < 250))
    val all = VecIngest.search(spark, sf0001, url, Some(overlapping))
      .collect()
    all.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ids = rows.map(_.getLong(1))
      assert(ids.distinct.length == ids.length,
        s"q=$q duplicated neighbors: ${ids.toSeq}")
      assert(rows.length == 5)
    }
    val got = all.filter(_.getLong(0) == 0).sortBy(_.getInt(3))
    assert(got.head.getLong(1) == freshId, s"top=${got.head}")
    assert(got.head.getDouble(2) == 1.0)
  }

  test("S15 drift detector: in-distribution batches read ratio ≈ 1, drifted arrivals trip retrainDue") {
    // The r13 trigger behind the scaladoc's "retrain on detected
    // arrival-distribution shift": the observed metric aggregates the
    // squared assignment residual inside the encode stage, and its
    // batch mean over baseline separates cleanly — in-distribution
    // chunks of the SAME lake the models trained on must sit near 1,
    // arrivals from shifted centers must jump by multiples. Order is
    // made deterministic by draining the clean chunks first, then
    // appending the drifted file to the same source.
    val dir = tmpDir("graft-s15-drift")
    stageVecs(dir, 3)
    val url = s"jdbc:derby:${tmpDir("graft-s15-drift-db")}/db;create=true"
    val baseline = VecIngest.baselineResid(spark, sf0001)
    assert(baseline > 0)
    val q = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-drift-ckpt"), spark, sf0001)
    try {
      q.processAllAvailable()
      val clean = VecIngest.driftRatios(q, baseline)
      assert(clean.size >= 3, s"want >= 3 observed batches, got $clean")
      clean.foreach { case (b, r) =>
        assert(r > 0.5 && r < 1.5, s"clean batch $b drift ratio $r") }
      assert(!VecIngest.retrainDue(q, baseline))

      // the drift: every dimension shifted +5 — arrivals from centers
      // the quantizers never saw, under fresh ids
      graft.sources.Tables.embeddings(spark, sf0001)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val all = VecIngest.driftRatios(q, baseline)
      assert(all.size > clean.size, s"drifted batch not observed: $all")
      assert(all.take(clean.size) == clean, "history must be stable")
      assert(all.last._2 > 2.0, s"drifted batch ratio ${all.last._2}")
      assert(VecIngest.retrainDue(q, baseline))
      // a genuine drift signal trips THROUGH a window that includes a
      // clean batch: the row-weighted mean still clears 1+tol
      assert(VecIngest.retrainDue(q, baseline, window = 2),
        "windowed trigger must still see real drift")
    } finally q.stop()
  }

  test("S15 retrain loop: trip -> retrain over the grown lake -> same arrivals read ratio ≈ 1") {
    // The retrainDue scaladoc's recipe, executed end-to-end: a drifted
    // append trips the trigger; folding the arrivals into the lake,
    // retraining (a NEW lake dir retrains by construction — the model
    // caches key by (session, dir, confs)), and re-attaching with a
    // fresh checkpoint MERGE-overwrites the registry; after which the
    // SAME drifted arrivals read ratio ≈ 1 under the new baseline and
    // the registry equals the batch index of the grown lake.
    val dir = tmpDir("graft-s15-loop")
    stageVecs(dir, 2)
    val url = s"jdbc:derby:${tmpDir("graft-s15-loop-db")}/db;create=true"
    val baseline = VecIngest.baselineResid(spark, sf0001)
    val q = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-loop-ckpt"), spark, sf0001)
    val drifted = graft.sources.Tables.embeddings(spark, sf0001)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
    val driftedPre = try {
      q.processAllAvailable()
      drifted.select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(VecIngest.retrainDue(q, baseline), "drift must trip first")
      VecIngest.driftRatios(q, baseline).last._2
    } finally q.stop()
    assert(driftedPre > 2.0, s"pre-retrain drift signal $driftedPre")

    // retrain: the grown lake = old lake ∪ arrivals under a new dir,
    // then the swap through the ONE public call (r15 — the API owns
    // stop → release → fresh-ckpt re-attach → fresh baseline)
    val lake2 = tmpDir("graft-s15-loop-lake2")
    graft.sources.Tables.embeddings(spark, sf0001).unionByName(drifted)
      .write.mode("overwrite").parquet(s"$lake2/embeddings.parquet")
    val (q2, baseline2) = VecIngest.retrainAndSwap(Some(q), readVecs(dir),
      url, tmpDir("graft-s15-loop-ckpt2"), spark, lake2)
    try q2.processAllAvailable() finally q2.stop()

    // closure: the batch that TRIPPED is in-distribution for the
    // retrained models, the trigger is quiet, and every batch sits far
    // below the pre-retrain drift signal. Deliberately NOT asserted:
    // per-batch ratios ≈ 1 — this fixture's batches are
    // subpopulation-PURE (each chunk is all-original or all-drifted),
    // and against a 50/50 bimodal lake a pure batch honestly reads its
    // subpopulation's mean over the LAKE-WIDE baseline (measured ~1.8
    // for the original chunks here). The tol calibration is for
    // deployment batches, which mix arrivals (Scale vecdrift's fresh
    // controls: ≤ 1.21); strongly stratified batches want windowed
    // means — documented in SCALING.md.
    val ratios2 = VecIngest.driftRatios(q2, baseline2)
    assert(ratios2.size >= 3, s"want all batches re-observed, got $ratios2")
    assert(ratios2.last._2 < 1.5,
      s"the tripping batch must read in-distribution after retrain: $ratios2")
    ratios2.foreach { case (b, r) =>
      assert(r < driftedPre / 2,
        s"post-retrain batch $b ratio $r vs pre-retrain signal $driftedPre") }
    assert(!VecIngest.retrainDue(q2, baseline2))
    // the stratification caveat, measured: this source's batches are
    // subpopulation-PURE, and on the now-bimodal lake at least one
    // clean batch reads above the tol trigger with zero drift (~1.8)
    // — while the windowed trigger re-mixes the populations and reads
    // quiet. The `window` dial closing the caveat, not just advice.
    assert(ratios2.exists(_._2 > 1.5),
      s"fixture should exhibit pure-batch wander: $ratios2")
    assert(!VecIngest.retrainDue(q2, baseline2, window = ratios2.size),
      s"windowed trigger must ride out stratification: $ratios2")

    // and the MERGE overwrite left the registry ≡ the grown lake's
    // batch serving index (stream ≡ batch, now for the NEW models)
    val pq2 = LlmOps.pqModel(spark, lake2)
    val want = LlmOps.pqIndex(spark, lake2).collect().map { r =>
      val packed = r.getSeq[Int](r.fieldIndex("codes"))
        .foldLeft(0L)((acc, c) => (acc << 8) | c)
      r.getLong(r.fieldIndex("n_id")) ->
        ((r.getInt(r.fieldIndex("cid")), packed,
          r.getDouble(r.fieldIndex("nn"))))
    }.toMap
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", VecIngest.TABLE).load()
      .select("vec_id", "cid", "codes_packed", "nsq")
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))
      }.toMap
    assert(got.size == want.size && got == want,
      s"registry after retrain must equal the grown lake's batch index " +
        s"(first diff: ${(want.keySet ++ got.keySet).toSeq.sorted
          .find(k => want.get(k) != got.get(k))})")
    assert(pq2.m <= 8 && pq2.ks <= 256) // loop stayed packable
  }

  test("S15 handoff: arrivals landing while DETACHED for retrain are neither lost nor duplicated") {
    // The retrain HANDOFF itself (the piece the retrain-loop test above
    // drives with the source quiescent): files that land in the gap —
    // after the old query stops, before the retrained one attaches —
    // must come out the other side exactly once. The mechanism is the
    // fresh-checkpoint replay (it starts from offset zero, so the gap
    // files are just unread input) plus the keyed MERGE (so re-encoding
    // the already-indexed files is an idempotent overwrite, now under
    // the NEW models). Pinned by the strongest available equality: the
    // post-handoff registry must equal the grown lake's batch serving
    // index row-for-row — which simultaneously proves zero loss (every
    // id present), zero duplication (exactly one row per id; MERGE key),
    // and that EVERY row — gap arrivals and pre-handoff rows alike —
    // carries the retrained models' encoding, not leftovers.
    val dir = tmpDir("graft-s15-handoff")
    stageVecs(dir, 2)
    val url = s"jdbc:derby:${tmpDir("graft-s15-handoff-db")}/db;create=true"
    val q1 = VecIngest.attach(readVecs(dir), url,
      tmpDir("graft-s15-handoff-ckpt"), spark, sf0001)
    try q1.processAllAvailable() finally q1.stop()

    // the gap arrivals: drifted vectors under fresh ids, landing with
    // NO query attached — exactly the retrain window
    val gap = graft.sources.Tables.embeddings(spark, sf0001)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
    gap.select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(dir)

    // retrain over the grown lake through the public swap call (r15):
    // the API stops the old query (already stopped here — None), drops
    // the cached models, re-attaches with the fresh checkpoint
    val lake2 = tmpDir("graft-s15-handoff-lake2")
    graft.sources.Tables.embeddings(spark, sf0001).unionByName(gap)
      .write.mode("overwrite").parquet(s"$lake2/embeddings.parquet")
    val ckpt2 = tmpDir("graft-s15-handoff-ckpt2")
    val (q2, _) = VecIngest.retrainAndSwap(None, readVecs(dir), url,
      ckpt2, spark, lake2)
    try q2.processAllAvailable() finally q2.stop()

    // the guard: re-running the swap onto the now-COMMITTED checkpoint
    // is exactly the stale-row hazard, and must be rejected loudly
    intercept[IllegalArgumentException] {
      VecIngest.retrainAndSwap(None, readVecs(dir), url, ckpt2, spark, lake2)
    }

    val want = LlmOps.pqIndex(spark, lake2).collect().map { r =>
      val packed = r.getSeq[Int](r.fieldIndex("codes"))
        .foldLeft(0L)((acc, c) => (acc << 8) | c)
      r.getLong(r.fieldIndex("n_id")) ->
        ((r.getInt(r.fieldIndex("cid")), packed,
          r.getDouble(r.fieldIndex("nn"))))
    }.toMap
    val rows = spark.read.format("jdbc")
      .option("url", url).option("dbtable", VecIngest.TABLE).load()
      .select("vec_id", "cid", "codes_packed", "nsq")
      .collect()
    // zero duplication, stated directly (not only via the Map collapse)
    assert(rows.length == rows.map(_.getLong(0)).distinct.length,
      "registry must hold each vec_id exactly once")
    val got = rows.map { r =>
      r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.toMap
    // zero loss (gap ids included) + new-model encoding, in one equality
    assert(got.size == want.size && got == want,
      s"post-handoff registry must equal the grown lake's batch index " +
        s"(first diff: ${(want.keySet ++ got.keySet).toSeq.sorted
          .find(k => want.get(k) != got.get(k))
          .map(k => s"$k want=${want.get(k)} got=${got.get(k)}")})")
    assert(want.keySet.exists(_ >= 1000000L), "gap ids must be in play")
  }

  test("r15 retrainAndSwap retrains an IN-PLACE-grown lake — the release path") {
    // The other swap tests grow the lake under a NEW dir, where the
    // model caches retrain by key; here the lake dir ITSELF grows
    // (appended parquet, same path), the shape where — without the
    // API's model-cache drop — the swap would silently re-attach with
    // the condemned models and the registry would diverge from the
    // grown lake's batch index.
    val lake = tmpDir("graft-s15-inplace-lake")
    val base = graft.sources.Tables.embeddings(spark, sf0001)
    base.write.mode("overwrite").parquet(s"$lake/embeddings.parquet")
    val src = tmpDir("graft-s15-inplace-src")
    base.select("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(src)
    val url = s"jdbc:derby:${tmpDir("graft-s15-inplace-db")}/db;create=true"
    val q1 = VecIngest.attach(readVecs(src), url,
      tmpDir("graft-s15-inplace-ckpt"), spark, lake)
    try q1.processAllAvailable() finally q1.stop()
    val oldCents = LlmOps.ivfModel(spark, lake)._1.map(_.cid).toSet

    // grow IN PLACE: drifted arrivals appended to the same lake path
    val drifted = base.select((col("vec_id") + 1000000L).as("vec_id"),
      col("label"), transform(col("embedding"), x => x + lit(5.0f))
        .as("embedding"))
    drifted.write.mode("append").parquet(s"$lake/embeddings.parquet")
    drifted.select("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(src)

    val (q2, baseline2) = VecIngest.retrainAndSwap(Some(q1), readVecs(src),
      url, tmpDir("graft-s15-inplace-ckpt2"), spark, lake)
    try q2.processAllAvailable() finally q2.stop()
    assert(baseline2 > 0)

    // the models actually RETRAINED (the doubled, bimodal lake trains
    // a different quantizer geometry/centroid set than the base lake)
    val newCents = LlmOps.ivfModel(spark, lake)._1.map(_.cid).toSet
    assert(newCents != oldCents || LlmOps.ivfModel(spark, lake)._1.size
      != oldCents.size, "swap reused the condemned models")

    // and the registry equals the GROWN lake's batch index under the
    // NEW models — impossible if any row kept the old encoding
    val pq2 = LlmOps.pqModel(spark, lake)
    val want = LlmOps.pqIndex(spark, lake).collect().map { r =>
      val packed = r.getSeq[Int](r.fieldIndex("codes"))
        .foldLeft(0L)((acc, c) => (acc << 8) | c)
      r.getLong(r.fieldIndex("n_id")) ->
        ((r.getInt(r.fieldIndex("cid")), packed,
          r.getDouble(r.fieldIndex("nn"))))
    }.toMap
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", VecIngest.TABLE).load()
      .select("vec_id", "cid", "codes_packed", "nsq")
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))
      }.toMap
    assert(got.size == want.size && got == want,
      s"in-place swap registry diverges from the grown lake's index " +
        s"(first diff: ${(want.keySet ++ got.keySet).toSeq.sorted
          .find(k => want.get(k) != got.get(k))})")
    assert(pq2.m <= 8 && pq2.ks <= 256)
  }

  test("S15: packed codes round-trip and the cell ids come from the model") {
    val (cents, _) = LlmOps.ivfModel(spark, sf0001)
    val pq = LlmOps.pqModel(spark, sf0001)
    val enc = VecIngest.encoded(
      graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding")), cents, pq).collect()
    val cellIds = cents.map(_.cid).toSet
    enc.foreach { r =>
      assert(cellIds.contains(r.getInt(1)))
      // unpack big-endian bytes (mask after the arithmetic shift — the
      // production unpacker's spelling, sound even when byte 0 set the
      // sign bit) → every code in [0, ks), no stray high bits
      val packed = r.getLong(2)
      val codes =
        (0 until pq.m).map(i => ((packed >> (8 * (pq.m - 1 - i))) & 255L).toInt)
      if (8 * pq.m < 64) assert((packed >>> (8 * pq.m)) == 0L)
      assert(codes.forall(c => c >= 0 && c < pq.ks))
    }
  }
}
