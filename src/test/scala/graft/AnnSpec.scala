package graft

import org.scalatest.funsuite.AnyFunSuite

/** q7C bucketed-ANN validation: every reported similarity is exact (the
  * rerank is brute-force within buckets) and recall vs the true 5-NN is
  * materially above chance. Deterministic: planes and data are fixed.
  */
class AnnSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val vecs: Map[Long, Array[Double]] =
    graft.sources.Tables.embeddings(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    BigDecimal(dot / math.sqrt(na * nb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def exactTop5(q: Long): Set[Long] =
    vecs.view.filterKeys(_ != q).toSeq
      .map { case (id, v) => (cosine(vecs(q), v), id) }
      .sortBy { case (s, id) => (-s, id) }
      .take(5).map(_._2).toSet

  test("q7C reported similarities are exact and per-query ranks are dense") {
    val out = SparkEntry.queries("q7C_ann_simhash")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val want = cosine(vecs(q), vecs(r.getLong(1)))
        assert(r.getDouble(2) == want, s"q=$q n=${r.getLong(1)}")
      }
    }
  }

  private def avgRecall(key: String): Double = {
    val out = SparkEntry.queries(key)(spark, sf0001).collect()
    val byQ = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val recalls = (0L until 10L).map { q =>
      val ann = byQ.getOrElse(q, Set.empty)
      exactTop5(q).count(ann.contains) / 5.0
    }
    recalls.sum / recalls.length
  }

  test("q7C recall@5 vs exact 5-NN holds its measured floor") {
    // measured 0.46 on this fixture at the round-4 pin; 0.92 since the
    // round-11 multi-probe (each query also probes the four
    // Hamming-1 buckets per band). Chance level is 5 of 499 ≈ 1%.
    // Deterministic (fixed planes + data), so the floor is a regression
    // pin, not a flake margin: losing the multiprobe fails loudly.
    val avg = avgRecall("q7C_ann_simhash")
    assert(avg >= 0.85, s"avg recall@5 = $avg (measured 0.92 at pin time)")
  }

  test("q7G IVF reported similarities are exact and per-query ranks are dense") {
    val out = SparkEntry.queries("q7G_ann_ivf")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val want = cosine(vecs(q), vecs(r.getLong(1)))
        assert(r.getDouble(2) == want, s"q=$q n=${r.getLong(1)}")
      }
    }
  }

  test("q7G IVF recall@5 vs exact 5-NN holds its measured floor") {
    // measured 0.52 on this fixture (round 4: 2 Lloyd steps, nprobe=3 of
    // 16 cells ≈ 19% of the corpus scanned blindly). Deterministic
    // regression pin: a halving fails loudly.
    val avg = avgRecall("q7G_ann_ivf")
    assert(avg >= 0.45, s"avg recall@5 = $avg (measured 0.52 at pin time)")
  }

  test("q7G IVF quantizer: data-driven K ≈ √n, healthy occupancy, no mega-cell") {
    // K comes from the corpus size now (≈√n, conf-capped): the fixture's
    // ~500 vectors must train ~22 cells, every model cell must serve
    // vectors (an unserved cell wastes probes), and no cell may hold
    // half the corpus (a mega-cell degrades probing toward a linear
    // scan). All index-quality regressions, pinned via the shared
    // builder.
    val (cents, indexDf) = graft.operators.LlmOps.ivfModel(spark, sf0001)
    val n = vecs.size
    val wantK = math.round(math.sqrt(n.toDouble)).toInt
    assert(math.abs(cents.size - wantK) <= wantK / 4,
      s"auto K = ${cents.size}, expected ≈√$n = $wantK")
    val idx = indexDf.groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(idx.keySet == cents.map(_.cid).toSet,
      s"cells without vectors: ${cents.map(_.cid).toSet -- idx.keySet}")
    assert(idx.values.max <= n / 2.0,
      s"mega-cell holds ${idx.values.max} of $n vectors")
  }

  test("q7G recall floor holds at a second, explicitly pinned K") {
    // the data-driven default (~22 cells on this fixture) is covered by
    // the floor test above; spark.graft.ivf.k pins a DIFFERENT quantizer
    // size, which must retrain (cache keys on the conf) and still clear
    // the same recall floor — the accuracy contract is K-independent
    val key = "spark.graft.ivf.k"
    val autoCents = graft.operators.LlmOps.ivfModel(spark, sf0001)._1
    spark.conf.set(key, "8")
    try {
      val pinnedCents = graft.operators.LlmOps.ivfModel(spark, sf0001)._1
      assert(pinnedCents.size <= 8 && pinnedCents.size != autoCents.size,
        s"conf-pinned K not honored: got ${pinnedCents.size} cells")
      val avg = avgRecall("q7G_ann_ivf")
      assert(avg >= 0.45, s"K=8 avg recall@5 = $avg")
    } finally spark.conf.unset(key)
  }

  test("q7G IVF sample-trained quantizer: recall floor holds on the sampled branch") {
    // VERDICT r7 #3: at 100 TB the quantizer trains on a deterministic
    // LCG-keyed sample (spark.graft.ivf.trainSampleLimit), serving
    // unchanged. Force the sampled branch on the fixture (~500 vectors,
    // budget 200) and require: (a) the branch genuinely retrains — the
    // centroid set differs from the full-corpus model's; (b) reported
    // sims stay exact with dense ranks (the rerank is independent of
    // training); (c) recall@5 holds a floor — measured 0.52 sampled on
    // this fixture (identical to full-trained at pin time; a 16-cell
    // density sketch needs coverage, not every row).
    val key = "spark.graft.ivf.trainSampleLimit"
    val fullCents = graft.operators.LlmOps.ivfModel(spark, sf0001)._1
    spark.conf.set(key, "200")
    try {
      val sampledCents = graft.operators.LlmOps.ivfModel(spark, sf0001)._1
      assert(sampledCents.map(_.ce) != fullCents.map(_.ce),
        "sampled branch returned the full-corpus centroids — branch not taken")
      val out = SparkEntry.queries("q7G_ann_ivf")(spark, sf0001).collect()
      assert(out.nonEmpty)
      out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
        assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
        rows.foreach { r =>
          assert(r.getDouble(2) == cosine(vecs(q), vecs(r.getLong(1))))
        }
      }
      val avg = avgRecall("q7G_ann_ivf")
      assert(avg >= 0.45, s"sampled-branch avg recall@5 = $avg")
    } finally spark.conf.unset(key)
  }

  test("q7S IVF-PQ reported similarities are exact and per-query ranks are dense") {
    // the exact rerank refetches full vectors for the ADC shortlist, so
    // approximation decides WHICH candidates are reranked, never the
    // reported numbers
    val out = SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val want = cosine(vecs(q), vecs(r.getLong(1)))
        assert(r.getDouble(2) == want, s"q=$q n=${r.getLong(1)}")
      }
    }
  }

  test("q7S IVF-PQ recall@5 vs exact 5-NN holds its measured floor") {
    // same probed cells as q7G, candidates ranked by residual PQ codes
    // instead of full vectors, exact rerank of the auto-R shortlist —
    // measured 0.56 on this fixture at m=8 (vs q7G's 0.52 with
    // full-vector ranking), so the 32× candidate compression costs
    // nothing here. Deterministic regression pin: a halving fails
    // loudly.
    val avg = avgRecall("q7S_ann_ivfpq")
    assert(avg >= 0.45, s"avg recall@5 = $avg (measured 0.56 at pin time)")
  }

  test("q7S PQ model: data-driven ks, codes tile the embedding, every code in range") {
    val pq = graft.operators.LlmOps.pqModel(spark, sf0001)
    val n = vecs.size
    val wantKs = math.round(math.sqrt(n.toDouble)).toInt
    assert(math.abs(pq.ks - wantKs) <= wantKs / 4,
      s"auto ks = ${pq.ks}, expected ≈√$n = $wantKs")
    assert(pq.cb.size == pq.m * pq.ks)
    val dim = vecs.values.head.length
    assert(pq.cb.forall(_.size == dim / pq.m))
    // the registry path's own serving index (residual encoding included):
    // compressed rows must be well-formed
    val codes = graft.operators.LlmOps.pqIndex(spark, sf0001)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == pq.m && c.forall(j => j >= 0 && j < pq.ks)))
    // the quantizer must actually discriminate: more than one distinct
    // code used per subspace on a 500-vector corpus
    (0 until pq.m).foreach { mi =>
      assert(codes.map(_(mi)).distinct.size > 1, s"subspace $mi collapsed")
    }
  }

  test("q7G/q7S recall floors hold with hierarchical assignment forced on") {
    // the two-level serving path (√K supers → within-group scan) is
    // approximate at group boundaries; at 100 TB it is the index-build
    // notch (auto above spark.graft.ivf.hierThreshold). Forcing it ON
    // at fixture K (~22, normally flat) must keep both recall floors
    // and the sims-exactness contract — the rerank is hier-independent.
    spark.conf.set("spark.graft.ivf.hier", "on")
    try {
      val g = avgRecall("q7G_ann_ivf")
      assert(g >= 0.45, s"hier q7G avg recall@5 = $g")
      val sOut = SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001).collect()
      sOut.foreach { r =>
        assert(r.getDouble(2) == cosine(vecs(r.getLong(0)), vecs(r.getLong(1))))
      }
      val sRec = avgRecall("q7S_ann_ivfpq")
      assert(sRec >= 0.40, s"hier q7S avg recall@5 = $sRec")
    } finally spark.conf.unset("spark.graft.ivf.hier")
  }

  test("q7G/q7S recall floors hold with two-level TRAINING forced on") {
    // the r10 coarse-training notch: Lloyd steps assign rows through the
    // √K-super two-hop instead of the flat K-way scan (auto above
    // spark.graft.ivf.hierThreshold — the measured 100× training wall).
    // Forcing it ON at fixture K (~22, normally flat) trains a DIFFERENT
    // (approximately-assigned) model; the contract is that recall floors
    // and q7S's sims-exactness survive the approximation. The trainAssign
    // conf is part of both model cache keys, so this test exercises a
    // genuinely retrained model, not a cache hit.
    spark.conf.set("spark.graft.ivf.trainAssign", "hier")
    try {
      val g = avgRecall("q7G_ann_ivf")
      assert(g >= 0.45, s"hier-trained q7G avg recall@5 = $g")
      val sOut = SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001).collect()
      sOut.foreach { r =>
        assert(r.getDouble(2) == cosine(vecs(r.getLong(0)), vecs(r.getLong(1))))
      }
      val sRec = avgRecall("q7S_ann_ivfpq")
      assert(sRec >= 0.40, s"hier-trained q7S avg recall@5 = $sRec")
    } finally spark.conf.unset("spark.graft.ivf.trainAssign")
  }

  test("q7H embedding dedup: removals are sound, recall vs exact removals is material") {
    val kept = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val all = vecs.keySet
    val removed = all -- kept

    // exact ground truth: ids with ANY exact near-dup (rounded cosine
    // >= 0.38) of smaller id — the same one-pass keep-smallest rule
    // without the LSH candidate limitation
    val ids = all.toSeq.sorted
    val exactRemoved = ids.filter { j =>
      ids.exists(i => i < j && cosine(vecs(i), vecs(j)) >= 0.38)
    }.toSet

    // soundness: every LSH removal is justified by an exact near-dup pair
    val unjustified = removed.filterNot(exactRemoved)
    assert(unjustified.isEmpty,
      s"removed without an exact smaller near-dup: ${unjustified.take(5)}")
    // recall: banding may miss pairs, but must catch a material share —
    // measured 0.53 on this fixture (round 4); deterministic pin
    assert(exactRemoved.nonEmpty)
    val recall = removed.size.toDouble / exactRemoved.size
    assert(recall >= 0.5, s"dedup recall $recall (${removed.size}/${exactRemoved.size}; measured 0.53 at pin time)")
    assert(kept.nonEmpty && (kept contains ids.head))
  }

  test("q7H multi-probe dial: sound, and recall strictly above the single-probe floor") {
    // the r12-measured trade (Scale embdedup): Hamming-1 probing on one
    // corpus side lifts near-threshold pair recall 0.53 → 0.95 for 4.6×
    // the candidate pairs — single stays the default (the multiplier
    // lands on the corpus side of the join), multi is the opt-in recall
    // dial; this pins that the dial actually buys recall on the fixture
    // and stays sound (removals still justified by exact pairs).
    spark.conf.set("spark.graft.simhash.dedupProbe", "multi")
    try {
      val kept = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
        .collect().map(_.getLong(0)).toSet
      val removed = vecs.keySet -- kept
      val ids = vecs.keySet.toSeq.sorted
      val exactRemoved = ids.filter { j =>
        ids.exists(i => i < j && cosine(vecs(i), vecs(j)) >= 0.38)
      }.toSet
      val unjustified = removed.filterNot(exactRemoved)
      assert(unjustified.isEmpty,
        s"removed without an exact smaller near-dup: ${unjustified.take(5)}")
      val recall = removed.size.toDouble / exactRemoved.size
      // deterministic pin; measured at r12 adoption time (single = 0.53)
      assert(recall >= 0.75,
        s"multi-probe dedup recall $recall (${removed.size}/${exactRemoved.size})")
    } finally spark.conf.unset("spark.graft.simhash.dedupProbe")
  }

  test("r15 dedupProbe=exact: the policy's third answer is an executable " +
    "plan whose removal set equals brute force exactly") {
    import graft.operators.LlmOps
    // the policy itself routes here: at the fixture's (4,4) geometry a
    // 0.95 near-threshold recall ask is past both LSH modes' reach
    val advised = LlmOps.dedupProbeFor(spark, sf0001, 0.95)
    assert(advised == "exact")
    // piping the policy's answer into the conf must not throw (the r14
    // gap) and must produce the boundary-complete result
    spark.conf.set("spark.graft.simhash.dedupProbe", advised)
    try {
      val kept = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
        .collect().map(_.getLong(0)).toSet
      val removed = vecs.keySet -- kept
      val ids = vecs.keySet.toSeq.sorted
      val exactRemoved = ids.filter { j =>
        ids.exists(i => i < j && cosine(vecs(i), vecs(j)) >= 0.38)
      }.toSet
      assert(removed == exactRemoved,
        s"exact-mode removal diverges: extra=${(removed -- exactRemoved).take(5)} " +
          s"missing=${(exactRemoved -- removed).take(5)}")
      // the candidate surface in exact mode is the block-grid pair
      // enumeration: every unordered pair exactly once, ids only
      val cand = LlmOps.embedCandidates(spark, sf0001)
      assert(cand.columns.toSeq == Seq("id_a", "id_b"))
      val n = vecs.size.toLong
      assert(cand.count() == n * (n - 1) / 2)
    } finally spark.conf.unset("spark.graft.simhash.dedupProbe")
  }

  test("r15 pre-flight candidate estimator is EXACT in all three probe modes") {
    // the bucket-histogram arithmetic (Σ c·(c−1)/2 + Hamming-1 cross
    // terms) fully determines the band join's output size, so the
    // estimate must equal the real count bit-for-bit — this is what
    // makes it an honest pre-flight price, not a model
    import graft.operators.LlmOps
    for (probe <- Seq("single", "multi", "exact")) {
      spark.conf.set("spark.graft.simhash.dedupProbe", probe)
      try {
        val est = LlmOps.embedCandidateEstimate(spark, sf0001)
        val real = LlmOps.embedCandidates(spark, sf0001).count()
        assert(est == real, s"probe=$probe: estimate $est vs real $real")
        assert(est > 0)
      } finally spark.conf.unset("spark.graft.simhash.dedupProbe")
    }
    // the advisory dial parses and the run still proceeds under it
    spark.conf.set("spark.graft.simhash.candBudget", "1")
    try assert(LlmOps.embedCandidates(spark, sf0001).count() > 0)
    finally spark.conf.unset("spark.graft.simhash.candBudget")
  }

  test("r14 n-scaled SimHash geometry: the occupancy/bands law and the conf pins") {
    import graft.operators.LlmOps
    // fixture n=500 ≤ 16·256 → the (4,4) construction every recall
    // floor in this suite pins — bit-identical to the pre-r14 shape
    assert(LlmOps.simhashGeom(spark, sf0001) == ((4, 4)))
    try {
      // occupancy dial: n=500 at c=25 → bits = ceil(log₂ 20) = 5; the
      // bands-law at 5 bits: round(ln 10 / p₀⁵) = 5, p₀ = 1−acos(.9)/π
      spark.conf.set("spark.graft.simhash.targetOccupancy", "25")
      assert(LlmOps.simhashGeom(spark, sf0001) == ((5, 5)))
      // n/c = 250 → bits = 8; bands = round(2.3026/0.2894) = 8
      spark.conf.set("spark.graft.simhash.targetOccupancy", "2")
      assert(LlmOps.simhashGeom(spark, sf0001) == ((8, 8)))
      // explicit pins override both dials independently
      spark.conf.set("spark.graft.simhash.bandBits", "6")
      spark.conf.set("spark.graft.simhash.bands", "11")
      assert(LlmOps.simhashGeom(spark, sf0001) == ((11, 6)))
      // out-of-range pins fail loudly, naming the conf
      spark.conf.set("spark.graft.simhash.bandBits", "30")
      intercept[IllegalArgumentException](LlmOps.simhashGeom(spark, sf0001))
    } finally {
      Seq("spark.graft.simhash.targetOccupancy",
        "spark.graft.simhash.bandBits",
        "spark.graft.simhash.bands").foreach(spark.conf.unset)
    }
  }

  test("r14 id-only candidate discipline: embedCandidates ships ids, " +
    "embedDedupPairs refetches each distinct pair's vectors once") {
    import graft.operators.LlmOps
    val cand = LlmOps.embedCandidates(spark, sf0001)
    assert(cand.columns.toSeq == Seq("id_a", "id_b"))
    val pairs = LlmOps.embedDedupPairs(spark, sf0001)
    assert(pairs.columns.toSeq == Seq("id_a", "ea", "na", "id_b", "eb", "nb"))
    val n = pairs.count()
    assert(n > 0 && n == pairs.select("id_a", "id_b").distinct().count())
    // the raw stream double-counts across bands; the refetch never does
    assert(cand.count() >= n)
  }

  test("q7H stays SOUND under a forced wider geometry (parametric path end-to-end)") {
    // force a large-decade shape (8 bands × 8 bits) on the fixture:
    // removals must still all be justified by exact near-dup pairs —
    // geometry moves RECALL, never soundness, because the exact-cosine
    // refetch pass is geometry-independent
    spark.conf.set("spark.graft.simhash.bandBits", "8")
    spark.conf.set("spark.graft.simhash.bands", "8")
    try {
      val kept = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
        .collect().map(_.getLong(0)).toSet
      val removed = vecs.keySet -- kept
      val ids = vecs.keySet.toSeq.sorted
      val exactRemoved = ids.filter { j =>
        ids.exists(i => i < j && cosine(vecs(i), vecs(j)) >= 0.38)
      }.toSet
      val unjustified = removed.filterNot(exactRemoved)
      assert(unjustified.isEmpty,
        s"removed without an exact smaller near-dup: ${unjustified.take(5)}")
      assert(kept contains ids.head)
      val recall = removed.size.toDouble / exactRemoved.size
      // deterministic pin (fixed planes + data); measured at r14
      // adoption time — wider bands thin each bucket, the bands-law
      // compensates in the duplicate regime only
      assert(recall >= 0.10,
        s"wide-geometry dedup recall $recall (${removed.size}/${exactRemoved.size})")
      info(f"wide-geometry (8 bands x 8 bits) id recall = $recall%.3f")
    } finally {
      spark.conf.unset("spark.graft.simhash.bandBits")
      spark.conf.unset("spark.graft.simhash.bands")
    }
  }

  test("q7H's two exact-pass shapes (broadcast refetch vs distinct-first " +
    "shuffle) produce the identical kept set") {
    // fixture n=500 ≤ the 1M-row default gate → the default run takes
    // the broadcast map-side shape; forcing the gate to 0 exercises the
    // distinct-first distributed fallback on the same candidates
    val bcast = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.graft.simhash.vecBroadcastLimit", "0")
    try {
      val shuffled = SparkEntry.queries("q7H_dedup_embed")(spark, sf0001)
        .collect().map(_.getLong(0)).toSeq
      assert(bcast.nonEmpty && bcast == shuffled)
    } finally spark.conf.unset("spark.graft.simhash.vecBroadcastLimit")
  }

  test("local-trained quantizers (r13 fast path) match the distributed " +
    "loop's geometry and hold the recall floors on both paths") {
    import graft.operators.LlmOps
    // default: fixture n ≪ localTrainLimit → the LOCAL path trained the
    // session-cached models used by every other test in this suite; its
    // floors are asserted there. Here: force the DISTRIBUTED loop and
    // assert the same geometry (K, cid set, ks) and the same floors —
    // the two paths may differ in final ulps (summation order), never
    // in shape or quality.
    val (localCents, _) = LlmOps.ivfModel(spark, sf0001)
    val localPq = LlmOps.pqModel(spark, sf0001)
    val localG = avgRecall("q7G_ann_ivf")
    val localS = avgRecall("q7S_ann_ivfpq")
    spark.conf.set("spark.graft.ivf.localTrainLimit", "0")
    try {
      val (distCents, _) = LlmOps.ivfModel(spark, sf0001)
      val distPq = LlmOps.pqModel(spark, sf0001)
      assert(distCents.size == localCents.size)
      assert(distCents.map(_.cid) == localCents.map(_.cid))
      assert(distPq.ks == localPq.ks && distPq.m == localPq.m)
      // centroids agree to float tolerance (ulp-order differences only)
      localCents.zip(distCents).foreach { case (l, dd) =>
        l.ce.zip(dd.ce).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"cid ${l.cid}") }
      }
      val g = avgRecall("q7G_ann_ivf")
      val sRec = avgRecall("q7S_ann_ivfpq")
      assert(g >= 0.45, s"distributed-path q7G recall $g")
      assert(sRec >= 0.45, s"distributed-path q7S recall $sRec")
      assert(localG >= 0.45 && localS >= 0.45,
        s"local-path recalls $localG/$localS")
    } finally spark.conf.unset("spark.graft.ivf.localTrainLimit")
  }

  test("q7H probe-mode selection rule: near-τ recall target → mode, geometry-aware") {
    // Re-derived for the n-scaled banding (the r12 fixed 0.5/0.9
    // boundaries were the (4,4) instance). Rule = analytic hyperplane-
    // LSH hit probability at the worst near-τ pair; validated against
    // the Scale embdedup regime tables, where it under-promises by
    // ≤ 0.03 (analytic/measured near-τ: (5,5) single 0.39/0.405, multi
    // 0.91/0.919; (8,8) single 0.17/0.195, multi 0.68/0.720). Pinned so
    // the policy's shape — ceilings FALLING as bits grow, exact past
    // the geometry's reach — can't drift.
    import graft.operators.LlmOps.dedupProbeFor
    // the fixture geometry (4,4): analytic single 0.48, multi 0.95
    assert(dedupProbeFor(0.0, 4, 4) == "single")
    assert(dedupProbeFor(0.45, 4, 4) == "single")
    assert(dedupProbeFor(0.5, 4, 4) == "multi")
    assert(dedupProbeFor(0.9, 4, 4) == "multi")
    assert(dedupProbeFor(0.95, 4, 4) == "exact")
    // the 10×-decade geometry (8,8): analytic single 0.17, multi 0.68
    assert(dedupProbeFor(0.15, 8, 8) == "single")
    assert(dedupProbeFor(0.5, 8, 8) == "multi")
    assert(dedupProbeFor(0.68, 8, 8) == "multi")
    assert(dedupProbeFor(0.7, 8, 8) == "exact")
    // both mode ceilings fall monotonically with bits: the same 0.5
    // target that multi buys at small geometry is out of ANY probe
    // mode's reach at the cap geometry — the honest route is exact
    assert(dedupProbeFor(0.5, 64, 24) == "exact")
    // the corpus-resolved overload: sf0.001 sits at the (4,4) fixture
    // geometry, so the two spellings must agree
    assert(dedupProbeFor(spark, sf0001, 0.9) == "multi")
    assert(dedupProbeFor(spark, sf0001, 0.45) == "single")
    intercept[IllegalArgumentException](dedupProbeFor(1.5, 4, 4))
    intercept[IllegalArgumentException](dedupProbeFor(0.5, 0, 4))
  }

  test("auto-R pins the measured decade geometry and the clamp counterfactual") {
    // SCALING.md's recall table stands on this arithmetic: auto-R =
    // clamp(max(K, pool/poolFrac)) with pool = nprobe(K)·(n/K) and
    // poolFrac defaulting to 4 (round 13 — the `maxk` sweep measured
    // the /8→/4 deepening at the fourth decade as recall 0.92→0.96 at a
    // flat warm wall, while the alternative pool-shrink dial, raising
    // K, lost on both axes). Pin the exact auto-R the four decades now
    // use (144/836/4792/26273 — 2× the r12 /8 values 72/418/2396/
    // 13136), the sf fixture's 77, the r12 counterfactual (a fixed
    // 4096 clamp saturates the fourth decade: measured recall 0.64
    // vs 0.92 — Scale pqsweep huge), and the conf dials.
    import graft.operators.LlmOps
    val decades = Seq((69, 5000L) -> 144, (224, 50000L) -> 836,
      (704, 500000L) -> 4792, (2236, 5000000L) -> 26273)
    decades.foreach { case ((k, n), want) =>
      assert(LlmOps.pqRerank(spark, k, n) === want,
        s"auto-R at K=$k n=$n")
    }
    assert(LlmOps.pqRerank(spark, 45, 2000L) === 77, "fixture depth")
    // the r12 /8 fraction remains dialable (and reproduces its pins)
    spark.conf.set("spark.graft.pq.poolFrac", "8")
    try {
      assert(LlmOps.pqRerank(spark, 2236, 5000000L) === 13136, "r12 /8 depth")
      assert(LlmOps.pqRerank(spark, 45, 2000L) === 64, "r12 fixture floor")
    } finally spark.conf.unset("spark.graft.pq.poolFrac")
    spark.conf.set("spark.graft.pq.rerankMax", "4096")
    try assert(LlmOps.pqRerank(spark, 2236, 5000000L) === 4096,
      "old clamp saturates at the fourth decade")
    finally spark.conf.unset("spark.graft.pq.rerankMax")
    spark.conf.set("spark.graft.pq.rerank", "100")
    try assert(LlmOps.pqRerank(spark, 2236, 5000000L) === 100, "forced R")
    finally spark.conf.unset("spark.graft.pq.rerank")
    spark.conf.set("spark.graft.pq.rerank", "3")
    try intercept[IllegalArgumentException] {
      LlmOps.pqRerank(spark, 69, 5000L)
    } finally spark.conf.unset("spark.graft.pq.rerank")
    spark.conf.set("spark.graft.pq.rerankMax", "32")
    try intercept[IllegalArgumentException] {
      LlmOps.pqRerank(spark, 69, 5000L)
    } finally spark.conf.unset("spark.graft.pq.rerankMax")
    // FIFTH decade (r13, 50M vectors): the default rerankMax binds for
    // the first time — pool/4 wants 195,312 but ships 65,536, the
    // arithmetic behind the measured 0.80 recall (SCALE_r13.jsonl);
    // lifting the ceiling restores the pool-fraction rule.
    assert(LlmOps.pqRerank(spark, 4096, 50000000L) === 65536,
      "fifth decade: default ceiling binds")
    spark.conf.set("spark.graft.pq.rerankMax", "262144")
    try assert(LlmOps.pqRerank(spark, 4096, 50000000L) === 195312,
      "fifth decade: lifted ceiling restores pool/4")
    finally spark.conf.unset("spark.graft.pq.rerankMax")
  }

  test("nprobe geometry: auto √K in [3, 64], spark.graft.ivf.nprobe forces") {
    // The third auto dial's override (r13): K has ivf.k, R has
    // pq.rerank, nprobe had no forcing conf until the fifth decade
    // measured q7G's first recall dent (0.98 at 50M — K at its 4,096
    // ceiling, √K = 64 probes = 1.6 % of cells scanned). Pin the auto
    // values each measured decade used, the [3, 64] clamp, and the
    // forced path's ≤ K bound.
    import graft.operators.LlmOps
    Seq(69 -> 8, 224 -> 15, 704 -> 27, 2236 -> 47, 4096 -> 64)
      .foreach { case (k, want) =>
        assert(LlmOps.ivfNProbe(spark, k) === want, s"auto nprobe at K=$k")
      }
    assert(LlmOps.ivfNProbe(spark, 4) === 3, "lower clamp")
    assert(LlmOps.ivfNProbe(spark, 16384) === 64, "upper clamp")
    spark.conf.set("spark.graft.ivf.nprobe", "128")
    try {
      assert(LlmOps.ivfNProbe(spark, 16384) === 128, "forced past the cap")
      assert(LlmOps.ivfNProbe(spark, 50) === 50, "forced bounded by K")
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
    spark.conf.set("spark.graft.ivf.nprobe", "-1")
    try intercept[IllegalArgumentException] {
      LlmOps.ivfNProbe(spark, 69)
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }

  test("ivf.nprobe is query-side only: flipping it reuses the cached models") {
    import graft.operators.LlmOps
    // The claim behind the fifth-decade dial ladder — "nprobe is not
    // part of any model cache key, so flipping it between queries is
    // free" — pinned by OBJECT IDENTITY: the same session must serve a
    // forced-nprobe query from the SAME trained centroid and codebook
    // instances, not a retrain. (Every conf that shapes the model —
    // ivf.k, maxK, trainAssign, hierThreshold, localTrainLimit, the PQ
    // dims — IS in its cache key and does retrain; nprobe and the
    // rerank confs are the query-side exceptions, which is what lets
    // one 50M index serve every recall class in SCALE_r13.jsonl.)
    LlmOps.release(spark)
    val base = avgRecall("q7G_ann_ivf") // trains the IVF model
    val cents = LlmOps.ivfModel(spark, sf0001)._1 // cache hit by key
    SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001).collect() // + PQ
    val pq = LlmOps.pqModel(spark, sf0001)
    spark.conf.set("spark.graft.ivf.nprobe", "13")
    try {
      val forced = avgRecall("q7G_ann_ivf")
      assert(LlmOps.ivfModel(spark, sf0001)._1 eq cents,
        "an nprobe flip retrained the IVF model")
      // 13 probes > the fixture's √K ≈ 5 auto — a wider probe list
      // must hold the family's recall floor
      assert(forced >= 0.45 && forced >= base - 1e-9,
        s"forced-nprobe recall@5 = $forced (auto-nprobe base $base)")
      SparkEntry.queries("q7S_ann_ivfpq")(spark, sf0001).collect()
      assert(LlmOps.pqModel(spark, sf0001) eq pq,
        "an nprobe flip retrained the PQ codebooks")
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }
}
