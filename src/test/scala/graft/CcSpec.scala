package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** q7R (connected components) + q7Q (BPE merge step) specs — VERDICT r6
  * items 1/5. The components core is checked three ways: against an
  * in-memory union-find model on seeded random graphs, for the O(log n)
  * round bound on the adversarial chain graph (the shape that forced the
  * round-6 min-label propagation into O(n) rounds), and for determinism
  * across input partitionings. q7R is then checked end-to-end at
  * sf0.001: union-find over the public q7N pair table must equal the
  * q7R component sizes.
  */
class CcSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Union-find with smaller-root-wins links, so every find() lands on
    * the component's minimum member — the same representative the
    * large-star/small-star fixpoint elects. Returns node → component min
    * for every node that appears in an edge.
    */
  private def ufModel(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def starEdges(model: Map[Long, Long]): Set[(Long, Long)] =
    model.collect { case (k, r) if k != r => (k, r) }.toSet

  private def toDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("u", "v")
  }

  private def collectStars(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cc: matches union-find on seeded random graphs") {
    for (seed <- 1 to 5; (n, m) <- Seq((20, 12), (50, 60), (120, 200))) {
      val rnd = new scala.util.Random(seed * 1000 + n)
      // non-contiguous ids so nothing accidentally relies on density
      def id(): Long = rnd.nextInt(n).toLong * 7 + 3
      val edges = Seq.fill(m) {
        val a = id(); var b = id(); while (b == a) b = id(); (a, b)
      }
      val (stars, rounds) = LlmOps.connectedComponentsWithRounds(toDf(edges))
      val got = collectStars(stars)
      stars.unpersist()
      assert(got == starEdges(ufModel(edges)), s"seed=$seed n=$n m=$m")
      assert(rounds >= 1 && rounds <= 10, s"rounds=$rounds at n=$n m=$m")
    }
  }

  test("cc: chain graph converges in O(log n) rounds, not O(n)") {
    val n = 512
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val (stars, rounds) = LlmOps.connectedComponentsWithRounds(toDf(edges))
    val got = collectStars(stars)
    stars.unpersist()
    // one component rooted at the minimum id, everyone else a child
    assert(got == (1L until n.toLong).map(i => (i, 0L)).toSet)
    // the round-6 label propagation needed ~n rounds here; the star
    // alternation halves path lengths, so ~log2(512)=9 plus the no-op
    // confirmation round — pin with slack, but far below O(n)
    assert(rounds <= 12, s"rounds=$rounds — lost the O(log n) bound")
  }

  test("cc: 1-hub star graph with 100k leaves — flat rounds under fan-in skew") {
    // VERDICT r7 #5: the chain tests stress DEPTH; a hub node stresses
    // FAN-IN — one group key owns 100k neighbor rows in the min
    // aggregation. The map-side min partial agg means the hub's group
    // ships one partial per map task, never its raw neighbor list to a
    // single reducer; a star is also already one contraction from the
    // fixpoint, so rounds must be ≤ 3 regardless of leaf count. Hub id
    // ABOVE the leaves so the fixpoint genuinely re-roots the star (the
    // hub is not its component's minimum).
    import spark.implicits._
    val hub = 5000000L
    val leaves = 100000L
    val edges = spark.range(1, leaves + 1)
      .select(lit(hub).as("u"), col("id").as("v"))
    val (stars, rounds) = LlmOps.connectedComponentsWithRounds(edges)
    val got = collectStars(stars)
    stars.unpersist()
    val want = (2L to leaves).map(i => (i, 1L)).toSet + ((hub, 1L))
    assert(got == want)
    assert(rounds <= 3, s"rounds=$rounds — hub star should contract immediately")
  }

  test("cc: deterministic across input partitionings and row order") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val base = toDf(edges)
    val runs = Seq(base.repartition(1), base.repartition(13),
      toDf(rnd.shuffle(edges)).repartition(7)).map { df =>
      val (stars, _) = LlmOps.connectedComponentsWithRounds(df)
      val got = collectStars(stars)
      stars.unpersist()
      got
    }
    assert(runs.distinct.size == 1)
  }

  test("cc: per-round lineage cut keeps the final plan O(1)") {
    // the star operators reference their input ~12×, so without the
    // per-round re-rooting the result's LOGICAL plan would hold
    // 12^rounds nodes (the shape that OOM'd the first cut of this loop
    // while AQE rendered an explain string). The returned table must be
    // a flat RDD scan, not a tower of rounds.
    val edges = (0L until 63L).map(i => (i, i + 1))
    val (stars, rounds) = LlmOps.connectedComponentsWithRounds(toDf(edges))
    val nodes = stars.queryExecution.logical.collect { case p => p }.size
    stars.unpersist()
    assert(rounds >= 5, s"rounds=$rounds — chain should need several rounds")
    assert(nodes <= 5, s"final logical plan has $nodes nodes — lineage cut lost")
  }

  test("cc: empty edge set yields empty result in zero rounds") {
    val (stars, rounds) = LlmOps.connectedComponentsWithRounds(
      toDf(Seq.empty[(Long, Long)]))
    assert(stars.count() == 0 && rounds == 0)
    stars.unpersist()
  }

  test("cc: driver-local path (r13 gate) is bit-identical to the " +
    "distributed star fixpoint") {
    // ccStarsLocal must emit EXACTLY the large-star/small-star fixpoint
    // set — that identity is why the gate does not key the q7R cache.
    for (seed <- 1 to 5; (n, m) <- Seq((20, 12), (50, 60), (120, 200))) {
      val rnd = new scala.util.Random(seed * 777 + n)
      def id(): Long = rnd.nextInt(n).toLong * 11 + 5
      val edges = Seq.fill(m) {
        val a = id(); var b = id(); while (b == a) b = id(); (a, b)
      }
      val (stars, _) = LlmOps.connectedComponentsWithRounds(toDf(edges))
      val dist = collectStars(stars)
      stars.unpersist()
      val local = LlmOps.ccStarsLocal(edges.toArray).toSet
      assert(local == dist, s"seed=$seed n=$n m=$m")
    }
    assert(LlmOps.ccStarsLocal(Array.empty[(Long, Long)]).isEmpty)
  }

  test("q7R: forced-distributed path equals the default (local) path " +
    "end-to-end") {
    // default gate (1M edges) puts the sf0.001 registry run on the
    // LOCAL path; force the distributed loop through the same registry
    // entry and pin result equality. release() drops the session's q7R
    // star cache (keyed without the gate — outputs are identical) so
    // the second run genuinely rebuilds.
    val local = SparkEntry.queries("q7R_dedup_components")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local.nonEmpty)
    LlmOps.release(spark)
    spark.conf.set("spark.graft.cc.localLimit", "0")
    try {
      val dist = SparkEntry.queries("q7R_dedup_components")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(dist == local)
    } finally {
      spark.conf.unset("spark.graft.cc.localLimit")
      LlmOps.release(spark)
    }
    // ADVICE r13: a limit at Int.MaxValue must not wrap the LIMIT-probe
    // negative — the probe clamps and the (local) run still succeeds
    spark.conf.set("spark.graft.cc.localLimit", Int.MaxValue.toString)
    try {
      val clamped = SparkEntry.queries("q7R_dedup_components")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(clamped == local)
    } finally {
      spark.conf.unset("spark.graft.cc.localLimit")
      LlmOps.release(spark)
    }
  }

  test("q7R: end-to-end equals union-find over the q7N pair table") {
    val pairs = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty) // the fixture is built to contain near-dups
    val exp = ufModel(pairs).groupBy(_._2)
      .map { case (root, ms) => (root, ms.size.toLong) }
    val got = SparkEntry.queries("q7R_dedup_components")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toMap == exp)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted) // ORDER BY rep
  }

  test("q7Q: hand-computed BPE pair counts on a 3-word fixture") {
    import spark.implicits._
    val dir = tmpDir("graft-q7q")
    // wc: aa→2, ab→2, abc→1 ("b" drops, length < 2)
    // pairs: "a a" ← aa(2); "a b" ← ab(2) + abc(1); "b c" ← abc(1)
    Seq((1L, "aa ab aa", "en", "web", 8L), (2L, "ab b abc", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q7Q_bpe_merge_step")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b", 3L), ("a a", 2L), ("b c", 1L)))
  }
}
