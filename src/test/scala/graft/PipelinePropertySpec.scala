package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** Brute-force re-proof of the composed pipeline on RANDOM corpora
  * (the JaccardSpec pattern): every stage recomputed in plain Scala —
  * exact Jaccard over all pairs + union-find components, the integer
  * quality signals, shared-shingle decontamination, the LCG split,
  * cumulative packing, and the weighted interleave — and compared
  * against the Spark stages. This catches conceptual errors the
  * fixture oracle can't: the DuckDB chain and the Spark DAG were
  * written by the same hand, so a shared misreading of a rule would
  * pass the cross-engine check; an independent from-the-rules model
  * would not.
  *
  * The CE gate is OFF in the all-stage property (ceMax = None): the
  * model stays all-integer and the equality airtight — a transcendental
  * score recomputed in a different summation order can legitimately
  * differ in the 4th decimal. The CE gate gets its OWN property below
  * (VERDICT r16 #6) with the tolerance made rigorous: the model
  * computes the same per-term doubles (long casts + java.lang.Math.log,
  * exactly Catalyst's arithmetic), differing from any Spark plan only
  * in SUMMATION ORDER, and the cut is placed at the widest CE gap so
  * every doc is provably farther from it than the reorder + ROUND(x,4)
  * error can reach — membership then must match exactly, both sides
  * populated by construction.
  */
class PipelinePropertySpec extends AnyFunSuite {
  import SparkTestBase._

  private case class Doc(id: Long, lang: String, source: String,
      words: Vector[String])

  /** Random corpus with the shapes each stage needs to bite: near-dup
    * copies (dedup), repetitive and stopword-heavy docs (quality), docs
    * copying an eval doc's content (decontamination), multiple
    * (lang, source) shards (pack/mix). doc_ids 0..n-1 so ids < 50 form
    * the eval suite.
    */
  private def corpus(seed: Long, n: Int): Vector[Doc] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "the", "a")
    val langs = Vector("en", "de", "xx")
    val sources = Vector("web", "book")
    val out = Vector.newBuilder[Doc]
    var docs = Vector.empty[Vector[String]]
    (0 until n).foreach { i =>
      val words: Vector[String] =
        if (i > 10 && rnd.nextInt(5) == 0) {
          // near-dup: copy an earlier doc, perturb one word
          val base = docs(rnd.nextInt(docs.length))
          if (base.isEmpty) base
          else base.updated(rnd.nextInt(base.length),
            vocab(rnd.nextInt(vocab.length)))
        } else if (i > 50 && rnd.nextInt(7) == 0) {
          // contamination: embed an eval doc's full text
          val ev = docs(rnd.nextInt(50))
          vocab(rnd.nextInt(vocab.length)) +: ev
        } else if (rnd.nextInt(8) == 0) {
          // repetitive junk: one token many times
          Vector.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(3)))
        } else {
          Vector.fill(3 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.length)))
        }
      docs = docs :+ words
      out += Doc(i.toLong, langs(rnd.nextInt(langs.length)),
        sources(rnd.nextInt(sources.length)), words)
    }
    out.result()
  }

  // ---------- the from-the-rules Scala model ----------

  private def shingles(w: Vector[String]): Set[String] =
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet

  private def dedupSurvivors(cs: Vector[Doc]): Set[Long] = {
    val sh = cs.map(d => d.id -> shingles(d.words)).toMap
    val withSh = cs.filter(d => sh(d.id).nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // smaller root wins = component min
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    for {
      i <- withSh.indices; j <- (i + 1) until withSh.length
      a = withSh(i); b = withSh(j)
      inter = (sh(a.id) intersect sh(b.id)).size
      union0 = sh(a.id).size + sh(b.id).size - inter
      if inter * 5 >= union0 * 3
    } union(a.id, b.id)
    cs.map(_.id).filter(id => find(id) == id).toSet
  }

  private def signalsOf(d: Doc): (Long, Long, Long, Long) = {
    val n = d.words.length.toLong
    val topc = d.words.groupBy(identity).values.map(_.size).max.toLong
    val stop = d.words.count(Set("the", "a", "of", "and")).toLong
    val dist = d.words.distinct.length.toLong
    val bgs = d.words.sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")).toVector
    val nbg = bgs.length.toLong
    val dbg = bgs.distinct.length.toLong
    (topc * 10000L / n,
      if (nbg == 0) 0L else (nbg - dbg) * 10000L / nbg,
      (n - stop + dist) * 5000L / n,
      n)
  }

  /** Thresholds calibrated from the model's own signal quantiles (the
    * campaign's onboarding pattern): each gate drops SOME docs but
    * never all — a tiny closed vocab reads "repetitive" under the
    * fixture defaults (every adjacent bigram recurs), so fixed cuts
    * would make the property vacuous.
    */
  private def calibrated(cs: Vector[Doc], survivors: Set[Long])
      : Pipeline.Thresholds = {
    val sig = cs.filter(d => survivors(d.id)).map(signalsOf).sortBy(_._1)
    def q(xs: Vector[Long], p: Double): Long =
      xs.sorted.apply(math.min(xs.size - 1, (xs.size * p).toInt))
    Pipeline.Defaults.copy(
      topBpMax = q(sig.map(_._1), 0.80),
      dup2BpMax = q(sig.map(_._2), 0.80),
      scoreBpMin = q(sig.map(_._3), 0.15),
      ceMax = None)
  }

  private def qualityKept(cs: Vector[Doc], survivors: Set[Long],
      th: Pipeline.Thresholds): Map[Long, Long] =
    cs.filter(d => survivors(d.id)).flatMap { d =>
      val (topBp, dup2Bp, scoreBp, n) = signalsOf(d)
      if (topBp <= th.topBpMax && dup2Bp <= th.dup2BpMax &&
        scoreBp >= th.scoreBpMin) Some(d.id -> n)
      else None
    }.toMap

  private def decontamKept(cs: Vector[Doc], kept: Map[Long, Long],
      th: Pipeline.Thresholds): Set[Long] = {
    val sh = cs.map(d => d.id -> shingles(d.words)).toMap
    val evals = cs.filter(_.id < th.evalIdMax).map(d => sh(d.id))
    kept.keySet.filter { id =>
      id >= th.evalIdMax &&
        !evals.exists(ev => (sh(id) intersect ev).size >= th.deconMinShared)
    }
  }

  private def splitOf(id: Long): String = {
    val b = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L *
      100L / 2147483648L
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private def packChunks(cs: Vector[Doc], ids: Set[Long],
      tokens: Map[Long, Long], th: Pipeline.Thresholds)
      : Map[(String, String, Long), (Long, Long)] = {
    val train = cs.filter(d => ids(d.id) && splitOf(d.id) == "train")
    train.groupBy(d => (d.lang, d.source)).flatMap { case ((l, s), ds) =>
      var cum = 0L
      ds.sortBy(_.id).map { d =>
        val t = tokens(d.id)
        cum += t
        val chunk = (cum - t) / th.packBudget
        ((l, s, chunk), (d.id, t))
      }.groupBy(_._1).map { case (k, rows) =>
        k -> (rows.size.toLong, rows.map(_._2._2).sum)
      }
    }
  }

  private def mixed(chunks: Map[(String, String, Long), (Long, Long)],
      th: Pipeline.Thresholds): Set[(Long, String, String, Long, Long, Long)] = {
    val wt = th.weights.toMap
    chunks.groupBy(_._1._1).flatMap { case (lang, cm) =>
      val w = wt.getOrElse(lang, 1L)
      cm.toVector.sortBy { case ((_, s, c), _) => (c, s) }.zipWithIndex
        .map { case (((l, s, c), (nd, ct)), i) =>
          ((i.toLong * 840L) / w, l, s, c, nd, ct)
        }
    }.toSet
  }

  // ---------- the property ----------

  test("composed pipeline ≡ the from-the-rules Scala model on random corpora") {
    graft.operators.LlmOps.release(spark)
    import spark.implicits._
    try {
      for (seed <- Seq(7L, 23L, 91L)) {
        val cs = corpus(seed, 140)
        val dir = tmpDir(s"graft-pipe-prop-$seed")
        cs.map(d => (d.id, d.words.mkString(" "), d.lang, d.source,
            d.words.mkString(" ").length.toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")

        // model
        val mDedup = dedupSurvivors(cs)
        val th = calibrated(cs, mDedup)
        val mQual = qualityKept(cs, mDedup, th)
        val mDec = decontamKept(cs, mQual, th)
        val mPack = packChunks(cs, mDec, mQual, th)
        val mMix = mixed(mPack, th)

        // Spark stages (the same functions the registry composes)
        val dedup = Pipeline.dedupStage(spark, dir)
        assert(dedup.select("doc_id").collect().map(_.getLong(0)).toSet
          == mDedup, s"seed=$seed dedup")
        val qual = Pipeline.qualityStage(dedup, th)
        assert(qual.select("doc_id", "tokens").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap == mQual,
          s"seed=$seed quality")
        val dec = Pipeline.decontamStage(spark, dir, qual, th)
        assert(dec.select("doc_id").collect().map(_.getLong(0)).toSet
          == mDec, s"seed=$seed decontam")
        val pk = Pipeline.packStage(Pipeline.splitStage(dec), th)
        assert(pk.collect().map(r => ((r.getString(0), r.getString(1),
          r.getLong(2)), (r.getLong(3), r.getLong(4)))).toMap == mPack,
          s"seed=$seed pack")
        val mx = Pipeline.mixStage(pk, th)
        assert(mx.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
          == mMix, s"seed=$seed mix")
        // every stage bit: non-vacuous
        assert(mDedup.size < cs.size, s"seed=$seed: dedup dropped nothing")
        assert(mQual.size < mDedup.size, s"seed=$seed: quality dropped nothing")
        assert(mDec.size < mQual.size, s"seed=$seed: decontam dropped nothing")
        assert(mPack.nonEmpty && mMix.nonEmpty, s"seed=$seed: empty tail")
        graft.operators.LlmOps.release(spark)
      }
    } finally graft.operators.LlmOps.release(spark)
  }

  /** The model's CE under the exact rule: per-term products are
    * (double)c · −log((double)cw / (double)n) with long-exact casts —
    * the same doubles Spark computes up to at most 1 ulp per log call
    * (java.lang.Math.log may be intrinsified; Catalyst may bind either
    * Math or StrictMath — both are within 1 ulp of fdlibm), so the
    * cross-engine divergence is summation order + ≤ k ulps, both
    * absorbed by the margin below.
    */
  private def ceOf(cs: Vector[Doc], survivors: Set[Long]): Map[Long, Double] = {
    val surv = cs.filter(d => survivors(d.id))
    val freq = surv.flatMap(_.words).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val n = freq.values.sum.toDouble
    surv.map { d =>
      val counts = d.words.groupBy(identity)
        .map { case (w, xs) => w -> xs.size.toLong }
      val s = counts.map { case (w, c) => c * -math.log(freq(w) / n) }.sum
      d.id -> s / d.words.length
    }.toMap
  }

  test("CE gate ≡ the model at a proven-safe margin, both sides populated") {
    // VERDICT r16 #6: the one floating-point gate, covered until now
    // only by the shared-author DuckDB chain. Margin argument: Spark's
    // gated value is ROUND(ce, 4) with ce summed in SOME order; the
    // model's ce uses identical per-term doubles, so |spark_raw −
    // model| ≤ (k−1)·2ε·Σ|terms|/Σc ≪ 1e-9 (k ≤ doc tokens ≤ 20,
    // terms ≤ 20·ln(corpus)), and |round(x,4) − x| ≤ 5e-5 + 1 ulp.
    // Place the cut so every model CE is > 1.5e-4 away and the rounded
    // Spark value cannot cross it — gate membership must then be
    // EXACTLY the model's, no tolerance in the assert itself.
    graft.operators.LlmOps.release(spark)
    import spark.implicits._
    try {
      for (seed <- Seq(11L, 47L)) {
        val cs = corpus(seed, 140)
        val dir = tmpDir(s"graft-pipe-ce-$seed")
        cs.map(d => (d.id, d.words.mkString(" "), d.lang, d.source,
            d.words.mkString(" ").length.toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")

        val mDedup = dedupSurvivors(cs)
        val ce = ceOf(cs, mDedup)
        // cut = midpoint of the widest gap in the middle half of the
        // CE distribution: both sides non-empty by construction, and
        // the margin assert below proves the stability precondition
        val sortedCe = ce.values.toVector.sorted
        val lo = sortedCe.size / 4
        val hi = sortedCe.size * 3 / 4
        val (gap, cut) = (lo until hi).map { i =>
          (sortedCe(i + 1) - sortedCe(i), (sortedCe(i) + sortedCe(i + 1)) / 2)
        }.maxBy(_._1)
        assert(gap > 3e-4,
          s"seed=$seed: widest mid-distribution CE gap $gap too narrow " +
            "for the margin argument — pick another seed")
        assert(ce.values.forall(c => math.abs(c - cut) > 1.5e-4))

        // neutralize the integer gates (top/dup2 ≤ 10000 bp always;
        // score ≥ 0 always): ONLY the CE gate bites
        val th = Pipeline.Defaults.copy(topBpMax = 10000L,
          dup2BpMax = 10000L, scoreBpMin = 0L, ceMax = Some(cut))
        val kept = Pipeline.qualityStage(Pipeline.dedupStage(spark, dir), th)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val mKept = ce.collect { case (id, c) if c <= cut => id }.toSet
        assert(kept == mKept, s"seed=$seed: CE gate membership diverged " +
          s"(spark-only ${(kept -- mKept).take(3)}, " +
          s"model-only ${(mKept -- kept).take(3)})")
        assert(mKept.nonEmpty && mKept.size < ce.size,
          s"seed=$seed: the cut must split the corpus")
        graft.operators.LlmOps.release(spark)
      }
    } finally graft.operators.LlmOps.release(spark)
  }
}
