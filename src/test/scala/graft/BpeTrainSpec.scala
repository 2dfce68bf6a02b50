package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** q7T validation: the distributed trainer must reproduce, merge for
  * merge, a plain-Scala reference BPE run over the same collected
  * (word, count) table — decision counts included — and its first
  * decision must be exactly q7Q's top pair.
  */
class BpeTrainSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Reference BPE: greedy left-to-right apply, ties (cnt desc, left
    * asc, right asc) — the trainer's declared rule.
    */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var syms: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + words(w)
      if (counts.isEmpty) return out.toSeq
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), cnt) => (-cnt, x, y) }.head
      out += ((a, b, c))
      syms = syms.map { case (w, s) =>
        val fused = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
            fused += (a + b); i += 2
          } else { fused += s(i); i += 1 }
        }
        w -> fused.toVector
      }
    }
    out.toSeq
  }

  private lazy val wordCounts: Map[String, Long] =
    graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q7T: 20 distributed merges ≡ the reference BPE run, counts included") {
    val got = BpeTrain.train(spark,
      BpeTrain.baseWords(graft.sources.Tables.documents(spark, sf0001)), 20)
      .map(m => (m.left, m.right, m.cnt))
    val want = refTrain(wordCounts, 20)
    assert(want.size == 20, s"fixture exhausted pairs early: ${want.size}")
    assert(got == want,
      s"first diff at step ${got.zip(want).indexWhere(p => p._1 != p._2) + 1}: " +
        s"got=${got.zip(want).find(p => p._1 != p._2)}")
    // multi-char tokens must actually have formed by step 20 — otherwise
    // the test only ever exercised char-pair counting
    assert(got.exists { case (l, r, _) => l.length > 1 || r.length > 1 },
      "no learned token was ever re-merged in 20 steps")
  }

  test("q7T: local fast path ≡ distributed loop, merge for merge (r13)") {
    // train() takes the collected-local path on this fixture (vocab far
    // under localVocabLimit); the distributed per-step loop must produce
    // the IDENTICAL merge table — counts, steps, tie decisions
    val words = BpeTrain.baseWords(
      graft.sources.Tables.documents(spark, sf0001))
    val local = BpeTrain.train(spark, words, 20)
    val dist = BpeTrain.trainDistributed(spark, words, 20)
    assert(local == dist,
      s"first diff at ${local.zip(dist).indexWhere(p => p._1 != p._2) + 1}")
    // the conf gate: limit 0 disables the local path entirely
    spark.conf.set("spark.graft.bpe.localVocabLimit", "0")
    try assert(BpeTrain.train(spark, words, 5) == dist.take(5))
    finally spark.conf.unset("spark.graft.bpe.localVocabLimit")
    // ADVICE r13: a limit at/above Int.MaxValue must not wrap the
    // LIMIT-probe negative — the probe clamps and the query still runs
    spark.conf.set("spark.graft.bpe.localVocabLimit",
      Int.MaxValue.toString)
    try assert(BpeTrain.train(spark, words, 5) == dist.take(5))
    finally spark.conf.unset("spark.graft.bpe.localVocabLimit")
  }

  test("q7T: the first merge decision is q7Q's top pair") {
    val q7q = SparkEntry.queries("q7Q_bpe_merge_step")(spark, sf0001)
      .collect().head
    val first = BpeTrain.train(spark,
      BpeTrain.baseWords(graft.sources.Tables.documents(spark, sf0001)), 1).head
    assert(s"${first.left} ${first.right}" == q7q.getString(0))
    assert(first.cnt == q7q.getLong(1))
  }

  test("q7U: tokenized frequencies equal the reference tokenizer applied to the word table") {
    // reference: train RegistryMerges merges, apply greedily to each
    // distinct word, count tokens weighted by word count — exactly what
    // the one-pass chained-fold projection must compute
    val n = BpeTrain.RegistryMerges
    val mergeList = refTrain(wordCounts, n).map { case (a, b, _) => (a, b) }
    def applyAll(word: String): Vector[String] =
      mergeList.foldLeft(word.map(_.toString).toVector) { case (s, (a, b)) =>
        val fused = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
            fused += (a + b); i += 2
          } else { fused += s(i); i += 1 }
        }
        fused.toVector
      }
    val wantCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wordCounts; t <- applyAll(w))
      wantCounts(t) = wantCounts.getOrElse(t, 0L) + c
    val want = wantCounts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(25)

    val got = SparkEntry.queries("q7U_bpe_tokenize")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // the top-25 must contain a genuinely merged (multi-char) token, or
    // the fold chain was never exercised by this pin
    assert(got.exists(_._1.length > 1))
  }

  test("q7T: registry entry returns the merge table in training order") {
    val rows = SparkEntry.queries("q7T_bpe_train")(spark, sf0001).collect()
    assert(rows.length == BpeTrain.RegistryMerges)
    assert(rows.map(_.getInt(0)).toSeq == (1 to BpeTrain.RegistryMerges))
    rows.foreach(r => assert(r.getLong(3) > 0))
  }
}
