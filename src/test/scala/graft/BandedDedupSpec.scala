package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmOps, Pipeline}

/** The composed pipeline's `dedupMode=banded` stage-1 (VERDICT r16 #2):
  * q7A's MinHash-LSH candidate graph verified at q7N's exact Jaccard
  * threshold. The load-bearing soundness direction, pinned both ways:
  * banding only PRUNES the exact edge set, so banded components refine
  * exact components and the banded dedup may KEEP an extra near-dup
  * (missed band ⇒ missed edge) but can never DROP a doc the exact dedup
  * keeps — the safe failure direction for a training corpus.
  */
class BandedDedupSpec extends AnyFunSuite {
  import SparkTestBase._

  private def idPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("banded edges ⊆ exact edges; banded dedup never drops a doc exact keeps") {
    LlmOps.release(spark)
    val d = sf0001
    try {
      val exactPairs = idPairs(SparkEntry.queries("q7N_dedup_jaccard")(spark, d))
      val bandedPairs = idPairs(LlmOps.bandedJaccardPairs(spark, d))
      assert(bandedPairs.nonEmpty, "fixture near-dups must band somewhere")
      assert(bandedPairs.subsetOf(exactPairs),
        s"banding must only PRUNE the exact edge set; extras: " +
          s"${(bandedPairs -- exactPairs).take(5)}")

      val exactSurv = ids(Pipeline.dedupStage(spark, d, "exact"))
      val bandedSurv = ids(Pipeline.dedupStage(spark, d, "banded"))
      // soundness: exact survivors ⊆ banded survivors ⟺ every
      // banded-dropped doc is exact-dropped. Proof sketch the assert
      // pins: banded edges ⊆ exact edges ⇒ each banded component lies
      // inside one exact component ⇒ the exact component min ≤ every
      // banded component min ⇒ a banded non-min is an exact non-min.
      assert(exactSurv.subsetOf(bandedSurv),
        s"banded dedup dropped docs the exact dedup keeps: " +
          s"${(exactSurv -- bandedSurv).take(5)}")
      // and it is not vacuous: the banded stage bites on the fixture
      val nDocs = graft.sources.Tables.documents(spark, d).count()
      assert(bandedSurv.size < nDocs, "banded dedup dropped nothing")
      assert(bandedSurv.size <= nDocs && exactSurv.nonEmpty)
    } finally LlmOps.release(spark)
  }

  test("dedupMode conf routes the composed DAG; bad values name the conf") {
    LlmOps.release(spark)
    val d = sf0001
    val key = "spark.graft.pipeline.dedupMode"
    try {
      spark.conf.set(key, "banded")
      val viaConf = ids(Pipeline.stages(spark, d).toMap.apply("1_dedup"))
      assert(viaConf == ids(Pipeline.dedupStage(spark, d, "banded")),
        "conf'd stage-1 must be the banded graph")
      spark.conf.set(key, "bogus")
      val e = intercept[IllegalArgumentException](Pipeline.stages(spark, d))
      assert(e.getMessage.contains(key))
    } finally {
      spark.conf.unset(key)
      LlmOps.release(spark)
    }
  }
}
