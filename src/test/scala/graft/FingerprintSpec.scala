package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Winnowing fingerprint properties (q7E): identical texts fingerprint
  * identically; known near-duplicate pairs (q7A's ground truth) share
  * most fingerprints; unrelated docs share few; selection is sparse
  * (~n_grams/8 + distinct-collapse).
  */
class FingerprintSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val fps: Map[Long, (Int, Set[Long])] =
    LlmOps.fingerprints(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2).toSet)))
      .toMap

  private lazy val texts: Map[Long, String] =
    graft.sources.Tables.documents(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private def overlap(a: Set[Long], b: Set[Long]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("identical texts produce identical fingerprint sets") {
    // exact text dups only exist at sf0.1 (sf0.001's 500 texts are unique)
    import org.apache.spark.sql.functions.col
    val dupGroups = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._2).values.map(_.map(_._1).toSeq).filter(_.size > 1).toSeq
    assert(dupGroups.nonEmpty, "fixture has no exact dups — precondition broken")
    val dupIds = dupGroups.flatten
    val dupFps = LlmOps.fingerprints(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id").isin(dupIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    dupGroups.foreach { ids =>
      assert(ids.map(dupFps).distinct.size == 1,
        s"dup docs $ids fingerprint differently")
    }
  }

  test("near-duplicate docs share most fingerprints, random pairs few") {
    // ground-truth near-dups from the q7A output
    val near = SparkEntry.queries("q7A_dedup_minhash")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    near.foreach { case (a, b) =>
      val o = overlap(fps(a)._2, fps(b)._2)
      assert(o >= 0.5, s"near-dup pair ($a,$b) shares only $o")
    }
    val nearSet = near.toSet
    val ids = fps.keys.toSeq.sorted
    val randomPairs = ids.take(40).combinations(2)
      .map { case Seq(a, b) => (a, b) }
      .filterNot(nearSet.contains)
      .filter { case (a, b) => texts(a) != texts(b) }
    val avg = {
      val os = randomPairs.map { case (a, b) => overlap(fps(a)._2, fps(b)._2) }.toSeq
      os.sum / os.length
    }
    assert(avg <= 0.2, s"unrelated docs share too much: avg overlap $avg")
  }

  test("winnowing is sparse: fingerprints well below gram count") {
    fps.values.foreach { case (nGrams, fp) =>
      if (nGrams >= 32) assert(fp.size <= nGrams / 2, s"not sparse: ${fp.size}/$nGrams")
      assert(fp.nonEmpty)
    }
  }
}
