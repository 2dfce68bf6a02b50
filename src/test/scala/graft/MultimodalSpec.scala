package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The decode stage must be distributed (one output row per asset, no
  * driver loop), deterministic, and agree with a direct per-row
  * recomputation of the stub features.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._

  test("partition-batched decode emits one feature row per asset") {
    val assets = Multimodal.documentAssets(spark, sf0001)
    val feats = Multimodal.extract(assets).collect()
    assert(feats.length == assets.count())
    assert(feats.map(_.doc_id).distinct.length == feats.length)
  }

  test("stub features match a direct recomputation") {
    val texts = graft.sources.Tables.documents(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = Multimodal.extract(Multimodal.documentAssets(spark, sf0001))
      .collect().map(f => f.doc_id -> f).toMap
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val want = Multimodal.decodeStub(Multimodal.Asset(id, bytes))
      assert(feats(id) == want, s"doc $id")
    }
  }
}
