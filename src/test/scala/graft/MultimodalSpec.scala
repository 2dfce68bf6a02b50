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

  test("real javax.imageio decode: synthetic PNGs come back with exact dims and luma") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val sparkS = spark
    import sparkS.implicits._

    // (doc_id, width, height, gray level) → solid-gray PNG bytes
    val cases = Seq((1L, 8, 6, 0), (2L, 16, 16, 128), (3L, 3, 5, 255))
    val pngs = cases.map { case (id, w, h, g) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      (id, out.toByteArray)
    }
    // plus one corrupt asset that must degrade to ok=false, not fail
    val assets = (pngs :+ (99L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "media").repartition(3)

    val feats = Multimodal.extractImages(assets).collect().map(f => f.doc_id -> f).toMap
    cases.foreach { case (id, w, h, g) =>
      val f = feats(id)
      assert(f.ok && f.width == w && f.height == h, s"doc $id decoded wrong dims")
      assert(f.mean_luma == g.toDouble, s"doc $id luma ${f.mean_luma} != $g")
    }
    assert(!feats(99L).ok && feats(99L).width == -1)
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
