package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Partition-batched multimodal decode plumbing (SURVEY.md §2.10, M1) —
  * the Scala analog of a `mapInPandas` decode stage: a typed
  * Iterator→Iterator `mapPartitions` where a real media codec would
  * decode/resize/frame-sample bytes batch-wise, initializing the codec
  * once per partition instead of once per row.
  *
  * Two decode bodies behind the same plumbing: [[decodeImage]] is a REAL
  * codec (JDK `javax.imageio` — the one decoder the container does ship),
  * and [[decodeStub]] is a clearly-marked deterministic STUB (byte
  * statistics) standing in for audio/video codecs that don't. The schema
  * (opaque `binary` media + typed features), the per-partition batch
  * shape, and the distributed execution are the real pipeline either way:
  * swap the body and nothing else changes.
  *
  * Engine surface validated by MultimodalSpec; not a registry entry
  * (`mapPartitions` is deliberately outside the oracle-checkable SQL
  * surface — q7B covers the oracle-checked metadata path).
  */
object Multimodal {

  /** One asset row: id + opaque media bytes (image/audio/video/...). */
  case class Asset(doc_id: Long, media: Array[Byte])

  /** Extracted features; a real decoder would emit embeddings, frame
    * counts, dimensions, ... with the same Dataset-typed shape.
    */
  case class Features(doc_id: Long, n_bytes: Int, mean_byte: Double, head_crc: Long)

  /** STUB — stands in for the codec. Deterministic byte statistics. */
  def decodeStub(a: Asset): Features = {
    val n = a.media.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += a.media(i) & 0xff; i += 1 }
    val crc = new java.util.zip.CRC32()
    crc.update(a.media, 0, math.min(n, 64))
    Features(a.doc_id, n, if (n == 0) 0.0 else sum.toDouble / n, crc.getValue)
  }

  /** The decode stage: per-partition batched, no driver round-trip. The
    * input just needs (doc_id, media: binary).
    */
  def extract(assets: DataFrame): Dataset[Features] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("media")).as[Asset]
      .mapPartitions { it =>
        // real codecs initialize HERE, once per partition, then stream
        it.map(decodeStub)
      }
  }

  /** Image features from a REAL decode (dimensions + mean luminance). */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           mean_luma: Double, ok: Boolean)

  /** Real codec path — JDK `javax.imageio` (PNG/JPEG/GIF/BMP ship in
    * every JRE, no extra deps): proves the per-partition plumbing carries
    * a genuine decoder, not only the stub. Undecodable bytes yield
    * `ok = false` instead of failing the partition — at 100 TB a corrupt
    * asset must cost one row, not a task retry storm.
    */
  def decodeImage(a: Asset): ImageFeatures = {
    // NonFatal, not just IOException: JDK ImageIO readers throw
    // RuntimeExceptions (AIOOBE, NegativeArraySize, IllegalArgument) on
    // malformed-but-magic-valid bytes, and those must also cost one row
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.media))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) ImageFeatures(a.doc_id, -1, -1, 0.0, ok = false)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      ImageFeatures(a.doc_id, w, h, sum.toDouble / (3.0 * w * h), ok = true)
    }
  }

  /** Image-decode stage over (doc_id, media) — same per-partition batch
    * shape as [[extract]], real codec body.
    */
  def extractImages(assets: DataFrame): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("media")).as[Asset]
      .mapPartitions(_.map(decodeImage))
  }

  /** Fixture adapter: documents' text bytes as stand-in media. */
  def documentAssets(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
}
