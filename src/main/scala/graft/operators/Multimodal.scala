package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Partition-batched multimodal decode plumbing (SURVEY.md §2.10, M1) —
  * the Scala analog of a `mapInPandas` decode stage: a typed
  * Iterator→Iterator `mapPartitions` where a real media codec would
  * decode/resize/frame-sample bytes batch-wise, initializing the codec
  * once per partition instead of once per row.
  *
  * No image/audio codecs ship in this container, so [[decodeStub]] is a
  * clearly-marked deterministic STUB (byte statistics) — but the schema
  * (opaque `binary` media + typed features), the per-partition batch
  * shape, and the distributed execution are the real pipeline: swap the
  * stub body for a codec call and nothing else changes.
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

  /** Fixture adapter: documents' text bytes as stand-in media. */
  def documentAssets(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
}
