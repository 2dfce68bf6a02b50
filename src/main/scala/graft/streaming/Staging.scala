package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replay staging shared by every file-stream consumer (EventStream,
  * the Scale ingest/vecingest probes, the S14/S15 parity specs): writes
  * `df` as `chunks` order-contiguous single-file parquet appends so a
  * `maxFilesPerTrigger` reader replays it as a deterministic stream.
  *
  * The 5 ms pause between appends keeps file mtimes strictly
  * increasing: the file stream source orders same-mtime files
  * arbitrarily, and an early chunk arriving after a later one would be
  * watermark-dropped wholesale. Test/probe-scale plumbing — the
  * single-partition ntile window is replay staging, not an engine
  * operator.
  */
object Staging {
  def chunked(df: DataFrame, order: Seq[Column], chunks: Int, dir: String): Unit = {
    val w = Window.orderBy(order: _*)
    val bucketed = df.withColumn("__bucket", ntile(chunks).over(w)).cache()
    try (1 to chunks).foreach { b =>
      bucketed.filter(col("__bucket") === b).drop("__bucket")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(5)
    } finally bucketed.unpersist()
  }
}
