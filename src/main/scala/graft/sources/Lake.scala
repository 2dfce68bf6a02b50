package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Partitioned parquet landing — the data-lake half of the storage
  * layout story ([[Bucketed]] is the join half): hive-style
  * `partitionBy` directories turn a partition-column predicate into
  * directory PRUNING, so a query over one tag/day touches that
  * directory's files and nothing else. At 100 TB this is the difference
  * between scanning a shard and scanning the lake; LakeSpec pins the
  * `PartitionFilters` plan property.
  *
  * Partition columns must be LOW-cardinality (tag, day — not event_id):
  * each value is a directory, and a high-cardinality partition key
  * shatters the lake into millions of small files. Within a partition,
  * file count follows the writing job's parallelism — compact with a
  * `repartition(cols)` before landing when many small batches
  * accumulate.
  */
object Lake {

  /** Batch landing, hive-style `part=<value>` directories. */
  def write(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("append").partitionBy(cols: _*).parquet(path)

  /** Streaming landing into the same layout. The parquet sink's commit
    * log gives exactly-once FILES: a restart from the checkpoint never
    * re-lands a committed batch, and readers through [[read]] see only
    * committed files (the _spark_metadata log is the source of truth,
    * not the directory listing).
    */
  def attach(df: DataFrame, path: String, checkpointDir: String,
             cols: String*): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(cols: _*)

  /** Reads the lake back; partition columns come from the directory
    * names, and predicates on them prune before any file opens.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
