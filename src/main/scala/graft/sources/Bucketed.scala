package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables → co-located, exchange-free joins (the 100 TB join
  * posture, SURVEY §4 / SCALING.md): writing both sides of a recurring
  * join `bucketBy` the join key hash-pre-partitions the data ON DISK, so
  * every later join on that key runs with ZERO shuffle on either side —
  * the join cost is paid once at write time and amortized over every
  * query. `sortBy` inside the bucket additionally drops the sort from
  * the sort-merge join.
  *
  * On a real cluster these are catalog tables on shared storage; locally
  * the session catalog + warehouse dir stand in. BucketingSpec asserts
  * the plan property (no `Exchange` anywhere in the joined plan) and
  * result equality with the plain shuffled join.
  */
object Bucketed {

  /** Writes `df` as a bucketed+sorted catalog table on `key`. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join of two tables bucketed on `key`: with matching bucket
    * counts Spark plans a sort-merge join whose children are the bucketed
    * scans directly — no Exchange, no per-query shuffle.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
