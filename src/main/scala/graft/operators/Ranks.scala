package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact `row_number() OVER (PARTITION BY part ORDER BY ord…)`
  * — the scale answer to rank windows whose partitions are huge (or whose
  * partition count is tiny: a bare per-lang rank is one task per language
  * no matter the cluster size).
  *
  * Shape: bucket rows by the LEADING sort key's value range (one
  * metadata-scale min/max job sizes the buckets), number rows locally
  * within (part, bucket) — parallel across buckets — then prefix-sum the
  * per-(part, bucket) counts (metadata: |part|·buckets rows) and
  * broadcast the offsets back; `offset + local rank` is bit-identical to
  * the monolithic window's rank.
  *
  * The bucket is a PURE FUNCTION of the row's values — deliberately not
  * `spark_partition_id()` over `repartitionByRange`, whose range
  * boundaries come from a seeded reservoir SAMPLE: that spelling is only
  * correct while ReuseExchange dedupes the two materializations of the
  * bucketed subtree (the offsets branch and the join branch), and
  * silently corrupts ranks if the exchanges ever diverge (e.g.
  * spark.sql.exchange.reuse=false). A value-derived bucket cannot
  * disagree with itself across re-evaluations.
  *
  * Requirements: `ordLead` numeric and non-null (both call sites rank by
  * ids/balances); equal `ordLead` values land in one bucket, so the
  * bucket function is monotonic in the sort order and ties break inside
  * a single local window. Bucket balance follows the value distribution
  * of `ordLead` — uniform-ish keys (ids, balances) spread evenly; raise
  * `buckets` for finer grain.
  */
object Ranks {

  def rowNumber(df: DataFrame, part: Seq[String], ordLead: Column,
                ordRest: Seq[Column], buckets: Int, as: String): DataFrame = {
    val mm = df.agg(min(ordLead).cast("double"), max(ordLead).cast("double")).head()
    val stats = if (mm.isNullAt(0)) None else Some((mm.getDouble(0), mm.getDouble(1)))
    rowNumber(df, part, ordLead, ordRest, buckets, as, stats)
  }

  /** Same contract with the min/max probe PRE-COMPUTED (r17, guide §1.2
    * "don't compute things you can fold into an existing pass"): a caller
    * that already runs an aggregation job over `df` (q56's ntile needs
    * the row count) passes the lead-key range from that same job instead
    * of paying a second full-scan probe here. `stats = None` declares the
    * input empty (min was NULL).
    */
  def rowNumber(df: DataFrame, part: Seq[String], ordLead: Column,
                ordRest: Seq[Column], buckets: Int, as: String,
                stats: Option[(Double, Double)]): DataFrame = {
    if (stats.isEmpty)
      // empty input: any rank column satisfies the contract vacuously
      return df.withColumn(as, lit(1L))
    val (mn, mx) = stats.get
    val bucket =
      if (mx > mn)
        least(floor((ordLead.cast("double") - mn) / ((mx - mn) / buckets)),
          lit(buckets - 1)).cast("int")
      else lit(0) // single-valued key: one bucket is all there is
    val partCols = part.map(col)
    val localW = Window.partitionBy(partCols :+ col("__bkt"): _*)
      .orderBy(ordLead +: ordRest: _*)
    val local = df.withColumn("__bkt", bucket)
      .withColumn("__lrn", row_number().over(localW).cast("long"))
    val offW = Window.partitionBy(partCols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(partCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .drop("__cnt")
    local.join(broadcast(offsets), part :+ "__bkt")
      .withColumn(as, col("__off") + col("__lrn"))
      .drop("__bkt", "__lrn", "__off")
  }
}
