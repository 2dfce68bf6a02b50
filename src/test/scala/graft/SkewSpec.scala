package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** The salted two-phase aggregate must be value-identical to the direct
  * groupBy (associative aggregates compose exactly), while spreading any
  * single key over `salts` first-phase groups.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestBase._

  test("salted sum/count equals direct groupBy on the events fixture") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val direct = ev.groupBy(col("user_id").as("k"))
      .agg(sum("value").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew
      .saltedSumCount(ev, col("user_id"), col("value"), col("event_id"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == direct(k)._2, s"count for $k")
      assert(math.abs(s - direct(k)._1) <= 1e-9, s"sum for $k")
    }
  }

  test("salt spreads a single hot key over the salt domain") {
    import spark.implicits._
    val hot = (0L until 1000L).map(i => (42L, i, 1.0)).toDF("user_id", "event_id", "value")
    val groups = hot
      .select(Skew.salt(col("event_id"), 16).as("s"))
      .distinct().count()
    assert(groups >= 12, s"only $groups of 16 salt buckets used")
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    // Skew.scala's contract for JOINS is "AQE handles it" — prove it.
    // 200k-row left side where 90% of rows share key 0; thresholds
    // lowered so fixture-scale sizes qualify as skewed; broadcast
    // disabled so the join must be a shuffled SMJ.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(0, 200000).toDF("id")
        .select(col("id"),
          when(pmod(col("id"), lit(10)) < 9, 0L)
            .otherwise(pmod(col("id"), lit(100))).as("k"))
      val right = spark.range(0, 100).toDF("k").withColumn("rv", col("k") * 2)
      val joined = left.join(right, "k")
      // collect() executes THIS Dataset's queryExecution (count() would
      // build and finalize a different one), so the introspection below
      // sees the finalized adaptive plan
      val n = joined.collect().length
      // expected multiplicity: every left row matches exactly one right key
      assert(n == 200000, s"join row count $n")
      // the finalized adaptive plan nests the join inside query stages
      // (not `children`), so assert on the rendered tree, which includes
      // them: AQE marks the optimized join `SortMergeJoin(skew=true)`
      // reading through an `AQEShuffleRead skewed`
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join:\n" + plan)
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        "AQE did not mark the join skew-optimized:\n" + plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
