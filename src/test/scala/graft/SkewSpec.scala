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
}
