package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM (suites run
  * sequentially — build.sbt). local[4] keeps test latency low; the
  * engine's scale posture is exercised by plan shape, not test core
  * count.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // catalog tables (BucketingSpec) must not land in the repo workdir
      .config("spark.sql.warehouse.dir", tmpDir("graft-warehouse"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
