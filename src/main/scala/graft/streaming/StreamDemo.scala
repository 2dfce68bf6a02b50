package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end events-to-db pipeline — the reference's whole
  * reason to exist, as one command:
  *
  *   sbt "runMain graft.streaming.StreamDemo [sfDir]"
  *
  * Stages the fixture events as a chunked micro-batch stream, runs the
  * S1 source → S7 Derby MERGE sink with a checkpoint (S8), then re-runs
  * the same stream from a fresh checkpoint to demonstrate idempotent
  * redelivery, and prints the landed row count + a per-type summary read
  * back FROM Derby.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-demo").toString
    System.setProperty("derby.system.home", work)
    val staging = s"$work/staging"
    val url = s"jdbc:derby:$work/db;create=true"

    EventStream.stage(spark, sfDir, staging, chunks = 4)

    val run1 = DerbySink.attach(EventStream.read(spark, staging), url, s"$work/ckpt").start()
    run1.processAllAvailable(); run1.stop()

    // redelivery from scratch: at-least-once source + idempotent MERGE
    val run2 = DerbySink.attach(EventStream.read(spark, staging), url, s"$work/ckpt2").start()
    run2.processAllAvailable(); run2.stop()

    val c = DerbySink.connect(url)
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM ${DerbySink.TABLE}")
      rs.next()
      println(s"[demo] events landed in Derby (after duplicate replay): ${rs.getLong(1)}")
      val rs2 = st.executeQuery(
        s"SELECT event_type, COUNT(*), CAST(AVG(value) AS DECIMAL(10,2)) " +
          s"FROM ${DerbySink.TABLE} GROUP BY event_type ORDER BY event_type")
      while (rs2.next())
        println(f"[demo]   ${rs2.getString(1)}%-10s n=${rs2.getLong(2)}%-6d avg=${rs2.getBigDecimal(3)}")
    } finally c.close()
    spark.stop()
  }
}
