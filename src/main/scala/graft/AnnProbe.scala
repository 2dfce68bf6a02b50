package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic probe splitting the ANN queries' wall into model-training
  * vs serving time (Bench only sees their sum): releases the session
  * model caches, then times `ivfModel`/`pqModel` and the q7G/q7S query
  * bodies separately, twice. This is the harness behind SCALING.md's
  * local-vs-distributed quantizer-training numbers (r13) — run it when
  * an ANN wall drifts to see WHICH half moved.
  *
  * `AnnProbe [sfDir]` — default /root/testdata/sf0.1.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    for (i <- 1 to 2) {
      operators.LlmOps.release(spark)
      t(s"ivfModel_$i")(operators.LlmOps.ivfModel(spark, d))
      t(s"pqModel_$i")(operators.LlmOps.pqModel(spark, d))
      t(s"q7G_query_$i")(SparkEntry.queries("q7G_ann_ivf")(spark, d).count())
      t(s"q7S_query_$i")(SparkEntry.queries("q7S_ann_ivfpq")(spark, d).count())
    }
    spark.stop()
  }
}
