package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LlmOps
import graft.sources.Tables

/** Guards for the q76/q77 brute-force cosine family.
  *
  * 1. Rounding-boundary guard: q76's top-10 cut and q77's 0.38 threshold
  *    compare 4-decimal-rounded cosines across two engines that round
  *    doubles differently (Spark decimal-string HALF_UP vs DuckDB binary
  *    double). That is deterministic only while no fixture pair's TRUE
  *    cosine sits within ~1e-9 of a .xxxx5 rounding boundary (where the
  *    engines could round apart) or of the 0.38 threshold itself (where
  *    >= could flip). Round 2 verified this by hand; this spec re-verifies
  *    it on every run so a fixture refresh can't silently flip a row.
  *
  * 2. Cache lifecycle: [[LlmOps.release]] must actually unpersist the
  *    shared sim tables a session accumulated.
  */
class SimGuardSpec extends AnyFunSuite {
  import SparkTestBase._

  private def trueCosines(d: String): Seq[Double] = {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    val out = Vector.newBuilder[Double]
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      var dot = 0.0
      var k = 0
      while (k < vecs(i).length) { dot += vecs(i)(k) * vecs(j)(k); k += 1 }
      out += dot / (norms(i) * norms(j))
    }
    out.result()
  }

  test("no sf0.01 pair cosine rides a .xxxx5 rounding boundary or the 0.38 threshold") {
    val sims = trueCosines(sf001)
    assert(sims.size == 500 * 499 / 2)
    // Tolerance: the engines can only actually round apart when the value
    // is within ~1 ulp of sim·1e4 of the half-way point — ~1e-16 in sim
    // units. 1e-12 asserts four orders of margin over that. (1e-9 would
    // be nicer but the sf0.01 fixture genuinely contains pairs ~4e-10
    // from a boundary — measured here — and the oracle still matches,
    // exactly as the ulp argument predicts.)
    val nearBoundary = sims.filter { s =>
      val frac = (s.abs * 10000.0) % 1.0
      (frac - 0.5).abs * 1e-4 < 1e-12
    }
    assert(nearBoundary.isEmpty,
      s"cosines within 1e-12 of a rounding half-way point: ${nearBoundary.take(5)}")
    val nearThreshold = sims.filter(s => (s - 0.38).abs < 1e-9)
    assert(nearThreshold.isEmpty,
      s"cosines within 1e-9 of the 0.38 threshold: ${nearThreshold.take(5)}")
  }

  test("release() unpersists the session's cached sim tables") {
    // r17: start from a released state — another suite in the same JVM
    // (e.g. OperatorSpec) may have left the sf0.001 sim table cached,
    // in which case q77 below is a cache HIT and the grow-assert fails
    // on suite ORDER, not on behavior
    LlmOps.release(spark)
    val before = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("q77_sim_threshold")(spark, sf0001).count()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "expected q77 to persist its shared sim table")
    LlmOps.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "release() left persisted RDDs behind")
    // and the family still works after release (rebuilds its cache)
    assert(SparkEntry.queries("q76_sim_cosine_topk")(spark, sf0001).count() == 10)
    LlmOps.release(spark)
  }
}
