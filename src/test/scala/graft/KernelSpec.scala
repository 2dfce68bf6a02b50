package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct

/** The codegen'd dot-product expression must agree bit-for-bit with the
  * sequential fold it replaced (SURVEY.md §5.3: kernel vs BLAS-free
  * reference on random vectors) — on values, nulls, and length mismatch.
  */
class KernelSpec extends AnyFunSuite {
  import SparkTestBase._

  private def refDot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(64, Gen.chooseNum(-10.0, 10.0))

  test("graft_dot equals the sequential-fold reference on random vectors") {
    DotProduct.register(spark)
    import spark.implicits._
    val params = Gen.Parameters.default
    val rows = (0 until 200).map { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      val a = vecGen.pureApply(params, seed)
      val b = vecGen.pureApply(params, seed.next)
      (a, b, refDot(a, b))
    }
    val got = rows.toDF("a", "b", "want")
      .withColumn("got", expr("graft_dot(a, b)"))
      .collect()
    got.foreach { r =>
      // bit-exact: identical operation order
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("graft_dot null handling and length mismatch") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))), // extra elements ignored
      (None, Some(Seq(1.0))),                            // null array → null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])) // empty → 0.0
    ).toDF("a", "b").withColumn("d", expr("graft_dot(a, b)"))
    val out = df.select("d").collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("interpreted eval matches codegen path") {
    // nullSafeEval is exercised directly (the non-codegen fallback)
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5, -2.0, 3.25))
    val b = ArrayData.toArrayData(Array(2.0, 0.5, 4.0))
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1))
    assert(e.nullSafeEval(a, b) == (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * 4.0))
  }
}
