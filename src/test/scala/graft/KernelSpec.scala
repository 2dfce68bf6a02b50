package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, SortedIntersect}

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

  test("graft_isect equals set-intersection size on random sorted sets") {
    SortedIntersect.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i sh$i g$i") // multi-word, like shingles
    val rows = (0 until 300).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    rows.toDF("a", "b", "want")
      .withColumn("got", expr("graft_isect(a, b)"))
      .collect()
      .foreach(r => assert(r.getInt(2) == r.getInt(3)))
  }

  test("graft_isect agrees with array_intersect on the sorted shingle data") {
    // end-to-end guard for the q7N verify swap: on the actual persisted
    // shingle sets (pre-sorted by construction), the codegen'd walk must
    // equal the built-in set intersection for every near-dup pair
    SortedIntersect.register(spark)
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3) // sequence(1, 0) would step DOWN
      .select(col("doc_id"),
        expr("array_sort(array_distinct(transform(sequence(1, greatest(size(w)-2, 0)), i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))))").as("s"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")).limit(2000)
      .select(expr("graft_isect(a.s, b.s)").as("got"),
        size(array_intersect(col("a.s"), col("b.s"))).as("want"))
      .collect()
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_isect null and empty handling") {
    SortedIntersect.register(spark)
    import spark.implicits._
    val out = Seq(
      (Some(Seq("a", "b")), Some(Seq("b", "c"))),
      (None, Some(Seq("a"))),
      (Some(Seq.empty[String]), Some(Seq("a")))
    ).toDF("a", "b").withColumn("c", expr("graft_isect(a, b)"))
      .select("c").collect()
    assert(out(0).getInt(0) == 1)
    assert(out(1).isNullAt(0))
    assert(out(2).getInt(0) == 0)
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
