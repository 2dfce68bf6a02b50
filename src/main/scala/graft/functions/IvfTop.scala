package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd IVF cell scoring: `graft_ivf_top(e, cents, cnsqs, p)`
  * returns the 0-based INDICES of the `p` best-scoring centroids for
  * vector `e`, ranked by `dot(e, cents[k]) / sqrt(cnsqs[k])` descending
  * with ties broken toward the smaller index — exactly the
  * `(cs, -cid)` order the r8 HOF spelling produced (the centroid list
  * is cid-ascending, so index order IS cid order; the caller maps index
  * → cid through a literal lookup).
  *
  * Why an Expression and not `transform()` over the centroid literal:
  * higher-order functions are CodegenFallback — K interpreted dot calls
  * per row, measured at 2.7 → 4.7 s on the sf0.1 q7G bench when the
  * data-driven K grew 16 → 45 — and UNROLLING K codegen'd dots into a
  * CreateArray regresses far worse (34 s: plan/codegen compile time
  * scales with the tree). One quaternary expression keeps the loop
  * inside whole-stage codegen at ANY K with an O(1)-size plan: the
  * assignment/probing cost returns to per-row arithmetic, which is the
  * property that lets K scale as √n (SCALING.md).
  *
  * `p` is a positive int literal in practice; the result length is
  * min(p, K). Both centroid literals come from the driver-resident
  * model (K·dim doubles — the MLlib-KMeans shape).
  */
case class IvfTop(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType),
    ArrayType(ArrayType(DoubleType)), ArrayType(DoubleType), IntegerType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_ivf_top"

  override def nullSafeEval(eAny: Any, centsAny: Any,
      cnsqAny: Any, pAny: Any): Any = {
    val e = eAny.asInstanceOf[ArrayData]
    val cents = centsAny.asInstanceOf[ArrayData]
    val cnsq = cnsqAny.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val p = math.min(pAny.asInstanceOf[Int], k)
    val bs = new Array[Double](p)
    val bi = new Array[Int](p)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      val dim = math.min(e.numElements(), c.numElements())
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += e.getDouble(d) * c.getDouble(d); d += 1 }
      val cs = dot / math.sqrt(cnsq.getDouble(i))
      // Double.compare, not >: NaN (an all-zero centroid gives 0/0)
      // must rank as LARGEST under a total order, matching the
      // replaced reverse(array_sort(...)) spelling — a bare > is not
      // total under NaN and makes the result arrival-order dependent
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(cs, bs(pos - 1)) > 0) pos -= 1
      if (pos < p) {
        val end = math.min(filled, p - 1)
        var m = end
        while (m > pos) { bs(m) = bs(m - 1); bi(m) = bi(m - 1); m -= 1 }
        bs(pos) = cs
        bi(pos) = i
        if (filled < p) filled += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cents, cnsq, pIn) => {
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val bs = ctx.freshName("bs")
      val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val dim = ctx.freshName("dim")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val cs = ctx.freshName("cs")
      val pos = ctx.freshName("pos")
      val end = ctx.freshName("end")
      val m = ctx.freshName("m")
      s"""
         |final int $k = $cents.numElements();
         |final int $p = java.lang.Math.min($pIn, $k);
         |final double[] $bs = new double[$p];
         |final int[] $bi = new int[$p];
         |int $filled = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($i);
         |  final int $dim = java.lang.Math.min($e.numElements(), $c.numElements());
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $dot += $e.getDouble($d) * $c.getDouble($d);
         |  }
         |  final double $cs = $dot / java.lang.Math.sqrt($cnsq.getDouble($i));
         |  int $pos = $filled;
         |  while ($pos > 0 && java.lang.Double.compare($cs, $bs[$pos - 1]) > 0) { $pos--; }
         |  if ($pos < $p) {
         |    final int $end = java.lang.Math.min($filled, $p - 1);
         |    for (int $m = $end; $m > $pos; $m--) {
         |      $bs[$m] = $bs[$m - 1]; $bi[$m] = $bi[$m - 1];
         |    }
         |    $bs[$pos] = $cs;
         |    $bi[$pos] = $i;
         |    if ($filled < $p) { $filled++; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object IvfTop {
  /** Idempotent registration, same defensive pattern as the other
    * kernels (Verify/Bench build their own sessions). Registers
    * [[ModelLit]] alongside: the centroid arguments arrive as
    * `graft_model_lit` leaves since r17.
    */
  def register(spark: SparkSession): Unit = {
    ModelLit.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ivf_top",
      args => IvfTop(args.head, args(1), args(2), args(3)),
      "built-in")
  }
}
