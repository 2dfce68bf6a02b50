package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd SimHash banding: `graft_simhash_bands(e, planes, bands,
  * bits)` returns the `bands` LSH band values of vector `e` — band b's
  * value has bit (bits−1−j) set iff `dot(e, plane[b·bits + j]) ≥ 0` —
  * over a FLATTENED hyperplane literal (plane p occupies
  * `planes[p·64, p·64+64)`; the ±1 entries come from the same seeded
  * mix as the r11 SQL spelling, so band values are bit-identical to
  * the expression tree this kernel replaced).
  *
  * Why an Expression and not the per-plane SQL sum (`IF(graft_dot(e,
  * <64-double literal>) >= 0, 2^k, 0) + …` × bits × bands): that tree
  * is O(bands · bits) in generated-code size, and the r14 n-scaled
  * geometry grows both dials with the corpus — at (24, 15) and
  * (37, 18) the generated method crossed the JVM's 64 KB limit and the
  * whole corpus-scale banding pass fell out of whole-stage codegen
  * into interpreted eval (measured r14: `Code grows beyond 64 KB`
  * fallbacks in the 5M/50M campaign logs — the Scale rows stand, but
  * paid interpreted banding). One quaternary expression keeps the
  * loop inside codegen at ANY geometry with an O(1)-size plan — the
  * same argument as [[IvfTop]], one tier out.
  */
case class SimhashBands(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType),
    ArrayType(DoubleType), IntegerType, IntegerType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_simhash_bands"

  /** Plane width: [[AnnPlanesWidth]] doubles per hyperplane — the dot
    * runs over min(width, |e|), matching the old graft_dot spelling on
    * a 64-entry plane literal.
    */
  private val W = SimhashBands.PlaneWidth

  override def nullSafeEval(eAny: Any, plAny: Any,
      bandsAny: Any, bitsAny: Any): Any = {
    val e = eAny.asInstanceOf[ArrayData]
    val pl = plAny.asInstanceOf[ArrayData]
    val bands = bandsAny.asInstanceOf[Int]
    val bits = bitsAny.asInstanceOf[Int]
    SimhashBands.checkArgs(bands, bits, pl.numElements())
    val dim = math.min(W, e.numElements())
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bval = 0
      var j = 0
      while (j < bits) {
        val base = (b * bits + j) * W
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += e.getDouble(d) * pl.getDouble(base + d); d += 1 }
        if (dot >= 0.0) bval |= 1 << (bits - 1 - j)
        j += 1
      }
      out(b) = bval
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, pl, bands, bits) => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val bval = ctx.freshName("bval")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      s"""
         |graft.functions.SimhashBands.checkArgs($bands, $bits, $pl.numElements());
         |final int $dim = java.lang.Math.min($W, $e.numElements());
         |final int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bval = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    final int $base = ($b * $bits + $j) * $W;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += $e.getDouble($d) * $pl.getDouble($base + $d);
         |    }
         |    if ($dot >= 0.0) { $bval |= 1 << ($bits - 1 - $j); }
         |  }
         |  $out[$b] = $bval;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object SimhashBands {
  /** Doubles per hyperplane in the flattened literal — the historical
    * 64-entry plane width of the SQL spelling (vectors are d=64 across
    * the fixtures and campaigns; a shorter vector dots over its own
    * length, same as graft_dot did).
    */
  val PlaneWidth = 64

  /** Geometry/length guard shared by eval and the generated code
    * (ADVICE r14): the function is SQL-exposed cluster-wide, and
    * `UnsafeArrayData.getDouble` is NOT bounds-checked — a malformed
    * call (short planes literal, bits > 31's shift wrap) would return
    * silent garbage under codegen where the interpreted path happens to
    * throw. Fail loudly in BOTH paths, naming the expected length.
    * Static (not MODULE$) so the generated Java call site is plain.
    */
  @throws[IllegalArgumentException]
  def checkArgs(bands: Int, bits: Int, planesLen: Int): Unit = {
    if (bands < 1 || bits < 1 || bits > 31 ||
        planesLen.toLong < bands.toLong * bits * PlaneWidth)
      throw new IllegalArgumentException(
        s"graft_simhash_bands: need bands >= 1, 1 <= bits <= 31 and " +
          s"|planes| >= bands*bits*$PlaneWidth = " +
          s"${bands.toLong * bits * PlaneWidth}; got bands=$bands, " +
          s"bits=$bits, |planes|=$planesLen")
  }

  /** Idempotent registration, same defensive pattern as the other
    * kernels (Verify/Bench build their own sessions).
    */
  def register(spark: SparkSession): Unit = {
    ModelLit.register(spark) // planes argument arrives as a model-lit leaf (r17)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash_bands",
      args => SimhashBands(args.head, args(1), args(2), args(3)),
      "built-in")
  }
}
