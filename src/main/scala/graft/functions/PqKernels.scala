package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (q7S): the vector-compression half of
  * the IVF-PQ ANN path (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public literature).
  *
  * A dim-`d` embedding splits into `M` contiguous subvectors of `d/M`
  * dims; each subspace carries its own `ks`-codeword codebook, and a
  * vector's compressed form is the `M` codeword indices — `M` small
  * ints instead of `d` floats, the 100 TB index-size story. Both
  * kernels take the codebooks as ONE flattened driver-resident literal
  * (codeword `j` of subspace `m` lives at index `m·ks + j`), the same
  * MLlib-KMeans model shape as the IVF centroids, and both keep their
  * `M·ks`/`M` loops inside whole-stage codegen for the same reason
  * `graft_ivf_top` exists: a HOF spelling is CodegenFallback and an
  * unrolled spelling blows up plan size with the data-driven `ks`.
  */
object PqKernels {
  /** Idempotent session registration (Verify/Bench/tests build their
    * own sessions), same defensive pattern as the sibling kernels.
    */
  def register(spark: SparkSession): Unit = {
    ModelLit.register(spark) // codebook args arrive as model-lit leaves (r17)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_enc",
      args => PqEncode(args.head, args(1), args(2), args(3)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_adc",
      args => PqAdc(args.head, args(1), args(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sub",
      args => VecSub(args.head, args(1)),
      "built-in")
  }
}

/** `graft_vec_sub(a, b)` — element-wise double-array difference over the
  * common prefix (the [[DotProduct]] length convention). Exists because
  * q7S's residual encoding (`e − coarse centroid`, the IVF-ADC scheme)
  * runs once per CORPUS row at index-build time, and the `zip_with`
  * spelling is a CodegenFallback higher-order function — the exact
  * per-row interpreted cost `graft_ivf_top` was built to avoid.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_vec_sub"

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) - $b.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_pq_enc(e, codebooks, cnsqs, ks)` — PQ encoding: for each of
  * the `M = codebooks.length / ks` subspaces, the index of the codeword
  * nearest (squared-L2) to the vector's subslice, ties toward the
  * smaller index. Nearest-by-L2 is spelled `argmax(dot − ‖c‖²/2)`
  * (‖x‖² is constant per subspace, so it cannot change the argmax) —
  * `cnsqs` carries the precomputed ‖c‖² so encoding is pure
  * multiply-adds. Returns the `M` codeword indices as `array<int>`.
  *
  * Scores compare via `Double.compare`, the sibling-kernel total-order
  * rule: a NaN score (impossible for finite codebooks, but the kernel
  * must not be the thing that assumes it) ranks LARGEST
  * deterministically instead of poisoning `>` comparisons.
  */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType),
    ArrayType(ArrayType(DoubleType)), ArrayType(DoubleType), IntegerType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_enc"

  override def nullSafeEval(eAny: Any, cbAny: Any,
      cnsqAny: Any, ksAny: Any): Any = {
    val e = eAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val cnsq = cnsqAny.asInstanceOf[ArrayData]
    // this is cluster-injected SQL surface: clamp degenerate ks into
    // [1, |cb|] (the IvfTop p = min(p, k) convention) and return an
    // empty code array for an empty codebook, never a raw
    // ArithmeticException out of a query
    if (cb.numElements() == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])
    val ks = math.min(math.max(ksAny.asInstanceOf[Int], 1), cb.numElements())
    val mCount = cb.numElements() / ks
    val sub = e.numElements() / mCount
    val codes = new Array[Int](mCount)
    var m = 0
    while (m < mCount) {
      var best = java.lang.Double.NEGATIVE_INFINITY
      var bestJ = 0
      var j = 0
      while (j < ks) {
        val c = cb.getArray(m * ks + j)
        val dim = math.min(sub, c.numElements())
        var dot = 0.0
        var t = 0
        while (t < dim) { dot += e.getDouble(m * sub + t) * c.getDouble(t); t += 1 }
        val score = dot - 0.5 * cnsq.getDouble(m * ks + j)
        if (java.lang.Double.compare(score, best) > 0) { best = score; bestJ = j }
        j += 1
      }
      codes(m) = bestJ
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cb, cnsq, ksIn) => {
      val ks = ctx.freshName("ks")
      val mCount = ctx.freshName("mCount")
      val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val dim = ctx.freshName("dim")
      val dot = ctx.freshName("dot")
      val t = ctx.freshName("t")
      val score = ctx.freshName("score")
      s"""
         |final int $ks = java.lang.Math.min(
         |  java.lang.Math.max($ksIn, 1),
         |  java.lang.Math.max($cb.numElements(), 1));
         |final int $mCount = $cb.numElements() / $ks;
         |final int $sub = $mCount == 0 ? 0 : $e.numElements() / $mCount;
         |final int[] $codes = new int[$mCount];
         |for (int $m = 0; $m < $mCount; $m++) {
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $ks; $j++) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $c =
         |      $cb.getArray($m * $ks + $j);
         |    final int $dim = java.lang.Math.min($sub, $c.numElements());
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $dim; $t++) {
         |      $dot += $e.getDouble($m * $sub + $t) * $c.getDouble($t);
         |    }
         |    final double $score = $dot - 0.5 * $cnsq.getDouble($m * $ks + $j);
         |    if (java.lang.Double.compare($score, $best) > 0) {
         |      $best = $score; $bestJ = $j;
         |    }
         |  }
         |  $codes[$m] = $bestJ;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_pq_adc(qe, codes, codebooks)` — asymmetric distance
  * computation: the approximate inner product `Σ_m dot(qe_m,
  * codebook[m·ks + codes_m])` between an UNquantized query and a
  * PQ-compressed candidate (`M = codes.length`, `ks` derived from the
  * codebook literal). The caller divides by the exact stored norms to
  * get an approximate cosine — PQ approximates only the numerator.
  *
  * Per-candidate cost is `d` multiply-adds (the subslice dots walk the
  * full query once); the 100 TB win of this kernel is the INDEX side —
  * candidates arrive as `M` ints instead of `d` floats, so the
  * cell-join shuffles and scans a fraction of the bytes. The classic
  * per-query 256-entry lookup-table trick is the next CPU notch and
  * changes nothing about plan shape.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType),
    ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(qeAny: Any, codesAny: Any, cbAny: Any): Any = {
    val qe = qeAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val mCount = codes.numElements()
    // cluster-injected SQL surface: an empty code array or codebook is
    // a zero-term sum, not an ArithmeticException
    if (mCount == 0 || cb.numElements() == 0) return 0.0
    val ks = cb.numElements() / mCount
    val sub = qe.numElements() / mCount
    var adc = 0.0
    var m = 0
    while (m < mCount) {
      val c = cb.getArray(m * ks + codes.getInt(m))
      val dim = math.min(sub, c.numElements())
      var t = 0
      while (t < dim) { adc += qe.getDouble(m * sub + t) * c.getDouble(t); t += 1 }
      m += 1
    }
    adc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qe, codes, cb) => {
      val mCount = ctx.freshName("mCount")
      val ks = ctx.freshName("ks")
      val sub = ctx.freshName("sub")
      val adc = ctx.freshName("adc")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val dim = ctx.freshName("dim")
      val t = ctx.freshName("t")
      s"""
         |final int $mCount = $codes.numElements();
         |final int $ks = $mCount == 0 ? 0 : $cb.numElements() / $mCount;
         |final int $sub = $mCount == 0 ? 0 : $qe.numElements() / $mCount;
         |double $adc = 0.0;
         |for (int $m = 0; $m < $mCount && $cb.numElements() > 0; $m++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $c =
         |    $cb.getArray($m * $ks + $codes.getInt($m));
         |  final int $dim = java.lang.Math.min($sub, $c.numElements());
         |  for (int $t = 0; $t < $dim; $t++) {
         |    $adc += $qe.getDouble($m * $sub + $t) * $c.getDouble($t);
         |  }
         |}
         |${ev.value} = $adc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
