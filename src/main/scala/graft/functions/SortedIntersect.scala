package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Codegen'd intersection SIZE of two SORTED, DISTINCT, null-free
  * `array<string>` columns — a linear two-pointer merge walk.
  *
  * q7N's verify stage previously used `size(array_intersect(ga, gb))`:
  * `array_intersect` is a CodegenFallback expression that builds a hash
  * set of one side per ROW (allocation + string hashing for every
  * element, interpreted) — measured as the dominant cost of the whole
  * query once candidates are generated (~6.4 s of a ~9 s isolated q7N at
  * sf0.1; see the jaccardPairs comments). This expression does one
  * O(|a|+|b|) walk of binary string compares inside whole-stage codegen,
  * no per-row allocation.
  *
  * PRECONDITION: both arrays are sorted ascending in UTF8 binary order
  * (Spark's `array_sort` order for StringType), duplicate-free, and
  * null-free — exactly what [[graft.operators.LlmOps.shingled]] produces.
  * On unsorted input the walk undercounts; this is an internal kernel,
  * not a general function.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType (the declared upper bound) is private[sql]; the
  // inferred Seq[ArrayType] conforms via covariance.
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_isect_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Threshold-aware variant of [[SortedIntersect]]: returns |a ∩ b| when
  * the pair's Jaccard similarity |a∩b| / |a∪b| is ≥ num/den, and -1
  * otherwise — ABANDONING the merge walk as soon as the remaining
  * elements can no longer reach the required overlap.
  *
  * Why: in a prefix-filtered similarity join (q7N) most candidates FAIL
  * the threshold, and the full walk wastes |a|+|b| string compares
  * proving it. With c matches at positions (i, j), the final count is
  * bounded by c + min(|a|−i, |b|−j); once that bound drops below
  * α = ⌈num·(|a|+|b|) / (num+den)⌉ the pair cannot pass, because
  * c/(|a|+|b|−c) ≥ num/den  ⟺  c·(num+den) ≥ num·(|a|+|b|)  ⟺  c ≥ α.
  * Survivors complete the walk, so a non-negative result is the EXACT
  * intersection size — bit-identical to [[SortedIntersect]] — and the
  * caller keeps computing |a ∪ b| and the similarity from it.
  *
  * Same PRECONDITION as [[SortedIntersect]] (sorted-ascending, distinct,
  * null-free arrays — the registered name carries the hazard). `num` and
  * `den` are positive int expressions, in practice literals.
  */
case class SortedIntersectGe(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType), IntegerType, IntegerType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_isect_ge_sorted"

  override def nullSafeEval(a: Any, b: Any, numV: Any, denV: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val num = numV.asInstanceOf[Int]
    val den = denV.asInstanceOf[Int]
    val n = x.numElements()
    val m = y.numElements()
    // ceil(num·(n+m) / (num+den)) in long arithmetic — n and m widen
    // BEFORE the sum (n+m can exceed Int.MaxValue); num/den are small
    val alpha = (num.toLong * (n.toLong + m) + num + den - 1) / (num + den)
    var i = 0
    var j = 0
    var c = 0
    var res = -1
    var done = false
    while (!done && i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
      // same widening as alpha: c + remaining can pass Int.MaxValue in
      // exactly the huge-array regime alpha was widened for
      if (c.toLong + math.min(n - i, m - j) < alpha) done = true
    }
    if (!done && c >= alpha) res = c
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, num, den) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val alpha = ctx.freshName("alpha")
      val rest = ctx.freshName("rest")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final long $alpha =
         |  ((long) $num * ((long) $n + $m) + $num + $den - 1) / ($num + $den);
         |int $i = 0, $j = 0, $c = 0;
         |${ev.value} = -1;
         |while ($i < $n && $j < $m) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |  final int $rest = $n - $i < $m - $j ? $n - $i : $m - $j;
         |  if ((long) $c + $rest < $alpha) { $c = -1; break; }
         |}
         |if ($c >= $alpha) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object SortedIntersect {

  /** JVM twin of [[SortedIntersectGe]] over SORTED, DISTINCT Long
    * arrays — the S13 in-stream verify kernel, where the shingle sets
    * live in flatMapGroupsWithState state as 64-bit hashes (8 bytes per
    * shingle instead of a UTF8 string) rather than in a Column. Same
    * threshold algebra, same early exit, same exact-count-on-pass
    * contract; kept next to the Expression so the α derivation lives in
    * ONE file.
    */
  def isectGeSortedLongs(a: Array[Long], b: Array[Long],
      num: Int, den: Int): Int = {
    val n = a.length
    val m = b.length
    val alpha = (num.toLong * (n.toLong + m) + num + den - 1) / (num + den)
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
      if (c.toLong + math.min(n - i, m - j) < alpha) return -1
    }
    if (c >= alpha) c else -1
  }
  /** Idempotently registers the two verify kernels (same defensive
    * pattern as [[DotProduct.register]] — Verify/Bench build their own
    * sessions). The `_sorted` suffix in the REGISTERED names carries the
    * precondition hazard for ad-hoc SQL callers: on unsorted or
    * non-distinct input the walk undercounts with no error (ADVICE r7 —
    * a defensive in-kernel sortedness check would double the compare
    * count of the measured hot path, so the contract lives in the name).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_isect_sorted", args => SortedIntersect(args.head, args(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_isect_ge_sorted",
      args => SortedIntersectGe(args.head, args(1), args(2), args(3)),
      "built-in")
  }
}
