package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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

  override def prettyName: String = "graft_isect"

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

object SortedIntersect {
  /** Idempotently registers `graft_isect(a, b)` (same defensive pattern
    * as [[DotProduct.register]] — Verify/Bench build their own sessions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_isect", args => SortedIntersect(args.head, args(1)), "built-in")
}
