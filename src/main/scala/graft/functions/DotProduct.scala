package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The similarity family (q76/q77/q78) previously used
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)`:
  * Spark higher-order functions evaluate their lambda once per array element
  * through the interpreted expression evaluator, outside whole-stage codegen
  * — measured >3× slower than a fused loop, and it failed to parallelize
  * (BENCH_r01). This expression emits a plain Java loop inside the
  * whole-stage-codegen'd stage instead.
  *
  * The summation order (ascending index, sequential adds) is IDENTICAL to
  * the HOF fold it replaces, so results are bit-exact with round 1's
  * oracle-passing hashes.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType (the declared upper bound) is private[sql]; the
  // inferred Seq[ArrayType] conforms via covariance.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Idempotently registers `graft_dot(a, b)` on the session's function
    * registry so query builders can use it via `expr(...)` — the driver's
    * Verify/Bench build their own sessions, so registration happens at
    * query-build time (same defensive pattern as the nanos conf in Tables).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", args => DotProduct(args.head, args(1)), "built-in")
}
