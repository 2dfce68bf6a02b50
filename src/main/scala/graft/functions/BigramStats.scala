package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word-bigram statistics IN-ROW — `graft_bigram_stats(toks)`
  * returns `struct<nbg int, dbg int>`: the number of adjacent bigrams
  * and the number of DISTINCT ones, the two inputs of q7O's (and the
  * composed pipeline's) Gopher duplicate-bigram fraction
  * `(nbg − dbg) · 10000 div nbg`.
  *
  * Replaces the five-collection-expression HOF spelling
  * `size(filter(zip_with(toks, slice(toks, 2, …), (a, b) →
  * concat(a, ' ', b)), x → x IS NOT NULL))` (+ `array_distinct` for
  * dbg): higher-order functions are CodegenFallback — interpreted, one
  * closure call per element — and the spelling materializes the full
  * bigram array plus array_distinct's per-row hash table just to take
  * two sizes. One pass here, same values BY CONSTRUCTION for every
  * input: a bigram exists where both neighbors are non-null (the old
  * concat-propagates-null + filter behavior), and distinctness is
  * judged on the exact `a + ' ' + b` string the old spelling built —
  * not on the (a, b) pair — so even pathological tokens containing the
  * separator count identically. KernelSpec pins the parity.
  */
object BigramStats {

  private val Space = UTF8String.fromString(" ")

  /** Static forwarder target for the codegen'd call. */
  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var nbg = 0
    val seen = new java.util.HashSet[UTF8String]
    var i = 0
    while (i + 1 < n) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        nbg += 1
        seen.add(UTF8String.concat(
          arr.getUTF8String(i), Space, arr.getUTF8String(i + 1)))
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nbg, seen.size))
  }

  /** Idempotently registers `graft_bigram_stats(toks)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigram_stats", args => BigramStatsExpr(args.head), "built-in")

  val dataType: DataType = StructType(Seq(
    StructField("nbg", IntegerType, nullable = false),
    StructField("dbg", IntegerType, nullable = false)))
}

/** `graft_bigram_stats(toks)` — see [[BigramStats]]. */
case class BigramStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = BigramStats.dataType

  override def prettyName: String = "graft_bigram_stats"

  override def nullSafeEval(a: Any): Any =
    BigramStats.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
