package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token counting IN-ROW — `graft_token_counts(toks)`
  * returns the distinct tokens of one document with their counts,
  * `array<struct<w string, c int>>`, first-occurrence order.
  *
  * This is the r16 scale rewrite of the `(doc, token)` two-level
  * aggregation shape (q7O / q7V / the composed pipeline's quality
  * calibration): `explode → groupBy(doc_id, w) → count` shuffles one
  * row per distinct (doc, token) — a corpus-scale exchange whose row
  * count tracks token volume. But within-document counts need no
  * cross-row data at all: the document's token array IS one row, so
  * one in-row hash-map pass produces the same (w, c) pairs with ZERO
  * exchange — `explode(graft_token_counts(toks))` replaces the
  * explode+aggregate, and the only remaining corpus-scale shuffle in a
  * consumer like the CE model is the irreducible global-vocabulary
  * aggregation. Same per-task memory class as the shingle-set in-row
  * ops: the transient map is bounded by one document's distinct tokens.
  *
  * Null array elements are SKIPPED (split()-derived inputs have none;
  * the old explode+groupBy spelling would have counted a null key —
  * callers feeding non-split input should filter nulls first).
  * KernelSpec pins value parity against the explode+groupBy spelling.
  */
object TokenCounts {

  private val Schema = StructType(Seq(
    StructField("w", StringType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  /** Static forwarder target for the codegen'd call (the [[MinHashSig]]
    * convention).
    */
  def counts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Int]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        m.put(w, m.getOrDefault(w, 0) + 1)
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue)): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Idempotently registers `graft_token_counts(toks)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_counts", args => TokenCountsExpr(args.head), "built-in")

  val dataType: DataType = ArrayType(Schema, containsNull = false)
}

/** `graft_token_counts(toks)` — see [[TokenCounts]]. */
case class TokenCountsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = TokenCounts.dataType

  override def prettyName: String = "graft_token_counts"

  override def nullSafeEval(a: Any): Any =
    TokenCounts.counts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
