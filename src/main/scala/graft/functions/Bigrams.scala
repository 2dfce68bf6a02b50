package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct consecutive char-bigram set of a text column — q7F / S14's
  * language-ID feature extraction as ONE byte-level pass.
  *
  * The SQL spelling this replaces ([[graft.operators.LlmOps.BigramSql]]'s
  * pre-round-13 body) was already linear —
  * `array_distinct(filter(zip_with(split(text,''), slice(split(text,''),…),
  * concat), len=2))` — but linear across FIVE collection expressions: the
  * char split materializes one single-char UTF8String per character
  * (twice: split is evaluated under both zip_with branches before
  * common-subexpression reuse), zip_with re-boxes each pair through a
  * lambda, concat allocates each candidate bigram, and array_distinct
  * builds a per-row hash table over the result. Measured at sf0.1 the
  * extraction alone was ~0.7 s of q7F's ~2.2 s steady-state wall.
  *
  * This kernel walks the UTF-8 bytes once: each bigram is a zero-copy
  * `UTF8String` window onto one shared byte array (offset + combined
  * code-point byte length), deduped through one small insertion-ordered
  * hash set. Same value set and order as the old expression — consecutive
  * CODE-POINT pairs (Spark's `split(text, '')` yields code points, as
  * does this walk), distinct by first occurrence — pinned by KernelSpec
  * parity against the old SQL body, unicode cases included.
  */
object Bigrams {

  /** Distinct code-point bigrams, first-occurrence order. Static forwarder
    * target for the codegen'd call (the [[MinHashSig]] convention).
    */
  def distinct(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one defensive copy; all windows share it
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    var l1 = UTF8String.numBytesForFirstByte(bytes(0))
    var ok = true
    while (ok && i + l1 < n) {
      val l2 = UTF8String.numBytesForFirstByte(bytes(i + l1))
      // a truncated tail char whose declared length runs past the buffer
      // yields no bigram (the old split/zip_with spelling tolerated such
      // input) — never a window whose hashCode/getBytes would read past
      // the array (ADVICE r13)
      if (i + l1 + l2 > n) ok = false
      else {
        seen.add(UTF8String.fromBytes(bytes, i, l1 + l2))
        i += l1
        l1 = l2
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Idempotently registers `graft_bigrams(text)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigrams", args => BigramSet(args.head), "built-in")
}

/** `graft_bigrams(text)` — see [[Bigrams]]. */
case class BigramSet(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bigrams"

  override def nullSafeEval(a: Any): Any =
    Bigrams.distinct(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bigrams.distinct($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
