package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint of a split-words column —
  * `graft_winnow_fp(w)` returns `struct<n_grams int, fp array<bigint>>`:
  * the word-4-gram count and the MOSS-style window-8 minimum-hash
  * selection, exactly the q7E chain
  * ([[graft.operators.LlmOps.WinnowSqlRef]]) as ONE codegen'd pass.
  *
  * The SQL spelling this replaces ran SIX interpreted collection
  * expressions per document — three nested `zip_with` lambdas, a
  * `filter`, a `transform(xxhash64)`, and a
  * `transform(sequence, slice + array_min)` whose slice ALLOCATES an
  * 8-element array per window — all in whole-stage codegen's
  * CodegenFallback blind spot. This kernel walks the words array once:
  * each 4-gram is one `UTF8String.concat(a,' ',b,' ',c,' ',e)` —
  * byte-identical to the old nested concat chain — hashed with the
  * SAME xxhash64 (seed 42) the SQL function applies, then the window-8
  * minimum runs over the primitive hash array with zero allocation and
  * the distinct keeps first-occurrence order exactly like
  * `array_distinct`.
  *
  * Semantics parity, pinned by KernelSpec:
  *  - gram i exists iff `i+3 < n` and all four words are non-null (a
  *    null word nulled the old concat and the filter dropped it);
  *  - windows = max(n_grams − 7, 1); a short doc (1 ≤ n_grams ≤ 8)
  *    gets one clipped window; an EMPTY gram list yields `fp = [null]`
  *    (the old `array_min(slice(hashes, 1, 8))` over an empty array is
  *    NULL, and the sequence still emits index 1);
  *  - `fp` is `array_distinct` of the per-window minima in window
  *    order.
  */
object WinnowFp {

  private val Space = UTF8String.fromString(" ")

  val dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("fp", ArrayType(LongType, containsNull = true),
      nullable = false)))

  /** Static forwarder target for the codegen'd call (the MinHashSig
    * convention).
    */
  def fingerprint(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val hb = new Array[Long](math.max(n - 3, 0))
    var m = 0
    var i = 0
    while (i + 3 < n) {
      val a = words.getUTF8String(i)
      val b = words.getUTF8String(i + 1)
      val c = words.getUTF8String(i + 2)
      val e = words.getUTF8String(i + 3)
      if (a != null && b != null && c != null && e != null) {
        val g = UTF8String.concat(a, Space, b, Space, c, Space, e)
        hb(m) = XxHash64Function.hash(g, StringType, 42L)
        m += 1
      }
      i += 1
    }
    if (m == 0)
      return new GenericInternalRow(Array[Any](0,
        new GenericArrayData(Array[Any](null))))
    val windows = math.max(m - 7, 1)
    // distinct in first-occurrence window order, like array_distinct
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var s = 0
    while (s < windows) {
      var mn = hb(s)
      var j = s + 1
      val end = math.min(s + 8, m)
      while (j < end) { if (hb(j) < mn) mn = hb(j); j += 1 }
      seen.add(mn)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericInternalRow(Array[Any](m, new GenericArrayData(out)))
  }

  /** Idempotently registers `graft_winnow_fp(w)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_fp", args => WinnowFpExpr(args.head), "built-in")
}

/** `graft_winnow_fp(w)` — see [[WinnowFp]]. */
case class WinnowFpExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = WinnowFp.dataType

  override def prettyName: String = "graft_winnow_fp"

  override def nullSafeEval(a: Any): Any =
    WinnowFp.fingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFp.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
