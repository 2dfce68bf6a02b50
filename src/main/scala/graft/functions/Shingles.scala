package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sorted distinct word-3-shingle set of a split-words column —
  * the q7A/q7N/q7P/q7W/q7X (and S12 streaming) shingle unit as ONE pass.
  *
  * The SQL spelling this replaces ([[graft.operators.LlmOps.ShingleSqlRef]])
  * was linear but ran through FOUR interpreted collection expressions —
  * two nested `zip_with` lambdas (closure per element), a `filter`, an
  * `array_distinct` hash table and an `array_sort` — for every document
  * on the hottest path in the repo (the shared shingle table feeds five
  * registry operators and the streaming near-dup stage). Measured at
  * sf0.1 (r17 probe): the shingled() build was 0.57 s steady-state, the
  * single largest component of q7A's wall.
  *
  * This kernel walks the words array once: each shingle is one
  * `UTF8String.concat(w(i), ' ', w(i+1), ' ', w(i+2))` — byte-identical
  * to the old nested `concat(concat(a, ' ', b), ' ', c)` — deduped and
  * ordered through a `TreeSet[UTF8String]` whose `compareTo` is the SAME
  * binary order `array_sort` applies to StringType. Same value set, same
  * order; pinned by KernelSpec parity against the old SQL body.
  */
object Shingles {

  private val Space = UTF8String.fromString(" ")

  /** Sorted distinct word-3-shingles. Static forwarder target for the
    * codegen'd call (the [[MinHashSig]] convention).
    */
  def sortedDistinct(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.TreeSet[UTF8String]
    var i = 0
    while (i + 2 < n) {
      val a = words.getUTF8String(i)
      val b = words.getUTF8String(i + 1)
      val c = words.getUTF8String(i + 2)
      // a null word nulled the old chain's concat and the filter dropped
      // it — skip the window, never emit a null shingle
      if (a != null && b != null && c != null)
        seen.add(UTF8String.concat(a, Space, b, Space, c))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Idempotently registers `graft_shingles(w)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", args => ShingleSet(args.head), "built-in")
}

/** `graft_shingles(w)` — see [[Shingles]]. */
case class ShingleSet(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    Shingles.sortedDistinct(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.sortedDistinct($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
