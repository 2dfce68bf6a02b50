package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Plan-friendly literals for driver-resident MODEL arrays (r17).
  *
  * The ANN family (q7G/q7S/q7C/q7H + the S15 stream) embeds its models —
  * IVF centroids (K·64 doubles), PQ codebooks (m·ks·sub), SimHash planes
  * (bands·bits·64) — as `typedLit` array literals. A plain `Literal`
  * holding a nested `GenericArrayData` of BOXED doubles is poison for
  * the driver and the task path at every step that touches the plan,
  * none of which is row evaluation (jstack-sampled during r17's q7S
  * warm-loop, ~12 single-task jobs per query):
  *  - `toString` renders every element — and AQE re-stringifies the
  *    WHOLE plan once per stage materialization for the execution-update
  *    listener event (the FloatingDecimal.toJavaFormatString samples);
  *  - Java task (de)serialization walks the boxed element tree per
  *    stage (the DefaultSerializationProxy samples);
  *  - hashCode/equals during optimizer canonicalization hash the deep
  *    value.
  *
  * [[ModelVecLit]]/[[ModelMatLit]] carry the SAME values as one
  * primitive `Array[Double]` (+ row width): serialization is a single
  * bulk array write, toString is one short line, equality is a
  * precomputed content hash (verified by `Arrays.equals` on hash match),
  * and eval returns a lazily-built `ArrayData` whose element values —
  * and declared `dataType`, nullability included — are exactly what the
  * replaced `typedLit` produced (KernelSpec pins both). Codegen installs
  * the ArrayData once per task via a mutable-state init, not per row.
  *
  * Column construction goes through the function registry (the repo's
  * kernel convention — no private[sql] access): [[vec]]/[[mat]] park the
  * expression in a content-addressed store and emit
  * `graft_model_lit('<key>')`, which the registered builder resolves
  * back to the stored leaf at analysis. The store is global and
  * content-addressed: bounded by the distinct models a JVM ever builds
  * (each entry is the model's primitive footprint), shared across
  * sessions, never stale (a key IS its content).
  */
object ModelLit {

  private val store =
    scala.collection.concurrent.TrieMap.empty[String, Expression]

  /** FNV-1a over the raw bits — cheap, stable, content-addressed. */
  private def hashOf(flat: Array[Double], cols: Int): Long = {
    var h = 0xcbf29ce484222325L ^ cols
    var i = 0
    while (i < flat.length) {
      var bits = java.lang.Double.doubleToLongBits(flat(i))
      var b = 0
      while (b < 8) {
        h = (h ^ (bits & 0xffL)) * 0x100000001b3L
        bits >>>= 8
        b += 1
      }
      i += 1
    }
    h
  }

  private def column(key: String, e: Expression): Column = {
    store.putIfAbsent(key, e)
    call_function("graft_model_lit", lit(key))
  }

  /** 1-level model literal: `array<double>` (containsNull = false, the
    * `typedLit(Seq[Double])` shape).
    */
  def vec(tag: String, flat: Array[Double]): Column = {
    val h = hashOf(flat, 1)
    column(s"$tag:v${flat.length}:${java.lang.Long.toHexString(h)}",
      ModelVecLit(flat, h, tag))
  }

  /** 2-level rectangular model literal:
    * `array<array<double>>` (inner containsNull = false, outer = true —
    * the `typedLit(Seq[Seq[Double]])` shape). Rows must share a width.
    */
  def mat(tag: String, rows: Seq[Seq[Double]]): Column = {
    require(rows.nonEmpty, s"ModelLit.mat($tag): empty model")
    val cols = rows.head.size
    require(rows.forall(_.size == cols),
      s"ModelLit.mat($tag): ragged rows (expected width $cols)")
    val flat = new Array[Double](rows.size * cols)
    var i = 0
    rows.foreach { r =>
      r.foreach { x => flat(i) = x; i += 1 }
    }
    val h = hashOf(flat, cols)
    column(s"$tag:m${rows.size}x$cols:${java.lang.Long.toHexString(h)}",
      ModelMatLit(flat, cols, h, tag))
  }

  /** The analysis-time resolver — shared by the per-session
    * registration and the cluster-wide [[graft.GraftExtensions]]
    * injection (the completeness pin walks the extension list).
    */
  private[graft] val builder: Seq[Expression] => Expression =
    args => args.head match {
      case Literal(u: UTF8String, StringType) =>
        val key = u.toString
        store.getOrElse(key, throw new IllegalStateException(
          s"graft_model_lit: unknown key '$key' — keys are minted " +
            "driver-side by ModelLit.vec/mat, not user-supplied"))
      case other => throw new IllegalArgumentException(
        s"graft_model_lit expects a string literal key, got $other")
    }

  /** Idempotently registers `graft_model_lit(key)`; called from the
    * consuming kernels' own `register` (IvfTop/PqKernels/SimhashBands),
    * so any session that can analyze a model-bearing expression can
    * resolve its literals too.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_model_lit", builder, "built-in")
}

/** Shared leaf behavior for the two model-literal shapes. */
sealed trait ModelLitExpr extends LeafExpression {
  def tag: String
  def contentHash: Long
  /** The catalyst value — built lazily ONCE per JVM-side instance. */
  def arrayData(): ArrayData

  override def nullable: Boolean = false
  // NOT foldable: ConstantFolding would rewrite the leaf back into a
  // plain boxed Literal, undoing the representation. Nothing downstream
  // needs to fold it (every consumer pairs it with a per-row column).
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = arrayData()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftModelLit", this, getClass.getName)
    val term = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.util.ArrayData", "graftModelVal",
      v => s"$v = $ref.arrayData();")
    ExprCode.forNonNullValue(JavaCode.global(term, dataType))
  }
}

/** `array<double>` model literal — see [[ModelLit]]. */
case class ModelVecLit(flat: Array[Double], contentHash: Long, tag: String)
    extends ModelLitExpr {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val value: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(flat)

  override def arrayData(): ArrayData = value

  override def toString: String =
    s"graft_model_lit($tag: ${flat.length} doubles, " +
      s"h=${java.lang.Long.toHexString(contentHash)})"

  override def hashCode: Int = (contentHash ^ (contentHash >>> 32)).toInt

  override def equals(o: Any): Boolean = o match {
    case m: ModelVecLit =>
      contentHash == m.contentHash && java.util.Arrays.equals(flat, m.flat)
    case _ => false
  }
}

/** Rectangular `array<array<double>>` model literal — see [[ModelLit]]. */
case class ModelMatLit(flat: Array[Double], cols: Int, contentHash: Long,
    tag: String) extends ModelLitExpr {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = true)

  @transient private lazy val value: ArrayData = {
    val n = flat.length / math.max(cols, 1)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOfRange(flat, i * cols, (i + 1) * cols))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def arrayData(): ArrayData = value

  override def toString: String =
    s"graft_model_lit($tag: ${flat.length / math.max(cols, 1)}x$cols doubles, " +
      s"h=${java.lang.Long.toHexString(contentHash)})"

  override def hashCode: Int =
    (contentHash ^ (contentHash >>> 32)).toInt ^ cols

  override def equals(o: Any): Boolean = o match {
    case m: ModelMatLit =>
      cols == m.cols && contentHash == m.contentHash &&
        java.util.Arrays.equals(flat, m.flat)
    case _ => false
  }
}
