package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature builder — the 100 TB near-dedup scale path (q7A).
  *
  * A true distributive aggregate over a document's exploded shingles:
  * `groupBy(doc_id).agg(graft_minhash(shingle))`. The buffer is the running
  * elementwise minimum of K per-shingle hashes, so map-side partial
  * aggregation collapses each document to one 64-long signature per
  * partition BEFORE the shuffle — the exchange carries signatures, not
  * shingles. Banding the signature (LSH) then turns near-dup search into an
  * equi-join on (band, band_hash) buckets: candidates only, never the
  * O(n²) all-pairs comparison.
  *
  * K hash functions come from one string hash via the standard
  * double-hashing construction h_i = a + i·b (Kirsch–Mitzenmacher): two
  * FNV-1a-64+mix hashes per shingle, K wrapping adds. All constants are
  * fixed → signatures are deterministic run-to-run (hash-seed-specific, so
  * no cross-engine SQL oracle — property-tested against exact Jaccard
  * instead, SURVEY.md §2.10/§5.3).
  */
object MinHash {

  /** Number of hash functions / signature length. */
  val K = 64

  /** splitmix64 finalizer — avalanches the raw FNV accumulator. */
  private def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    z
  }

  /** FNV-1a over UTF-16 chars, seeded, then mixed. */
  private def hash64(s: String, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** The K per-shingle hash values h_i = a + i·b (wrapping). */
  private[graft] def shingleHashes(s: String): Array[Long] = {
    val a = hash64(s, 0x5eed0001L)
    val b = hash64(s, 0x5eed0002L) | 1L // odd → i·b cycles all residues
    val out = new Array[Long](K)
    var i = 0
    while (i < K) { out(i) = a + i * b; i += 1 }
    out
  }

  /** Exact MinHash signature of a shingle set (test reference + property
    * checks); the Aggregator computes the same thing incrementally.
    */
  private[graft] def signature(shingles: Iterable[String]): Array[Long] = {
    val sig = Array.fill(K)(Long.MaxValue)
    shingles.foreach { s =>
      val h = shingleHashes(s)
      var i = 0
      while (i < K) { if (h(i) < sig(i)) sig(i) = h(i); i += 1 }
    }
    sig
  }

  /** IN = one shingle row, BUF = running minima, OUT = the signature. */
  object Agg extends Aggregator[String, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

    override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
      val h = shingleHashes(shingle)
      var i = 0
      while (i < K) { if (h(i) < buf(i)) buf(i) = h(i); i += 1 }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < K) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    // native unsafe-array serialization — measurably cheaper than kryo
    // for the per-partial-state shuffle
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** In-row signature over an already-assembled shingle array — the q7A
    * hot path ([[MinHashSig]]'s eval body, and its codegen target via the
    * object's static forwarder). Identical values to [[signature]] /
    * [[Agg]]: same double-hash construction, the i·b multiply replaced by
    * an incremental add. One pass, no per-shingle K-array allocation.
    * Null elements are skipped (shingling already filters them, but the
    * expression must not NPE on arbitrary input).
    */
  def sigFromArrayData(arr: ArrayData): ArrayData = {
    val sig = Array.fill(K)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j).toString
        val a = hash64(s, 0x5eed0001L)
        val b = hash64(s, 0x5eed0002L) | 1L
        var h = a
        var i = 0
        while (i < K) { if (h < sig(i)) sig(i) = h; i += 1; h += b }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Idempotently registers `graft_minhash(shingle)` (the distributive
    * UDAF — the multi-row/streaming path) and `graft_minhash_row(shingles)`
    * (the in-row expression — the batch hot path over per-doc shingle
    * arrays; no explode inflation, no aggregation shuffle).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_minhash", functions.udaf(Agg))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_row", args => MinHashSig(args.head), "built-in")
  }
}

/** Codegen'd in-row MinHash: `array<string>` shingles → the K-long
  * signature, without exploding the array into rows. q7A's round-2 shape
  * (explode → UDAF) paid for |shingles| row inflation plus an aggregation
  * exchange just to rebuild per-doc state the row already had; since a
  * document's shingles are one array in one row, the signature is a plain
  * per-row function — zero shuffle. The loop body lives in
  * [[MinHash.sigFromArrayData]] (shared with the interpreted path), called
  * from inside the whole-stage-codegen'd stage via the object's static
  * forwarder, so the per-row cost is one JIT-compiled call.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_row"

  override def nullSafeEval(a: Any): Any =
    MinHash.sigFromArrayData(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash.sigFromArrayData($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
