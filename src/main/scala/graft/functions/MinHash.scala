package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

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

  /** Idempotently registers `graft_minhash(shingle)` as a UDAF. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_minhash", functions.udaf(Agg))
}
