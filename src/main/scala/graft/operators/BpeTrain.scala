package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full BPE tokenizer TRAINING (q7T) — the iterative loop whose single
  * step q7Q exposes. The published trick that makes BPE trainable at
  * corpus scale is the shape both share: collapse the corpus to a
  * `(word, count)` table FIRST, so every merge step runs over DISTINCT
  * words weighted by count — a table bounded by vocabulary, never by
  * corpus volume. 100 TB of text and 100 GB of text train at the same
  * per-step cost once the word table is built.
  *
  * Each step is two Spark jobs over the vocab-bounded table: (1) count
  * adjacent symbol pairs (in-row zip_with shift, map-side partial agg,
  * top-1 via `TakeOrderedAndProject`'s 1-row collect — the merge
  * decision is metadata, like an IVF centroid) and (2) apply the merge
  * in-row via a greedy left-to-right fold. The words frame is persisted
  * per step with a `createDataFrame(rdd, schema)` lineage cut — the q7R
  * loop's pattern, without it the analyzer walks an N-deep expression
  * tree by the last merge.
  *
  * Determinism: ties break (count desc, left asc, right asc); symbols
  * from the fixture corpus are ASCII, where Spark's UTF8 binary order
  * and the spec reference's Java string order agree (the q60 sort-key
  * caveat documented in SURVEY §7.4).
  *
  * A word's identity (the concatenation of its symbols) never changes,
  * so rows stay distinct across steps and no re-grouping is ever
  * needed; a merged pair can never span two words.
  */
object BpeTrain {

  /** Merges the q7T registry entry learns (enough to exercise multi-
    * character tokens on the fixture while staying bench-bounded).
    */
  val RegistryMerges = 15

  case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** The `(w: array<string> symbols, wc)` base table over `text`. */
  def baseWords(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(split(col("word"), "").as("w"), col("wc"))

  /** Adjacent symbol pairs of `w` as `(a, b)` structs (zip_with pads
    * the shifted side with null; the filter drops the padded tail).
    */
  private val PairsSql =
    """filter(zip_with(w, slice(w, 2, size(w)),
      |              (a, b) -> struct(a, b)),
      |       p -> p.b IS NOT NULL)""".stripMargin

  /** One greedy left-to-right merge application: every non-overlapping
    * `[left, right]` adjacency collapses to the fused token, leftmost
    * first (after a fuse the scan continues AFTER the fused token —
    * `aaa` under (a,a) becomes `[aa, a]`) — standard BPE apply
    * semantics, spelled as a fold so it stays one in-row expression.
    */
  private def applyMerge(w: Column, left: String, right: String): Column =
    aggregate(w, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Trains `nMerges` merges over a `(w, wc)` frame; stops early when
    * no adjacent pair remains. Returns the learned merge table — THE
    * tokenizer artifact, metadata-scale like every model this engine
    * trains (one row per merge).
    *
    * TWO paths, one semantics (r13): the `(word, count)` table is
    * vocabulary-bounded, and published BPE trainers exploit exactly
    * that split — corpus-scale work (word counting) runs distributed
    * ONCE, vocab-scale work (the merge loop) runs locally over the
    * collected table. So when the vocabulary fits
    * `spark.graft.bpe.localVocabLimit` (default 2,000,000 distinct
    * words; a LIMIT-probe count learns which side cheaply — the
    * ivfModel sample-budget pattern), the 2·nMerges vocab-bounded
    * Spark jobs of the distributed loop collapse to ONE collect plus a
    * driver loop — measured 3.52 → ~0.6 s on the sf0.1 bench entry,
    * where the cost was 30 rounds of job scheduling over a tiny table,
    * not data. Past the limit the distributed per-step loop below is
    * unchanged. BpeTrainSpec pins the two paths merge-for-merge equal
    * (tie cases included); ties compare in UTF-8 BYTE order on both
    * paths — the local comparator compares raw UTF-8 bytes rather than
    * Java's UTF-16 `compareTo`, because Spark's string ordering is
    * binary UTF-8 and the two disagree past the BMP.
    *
    * Driver-heap sizing when raising the limit: the collect holds one
    * boxed `Row` plus one (Array[String], Long) per distinct word —
    * with per-word symbol arrays that is ~(150 + ~40·symbols) B per
    * entry, so at typical ≤8-symbol words budget ≈ 500 B × limit of
    * headroom (default 2M ≈ 1 GB transient peak; size the conf to the
    * driver, not the corpus — the word table is vocabulary-bounded, so
    * corpus growth past the open-vocab knee barely moves it).
    */
  def train(s: SparkSession, words: DataFrame, nMerges: Int): Seq[Merge] = {
    val lim = s.conf.get("spark.graft.bpe.localVocabLimit", "2000000").toLong
    require(lim >= 0, s"spark.graft.bpe.localVocabLimit must be >= 0, got $lim")
    // probe limit clamped: a conf at/above Int.MaxValue must not wrap
    // the LIMIT negative (ADVICE r13) — past ~2³¹ words the distributed
    // loop is the only sane path anyway
    val probeLim = math.min(lim, Int.MaxValue - 1L).toInt + 1
    val small = lim > 0 && words.limit(probeLim).count() <= lim
    if (small) {
      val table = words.select(col("w"), col("wc")).collect()
        .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
      trainLocal(table, nMerges)
    } else trainDistributed(s, words, nMerges)
  }

  /** UTF-8 binary comparison — Spark's string order, NOT Java's UTF-16
    * `compareTo` (they disagree for supplementary-plane code points).
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** The driver-local merge loop over a collected word table — the
    * within-`localVocabLimit` fast path of [[train]]. Same greedy
    * left-to-right apply as [[applyMerge]]'s fold, same
    * (count desc, left, right) tie rule in the same UTF-8 byte order.
    */
  private[graft] def trainLocal(words: Array[(Array[String], Long)],
      nMerges: Int): Seq[Merge] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = words
    for (step <- 1 to nMerges) {
      val cnt = new java.util.HashMap[(String, String), Long]
      cur.foreach { case (w, wc) =>
        var i = 0
        while (i < w.length - 1) {
          cnt.merge((w(i), w(i + 1)), wc, (x, y) => x + y)
          i += 1
        }
      }
      if (cnt.isEmpty) return merges.toSeq
      var best: ((String, String), Long) = null
      cnt.forEach { (k, v) =>
        if (best == null || v > best._2 ||
            (v == best._2 && (utf8Lt(k._1, best._1._1) ||
              (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))
          best = (k, v)
      }
      val ((a, b), c) = best
      merges += Merge(step, a, b, c)
      cur = cur.map { case (w, wc) =>
        if (!w.indices.exists(i => i < w.length - 1 && w(i) == a && w(i + 1) == b))
          (w, wc)
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          w.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = a + b
            else out += x
          }
          (out.toArray, wc)
        }
      }
    }
    merges.toSeq
  }

  /** The over-limit distributed per-step loop (pre-r13 `train`). */
  private[graft] def trainDistributed(s: SparkSession, words: DataFrame,
      nMerges: Int): Seq[Merge] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = words.persist()
    // ONE action per step (round 11): the step's top-pair collect is also
    // what materializes the previous step's cut (its lineage reads the
    // parent's cached blocks), so the parent unpersists right after the
    // collect instead of paying a dedicated count() job per step — same
    // results, half the driver round-trips of the old
    // persist-count-unpersist sequencing. At most two vocab-bounded
    // tables hold blocks at once, exactly as before.
    var prev: Option[DataFrame] = None
    try {
      for (step <- 1 to nMerges) {
        val top = cur
          .select(col("wc"), explode(expr(PairsSql)).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("wc")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        prev.foreach(_.unpersist())
        prev = None
        if (top.isEmpty) return merges.toSeq
        val (a, b, c) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += Merge(step, a, b, c)
        val next = cur.select(applyMerge(col("w"), a, b).as("w"), col("wc"))
        val cut = s.createDataFrame(next.rdd, next.schema).persist()
        prev = Some(cur)
        cur = cut
      }
      merges.toSeq
    } finally {
      prev.foreach(_.unpersist())
      cur.unpersist()
    }
  }

  /** Training is deterministic, and the artifact is metadata-scale
    * (N rows), so q7T and q7U share one run per (session, dir) — the
    * IVF/PQ model-cache pattern. Cleared via [[release]] (hooked into
    * LlmOps.release so Bench's between-pass release re-pays training).
    */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(Long, String, Int), Seq[Merge]]

  def mergesFor(s: SparkSession, d: String): Seq[Merge] =
    mergeCache.getOrElseUpdate(
      (LlmOps.sessionKey(s), d, RegistryMerges),
      train(s, baseWords(graft.sources.Tables.documents(s, d)),
        RegistryMerges))

  private[graft] def release(key: Long): Unit =
    mergeCache.keys.filter(_._1 == key).foreach(mergeCache.remove)

  /** The q7T registry entry: the learned merge table after
    * [[RegistryMerges]] steps, one row per merge in training order.
    */
  def trained(s: SparkSession, d: String): DataFrame = {
    s.createDataFrame(mergesFor(s, d))
      .select("step", "left", "right", "cnt")
      .orderBy("step")
  }

  /** The q7U registry entry: the corpus TOKENIZED with the trained
    * merges — the apply half of the tokenizer lifecycle, as the top-25
    * token frequencies. Training needs iteration (each decision depends
    * on the state the previous one left); APPLYING does not: the merge
    * list is known, so the final symbol table comes from ONE
    * vocab-bounded pass chaining all N greedy folds in a single
    * projection (N·|word| in-row work per DISTINCT word — no per-step
    * jobs, no lineage growth). One corpus scan rebuilds the weighted
    * `(word, count)` table; everything after it is vocab-bounded —
    * `wc` already carries each distinct word's corpus count, so token
    * counts are a weighted explode with no SECOND corpus pass and no
    * per-step passes. (Per-document tokenization at 100 TB is the same
    * token table broadcast/equi-joined against the exploded corpus —
    * the vocab-bounded table is the whole trick, both here and there.)
    */
  def tokenized(s: SparkSession, d: String): DataFrame = {
    val merges = mergesFor(s, d)
    baseWords(graft.sources.Tables.documents(s, d))
      .select(col("wc"),
        explode(merges.foldLeft(col("w"))((c, m) =>
          applyMerge(c, m.left, m.right))).as("token"))
      .groupBy("token").agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(25)
  }
}
