package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.{DotProduct, MinHash, SortedIntersect}
import graft.sources.Tables

/** §2.10 — LLM-training-data-pipeline operators over `documents` and
  * `embeddings`: dedup (exact + CDC-latest), text analysis (tokens,
  * n-grams, TF-IDF, corpus stats), similarity search (cosine top-k,
  * threshold join, kNN) and the multimodal doc⋈vector join.
  *
  * Similarity kernel: squared norms are precomputed once per vector and the
  * dot product is the codegen'd [[graft.functions.DotProduct]] expression (a
  * fused Java loop inside whole-stage codegen — the interpreted HOF fold it
  * replaced was the round-1 bench bottleneck). Exact all-pairs enumeration
  * is BLOCK-PARTITIONED (see [[pairs]]): an equi-join on upper-triangle
  * grid cells, so per-task input is bounded and skew-free no matter how
  * large n grows; the pair stream exists only inside the cell tasks and
  * only its per-cell top-k / at-threshold survivors are persisted, shared
  * by q76 (top-k) and q77 (threshold) in one pass per (session, sfDir).
  * Exactness keeps total work O(n²) by declared semantics; the 100 TB
  * near-dup scale path is the bucketed LSH banding in q7A
  * ([[graft.functions.MinHash]]), which never compares all pairs.
  */
object LlmOps {
  type Q = (SparkSession, String) => DataFrame

  /** embeddings with a double-cast vector + its squared norm (one scan).
    * The element cast is a plain `Cast` (codegen'd, exact float→double
    * widening — same values as the per-element HOF cast it replaced).
    */
  private[graft] def vectors(s: SparkSession, d: String): DataFrame = {
    DotProduct.register(s)
    graft.functions.IvfTop.register(s)
    graft.functions.PqKernels.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nsq", expr("graft_dot(e, e)"))
  }

  /** cosine(a, b) from double arrays + precomputed squared norms,
    * rounded to 4 decimals (the cross-engine determinism convention).
    * Takes column NAMES (spliced into a registered-function call).
    */
  private def cosine(ea: String, eb: String, nsqA: String, nsqB: String): Column =
    round(expr(s"graft_dot($ea, $eb)") / sqrt(col(nsqA) * col(nsqB)), 4)

  /** q76's k and q77's threshold — shared with the survivor pre-aggregation
    * below, so the cached table is provably a superset of both results.
    */
  private val SimTopK = 10
  private val SimThreshold = 0.38
  /** Target vectors per block for the exact-similarity grid (below). */
  private val SimBlockTarget = 250

  /** All pairs (a < b) with rounded cosine similarity, enumerated through a
    * block grid so every task's input is bounded regardless of n.
    *
    * The naive spelling (`a.join(b, id_a < id_b)`) is a non-equi join:
    * Spark can only run it as one broadcast-nested-loop / cartesian pass
    * whose broadcast side grows with n — unbounded per-task input at 100×
    * scale. Instead each vector gets a block id (hash-uniform, B =
    * ceil(n / SimBlockTarget) blocks), the B·(B+1)/2 upper-triangle grid
    * of (bi ≤ bj) cells is broadcast, and each side replicates onto its
    * grid row — turning pair enumeration into an EQUI-join on the cell id.
    * Each unordered pair lands in exactly one cell: cross-block pairs via
    * (bi, bj) = (blkₐ, blk_b) sides, same-block pairs deduped by id. Total
    * work stays O(n²)/2 (exactness demands it) but per-task input is
    * ≤ cells/task · 2·SimBlockTarget vectors, the exchange carries
    * ~B/2 replicas per vector, and skew is impossible by construction —
    * this is the block-partitioned matmul shape from SURVEY §4.3.
    * `cell` is kept so callers can pre-aggregate per cell.
    */
  private def pairs(s: SparkSession, d: String): DataFrame = {
    val v = vectors(s, d)
    // corpus count to size the grid — the shared memoized LIMIT-probe
    // (trainNCache, exact at every size: the probe escalates to a full
    // count past the sample limit), so the sim family, the simhash
    // geometry and quantizer training pay ONE probe per (session, dir)
    // instead of one each (r17, guide §1.2)
    val n = simhashN(s, d)
    val nb = math.max(1L, (n + SimBlockTarget - 1) / SimBlockTarget).toInt
    val grid = s.range(nb.toLong * nb)
      .select((col("id") / nb).cast("int").as("bi"),
        pmod(col("id"), lit(nb)).cast("int").as("bj"))
      .filter(col("bi") <= col("bj"))
    val blk = v.withColumn("blk", pmod(hash(col("vec_id")), lit(nb)))
    // cell id in LONG: bi * nb + bj wraps Int once nb > 46340 (~11.6M
    // vectors), and a wrapped id silently merges two grid cells
    val cellId = col("bi").cast("long") * nb + col("bj")
    val a = blk.join(broadcast(grid), col("blk") === col("bi"))
      .select(cellId.as("cell"), col("blk").as("blk_a"),
        col("vec_id").as("id_a"), col("e").as("ea"), col("nsq").as("na"))
    val b = blk.join(broadcast(grid), col("blk") === col("bj"))
      .select(cellId.as("cell"), col("blk").as("blk_b"),
        col("vec_id").as("id_b"), col("e").as("eb"), col("nsq").as("nb"))
    a.join(b, "cell")
      // cross-block cells hold each unordered pair once (sides are the two
      // blocks); same-block cells hold both orderings — keep one by id
      .filter(col("blk_a") =!= col("blk_b") || col("id_a") < col("id_b"))
      .withColumn("sim", cosine("ea", "eb", "na", "nb"))
      .select(col("cell"),
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("sim"))
  }

  /** The shared q76/q77 input: NOT the O(n²) pair table but only its
    * survivors — per-cell top-k (a superset of the global top-k, since the
    * per-cell rank order is the same total order and every pair lives in
    * exactly one cell) unioned with the at-threshold rows (exactly q77's
    * result). Cached once per (session, sfDir): the persisted footprint is
    * k·cells + threshold matches, never the quadratic pair stream — which
    * now exists only transiently inside the cell tasks. The rank window
    * partitions by cell, so its partitions are bounded and its exchange
    * reuses the cell hash partitioning from the join.
    */
  private val simCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), Cached]

  /** Monotonic id per live SparkSession, for cache keying. The r7 keys
    * used `System.identityHashCode(session)`, which two live sessions can
    * share (it is a hash, not an identity) — a collision hands one
    * session a DataFrame bound to the other: an analyzer error at best,
    * stale data at worst. Ids from this map can never collide (the
    * counter is monotonic) and never resurrect (a GC'd session's id is
    * simply retired); the WeakHashMap holds no strong reference, so the
    * map itself never keeps a session alive.
    */
  private val sessionIds = new java.util.WeakHashMap[SparkSession, java.lang.Long]()
  private var lastSessionId = 0L
  private[graft] def sessionKey(s: SparkSession): Long = sessionIds.synchronized {
    val got = sessionIds.get(s)
    if (got != null) got.longValue()
    else {
      lastSessionId += 1
      sessionIds.put(s, lastSessionId)
      lastSessionId
    }
  }

  /** Per-key holder for a persisted DataFrame. The holder's monitor
    * guards only the brief STATE TRANSITIONS — claim-the-build, publish,
    * fail — never the multi-second build/materialization itself (ADVICE
    * r9: q7N's `out.count()` ran under this monitor, so any other thread
    * touching the same key — including [[invalidate]] — blocked for the
    * whole Spark job; one stuck build was a liveness hazard for a
    * multi-session server). The first caller claims `building` and runs
    * `build` with NO lock held; later callers of the same key wait on
    * the monitor (the work should happen once, not per caller) and are
    * woken at publish. A FAILED build wakes waiters with `built` still
    * empty, so the next caller retries — same retry semantics the
    * monitor-held version had.
    *
    * [[invalidate]] no longer waits for an in-flight build: it marks the
    * holder `dead` and unpersists whatever is published. A build that
    * lands after that sees the tombstone, unpersists its own result and
    * hands the caller a correct-but-uncached DataFrame — so nothing is
    * ever left persisted without a handle in the map, the same
    * no-leak invariant as before but without the blocking.
    */
  private[graft] final class Cached(build: () => DataFrame) {
    private var built: Option[DataFrame] = None
    private var building = false
    private var dead = false
    def get: DataFrame = {
      val ready = synchronized {
        while (building) wait()
        if (built.isEmpty) building = true
        built
      }
      ready match {
        case Some(df) => df
        case None =>
          var published: DataFrame = null
          try {
            val df = build()
            synchronized {
              building = false
              // A release() can race the FIRST access: remove-from-map
              // then invalidate() can both run before the winner of
              // putIfAbsent reaches get, and the build would then persist
              // a DataFrame no handle can ever unpersist. invalidate()
              // leaves a tombstone for exactly that window; a post-mortem
              // build hands the caller a correct but unpersisted result
              // and caches nothing.
              if (dead) df.unpersist(blocking = false) else built = Some(df)
              notifyAll()
            }
            published = df
          } finally {
            if (published == null) synchronized { building = false; notifyAll() }
          }
          published
      }
    }
    /** Unpersists the published result (if any) and marks the holder
      * dead so a build in flight — or not yet started — cannot leak its
      * persist (see get). Does NOT block on an in-flight build.
      */
    def invalidate(): Unit = synchronized {
      dead = true
      built.foreach(_.unpersist(blocking = true)); built = None
    }
  }

  private[graft] type DfCache = scala.collection.concurrent.TrieMap[(Long, String), Cached]

  /** Every persisted-DataFrame cache funnels through this instead of
    * bare `getOrElseUpdate`: that path could run `build` twice and leak
    * the losing copy's persisted blocks until session end. Concurrent
    * callers of the SAME (session, sfDir) block until the first build
    * finishes (the second caller would otherwise redo the work);
    * callers of other keys proceed untouched.
    */
  private[graft] def cachedDf(cache: DfCache,
                       s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    val key = (sessionKey(s), d)
    cache.get(key) match {
      case Some(c) => c.get
      case None =>
        val fresh = new Cached(() => build)
        cache.putIfAbsent(key, fresh).getOrElse(fresh).get
    }
  }

  private def simPairs(s: SparkSession, d: String): DataFrame =
    cachedDf(simCache, s, d) {
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      pairs(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= SimTopK || col("sim") >= SimThreshold)
        .select("id_a", "id_b", "sim")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Unpersists and forgets every sim table owned by `s` (all sfDirs).
    * The harness's sessions are short-lived, but a long-lived server
    * session would otherwise leak one persisted pair table per sfDir it
    * ever touched (VERDICT r02).
    */
  def release(s: SparkSession): Unit = {
    val key = sessionKey(s)
    // invalidate() marks each removed holder dead and unpersists what
    // it published; a build still in flight sees the tombstone and
    // unpersists its own result when it lands (nothing leaks until
    // session end) — release never waits on a running Spark job and
    // never holds a lock another session's keys build under
    Seq(simCache, shingleCache, jaccardCache, ccCache,
        bandedCcCache).foreach { c =>
      c.keys.filter(_._1 == key).foreach { k =>
        c.remove(k).foreach(_.invalidate())
      }
    }
    // the IVF + PQ model caches too (plain values, nothing to
    // unpersist): Bench releases between passes so pass 2 still pays
    // (and therefore measures) quantizer training
    ivfCache.keys.filter(_._1 == key).foreach(ivfCache.remove)
    pqCache.keys.filter(_._1 == key).foreach(pqCache.remove)
    trainNCache.keys.filter(_._1 == key).foreach(trainNCache.remove)
    hierCache.keys.filter(_._1 == key).foreach(hierCache.remove)
    BpeTrain.release(key) // the q7T/q7U shared merge list
    Pipeline.release(key) // the composed pipeline's mid-stage cache
    // delete this session's staged q7N checkpoints (ADVICE r15):
    // release already means "done with this session's dedup artifacts".
    // A staged plan is ROOTED at the checkpoint's parquet scan — there
    // is no lineage behind it to recompute — so a DataFrame handle held
    // across release, or a still-running job reading the staged files,
    // fails with FileNotFoundException once the path is gone (ADVICE
    // r16): release must not race an in-flight q7N build on the same
    // session; it is the end-of-lifecycle call the stageDir scaladoc
    // declares. Best-effort: scratch teardown must never turn a green
    // query into a thrown release.
    stagePaths.remove(key).foreach { paths =>
      val conf = s.sessionState.newHadoopConf()
      paths.foreach { p =>
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).delete(hp, true)
        } catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Staged-checkpoint parquet paths written under
    * `spark.graft.jaccard.stageDir`, per session, so [[release]] owns
    * their deletion (driver-side registry; writes happen on the driver
    * during plan staging).
    */
  private val stagePaths =
    scala.collection.concurrent.TrieMap.empty[Long, Vector[String]]

  private def registerStagePath(key: Long, path: String): Unit =
    stagePaths.synchronized {
      stagePaths.update(key, stagePaths.getOrElse(key, Vector.empty) :+ path)
    }

  /** documents as distinct word-3-shingle sets (the unit of near-dup
    * similarity; unigram token sets are useless here — the corpus draws
    * from a ~30-word vocabulary, so every unigram set is near-identical).
    * zip_with pads the short side with null and concat propagates it, so
    * trailing partial shingles filter out.
    */
  private val shingleCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), Cached]

  /** Storage level for the dedup family's two corpus-scale caches (the
    * shingle sets and the open-vocab dfreq table):
    * `spark.graft.dedup.cacheStorage` ∈ memory_and_disk (default) |
    * memory_only | none. The default is right on a CLUSTER, where
    * aggregate local disk dwarfs the cache and a spill beats
    * re-scanning the raw corpus. `memory_only` trades recompute for
    * zero disk — the dial for a host whose scratch disk is the binding
    * resource (measured r14: the 50M-doc decade's shingle cache alone
    * wants ~60+ GB of spill on a box with ~78 GB free, so the fifth-
    * decade campaign runs memory_only; partitions that don't fit are
    * recomputed from the parquet scan, correctness unchanged). `none`
    * disables the persist outright (every consumer re-shingles).
    */
  private def dedupCacheLevel(s: SparkSession): Option[StorageLevel] =
    s.conf.get("spark.graft.dedup.cacheStorage", "memory_and_disk") match {
      case "memory_and_disk" => Some(StorageLevel.MEMORY_AND_DISK)
      case "memory_only"     => Some(StorageLevel.MEMORY_ONLY)
      case "none"            => None
      case other => throw new IllegalArgumentException(
        s"spark.graft.dedup.cacheStorage must be " +
          s"memory_and_disk|memory_only|none, got $other")
    }

  private def persistAtLevel(df: DataFrame,
      level: Option[StorageLevel]): DataFrame =
    level.map(df.persist).getOrElse(df)

  private[graft] def shingled(s: SparkSession, d: String): DataFrame =
    cachedDf(shingleCache, s, d) {
      // Persisted because every consumer references it 3×+ (q7A: sig +
      // both verify sides; q7N: inverted index + both verify sides) —
      // without the persist each reference re-shingles the whole corpus.
      // Footprint ≈ the text column itself (one ~3-word string per input
      // token), MEMORY_AND_DISK so it spills instead of evicting the
      // executor at 100 TB; the alternative there is recompute-per-use,
      // which is strictly more scans of the raw corpus. Released by
      // [[release]] (Bench calls it between passes, so the build is
      // still charged to the first consumer each pass).
      // array-sorted: the set is ORDER-SORTED once per doc so the q7N
      // verify can count intersections with the linear codegen'd
      // graft_isect_sorted walk instead of array_intersect's per-row
      // hash set.
      // Every other consumer (q7A MinHash, q7P explode) is
      // order-insensitive.
      graft.functions.Shingles.register(s)
      persistAtLevel(
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), expr(ShingleSql).as("shingles")),
        dedupCacheLevel(s))
    }

  /** The word-3-shingle set expression over a `w` (split words) column —
    * shared by [[shingled]] and the S12 streaming near-dup stage
    * (graft.streaming.StreamOps.nearDupCandidates), so stream and batch
    * band the SAME sets.
    *
    * r17: the [[graft.functions.Shingles]] codegen kernel (one pass,
    * TreeSet-ordered — KernelSpec-pinned against the old four-collection
    * SQL spelling kept as [[ShingleSqlRef]]); callers must
    * [[graft.functions.Shingles.register]] first ([[shingled]], the
    * streaming stages and LlmIngest do).
    */
  private[graft] val ShingleSql: String = "graft_shingles(w)"

  /** Pre-r17 SQL spelling of [[ShingleSql]] — the kernel's parity
    * reference (KernelSpec) and the deployment fallback where the
    * extension jar is absent.
    */
  private[graft] val ShingleSqlRef: String =
    """array_sort(array_distinct(filter(
      |  zip_with(
      |    zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),
      |             (a, b) -> concat(a, ' ', b)),
      |    slice(w, 3, greatest(size(w) - 2, 0)),
      |    (ab, c) -> concat(ab, ' ', c)),
      |  x -> x IS NOT NULL)))""".stripMargin

  /** The distinct char-bigram set expression over a `text` column —
    * q7F's in-row extraction, shared with the streaming ingest
    * enrichment (graft.streaming.LlmIngest) so the stream scores docs
    * over the SAME bigram sets the batch profile was trained on.
    *
    * Round 13: the five-collection-expression spelling (split + slice +
    * zip_with + filter + array_distinct — kept as
    * [[BigramSqlRef]] for the KernelSpec parity pin) became the
    * [[graft.functions.Bigrams]] codegen kernel: one byte-level pass,
    * zero-copy bigram windows, one dedup set. Same values, same order;
    * it was ~0.7 s of q7F's ~2.2 s steady-state wall at sf0.1.
    * Callers must [[graft.functions.Bigrams.register]] first (the q7F
    * entry and LlmIngest do).
    */
  private[graft] val BigramSql: String = "graft_bigrams(text)"

  /** Pre-round-13 SQL spelling of [[BigramSql]] — the kernel's parity
    * reference (KernelSpec) and the deployment fallback where the
    * extension jar is absent. Linear (zip_with over the char array and
    * its shift, NOT the O(len²) substring spelling).
    */
  private[graft] val BigramSqlRef: String =
    """array_distinct(filter(
      |  zip_with(split(text, ''), slice(split(text, ''), 2, length(text)),
      |           (a, b) -> concat(a, b)),
      |  s -> s IS NOT NULL AND length(s) = 2))""".stripMargin

  /** q7D's quality statistics over a split-words column `toks`, appended
    * as `n_tokens` / `stop_cnt` / `distinct_cnt` / `score_bp` — all in
    * EXACT integer arithmetic, `score/10000 = ((1 − stop_ratio) +
    * distinct_ratio) / 2` as basis points via integer division. Shared
    * with the S14 streaming enrichment (graft.streaming.LlmIngest) like
    * [[BigramSql]], so the stream scores docs with the batch operator's
    * exact expressions BY CONSTRUCTION, not by parallel maintenance.
    */
  private[graft] def withQualityStats(docs: DataFrame, toks: String): DataFrame =
    docs
      .withColumn("n_tokens", size(col(toks)))
      .withColumn("stop_cnt",
        size(expr(s"filter($toks, t -> t IN ('the', 'a', 'of', 'and'))")))
      .withColumn("distinct_cnt", size(array_distinct(col(toks))))
      .withColumn("score_bp", expr(
        "((n_tokens - stop_cnt + distinct_cnt) * 5000L) div n_tokens"))

  /** q7F's language-profile model over exploded `(lang, bg)` rows: the
    * top-`top` bigrams per language by document frequency, ties toward
    * the smaller bigram. Shared with S14's batch trainer
    * (graft.streaming.LlmIngest.langProfiles) so the stream's
    * driver-resident model and the batch operator's profile are the SAME
    * construction — one tie rule, one cutoff, no drift.
    */
  private[graft] def langProfileTop(docBg: DataFrame, top: Int): DataFrame =
    langProfileTopWeighted(docBg.withColumn("c", lit(1L)), top)

  /** The same profile over pre-aggregated `(…, bg, c)` counts — q7F's
    * single-pass path feeds the (doc, lang, bg) count table here so the
    * profile branch and the predict branch share ONE corpus
    * explode+shuffle (ReusedExchange, pinned in PlanSpec). One window /
    * tie rule / cutoff for every caller, weighted or not.
    */
  private[graft] def langProfileTopWeighted(bgC: DataFrame, top: Int): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bg"))
    bgC.groupBy("lang", "bg").agg(sum(col("c")).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= top)
      .select("lang", "bg")
  }

  /** The LSH banding expression over a `sig` (graft_minhash_row) column:
    * nBands (band, band-hash) structs, 2 signature slots per band —
    * shared by q7A and S12 like [[ShingleSql]], so the streaming
    * candidate stage flags exactly the buckets the batch sweep would.
    */
  private[graft] def bandSql(nBands: Int): String =
    s"transform(sequence(0, ${nBands - 1}), " +
      "b -> struct(b AS band, xxhash64(slice(sig, b * 2 + 1, 2)) AS bh))"

  /** q7N's pair table, unordered: all (id_a < id_b) with word-3-shingle
    * Jaccard ≥ 3/5, `jac_bp` in exact basis points. See the q7N registry
    * comment for the PPJoin prefix-filter design; q7R clusters over the
    * same table.
    *
    * PERSISTED per (session, sfDir), same convention as [[simPairs]]:
    * two registry consumers (q7N's join output, q7R's clustering input)
    * would otherwise each re-run the prefix join + verify — the most
    * expensive stage of both queries. The footprint is the near-dup
    * SURVIVOR pairs (three longs each), a vanishing fraction of the
    * corpus at any scale. First consumer pays the build (Bench releases
    * between passes, so the cost stays measured); [[release]] frees it.
    */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    cachedDf(jaccardCache, s, d) { buildJaccardPairs(s, d) }

  private val jaccardCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), Cached]

  private def buildJaccardPairs(s: SparkSession, d: String): DataFrame = {
    SortedIntersect.register(s)
    val sh = shingled(s, d)
      .filter(size(col("shingles")) >= 1)
      .withColumn("sz", size(col("shingles")))
    val (cand, scratch) = jaccardCandidates(s, sh)
    val out = cand
      .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("ga")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("gb")), "id_b")
      // graft_isect_ge_sorted: the THRESHOLD-AWARE codegen'd merge walk
      // over the pre-sorted shingle sets (see SortedIntersectGe) —
      // returns the exact intersection size when Jaccard ≥ 3/5 and -1
      // otherwise, abandoning a candidate as soon as the remaining
      // elements cannot reach the required overlap. Most candidates
      // FAIL (that is what makes them candidates, not results), so the
      // early exit skips most of the walk for most rows — verify is the
      // measured cost center once candidates grow (SCALING.md, 10×
      // corpus). Survivors complete the walk, so `inter` is exact and
      // jac_bp is unchanged; `inter >= 0` is precisely the old
      // `inter·5 ≥ uni·3` filter (see the ⟺ chain in the kernel doc).
      .withColumn("inter", expr("graft_isect_ge_sorted(ga, gb, 3, 5)"))
      .filter(col("inter") >= 0)
      .withColumn("uni", size(col("ga")) + size(col("gb")) - col("inter"))
      .select(col("id_a"), col("id_b"),
        expr("(cast(inter AS bigint) * 10000) div uni").as("jac_bp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The scratch persists (dfreq + the r17 prefix table) are LOCAL to
    // this build (not a session-scoped cache): both registry consumers
    // (q7N, q7R) read the PAIR table — nothing rejoins them after it
    // materializes — so the pair table is materialized eagerly (it is
    // tiny: three longs per near-dup pair, and both consumers would
    // materialize it on first action anyway; under this key's own build
    // guard, like the probe) and the scratch blocks are freed
    // immediately after (ADVICE r7). Accepted trade: a PLAN-only
    // consumer (graft.Explain) of q7N/q7R executes the build once per
    // (session, sfDir) just to read the plan.
    // try/finally: a failed materialization must still release ALL
    // persists — the scratch frames have no other handle (no cache
    // entry since r8), and a half-built `out` would otherwise pin its
    // partial blocks until session end on every retried build.
    try out.count()
    catch {
      case e: Throwable => out.unpersist(blocking = false); throw e
    } finally scratch.foreach(_.unpersist(blocking = false))
    out
  }

  /** The PPJoin candidate stage of [[buildJaccardPairs]], over a
    * (doc_id, shingles, sz) set table: returns the candidate (id_a,
    * id_b) pairs and the scratch tables backing them (dfreq + the r17
    * prefix table) — still PERSISTED; the caller unpersists them once
    * the candidates are consumed.
    * `private[graft]` so the scale probe ([[graft.Scale]]) can measure
    * candidates/doc on synthetic corpora without duplicating the join.
    */
  private[graft] def jaccardCandidates(
      s: SparkSession, sh: DataFrame): (DataFrame, Seq[DataFrame]) = {
    // Dictionary-hash the shingles ONCE at the explode (xxhash64 → one
    // 8-byte key) and run every candidate-stage exchange on the hash:
    // the dfreq aggregation and the tok ⋈ dfreq rank join both shuffle
    // corpus-scale rows in the open-vocab regime, and an ~25-byte
    // 3-word string key per row is most of their bytes (measured r14:
    // the 50M-doc decade's string-keyed shuffles wanted more scratch
    // disk than the host has). Standard PPJoin practice (Xiao et al.
    // use integer token ids): any consistent total order works for the
    // prefix rank, so (df, h) replaces (df, g); a CROSS-doc 64-bit
    // collision can only MERGE two shingles' df counts / posting
    // lists, which widens a prefix or adds a candidate — safe.
    // Completeness caveat, stated precisely (VERDICT r15 #5): hashing
    // the rank keys to 64 bits leaves exactly one ~2⁻⁶⁴-probability
    // event class — "two distinct shingles of one doc share a hash" —
    // reachable through three equivalent mechanisms, and no hash-keyed
    // rank order removes it:
    //  (a) as written, row_number hands the collided hash two prefix
    //      ranks, consuming a prefix slot;
    //  (b) ranking over DISTINCT (doc_id, h) — the rewrite the r15
    //      verdict sketched — closes (a), but the rank arithmetic
    //      below reconstructs full rank as sz − n2 + r2 with sz = the
    //      STRING set size; under the same collision the doc holds
    //      only m = sz − 1 distinct hashes, the reconstruction
    //      overshoots by 1, and the prefix filter tightens by the
    //      same one slot (computing m instead costs a corpus-scale
    //      distinct exchange or a per-row interpreted HOF on the
    //      hottest pass — both worse than the event they guard);
    //  (c) independent of ranks entirely, two COMMON shingles of a
    //      qualifying pair colliding undercounts the pair's HASHED
    //      overlap below α while its true overlap passes.
    // All three fire only on a within-doc (for (c): within both docs)
    // collision — expected count ≈ n·sz²·2⁻⁶⁵ over a corpus, ~10⁻⁹ at
    // the measured 50M-doc decade — so the sketched dedup rewrite buys
    // nothing: the class is accepted, once, here. The only design with
    // zero asterisk ranks the raw STRING shingles — the pre-r14 plan
    // whose string-keyed shuffles measurably ENOSPC'd the 50M-doc
    // decade. The verify stage re-joins the full STRING shingle sets,
    // so any pair that IS a candidate is judged exactly (JaccardSpec's
    // brute-force re-proof covers the whole path on fixture + random
    // corpora).
    val tok = sh.select(col("doc_id"), col("sz"),
        explode(col("shingles")).as("g"))
      .select(col("doc_id"), col("sz"), xxhash64(col("g")).as("h"))
    // Staged-footprint dial (r15, VERDICT r14 #3):
    // `spark.graft.jaccard.stageDir` (path; empty = off, the default).
    // When set, the two candidate-stage intermediates CHECKPOINT to
    // parquet under it, each in its OWN job with a GC nudge between —
    // cutting lineage so a finished stage's shuffle files free (the
    // ContextCleaner collects the now-unreachable ShuffleDependency)
    // before the next stage's land. Without it the candidate query is
    // ONE job whose corpus-scale exchanges coexist on scratch disk
    // (dfreq agg + the window sort — TWICE, because the self-join
    // plans its prefix side twice); peak scratch is their SUM
    // (measured r14: >78 GB at 50M docs, ENOSPC). Staged, peak = the
    // largest single stage — the max-not-sum arithmetic a disk-bound
    // host (or a 100 TB run that would rather checkpoint than hold
    // three corpus footprints) needs. The staged prefix table is tiny
    // (post-rank, df>1-only rows), so job 3's self-join also stops
    // re-computing the whole prefix pipeline per side. The CALLER owns
    // the stageDir lifecycle (files are UUID-fresh per call).
    val stageDir = s.conf.get("spark.graft.jaccard.stageDir", "")
    def staged(df: DataFrame, name: String): DataFrame =
      if (stageDir.isEmpty) df
      else {
        // GC nudge BEFORE and AFTER the write: the ContextCleaner only
        // deletes a finished stage's shuffle files once its
        // ShuffleDependency is collected, and the default
        // spark.cleaner.periodicGC.interval is 30 MIN — far longer
        // than the window between staged jobs. The post-write nudge
        // can fire while the just-finished job's references are still
        // reachable (measured in the r15 50M-doc run: a stale 26 GB
        // agg shuffle survived its nudge and coexisted with the next
        // join's 23 GB — a forced GC freed 48 GB instantly), so the
        // next stage nudges again before spending disk. Deployments
        // should also set spark.cleaner.periodicGC.interval=2min for
        // disk-bound runs (tools/run_scale.sh does).
        System.gc()
        val path = s"$stageDir/${name}_${java.util.UUID.randomUUID()}.parquet"
        df.write.mode("overwrite").parquet(path)
        System.gc()
        // register for [[release]]-time deletion (ADVICE r15): the
        // files are UUID-fresh per call, so a long-lived session
        // rebuilding q7N would otherwise accumulate unbounded scratch
        registerStagePath(sessionKey(s), path)
        s.read.parquet(path)
      }
    // The df table joins back against every shingle instance, so it is
    // broadcast when — and only when — it is measured to be model-sized.
    // Catalyst can't size the aggregate statically (it shuffle-sorts 10×
    // the rows without help), so the table is persisted (the join needs
    // it materialized anyway) and ONE probe job measures both its
    // cardinality and its raw key bytes; the hint applies only under
    // BOTH spark.graft.jaccard.broadcastShingleLimit (default 4M rows)
    // and spark.graft.jaccard.broadcastShingleMaxBytes (default 128 MB
    // ESTIMATED footprint: 8 B hashed key + 64 B/row for the
    // long/HashedRelation-slot overhead — the r14 hashed keys make the
    // estimate exact where the old raw-UTF8 length probe undercounted
    // string overhead, ADVICE r7). Above either bound — the open-domain case, where the
    // shingle dictionary grows with the corpus — the plain shuffle
    // equi-join, which never puts corpus-scale data on the driver.
    // JaccardSpec exercises both branches.
    // r15: dfreq keeps ONLY df > 1 rows. A shingle absent from the
    // table has df = 1 by construction, so a LEFT join + coalesce(df,1)
    // reproduces the (df, h) rank order EXACTLY — and in the open-vocab
    // regime, where most 3-shingles are unique, this turns a
    // corpus-scale table (row count tracking total shingle volume)
    // into a model-scale one (only REPEATED shingles: the dup-pair and
    // Zipf-head tail), which usually re-enters the broadcast gate —
    // deleting the tok-by-h join exchange entirely. The prefix stage's
    // own df > 1 filter already declared these rows the only useful
    // ones; this moves that knowledge up to where the bytes are.
    // Still honors the [[dedupCacheLevel]] dial; under `none` the
    // probe and the join each re-run the aggregation.
    val dfreq = persistAtLevel(staged(
      tok.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") > 1),
      "dfreq"), dedupCacheLevel(s))
    // hashed keys are a fixed 8 bytes, so the byte estimate is exact
    // (8 + the 64 B/row HashedRelation-slot overhead)
    val probe = dfreq.agg(count(lit(1)).as("rows"),
      (count(lit(1)) * 8L).as("bytes")).head()
    val bcLimit = s.conf.get("spark.graft.jaccard.broadcastShingleLimit",
      "4000000").toLong
    val bcMaxBytes = s.conf.get("spark.graft.jaccard.broadcastShingleMaxBytes",
      (128L * 1024 * 1024).toString).toLong
    val estBytes = probe.getLong(1) + 64L * probe.getLong(0)
    val dfJoin =
      if (probe.getLong(0) <= bcLimit && estBytes <= bcMaxBytes)
        broadcast(dfreq)
      else dfreq
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    // prefix length = sz - ceil(3·sz/5) + 1, ceil spelled (3·sz+4) div 5.
    // The rank window runs over the df>1 HITS ONLY (r15) — yet computes
    // each hit's rank in the FULL (df, h) order exactly (exact on every
    // collision-free doc; the one accepted 2⁻⁶⁴ within-doc-collision
    // class is adjudicated in full at the caveat above — the lemma here
    // inherits it, it does not add to it): a df=1 shingle
    // is absent from the df>1-only table, and under (df, h) every
    // (1, ·) row sorts strictly before every (≥2, ·) row, so a hit's
    // full rank = (#df=1 shingles in the doc) + (rank among the doc's
    // hits) = (sz − n2) + r2. df=1 rows were dropped AFTER the window
    // anyway (they can never produce a pair) — this drops them BEFORE
    // it, collapsing the window exchange + sort from every shingle
    // instance in the corpus (2.9 B rows at the 50M-doc decade — the
    // r14/r15 ENOSPC stage, exchange + sort spill ≈ 70 GB) to just the
    // repeated-shingle instances (~20-30× fewer in the open-vocab
    // regime). Bit-identical candidates; JaccardSpec's brute-force
    // re-proof and the random-corpora property cover the rewrite.
    // `spark.graft.jaccard.prefixPersist` (r17, default false): persist
    // the prefix table so the self-join below reads cached blocks twice
    // instead of executing the whole tok → dfreq-join → double-window
    // pipeline twice — neither plan-time ReuseExchange nor AQE stage
    // reuse dedupes the two aliased subplans in practice (read in the
    // r17 executed plan: two full chains, zero ReusedExchange). The
    // dial is SCALE-dependent, hence off by default: at fixture scale
    // the duplicate sides run as concurrent AQE stages on an idle
    // local[32] (interleaved A/B at sf0.1: persist min 3.38 s vs 2.74 s
    // — the persist serializes the build into the wall), while a
    // disk-bound or fully-loaded run pays the duplicate pipeline twice
    // in CPU and scratch (the r14 ENOSPC arithmetic) and should set
    // true — or stageDir, whose parquet checkpoint subsumes this (the
    // staged read-back is already computed once).
    val prefixPersistOn =
      s.conf.get("spark.graft.jaccard.prefixPersist", "false").toBoolean
    val prefix = persistAtLevel(staged(
      tok.join(dfJoin, "h")
        .withColumn("r2", row_number().over(wDoc))
        .withColumn("n2",
          count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .withColumn("rk", col("sz") - col("n2") + col("r2"))
        .filter(col("rk") <= col("sz") - expr("(3 * sz + 4) div 5") + 1)
        .select(col("h"), col("doc_id"), col("sz"), col("rk")),
      "prefix"), if (prefixPersistOn) dedupCacheLevel(s) else None)
    // Candidate pairs via the prefix ⋈ prefix equi-join (the inverted
    // index realized as a join). The r5 alternative — groupBy(g) +
    // collect_list + in-row pair enumeration, to build each posting
    // list once instead of planning prefix twice — MEASURED 3.5×
    // slower end-to-end: nested higher-order functions are
    // CodegenFallback (interpreted, closure-per-element), and AQE
    // coalesces the small posting-list shuffle to one task, so the
    // interpreted enumeration also lost all parallelism. The join's
    // extra prefix subplan is the cheaper evil; both sides stream
    // through codegen.
    // PPJoin POSITIONAL filter (Xiao et al., WWW'08), on top of the
    // prefix filter: a qualifying pair needs overlap α = ceil(3(sa+sb)/8)
    // (τ/(1+τ) = 3/8 at τ = 3/5). Let t₁ be the pair's first common
    // shingle in the global (df, g) order. Every common shingle sorts at
    // or after t₁, so α ≤ 1 + min(sa − rk_a, sb − rk_b) evaluated at
    // t₁'s row — and t₁ is always IN both prefixes (if a doc's prefix
    // missed t₁, all its common shingles would sit past the prefix,
    // capping overlap at ceil(3sz/5) − 1 < α given the 3:5 size filter).
    // So keeping every join row that satisfies the bound keeps at least
    // t₁'s row for every true pair: candidates shrink (2.8× measured at
    // sf0.1 — the verify stage is the cost center), completeness holds
    // (JaccardSpec re-proves vs brute force, fixture + random corpora).
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * 3 <= col("b.sz") * 5 &&
          col("b.sz") * 3 <= col("a.sz") * 5 &&
          (lit(1) + least(col("a.sz") - col("a.rk"),
            col("b.sz") - col("b.rk"))) * 8 >=
            (col("a.sz") + col("b.sz")) * 3)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    (cand, Seq(dfreq, prefix))
  }

  /** Fixed ±1 random hyperplanes for SimHash bucketing (q7C/q7H):
    * plane i's 64 signs drawn from a seeded splitmix64-style mix,
    * rendered as SQL array literals so the sign test runs through the
    * codegen'd graft_dot. Deterministic run-to-run; plane index =
    * band·bits + j, so a fixed (bands, bits) geometry always reuses the
    * same planes.
    */
  private object AnnPlanes {
    private def mix(z0: Long): Long = {
      var z = z0 ^ 0x9e3779b97f4a7c15L
      z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
      z ^= z >>> 27; z *= 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def sql(i: Int): String =
      (0 until 64)
        .map(k => if ((mix(i.toLong * 1000003 + k) & 1L) == 0L) "1D" else "-1D")
        .mkString("array(", ",", ")")
    /** One `bits`-wide LSH band = the sign bits of `bits` hyperplane
      * projections (plane band·bits + j contributes bit bits−1−j).
      */
    def bandExpr(band: Int, bits: Int): String =
      (0 until bits).map { j =>
        s"IF(graft_dot(e, ${sql(band * bits + j)}) >= 0D, ${1 << (bits - 1 - j)}, 0)"
      }.mkString(" + ")
    /** The same ±1 planes FLATTENED for the graft_simhash_bands kernel:
      * plane p = band·bits + j occupies entries [p·64, p·64 + 64) —
      * entry k is +1 exactly when [[sql]](p)'s k-th literal is "1D", so
      * the kernel's band values are bit-identical to the expression
      * tree it replaced ([[bandExpr]] kept for the KernelSpec parity
      * pin).
      */
    def flat(bands: Int, bits: Int): Array[Double] = {
      val out = new Array[Double](bands * bits * 64)
      var p = 0
      while (p < bands * bits) {
        var k = 0
        while (k < 64) {
          out(p * 64 + k) =
            if ((mix(p.toLong * 1000003 + k) & 1L) == 0L) 1.0 else -1.0
          k += 1
        }
        p += 1
      }
      out
    }
  }

  /** Test-only: the pre-r14 SQL banding spelling over the same planes,
    * so KernelSpec can pin graft_simhash_bands bit-for-bit against the
    * expression tree it replaced (at geometries small enough for that
    * tree to still codegen).
    */
  private[graft] def legacyBandSql(band: Int, bits: Int): String =
    AnnPlanes.bandExpr(band, bits)

  /** The flattened plane literal for a geometry (test + embedBanded). */
  private[graft] def planesFlat(bands: Int, bits: Int): Array[Double] =
    AnnPlanes.flat(bands, bits)

  /** Hard caps on the auto geometry: 24 bits keeps bval a small Int
    * (16M buckets per band is past any plausible per-band occupancy
    * target), 64 bands bounds the banded-view cost at bands·bits ≤
    * 1,536 in-row dot products per vector.
    */
  private val MaxBandBits = 24
  private val MaxBands = 64

  /** n-SCALED SimHash geometry (VERDICT r13 #1). The pre-r14 shape —
    * 4 bands × 4 bits = 64 buckets TOTAL regardless of corpus size —
    * made q7H's candidate self-join Θ(n²/16) by pigeonhole (measured:
    * 35 B analytic candidate pairs at 500k vectors) and q7C's per-query
    * candidate set Θ(n). The fix is the same law the IVF tier uses:
    * scale the structure with the corpus.
    *
    *  - bits per band ≈ log₂(n / targetOccupancy), so expected bucket
    *    occupancy stays ≈ `spark.graft.simhash.targetOccupancy`
    *    (default 256) and same-bucket candidate pairs grow ~n·c·bands,
    *    not n²: sub-quadratic by construction.
    *  - bands ≈ ln(10)/p₀^bits with p₀ = 1 − arccos(0.9)/π ≈ 0.856 —
    *    the band count that holds ≥~0.9 collision recall for a
    *    DUPLICATE-regime pair (cos 0.9) as the bands widen (each band
    *    is an independent p₀^bits trial; ln(10) targets 1−e⁻²·³ ≈ 0.9).
    *    Near the τ=0.38 decision boundary recall still decays with
    *    bits — that is the documented LSH trade ([[dedupProbeFor]]):
    *    hyperplane LSH at p(τ)=0.63 cannot hold boundary recall
    *    sub-quadratically at any geometry (ρ ≈ 0.67), so boundary-
    *    complete dedup belongs to the exact passes (q7N/q76/q77).
    *
    * At the fixture decades n ≤ c·16 keeps (4, 4) — bit-identical to
    * the pre-r14 geometry, so every AnnSpec floor pins the same
    * construction. `spark.graft.simhash.bandBits` / `.bands` pin either
    * dial explicitly (specs, reproducibility); when both are pinned the
    * corpus-count probe is skipped entirely. The count itself is the
    * ivf trainCorpus LIMIT-probe, shared through trainNCache with
    * quantizer training — one probe per (session, dir).
    */
  /** Corpus row count feeding the SimHash geometry and the q7H
    * broadcast gate — the ivf trainCorpus LIMIT-probe, shared through
    * trainNCache with quantizer training (one probe per (session,
    * dir); exact at every size because the probe escalates to a full
    * count past the sample limit).
    */
  private def simhashN(s: SparkSession, d: String): Long = {
    val sampleLimit =
      s.conf.get("spark.graft.ivf.trainSampleLimit", "1000000").toLong
    trainCorpus(s, d, vectors(s, d), sampleLimit)._1
  }

  def simhashGeom(s: SparkSession, d: String): (Int, Int) = {
    val occ = s.conf.get("spark.graft.simhash.targetOccupancy", "256").toLong
    require(occ > 0,
      s"spark.graft.simhash.targetOccupancy must be positive, got $occ")
    val pinBits = s.conf.get("spark.graft.simhash.bandBits", "0").toInt
    val pinBands = s.conf.get("spark.graft.simhash.bands", "0").toInt
    require(pinBits >= 0 && pinBits <= MaxBandBits,
      s"spark.graft.simhash.bandBits must be in [0,$MaxBandBits] (0 = auto), got $pinBits")
    require(pinBands >= 0 && pinBands <= MaxBands,
      s"spark.graft.simhash.bands must be in [0,$MaxBands] (0 = auto), got $pinBands")
    lazy val n = simhashN(s, d)
    val bits =
      if (pinBits > 0) pinBits
      else {
        val raw = math.ceil(
          math.log(math.max(1.0, n.toDouble / occ)) / math.log(2.0)).toInt
        math.min(MaxBandBits, math.max(4, raw))
      }
    val bands =
      if (pinBands > 0) pinBands
      else {
        val p0 = 1.0 - math.acos(0.9) / math.Pi
        val raw = math.round(math.log(10.0) / math.pow(p0, bits)).toInt
        math.min(MaxBands, math.max(4, raw))
      }
    (bands, bits)
  }

  /** The per-vector band/bucket view q7C/q7H run over — (vec_id, e,
    * nsq, band ∈ [0,bands), bval ∈ [0,2^bits)) under [[simhashGeom]].
    * Consumers that only need the BUCKETS select (vec_id, band, bval)
    * and Catalyst prunes e/nsq out of every exchange — the id-only join
    * discipline that replaced the r13 vector-carrying band join
    * (measured there: 51 GB shuffle at the 50M decade, ENOSPC). Public
    * for the Scale `embdedup` probe, whose large decades compute
    * candidate VOLUME from this view's bucket histogram (distributed
    * Σ c·(c−1)/2 arithmetic) instead of counting a join too large to
    * run.
    */
  def embedBanded(s: SparkSession, d: String): DataFrame = {
    graft.functions.SimhashBands.register(s)
    val v = vectors(s, d)
    val (bands, bits) = simhashGeom(s, d)
    // one codegen'd kernel call for ALL band values (r14): the per-plane
    // IF-chain expression tree was O(bands·bits) generated code and fell
    // out of whole-stage codegen past the 64 KB method limit at the
    // n-scaled geometries ((24,15)/(37,18) — measured fallbacks in the
    // r14 campaign logs); the kernel is an O(1)-size plan at any
    // geometry, bit-identical by KernelSpec pin
    v.select(col("vec_id"), col("e"), col("nsq"),
      posexplode(call_function("graft_simhash_bands", col("e"),
        graft.functions.ModelLit.vec("simhash_planes",
          AnnPlanes.flat(bands, bits)),
        lit(bands), lit(bits)))
        .as(Seq("band", "bval")))
  }

  /** Probe-mode selection rule for q7H, RE-DERIVED for the n-scaled
    * geometry (VERDICT r13 #1; the r12 rule's fixed 0.5/0.9 boundaries
    * were exactly the (4, 4) instance of this formula and stopped
    * describing the operator once bits scale with n). Pick by the
    * NEAR-THRESHOLD pair-recall target — the band the LSH actually
    * misses (cos ∈ [τ, 0.5)); overall and duplicate-regime recall are
    * higher in both modes (the bands-law of [[simhashGeom]] holds the
    * duplicate regime by construction).
    *
    * The rule is the standard hyperplane-LSH hit probability at the
    * WORST near-τ pair (cos = τ = 0.38 ⇒ per-plane agreement
    * p = 1 − arccos(0.38)/π ≈ 0.627):
    *  - single: P(hit) = 1 − (1 − p^bits)^bands
    *  - multi (Hamming ≤ 1 per band): per-band
    *    p^bits + bits·p^(bits−1)·(1 − p), same band union.
    * Validated against the Scale `embdedup` regime tables (analytic vs
    * measured near-τ recall: (5,5) single 0.398/0.405, multi
    * 0.911/0.919; (8,8) single 0.176/0.195, multi 0.694/0.720 — the
    * formula under-promises by ≤ 0.03 because real near-band pairs sit
    * above τ). Return: the cheapest mode whose analytic near-τ recall
    * reaches the target — `single` (1× candidates) before `multi`
    * (~(bits+1)× candidates), else `exact`: past the geometry's reach
    * no probe mode is honest (the ρ ≈ 0.67 bound — boundary-complete
    * dedup belongs to q7N PPJoin / q76–q77 block-grid). As n grows,
    * bits grow and both mode ceilings FALL — callers asking for a
    * fixed boundary recall are routed to `exact` earlier on bigger
    * corpora, which is the honest answer, not a regression.
    */
  def dedupProbeFor(nearRecallTarget: Double, bands: Int, bits: Int): String = {
    require(nearRecallTarget >= 0.0 && nearRecallTarget <= 1.0,
      s"near-recall target must be in [0,1], got $nearRecallTarget")
    require(bands >= 1 && bits >= 1, s"geometry ($bands, $bits) invalid")
    val p = 1.0 - math.acos(0.38) / math.Pi
    def union(perBand: Double): Double =
      1.0 - math.pow(1.0 - perBand, bands.toDouble)
    val single = union(math.pow(p, bits.toDouble))
    val multi = union(math.pow(p, bits.toDouble) +
      bits * math.pow(p, (bits - 1).toDouble) * (1.0 - p))
    if (single >= nearRecallTarget) "single"
    else if (multi >= nearRecallTarget) "multi"
    else "exact"
  }

  /** [[dedupProbeFor]] under the corpus's own resolved geometry. */
  def dedupProbeFor(s: SparkSession, d: String,
      nearRecallTarget: Double): String = {
    val (bands, bits) = simhashGeom(s, d)
    dedupProbeFor(nearRecallTarget, bands, bits)
  }

  /** q7H's RAW candidate rows — SimHash band buckets met by an id-only
    * equi-join on (band, bval): one (id_a, id_b) row per bucket
    * collision, duplicates across bands/probes included (this count is
    * the operator's cost driver, so the Scale `embdedup` probe counts
    * THIS stream and checks it against the bucket-histogram
    * arithmetic). The join carries 20-byte rows, never vectors — the
    * exact pass refetches them by id ([[embedDedupPairs]]).
    * Probe policy via `spark.graft.simhash.dedupProbe`:
    *  - `single` (default): one bucket per band per side — candidates
    *    are the budget at 100 TB and the bands-law already holds
    *    duplicate-regime recall (see [[simhashGeom]]).
    *  - `multi`: side A also probes every Hamming-1 bucket of every
    *    band (Lv et al., VLDB'07) — bits+1 keys per (vector, band).
    *    XOR symmetry makes one-sided expansion cover both directions.
    *    Buys boundary recall for ~(bits+1)× the candidate rows; the
    *    multiplier lands on the corpus side, so it scales with n.
    *  - `exact` (r15): [[dedupProbeFor]]'s third answer, now an
    *    executable plan instead of prose (VERDICT r14 #1 — a caller
    *    piping the policy's answer into this conf used to hit the
    *    `require`). Candidates are ALL unordered pairs, enumerated
    *    through the q76 block-grid ([[pairs]]) — declared O(n²) total
    *    work (boundary-complete recall demands it) but bounded
    *    per-task input and skew-free by construction; each pair
    *    appears exactly once, already id_a < id_b. The LSH geometry
    *    is never consulted.
    */
  def embedCandidates(s: SparkSession, d: String): DataFrame = {
    val probe = s.conf.get("spark.graft.simhash.dedupProbe", "single")
    require(probe == "single" || probe == "multi" || probe == "exact",
      s"spark.graft.simhash.dedupProbe must be single|multi|exact, got $probe")
    // armed pre-flight advisory (see [[embedCandidateEstimate]]): price
    // the candidate stream before the join pays for it. Parse failures
    // name the conf (ADVICE r15 — a bare .toLong threw a raw
    // NumberFormatException with no hint which knob was malformed).
    val budgetStr = s.conf.get("spark.graft.simhash.candBudget", "0")
    val budget =
      try budgetStr.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.simhash.candBudget must be a long candidate-row " +
            s"count (0 disables the advisory), got '$budgetStr'")
      }
    if (budget > 0) {
      val est = embedCandidateEstimate(s, d)
      if (est > budget)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"q7H candidate estimate $est rows exceeds " +
            s"spark.graft.simhash.candBudget=$budget under probe=$probe; " +
            s"proceeding — consider probe=single (1x candidates) or " +
            s"routing boundary-complete asks to the exact operators " +
            s"(q7N PPJoin / q76-q77 block-grid)")
    }
    if (probe == "exact") return pairs(s, d).select("id_a", "id_b")
    val (_, bits) = simhashGeom(s, d)
    val banded = embedBanded(s, d).select("vec_id", "band", "bval")
    val aBval =
      if (probe == "single") col("bval")
      else explode(array(col("bval") +: (0 until bits).map(k =>
        col("bval").bitwiseXOR(lit(1 << k))): _*))
    val a = banded.select(col("vec_id").as("id_a"), col("band"),
      aBval.as("bval"))
    val b = banded.select(col("vec_id").as("id_b"), col("band"), col("bval"))
    a.join(b, Seq("band", "bval")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Cheap PRE-FLIGHT estimate of [[embedCandidates]]'s row count under
    * the session's CURRENT probe conf and geometry (VERDICT r14 #2 —
    * candidate volume is the operator's cost driver, and a forced
    * `multi` at a big decade can be ~(bits+1)× a single-mode run that
    * already took minutes; an operator should be able to price the run
    * before paying for it). EXACT, not a model: the band join's output
    * size is fully determined by the bucket histogram —
    *  - `single`: Σ_bucket c·(c−1)/2;
    *  - `multi`: that plus the Hamming-1 cross terms
    *    Σ_k Σ_v c(v)·c(v⊕2^k)/2 per band (the XOR relation is
    *    symmetric, so each unordered cross pair survives the
    *    id_a < id_b filter exactly once);
    *  - `exact`: n·(n−1)/2 (the block-grid enumerates every pair).
    * AnnSpec pins bit-for-bit equality with the real count in all
    * three modes. Cost: one histogram aggregation over the banded view
    * (a corpus pass, but ~bands·n 12-byte rows — no pair-scale
    * anything), vs the join itself which can be thousands of times
    * larger. The same arithmetic backs the Scale `embdedup` campaign's
    * large decades, where the real join is too big to count at all.
    *
    * `spark.graft.simhash.candBudget` (rows, default 0 = off) arms a
    * runtime advisory in [[embedCandidates]]: when the estimate
    * exceeds the budget, the operator logs the estimate, the budget,
    * and the cheaper-mode suggestion BEFORE the join runs — a
    * pre-flight check, not a failure (the run proceeds; the caller
    * asked for it).
    */
  def embedCandidateEstimate(s: SparkSession, d: String): Long = {
    val probe = s.conf.get("spark.graft.simhash.dedupProbe", "single")
    require(probe == "single" || probe == "multi" || probe == "exact",
      s"spark.graft.simhash.dedupProbe must be single|multi|exact, got $probe")
    if (probe == "exact") {
      val n = simhashN(s, d)
      return n * (n - 1) / 2
    }
    val (_, bits) = simhashGeom(s, d)
    val hist = embedBanded(s, d).groupBy("band", "bval").count()
    val same = hist.agg(coalesce(sum(expr("count * (count - 1) DIV 2")),
      lit(0L))).head().getLong(0)
    val cross = if (probe == "single") 0L else {
      val h2 = hist.select(col("band"), col("bval").as("bv2"),
        col("count").as("c2"))
      hist.select(col("band"), col("count").as("c1"),
          explode(array((0 until bits).map(k =>
            col("bval").bitwiseXOR(lit(1 << k))): _*)).as("bv2"))
        .join(h2, Seq("band", "bv2"))
        .agg(coalesce(sum(col("c1") * col("c2")), lit(0L)))
        .head().getLong(0) / 2
    }
    same + cross
  }

  /** q7H's candidate pairs WITH vectors, ready for the exact-cosine
    * filter: distinct (id_a, id_b) collisions from [[embedCandidates]],
    * then a vector REFETCH by id against the corpus (q7S's shortlist
    * shape) — the cosine runs once per distinct pair, and no exchange
    * anywhere in the pipeline ships an embedding keyed by anything but
    * its own vec_id.
    */
  def embedDedupPairs(s: SparkSession, d: String): DataFrame = {
    val v = vectors(s, d)
    embedCandidates(s, d).distinct()
      .join(v.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nsq").as("na")), "id_a")
      .join(v.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nsq").as("nb")), "id_b")
      .select("id_a", "ea", "na", "id_b", "eb", "nb")
  }

  /** q7H's REMOVED id set — every vec_id with a DETECTED smaller-id
    * near-dup (cosine ≥ 0.38) among its SimHash candidates. Two
    * exact-pass shapes behind a size gate
    * (`spark.graft.simhash.vecBroadcastLimit`, rows, default 1M ≈
    * 520 MB of dim-64 doubles + norms as a broadcast table; 0
    * disables — size the limit down for fatter embedding dims):
    *  - n ≤ limit: the RAW candidate stream flows map-side through two
    *    broadcast-hash vector refetches and the cosine filter — no
    *    pair-granularity exchange anywhere (the only shuffle left is
    *    the id-level distinct on the removal set, ~8 bytes per removed
    *    id). A pair colliding in several bands re-verifies the same
    *    cosine (bounded, cheap arithmetic) instead of paying a
    *    candidate-scale distinct shuffle first.
    *  - n > limit: distinct-first ([[embedDedupPairs]]) so each pair's
    *    vectors cross the wire exactly once — the honest distributed
    *    shape once the corpus no longer broadcasts.
    * Both paths produce the identical removal set (same candidate
    * stream, same exact filter; AnnSpec pins the equivalence).
    *
    * Under `dedupProbe=exact` (r15) neither shape runs: the removal set
    * is read straight off the q76/q77 block-grid survivors table
    * ([[simPairs]] — the at-threshold rows ARE the full exact near-dup
    * pair set, since q7H's 0.38 IS [[SimThreshold]]), so the cosine is
    * computed in-cell where the vectors already sit — no candidate
    * materialization, no refetch join — and the table is shared with
    * q76/q77. Policy → conf → plan is one closed loop: AnnSpec pins
    * that this removal set equals the brute-force removal set exactly.
    */
  def embedRemovedIds(s: SparkSession, d: String): DataFrame = {
    val probe = s.conf.get("spark.graft.simhash.dedupProbe", "single")
    if (probe == "exact")
      return simPairs(s, d).filter(col("sim") >= SimThreshold)
        .select(col("id_b").as("vec_id")).distinct()
    val v = vectors(s, d)
    val lim =
      s.conf.get("spark.graft.simhash.vecBroadcastLimit", "1000000").toLong
    val pairs =
      if (lim > 0 && simhashN(s, d) <= lim)
        embedCandidates(s, d)
          .join(broadcast(v.select(col("vec_id").as("id_a"),
            col("e").as("ea"), col("nsq").as("na"))), "id_a")
          .join(broadcast(v.select(col("vec_id").as("id_b"),
            col("e").as("eb"), col("nsq").as("nb"))), "id_b")
      else embedDedupPairs(s, d)
    pairs.filter(cosine("ea", "eb", "na", "nb") >= 0.38)
      .select(col("id_b").as("vec_id")).distinct()
  }

  /** Winnowing document fingerprints (q7E): hash every word 4-gram, then
    * keep each 8-window's minimum hash — the classic MOSS-style
    * selection: ~n/8 fingerprints per doc, guaranteed to share
    * fingerprints with any doc sharing a long-enough run. Per-row, no
    * shuffle until the caller aggregates; since r17 the whole selection
    * is ONE codegen'd pass ([[graft.functions.WinnowFp]] — the old
    * spelling ran six interpreted collection expressions per document,
    * kept below as [[WinnowSqlRef]] for the KernelSpec parity pin).
    * Public so FingerprintSpec can check set-level properties.
    */
  def fingerprints(s: SparkSession, d: String): DataFrame = {
    graft.functions.WinnowFp.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("graft_winnow_fp(split(text, ' '))").as("wfp"))
      .select(col("doc_id"), col("wfp.n_grams").as("n_grams"),
        col("wfp.fp").as("fp"))
  }

  /** Pre-r17 SQL spelling of the winnowing selection over a split-words
    * column `w` — the [[graft.functions.WinnowFp]] kernel's parity
    * reference (KernelSpec): yields `(grams, fp)`; `n_grams` is
    * `size(grams)`.
    */
  private[graft] val WinnowGramsSqlRef: String =
    """filter(
      |  zip_with(
      |    zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)), (a, b) -> concat(a, ' ', b)),
      |    zip_with(slice(w, 3, greatest(size(w) - 2, 0)),
      |             slice(w, 4, greatest(size(w) - 3, 0)), (c, e) -> concat(c, ' ', e)),
      |    (ab, ce) -> concat(ab, ' ', ce)),
      |  x -> x IS NOT NULL)""".stripMargin

  private[graft] val WinnowFpSqlRef: String =
    "array_distinct(transform(sequence(1, greatest(size(hashes) - 7, 1)), " +
      "i -> array_min(slice(hashes, i, 8))))"

  /** Dedup shuffle key: digest of the text, NOT the text itself — full
    * document bodies as shuffle keys would ship the whole corpus through
    * the exchange at 100 TB; 32 bytes per row do the same job.
    */
  private val dupW =
    Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    // exact dedup, survivor = min doc_id per text (deterministic keep-rule)
    "q70_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(dupW))
        .filter(col("rn") === 1)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // CDC-style latest event per (user, type) — the JDBC-upsert keep-rule
    "q71_dedup_latest" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.eventsUs(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts_us", "value")
        .orderBy("user_id", "event_type")
    }),

    // token frequencies, top-20
    "q72_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    // BPE-ish pre-tokenization (the "token counting" surface beyond
    // q72's whitespace split): the GPT-2-style pre-tokenizer regex —
    // contractions | space-prefixed letter runs | digit runs |
    // punctuation runs | space runs — with literal-space classes so the
    // Java and RE2 dialects agree. Top-20 pre-tokens by count.
    "q7I_tokenize_bpe" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(regexp_extract_all(col("text"),
          lit("'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"),
          lit(0))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    // top-20 bigrams: zip tokens with their own tail (zip_with pads the
    // short side with null → trailing null bigram filtered out)
    "q73_text_ngrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
        .select(explode(expr(
          "filter(zip_with(toks, slice(toks, 2, size(toks)), (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)),

    // TF-IDF top-10 (doc, term): tf ⋈ df ⋈ broadcast N, idf = ln((N+1)/(df+1)).
    // r17 kernel rewrite (the r16 q7O/q7V shape, guide §2.4): within-doc
    // term counts need no cross-row data, so tf computes IN-ROW via
    // graft_token_counts — the old explode → groupBy(doc_id, term)
    // corpus-scale exchange (shared by both branches via ReuseExchange,
    // the r5 finding) is DELETED outright. df counts tf's per-doc-
    // distinct rows per term: its partial agg collapses map-side to the
    // per-task term vocabulary, so the df exchange is vocab-scale; the
    // only corpus-scale exchange left is tf's own re-key by term for the
    // join (3 slim columns). The df branch re-runs the kernel explode
    // (one extra projected scan) — at 100 TB a second scan pass is the
    // cheaper side of shipping every distinct (doc, term) row through an
    // exchange, the same trade q7F documents. Values identical: kernel
    // (w, c) pairs ARE the per-doc counts (KernelSpec parity pin).
    "q74_text_tfidf" -> ((s, d) => {
      graft.functions.TokenCounts.register(s)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("graft_token_counts(split(text, ' '))")).as("tc"))
        .select(col("doc_id"), col("tc.w").as("term"), col("tc.c").as("tf"))
      val df = tf.groupBy("term")
        .agg(count(when(col("tf") > 0, true)).as("df"))
      val n = Tables.documents(s, d).agg(countDistinct(col("doc_id")).as("n"))
      tf.join(df, "term").join(broadcast(n))
        .withColumn("score", round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 4))
        .select("doc_id", "term", "score")
        .orderBy(col("score").desc, col("doc_id"), col("term"))
        .limit(10)
    }),

    // corpus profile per language
    "q75_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 4).as("avg_chars"),
          round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"))
        .orderBy("lang")),

    // exact cosine top-10 pairs (id_a < id_b): TakeOrderedAndProject over
    // the per-cell survivors of the block-partitioned exact kernel — the
    // global top-k is a subset of the per-cell top-k by construction
    "q76_sim_cosine_topk" -> ((s, d) =>
      simPairs(s, d)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(SimTopK)),

    // set-similarity join: all pairs at-or-above threshold, reusing the
    // same persisted sim table (round 1 recomputed the O(n²) pass here).
    // Invariant: the 0.38 threshold (and q76's top-10 cut) compares
    // 4-decimal-rounded cosines; it is safe only while no fixture pair's
    // true cosine sits within ~1e-12 of a .xxxx5 rounding boundary or
    // ~1e-9 of the threshold — re-verified on every test run by
    // SimGuardSpec, so a fixture refresh can't silently flip a row.
    "q77_sim_threshold" -> ((s, d) =>
      simPairs(s, d)
        .filter(col("sim") >= SimThreshold)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))),

    // 5-NN majority label for query vectors vec_id < 10 (self excluded).
    // Scale shape: the tiny query set is BROADCAST against the corpus
    // stream (each task scans its corpus partition once against all
    // queries — per-task input bounded by the partition size), and the
    // top-5 is taken in two phases — per (query, input partition) first,
    // so no window partition ever holds the whole corpus, then globally
    // over the ≤ 5·partitions survivors. Exact: the global top-5 under
    // the same total order survives any partitioning of phase 1. Growing
    // query sets don't fit this shape; that path is ANN (q7C/q7G).
    "q78_knn_label" -> ((s, d) => {
      val v = vectors(s, d)
      val q = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nsq").as("qn"))
      val cand = v.select(col("vec_id").as("n_id"), col("label"),
        col("e").as("ne"), col("nsq").as("nn"))
      val localW = Window.partitionBy(col("q_id"), col("part"))
        .orderBy(col("sim").desc, col("n_id"))
      val simW = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id"))
      val knn = broadcast(q).join(cand, col("q_id") =!= col("n_id"))
        .withColumn("sim", cosine("qe", "ne", "qn", "nn"))
        .withColumn("part", spark_partition_id())
        .select("q_id", "n_id", "label", "sim", "part")
        .withColumn("rn", row_number().over(localW))
        .filter(col("rn") <= 5)
        .withColumn("rn", row_number().over(simW))
        .filter(col("rn") <= 5)
      val votes = knn.groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      val voteW = Window.partitionBy(col("q_id"))
        .orderBy(col("votes").desc, col("label"))
      votes.withColumn("vr", row_number().over(voteW))
        .filter(col("vr") === 1)
        .select(col("q_id"), col("label").as("pred_label"), col("votes"))
        .orderBy("q_id")
    }),

    // multimodal: docs ⋈ embeddings with nested struct metadata, filtered
    // on a nested field, flattened for the oracle projection
    "q79_multimodal_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .withColumn("text_meta", struct(col("lang"), col("source"), col("n_chars")))
        .withColumn("vec_meta", struct(col("label"), size(col("embedding")).as("dim")))
        .filter(col("vec_meta.label") >= 5)
        .select(
          col("doc_id"),
          col("text_meta.lang").as("lang"),
          col("text_meta.source").as("source"),
          col("text_meta.n_chars").as("n_chars"),
          col("vec_meta.label").as("label"),
          col("vec_meta.dim").cast("long").as("dim"))
        .orderBy("doc_id")
    }),

    // multimodal asset pipeline (§2.10 q7B): media as an opaque binary
    // column + typed metadata struct. The "decode" step is a
    // deterministic fingerprint (sha2 over the bytes) standing in for
    // image/audio decoding — no media codecs ship in this container —
    // but the Spark-side plumbing is the real thing: binary column,
    // nested metadata, per-source aggregation, all codegen'd built-ins.
    // A real decoder plugs in as a mapPartitions over the same schema.
    "q7B_multimodal_pipeline" -> ((s, d) => {
      val assets = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          col("text").cast("binary").as("media"))
        .withColumn("meta", struct(
          octet_length(col("media")).as("n_bytes"),
          sha2(col("media"), 256).as("fingerprint")))
      assets.groupBy("source")
        .agg(
          count(lit(1)).as("n_assets"),
          round(avg(col("meta.n_bytes")), 4).as("avg_bytes"),
          countDistinct(col("meta.fingerprint")).as("nd_media"))
        .orderBy("source")
    }),

    // text quality scoring (§2.10 q7D): stopword share + lexical
    // diversity → composite score; the junk-filter stage of a training
    //-data pipeline. Everything stays in EXACT integer arithmetic (the
    // score is basis points via integer division) — averaging two
    // 4-decimal-rounded ratios lands exactly on .xxxx5 halves, which the
    // two engines round apart (SURVEY.md §7.4.3).
    "q7D_text_quality" -> ((s, d) =>
      withQualityStats(
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks")),
        "toks")
        .select("doc_id", "n_tokens", "stop_cnt", "distinct_cnt", "score_bp")
        .orderBy(col("score_bp").desc, col("doc_id"))
        .limit(25)),

    // near-dup pairs via MinHash + LSH banding — the 100 TB dedup path.
    // A doc's shingles are already one array per row, so the signature is
    // computed IN-ROW by the codegen'd graft_minhash_row expression — no
    // explode inflation, no aggregation shuffle (round 2's explode→UDAF
    // shape was the 20.7 s bench hog; the UDAF in functions/MinHash.scala
    // remains the documented multi-row/streaming path). Then band the
    // signature into 32 buckets of 2 → equi-join on (band, band_hash) →
    // exact-Jaccard verify of the candidates only. No all-pairs product
    // anywhere. Hash-seed-specific candidates → rows-only check (no SQL
    // oracle); property-tested vs exact Jaccard in MinHashSpec.
    "q7A_dedup_minhash" -> ((s, d) => {
      MinHash.register(s)
      SortedIntersect.register(s)
      val sets = shingled(s, d)
      val nBands = MinHash.K / 2
      // docs with EMPTY shingle sets (fewer than 3 words) must be
      // excluded BEFORE banding: the in-row signature of an empty set is
      // all-Long.MaxValue, identical for every such doc, so they would
      // all collide in every band — one hot bucket, quadratic self-join.
      // (The old explode→UDAF shape excluded them implicitly: an empty
      // array explodes to zero rows.)
      val sig = sets
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id"), expr("graft_minhash_row(shingles)").as("sig"))
      val bands = sig
        .select(col("doc_id"), explode(expr(bandSql(nBands))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      val sa = sets.select(col("doc_id").as("id_a"), col("shingles").as("sa"))
      val sb = sets.select(col("doc_id").as("id_b"), col("shingles").as("sb"))
      cand.join(sa, "id_a").join(sb, "id_b")
        // graft_isect_sorted over the pre-sorted shingle sets (the q7N
        // verify kernel); |a ∪ b| = |a| + |b| − |a ∩ b| for the distinct
        // sets, so the value is identical to the array_intersect/
        // array_union spelling it replaces, minus the per-row interpreted
        // hash sets. The EXACT kernel, not the ge early-exit one: q7A's
        // declared filter is on the ROUNDED jaccard (≥ 0.6 at 4 dp), and
        // an exact-threshold early exit would drop a pair in the
        // half-ulp band the rounding admits.
        .withColumn("inter", expr("graft_isect_sorted(sa, sb)"))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")), 4))
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }),

    // document fingerprinting (§2.10 q7E): winnowing selection over
    // rolling word-4-gram hashes — see [[fingerprints]]. Rows-only
    // check (xxhash64 is engine-specific); properties in FingerprintSpec.
    "q7E_doc_fingerprint" -> ((s, d) =>
      fingerprints(s, d)
        .select(
          col("doc_id"),
          col("n_grams"),
          size(col("fp")).as("n_fingerprints"),
          array_min(col("fp")).as("min_fp"))
        .orderBy("doc_id")),

    // language-ID (§2.10 q7F): n-gram-heuristic classifier as one
    // distributed DAG — learn a top-20 char-bigram profile per labeled
    // lang, score every doc by profile overlap (broadcast-sized profile
    // table), predict the argmax lang, and emit the confusion matrix.
    // The fixture's lang labels are random w.r.t. its word-salad text,
    // so ACCURACY is chance — the operator under test is the scalable
    // train→infer→evaluate pipeline shape, and the oracle checks it
    // end-to-end. Ties: profile by (count desc, bigram), prediction by
    // (score desc, lang) — deterministic on both engines.
    //
    // The profile statistic is DOCUMENT frequency (per-doc-distinct
    // bigrams), not raw term frequency: both the learn and the score
    // branch explode the same in-row distinct bigram set (the kernel
    // dedups in its one pass) — a fraction of the raw bigram volume
    // (round 2 exploded every occurrence for the learn branch, which
    // made q7F the biggest bench entry) — and df is the better-behaved
    // statistic under doc-length skew anyway. Per-doc distinct stays
    // IN-ROW; a global DISTINCT would shuffle every (doc, bigram)
    // occurrence.
    //
    // Bigram extraction is the graft_bigrams codegen kernel (round 13;
    // [[graft.functions.Bigrams]], KernelSpec-pinned against the old
    // five-expression SQL spelling [[BigramSqlRef]]) — one byte-level
    // pass per doc, ~0.7 s off the sf0.1 wall.
    //
    // TWO corpus explodes, ZERO corpus-sized shuffle (round 13 —
    // reverting round 11's shared-exchange shape WITH MEASUREMENTS):
    // r11 fused the profile and predict branches onto one distinct
    // (doc, lang, bg) count exchange so ReuseExchange could dedupe the
    // explode. That exchange is CORPUS-sized — every distinct (doc,
    // bigram) pair crosses the wire — and it is exactly what made q7F
    // drift 2.29→2.74 s (r10→r11, the r12 verdict's top triage item).
    // The branch-local shapes shuffle almost nothing instead: the
    // profile branch collapses map-side to (lang, bg) partial counts
    // (≲ langs × |bigram vocab| rows per partition), and the predict
    // branch broadcast-joins the 20-per-lang profile onto the exploded
    // rows and partial-aggregates straight to (doc, lang, cand) —
    // docs × ≤langs rows. Measured at sf0.1 (warm, paired A/B): 0.81 s
    // vs 1.31 s for the one-pass shape with the same kernel. At 100 TB
    // the trade is one extra projected column scan vs shuffle-writing +
    // shipping + shuffle-reading the whole distinct-bigram corpus —
    // the scan is the cheaper side of that by construction. PlanSpec
    // pins the shape: no exchange carries (doc_id, …, bg) rows.
    "q7F_lang_id" -> ((s, d) => {
      graft.functions.Bigrams.register(s)
      val docBg = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(expr(BigramSql)).as("bg"))
      val prof = langProfileTop(docBg.select("lang", "bg"), 20)
        .select(col("lang").as("cand"), col("bg"))
      // r17 A/B note (kept the window): replacing the per-doc argmax
      // rank window with a two-level min_by(cand, (-score, cand))
      // aggregation — equal values by construction — MEASURED SLOWER in
      // an interleaved same-JVM A/B at sf0.1 (min 1.61 s vs 1.09 s over
      // 4 alternating reps): the extra aggregation level adds an
      // exchange of struct-ordered partial states whose per-row struct
      // allocation + comparison costs more than the one rank sort it
      // deletes. The window shape stands.
      val predW = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand"))
      docBg.join(broadcast(prof), "bg")
        .groupBy(col("doc_id"), col("lang"), col("cand"))
        .agg(count(lit(1)).as("score"))
        .withColumn("rn", row_number().over(predW))
        .filter(col("rn") === 1)
        .groupBy(col("lang"), col("cand").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    }),

    // bucketed ANN (§2.10 q7C) — the scale path for similarity SEARCH
    // (q7A covers near-dup dedup): random-hyperplane SimHash splits
    // bands·bits sign bits into `bands` LSH bands — the n-scaled
    // geometry of [[simhashGeom]]; query and candidate meet
    // via an equi-join on (band, band_value) — never a cross join — and
    // only bucket-mates get the exact cosine rerank. Bucket membership is
    // hash-construction-specific → rows-only check; recall vs the exact
    // 5-NN is asserted in AnnSpec.
    "q7C_ann_simhash" -> ((s, d) => {
      val v = vectors(s, d)
      val (_, bits) = simhashGeom(s, d)
      val banded = embedBanded(s, d)
      // multi-probe (Lv et al., VLDB'07): each QUERY also probes the
      // `bits` Hamming-distance-1 buckets of every band — a near miss
      // that flips one sign bit still meets its neighbors. Query-side
      // only ((bits+1)× rows on the tiny probe set), the corpus side
      // keeps one bucket per band per vector — the published way to buy
      // recall without multiplying corpus-side index rows the way more
      // bands would. Measured (4,4): fixture recall@5 0.46 → 0.92
      // (AnnSpec floor 0.85), clustered Scale corpora 0.92 → 1.00.
      val probes = banded.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("band"),
          explode(array(col("bval") +: (0 until bits).map(k =>
            col("bval").bitwiseXOR(lit(1 << k))): _*)).as("bval"))
      // id-only band join (r14): the corpus side ships (n_id, band,
      // bval), never the embedding (r13 measured the vector-carrying
      // join at 51 GB shuffle / ENOSPC at the 50M decade) — and the
      // probe side is ≤ 10·bands·(bits+1) rows, so the hint keeps the
      // bucket meet a broadcast join: the corpus side never shuffles.
      val cands = banded.select(col("vec_id").as("n_id"), col("band"),
        col("bval"))
      val hits = cands.join(broadcast(probes), Seq("band", "bval"))
        .filter(col("q_id") =!= col("n_id"))
        .select("q_id", "n_id")
        .distinct() // a pair can collide in several bands/probes
      // exact pass: refetch the ~|q|·bands·(bits+1)·occupancy shortlist
      // vectors by id — the SHORTLIST broadcasts (bounded by the probe
      // budget, ids only) so the corpus-side vector scan never
      // shuffles; the 10 query vectors broadcast onto the result
      val q = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("qe"),
          col("nsq").as("qn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      v.select(col("vec_id").as("n_id"), col("e").as("ne"),
          col("nsq").as("nn"))
        .join(broadcast(hits), "n_id")
        .join(broadcast(q), "q_id")
        .select(col("q_id"), col("n_id"),
          cosine("qe", "ne", "qn", "nn").as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("q_id", "n_id", "sim", "rn")
        .orderBy("q_id", "rn")
    }),

    // embedding-cosine near-dup DEDUP (§2.10 q7H) — the survivors
    // operator completing the dedup family: q77 finds the near-dup PAIRS
    // by declared-exact brute force; this returns the KEPT corpus at
    // scale. SimHash bands (q7C's n-scaled [[simhashGeom]] construction,
    // id-only candidate join + vector refetch — r14) bucket the
    // candidates, only bucket-mates get the exact cosine check, and the
    // standard one-pass rule removes every vector with a DETECTED
    // near-dup (cosine ≥ 0.38) of smaller vec_id — deterministic,
    // parallel, no iterative union-find; transitive over-removal is the
    // declared trade, exactly as in production LSH dedup. Bucket
    // membership is hash-construction-specific → rows-only check;
    // soundness (every removal justified by an exact pair) and recall vs
    // the exact removal set are asserted in AnnSpec.
    "q7H_dedup_embed" -> ((s, d) => {
      val v = vectors(s, d)
      val removed = embedRemovedIds(s, d)
      v.join(removed, Seq("vec_id"), "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    }),

    // IVF ANN (§2.10 q7G) — the coarse-quantizer similarity scale path,
    // complementing q7C: SimHash buckets are data-INdependent, IVF cells
    // adapt to the data distribution. The quantizer ([[ivfModel]]) trains
    // MLlib-KMeans-style: centroids live on the driver as model metadata,
    // so cell assignment is a per-row in-row argmax against a literal
    // centroid array — no crossJoin, no assignment shuffle anywhere.
    // Queries probe their ~√K nearest cells ([[ivfNProbe]], picked
    // in-row the same way), candidates meet by EQUI-join on cell id, and
    // only cell-mates get the exact cosine rerank — never a cross join
    // over the corpus. K itself is data-driven ≈√n (see [[ivfModel]]).
    // Centroid-construction-specific output → rows-only check; exactness
    // of reported sims + recall@5 vs the exact 5-NN are asserted in
    // AnnSpec.
    "q7G_ann_ivf" -> ((s, d) => {
      val v = vectors(s, d)
      val (cents, index) = ivfModel(s, d)
      // probes: per-query top-nprobe cells picked IN-ROW by the codegen'd
      // graft_ivf_top kernel (cs desc, cid asc on ties) — no crossJoin,
      // no window exchange
      val probes = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("qe"),
          col("nsq").as("qn"),
          explode(ivfProbeIdx(s, cents, col("e"))).as("pidx"))
        .select(col("q_id"), col("qe"), col("qn"),
          cidOfIdx(cents, col("pidx")).as("cid"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      // each candidate lives in exactly one cell, so a (q, n) pair can
      // meet at most once — no distinct needed (unlike q7C's bands)
      probes.join(index, "cid")
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          cosine("qe", "ne", "qn", "nn").as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("q_id", "n_id", "sim", "rn")
        .orderBy("q_id", "rn")
    }),

    // IVF-PQ ANN (§2.10 q7S) — q7G's coarse quantizer + product-
    // quantized RESIDUALS (IVF-ADC, Jégou/Douze/Schmid TPAMI 2011): the
    // serving index stores each vector as its IVF cell + m SMALL-INT
    // residual codes + the exact norm instead of dim floats — the 100 TB
    // memory/IO story (64 doubles → 8 codes: the candidate join shuffles
    // ~1/32 the bytes). Probing is q7G's in-row kernel; candidates meet
    // by EQUI-join on cell id and rank by dot(q, centroid) — exact, one
    // per probed cell — plus the codegen'd asymmetric-distance kernel
    // over the residual codes (norms exact; only the residual term is
    // approximate). The top-R shortlist alone refetches full vectors
    // (broadcast of |q|·R rows against the corpus scan) for the exact-
    // cosine rerank, so reported sims are EXACT and approximation
    // affects only which candidates get reranked. Centroid/codebook-
    // specific → rows-only check; recall + sim-exactness vs the brute-
    // force 5-NN in AnnSpec, kernel parity in KernelSpec.
    "q7S_ann_ivfpq" -> ((s, d) => pqSearch(s, d, pqIndex(s, d))),

    // deterministic train/val/test split (§2.10 q7J) — every training
    // pipeline's first op after dedup. The bucket comes from an
    // engine-portable LCG on doc_id (NOT xxhash64: the oracle engine must
    // reproduce the split bit-exactly, and no two engines share a hash),
    // taking the HIGH bits (low LCG bits cycle). A pure per-row
    // projection: no shuffle, no state, any executor count — the split
    // of a row never depends on any other row.
    "q7J_split_hash" -> ((s, d) => {
      val bucket =
        expr("(pmod(pmod(doc_id, 2147483648) * 1103515245 + 12345, 2147483648) * 100) div 2147483648")
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, lit("train"))
            .when(bucket < 90, lit("val")).otherwise(lit("test")))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang", "split")
    }),

    // fixed-budget sequence packing (§2.10 q7K): docs pack into
    // 2048-token chunks within their (lang, source) shard in doc_id
    // order; a doc's chunk = tokens-before-it div budget. Pack-WITHIN-
    // shard is the 100 TB shape: shards pack independently in parallel
    // (the running-sum window never spans shards), exactly how training
    // pipelines pack per input file.
    "q7K_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("chunk", expr("(cum - tokens) div 2048"))
        .groupBy("lang", "source", "chunk")
        .agg(count(lit(1)).as("n_docs"), sum("tokens").as("chunk_tokens"))
        .orderBy("lang", "source", "chunk")
    }),

    // weighted corpus mixing (§2.10 q7L): interleave languages at fixed
    // ratios (en 4 : de 2 : fr 2 : es 1 : zh 1) — the domain-mixing op
    // that decides training-data order. Doc k (0-based) of a weight-w
    // corpus gets virtual time k/w, spelled ((rn-1)*840) div wt so it
    // stays in exact integer arithmetic (840 = any common multiple of
    // the weights); the global head is TakeOrderedAndProject, never a
    // full sort. The per-corpus rank is NOT a per-lang window (5 langs =
    // 5 tasks carrying the whole corpus at 100 TB) but the shared
    // [[Ranks.rowNumber]] distributed rank — bit-identical to
    // row_number() OVER (PARTITION BY lang ORDER BY doc_id).
    "q7L_mix_weighted" -> ((s, d) => {
      val buckets = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val ranked = Ranks.rowNumber(
        Tables.documents(s, d).select(col("lang"), col("doc_id")),
        Seq("lang"), col("doc_id"), Nil, buckets, "rn")
      ranked
        .withColumn("wt",
          when(col("lang") === "en", 4L)
            .when(col("lang").isin("de", "fr"), 2L).otherwise(1L))
        .withColumn("mix_key", expr("((rn - 1) * 840) div wt"))
        .select("mix_key", "lang", "doc_id")
        .orderBy("mix_key", "lang", "doc_id")
        .limit(100)
    }),

    // deterministic stratified sample (§2.10 q7M): a fixed-size
    // per-stratum sample in portable-LCG order (same generator as q7J,
    // same cross-engine argument) — eval-set construction that any
    // engine reproduces byte-for-byte. The rank-≤-k window filter is the
    // q62 shape: Spark's WindowGroupLimit pushes the per-group limit
    // below the exchange, so each map task forwards at most k rows per
    // group it sees — never a full per-stratum sort of the corpus.
    "q7M_sample_stratified" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h",
          expr("pmod(pmod(doc_id, 2147483648) * 1103515245 + 12345, 2147483648)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rn")
    }),

    // EXACT n-gram Jaccard near-dup pairs (§2.10 q7N): word-3-shingle
    // sets, Jaccard ≥ 3/5, via the prefix-filtering set-similarity join
    // (the published AllPairs/PPJoin design) — exact like q77 but NEVER
    // all-pairs: a doc only meets docs sharing one of its rarest
    // shingles. (1) one corpus pass computes each shingle's document
    // frequency — the canonical rare-first total order; (2) each doc
    // keeps only its (sz - ceil(τ·sz) + 1)-prefix under that order
    // (PPJoin Lemma 1: any pair at Jaccard ≥ τ shares a prefix token —
    // candidate generation is provably complete, JaccardSpec re-proves
    // it against a brute-force model); (3) candidates meet on a shingle
    // EQUI-join (inverted index), pre-trimmed by the size filter
    // 3·max(sa,sb) ≤ 5·min(sa,sb) and the PPJoin POSITIONAL filter;
    // (4) survivors verify in-row with the codegen'd graft_isect_ge_sorted
    // sorted-merge walk. Join keys are 3-shingles and ids, never document
    // bodies; per-task input is bounded by prefix-token frequency, not
    // by n. All arithmetic is integer (τ = 3/5; jac_bp = basis points by
    // integer division) so both engines agree bit-for-bit (§7.4.3).
    // Body in [[jaccardPairs]] — q7R builds its dedup clusters from the
    // same pair table.
    "q7N_dedup_jaccard" -> ((s, d) =>
      jaccardPairs(s, d)
        .orderBy(col("jac_bp").desc, col("id_a"), col("id_b"))),

    // repetition-based quality filter (§2.10 q7O): the published
    // Gopher-style repetition rules — top-token fraction and duplicate-
    // bigram fraction — as exact integer basis points, rolled up per
    // lang with a keep verdict (top ≤ 1400 bp AND dup-2gram ≤ 650 bp;
    // the p90s of this corpus, so the filter genuinely splits it).
    // r16 kernel rewrite: per-doc token counts compute IN-ROW
    // (graft_token_counts — within-doc counting needs no cross-row
    // data), deleting the old explode → groupBy(doc_id, w) exchange
    // whose row count tracked distinct (doc, token) volume; what
    // shuffles now is one already-per-doc-collapsed aggregate. Bigram
    // stats are the one-pass graft_bigram_stats kernel (was an
    // interpreted five-collection HOF). All arithmetic integer
    // (§7.4.3), both engines bit-agree.
    "q7O_quality_repetition" -> ((s, d) => {
      graft.functions.TokenCounts.register(s)
      graft.functions.BigramStats.register(s)
      val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        split(col("text"), " ").as("toks"))
      val tokStats = t
        .select(col("doc_id"),
          explode(expr("graft_token_counts(toks)")).as("tc"))
        .groupBy("doc_id").agg(
          max(col("tc.c")).as("topc"),
          sum(col("tc.c")).as("n_tokens"))
      val biStats = t
        .select(col("doc_id"), col("lang"),
          expr("graft_bigram_stats(toks)").as("bs"))
        .select(col("doc_id"), col("lang"),
          col("bs.nbg").as("nbg"), col("bs.dbg").as("dbg"))
      tokStats.join(biStats, "doc_id")
        .withColumn("top_bp", expr("(topc * 10000L) div n_tokens"))
        .withColumn("dup2_bp", expr(
          "IF(nbg = 0, CAST(0 AS BIGINT), ((nbg - dbg) * 10000L) div nbg)"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("top_bp") <= 1400 && col("dup2_bp") <= 650, 1L)
            .otherwise(0L)).as("n_kept"),
          max(col("top_bp")).as("max_top_bp"),
          max(col("dup2_bp")).as("max_dup2_bp"))
        .orderBy("lang")
    }),

    // eval-set decontamination (§2.10 q7P): which training documents
    // leak n-gram content of the held-out eval suite — the overlap
    // check every published pretraining pipeline runs before training.
    // Eval = doc_id < 50 (a fixed benchmark suite), train = the rest;
    // overlap = shared word-3-shingles (the q7A/q7N shingle unit, same
    // cached table). The eval side is BROADCAST: an eval suite is
    // fixed-size by nature (it does not grow with the corpus), so the
    // train side — the 100 TB side — streams map-only: explode, hash
    // against the broadcast index, partial-agg the pair counts. No
    // shuffle of corpus volume, no all-pairs anything.
    "q7P_decontaminate" -> ((s, d) => {
      val sh = shingled(s, d).filter(size(col("shingles")) >= 1)
      val ev = sh.filter(col("doc_id") < 50)
        .select(col("doc_id").as("eval_id"), explode(col("shingles")).as("g"))
      val tr = sh.filter(col("doc_id") >= 50)
        .select(col("doc_id").as("train_id"), explode(col("shingles")).as("g"))
      tr.join(broadcast(ev), "g")
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("train_id"), col("eval_id"))
        .limit(25)
    }),

    // one BPE training step (§2.10 q7Q): the top-20 adjacent character
    // pairs that the first merge of byte-pair-encoding tokenizer
    // training would consider. The published trick that makes BPE
    // trainable at corpus scale is exactly this shape: collapse the
    // corpus to a (word, count) table first — pair counting then runs
    // over DISTINCT words weighted by count, a table bounded by
    // vocabulary, not corpus volume. Pair extraction is the linear
    // zip_with-shift (q7F's bigram kernel); all counts integer.
    "q7Q_bpe_merge_step" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy("word").agg(count(lit(1)).as("wc"))
      wc.select(col("wc"), explode(expr(
          """filter(zip_with(split(word, ''),
            |              slice(split(word, ''), 2, length(word)),
            |              (a, b) -> concat(a, ' ', b)),
            |       x -> x IS NOT NULL)""".stripMargin)).as("pair"))
        .groupBy("pair").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    }),

    // full BPE tokenizer TRAINING (§2.10 q7T): the iterative loop whose
    // single step q7Q exposes — N merge decisions over the
    // vocab-bounded (word, count) table, two jobs per step, lineage cut
    // per step (see graft.operators.BpeTrain). Output = the learned
    // merge table (the tokenizer artifact), deterministic under the
    // (count desc, pair asc) tie rule → rows-only check; step-exact
    // parity vs a reference Scala implementation and vs q7Q's top pair
    // in BpeTrainSpec.
    "q7T_bpe_train" -> ((s, d) => BpeTrain.trained(s, d)),

    // BPE tokenizer APPLY (§2.10 q7U): the corpus tokenized with q7T's
    // trained merges, as top-25 token frequencies. The merge list is
    // cached metadata (shared with q7T per session — the q7G/q7S cache
    // shape), so applying is one corpus scan to rebuild the weighted
    // word table + ONE vocab-bounded pass: all N greedy folds chain in
    // a single projection and token counts are a wc-weighted explode —
    // no per-step jobs (see BpeTrain.tokenized).
    // Trainer-derived output → rows-only check; reference-tokenizer
    // parity in BpeTrainSpec.
    "q7U_bpe_tokenize" -> ((s, d) => BpeTrain.tokenized(s, d)),

    // unigram-LM quality score (§2.10 q7V): the LM-perplexity quality
    // filter (Wenzek et al., CCNet) re-expressed with a corpus-trained
    // unigram model — per doc, the mean cross-entropy -ln p(w) of its
    // tokens under corpus unigram frequencies. Rare-token soup scores
    // HIGH, boilerplate scores LOW; published pipelines keep the middle
    // of the distribution. r16 kernel rewrite (the Pipeline quality
    // shape): per-doc (token, tf) pairs compute IN-ROW via
    // graft_token_counts — the old explode → groupBy(doc, lang, w)
    // corpus-scale exchange is gone; the frequency table aggregates
    // its OWN explode (the one irreducible global-vocabulary shuffle),
    // joins back on the token, and the corpus total is an in-row sum
    // broadcast as one row. ROUND(…,4) on the one double aggregate per
    // §7.4.3.
    "q7V_quality_unigram_ce" -> ((s, d) => {
      graft.functions.TokenCounts.register(s)
      val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        split(col("text"), " ").as("toks"))
      val tf = t
        .select(col("doc_id"), col("lang"),
          explode(expr("graft_token_counts(toks)")).as("tc"))
        .select(col("doc_id"), col("lang"),
          col("tc.w").as("w"), col("tc.c").as("tf"))
      val freq = t.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      // r17 (guide §2.4): the total re-aggregates FREQ (Σ c ≡ Σ |toks|
      // exactly — integer counts) instead of re-scanning the corpus; the
      // second reference to freq shares its shuffle via ReuseExchange
      // (both subtrees end at the canonical-equal vocab exchange — the
      // r5 q74 finding), so only a vocab-scale re-aggregation runs twice
      // and the corpus is scanned twice, not three times.
      // coalesce: NULL on an empty corpus (r16 what's-wrong #1)
      val total = freq.agg(
        coalesce(sum(col("c")), lit(0L)).cast("long").as("n"))
      tf.join(freq, "w").crossJoin(broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
          sum(col("tf")).as("n_tokens"),
          round(sum(col("tf") * -log(col("c") / col("n"))) /
            sum(col("tf")), 4).as("ce_nats"))
        .orderBy(col("ce_nats").desc, col("doc_id"))
        .limit(25)
    }),

    // duplicated-span coverage (§2.10 q7W): the per-document substring-
    // dedup SIGNAL (Lee et al. 2022, "Deduplicating Training Data Makes
    // Language Models Better") — what fraction of a doc's word-3-shingle
    // spans also occurs in some OTHER document. q7N answers "which PAIRS
    // are near-dups"; this answers "how much of THIS doc exists
    // elsewhere" — the score that drops boilerplate-heavy docs even when
    // no single pair crosses the Jaccard threshold. Reuses the cached
    // sorted-shingle table (shared with q7A/q7N/q7P); doc frequency
    // aggregates DISTINCT (doc, shingle) pairs (shingled() is per-doc
    // distinct, so count(*) per shingle IS its doc frequency), and the
    // join back is one equi-join on the shingle — never all-pairs.
    // All-integer output (§7.4.3).
    "q7W_dedup_spans" -> ((s, d) => {
      val tok = shingled(s, d).filter(size(col("shingles")) >= 1)
        .select(col("doc_id"), explode(col("shingles")).as("g"))
      val dfreq = tok.groupBy("g").agg(count(lit(1)).as("df"))
      tok.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_bp", expr("(n_dup * 10000L) div n_shingles"))
        .select("doc_id", "n_shingles", "n_dup", "dup_bp")
        .orderBy(col("dup_bp").desc, col("doc_id"))
        .limit(25)
    }),

    // near-dup CLUSTERS (§2.10 q7R): connected components over the
    // exact Jaccard pair graph ([[jaccardPairs]]) — the step that turns
    // pairwise matches into dedup groups (keep one representative per
    // component). Alternating large-star/small-star contraction
    // ([[connectedComponentsWithRounds]]): O(log n) rounds on ANY graph
    // shape, one Spark job per round. The round-6 min-label propagation
    // this replaces needed O(graph-diameter) rounds — O(n) on the
    // chain-shaped graphs near-dup corpora actually produce — plus a
    // SEPARATE driver isEmpty join per round just to detect convergence
    // (31 s at sf0.1, 36 % of the whole bench). The fixpoint (every node
    // edged to its component's minimum doc_id) is unique and
    // deterministic, and a recursive-CTE oracle checks it exactly.
    "q7R_dedup_components" -> ((s, d) => componentSizes(s, d))
  )

  /** Caches q7R's converged star-edge table per (session, sfDir) — the
    * loop materializes per-round persists, and the final table must
    * outlive the lambda (the caller runs its action after we return).
    * Released with the other caches in [[release]].
    */
  private val ccCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), Cached]

  /** One large-star round: connect every strictly-LARGER neighbor of u to
    * m = min(Γ(u) ∪ {u}). Every input edge is owned (and rewritten) by
    * exactly one group — its smaller endpoint's — so connectivity is
    * preserved while long paths halve. min(v) partial-aggregates
    * map-side (a hub node's group never ships its raw neighbor list to
    * one task, unlike a window over the same key), and AQE's skew split
    * covers the join-back on a hot u.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round: orient every edge larger→smaller, then within
    * each node's smaller-neighborhood connect everything (plus the node
    * itself) to the minimum — the contraction step that collapses the
    * shallow trees large-star leaves behind.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val o = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = o.groupBy("u").agg(min(col("v")).as("m"))
    o.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    * O(log n) rounds on any graph — a chain that took the round-6
    * min-label propagation O(n) rounds converges in ~log₂ n here
    * (CcSpec pins the bound). Each round runs exactly ONE job: the
    * action that materializes the new edge table also computes the
    * convergence statistic, via a left join against the persisted
    * previous table — `matched == |next|` means next ⊆ cur, and with
    * `|next| == |cur|` and both sides distinct that is set equality, the
    * EXACT fixpoint test (no separate isEmpty job, no hash heuristics).
    * At the fixpoint the edge set is a union of stars (child →
    * component-minimum root), so representatives and sizes read straight
    * off the final table.
    *
    * Input: undirected distinct edges (u, v), u ≠ v. Returns the
    * persisted star-edge table and the number of rounds run (the last
    * round is the no-op that proves convergence).
    */
  private[graft] def connectedComponentsWithRounds(
      edges0: DataFrame): (DataFrame, Int) = {
    val s = edges0.sparkSession
    // LINEAGE CUT, load-bearing: each round's plan must be rooted at the
    // previous round's materialized RDD, not its logical plan. The star
    // operators reference their input ~12× (union + self-join on both
    // stars), so building round r's plan over round r-1's PLAN grows the
    // logical tree 12^r — the analyzer, not the data, becomes the
    // bottleneck (the first cut of this loop OOM'd the driver rendering
    // an explain string at round 9 on a 512-node chain). persist() alone
    // does NOT cut lineage — CacheManager substitutes the cached scan at
    // physical planning, but analysis still walks the full tree.
    // createDataFrame(df.rdd, schema) is the public-API cut: the new
    // plan is a flat RDD scan, the Row round-trip is 2 longs/row inside
    // executor tasks, and the persisted blocks stay CacheManager-tracked
    // so the per-round unpersist still frees them.
    def reRoot(df: DataFrame): DataFrame =
      s.createDataFrame(df.rdd, df.schema)
    var cur = reRoot(edges0).persist(StorageLevel.MEMORY_AND_DISK)
    var curCnt = cur.count()
    var rounds = 0
    var converged = curCnt == 0L
    while (!converged) {
      rounds += 1
      val next = reRoot(smallStar(largeStar(cur)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val stats = next
        .join(cur.select(col("u"), col("v"), lit(1).as("hit")),
          Seq("u", "v"), "left")
        .agg(count(lit(1)).as("n"), count(col("hit")).as("matched"))
        .head()
      val nextCnt = stats.getLong(0)
      converged = stats.getLong(1) == nextCnt && nextCnt == curCnt
      cur.unpersist()
      cur = next
      curCnt = nextCnt
    }
    (cur, rounds)
  }

  /** q7R's converged star-edge table `(u = child, v = component root)`,
    * one row per NON-root member — cached per (session, sfDir). Shared
    * with [[Pipeline]]'s dedup stage: survivors are exactly the docs
    * absent from `u` (roots + singletons), so the composed pipeline and
    * the q7R registry entry contract the SAME graph once per session.
    */
  private[graft] def componentStars(s: SparkSession, d: String): DataFrame =
    cachedDf(ccCache, s, d) {
      starsFromEdges(s, jaccardPairs(s, d)
        .select(col("id_a").as("u"), col("id_b").as("v")))
    }

  /** The banded twin of [[componentStars]] (VERDICT r16 #2): the same
    * star contraction (same local-union-find gate) over
    * [[bandedJaccardPairs]] — the composed pipeline's
    * `dedupMode=banded` stage-1 graph. Cached per (session, sfDir)
    * beside the exact one; released together.
    */
  private[graft] def bandedComponentStars(s: SparkSession, d: String): DataFrame =
    cachedDf(bandedCcCache, s, d) {
      // the pair table is consumed only by this build (probe collect,
      // then either the local union-find or the round-materialized
      // loop), so its persist is build-local, the dfreq convention —
      // nothing session-scoped to leak
      val pairs = bandedJaccardPairs(s, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try starsFromEdges(s,
        pairs.select(col("id_a").as("u"), col("id_b").as("v")))
      finally pairs.unpersist(blocking = false)
    }

  private val bandedCcCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), Cached]

  /** q7A's MinHash-LSH candidate stage VERIFIED at q7N's exact
    * threshold (word-3-shingle Jaccard ≥ 3/5): the banded near-dup edge
    * set. Banding only PRUNES — a pair reaches verify only when one of
    * the 32 bands' 2-slot signatures collides — and verify applies the
    * same exact predicate as [[jaccardPairs]] (the threshold-aware
    * graft_isect_ge_sorted walk), so banded edges ⊆ exact edges.
    * Consequence (BandedDedupSpec pins both directions): banded
    * components REFINE exact components, every banded component's min
    * is ≥ its enclosing exact component's min, so the banded dedup may
    * KEEP an extra near-dup (missed band ⇒ missed edge) but never
    * drops a doc the exact dedup keeps — the safe failure direction
    * for a training corpus. The 100 TB trade: the exact PPJoin's
    * candidate join grew 8.1× per 4× docs and was 74% of the composed
    * wall at 5M docs (SCALE_r16); the band equi-join's candidate count
    * follows collision geometry, not prefix overlap.
    */
  private[graft] def bandedJaccardPairs(s: SparkSession, d: String): DataFrame = {
    MinHash.register(s)
    SortedIntersect.register(s)
    // empty shingle sets out BEFORE banding (the q7A lesson): an empty
    // set's in-row signature is all-Long.MaxValue — one hot bucket in
    // every band, a quadratic self-join
    val sets = shingled(s, d).filter(size(col("shingles")) >= 1)
    val nBands = MinHash.K / 2
    val sig = sets.select(col("doc_id"),
      expr("graft_minhash_row(shingles)").as("sig"))
    val bands = sig
      .select(col("doc_id"), explode(expr(bandSql(nBands))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("shingles").as("ga")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("shingles").as("gb")), "id_b")
      .withColumn("inter", expr("graft_isect_ge_sorted(ga, gb, 3, 5)"))
      .filter(col("inter") >= 0)
      .select("id_a", "id_b")
  }

  /** Star-edge fixpoint over an arbitrary `(u, v)` edge table — the
    * body [[componentStars]] and [[bandedComponentStars]] share.
    */
  private def starsFromEdges(s: SparkSession, edges: DataFrame): DataFrame = {
      // r13 fast path, the third application of the driver-local-below-
      // a-budget argument (BPE merges, then the quantizers): the edge
      // set is the near-dup SURVIVOR pairs — a vanishing fraction of the
      // corpus at any scale — so below the gate the O(log n) rounds of
      // driver-blocking jobs were pure scheduling over a table the
      // driver can hold (two longs per edge). One LIMIT-probing collect
      // doubles as the gate test AND the data fetch; union-find with
      // smaller-root-wins links lands every find() on the component
      // minimum, which is EXACTLY the star fixpoint the distributed loop
      // converges to — bit-identical output (CcSpec pins cross-path
      // set equality), so unlike the quantizer gate this one does not
      // need to key the cache. Above the gate the loop is unchanged
      // (every Scale decade measures the distributed path).
      val lim = localCcLimit(s)
      val probed =
        if (lim > 0) {
          // lim is an Int conf, so lim + 1 at Int.MaxValue would wrap
          // the LIMIT negative (ADVICE r13) — clamp the probe
          val rows = edges.limit(
            (math.min(lim.toLong, Int.MaxValue - 1L) + 1).toInt).collect()
          if (rows.length <= lim)
            Some(rows.map(r => (r.getLong(0), r.getLong(1))))
          else None
        } else None
      probed match {
        case Some(arr) =>
          import s.implicits._
          ccStarsLocal(arr).toDF("u", "v")
            .persist(StorageLevel.MEMORY_AND_DISK)
        case None => connectedComponentsWithRounds(edges)._1
      }
    }

  private def componentSizes(s: SparkSession, d: String): DataFrame =
    // star edges are (child, root): one row per non-root member, so the
    // component size is the child count plus the root itself
    componentStars(s, d).groupBy(col("v").as("rep"))
      .agg((count(lit(1)) + lit(1L)).as("n_members"))
      .orderBy("rep")

  /** `spark.graft.cc.localLimit` — the edge count (near-dup survivor
    * pairs) below which q7R's components run driver-local (default
    * 1,000,000 ≈ 16 MB of (long, long) rows). 0 disables the local path.
    *
    * Driver-heap sizing for operators raising the limit: the probing
    * collect transiently holds limit+1 boxed `Row`s (~120 B each ⇒
    * ~120 MB at the default) before the primitive (long, long)
    * conversion, and the union-find keeps one HashMap entry per
    * DISTINCT node (≤ 2·limit boxed-Long entries, ~50 B each) — so
    * budget ≈ 220 B × limit of headroom, linear in the conf (default ≈
    * 0.2 GB transient; a 10× raise needs ~2 GB free driver heap).
    */
  private def localCcLimit(s: SparkSession): Int = {
    val l = s.conf.get("spark.graft.cc.localLimit", "1000000").toInt
    require(l >= 0,
      s"spark.graft.cc.localLimit must be >= 0 (0 = off), got $l")
    l
  }

  /** Driver-local connected components: union-find with path compression
    * and smaller-root-wins union, so every root is its component's
    * minimum node id. Emits the same star-edge table (child → component
    * minimum, one row per non-root member) as the large-star/small-star
    * fixpoint — the outputs are bit-identical by construction, pinned by
    * CcSpec. O(m·α(m)) time, O(distinct nodes) space.
    */
  private[graft] def ccStarsLocal(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x
      while (parent.getOrDefault(c, c) != c) {
        val nxt = parent.get(c); parent.put(c, r); c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    parent.keySet().forEach { k =>
      val r = find(k)
      if (r != k) out += ((k, r))
    }
    out.sortBy(identity).toSeq
  }

  private val IvfLloydSteps = 2

  /** nprobe scales ~√K, clamped to [3, 64]: as the data-driven K grows
    * with the corpus, each cell shrinks ~n/K, so probing √K cells keeps
    * the scanned FRACTION falling (√K·(n/K)/n = 1/√K → 0) while recall
    * decays far slower than a fixed 3-cell probe would at large K.
    *
    * `spark.graft.ivf.nprobe` FORCES the value (clamped to ≤ K; 0 =
    * auto) — the third auto dial's override, symmetric with
    * `spark.graft.ivf.k` (K) and `spark.graft.pq.rerank` (R). Added in
    * r13 when the fifth decade (50M vectors) measured q7G's first
    * recall dent at any scale (0.98): there K sits at its 4,096
    * `ivf.maxK` ceiling, so √K = 64 probes scan only 1.6 % of cells —
    * the dial a query with a higher recall target turns is nprobe, and
    * until r13 it had no override. Query-side only: nprobe is not part
    * of any model cache key, so flipping it between queries is free.
    */
  private[graft] def ivfNProbe(s: SparkSession, k: Int): Int = {
    val forced = s.conf.get("spark.graft.ivf.nprobe", "0").toInt
    require(forced >= 0,
      s"spark.graft.ivf.nprobe must be 0 (auto) or positive, got $forced")
    if (forced > 0) math.min(forced, k)
    else math.max(3, math.min(64, math.round(math.sqrt(k.toDouble)).toInt))
  }

  /** One IVF centroid. `cnsq` = ‖ce‖² so assignment only needs a dot. */
  case class IvfCent(cid: Int, ce: Seq[Double], cnsq: Double)

  /** Top-p cell INDICES for vector column `e` against the driver-resident
    * centroid model, via the codegen'd [[graft.functions.IvfTop]] kernel
    * (ranked by dot/‖c‖ desc, smaller cid on ties — the centroid list is
    * cid-ascending so index order is cid order). In-row: assignment and
    * probing shuffle nothing, and the kernel keeps the K-way loop inside
    * whole-stage codegen at any K — the r8 `transform()` spelling was
    * CodegenFallback (K interpreted dots per row), which the data-driven
    * K made measurable (see the kernel's scaladoc for the numbers).
    */
  private def ivfTopIdx(cents: Seq[IvfCent], e: Column, p: Int): Column =
    call_function("graft_ivf_top", e,
      graft.functions.ModelLit.mat("ivf_cents", cents.map(_.ce)),
      graft.functions.ModelLit.vec("ivf_cnsq", cents.map(_.cnsq).toArray),
      lit(p))

  /** Maps a 0-based kernel index back to the model's cell id. */
  private def cidOfIdx(cents: Seq[IvfCent], idx: Column): Column =
    element_at(typedLit(cents.map(_.cid)), idx + 1)

  /** Driver-side grouping of the K centroids into ≈√K super-groups —
    * the two-level (hierarchical) assignment model. The centroids are
    * MODEL METADATA (≤ maxK·dim doubles), so grouping them is a plain
    * Scala Lloyd over ≤ 4096 points: deterministic seeds (first √K
    * centroids in cid order), 3 refinements, squared-L2, ties toward
    * the smaller group; empty groups drop. Per group: the member
    * centroid vectors/norms (nested literals for the second
    * `graft_ivf_top` hop) and their GLOBAL 0-based indices.
    */
  private case class IvfHier(supers: Seq[Seq[Double]], superCnsq: Seq[Double],
      memberCe: Seq[Seq[Seq[Double]]], memberCnsq: Seq[Seq[Double]],
      memberIdx: Seq[Seq[Int]])

  /** Memoized per (session, model): hierOf is a pure function of the
    * centroids but costs a driver Lloyd over up to maxK points, and one
    * q7S build reaches assignment from three places (coarse index, PQ
    * training, encode). Structural-equality key (hashing K·dim doubles
    * per lookup is cheap next to recomputing); cleared in [[release]].
    */
  private val hierCache = scala.collection.concurrent.TrieMap
    .empty[(Long, Seq[IvfCent]), IvfHier]

  private def hierFor(s: SparkSession, cents: Seq[IvfCent]): IvfHier =
    hierCache.getOrElseUpdate((sessionKey(s), cents), hierOf(cents))

  private def hierOf(cents: Seq[IvfCent]): IvfHier = {
    val k1 = math.max(1, math.round(math.sqrt(cents.size.toDouble)).toInt)
    val pts = cents.map(_.ce)
    // grouping runs in the SERVING metric's space: the first hop ranks
    // supers by dot(e, s)/‖s‖ — scale-invariant in s, direction-only —
    // so centroids group on their UNIT vectors (spherical k-means; L2
    // on unit vectors orders like cosine) and a super represents its
    // group's mean direction. Grouping by raw L2 instead would let
    // norm-heterogeneous centroid sets route vectors to the wrong super.
    val unit = pts.map { p =>
      val n = math.sqrt(p.map(x => x * x).sum)
      if (n > 0) p.map(_ / n) else p
    }
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.size, b.size)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var supers = unit.take(k1)
    def assignAll(): Seq[Int] =
      unit.map { p =>
        var best = Double.MaxValue; var bj = 0; var j = 0
        while (j < supers.size) {
          val d = d2(p, supers(j))
          if (d < best) { best = d; bj = j }
          j += 1
        }
        bj
      }
    def repair(sup: Seq[Seq[Double]], a: Seq[Int]): Seq[Seq[Double]] =
      // a near-zero-norm super (mean of opposing directions) would make
      // the kernel's dot/√cnsq score blow up or go NaN (and NaN ranks
      // LARGEST under its total order — every row would route there):
      // repair to the group's first member direction
      sup.indices.map { j =>
        val s0 = sup(j)
        if (s0.map(x => x * x).sum > 1e-12) s0
        else unit(a.indexOf(j).max(0))
      }
    for (_ <- 1 to 3) {
      val a = assignAll()
      supers = repair(supers.indices.map { j =>
        val mine = unit.indices.filter(a(_) == j)
        if (mine.isEmpty) supers(j)
        else {
          val dim = unit.head.size
          (0 until dim).map(t => mine.map(i => unit(i)(t)).sum / mine.size)
        }
      }, a)
    }
    val a = assignAll()
    val groups = (0 until supers.size)
      .map(j => j -> pts.indices.filter(a(_) == j))
      .filter(_._2.nonEmpty)
    IvfHier(
      supers = groups.map { case (j, _) => supers(j) },
      superCnsq = groups.map { case (j, _) => supers(j).map(x => x * x).sum },
      memberCe = groups.map(_._2.map(pts)),
      memberCnsq = groups.map(_._2.map(i => cents(i).cnsq)),
      memberIdx = groups.map(_._2))
  }

  /** Whether serving assignment/probing goes two-level at this K:
    * `spark.graft.ivf.hier` = on | off | auto (default), auto switching
    * on above `spark.graft.ivf.hierThreshold` (default 256) cells —
    * below it the flat K·dim scan is already cheap and exact.
    */
  private[graft] def hierOn(s: SparkSession, k: Int): Boolean =
    s.conf.get("spark.graft.ivf.hier", "auto") match {
      case "on"  => true
      case "off" => false
      case "auto" =>
        val t = s.conf.get("spark.graft.ivf.hierThreshold", "256").toInt
        require(t > 0,
          s"spark.graft.ivf.hierThreshold must be positive, got $t")
        k > t
      case other => throw new IllegalArgumentException(
        s"spark.graft.ivf.hier must be on|off|auto, got $other")
    }

  /** Serving-side top-1 cell INDEX for `e` — the CORPUS-hot path. Flat:
    * one K-way kernel scan (K·dim mults/row). Hierarchical: two chained
    * `graft_ivf_top` hops (√K-way over the supers, then member-way
    * inside the chosen group — the second hop's centroid argument is an
    * `element_at` into a nested literal, which the kernel accepts as a
    * plain column) ≈ 2√K·dim mults/row, the notch the measured 100×
    * index-build wall called for (SCALING.md). Approximate at group
    * boundaries (a vector whose true cell lives in a different super
    * lands in the probed group's best cell); recall under the
    * approximation is spec-pinned and Scale-measured. Training stays
    * flat and exact — it is sample-bounded, and the model must not
    * depend on its own serving shortcut.
    */
  private def ivfAssignIdx(s: SparkSession, cents: Seq[IvfCent],
      e: Column): Column =
    if (!hierOn(s, cents.size)) ivfTopIdx(cents, e, 1).getItem(0)
    else hierAssignIdx(s, cents, e)

  /** The two-hop assignment body, shared by serving (above, behind the
    * SERVING switch, memoized — the final model is hit from three
    * places per q7S build) and the Lloyd-step TRAINING assignment
    * (behind [[trainHierOn]]'s separate switch, UNcached via
    * [[hierAssignIdxWith]] — each step's intermediate centroids are
    * used exactly once, so caching them would only orphan
    * IvfLloydSteps·K·dim doubles per trained model until release).
    */
  private def hierAssignIdx(s: SparkSession, cents: Seq[IvfCent],
      e: Column): Column =
    hierAssignIdxWith(hierFor(s, cents), e)

  private def hierAssignIdxWith(h: IvfHier, e: Column): Column = {
    // supers/superCnsq go through ModelLit (rectangular); the per-group
    // member lists are RAGGED (groups differ in size), so they stay
    // typedLit — they only matter above the hier threshold (K > 256),
    // where the member nesting is also the smaller of the two literals
    val sidx = call_function("graft_ivf_top", e,
      graft.functions.ModelLit.mat("ivf_hier_supers", h.supers),
      graft.functions.ModelLit.vec("ivf_hier_scnsq", h.superCnsq.toArray),
      lit(1)).getItem(0)
    val widx = call_function("graft_ivf_top", e,
      element_at(typedLit(h.memberCe), sidx + 1),
      element_at(typedLit(h.memberCnsq), sidx + 1), lit(1)).getItem(0)
    element_at(element_at(typedLit(h.memberIdx), sidx + 1), widx + 1)
  }

  /** Whether the coarse quantizer's LLOYD STEPS assign training rows
    * two-level: `spark.graft.ivf.trainAssign` = flat | hier | auto
    * (default), auto switching on above the same
    * `spark.graft.ivf.hierThreshold` as serving. This is the r10
    * coarse-TRAINING notch the measured 100× wall called for
    * (SCALING.md: ~95 % of the 241 s q7G wall was the flat n·K·dim
    * Lloyd scans): a two-level step costs ≈ 2√K·dim mults/row instead
    * of K·dim, and the mean update is unchanged (exact means of the
    * approximate assignment — standard hierarchical k-means). A
    * SEPARATE switch from serving on purpose: the model must be a pure
    * function of data + TRAINING confs (all in the model cache key),
    * never of how a given session chooses to serve it — the measured
    * rule from the r9 probing collapse (e518a07).
    */
  private[graft] def trainHierOn(s: SparkSession, k: Int): Boolean =
    s.conf.get("spark.graft.ivf.trainAssign", "auto") match {
      case "flat" => false
      case "hier" => true
      case "auto" =>
        val t = s.conf.get("spark.graft.ivf.hierThreshold", "256").toInt
        require(t > 0,
          s"spark.graft.ivf.hierThreshold must be positive, got $t")
        k > t
      case other => throw new IllegalArgumentException(
        s"spark.graft.ivf.trainAssign must be flat|hier|auto, got $other")
    }

  /** Serving-side probe indices (array of global centroid indices) for
    * a QUERY vector — always the FLAT top-nprobe ranking. Probing never
    * needed the two-level notch: its cost is |queries|·K·dim (queries ≪
    * corpus), and a measured attempt at hierarchical probing collapsed
    * 100× clustered recall 1.00 → 0.58 — on clustered data the true
    * nearest cells concentrate inside ONE super-group, so any per-super
    * truncation caps the effective nprobe at a fraction of its value.
    * The asymmetry is deliberate and load-bearing: the corpus side
    * (assignment) is approximate-and-cheap, the query side (probing)
    * exact-and-complete, so a boundary-misassigned vector still meets
    * its queries as long as its assigned cell ranks within the flat
    * top-nprobe.
    */
  private def ivfProbeIdx(s: SparkSession, cents: Seq[IvfCent],
      e: Column): Column =
    ivfTopIdx(cents, e, ivfNProbe(s, cents.size))

  private def ivfCid(cents: Seq[IvfCent], e: Column): Column =
    cidOfIdx(cents, ivfTopIdx(cents, e, 1).getItem(0))

  /** IVF coarse quantizer shared by q7G and AnnSpec's occupancy property:
    * K deterministic hash-min seeds, then `IvfLloydSteps` Lloyd
    * refinements. Centroids are MODEL metadata (K·dim doubles), so each
    * step collects them to the driver and re-embeds them as a literal —
    * the same shape as MLlib's KMeans, which collects + broadcasts its
    * centers every iteration. That makes assignment a pure per-row argmax
    * (no crossJoin, no exchange) and each Lloyd step exactly one corpus
    * scan feeding one partial-aggregated (cid, dim) mean — the only
    * shuffle, K·dim groups. Empty cells drop out of the model (AnnSpec
    * pins fixture occupancy). Returns the centroid list and the
    * assignment index(cid, n_id, ne, nn).
    */
  /** Trained models per (session, sfDir) — the training is deterministic,
    * so retraining on every plan BUILD (registry sweeps, plan pins, both
    * bench passes) would re-run the same 3 driver-blocking jobs; the
    * cached value is K·dim doubles.
    */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String, Long, Int, Int, String, Int, Long), Seq[IvfCent]]

  /** Training input under the sample budget: `(corpus size n, training
    * frame)`. The LIMIT-probe avoids a full-corpus count in the
    * within-budget case (see the ivfModel comment above the call site);
    * over budget, the kept rows are the first `sampleLimit/n` fraction
    * of q7J's engine-portable 31-bit LCG key space (expected sample size
    * ≈ sampleLimit; exact size is irrelevant to training). Shared by the
    * IVF coarse quantizer and the q7S PQ subquantizers so both train
    * under the same budget policy.
    */
  /** The probe is 1–2 driver-blocking jobs; memoized per (session, dir,
    * budget) so a cold q7S build (coarse model, then PQ model, same
    * budget) pays it once, not twice. Cleared in [[release]].
    */
  private val trainNCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String, Long), Long]

  private def trainCorpus(s: SparkSession, d: String, v: DataFrame,
      sampleLimit: Long): (Long, DataFrame) = {
    val n = trainNCache.getOrElseUpdate((sessionKey(s), d, sampleLimit), {
      val probeN =
        if (sampleLimit >= Int.MaxValue) v.select("vec_id").count()
        else v.select("vec_id").limit(sampleLimit.toInt + 1).count()
      if (probeN <= sampleLimit) probeN else v.select("vec_id").count()
    })
    val train =
      if (n <= sampleLimit) v
      else {
        val cut = math.max(1L,
          (BigInt(sampleLimit) * 2147483648L / BigInt(n)).toLong)
        v.filter(expr("pmod(pmod(vec_id, 2147483648) * 1103515245 + 12345," +
          s" 2147483648) < ${cut}L"))
      }
    (n, train)
  }

  def ivfModel(s: SparkSession, d: String): (Seq[IvfCent], DataFrame) = {
    val v = vectors(s, d)
    def index(cents: Seq[IvfCent]): DataFrame =
      // serving index: hier-aware assignment (the corpus-hot n·K·dim
      // path the two-level notch exists for); training below stays flat
      v.select(cidOfIdx(cents, ivfAssignIdx(s, cents, col("e"))).as("cid"),
        col("vec_id").as("n_id"), col("e").as("ne"), col("nsq").as("nn"))
    // every conf the model depends on is part of the cache key: a spec
    // (or a server session) that retunes any of them must get a
    // retrained model, not the previous tuning's centroids
    val sampleLimit =
      s.conf.get("spark.graft.ivf.trainSampleLimit", "1000000").toLong
    // a non-positive budget would make the within-budget probe false and
    // the LCG cut keep ~0 rows — zero seeds, an empty centroid list, and
    // an opaque failure later in ivfCid. Fail here, naming the conf.
    require(sampleLimit > 0,
      s"spark.graft.ivf.trainSampleLimit must be positive, got $sampleLimit")
    // K is DATA-DRIVEN by default (spark.graft.ivf.k=0): ≈√n cells, so
    // both the expected cell size (n/K) and the probed share of the
    // corpus (nprobe·n/K ≈ √K·√n) grow only as √n — a fixture trains
    // ~20 cells and a 10⁹-vector corpus ~31k, capped by
    // spark.graft.ivf.maxK because assignment cost is K·dim mults per
    // row against the driver-resident literal (2√K·dim once the
    // two-level notches engage above hierThreshold — serving r9,
    // training r10; past the cap, cells grow linearly again).
    // An explicit spark.graft.ivf.k pins K for reproducibility/specs.
    val kConf = s.conf.get("spark.graft.ivf.k", "0").toInt
    val maxK = s.conf.get("spark.graft.ivf.maxK", "4096").toInt
    require(kConf >= 0, s"spark.graft.ivf.k must be >= 0 (0 = auto), got $kConf")
    require(maxK > 0, s"spark.graft.ivf.maxK must be positive, got $maxK")
    // the TRAINING-assignment confs shape the centroids themselves
    // (group-boundary assignments move means), so their RAW values join
    // the key — same convention as pqModel's hier keying
    val trainAssign = s.conf.get("spark.graft.ivf.trainAssign", "auto")
    val hierT = s.conf.get("spark.graft.ivf.hierThreshold", "256").toInt
    // the r13 local-training gate joins the key too: the local and
    // distributed Lloyd paths sum means in different orders, so the two
    // models can differ in final ulps — a session that retunes the gate
    // must retrain, not reuse the other path's centroids
    val localLimit = localTrainLimit(s)
    val cacheKey =
      (sessionKey(s), d, sampleLimit, kConf, maxK, trainAssign, hierT, localLimit)
    val cached = ivfCache.get(cacheKey)
    if (cached.isDefined) return (cached.get, index(cached.get))
    // Training input: the full corpus while it fits the sample budget;
    // above it, a deterministic ~sampleLimit-row sample keyed by q7J's
    // engine-portable LCG (SCALING.md's "at 100 TB train centroids on a
    // sample" is now the code path, not a note): quantizer quality needs
    // the sample to cover the density landscape, not every row, and each
    // Lloyd step otherwise runs a driver-blocking full-corpus job per
    // sweep. The branch probe is a LIMIT(budget+1) count, not a full
    // count: CollectLimit stops scanning once budget+1 ids have been
    // seen, so the within-budget case (every fixture; any corpus small
    // enough to train on fully) never pays a full-corpus pass just to
    // learn it is small — and because the probe count IS the exact
    // corpus size in that case, auto-K needs no extra job. Only a
    // genuinely over-budget corpus pays the full count that sizes the
    // sampling fraction and auto-K — there, training itself dwarfs it.
    // The SERVING index below always assigns the full corpus.
    val (n, train) = trainCorpus(s, d, v, sampleLimit)
    val k = math.max(1L, math.min(n,
      if (kConf > 0) kConf.toLong
      else math.min(maxK.toLong,
        math.max(4L, math.round(math.sqrt(n.toDouble)))))).toInt
    val cents: Seq[IvfCent] =
      if (localLimit > 0 && n <= localLimit && !trainHierOn(s, k))
        // r13 fast path: training is already sample-bounded, and below
        // the gate the 1 + IvfLloydSteps driver-blocking jobs of the
        // distributed loop were pure scheduling over a table the driver
        // can hold (≤ localLimit·dim doubles — the BPE localVocabLimit
        // argument applied to KMeans). Hier-assigned training stays
        // distributed: the local loop implements only the flat kernel
        // rule, and above the hier threshold the corpus is past the
        // gate anyway (K > 256 ⇒ n > 65k) unless a spec forces hier on.
        trainIvfLocal(collectTrainRows(train), k)
      else trainIvfDistributed(s, train, k)
    ivfCache.put(cacheKey, cents)
    (cents, index(cents))
  }

  /** `spark.graft.ivf.localTrainLimit` — the corpus size (rows) below
    * which quantizer training runs driver-local (default 20,000 ≈ 10 MB
    * of 64-dim doubles). 0 disables the local path.
    *
    * Driver-heap sizing when raising it: [[collectTrainRows]] holds one
    * boxed `Row` plus one unpacked (long, long, double[dim]) per row —
    * ~(250 + 8·dim) B each transiently, ~(16 + 8·dim) B retained for
    * the Lloyd sweeps — so at dim 64 budget ≈ 770 B × limit of headroom
    * (default ≈ 15 MB; the limit already also bounds
    * `ivf.trainSampleLimit`-style work, so raises past ~10⁶ buy little:
    * the sample cut keeps training input bounded anyway).
    */
  private def localTrainLimit(s: SparkSession): Long = {
    val l = s.conf.get("spark.graft.ivf.localTrainLimit", "20000").toLong
    require(l >= 0,
      s"spark.graft.ivf.localTrainLimit must be >= 0 (0 = off), got $l")
    l
  }

  /** One collect feeding the local trainers: (vec_id, xxhash64(vec_id),
    * e) — the hash computed by SPARK's xxhash64 so local seed selection
    * is bit-identical to the distributed `orderBy(h, vec_id)`.
    */
  private def collectTrainRows(train: DataFrame): Array[(Long, Long, Array[Double])] =
    train.select(col("vec_id"), expr("xxhash64(vec_id)").as("h"), col("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))

  /** The pre-r13 distributed Lloyd loop — the over-`localTrainLimit`
    * path (and the hier-assigned-training path at any size).
    */
  private def trainIvfDistributed(s: SparkSession, train: DataFrame,
      k: Int): Seq[IvfCent] = {
    // seeds: the K smallest xxhash64(vec_id) vectors of the TRAINING
    // set — deterministic, data-independent spread; metadata-scale
    // collect (K rows)
    var cents: Seq[IvfCent] = train.select(col("vec_id"), col("e"))
      .withColumn("h", expr("xxhash64(vec_id)"))
      .orderBy("h", "vec_id").limit(k)
      .collect().toSeq.zipWithIndex.map { case (r, i) =>
        val e = r.getSeq[Double](1)
        IvfCent(i + 1, e, e.map(x => x * x).sum)
      }
    for (_ <- 1 to IvfLloydSteps) {
      // per-(cell, dim) mean: one scan, map-side partial agg, K·dim groups.
      // Assignment is two-level above the threshold (trainHierOn) — the
      // r10 training notch: 2√K·dim instead of K·dim mults per row, the
      // dominant term of the measured 100× wall
      val aidx =
        if (trainHierOn(s, cents.size)) hierAssignIdxWith(hierOf(cents), col("e"))
        else ivfTopIdx(cents, col("e"), 1).getItem(0)
      val means = train.select(cidOfIdx(cents, aidx).as("cid"),
          posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(avg("x").as("m"))
        .collect().toSeq
      cents = means.groupBy(_.getInt(0)).toSeq.map { case (cid, rows) =>
        val ce = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        IvfCent(cid, ce, ce.map(x => x * x).sum)
      }.sortBy(_.cid)
    }
    cents
  }

  /** Flat top-1 cell index over driver-resident centroid arrays — the
    * local trainers' assignment, replicating graft_ivf_top's p=1 rule
    * exactly: score = dot/√‖c‖², Double.compare total order, strict >
    * so ties keep the smaller index.
    */
  private def localTopIdx(e: Array[Double], ca: Array[Array[Double]],
      cn: Array[Double]): Int = {
    var best = java.lang.Double.NEGATIVE_INFINITY
    var bi = 0
    var i = 0
    while (i < ca.length) {
      val c = ca(i)
      val dim = math.min(e.length, c.length)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += e(d) * c(d); d += 1 }
      val cs = dot / math.sqrt(cn(i))
      if (java.lang.Double.compare(cs, best) > 0) { best = cs; bi = i }
      i += 1
    }
    bi
  }

  /** Driver-local coarse Lloyd loop: same seeds (hash-min, bit-identical
    * via [[collectTrainRows]]'s Spark-computed xxhash64), same flat
    * assignment rule as the kernel, same empty-cells-vanish mean update.
    * Means sum in row order rather than partition order, so final
    * centroids can differ from the distributed path in ulps — which is
    * why [[localTrainLimit]] keys the model caches; AnnSpec pins the
    * local path's recall floors and geometry, and the forced-distributed
    * path keeps its own pins.
    */
  private[graft] def trainIvfLocal(rows: Array[(Long, Long, Array[Double])],
      k: Int): Seq[IvfCent] = {
    var cents: Seq[IvfCent] = rows.sortBy(r => (r._2, r._1)).take(k)
      .zipWithIndex.map { case ((_, _, e), i) =>
        IvfCent(i + 1, e.toSeq, e.map(x => x * x).sum)
      }.toSeq
    for (_ <- 1 to IvfLloydSteps) {
      val ca = cents.map(_.ce.toArray).toArray
      val cn = cents.map(_.cnsq).toArray
      val sums = new java.util.HashMap[Int, (Array[Double], Long)]
      rows.foreach { case (_, _, e) =>
        val cid = cents(localTopIdx(e, ca, cn)).cid
        val acc = sums.computeIfAbsent(cid, _ => (new Array[Double](e.length), 0L))
        var d = 0
        while (d < e.length) { acc._1(d) += e(d); d += 1 }
        sums.put(cid, (acc._1, acc._2 + 1))
      }
      val next = scala.collection.mutable.ArrayBuffer.empty[IvfCent]
      sums.forEach { (cid, acc) =>
        val ce = acc._1.map(_ / acc._2).toSeq
        next += IvfCent(cid, ce, ce.map(x => x * x).sum)
      }
      cents = next.sortBy(_.cid).toSeq
    }
    cents
  }

  /** q7S's product-quantization model: `cb` holds the `m·ks` codewords
    * flattened (codeword `j` of subspace `mi` at index `mi·ks + j`, each
    * of `dim/m` doubles), `cnsq` their squared norms — the driver-resident
    * literal shape both PQ kernels take.
    */
  case class PqModel(m: Int, ks: Int,
      cb: Seq[Seq[Double]], cnsq: Seq[Double])

  private val PqLloydSteps = 2
  /** Exact-rerank shortlist size per query (q7S,
    * `spark.graft.pq.rerank`, 0 = auto): the top-R by approximate ADC
    * cosine refetch full vectors for the exact pass. R is the PQ
    * recall/cost dial — quantization noise reorders candidates whose
    * true sims are close, so recall@5 rises with R (measured on the 10×
    * clustered Scale corpus: 0.32/0.44/0.58/0.76 at R=32/64/128/256)
    * while the query-side wall stays flat and the refetch join's build
    * side stays a metadata-scale |queries|·R rows.
    *
    * Auto-R scales with the ADC candidate POOL, not the cell count
    * (round 11; VERDICT r10 #6): the pool a query ranks is
    * nprobe·(n/K) rows, and the number of quantization-noise
    * distractors that land above a true neighbor grows with that pool
    * — so the one-cell's-worth rule (R = K) let recall drift
    * 0.96/0.72/0.62 across the 1×/10×/100× decades while the pool grew
    * √n-fold. A fixed-FRACTION depth (pool / spark.graft.pq.poolFrac,
    * still ≥ K, clamped to [64, spark.graft.pq.rerankMax]) keeps the
    * reranked share of the pool constant across decades; the refetch
    * build side stays |queries|·R — metadata.
    *
    * The fraction default is pool/4 (round 13; was pool/8 through r12).
    * The Scale `maxk` sweep at the 1000× decade measured the two ways
    * of buying recall against each other: doubling R from the /8 depth
    * (13,136 → 26,272) lifted recall 0.92 → 0.96 at a FLAT warm wall
    * (27.8 → 27.2 s — the exact rerank is a metadata-scale broadcast
    * join, nearly free at these R), while shrinking the pool by raising
    * K (2,236 → 4,470/8,944 cells) LOST on both axes: recall fell to
    * 0.84 (nprobe hits its 64 cap, so the scanned fraction of cells
    * drops 2.1% → 0.7%) and the warm wall DOUBLED (53.5/64.6 s — per-row
    * assignment is √K-ish and the centroid/codebook literals every task
    * deserializes grow with K). So through at least 5·10⁶ vectors R is
    * the cheap dial and K is the expensive one — the r12 scaladoc's
    * "past ~10⁷ raise maxK instead" is REJECTED at this decade by
    * measurement (SCALING.md `maxk` table), and REJECTED AGAIN at
    * 5·10⁷ — the decade the claim was actually about — where released
    * K = √n = 7,071 lost recall on both tiers (nprobe capped at 64
    * halves the scanned cell share) and wall on q7G, while lifting
    * this clamp recovered q7S 0.80 → 0.92 at a flat wall, adding
    * forced nprobe = 128 reached 0.94, and one more ceiling doubling
    * (pool/4 = 390k binding unclamped, |q|·R ≈ 3.9M refetch rows
    * still cheap) reached 1.00 at 516 s — all query-side (SCALING.md
    * fifth-decade dial table). Dial order at the clamped decade:
    * R first, nprobe second, K never past the cap.
    *
    * The upper clamp is conf-scaled (round 12; a fixed 4096 saturated
    * at the 1000× decade — the same falling-share mechanism that caused
    * the original drift, one decade later). The clamp exists to bound
    * the exact-rerank cost and the refetch build side, both linear in
    * R; the default (65536) keeps the fixed-fraction rule live through
    * ~10⁷ vectors at the auto geometry (K = √n, nprobe = √K:
    * pool ≈ n¾ until nprobe caps).
    */
  private[graft] def pqRerank(s: SparkSession, k: Int, n: Long): Int = {
    val r = s.conf.get("spark.graft.pq.rerank", "0").toInt
    require(r == 0 || r >= 5,
      s"spark.graft.pq.rerank must be 0 (auto) or >= 5, got $r")
    if (r > 0) r
    else {
      val maxR = s.conf.get("spark.graft.pq.rerankMax", "65536").toInt
      require(maxR >= 64,
        s"spark.graft.pq.rerankMax must be >= 64, got $maxR")
      val frac = s.conf.get("spark.graft.pq.poolFrac", "4").toInt
      require(frac >= 1, s"spark.graft.pq.poolFrac must be >= 1, got $frac")
      val pool = ivfNProbe(s, k).toLong * math.max(1L, n / math.max(1, k))
      math.max(64L, math.min(maxR.toLong, math.max(k.toLong, pool / frac))).toInt
    }
  }

  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[(Long, String, Long, Int, Int, Int, Int, Int, String, Int, String, Long), PqModel]

  /** The IVF-ADC residual column: `e − cents(pidx)` through the
    * codegen'd `graft_vec_sub` kernel, where `pidx` is the row's
    * already-computed nearest-cell 0-based INDEX. Shared by PQ training,
    * the q7S serving index, and AnnSpec so every consumer quantizes the
    * same vector.
    */
  private[graft] def residCol(cents: Seq[IvfCent], e: Column,
      pidx: Column): Column =
    call_function("graft_vec_sub", e,
      element_at(graft.functions.ModelLit.mat("ivf_cents", cents.map(_.ce)),
        pidx + 1))

  /** Trains the q7S product quantizer (Jégou/Douze/Schmid, TPAMI 2011)
    * on coarse-cell RESIDUALS — the paper's IVF-ADC scheme. Quantizing
    * raw vectors fails on clustered data: cell-mates share their cell
    * center, so global codewords spend their resolution separating
    * CELLS (which the coarse index already separates exactly) while the
    * within-cell differences that decide the top-k drown in quantization
    * error — measured recall@5 collapsed to 0.08 on the 10× clustered
    * Scale corpus before the residual change (vs q7G's 1.00). Residuals
    * are centered near zero, so the one shared codebook set spends all
    * its resolution on exactly the within-cell structure the shortlist
    * ranking needs.
    *
    * The residual splits into `spark.graft.pq.m` contiguous subspaces,
    * each with its own `ks`-codeword codebook trained by the SAME
    * deterministic seed + Lloyd recipe as the IVF coarse quantizer —
    * seeds are the `ks` smallest-xxhash64 training vectors' residual
    * subslices, then `PqLloydSteps` refinements where assignment is the
    * in-row codegen'd `graft_pq_enc` against the driver-resident
    * codebooks and the update is ONE corpus scan feeding a map-side
    * partially aggregated `(subspace, code, dim)` mean — `ks·dim`
    * groups, metadata-scale. `ks` is data-driven ≈√n like the IVF K
    * (capped by `spark.graft.pq.maxKs`, default 256 = byte codes, pinned
    * by `spark.graft.pq.ks` for reproducibility), and training reuses
    * the IVF sample budget ([[trainCorpus]]). An empty `(mi, j)` cell
    * keeps its previous codeword (harmless: never nearest, never chosen).
    */
  def pqModel(s: SparkSession, d: String): PqModel = {
    val v = vectors(s, d)
    // m=8: 8-dim residual subvectors on the 64-dim fixture, 8 codes per
    // vector — the classic FAISS-style PQ8 shape, and the measured best
    // among {2,4,8,16} on recall-per-byte (see AnnSpec's pinned floor)
    val mConf = s.conf.get("spark.graft.pq.m", "8").toInt
    val ksConf = s.conf.get("spark.graft.pq.ks", "0").toInt
    val maxKs = s.conf.get("spark.graft.pq.maxKs", "256").toInt
    require(mConf > 0, s"spark.graft.pq.m must be positive, got $mConf")
    require(ksConf >= 0,
      s"spark.graft.pq.ks must be >= 0 (0 = auto), got $ksConf")
    require(maxKs > 1, s"spark.graft.pq.maxKs must be > 1, got $maxKs")
    val sampleLimit =
      s.conf.get("spark.graft.ivf.trainSampleLimit", "1000000").toLong
    require(sampleLimit > 0,
      s"spark.graft.ivf.trainSampleLimit must be positive, got $sampleLimit")
    // the residuals (and so the codebooks) depend on the coarse model:
    // every conf the IVF cache keys on joins the PQ cache key too, so a
    // session that retunes the coarse quantizer retrains the PQ
    val ivfK = s.conf.get("spark.graft.ivf.k", "0").toInt
    val ivfMaxK = s.conf.get("spark.graft.ivf.maxK", "4096").toInt
    // the hier decision changes the training residual distribution
    // (group-boundary assignments differ), so its RAW confs join the
    // key — raw, not resolved, so the warm-cache hit stays a TrieMap
    // get with no ivfModel call (the resolution is a pure function of
    // the other key fields anyway: K is determined by them)
    val hierMode = s.conf.get("spark.graft.ivf.hier", "auto")
    val hierT = s.conf.get("spark.graft.ivf.hierThreshold", "256").toInt
    // trainAssign reshapes the coarse centroids (and so every residual)
    val trainAssign = s.conf.get("spark.graft.ivf.trainAssign", "auto")
    val localLimit = localTrainLimit(s) // r13 — see ivfModel's key note
    val cacheKey = (sessionKey(s), d, sampleLimit, mConf, ksConf, maxKs,
      ivfK, ivfMaxK, hierMode, hierT, trainAssign, localLimit)
    val cached = pqCache.get(cacheKey)
    if (cached.isDefined) return cached.get
    val (cents, _) = ivfModel(s, d)
    val (n, raw) = trainCorpus(s, d, v, sampleLimit)
    val ks = math.max(2L, math.min(n,
      if (ksConf > 0) ksConf.toLong
      else math.min(maxKs.toLong,
        math.max(8L, math.round(math.sqrt(n.toDouble)))))).toInt
    // dim comes free from the coarse model already on the driver (a
    // centroid IS a corpus vector's shape) — no extra LIMIT-1 job
    val dim = cents.headOption.map(_.ce.size)
      .getOrElse(sys.error(s"pqModel: no vectors under $d"))
    require(dim % mConf == 0,
      s"spark.graft.pq.m=$mConf must divide the embedding dim $dim")
    val sub = dim / mConf
    if (localLimit > 0 && n <= localLimit && !hierOn(s, cents.size)) {
      // r13 fast path (the ivfModel argument, doubled: PQ training is
      // 1 + PqLloydSteps more driver-blocking jobs): residuals computed
      // locally under the same flat assignment rule the serving encode
      // uses below the hier threshold
      val ca = cents.map(_.ce.toArray).toArray
      val cn = cents.map(_.cnsq).toArray
      val rows = collectTrainRows(raw).map { case (id, h, e) =>
        val c = ca(localTopIdx(e, ca, cn))
        val m = math.min(e.length, c.length)
        (id, h, Array.tabulate(m)(i => e(i) - c(i)))
      }
      val model = trainPqLocal(rows, mConf, ks, sub)
      pqCache.put(cacheKey, model)
      return model
    }
    // IVF-ADC: quantize the residual vs the row's coarse centroid, not
    // the raw vector (see the scaladoc for the measured collapse). The
    // assignment is hier-aware to match SERVING — the codebooks must
    // train on the same residual distribution pqEncodeRows produces
    val train = raw.select(col("vec_id"),
      residCol(cents, col("e"), ivfAssignIdx(s, cents, col("e"))).as("e"))
    val seeds = train.select(col("vec_id"), col("e"))
      .withColumn("h", expr("xxhash64(vec_id)"))
      .orderBy("h", "vec_id").limit(ks)
      .collect().map(_.getSeq[Double](1))
    var cb: Array[Array[Double]] = Array.tabulate(mConf * ks) { i =>
      val (mi, j) = (i / ks, i % ks)
      // fewer training rows than ks (tiny fixture): reuse seeds cyclically
      seeds(j % seeds.length).slice(mi * sub, (mi + 1) * sub).toArray
    }
    for (_ <- 1 to PqLloydSteps) {
      val cbLit = graft.functions.ModelLit.mat("pq_train_cb", cb.map(_.toSeq))
      val cnsqLit = graft.functions.ModelLit.vec("pq_train_cnsq",
        cb.map(_.map(x => x * x).sum))
      val means = train
        .select(col("e"), posexplode(call_function("graft_pq_enc",
          col("e"), cbLit, cnsqLit, lit(ks))).as(Seq("mi", "code")))
        .select(col("mi"), col("code"),
          posexplode(expr(s"slice(e, mi * $sub + 1, $sub)")).as(Seq("dim", "x")))
        .groupBy("mi", "code", "dim").agg(avg("x").as("mu"))
        .collect()
      val next = cb.map(_.clone())
      means.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
        case ((mi, j), rows) =>
          val w = new Array[Double](sub)
          rows.foreach(r => w(r.getInt(2)) = r.getDouble(3))
          next(mi * ks + j) = w
      }
      cb = next
    }
    val model = PqModel(mConf, ks,
      cb.map(_.toSeq).toSeq, cb.map(_.map(x => x * x).sum).toSeq)
    pqCache.put(cacheKey, model)
    model
  }

  /** Driver-local PQ Lloyd loop over collected residual rows — same
    * hash-min seed rule (Spark-computed xxhash64), same per-subspace
    * argmax(dot − ‖c‖²/2) encode as graft_pq_enc (Double.compare,
    * strict > ⇒ ties to the smaller codeword), same
    * empty-codewords-keep-their-value mean update as the distributed
    * loop. Ulp caveat as [[trainIvfLocal]].
    */
  private[graft] def trainPqLocal(rows: Array[(Long, Long, Array[Double])],
      m: Int, ks: Int, sub: Int): PqModel = {
    val seeds = rows.sortBy(r => (r._2, r._1)).take(ks).map(_._3)
    var cb: Array[Array[Double]] = Array.tabulate(m * ks) { i =>
      val (mi, j) = (i / ks, i % ks)
      // fewer training rows than ks (tiny fixture): reuse seeds cyclically
      val s = seeds(j % seeds.length)
      java.util.Arrays.copyOfRange(s, math.min(mi * sub, s.length),
        math.min((mi + 1) * sub, s.length))
    }
    for (_ <- 1 to PqLloydSteps) {
      val cn = cb.map(_.map(x => x * x).sum)
      val sums = new java.util.HashMap[(Int, Int), (Array[Double], Long)]
      rows.foreach { case (_, _, e) =>
        var mi = 0
        while (mi < m) {
          var best = java.lang.Double.NEGATIVE_INFINITY
          var bestJ = 0
          var j = 0
          while (j < ks) {
            val c = cb(mi * ks + j)
            val dim = math.min(sub, c.length)
            var dot = 0.0
            var t = 0
            while (t < dim) { dot += e(mi * sub + t) * c(t); t += 1 }
            val score = dot - 0.5 * cn(mi * ks + j)
            if (java.lang.Double.compare(score, best) > 0) { best = score; bestJ = j }
            j += 1
          }
          val acc = sums.computeIfAbsent((mi, bestJ),
            _ => (new Array[Double](sub), 0L))
          var t = 0
          while (t < sub) { acc._1(t) += e(mi * sub + t); t += 1 }
          sums.put((mi, bestJ), (acc._1, acc._2 + 1))
          mi += 1
        }
      }
      val next = cb.map(_.clone())
      sums.forEach { (k2, acc) =>
        next(k2._1 * ks + k2._2) = acc._1.map(_ / acc._2)
      }
      cb = next
    }
    PqModel(m, ks, cb.map(_.toSeq).toSeq, cb.map(_.map(x => x * x).sum).toSeq)
  }

  /** The IVF-PQ encode projection over ANY `(vec_id, e, nsq)` frame —
    * one stateless in-row pass (nearest cell → residual → codes), so it
    * runs identically on a static read or a STREAM (S15's index
    * maintenance). Caller must have the kernels registered
    * ([[graft.functions.PqKernels.register]] etc. — [[vectors]] does).
    *
    * `withResid` appends `resid_nsq` = ‖x − c(x)‖² — the squared
    * assignment residual, the r13 drift statistic: its batch mean
    * against a model-time baseline is how S15 detects that arrivals
    * stopped looking like the training distribution
    * (graft.streaming.VecIngest.driftRatios). Same `pidx`, same
    * residual expression the codes quantize (whole-stage CSE folds the
    * shared subexpressions), so the statistic measures exactly the
    * quantity whose growth degrades PQ recall.
    */
  private[graft] def pqEncodeRows(df: DataFrame,
      cents: Seq[IvfCent], pq: PqModel,
      withResid: Boolean = false): DataFrame = {
    val resid = residCol(cents, col("e"), col("pidx"))
    val base = Seq(col("vec_id"),
      cidOfIdx(cents, col("pidx")).as("cid"),
      call_function("graft_pq_enc", resid,
        graft.functions.ModelLit.mat("pq_cb", pq.cb),
        graft.functions.ModelLit.vec("pq_cnsq", pq.cnsq.toArray),
        lit(pq.ks)).as("codes"),
      col("nsq"))
    val cols =
      if (withResid)
        base :+ call_function("graft_dot", resid, resid).as("resid_nsq")
      else base
    df.select(col("vec_id"), col("nsq"), col("e"),
        ivfAssignIdx(df.sparkSession, cents, col("e")).as("pidx"))
      .select(cols: _*)
  }

  /** q7S's query pipeline over ANY `(cid, n_id, codes, nn)` serving
    * index — the lake-built [[pqIndex]] (the registry entry) or the
    * S15 stream-maintained JDBC registry
    * (graft.streaming.VecIngest.search), which is the point of the
    * extraction: the stream-kept index answers through EXACTLY this
    * plan, so VecIngestSpec can pin result parity, not just row parity.
    *
    * Probing is q7G's in-row kernel; candidates rank by exact
    * dot(q, c_cell) + the ADC residual term (dot(q, x) decomposes over
    * the two), the auto-R shortlist alone refetches full vectors
    * (broadcast against the corpus scan), and reported sims are exact.
    *
    * `payload` is the frame holding the FULL vectors (`vec_id`,
    * `embedding`) for the ids the index serves — the exact-rerank
    * refetch source. Default = the lake at `d`. An indexed id MISSING
    * from the payload consumes a shortlist slot but cannot be returned
    * (the rerank is an inner join), so a caller serving a
    * stream-maintained index must pass a payload covering the
    * stream-fresh ids too (see graft.streaming.VecIngest.search).
    *
    * Documented approximation (ADVICE r11): the pool-proportional
    * auto-R sizes itself from the LAKE's corpus count even when a
    * payload is supplied, so for a stream-maintained index the rerank
    * depth lags the true served corpus by the landing-zone share.
    * That share is bounded by the compaction cadence (VecIngest folds
    * the zone into the lake), so the lag is a transient few-percent
    * undershoot of a heuristic dial — an explicit
    * `spark.graft.pq.rerank` overrides it, and if a deployment let
    * the zone grow comparable to the lake, scale `corpusN` by the
    * payload/lake row ratio before trusting auto-R.
    */
  private[graft] def pqSearch(s: SparkSession, d: String,
      index: DataFrame, payload: Option[DataFrame] = None): DataFrame = {
    val lake = vectors(s, d)
    val v = payload.map(_
        // the documented payload is lake ∪ landing-zone, which OVERLAPS
        // while a compaction window is open — without the dedup a
        // twice-present id would claim two of the five result slots
        .dropDuplicates("vec_id")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("nsq", expr("graft_dot(e, e)"))
      ).getOrElse(lake)
    // corpus size for the pool-proportional auto-R: memoized from model
    // training (trainNCache); a cold cache pays one LIMIT-probe count
    val sampleLimit =
      s.conf.get("spark.graft.ivf.trainSampleLimit", "1000000").toLong
    val (corpusN, _) = trainCorpus(s, d, lake, sampleLimit)
    val (cents, _) = ivfModel(s, d)
    val pq = pqModel(s, d)
    val cbLit = graft.functions.ModelLit.mat("pq_cb", pq.cb)
    val centsLit = graft.functions.ModelLit.mat("ivf_cents", cents.map(_.ce))
    // the QUERY set is the declared lake one (vec_id < 10) regardless
    // of payload — payload only widens the rerank refetch source
    val probes = lake.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nsq").as("qn"),
        explode(ivfProbeIdx(s, cents, col("e"))).as("pidx"))
      .select(col("q_id"), col("qe"), col("qn"),
        cidOfIdx(cents, col("pidx")).as("cid"),
        call_function("graft_dot", col("qe"),
          element_at(centsLit, col("pidx") + 1)).as("qdotc"))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("asim").desc, col("n_id"))
    // each candidate lives in exactly one cell (q7G's argument), so no
    // distinct; ADC sims are deterministic → rank ties break on n_id.
    // dot(q, x) = dot(q, c_cell) + dot(q, residual) — the first term
    // is exact per (query, cell), the second is the ADC approximation
    val short = probes.join(index, "cid")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("asim",
        (col("qdotc") +
          call_function("graft_pq_adc", col("qe"), col("codes"), cbLit)) /
          sqrt(col("qn") * col("nn")))
      .withColumn("ar", row_number().over(wA))
      .filter(col("ar") <= pqRerank(s, cents.size, corpusN))
      .select("q_id", "qe", "qn", "n_id")
    val exact = v.select(col("vec_id").as("n_id"),
      col("e").as("ne"), col("nsq").as("nn"))
    val w5 = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    broadcast(short).join(exact, "n_id")
      .select(col("q_id"), col("n_id"),
        cosine("qe", "ne", "qn", "nn").as("sim"))
      .withColumn("rn", row_number().over(w5))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id", "sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** q7S's compressed serving index over the lake at `d`: one row per
    * corpus vector — `(cid, n_id, codes, nn)`, where `codes` quantizes
    * the row's IVF-ADC residual and `nn` is the EXACT squared norm (the
    * sim denominator is never approximated). The assignment `pidx` is
    * computed once inside [[pqEncodeRows]] and feeds both the cell id
    * and the residual. Shared with AnnSpec so the well-formedness pins
    * cover the registry path's own encoding.
    */
  private[graft] def pqIndex(s: SparkSession, d: String): DataFrame = {
    val v = vectors(s, d)
    val (cents, _) = ivfModel(s, d)
    val pq = pqModel(s, d)
    pqEncodeRows(v, cents, pq)
      .select(col("cid"), col("vec_id").as("n_id"),
        col("codes"), col("nsq").as("nn"))
  }

  val oracle: Map[String, String] = Map(
    "q70_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs FROM (
        |  SELECT lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    "q71_dedup_latest" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT user_id, event_type, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q72_text_tokens" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "q7I_tokenize_bpe" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "q73_text_ngrams" ->
      """SELECT bigram, count(*) AS cnt FROM (
        |  SELECT unnest(list_transform(range(2, len(t) + 1),
        |                               i -> t[i - 1] || ' ' || t[i])) AS bigram
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents))
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    "q74_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        |SELECT tf.doc_id, tf.term,
        |  round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 4) AS score
        |FROM tf JOIN df USING (term) CROSS JOIN n
        |ORDER BY score DESC, doc_id, term LIMIT 10""".stripMargin,
    "q75_text_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q76_sim_cosine_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 4) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, id_a, id_b LIMIT 10""".stripMargin,
    "q77_sim_threshold" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 4) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.e, b.e), 4) >= 0.38
        |ORDER BY sim DESC, id_a, id_b""".stripMargin,
    "q78_knn_label" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |knn AS (
        |  SELECT q.vec_id AS q_id, c.label,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.e, c.e), 4) DESC, c.vec_id) AS rn
        |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10),
        |votes AS (
        |  SELECT q_id, label, count(*) AS votes FROM knn WHERE rn <= 5
        |  GROUP BY q_id, label)
        |SELECT q_id, label AS pred_label, votes FROM (
        |  SELECT q_id, label, votes,
        |    row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS vr
        |  FROM votes)
        |WHERE vr = 1 ORDER BY q_id""".stripMargin,
    "q79_multimodal_join" ->
      """SELECT doc_id, lang, source, n_chars, label,
        |  CAST(len(embedding) AS BIGINT) AS dim
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |WHERE label >= 5 ORDER BY doc_id""".stripMargin,
    // q7B: strlen = byte length; sha256 = the same fingerprint Spark's
    // sha2(media, 256) computes over the UTF-8 bytes.
    "q7B_multimodal_pipeline" ->
      """SELECT source, count(*) AS n_assets,
        |  round(avg(strlen(text)), 4) AS avg_bytes,
        |  count(DISTINCT sha256(text)) AS nd_media
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q7F_lang_id" ->
      """WITH docbg AS (
        |  SELECT doc_id, lang,
        |    unnest(list_distinct(list_transform(range(1, len(text)), i -> text[i:i+1]))) AS bg
        |  FROM documents),
        |prof AS (
        |  SELECT lang AS cand, bg FROM (
        |    SELECT lang, bg,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, bg) AS rn
        |    FROM docbg GROUP BY lang, bg) WHERE rn <= 20),
        |scores AS (
        |  SELECT d.doc_id, d.lang, p.cand, count(*) AS score
        |  FROM docbg d JOIN prof p USING (bg) GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT doc_id, lang, cand FROM (
        |    SELECT doc_id, lang, cand,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, cand) AS rn
        |    FROM scores) WHERE rn = 1)
        |SELECT lang, cand AS pred_lang, count(*) AS n
        |FROM pred GROUP BY lang, cand ORDER BY lang, pred_lang""".stripMargin,
    "q7D_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |        s -> s IN ('the', 'a', 'of', 'and'))) AS INTEGER) AS stop_cnt,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
        |      AS distinct_cnt
        |  FROM documents)
        |SELECT doc_id, n_tokens, stop_cnt, distinct_cnt,
        |  CAST(((n_tokens - stop_cnt + distinct_cnt) * 5000) // n_tokens
        |    AS BIGINT) AS score_bp
        |FROM t ORDER BY score_bp DESC, doc_id LIMIT 25""".stripMargin,
    // doc_id is non-negative, so DuckDB's % matches Spark's pmod and both
    // engines' integer division floors identically
    "q7J_split_hash" ->
      """SELECT lang,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, n_chars,
        |    ((doc_id % 2147483648 * 1103515245 + 12345) % 2147483648 * 100)
        |      // 2147483648 AS b
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "q7K_pack_sequences" ->
      """SELECT lang, source, CAST((cum - tokens) // 2048 AS BIGINT) AS chunk,
        |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS chunk_tokens
        |FROM (
        |  SELECT lang, source, tokens,
        |    sum(tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT lang, source, doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |        FROM documents))
        |GROUP BY 1, 2, 3 ORDER BY lang, source, chunk""".stripMargin,
    "q7L_mix_weighted" ->
      """SELECT ((rn - 1) * 840) // wt AS mix_key, lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |    CAST(CASE WHEN lang = 'en' THEN 4
        |              WHEN lang IN ('de', 'fr') THEN 2 ELSE 1 END
        |      AS BIGINT) AS wt
        |  FROM documents)
        |ORDER BY mix_key, lang, doc_id LIMIT 100""".stripMargin,
    "q7M_sample_stratified" ->
      """SELECT lang, rn, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id % 2147483648 * 1103515245 + 12345) % 2147483648,
        |               doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    // the oracle is the brute-force spelling: every shared-shingle pair,
    // exact intersection counts, same integer threshold + basis points
    "q7N_dedup_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(3, len(t) + 1),
        |           i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |tok AS (SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
        |         any_value(a.sz) AS sa, any_value(b.sz) AS sb
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  (inter * 10000) // (sa + sb - inter) AS jac_bp
        |FROM pair
        |WHERE inter * 5 >= (sa + sb - inter) * 3
        |ORDER BY jac_bp DESC, id_a, id_b""".stripMargin,
    "q7O_quality_repetition" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |           FROM documents),
        |f AS (SELECT doc_id, w, count(*) AS c
        |      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
        |ts AS (SELECT doc_id, max(c) AS topc, CAST(sum(c) AS BIGINT) AS n
        |       FROM f GROUP BY 1),
        |bs AS (SELECT doc_id, lang, len(bg) AS nbg,
        |         len(list_distinct(bg)) AS dbg
        |       FROM (SELECT doc_id, lang,
        |               list_transform(range(2, len(toks) + 1),
        |                              i -> toks[i - 1] || ' ' || toks[i]) AS bg
        |             FROM t)),
        |m AS (SELECT lang, (topc * 10000) // n AS top_bp,
        |        CASE WHEN nbg = 0 THEN 0
        |             ELSE ((nbg - dbg) * 10000) // nbg END AS dup2_bp
        |      FROM ts JOIN bs USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN top_bp <= 1400 AND dup2_bp <= 650
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(max(top_bp) AS BIGINT) AS max_top_bp,
        |  CAST(max(dup2_bp) AS BIGINT) AS max_dup2_bp
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "q7P_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(3, len(t) + 1),
        |           i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |e AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh
        |      WHERE doc_id < 50),
        |tr AS (SELECT doc_id AS train_id, unnest(s) AS g FROM sh
        |       WHERE doc_id >= 50)
        |SELECT train_id, eval_id, count(*) AS n_shared
        |FROM tr JOIN e USING (g)
        |GROUP BY 1, 2
        |ORDER BY n_shared DESC, train_id, eval_id LIMIT 25""".stripMargin,
    "q7Q_bpe_merge_step" ->
      """WITH wc AS (
        |  SELECT word, count(*) AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY word)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM (
        |  SELECT wc, unnest(list_transform(range(1, len(word)),
        |           i -> word[i:i] || ' ' || word[i+1:i+1])) AS pair
        |  FROM wc)
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    // the oracle computes the same components by transitive closure
    // (recursive CTE), then sizes them by their minimum member id
    "q7R_dedup_components" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(3, len(t) + 1),
        |           i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |tok AS (SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, a.sz, b.sz
        |  HAVING count(*) * 5 >= (a.sz + b.sz - count(*)) * 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pair
        |  UNION SELECT id_b, id_a FROM pair),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
        |SELECT rep, CAST(count(*) AS BIGINT) AS n_members FROM (
        |  SELECT id, min(r) AS rep FROM reach GROUP BY id)
        |GROUP BY rep ORDER BY rep""".stripMargin,
    "q7V_quality_unigram_ce" ->
      """WITH tf AS (
        |  SELECT doc_id, lang, w, count(*) AS tf FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents)
        |  GROUP BY 1, 2, 3),
        |freq AS (SELECT w, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY w),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM freq)
        |SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf * -ln(c / n)) / sum(tf), 4) AS ce_nats
        |FROM tf JOIN freq USING (w) CROSS JOIN n
        |GROUP BY doc_id, lang
        |ORDER BY ce_nats DESC, doc_id LIMIT 25""".stripMargin,
    "q7W_dedup_spans" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(3, len(t) + 1),
        |           i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |tok AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) >= 1),
        |dfreq AS (SELECT g, count(*) AS df FROM tok GROUP BY g)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST((sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 10000) // count(*)
        |    AS BIGINT) AS dup_bp
        |FROM tok JOIN dfreq USING (g)
        |GROUP BY doc_id
        |ORDER BY dup_bp DESC, doc_id LIMIT 25""".stripMargin
  )
}
