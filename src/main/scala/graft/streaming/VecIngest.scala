package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LlmOps

/** S15 — STREAMING vector-index maintenance: arriving embeddings are
  * IVF-PQ-encoded per-row and MERGEd into the `vec_index` registry, so
  * the q7S serving index stays fresh at ARRIVAL time instead of waiting
  * for a batch rebuild of the lake.
  *
  * The whole transform is stateless — the S14 pattern applied to q7S's
  * models: the coarse centroids and PQ codebooks are batch-trained,
  * driver-resident literals (the MLlib-KMeans model shape), so encoding
  * is one in-row pass through the codegen'd kernels (`graft_ivf_top` →
  * `graft_vec_sub` → `graft_pq_enc`) with no state, no shuffle, and no
  * watermark coupling. Stream ≡ batch by construction, pinned anyway in
  * VecIngestSpec.
  *
  * The 8 codes bit-pack into ONE BIGINT (`codes_packed`, big-endian by
  * subspace: code `i` in bits `8·(m−1−i)…`): Derby has no array type,
  * and a real serving index stores exactly this — m bytes per vector,
  * the q7S compression made literal in the sink schema. Packing
  * requires `m ≤ 8` and `ks ≤ 256` (the conf defaults; a wider model
  * needs a wider registry schema, enforced loudly here).
  *
  * Model-staleness trade (the S13-horizon argument's model-drift twin),
  * MEASURED in r13 (`graft.Scale vecdrift`, SCALING.md): the stream
  * encodes with the models as of attach time. Vectors from a
  * distribution the quantizers never saw still land in their nearest
  * cell — recall degrades gracefully, correctness never breaks (the
  * rerank is exact). Against worst-case queries from an UNSEEN
  * distribution, a stale index serves recall@5 of 0.86–0.88 when half
  * to all of the arrivals drifted to new cluster centers, vs 0.98–1.00
  * after a fresh batch retrain + re-encode (q7S's own build). Retrain
  * cadence guidance: staleness is bounded (~0.12 recall at TOTAL
  * distribution shift), so retrain on detected arrival-distribution
  * shift or a coarse schedule — never per batch; the registry MERGE
  * makes the re-encode an idempotent overwrite.
  *
  * "Detected arrival-distribution shift" is a CODE PATH, not advice
  * (r13): every encoded row already computes its squared assignment
  * residual ‖x − c(x)‖² — exactly the quantity whose growth degrades
  * PQ recall — so [[encoded]] publishes the batch mean through
  * `Dataset.observe` (an [[DRIFT_METRIC observed metric]]: aggregated
  * INSIDE the existing encode stage by an accumulator — zero extra
  * jobs, zero shuffle, nothing driver-side per row). [[baselineResid]]
  * prices the same statistic over the lake the models trained on (one
  * agg job at attach time), [[driftRatios]] reads the per-batch
  * mean/baseline ratios off the query's progress, and [[retrainDue]]
  * is the trigger. MEASURED separation (Scale `vecdrift`,
  * SCALE_r13.jsonl): in-distribution batches read 1.00–1.02, arrivals
  * half-drawn from unseen cluster centers read 3.67, fully drifted
  * 6.33 — and the fresh-retrain controls stay ≤ 1.21 — so the default
  * tolerance sits between noise and signal with multiples of margin
  * on both sides.
  */
object VecIngest {

  val TABLE = "vec_index"

  /** Name of the per-batch observed metric [[encoded]] publishes:
    * `mean_resid` (mean ‖x − c(x)‖² of the batch) and `rows`.
    */
  val DRIFT_METRIC = "graft_vecdrift"

  /** One BIGINT per vector: codes packed big-endian by subspace.
    * Spelled with shift/or, NOT `acc * 256 + c`: with ks = 256 the top
    * byte can set the sign bit, which is a well-defined bit pattern but
    * an ANSI-mode ARITHMETIC_OVERFLOW under multiplication. The
    * unpackers mask with `& 255` after the (arithmetic) right shift, so
    * a negative packed value round-trips exactly.
    */
  private def packCodes(codes: org.apache.spark.sql.Column) =
    aggregate(codes, lit(0L),
      (acc, c) => shiftleft(acc, 8).bitwiseOR(c.cast("long")))

  /** The per-row encode projection over a `(vec_id, embedding)` frame
    * (float or double array): `(vec_id, cid, codes_packed, nsq)`.
    * Identical code path for a static or streaming input.
    */
  def encoded(vecs: DataFrame, cents: Seq[LlmOps.IvfCent],
      pq: LlmOps.PqModel): DataFrame = {
    require(pq.m <= 8 && pq.ks <= 256,
      s"vec_index packs codes into one BIGINT: needs m <= 8 and ks <= 256, " +
        s"got m=${pq.m} ks=${pq.ks}")
    val s = vecs.sparkSession
    graft.functions.DotProduct.register(s)
    graft.functions.IvfTop.register(s)
    graft.functions.PqKernels.register(s)
    val prepped = vecs
      .withColumn("e", col("embedding").cast("array<double>"))
      .withColumn("nsq", expr("graft_dot(e, e)"))
      .select("vec_id", "e", "nsq")
    LlmOps.pqEncodeRows(prepped, cents, pq, withResid = true)
      .observe(DRIFT_METRIC,
        avg(col("resid_nsq")).as("mean_resid"),
        count(lit(1L)).as("rows"))
      .select(col("vec_id"), col("cid"),
        packCodes(col("codes")).as("codes_packed"), col("nsq"))
  }

  /** The drift baseline: mean squared assignment residual of the lake
    * at `d` under the session's cached models — what [[DRIFT_METRIC]]
    * reads on arrivals that look like the training distribution. One
    * agg job; price it once at attach time and hand the value to
    * [[driftRatios]]/[[retrainDue]] (a retrained model needs a fresh
    * baseline, which the model cache keys already force the caller to
    * think about).
    */
  def baselineResid(s: SparkSession, d: String): Double = {
    val (cents, _) = LlmOps.ivfModel(s, d)
    val pq = LlmOps.pqModel(s, d)
    LlmOps.pqEncodeRows(LlmOps.vectors(s, d), cents, pq, withResid = true)
      .agg(avg(col("resid_nsq"))).head.getDouble(0)
  }

  /** Per-batch drift ratios `(batchId, meanResid / baseline)` from a
    * query attached through [[attach]], oldest→newest, empty batches
    * skipped. Reads the progress history (no job): the observed metric
    * was already aggregated inside each batch's encode stage.
    */
  def driftRatios(q: StreamingQuery, baseline: Double): Seq[(Long, Double)] = {
    require(baseline > 0, s"drift baseline must be positive, got $baseline")
    q.recentProgress.toSeq.flatMap { p =>
      Option(p.observedMetrics.get(DRIFT_METRIC)).collect {
        case row if row.getAs[Long]("rows") > 0L =>
          p.batchId -> row.getAs[Double]("mean_resid") / baseline
      }
    }
  }

  /** The retrain trigger: the ROW-WEIGHTED mean residual of the last
    * `window` non-empty batches, over baseline, above `1 + tol`.
    * Default tol = 0.5 triggers at ratio 1.5 — under half the
    * measured half-drift signal (3.67) and a quarter of total drift
    * (6.33), yet above every measured in-distribution and
    * fresh-control reading (1.00–1.21) — `Scale vecdrift`,
    * SCALE_r13.jsonl — so it fires on real shift and not on
    * batch-size jitter.
    *
    * `window` (default 1 = latest batch only) is the stratification
    * dial: the statistic compares a batch mean against a LAKE-wide
    * baseline, so a source whose batches are subpopulation-PURE (one
    * tenant per file) can read above tol on an ordinary batch of a
    * heterogeneous lake with no drift at all (measured ~1.8 on the
    * VecIngestSpec bimodal fixture). Windowing across several batches
    * re-mixes the populations — row-weighted, so a small pure file
    * cannot outvote a large one — and the same fixture reads quiet at
    * `window` = its batch count while a genuine drift signal (6.33×)
    * still trips straight through a window that includes clean
    * batches.
    *
    * On `true`, the retrain recipe: fold the landing zone into the
    * lake (or point `d` at the grown lake), retrain — the model
    * caches key by (session, lake dir, confs), so a NEW dir retrains
    * by construction and an in-place-grown dir needs
    * `LlmOps.release(s)` first — take a fresh [[baselineResid]] from
    * the new models, and re-attach over the full source with a fresh
    * checkpoint: the keyed MERGE makes the re-encode an idempotent
    * overwrite, after which the registry again equals the batch index
    * of the grown lake and the same arrivals read ratio ≈ 1.
    * VecIngestSpec pins this whole loop.
    */
  def retrainDue(q: StreamingQuery, baseline: Double,
      tol: Double = 0.5, window: Int = 1): Boolean = {
    require(baseline > 0, s"drift baseline must be positive, got $baseline")
    require(window >= 1, s"window must be >= 1, got $window")
    val obs = q.recentProgress.toSeq.flatMap { p =>
      Option(p.observedMetrics.get(DRIFT_METRIC)).collect {
        case row if row.getAs[Long]("rows") > 0L =>
          (row.getAs[Double]("mean_resid"), row.getAs[Long]("rows"))
      }
    }.takeRight(window)
    obs.nonEmpty && {
      val rows = obs.map(_._2).sum.toDouble
      val mean = obs.map { case (m, n) => m * n }.sum / rows
      mean / baseline > 1.0 + tol
    }
  }

  /** Wires the streaming MERGE: models train in BATCH from the lake at
    * `d` (cached per session like every q7G/q7S consumer), the stream
    * encodes per-row and upserts keyed by `vec_id` — replay-safe
    * through the idempotent MERGE (the S7/S8 argument).
    */
  def attach(vecs: DataFrame, url: String, ckpt: String,
      s: SparkSession, d: String): StreamingQuery = {
    val (cents, _) = LlmOps.ivfModel(s, d)
    val pq = LlmOps.pqModel(s, d)
    DerbySink.attachAs(encoded(vecs, cents, pq), url, TABLE, "vec_id", ckpt)
      .start()
  }

  /** The retrain recipe of [[retrainDue]]'s scaladoc as ONE call
    * (VERDICT r14 #5 — the r14 vecloop campaign drove the detach →
    * retrain → re-attach choreography from campaign code; an operator
    * shouldn't re-implement the swap). Given a tripped trigger and a
    * GROWN lake at `d` (the old lake plus the drifted arrivals — the
    * caller owns the fold, because landing-zone compaction is
    * deployment-specific), this:
    *
    *  1. stops `old` (if still running) — the detached window begins;
    *     files landing from here until the new query drains are the
    *     handoff gap, covered by step 3's replay;
    *  2. drops the session's cached models (`LlmOps.release`) so the
    *     attach RETRAINS even when `d` is an in-place-grown dir — the
    *     model caches key by (session, dir, confs), and a reused dir
    *     would otherwise silently serve the stale models the trigger
    *     just condemned (a NEW dir retrains by construction; the
    *     release also drops the session's other cached frames, the
    *     price of a guaranteed-fresh swap);
    *  3. re-attaches over the SAME source with the REQUIRED-fresh
    *     checkpoint `ckpt`: starting from offset zero re-encodes every
    *     file under the new models, and the keyed MERGE makes that an
    *     idempotent overwrite — zero rows lost or duplicated through
    *     the handoff, gap files included (VecIngestSpec pins registry
    *     ≡ the grown lake's batch index). A RESUMED checkpoint would
    *     skip already-read files and leave their registry rows encoded
    *     by the condemned models, so an existing `ckpt` path is
    *     rejected loudly;
    *  4. prices the fresh drift baseline from the new models — the
    *     value the caller's next [[driftRatios]]/[[retrainDue]] needs.
    *
    * Returns (the attached query, the new baseline). The caller drains
    * with `processAllAvailable`/awaits normally; [[search]] against `d`
    * serves through the swapped registry immediately after the drain.
    */
  def retrainAndSwap(old: Option[StreamingQuery], vecs: DataFrame,
      url: String, ckpt: String, s: SparkSession, d: String)
      : (StreamingQuery, Double) = {
    // "fresh" = no committed offsets (an empty pre-created dir is fine
    // — Spark lays the checkpoint out inside it; the hazard is resumed
    // OFFSETS, which would skip files and leave stale-encoded rows)
    val off = new org.apache.hadoop.fs.Path(ckpt, "offsets")
    val fs = off.getFileSystem(s.sessionState.newHadoopConf())
    require(!fs.exists(off) || fs.listStatus(off).isEmpty,
      s"retrainAndSwap needs a FRESH checkpoint (full-source replay is " +
        s"the re-encode mechanism; resuming $ckpt would leave rows " +
        s"encoded by the condemned models)")
    old.foreach(_.stop())
    LlmOps.release(s)
    // the lake at `d` may have GROWN IN PLACE (this API's documented
    // shape) — drop the session's memoized file-index snapshot so the
    // retrain reads the grown corpus, not the resolve-once cache (r17;
    // the refreshByPath analogue, next to the model-cache drop above)
    graft.sources.Tables.invalidate(s, d)
    val q = attach(vecs, url, ckpt, s, d)
    (q, baselineResid(s, d))
  }

  /** q7S's search pipeline ANSWERED BY the stream-maintained registry:
    * the JDBC `vec_index` rows unpack back to code arrays via a static
    * chain of codegen'd shift/mask expressions (m is model metadata, so
    * the chain length is fixed at plan time — no HOF, no new kernel)
    * and flow through the SAME `LlmOps.pqSearch` plan the q7S registry
    * entry uses. At 100 TB the registry would live in a lake table
    * rather than one RDBMS, but the plan — cell equi-join, ADC rank,
    * broadcast shortlist rerank — is unchanged.
    *
    * `payload` is the exact-rerank refetch source: the frame holding
    * FULL `(vec_id, embedding)` vectors for every id the registry
    * serves. Default = the lake at `d`, which is right only while the
    * registry indexes exactly the lake. A STREAM-FRESH id (indexed at
    * arrival, payload not yet compacted into the lake) is dropped by
    * the rerank's inner join if the payload misses it — it consumes a
    * shortlist slot and is silently never returned — so a deployment
    * passes `lake ∪ landing-zone` here; the ingest that MERGEs the
    * index is the same ingest that lands the payload files, so the two
    * move together. Spec-pinned both ways in VecIngestSpec.
    */
  def search(s: SparkSession, d: String, url: String,
      payload: Option[DataFrame] = None): DataFrame = {
    val pq = LlmOps.pqModel(s, d)
    val index = indexFrame(
      s.read.format("jdbc")
        .option("url", url).option("dbtable", TABLE).load(), pq)
    LlmOps.pqSearch(s, d, index, payload)
  }

  /** Registry rows `(vec_id, cid, codes_packed, nsq)` → the q7S search
    * index frame `(cid, n_id, codes, nn)`: the static shift/mask unpack
    * chain (m is model metadata — fixed at plan time). Shared by
    * [[search]] and the Scale `vecdrift` staleness probe, so the probe
    * measures recall through the registry's exact pack→unpack path.
    */
  def indexFrame(rows: DataFrame, pq: LlmOps.PqModel): DataFrame = {
    val unpacked = (0 until pq.m).map(i =>
      shiftright(col("codes_packed"), 8 * (pq.m - 1 - i))
        .bitwiseAND(lit(255L)).cast("int"))
    rows.select(col("cid").cast("int").as("cid"),
      col("vec_id").as("n_id"),
      array(unpacked: _*).as("codes"),
      col("nsq").as("nn"))
  }
}
