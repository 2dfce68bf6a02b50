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
  */
object VecIngest {

  val TABLE = "vec_index"

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
    LlmOps.pqEncodeRows(prepped, cents, pq)
      .select(col("vec_id"), col("cid"),
        packCodes(col("codes")).as("codes_packed"), col("nsq"))
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
