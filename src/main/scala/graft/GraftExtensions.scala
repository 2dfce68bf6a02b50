package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigramSet, BigramStatsExpr, DotProduct, IvfTop, MinHashSig, ModelLit, ModelVecLit, PqAdc, PqEncode, ShingleSet, SimhashBands, SortedIntersect, SortedIntersectGe, TokenCountsExpr, VecSub, WinnowFpExpr}

/** Cluster-wide registration of the graft codegen kernels via the
  * standard Spark extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * The per-object `register(spark)` helpers cover a session the library
  * builds itself (Verify/Bench/tests and every operator entry point call
  * them idempotently), but a DEPLOYMENT — a thousand-executor cluster
  * whose sessions are created by a platform, a JDBC gateway, a notebook
  * kernel — wants the kernels present in EVERY session without code
  * changes; `spark.sql.extensions` is Spark's own mechanism for exactly
  * that, and it registers into the shared function registry the session
  * CLONES from, so `spark.sql("SELECT graft_dot(a, b) …")` works in SQL
  * text with no Scala imports at all.
  *
  * Injected here are the twelve Catalyst `Expression` kernels (all
  * codegen'd, all whole-stage-codegen friendly):
  *
  *  - `graft_dot(a, b)` — double-array dot product (q76/q77/q78/q7C).
  *  - `graft_minhash_row(shingles)` — K-long MinHash signature (q7A/S12).
  *  - `graft_isect_sorted(a, b)` — sorted-distinct intersection size.
  *  - `graft_isect_ge_sorted(a, b, num, den)` — threshold-aware
  *    early-exit intersection test (q7N's verify).
  *  - `graft_ivf_top(e, cents, cnsqs, p)` — IVF cell scoring (q7G/q7S).
  *  - `graft_pq_enc(e, codebooks, cnsqs, ks)` — product-quantization
  *    encoding (q7S's compressed index).
  *  - `graft_pq_adc(qe, codes, codebooks)` — asymmetric-distance
  *    approximate inner product over PQ codes (q7S's candidate ranking).
  *  - `graft_vec_sub(a, b)` — element-wise difference (q7S's IVF-ADC
  *    residual at index-build time).
  *  - `graft_bigrams(text)` — distinct char-bigram set (q7F/S14's
  *    language-ID features) in one byte-level pass.
  *  - `graft_simhash_bands(e, planes, bands, bits)` — all SimHash LSH
  *    band values in one pass (q7C/q7H's bucketing; O(1)-size plan at
  *    any n-scaled geometry).
  *  - `graft_token_counts(toks)` — per-doc distinct-token counts in-row
  *    (q7O/q7V/pipeline quality: deletes the (doc, token) exchange).
  *  - `graft_bigram_stats(toks)` — adjacent-bigram count + distinct
  *    count in one pass (q7O's duplicate-bigram fraction).
  *
  * The one non-Expression function, the `graft_minhash` UDAF (the
  * explode-based aggregation spelling kept for parity testing), stays
  * session-registered via [[graft.functions.MinHash.register]]: a Scala
  * `Aggregator` has no stable Expression constructor to inject, and no
  * operator hot path uses it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.kernels.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  /** Single source of truth for the injectable kernel surface — the
    * spec walks this list so a future kernel cannot be added without
    * joining the extension point.
    */
  private[graft] val kernels: Seq[(String, Class[_], Builder)] = Seq(
    ("graft_dot", classOf[DotProduct],
      args => DotProduct(args.head, args(1))),
    ("graft_minhash_row", classOf[MinHashSig],
      args => MinHashSig(args.head)),
    ("graft_isect_sorted", classOf[SortedIntersect],
      args => SortedIntersect(args.head, args(1))),
    ("graft_isect_ge_sorted", classOf[SortedIntersectGe],
      args => SortedIntersectGe(args.head, args(1), args(2), args(3))),
    ("graft_ivf_top", classOf[IvfTop],
      args => IvfTop(args.head, args(1), args(2), args(3))),
    ("graft_pq_enc", classOf[PqEncode],
      args => PqEncode(args.head, args(1), args(2), args(3))),
    ("graft_pq_adc", classOf[PqAdc],
      args => PqAdc(args.head, args(1), args(2))),
    ("graft_vec_sub", classOf[VecSub],
      args => VecSub(args.head, args(1))),
    ("graft_bigrams", classOf[BigramSet],
      args => BigramSet(args.head)),
    ("graft_simhash_bands", classOf[SimhashBands],
      args => SimhashBands(args.head, args(1), args(2), args(3))),
    // r16: the in-row text-statistics pair — per-doc token counts
    // (deletes the corpus-scale (doc, token) exchange of q7O/q7V and
    // the pipeline calibration) and adjacent-bigram stats (replaces
    // the interpreted five-collection HOF spelling)
    ("graft_token_counts", classOf[TokenCountsExpr],
      args => TokenCountsExpr(args.head)),
    ("graft_bigram_stats", classOf[BigramStatsExpr],
      args => BigramStatsExpr(args.head)),
    // r17: the one-pass shingle/winnowing kernels and the model-literal
    // resolver (content-addressed driver-side store; SQL-text calls on
    // an unknown key fail loudly by construction — see ModelLit)
    ("graft_shingles", classOf[ShingleSet],
      args => ShingleSet(args.head)),
    ("graft_winnow_fp", classOf[WinnowFpExpr],
      args => WinnowFpExpr(args.head)),
    ("graft_model_lit", classOf[ModelVecLit], ModelLit.builder))
}
