package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** The composed training-data pipeline (VERDICT r15 #3): q7N/q7R dedup →
  * q7O/q7D/q7V quality → q7P decontaminate → q7J split → q7K pack → q7L
  * mix as ONE DAG. The load-bearing pin: the composed DAG's per-stage
  * outputs equal a stage-by-stage run with parquet MATERIALIZATION
  * BOUNDARIES between stages — composition (shared caches, reused
  * exchanges, slim columns) must be a pure optimization, never a
  * semantics change.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)

  test("composed DAG ≡ stage-by-stage with parquet boundaries between stages") {
    graft.operators.LlmOps.release(spark)
    val d = sf0001
    val composed = Pipeline.stages(spark, d).toMap
    val dir = tmpDir("graft-pipe")
    def mat(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$dir/$name")
      spark.read.parquet(s"$dir/$name")
    }
    try {
      val dedup = mat(Pipeline.dedupStage(spark, d), "dedup")
      assert(rows(dedup) == rows(composed("1_dedup")), "dedup stage diverged")
      val qual = mat(Pipeline.qualityStage(dedup), "qual")
      assert(rows(qual) == rows(composed("2_quality")), "quality stage diverged")
      val dec = mat(Pipeline.decontamStage(spark, d, qual), "dec")
      assert(rows(dec) == rows(composed("3_decontam")), "decontam stage diverged")
      val sp = mat(Pipeline.splitStage(dec), "sp")
      assert(rows(sp) == rows(composed("4_split")), "split stage diverged")
      val pk = mat(Pipeline.packStage(sp), "pk")
      assert(rows(pk) == rows(composed("5_pack")), "pack stage diverged")
      val mx = Pipeline.mixStage(pk)
      assert(rows(mx) == rows(composed("6_mix")), "mix stage diverged")
      // round(ce, 4) is the funnel's one float gate, and this test
      // compares it across DIFFERENT physical plans (cached chain vs
      // parquet-rooted), which may sum the CE terms in different orders
      // (ADVICE r16). A plan change moves the rounded value by at most
      // one 1e-4 step, so the bit-identity above is provably stable iff
      // no doc's rounded CE sits within that step of the 3.42 cut —
      // assert it, so a future fixture regeneration that lands a doc on
      // the boundary fails HERE with a diagnosis, not as a flake.
      val ces = Pipeline.qualitySignals(dedup)
        .select("ce_nats").collect().map(_.getDouble(0))
      assert(ces.nonEmpty && ces.forall(c => math.abs(c - 3.42) >= 2e-4),
        "a fixture doc's CE is within rounding distance of the cut — " +
          "cross-plan bit-identity not provable on this corpus")
      // and no stage is vacuously equal: the fixture corpus survives
      // (shrinking) through every gate
      val counts = Seq(composed("0_input"), dedup, qual, dec).map(_.count())
      assert(counts.head > 0 && counts == counts.sorted.reverse,
        s"doc stages must shrink monotonically from a non-empty input: $counts")
      assert(pk.count() > 0 && mx.count() == pk.count(),
        "pack must emit chunks; mix reorders, never drops")
    } finally graft.operators.LlmOps.release(spark)
  }

  test("q7X funnel rows are exactly the per-stage counts and checksums") {
    graft.operators.LlmOps.release(spark)
    try {
      val d = sf0001
      val st = Pipeline.stages(spark, d).toMap
      val fun = SparkEntry.queries("q7X_pipeline_funnel")(spark, d)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      import org.apache.spark.sql.functions._
      def agg(df: DataFrame, key: String): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col(key)).cast("long")).head()
        (r.getLong(0), r.getLong(1))
      }
      assert(fun("0_input") == agg(st("0_input"), "doc_id"))
      assert(fun("1_dedup") == agg(st("1_dedup"), "doc_id"))
      assert(fun("2_quality") == agg(st("2_quality"), "doc_id"))
      assert(fun("3_decontam") == agg(st("3_decontam"), "doc_id"))
      assert(fun("4_split_train") ==
        agg(st("4_split").filter(col("split") === "train"), "doc_id"))
      assert(fun("5_pack") == agg(st("5_pack"), "chunk_tokens"))
      assert(fun("6_mix") == agg(st("6_mix"), "mix_key"))
      assert(fun.size == 7)
    } finally graft.operators.LlmOps.release(spark)
  }

  test("q7Y schedule is the head-100 of the mix stage in interleave order") {
    graft.operators.LlmOps.release(spark)
    try {
      val d = sf0001
      import org.apache.spark.sql.functions._
      val sched = SparkEntry.queries("q7Y_pipeline_schedule")(spark, d).collect()
      val want = Pipeline.stages(spark, d).toMap.apply("6_mix")
        .orderBy("mix_key", "lang", "source", "chunk").collect().take(100)
      assert(sched.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
      assert(sched.nonEmpty)
      // interleave sanity: the schedule is mix_key-sorted and the head
      // over-represents the heavy-weight lang exactly as q7L's virtual
      // time dictates (weight w ⇒ every 840/w key units)
      val keys = sched.map(_.getLong(0))
      assert(keys.sameElements(keys.sorted))
    } finally graft.operators.LlmOps.release(spark)
  }

  test("qualityStage ≡ qualitySignals gated by the same thresholds") {
    // the campaign calibrates on qualitySignals then gates it directly
    // (one materialized pass); the registry path runs qualityStage.
    // Pin the two spellings identical so calibration can never drift
    // from the gate.
    graft.operators.LlmOps.release(spark)
    try {
      import org.apache.spark.sql.functions._
      val dedup = Pipeline.dedupStage(spark, sf0001)
      val th = Pipeline.Defaults
      val viaSignals = Pipeline.qualitySignals(dedup)
        .filter(col("top_bp") <= th.topBpMax &&
          col("dup2_bp") <= th.dup2BpMax &&
          col("score_bp") >= th.scoreBpMin &&
          col("ce_nats") <= th.ceMax.get)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens").cast("long").as("tokens"))
      assert(rows(viaSignals) == rows(Pipeline.qualityStage(dedup)))
    } finally graft.operators.LlmOps.release(spark)
  }

  test("vocab broadcast gate: on ≡ off ≡ auto (identical quality output)") {
    // r16 calibration dial: the tf ⋈ freq join broadcasts the
    // vocab-bounded frequency table under a measured gate (the Zipf
    // head token is a hot key in the shuffled spelling — 10.1× calib
    // scaling per 4× docs, SCALE_r16). The gate must be a pure plan
    // choice: all three modes return bit-identical rows.
    graft.operators.LlmOps.release(spark)
    val key = "spark.graft.pipeline.broadcastVocab"
    try {
      val dedup = Pipeline.dedupStage(spark, sf0001)
      spark.conf.set(key, "off")
      val off = rows(Pipeline.qualityStage(dedup))
      spark.conf.set(key, "on")
      assert(rows(Pipeline.qualityStage(dedup)) == off, "on != off")
      spark.conf.set(key, "auto")
      assert(rows(Pipeline.qualityStage(dedup)) == off, "auto != off")
      spark.conf.set(key, "bogus")
      intercept[IllegalArgumentException](Pipeline.qualityStage(dedup))
      assert(off.nonEmpty)
      // same cross-plan CE-boundary guard as the composed≡staged test
      // (ADVICE r16): on ≡ off ≡ auto compares broadcast vs shuffle
      // summation orders through the ROUND(ce,4) gate
      spark.conf.unset(key)
      val ces = Pipeline.qualitySignals(dedup)
        .select("ce_nats").collect().map(_.getDouble(0))
      assert(ces.forall(c => math.abs(c - 3.42) >= 2e-4),
        "a fixture doc's CE is within rounding distance of the cut")
    } finally {
      spark.conf.unset(key)
      graft.operators.LlmOps.release(spark)
    }
  }

  test("conf surface: spark.graft.pipeline.* re-gates the funnel; defaults unchanged") {
    // VERDICT r16 #1: the gates must be conf turns, not recompiles —
    // and with nothing set the funnel must be bit-identical to the
    // in-code Defaults (the oracle-pinned r16 rows).
    graft.operators.LlmOps.release(spark)
    val d = sf0001
    def byStage(s: Set[Seq[Any]]): Map[Any, Seq[Any]] =
      s.map(r => r.head -> r).toMap
    try {
      val defRows = rows(Pipeline.funnel(spark, d))
      // a maximal score floor: only all-distinct stopword-free docs
      // reach 10000 bp, so the quality gate tightens for real
      spark.conf.set("spark.graft.pipeline.scoreBpMin", "10000")
      val strict = rows(Pipeline.funnel(spark, d))
      assert(strict != defRows, "a non-default score gate must change the funnel")
      // stages UPSTREAM of the re-gated one are untouched
      assert(byStage(strict)("0_input") == byStage(defRows)("0_input"))
      assert(byStage(strict)("1_dedup") == byStage(defRows)("1_dedup"))
      val nQual = (s: Set[Seq[Any]]) =>
        byStage(s)("2_quality")(1).asInstanceOf[Long]
      assert(nQual(strict) < nQual(defRows),
        "the stricter floor must shrink the quality stage")
      spark.conf.unset("spark.graft.pipeline.scoreBpMin")
      assert(rows(Pipeline.funnel(spark, d)) == defRows,
        "unset confs must restore the default funnel bit-identically")
      // ceMax=none disables the CE gate (the calibration posture)
      spark.conf.set("spark.graft.pipeline.ceMax", "none")
      val unCe = rows(Pipeline.funnel(spark, d))
      assert(nQual(unCe) >= nQual(defRows))
      spark.conf.unset("spark.graft.pipeline.ceMax")
      // parse failures NAME the conf (the candBudget pattern)
      spark.conf.set("spark.graft.pipeline.ceMax", "bogus")
      val e = intercept[IllegalArgumentException](Pipeline.funnel(spark, d))
      assert(e.getMessage.contains("spark.graft.pipeline.ceMax"))
      spark.conf.unset("spark.graft.pipeline.ceMax")
      spark.conf.set("spark.graft.pipeline.weights", "en-4")
      val e2 = intercept[IllegalArgumentException](Pipeline.funnel(spark, d))
      assert(e2.getMessage.contains("spark.graft.pipeline.weights"))
      spark.conf.unset("spark.graft.pipeline.weights")
      spark.conf.set("spark.graft.pipeline.packBudget", "0")
      val e3 = intercept[IllegalArgumentException](Pipeline.funnel(spark, d))
      assert(e3.getMessage.contains("spark.graft.pipeline.packBudget"))
    } finally {
      Seq("scoreBpMin", "ceMax", "weights", "packBudget", "dedupMode")
        .foreach(k => spark.conf.unset(s"spark.graft.pipeline.$k"))
      graft.operators.LlmOps.release(spark)
    }
  }

  test("degenerate corpus: q7X funnels 7 rows of zeros, q7Y schedules nothing") {
    // VERDICT r16 what's-wrong #1: sum() over zero rows is NULL — the
    // probe's Row.getLong and the funnel checksums must coalesce, so an
    // empty documents table degrades to an all-zero funnel, not a crash.
    graft.operators.LlmOps.release(spark)
    import spark.implicits._
    val dir = tmpDir("graft-pipe-empty")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val fun = SparkEntry.queries("q7X_pipeline_funnel")(spark, dir).collect()
      assert(fun.length == 7, s"funnel must keep its 7 stage rows, got ${fun.length}")
      assert(fun.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
        "every stage of an empty corpus is 0 units / 0 checksum")
      assert(SparkEntry.queries("q7Y_pipeline_schedule")(spark, dir).count() == 0L)
    } finally graft.operators.LlmOps.release(spark)
  }

  test("both registry entries declare oracle SQL (full cross-engine chain)") {
    assert(SparkEntry.oracleSql.contains("q7X_pipeline_funnel"))
    assert(SparkEntry.oracleSql.contains("q7Y_pipeline_schedule"))
    assert(SparkEntry.queries.contains("q7X_pipeline_funnel"))
    assert(SparkEntry.queries.contains("q7Y_pipeline_schedule"))
  }
}
