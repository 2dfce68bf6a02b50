package graft

import org.scalatest.funsuite.AnyFunSuite

/** q7N prefix-filtered exact Jaccard join vs an independent brute-force
  * model (SURVEY.md §5.3). The operator only compares docs that share a
  * rare-prefix shingle; PPJoin's prefix lemma says that loses nothing at
  * Jaccard ≥ τ — this spec re-proves the lemma empirically on the fixture
  * by enumerating ALL pairs in plain Scala (split/sliding/intersect,
  * sharing no code with the SQL under test) and demanding exact set
  * equality of (id_a, id_b, jac_bp).
  */
class JaccardSpec extends AnyFunSuite {
  import SparkTestBase._

  private def model(sfDir: String): Seq[(Long, Long, Long)] = {
    val sets = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        r.getLong(0) -> w.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty).sortBy(_._1)
    for {
      i <- sets.indices
      j <- (i + 1) until sets.length
      (a, sa) = sets(i)
      (b, sb) = sets(j)
      inter = sa.intersect(sb).size
      uni = sa.size + sb.size - inter
      if inter * 5 >= uni * 3
    } yield (a, b, inter.toLong * 10000 / uni)
  }

  test("q7N equals the all-pairs brute-force model at sf0.001") {
    val got = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = model(sf0001)
    assert(want.nonEmpty, "fixture has no near-dup pairs — precondition broken")
    assert(got.toSet == want.toSet,
      s"missing=${want.toSet -- got.toSet} extra=${got.toSet -- want.toSet}")
    // and the declared output order is (jac_bp desc, id_a, id_b)
    assert(got == got.sortBy(t => (-t._3, t._1, t._2)))
  }

  test("positional filter loses nothing on random corpora (seeded)") {
    // The PPJoin positional filter prunes candidate rows by a per-match
    // overlap upper bound; its completeness argument leans on the size
    // filter and the df-rare-first order. Stress it beyond the fixture:
    // random tiny-vocabulary corpora (many near-dups, many boundary
    // sizes) must still exactly equal the brute-force model.
    import spark.implicits._
    val vocab = Array("red", "blue", "green", "ox", "ant", "fox")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 120L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "),
          "en", "web", n.toLong)
      }
      val dir = tmpDir(s"graft-jacc-rand$seed")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q7N_dedup_jaccard")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == model(dir).toSet, s"seed=$seed")
    }
  }

  test("dfreq broadcast is gated on measured cardinality — both branches agree") {
    // VERDICT r6 #4: the broadcast hint on the shingle-df table must be
    // conditional — forced, it OOMs the driver on open-domain corpora
    // where distinct shingles grow with the data. Below the limit the
    // hint is applied; at limit 0 the same query must plan a plain
    // shuffle equi-join and return identical rows.
    val key = "spark.graft.jaccard.broadcastShingleLimit"
    // release() before each build: the branch decision bakes into the
    // CACHED pair table at first construction, so each branch needs a
    // fresh build. Assertions COLLECT ResolvedHint nodes from the
    // ANALYZED plan (the optimized plan substitutes the persisted
    // subtree with InMemoryRelation, hiding the hint; matching the
    // rendered plan STRING is brittle across Spark hint pretty-printing
    // — ADVICE r7).
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    def rows() = {
      graft.operators.LlmOps.release(spark)
      SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
    }
    def bcHints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
    val bc = rows()
    val bcRows = bc.collect().toSeq
    assert(bcHints(bc).nonEmpty,
      "default (closed-vocabulary) branch lost the broadcast hint")
    spark.conf.set(key, "0")
    try {
      val plain = rows()
      assert(bcHints(plain).isEmpty, "limit 0 must drop the broadcast hint")
      assert(plain.collect().toSeq == bcRows, "branches disagree on results")
    } finally {
      spark.conf.unset(key)
      graft.operators.LlmOps.release(spark)
    }
  }

  test("r17 prefix-persist dial: cached prefix table returns identical " +
    "pairs") {
    // spark.graft.jaccard.prefixPersist=true caches the prefix table so
    // the candidate self-join reads it twice instead of executing the
    // prefix pipeline twice — a scale dial (off by default at fixture
    // scale; see the jaccardCandidates comment). Pairs must be
    // bit-identical either way.
    def rows() = {
      graft.operators.LlmOps.release(spark)
      SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001).collect().toSeq
    }
    val dflt = rows()
    spark.conf.set("spark.graft.jaccard.prefixPersist", "true")
    try assert(rows() == dflt, "prefixPersist branches disagree on results")
    finally {
      spark.conf.unset("spark.graft.jaccard.prefixPersist")
      graft.operators.LlmOps.release(spark)
    }
  }

  test("r15 staged-footprint dial: checkpointed candidate stage returns " +
    "identical pairs") {
    // spark.graft.jaccard.stageDir checkpoints dfreq and the prefix
    // table to parquet in separate jobs (lineage cut → a disk-bound
    // host's peak scratch is max-not-sum of the corpus exchanges); the
    // result must be bit-identical to the in-one-job plan — it is the
    // same dataflow with materialization boundaries inserted.
    val base = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(base.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    spark.conf.set("spark.graft.jaccard.stageDir", dir)
    try {
      graft.operators.LlmOps.release(spark)
      val stagedRows = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(stagedRows == base, "staged branch disagrees")
      // the checkpoint actually landed: both intermediates on disk
      val staged = new java.io.File(dir).listFiles().map(_.getName)
      assert(staged.exists(_.startsWith("dfreq_")) &&
        staged.exists(_.startsWith("prefix_")), staged.mkString(","))
      // release() owns the staged scratch (ADVICE r15): a long-lived
      // session rebuilding q7N must not accumulate UUID-fresh parquet
      graft.operators.LlmOps.release(spark)
      val left = new java.io.File(dir).listFiles().map(_.getName)
      assert(!left.exists(n => n.startsWith("dfreq_") ||
        n.startsWith("prefix_")), s"release left staged files: ${left.mkString(",")}")
    } finally {
      spark.conf.unset("spark.graft.jaccard.stageDir")
      graft.operators.LlmOps.release(spark)
      // the temp dir itself is the test's to remove (empty post-release)
      new java.io.File(dir).delete()
    }
  }

  test("q7N candidates meet on equi-joins — never a cartesian/nested-loop") {
    val p = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q7N verify runs the threshold-aware early-exit kernel") {
    // the ANALYZED plan must carry graft_isect_ge_sorted (the executed
    // plan hides it behind the persisted InMemoryRelation): a regression
    // to the full-walk kernel — or worse, array_intersect's per-row hash
    // set — doubles the measured verify cost at the 10x point (SCALING.md)
    graft.operators.LlmOps.release(spark)
    val analyzed = SparkEntry.queries("q7N_dedup_jaccard")(spark, sf0001)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("graft_isect_ge_sorted"), analyzed.take(2000))
    graft.operators.LlmOps.release(spark)
  }
}
