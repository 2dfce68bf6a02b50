package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke + per-family hand-checked expectations at sf0.001
  * (SURVEY.md §5.2). The DuckDB oracle (driver-run) is the primary
  * correctness gate; these specs independently recompute a representative
  * query per family in plain Scala over collected fixture rows, so a
  * regression is caught at `sbt test` time without the oracle loop.
  */
class OperatorSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val events =
    graft.sources.Tables.eventsUs(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value", "ts_us")
      .collect()

  test("registry: every declared entry runs and returns rows at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.size == 105) // 95 oracle (incl. r16's q7X/q7Y) + q44 + q4E + q7A + q7C + q7E + q7G + q7H + q7S + q7T + q7U (SURVEY.md §7.5)
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("registry: every oracle key has a query; column names line up") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach { k => assert(qs.contains(k), k) }
    // the declared non-oracle entries (hash/seed-specific sketches)
    assert(qs.keySet -- SparkEntry.oracleSql.keySet ==
      Set("q44_agg_approx_distinct", "q4E_agg_approx_median",
        "q7A_dedup_minhash", "q7C_ann_simhash", "q7E_doc_fingerprint",
        "q7G_ann_ivf", "q7H_dedup_embed", "q7S_ann_ivfpq", "q7T_bpe_train",
        "q7U_bpe_tokenize"))
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // §2.2 filters — q10 recomputed from collected rows
  test("q10_filter_tag matches a plain Scala filter") {
    val got = SparkEntry.queries("q10_filter_tag")(spark, sf0001).count()
    val want = events.count(_.getString(2) == "purchase")
    assert(got == want && want > 0)
  }

  // §2.5 aggregations — q41 per-type counts recomputed
  test("q41_agg_group counts match a Scala groupBy") {
    val got = SparkEntry.queries("q41_agg_group")(spark, sf0001)
      .select("event_type", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = events.groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    assert(got == want)
  }

  // §2.5 — q44 HLL within ±5% of exact q43 (the declared property check)
  test("q44_agg_approx_distinct within 5% of exact q43") {
    val exact = SparkEntry.queries("q43_agg_count_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q44_agg_approx_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e drifts >5%")
    }
  }

  // §2.4 joins — q30 row count recomputed from keys
  test("q30_join_inner row count matches key-multiplicity product") {
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").collect().map(_.getLong(0))
    val custs = graft.sources.Tables.customer(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val want = orders.count(custs.contains)
    val got = SparkEntry.queries("q30_join_inner")(spark, sf0001).count()
    assert(got == want && want > 0)
  }

  // §2.4 — as-of join recomputed in Scala: for every output row the
  // matched click is the latest click at-or-before the purchase (ties by
  // click_id, same-instant clicks count as before — kind ordering).
  test("q37_join_asof picks the latest click at-or-before each purchase") {
    val byId = events.map(r => r.getLong(0) -> r).toMap
    val clicksByUser = events.filter(_.getString(2) == "click")
      .groupBy(_.getLong(1))
    val out = SparkEntry.queries("q37_join_asof")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pid, user, clickId) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val pTs = byId(pid).getLong(4)
      val want = clicksByUser(user)
        .filter(_.getLong(4) <= pTs)
        .maxBy(c => (c.getLong(4), c.getLong(0)))
        .getLong(0)
      assert(clickId == want, s"purchase $pid: asof picked $clickId, want $want")
    }
  }

  // §2.6 windows — q53 running sum recomputed for the busiest user
  test("q53_win_running cumulative sums match a Scala scan") {
    val purchases = events.filter(_.getString(2) == "purchase")
    val user = purchases.groupBy(_.getLong(1)).maxBy(_._2.length)._1
    val mine = purchases.filter(_.getLong(1) == user)
      .sortBy(r => (r.getLong(4), r.getLong(0)))
    val want = mine.scanLeft(0.0)((acc, r) => acc + r.getDouble(3)).tail
      .map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = SparkEntry.queries("q53_win_running")(spark, sf0001)
      .filter(col("user_id") === user)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy(x => mine.indexWhere(_.getLong(0) == x._1))
      .map(_._2)
    assert(got.toSeq == want.toSeq)
  }

  // §2.6 — q56's distributed ntile must equal the textbook window ntile
  test("q56_win_ntile equals single-window ntile(4)") {
    import org.apache.spark.sql.expressions.Window
    val want = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile",
        ntile(4).over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = SparkEntry.queries("q56_win_ntile")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == want)
  }

  // §2.7 — q61 top-k equals a Scala sort of collected rows
  test("q61_topk equals Scala sort-take") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
    val want = li.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy { case (k, ln, p) => (-p, k, ln) }.take(20).map(_._3).toSeq
    val got = SparkEntry.queries("q61_topk")(spark, sf0001)
      .select("l_extendedprice").collect().map(_.getDouble(0)).toSeq
    assert(got == want)
  }

  // §2.10 — exact dedup survivor count equals distinct texts
  test("q70_dedup_exact total survivors == distinct texts") {
    val got = SparkEntry.queries("q70_dedup_exact")(spark, sf0001)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    val want = graft.sources.Tables.documents(spark, sf0001)
      .select("text").distinct().count()
    assert(got == want)
  }

  // §2.1 ETL — q03's JSON flatten recomputed with a Scala regex parse
  test("q03_etl_flatten extracts props.k like a direct parse") {
    val propsById = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    val out = SparkEntry.queries("q03_etl_flatten")(spark, sf0001).collect()
    assert(out.length == propsById.size)
    out.foreach { r =>
      val want = kRe.findFirstMatchIn(propsById(r.getLong(0))).map(_.group(1).toInt)
      val got = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(got == want, s"event ${r.getLong(0)}")
    }
  }

  // §2.3 projections — q20 net price recomputed for every row.
  // (l_orderkey, l_linenumber) is NOT unique in this fixture (see the
  // q60 comment) → compare per-key MULTISETS of net prices.
  test("q20_proj_arith net price matches Scala arithmetic") {
    val want = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        // BigDecimal.valueOf (shortest-decimal) mirrors Spark's Round;
        // exact-binary BigDecimal(double) rounds edge values differently
        BigDecimal(java.math.BigDecimal.valueOf(
          r.getDouble(2) * (1 - r.getDouble(3)) * (1 + r.getDouble(4))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val got = SparkEntry.queries("q20_proj_arith")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == want)
  }

  // §2.8 set ops — q65 recomputed with Scala sets
  test("q65_intersect equals Scala set intersection") {
    def users(t: String) = events.filter(_.getString(2) == t).map(_.getLong(1)).toSet
    val want = users("purchase").intersect(users("error"))
    val got = SparkEntry.queries("q65_intersect")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty)
  }

  // §2.9 subqueries — q68's top-10-spenders semi-join recomputed
  test("q68_subq_in keeps exactly the top-10 spenders' orders") {
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
    val top10 = orders.groupBy(_.getLong(1)).view
      .mapValues(rs => BigDecimal(rs.map(_.getDouble(2)).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .toSeq.sortBy { case (k, s) => (-s, k) }.take(10).map(_._1).toSet
    val want = orders.filter(r => top10.contains(r.getLong(1))).map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q68_subq_in")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty)
  }

  // sessionize invariants on the real fixture
  test("q58_sessionize invariants: counts partition events") {
    val perUser = events.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    SparkEntry.queries("q58_sessionize")(spark, sf0001).collect().foreach {
      case Row(user: Long, n: Long, avgLen: Double) =>
        val total = perUser(user)
        assert(n >= 1 && n <= total)
        // n_sessions * avg_len == n_events (avg rounded to 4 decimals)
        assert(math.abs(n * avgLen - total) < n * 1e-3)
    }
  }

  // §2.4 — the approximate median must sit inside a tight band around
  // q4B's exact median (at accuracy 10000 the sketch's rank error is
  // ~1e-4, far finer than the fixture's value spacing)
  test("q4E_agg_approx_median tracks the exact q4B median per group") {
    val exact = SparkEntry.queries("q4B_agg_median")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = SparkEntry.queries("q4E_agg_approx_median")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, v) =>
      val e = exact(k)
      assert(math.abs(v - e) <= math.max(0.05 * math.abs(e), 1.0),
        s"$k: approx $v vs exact $e")
    }
  }

  // §2.10 training-pipeline ops: structural invariants beyond the oracle
  test("q7J_split_hash partitions the corpus and lands near 80/10/10") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val total = docs.count()
    val bySplit = SparkEntry.queries("q7J_split_hash")(spark, sf0001)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == total, "splits must partition the corpus")
    // LCG-uniform buckets: train ≈ 80% with generous slack for n=100
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("q7K_pack_sequences: chunks partition each shard and respect the budget") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = SparkEntry.queries("q7K_pack_sequences")(spark, sf0001).collect()
    assert(got.map(_.getLong(3)).sum == docs.count(), "docs must partition into chunks")
    // a doc STARTS in the chunk holding the tokens before it, so a chunk
    // overflows only by its last doc: tokens(chunk) < 2048 + max doc tokens
    val maxDoc = docs.selectExpr("max(size(split(text, ' ')))").head().getInt(0)
    got.foreach { r =>
      assert(r.getLong(4) < 2048L + maxDoc,
        s"chunk ${r.getString(0)}/${r.getString(1)}/${r.getLong(2)} too large")
    }
    // chunk ids per shard are contiguous from 0
    got.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (shard, rows) =>
      val ids = rows.map(_.getLong(2)).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"gap in chunks of $shard")
    }
  }

  test("q7L_mix_weighted delivers languages near their weights in every prefix") {
    val got = SparkEntry.queries("q7L_mix_weighted")(spark, sf0001).collect()
    assert(got.length == 100)
    // virtual-time keys are non-decreasing in delivery order
    val keys = got.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "mix must deliver in virtual-time order")
    // in the first 50, en (weight 4/10) must dominate but not monopolize
    val en50 = got.take(50).count(_.getString(1) == "en")
    assert(en50 >= 15 && en50 <= 35, s"en in first 50: $en50")
  }

  // §2.10 q7V — per-doc cross-entropy recomputed with an independent
  // plain-Scala unigram model over the collected corpus
  test("q7V_quality_unigram_ce matches a plain Scala unigram model") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val freq = docs.values.flatten.toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val total = freq.values.sum.toDouble
    val got = SparkEntry.queries("q7V_quality_unigram_ce")(spark, sf0001)
      .collect()
    assert(got.length == 25)
    got.foreach { r =>
      val toks = docs(r.getLong(0))
      assert(r.getLong(2) == toks.size.toLong)
      val want = toks.map(w => -math.log(freq(w) / total)).sum / toks.size
      assert(math.abs(r.getDouble(3) - want) < 1e-3,
        s"doc ${r.getLong(0)}: ${r.getDouble(3)} vs $want")
    }
    val scores = got.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted(Ordering[Double].reverse),
      "rows must arrive worst (highest CE) first")
  }

  // §2.10 q7W — duplicated-span coverage recomputed exactly (integers)
  test("q7W_dedup_spans matches a plain Scala duplicated-shingle count") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ")
        val sh = (0 to t.length - 3)
          .map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
        r.getLong(0) -> sh
      }.toMap
    val df = docs.values.flatten.toSeq.groupBy(identity)
      .view.mapValues(_.size).toMap
    val got = SparkEntry.queries("q7W_dedup_spans")(spark, sf0001).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val sh = docs(r.getLong(0))
      val nDup = sh.count(g => df(g) >= 2).toLong
      assert(r.getLong(1) == sh.size.toLong)
      assert(r.getLong(2) == nDup)
      assert(r.getLong(3) == nDup * 10000L / sh.size)
    }
    // and the 25 rows are exactly the true top-25 by (dup_bp desc, doc_id)
    val want = docs.toSeq.filter(_._2.nonEmpty).map { case (id, sh) =>
      (sh.count(g => df(g) >= 2).toLong * 10000L / sh.size, id)
    }.sortBy { case (bp, id) => (-bp, id) }.take(25).map(_._2)
    assert(got.map(_.getLong(0)).toSeq == want)
  }
}
