package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, SortedIntersect}

/** The codegen'd dot-product expression must agree bit-for-bit with the
  * sequential fold it replaced (SURVEY.md §5.3: kernel vs BLAS-free
  * reference on random vectors) — on values, nulls, and length mismatch.
  */
class KernelSpec extends AnyFunSuite {
  import SparkTestBase._

  private def refDot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(64, Gen.chooseNum(-10.0, 10.0))

  test("graft_dot equals the sequential-fold reference on random vectors") {
    DotProduct.register(spark)
    import spark.implicits._
    val params = Gen.Parameters.default
    val rows = (0 until 200).map { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong)
      val a = vecGen.pureApply(params, seed)
      val b = vecGen.pureApply(params, seed.next)
      (a, b, refDot(a, b))
    }
    val got = rows.toDF("a", "b", "want")
      .withColumn("got", expr("graft_dot(a, b)"))
      .collect()
    got.foreach { r =>
      // bit-exact: identical operation order
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("graft_dot null handling and length mismatch") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))), // extra elements ignored
      (None, Some(Seq(1.0))),                            // null array → null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])) // empty → 0.0
    ).toDF("a", "b").withColumn("d", expr("graft_dot(a, b)"))
    val out = df.select("d").collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("graft_ivf_top matches brute-force ranking and tie-breaks toward the smaller index") {
    graft.functions.IvfTop.register(spark)
    import spark.implicits._
    val params = Gen.Parameters.default
    val dim = 16
    val k = 23
    val rnd = new scala.util.Random(7)
    val cents = Seq.fill(k)(Seq.fill(dim)(rnd.nextGaussian()))
    val cnsqs = cents.map(c => refDot(c, c))
    def model(e: Seq[Double], p: Int): Seq[Int] =
      cents.indices
        .map(i => (refDot(e, cents(i)) / math.sqrt(cnsqs(i)), i))
        // stable sort by score desc — equal scores keep index order,
        // the kernel's declared tie rule
        .sortBy { case (cs, _) => -cs }
        .take(p).map(_._2)
    val vg: Gen[List[Double]] = Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))
    val vecs = (0 until 100).map(i =>
      vg.pureApply(params, org.scalacheck.rng.Seed(100 + i)))
    for (p <- Seq(1, 3, 7, k, k + 5)) {
      val got = vecs.map(v => (v, model(v, p)))
        .toDF("e", "want")
        .withColumn("got", call_function("graft_ivf_top", col("e"),
          typedLit(cents), typedLit(cnsqs), lit(p)))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Int](2) == r.getSeq[Int](1), s"p=$p e=${r.getSeq[Double](0).take(3)}")
      }
    }
    // a DUPLICATED centroid forces exact score ties: both copies must
    // appear with the earlier index first
    val dup = cents.head
    val tied = Seq((Seq.fill(dim)(1.0), Seq.empty[Int])).toDF("e", "want")
      .withColumn("got", call_function("graft_ivf_top", col("e"),
        typedLit(Seq(dup, dup)), typedLit(Seq(refDot(dup, dup), refDot(dup, dup))),
        lit(2)))
      .collect()
    assert(tied.head.getSeq[Int](2) == Seq(0, 1))
    // a ZERO centroid scores 0/0 = NaN; the total order must rank NaN
    // LARGEST (matching reverse(array_sort(..)) semantics) regardless of
    // arrival position — a bare `>` descent would drop the best finite
    // cell when NaN sits mid-array (review r9)
    val zc = Seq.fill(dim)(0.0)
    val c5 = cents(5); val c9 = cents(9)
    val e = Seq.fill(dim)(1.0)
    val expectFinite =
      if (refDot(e, c5) / math.sqrt(refDot(c5, c5)) >=
          refDot(e, c9) / math.sqrt(refDot(c9, c9))) 1 else 3
    val nan = Seq((e, 0)).toDF("e", "z")
      .withColumn("got", call_function("graft_ivf_top", col("e"),
        typedLit(Seq(zc, c5, zc, c9)),
        typedLit(Seq(0.0, refDot(c5, c5), 0.0, refDot(c9, c9))),
        lit(3)))
      .collect()
    assert(nan.head.getSeq[Int](2) == Seq(0, 2, expectFinite))
  }

  test("graft_isect_sorted equals set-intersection size on random sorted sets") {
    SortedIntersect.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i sh$i g$i") // multi-word, like shingles
    val rows = (0 until 300).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    rows.toDF("a", "b", "want")
      .withColumn("got", expr("graft_isect_sorted(a, b)"))
      .collect()
      .foreach(r => assert(r.getInt(2) == r.getInt(3)))
  }

  test("graft_isect_sorted agrees with array_intersect on the sorted shingle data") {
    // end-to-end guard for the q7N verify swap: on the actual persisted
    // shingle sets (pre-sorted by construction), the codegen'd walk must
    // equal the built-in set intersection for every near-dup pair
    SortedIntersect.register(spark)
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3) // sequence(1, 0) would step DOWN
      .select(col("doc_id"),
        expr("array_sort(array_distinct(transform(sequence(1, greatest(size(w)-2, 0)), i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))))").as("s"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")).limit(2000)
      .select(expr("graft_isect_sorted(a.s, b.s)").as("got"),
        size(array_intersect(col("a.s"), col("b.s"))).as("want"))
      .collect()
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graft_isect_sorted matches array_intersect on non-ASCII data under array_sort") {
    // the kernel's two-pointer walk assumes the arrays arrive in UTF8
    // BINARY order — exactly what Spark's array_sort produces for
    // StringType. Open-domain corpora are not ASCII, and UTF-16-based
    // orderings (e.g. Scala's .sorted) disagree with binary order beyond
    // the BMP, so the parity must be pinned on unicode content where the
    // sort and the walk both come from Spark.
    SortedIntersect.register(spark)
    import spark.implicits._
    val vocab = Array("müller straße", "日本 語 テスト", "été à paris",
      "😀 emoji gram", "Ωμέγα άλφα βήτα", "zzz plain ascii",
      "ß sharp s", "ñandú ñu ñoño", "ZERO\u0000byte", "mixed 日本 ascii")
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { _ =>
      (Seq.fill(6)(vocab(rnd.nextInt(vocab.length))).distinct,
        Seq.fill(6)(vocab(rnd.nextInt(vocab.length))).distinct)
    }
    rows.toDF("a0", "b0")
      .select(expr("array_sort(array_distinct(a0))").as("a"),
        expr("array_sort(array_distinct(b0))").as("b"))
      .withColumn("got", expr("graft_isect_sorted(a, b)"))
      .withColumn("want", size(array_intersect(col("a"), col("b"))))
      .collect()
      .foreach(r => assert(r.getAs[Int]("got") == r.getAs[Int]("want")))
  }

  test("graft_isect_sorted null and empty handling") {
    SortedIntersect.register(spark)
    import spark.implicits._
    val out = Seq(
      (Some(Seq("a", "b")), Some(Seq("b", "c"))),
      (None, Some(Seq("a"))),
      (Some(Seq.empty[String]), Some(Seq("a")))
    ).toDF("a", "b").withColumn("c", expr("graft_isect_sorted(a, b)"))
      .select("c").collect()
    assert(out(0).getInt(0) == 1)
    assert(out(1).isNullAt(0))
    assert(out(2).getInt(0) == 0)
  }

  test("graft_isect_ge_sorted: exact-kernel parity on random sorted sets") {
    // the threshold-aware early-exit kernel must agree with the exact
    // kernel on EVERY pair: exact count when jaccard ≥ num/den, -1
    // otherwise — across thresholds, including boundary-hugging pairs
    SortedIntersect.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 60).map(i => f"w$i%02d sh$i g$i")
    val rows = (0 until 400).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      (a, b)
    }
    for ((num, den) <- Seq((3, 5), (1, 2), (9, 10), (1, 10))) {
      rows.toDF("a", "b")
        .withColumn("exact", expr("graft_isect_sorted(a, b)"))
        .withColumn("ge", expr(s"graft_isect_ge_sorted(a, b, $num, $den)"))
        .collect()
        .foreach { r =>
          val (na, nb) = (r.getSeq[String](0).size, r.getSeq[String](1).size)
          val exact = r.getInt(2)
          val want =
            if (exact.toLong * (num + den) >= num.toLong * (na + nb)) exact
            else -1
          assert(r.getInt(3) == want, s"num=$num den=$den a=$na b=$nb")
        }
    }
  }

  test("graft_isect_ge_sorted: q7N fixture parity with the exact filter") {
    // end-to-end guard for the q7N verify swap: on the actual shingle
    // sets, ge(a, b, 3, 5) ≥ 0 must hold exactly when the old spelling
    // inter·5 ≥ uni·3 held, and the returned count must then be exact
    SortedIntersect.register(spark)
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("array_sort(array_distinct(transform(sequence(1, greatest(size(w)-2, 0)), i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))))").as("s"))
    val got = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")).limit(2000)
      .select(expr("graft_isect_sorted(a.s, b.s)").as("exact"),
        (size(col("a.s")) + size(col("b.s"))).as("tot"),
        expr("graft_isect_ge_sorted(a.s, b.s, 3, 5)").as("ge"))
      .collect()
    var passes = 0
    got.foreach { r =>
      val exact = r.getInt(0)
      val uni = r.getInt(1) - exact
      val want = if (exact * 5 >= uni * 3) { passes += 1; exact } else -1
      assert(r.getInt(2) == want)
    }
    assert(got.length > passes, "fixture produced no failing candidates")
  }

  test("graft_isect_ge_sorted null and empty handling") {
    SortedIntersect.register(spark)
    import spark.implicits._
    val out = Seq(
      (Some(Seq("a", "b")), Some(Seq("a", "b"))), // jac 1 ≥ 3/5 → 2
      (Some(Seq("a", "b")), Some(Seq("b", "c"))), // jac 1/3 < 3/5 → -1
      (None, Some(Seq("a"))),                     // null array → null
      (Some(Seq.empty[String]), Some(Seq("a")))   // jac 0/1 < 3/5 → -1
    ).toDF("a", "b").withColumn("c", expr("graft_isect_ge_sorted(a, b, 3, 5)"))
      .select("c").collect()
    assert(out(0).getInt(0) == 2)
    assert(out(1).getInt(0) == -1)
    assert(out(2).isNullAt(0))
    assert(out(3).getInt(0) == -1)
  }

  test("graft_pq_enc picks the L2-nearest subspace codeword; ties toward the smaller index") {
    graft.functions.PqKernels.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val mCount = 4; val ks = 7; val sub = 4; val dim = mCount * sub
    val cb = Seq.fill(mCount * ks)(Seq.fill(sub)(rnd.nextGaussian()))
    val cnsq = cb.map(c => refDot(c, c))
    // reference mirrors the kernel's algebra exactly — argmax of
    // (dot − ‖c‖²/2), first max wins — so FP rounding cannot diverge
    def enc(e: Seq[Double]): Seq[Int] =
      (0 until mCount).map { mi =>
        val s = e.slice(mi * sub, (mi + 1) * sub)
        var best = Double.NegativeInfinity; var bestJ = 0
        for (j <- 0 until ks) {
          val score = refDot(s, cb(mi * ks + j)) - 0.5 * cnsq(mi * ks + j)
          if (java.lang.Double.compare(score, best) > 0) { best = score; bestJ = j }
        }
        bestJ
      }
    val rows = (0 until 100).map { _ =>
      val e = Seq.fill(dim)(rnd.nextGaussian() * 3)
      (e, enc(e))
    }
    rows.toDF("e", "want")
      .withColumn("got", call_function("graft_pq_enc",
        col("e"), typedLit(cb), typedLit(cnsq), lit(ks)))
      .collect().foreach { r =>
        assert(r.getSeq[Int](2) == r.getSeq[Int](1))
        // brute-force L2 cross-check on the first subspace (the algebra
        // IS the L2 argmin, not just self-consistent)
        val e = r.getSeq[Double](0)
        val gotJ = r.getSeq[Int](2).head
        val d2 = (j: Int) => e.take(sub).zip(cb(j))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        assert((0 until ks).forall(j => d2(gotJ) <= d2(j) + 1e-9))
      }
    // a DUPLICATED codeword forces an exact tie → smaller index wins.
    // The probe's first subspace IS codeword 1, so the winner is
    // provably in {1, 3} (score = (‖e‖² − ‖e−c‖²)/2 is uniquely
    // maximal at distance 0) and the tie rule decides
    val dupCb = cb.updated(3, cb(1)) // subspace 0: codeword 3 := codeword 1
    val eTie = cb(1) ++ rows.head._1.drop(sub)
    val tied = Seq((eTie, 0)).toDF("e", "z")
      .withColumn("got", call_function("graft_pq_enc",
        col("e"), typedLit(dupCb),
        typedLit(dupCb.map(c => refDot(c, c))), lit(ks)))
      .collect().head.getSeq[Int](2)
    assert(tied.head == 1,
      s"tie must break toward the smaller duplicate index: $tied")
  }

  test("graft_vec_sub equals element-wise difference over the common prefix") {
    graft.functions.PqKernels.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 60).map { _ =>
      val n = 1 + rnd.nextInt(12)
      val a = Seq.fill(n)(rnd.nextGaussian() * 3)
      val b = Seq.fill(n)(rnd.nextGaussian() * 3)
      (a, b, a.zip(b).map { case (x, y) => x - y })
    }
    rows.toDF("a", "b", "want")
      .withColumn("got", call_function("graft_vec_sub", col("a"), col("b")))
      .collect().foreach(r =>
        assert(r.getSeq[Double](3) == r.getSeq[Double](2)))
    // length mismatch → common prefix (the graft_dot convention)
    val mis = Seq((Seq(1.0, 2.0, 9.0), Seq(0.5, 1.0), 0))
      .toDF("a", "b", "z")
      .withColumn("got", call_function("graft_vec_sub", col("a"), col("b")))
      .collect().head.getSeq[Double](3)
    assert(mis == Seq(0.5, 1.0))
  }

  test("graft_pq_adc equals the reference accumulation over selected codewords") {
    graft.functions.PqKernels.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val mCount = 4; val ks = 5; val sub = 4; val dim = mCount * sub
    val cb = Seq.fill(mCount * ks)(Seq.fill(sub)(rnd.nextGaussian()))
    val rows = (0 until 80).map { _ =>
      val qe = Seq.fill(dim)(rnd.nextGaussian() * 2)
      val codes = Seq.fill(mCount)(rnd.nextInt(ks))
      // one running accumulator in the kernel's exact term order — FP
      // equality must be bit-for-bit
      var want = 0.0
      for (mi <- 0 until mCount; t <- 0 until sub)
        want += qe(mi * sub + t) * cb(mi * ks + codes(mi))(t)
      (qe, codes, want)
    }
    rows.toDF("qe", "codes", "want")
      .withColumn("got",
        call_function("graft_pq_adc", col("qe"), col("codes"), typedLit(cb)))
      .collect().foreach(r => assert(r.getDouble(3) == r.getDouble(2)))
  }

  test("graft_bigrams equals the five-expression SQL spelling it replaced " +
    "(values AND first-occurrence order), unicode and edge cases included") {
    graft.functions.Bigrams.register(spark)
    import spark.implicits._
    val gen: Gen[String] = Gen.frequency(
      (8, Gen.listOf(Gen.frequency(
        (20, Gen.alphaNumChar), (4, Gen.const(' ')),
        (1, Gen.oneOf('é', 'ß', 'λ', '中', '文')))).map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.alphaChar.map(_.toString)))
    val params = Gen.Parameters.default
    val texts = (0 until 300).map(i =>
      gen.pureApply(params, org.scalacheck.rng.Seed(i.toLong))) ++
      Seq("", "a", "ab", "aa", "abab", "ééé", "中文中文", "a中b", "  ", "aß")
    val got = texts.toDF("text")
      .withColumn("kernel", expr(graft.operators.LlmOps.BigramSql))
      .withColumn("ref", expr(graft.operators.LlmOps.BigramSqlRef))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"text=${r.getString(0)}")
    }
  }

  test("graft_shingles equals the four-collection SQL spelling it replaced " +
    "(values AND sorted order), unicode and edge cases included (r17)") {
    graft.functions.Shingles.register(spark)
    import spark.implicits._
    val gen: Gen[String] = Gen.frequency(
      (8, Gen.listOf(Gen.frequency(
        (20, Gen.alphaNumChar), (6, Gen.const(' ')),
        (1, Gen.oneOf('é', 'ß', 'λ', '中', '文')))).map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.alphaChar.map(_.toString)))
    val params = Gen.Parameters.default
    val texts = (0 until 300).map(i =>
      gen.pureApply(params, org.scalacheck.rng.Seed(1000L + i))) ++
      Seq("", "a", "a b", "a b c", "a b c d", "a a a a a", "x y x y x y",
        "中 文 中 文", " a  b ", "a b c a b c", "aa ab ba bb aa ab")
    val got = texts.toDF("text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("kernel", expr(graft.operators.LlmOps.ShingleSql))
      .withColumn("ref", expr(graft.operators.LlmOps.ShingleSqlRef))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"text=${r.getString(0)}")
    }
  }

  test("graft_model_lit carries the exact typedLit value AND dataType " +
    "(nullability included), and rejects unknown keys (r17)") {
    import org.apache.spark.sql.functions.typedLit
    graft.functions.ModelLit.register(spark)
    val flat = Array.tabulate(130)(i => math.sin(i) * 10)
    val rows = Seq.tabulate(7)(r => Seq.tabulate(13)(c => r * 13.0 + c / 7.0))
    val vecCol = graft.functions.ModelLit.vec("spec_vec", flat)
    val matCol = graft.functions.ModelLit.mat("spec_mat", rows)
    val df = spark.range(3).select(
      vecCol.as("mv"), typedLit(flat.toSeq).as("tv"),
      matCol.as("mm"), typedLit(rows).as("tm"))
    // dataType parity — the driver's schema check sees identical types
    val sch = df.schema
    assert(sch("mv").dataType == sch("tv").dataType,
      s"vec dataType ${sch("mv").dataType} vs typedLit ${sch("tv").dataType}")
    assert(sch("mm").dataType == sch("tm").dataType,
      s"mat dataType ${sch("mm").dataType} vs typedLit ${sch("tm").dataType}")
    // value parity, row by row
    df.collect().foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
      assert(r.getSeq[Seq[Double]](2) == r.getSeq[Seq[Double]](3))
    }
    // interpreted eval parity too (the ModelLitExpr eval path)
    val ev = graft.functions.ModelVecLit(flat,
      0L, "x").eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until ev.numElements()).map(ev.getDouble) == flat.toSeq)
    // unknown key fails loudly, not with garbage
    val err = intercept[Exception] {
      spark.sql("SELECT graft_model_lit('no-such-key')").collect()
    }
    assert(err.getMessage.contains("unknown key") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown key")))
  }

  test("graft_winnow_fp equals the six-expression SQL spelling it replaced " +
    "(n_grams AND fp values AND order), unicode and edge cases included (r17)") {
    graft.functions.WinnowFp.register(spark)
    import spark.implicits._
    val gen: Gen[String] = Gen.frequency(
      (8, Gen.listOf(Gen.frequency(
        (20, Gen.alphaNumChar), (6, Gen.const(' ')),
        (1, Gen.oneOf('é', 'ß', 'λ', '中', '文')))).map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.alphaChar.map(_.toString)))
    val params = Gen.Parameters.default
    val texts = (0 until 300).map(i =>
      gen.pureApply(params, org.scalacheck.rng.Seed(2000L + i))) ++
      Seq("", "a", "a b", "a b c", "a b c d", "a b c d e",
        "a b c d e f g h i j k l", "x y x y x y x y x y x y x y",
        "中 文 中 文 中 文 中 文", " a  b ", "a a a a a a a a a a a a",
        (1 to 40).map(i => s"w${i % 5}").mkString(" "))
    val got = texts.toDF("text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("k", expr("graft_winnow_fp(w)"))
      .withColumn("grams", expr(graft.operators.LlmOps.WinnowGramsSqlRef))
      .withColumn("hashes", expr("transform(grams, g -> xxhash64(g))"))
      .withColumn("ref_fp", expr(graft.operators.LlmOps.WinnowFpSqlRef))
      .select(col("text"), col("k.n_grams"), col("k.fp"),
        size(col("grams")).as("ref_n"), col("ref_fp"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(3), s"n_grams text=${r.getString(0)}")
      assert(r.getSeq[Any](2) == r.getSeq[Any](4), s"fp text=${r.getString(0)}")
    }
  }

  test("graft_winnow_fp interpreted eval matches the one-pass walk " +
    "directly, incl. null-word drops and the empty-grams [null] row (r17)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def wf(words: String*): (Int, Seq[Any]) = {
      val row = graft.functions.WinnowFp.fingerprint(
        new GenericArrayData(words.map(w =>
          if (w == null) null else UTF8String.fromString(w)).toArray[Any]))
      val arr = row.getArray(1)
      (row.getInt(0), (0 until arr.numElements()).map(i =>
        if (arr.isNullAt(i)) null else arr.getLong(i)))
    }
    assert(wf() == ((0, Seq(null))))
    assert(wf("a", "b", "c") == ((0, Seq(null))))
    val (n1, fp1) = wf("a", "b", "c", "d")
    assert(n1 == 1 && fp1.size == 1 && fp1.head != null)
    // a null word drops every 4-window containing it: of the five
    // windows over 8 words, the two touching index 1 drop
    val (n2, _) = wf("a", null, "c", "d", "e", "f", "g", "h")
    assert(n2 == 3)
  }

  test("graft_shingles interpreted eval matches the sorted-distinct walk " +
    "directly (r17)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sh(words: String*): Seq[String] = {
      val arr = graft.functions.Shingles.sortedDistinct(
        new GenericArrayData(words.map(w =>
          if (w == null) null else UTF8String.fromString(w)).toArray[Any]))
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    assert(sh() == Seq())
    assert(sh("a", "b") == Seq())
    assert(sh("a", "b", "c") == Seq("a b c"))
    assert(sh("b", "a", "b", "a", "b") == Seq("a b a", "b a b"))
    // a null word nulls (and drops) every window containing it, the old
    // filter(x IS NOT NULL) semantics
    assert(sh("a", null, "c", "d", "e") == Seq("c d e"))
  }

  test("graft_bigrams interpreted eval matches the dedup walk directly") {
    import org.apache.spark.unsafe.types.UTF8String
    def bg(s: String): Seq[String] = {
      val arr = graft.functions.Bigrams.distinct(UTF8String.fromString(s))
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    assert(bg("") == Seq())
    assert(bg("a") == Seq())
    assert(bg("abab") == Seq("ab", "ba"))
    assert(bg("中文中") == Seq("中文", "文中"))
  }

  test("graft_bigrams clamps malformed/truncated UTF-8 instead of reading " +
    "past the buffer (ADVICE r13)") {
    import org.apache.spark.unsafe.types.UTF8String
    def bgBytes(bytes: Array[Byte]): Seq[String] = {
      val arr = graft.functions.Bigrams.distinct(
        UTF8String.fromBytes(bytes))
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    // a string ending in the FIRST byte of a multi-byte char: the
    // declared length of the tail char runs past the array — must
    // yield the well-formed prefix's bigrams, never an AIOOBE
    val truncated2 = "ab".getBytes("UTF-8") :+ 0xC3.toByte       // "ab" + ½ of é
    assert(bgBytes(truncated2) == Seq("ab"))
    val truncated3 = "ab".getBytes("UTF-8") ++
      "中".getBytes("UTF-8").take(2)                             // "ab" + ⅔ of 中
    assert(bgBytes(truncated3) == Seq("ab"))
    // lone truncated lead byte, and lead byte as the SECOND char
    assert(bgBytes(Array(0xE4.toByte)) == Seq())
    assert(bgBytes("a".getBytes("UTF-8") :+ 0xF0.toByte) == Seq())
    // well-formed text is unaffected by the clamp
    assert(bgBytes("aé".getBytes("UTF-8")) == Seq("aé"))
  }

  test("r16 graft_token_counts equals the explode→groupBy spelling it replaced " +
    "(same (w, c) set per doc), random token arrays + edge cases") {
    graft.functions.TokenCounts.register(spark)
    import spark.implicits._
    val tokGen: Gen[List[String]] = Gen.listOf(Gen.frequency(
      (6, Gen.oneOf("the", "a", "of", "tok1", "tok2", "中文", "é")),
      (2, Gen.alphaNumStr.suchThat(_.nonEmpty)),
      (1, Gen.const(""))))
    val params = Gen.Parameters.default
    val rows = (0 until 200).map(i =>
      (i.toLong, tokGen.pureApply(params, org.scalacheck.rng.Seed(100L + i)))) ++
      Seq((9001L, List[String]()), (9002L, List("x")), (9003L, List("x", "x", "x")))
    val df = rows.toDF("doc_id", "toks")
    val viaKernel = df.select(col("doc_id"),
        explode(expr("graft_token_counts(toks)")).as("tc"))
      .select(col("doc_id"), col("tc.w"), col("tc.c").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaAgg = df.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaKernel == viaAgg)
    // first-occurrence order within a doc (deterministic output)
    val ord = Seq((1L, List("b", "a", "b", "c", "a"))).toDF("doc_id", "toks")
      .select(expr("graft_token_counts(toks)").as("tc")).head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getInt(1)))
    assert(ord == Seq(("b", 2), ("a", 2), ("c", 1)))
  }

  test("r16 graft_bigram_stats equals the HOF spelling it replaced " +
    "(nbg = filtered zip_with size, dbg = its distinct size)") {
    graft.functions.BigramStats.register(spark)
    import spark.implicits._
    val tokGen: Gen[List[String]] = Gen.listOf(Gen.frequency(
      (6, Gen.oneOf("x", "y", "z", "中")),
      (2, Gen.alphaNumStr.suchThat(_.nonEmpty)),
      // pathological: tokens CONTAINING the separator — distinctness
      // must still be judged on the concatenated string, as the old
      // spelling did
      (1, Gen.const("a b")),
      (1, Gen.const(""))))
    val params = Gen.Parameters.default
    val rows = (0 until 200).map(i =>
      tokGen.pureApply(params, org.scalacheck.rng.Seed(200L + i))) ++
      Seq(List[String](), List("x"), List("x", "x", "x", "x"),
        // concat-collision shape: ("a b", "c") and ("a", "b c") both
        // concat to "a b c" — old spelling counts ONE distinct bigram
        List("a b", "c", "a", "b c"))
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "toks")
    val got = df.select(col("doc_id"),
        expr("graft_bigram_stats(toks)").as("bs"),
        expr(
          """filter(zip_with(toks,
            |              slice(toks, 2, size(toks)),
            |              (a, b) -> concat(a, ' ', b)),
            |       x -> x IS NOT NULL)""".stripMargin).as("bg"))
      .select(col("doc_id"), col("bs.nbg"), col("bs.dbg"),
        size(col("bg")).as("nbg2"), size(array_distinct(col("bg"))).as("dbg2"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(3) && r.getInt(2) == r.getInt(4),
        s"doc=${r.getLong(0)}: kernel (${r.getInt(1)},${r.getInt(2)}) vs " +
          s"HOF (${r.getInt(3)},${r.getInt(4)})")
    }
  }

  test("graft_simhash_bands equals the per-plane IF-chain spelling it replaced, every geometry") {
    // The r14 banding kernel must be bit-identical to the SQL tree —
    // same seeded ±1 planes, same `>= 0` sign test, same bit order —
    // including at geometries where the old tree still codegens. The
    // tree's generated code is O(bands·bits) and crossed the JVM 64 KB
    // method limit at the n-scaled geometries ((24,15)/(37,18)); the
    // kernel exists precisely so the corpus-scale banding pass stays in
    // whole-stage codegen there, so it must not change a single bucket.
    graft.functions.SimhashBands.register(spark)
    graft.functions.DotProduct.register(spark)
    import spark.implicits._
    val params = Gen.Parameters.default
    val rows = (0 until 120).map { i =>
      val seed = org.scalacheck.rng.Seed(1000 + i.toLong)
      Tuple1(vecGen.pureApply(params, seed))
    } :+ Tuple1(List.fill(64)(0.0)) :+ Tuple1(List(1.0, -2.0)) // zero + short
    val df = rows.toDF("e")
    for ((bands, bits) <- Seq((4, 4), (5, 5), (8, 8), (13, 11))) {
      val legacy = df.withColumn("bv",
        array((0 until bands).map(b =>
          expr(graft.operators.LlmOps.legacyBandSql(b, bits))): _*))
      val kernel = df.withColumn("bv",
        call_function("graft_simhash_bands", col("e"),
          typedLit(graft.operators.LlmOps.planesFlat(bands, bits).toSeq),
          lit(bands), lit(bits)))
      val want = legacy.select("bv").collect().map(_.getSeq[Int](0))
      val got = kernel.select("bv").collect().map(_.getSeq[Int](0))
      assert(got.length == want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, w), r) =>
        assert(g == w, s"geometry ($bands,$bits) row $r: kernel $g vs tree $w")
      }
    }
    // the geometry the tree CANNOT serve (64 KB fallback): the kernel
    // must still produce well-formed band values under codegen
    val big = df.withColumn("bv",
        call_function("graft_simhash_bands", col("e"),
          typedLit(graft.operators.LlmOps.planesFlat(24, 15).toSeq),
          lit(24), lit(15)))
      .select("bv").collect().map(_.getSeq[Int](0))
    big.foreach { bv =>
      assert(bv.length == 24)
      assert(bv.forall(v => v >= 0 && v < (1 << 15)))
    }
  }

  test("r15 graft_simhash_bands rejects malformed geometry/planes in BOTH paths") {
    // ADVICE r14: the function is SQL-exposed cluster-wide and
    // UnsafeArrayData.getDouble is not bounds-checked — a short planes
    // literal silently returned garbage under codegen. Both the
    // interpreted and generated paths must now throw, naming the
    // expected length.
    graft.functions.SimhashBands.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(List.fill(64)(1.0))).toDF("e")
    def run(planes: Seq[Double], bands: Int, bits: Int): Unit =
      df.select(call_function("graft_simhash_bands", col("e"),
        typedLit(planes), lit(bands), lit(bits))).collect()
    val ok = graft.operators.LlmOps.planesFlat(4, 4).toSeq
    run(ok, 4, 4) // well-formed call passes the guard
    // planes literal one double short of bands*bits*64 (codegen path)
    val short = ok.dropRight(1)
    val e1 = intercept[Exception](run(short, 4, 4))
    assert(e1.getMessage.contains("graft_simhash_bands") ||
      Option(e1.getCause).exists(_.getMessage.contains("graft_simhash_bands")))
    // bits out of [1,31] (shift wrap), bands < 1
    intercept[Exception](run(ok, 4, 32))
    intercept[Exception](run(ok, 0, 4))
    // interpreted path: nullSafeEval directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    val eArr = ArrayData.toArrayData(Array.fill(64)(1.0))
    val plArr = ArrayData.toArrayData(short.toArray)
    val expr = graft.functions.SimhashBands(null, null, null, null)
    intercept[IllegalArgumentException](
      expr.nullSafeEval(eArr, plArr, 4, 4))
  }

  test("interpreted eval matches codegen path") {
    // nullSafeEval is exercised directly (the non-codegen fallback)
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5, -2.0, 3.25))
    val b = ArrayData.toArrayData(Array(2.0, 0.5, 4.0))
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1))
    assert(e.nullSafeEval(a, b) == (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * 4.0))
  }
}
