package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.aql.{Aql, AqlSql}

/** The AQL DIFFERENTIAL ORACLE (VERDICT r8 #4): every fuzz-generated
  * query runs through TWO independent lowerings and the results must
  * match —
  *
  *  1. in-Spark: `Aql.run` (AST → DataFrame ops) vs
  *     `spark.sql(AqlSql.toSql(_, spark))` (AST → SQL text) — two
  *     disjoint code paths into the same engine, always runnable;
  *  2. cross-engine: the same results hash-compared against DuckDB
  *     executing `AqlSql.toSql(_, duckdb)` via `tools/aql_check.py` —
  *     the SAME harness pattern as the 91 registry oracle queries
  *     (artifacts: per-query result parquet + an oracle-SQL json).
  *     Canceled (not failed) where python3+duckdb are absent; on the
  *     driver host it runs for real.
  *
  * Runs under `spark.sql.ansi.enabled=false`: DuckDB yields NULL on
  * division by zero, which is exactly non-ANSI Spark's behavior (ANSI
  * mode would throw instead — a dialect difference, not a lowering bug).
  * Aggregates of doubles compare with 1e-9 relative tolerance (partial
  * aggregation order differs across engines and plans); everything else
  * is exact.
  */
class AqlOracleSpec extends AnyFunSuite {
  import SparkTestBase._

  // 160 (VERDICT r9 #7): the r10 generator additions — correlated `^.k`
  // scalar subqueries (now renderable by AqlSql) and aggregates over
  // derived expressions — need the larger draw to appear often enough.
  // 200 (r11): the from()/to() bound production joins the generator at
  // every tag-expression depth; the wider draw keeps each production's
  // expected appearance count where the 160-draw had it.
  private val N = 200

  /** Positional c0…cN rename, matching AqlSql's output aliases; the
    * no-SELECT envelope query additionally projects the cross-engine
    * scalar view (drops raw-ns `ts`, keeps `ts_us` — §7.4.1) in the
    * SQL's column order.
    */
  private def positional(q: Aql.Query, df: DataFrame): DataFrame = {
    val base =
      if (q.select.isEmpty && q.aggregate.isEmpty)
        df.select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      else df
    base.toDF(base.columns.indices.map(i => s"c$i"): _*)
  }

  private def eqv(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.lang.Double, y: java.lang.Double) =>
      (x.isNaN && y.isNaN) ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x))
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (x.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Double])
        eqv(java.lang.Double.valueOf(x.doubleValue),
          java.lang.Double.valueOf(y.doubleValue))
      else x.longValue == y.longValue
    case (x, y) => x == y
  }

  /** Order-insensitive row compare: canonical sort (doubles rounded for
    * the KEY only), then element-wise [[eqv]].
    */
  private def assertSameRows(got: Seq[Seq[Any]], want: Seq[Seq[Any]],
      ctx: => String): Unit = {
    def key(r: Seq[Any]): String = r.map {
      case null => "\u0000"
      case d: java.lang.Double => f"$d%.6e"
      case x => x.toString
    }.mkString("|")
    assert(got.size == want.size, s"rows ${got.size} != ${want.size} — $ctx")
    def rowEq(gr: Seq[Any], wr: Seq[Any]): Boolean =
      gr.size == wr.size && gr.indices.forall(j => eqv(gr(j), wr(j)))
    val g = got.sortBy(key)
    val w = want.sortBy(key)
    // The canonical sort rounds doubles to 6 decimals for the KEY while
    // eqv compares at 1e-9 relative: two within-tolerance values that
    // straddle a rounding boundary can sort to different positions and
    // zip against the wrong partners. Re-match that residue as a
    // multiset with the tolerant compare before calling it a mismatch.
    val misaligned = g.zip(w).filterNot { case (gr, wr) => rowEq(gr, wr) }
    if (misaligned.nonEmpty) {
      val wRes = scala.collection.mutable.ArrayBuffer(misaligned.map(_._2): _*)
      misaligned.map(_._1).foreach { gr =>
        val j = wRes.indexWhere(wr => rowEq(gr, wr))
        assert(j >= 0, s"unmatched row: got=$gr candidates=${wRes.take(3)} — $ctx")
        wRes.remove(j)
      }
    }
  }

  private def withAnsiOff[T](body: => T): T = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try body finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test(s"in-Spark differential: Aql.run ≡ spark.sql(toSql) on $N fuzz queries") {
    graft.sources.Tables.events(spark, sf0001).createOrReplaceTempView("events")
    withAnsiOff {
      AqlGen.samples(N).zipWithIndex.foreach { case (q, i) =>
        val text = AqlGen.render(q)
        val got = positional(q, Aql.run(spark, sf0001, text))
          .collect().toSeq.map(_.toSeq)
        val want = spark.sql(AqlSql.toSql(q, AqlSql.Spark))
          .collect().toSeq.map(_.toSeq)
        assertSameRows(got, want, s"query $i: $text")
      }
    }
  }

  test("the fuzz corpus emits the r16 nested-LET-in-subQuery shapes " +
    "(incl. inner-shadows-outer)") {
    // VERDICT r15 #7: the differential's value is only as wide as the
    // generator's shape coverage — pin that the pinned-seed corpus
    // actually contains subQuery bodies with their OWN LET, and at
    // least one whose inner name SHADOWS an outer binding (the exact
    // scoping the r13 expansion + r15 row-anchoring changed).
    def subQueries(e: Aql.Expr): Seq[Aql.Query] = e match {
      case Aql.SubQuery(q) =>
        q +: q.filter.toSeq.flatMap(subQueries)
      case Aql.Bin(_, l, r) => subQueries(l) ++ subQueries(r)
      case Aql.Un(_, x) => subQueries(x)
      case _ => Nil
    }
    val pairs = AqlGen.samples(N).flatMap(q =>
      q.filter.toSeq.flatMap(subQueries).map(inner => (q, inner)))
    val nested = pairs.filter(_._2.lets.nonEmpty)
    assert(nested.size >= 10,
      s"nested-LET-in-subQuery underrepresented: ${nested.size} of $N")
    assert(nested.exists { case (outer, inner) =>
      outer.lets.map(_._1).toSet
        .intersect(inner.lets.map(_._1).toSet).nonEmpty },
      "no inner-LET-shadows-outer-LET query in the corpus")
  }

  test(s"cross-engine differential: DuckDB agrees on the same $N queries") {
    val haveDuck =
      try new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
      catch { case _: Throwable => false }
    assume(haveDuck, "python3+duckdb not available in this environment")

    val outDir = tmpDir("graft-aql-oracle")
    def jsonEsc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val entries = withAnsiOff {
      AqlGen.samples(N).zipWithIndex.map { case (q, i) =>
        val name = f"aql_$i%03d"
        positional(q, Aql.run(spark, sf0001, AqlGen.render(q)))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        s""""$name": "${jsonEsc(AqlSql.toSql(q, AqlSql.Duck))}""""
      }
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "aql_oracle.json"),
      entries.mkString("{", ",\n", "}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val p = new ProcessBuilder(
      "python3", "tools/aql_check.py", sf0001, outDir)
      .directory(new java.io.File("."))
      .redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assert(code == 0, s"aql_check.py reported mismatches:\n${log.takeRight(3000)}")
    assert(log.contains(s"== $N pass, 0 fail =="), log.takeRight(500))
  }
}
