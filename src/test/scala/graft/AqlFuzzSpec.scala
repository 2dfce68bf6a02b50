package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.aql.Aql

/** Property fuzz for the AQL front-end: render a random well-typed AST to
  * text, parse it back, and require the identical AST (the renderer
  * fully parenthesizes, so this pins the parser's precedence and
  * tokenization); lower a sample against the real schema and require
  * analysis to succeed; and require that mangled inputs fail with the
  * parser's own IllegalArgumentException, never anything else.
  * Deterministic: fixed seed (pinned-seed convention, round 2).
  * Generators/renderer live in [[AqlGen]], shared with the cross-engine
  * differential (AqlOracleSpec).
  */
class AqlFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import AqlGen.{render, samples}

  test("render → parse round-trips the AST (200 random queries)") {
    samples(200).foreach { q =>
      val text = render(q)
      val back = Aql.parse(text)
      assert(back == q, s"round-trip mismatch for: $text")
    }
  }

  test("random well-typed queries lower and analyze against the real schema") {
    samples(40).foreach { q =>
      val df = Aql.run(spark, sf0001, render(q))
      // analysis (schema resolution, type checks) must succeed; no execution
      assert(df.queryExecution.analyzed != null)
      assert(df.schema.fields.nonEmpty)
    }
  }

  test("mangled inputs fail with the parser's own error, never something else") {
    val rnd = new scala.util.Random(20260812L)
    samples(60).foreach { q =>
      val text = render(q)
      val cut = 1 + rnd.nextInt(text.length - 1)
      val mangled = rnd.nextInt(3) match {
        case 0 => text.substring(0, cut) // truncate
        case 1 => text.substring(0, cut) + ")" + text.substring(cut) // stray paren
        case 2 => text.substring(0, cut) + " ~ " + text.substring(cut) // alien token
      }
      // a mangled input that still PARSES must then lower cleanly too:
      // success, the front-end's IAE (unsupported shape), or Spark's
      // AnalysisException (type/schema error) — never a MatchError/NPE
      // from a hole in the lowering itself
      try {
        Aql.parse(mangled)
        Aql.run(spark, sf0001, mangled).queryExecution.analyzed
      } catch {
        case _: IllegalArgumentException => () // the front-end contract
        case _: org.apache.spark.sql.AnalysisException => () // schema/type
        case e: Throwable => fail(s"non-contract error ${e.getClass} for: $mangled")
      }
    }
  }
}
