package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

/** Hand-computed + property-based checks of the sessionize core
  * (SURVEY.md §5.2–5.3): sessions ≤ events, gaps > 30 min never inside a
  * session, counts partition the events.
  */
class SessionizeSpec extends AnyFunSuite {
  import SparkTestBase._

  private val MIN_US = 60L * 1000000

  private def run(rows: Seq[(Long, Long)]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    val df = rows.zipWithIndex
      .map { case ((user, tsUs), i) => (user, tsUs, i.toLong) }
      .toDF("user_id", "ts_us", "event_id")
    Windows.sessionize(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("hand-computed: 30-min gaps split, <=30-min gaps don't") {
    // user 1: events at 0, 10, 45, 80 min — gaps 10/35/35 → 3 sessions
    // user 2: events at 0, 30, 60 min — gaps exactly 30 → 1 session
    //         (strictly-greater rule: a gap of exactly 30 min keeps the
    //          session, matching the batch q58 contract)
    val rows = Seq(
      (1L, 0L), (1L, 10 * MIN_US), (1L, 45 * MIN_US), (1L, 80 * MIN_US),
      (2L, 0L), (2L, 30 * MIN_US), (2L, 60 * MIN_US))
    val got = run(rows)
    assert(got(1L) == ((3L, BigDecimal(4.0 / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((1L, 3.0)))
  }

  test("single event = single session of length 1") {
    assert(run(Seq((7L, 123456L))) == Map(7L -> ((1L, 1.0))))
  }

  test("properties: session count bounds and event conservation") {
    val gapGen = Gen.chooseNum(0L, 90L * MIN_US)
    val userEventsGen: Gen[List[Long]] =
      Gen.nonEmptyListOf(gapGen).map(_.scanLeft(0L)(_ + _))
    val prop = Prop.forAll(Gen.mapOfN(4, Gen.zip(Gen.chooseNum(1L, 50L), userEventsGen))) { users =>
      val rows = users.toSeq.flatMap { case (u, tss) => tss.map(u -> _) }
      rows.isEmpty || {
        val got = run(rows)
        val expectSessions = users.map { case (u, tss) =>
          val sorted = tss.sorted
          u -> (1L + sorted.zip(sorted.tail)
            .count { case (a, b) => b - a > 30 * MIN_US })
        }
        got.keySet == users.keySet &&
          got.forall { case (u, (n, avgLen)) =>
            val total = users(u).length
            n == expectSessions(u) &&
              n >= 1 && n <= total &&
              math.abs(n * avgLen - total) < 1e-2 * n
          }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30)
        .withInitialSeed(org.scalacheck.rng.Seed(20260812L)), prop)
    assert(res.passed, res.status.toString)
  }
}
