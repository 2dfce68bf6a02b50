package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketed, Tables}

/** The co-located-join contract: once both sides are bucketed on the join
  * key, the join plan contains NO exchange — the shuffle was paid at
  * write time. Broadcast is disabled for the assertion so the plan can't
  * sidestep the property at fixture scale.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestBase._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** True if the FINALIZED plan contains any shuffle exchange. collect()
    * executes THIS Dataset's queryExecution (count() would build a
    * separate one); the rendered tree is used because AQE nests stages
    * outside `children`, where node-collectors can't see them.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("ShuffleQueryStage") || plan.contains("Exchange hashpartitioning")
  }

  test("joins on bucketed tables run with zero exchange and match the shuffled join") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val events = Tables.eventsUs(spark, sf0001)
        .select("event_id", "user_id", "value")
      val users = Tables.eventsUs(spark, sf0001)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))

      Bucketed.write(events, "ev_bkt", "user_id", 8)
      Bucketed.write(users, "usr_bkt", "user_id", 8)

      val colocated = Bucketed.colocatedJoin(spark, "ev_bkt", "usr_bkt", "user_id")
      assert(!shuffles(colocated),
        "bucketed join still shuffles:\n" + colocated.queryExecution.executedPlan)

      val plain = events.join(users, Seq("user_id"))
      assert(shuffles(plain), "control: the unbucketed join should shuffle")

      val got = colocated.select("event_id", "user_id", "value", "n_events")
        .collect().map(_.toSeq).toSet
      val want = plain.select("event_id", "user_id", "value", "n_events")
        .collect().map(_.toSeq).toSet
      assert(got == want)

      // bucketing serves aggregation too: groupBy on the bucket key needs
      // no exchange either (partial+final collapse onto the bucketed scan)
      val agg = spark.table("ev_bkt").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      assert(!shuffles(agg),
        "groupBy on the bucket key still shuffles:\n" + agg.queryExecution.executedPlan)
    }
  }
}
