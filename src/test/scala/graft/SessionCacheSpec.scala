package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Session-scoped cache keying (VERDICT r7 nit #1): keys derive from a
  * monotonic per-session id held in a WEAK-keyed map, not
  * `System.identityHashCode(session)` — identity hash codes are hashes,
  * not identities, so two live sessions can share one, and a collision
  * would hand one session a cached DataFrame bound to the other (an
  * analyzer error at best, stale data for the same sfDir at worst).
  * Monotonic ids cannot collide and are never reused for a new session;
  * the weak keying keeps the id map from pinning dead sessions.
  */
class SessionCacheSpec extends AnyFunSuite {
  import SparkTestBase._

  test("distinct live sessions get distinct, stable cache keys") {
    val s2 = spark.newSession()
    val s3 = spark.newSession()
    assert(LlmOps.sessionKey(spark) != LlmOps.sessionKey(s2))
    assert(LlmOps.sessionKey(s2) != LlmOps.sessionKey(s3))
    // stable: the same session always maps to the same key
    assert(LlmOps.sessionKey(spark) == LlmOps.sessionKey(spark))
    assert(LlmOps.sessionKey(s2) == LlmOps.sessionKey(s2))
  }

  test("two sessions on the same sfDir never share a cached DataFrame") {
    val s2 = spark.newSession()
    try {
      // q77 funnels through the session-scoped sim cache: each session
      // must get a table bound to ITSELF (a shared entry would bind one
      // session's query to the other's session state), with identical
      // results
      val a = SparkEntry.queries("q77_sim_threshold")(spark, sf0001)
      val b = SparkEntry.queries("q77_sim_threshold")(s2, sf0001)
      assert(a.sparkSession eq spark)
      assert(b.sparkSession eq s2)
      assert(a.collect().toSeq == b.collect().toSeq)
    } finally {
      LlmOps.release(s2)
      LlmOps.release(spark)
    }
  }

  test("a release racing a first access never leaks a persisted DataFrame") {
    import org.apache.spark.storage.StorageLevel
    // The exact interleaving the r9 review flagged, replayed
    // deterministically at the holder level: release() removes the
    // holder from the map and invalidate()s it BEFORE the putIfAbsent
    // winner reaches get — the invalidate finds nothing built, and
    // without the dead-tombstone the subsequent build would persist a
    // DataFrame no handle can ever unpersist.
    val df = spark.range(10).toDF("n")
    var builds = 0
    val holder = new LlmOps.Cached({ () =>
      builds += 1; df.persist(StorageLevel.MEMORY_AND_DISK)
    })
    holder.invalidate() // the racing release lands first
    val out = holder.get // post-mortem first access still answers…
    assert(out.collect().length == 10)
    assert(builds == 1)
    assert(df.storageLevel == StorageLevel.NONE,
      "a build after invalidate() must not stay persisted")
    // …and the orphaned holder caches nothing: a second get re-builds
    holder.get
    assert(builds == 2)
    df.unpersist(blocking = true)

    // the normal lifecycle is unchanged: build persists, release unpersists
    val df2 = spark.range(5).toDF("n")
    val h2 = new LlmOps.Cached(() => df2.persist(StorageLevel.MEMORY_AND_DISK))
    assert(h2.get.storageLevel == StorageLevel.MEMORY_AND_DISK)
    h2.invalidate()
    assert(df2.storageLevel == StorageLevel.NONE)
  }

  test("the monitor is not held across a build: invalidate() stays live") {
    import org.apache.spark.storage.StorageLevel
    // ADVICE r9: q7N's materialization ran under the holder monitor, so
    // a release() racing an in-flight multi-second build blocked for the
    // whole Spark job. Replayed at the holder level: a builder parked
    // mid-build must not hold the monitor — invalidate() returns
    // promptly and the late-landing build cleans up after itself.
    val started = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val df = spark.range(3).toDF("n")
    val holder = new LlmOps.Cached({ () =>
      started.countDown()
      assert(gate.await(30, java.util.concurrent.TimeUnit.SECONDS))
      df.persist(StorageLevel.MEMORY_AND_DISK)
    })
    @volatile var got: org.apache.spark.sql.DataFrame = null
    val builder = new Thread(() => got = holder.get)
    builder.start()
    started.await()
    val t0 = System.nanoTime()
    holder.invalidate() // must NOT wait for the parked build
    assert(System.nanoTime() - t0 < 5000000000L,
      "invalidate() blocked on an in-flight build")
    gate.countDown()
    builder.join(30000)
    assert(!builder.isAlive)
    assert(got.collect().length == 3)
    assert(df.storageLevel == StorageLevel.NONE,
      "a build landing after invalidate() must not stay persisted")
  }

  test("a failed build wakes waiters; the next access retries once") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val holder = new LlmOps.Cached({ () =>
      if (attempts.incrementAndGet() == 1) sys.error("first build fails")
      spark.range(2).toDF("n")
    })
    intercept[RuntimeException](holder.get)
    assert(holder.get.count() == 2)
    assert(attempts.get == 2)
  }

  test("concurrent first accesses run the build exactly once") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val holder = new LlmOps.Cached({ () =>
      builds.incrementAndGet(); Thread.sleep(100); spark.range(4).toDF("n")
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map(_ => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = holder.get.count()
      }))
      assert(futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS)).forall(_ == 4))
      assert(builds.get == 1, "waiters must reuse the claimed build, not redo it")
    } finally pool.shutdownNow()
  }
}
