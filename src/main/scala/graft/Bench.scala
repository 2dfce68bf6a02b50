package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times `.count()` of every registry entry at the
  * driver-passed scale factor and prints one JSON line.
  *
  * Hygiene (round-2): queries run in sorted name order (Map iteration order
  * made round 1's timings non-reproducible — the first query to run absorbs
  * JVM/codegen warm-up, which is how q17 got billed 28 s for a 2 s plan); a
  * warm-up query runs untimed first; failures are recorded and reported
  * instead of silently producing a fast bench line.
  *
  * Round-2 regression post-mortem: BENCH_r02 showed the q6x–q7x band
  * uniformly 2–4× slower than r01 (q66 4.21 s, q67 4.70 s). Triaged round 3
  * via SPARK_GRAFT_ONLY fresh-JVM isolation (q66 1.09 s, q67 1.15 s) and a
  * clean full run (q66 0.44 s, q67 0.52 s, whole registry 45 s vs r02's
  * ~96 s): the plans are unchanged and fine — the r02 numbers were
  * transient JVM/GC/host state during that one run, not plan defects.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts generations contract — FIXTURES.md (nanos gen needs this).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up (untimed): JIT/codegen/parquet-footer caches, so the first
    // timed query isn't charged for JVM start-up.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }
    // Optional isolation: SPARK_GRAFT_ONLY=<regex> times just the matching
    // entries (fresh-JVM per-query runs — the regression-triage tool).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    // Two passes, report per-query MIN (steady state): identical code has
    // measured 45–59 s whole-registry totals run-to-run on this host —
    // the min-of-2 removes the transient GC/host noise the r02
    // post-mortem documented, without changing what is measured (the
    // same plans on the same data). SPARK_GRAFT_PASSES overrides.
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    var failures = Set.empty[String]
    // Per-query environment deltas alongside the wall time (VERDICT r9
    // task 1: the full-sweep inflation must be diagnosed with data, not
    // argued): GC time from the JVM beans (local mode — driver IS every
    // executor, so this is total GC), persisted-storage footprint from
    // getRDDStorageInfo, and heap-in-use. Written per PASS (not min) to
    // target/bench_diag.json — a pass-1-vs-pass-2 asymmetry or a
    // GC-spike-under-storage-high-water row is exactly the evidence the
    // committed min-of-2 line hides.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0)); t
    }
    def storageMb: (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum >> 20, infos.map(_.diskSize).sum >> 20)
    }
    def heapMb: Long =
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
    val diag = collection.mutable.ArrayBuffer.empty[String]
    val timed = (1 to passes).map { pass =>
      // cold-start each pass for the q76/q77 shared persisted sim table:
      // otherwise pass 2's q76 is a cache hit and the min hides the
      // O(n²) build cost entirely
      graft.operators.LlmOps.release(spark)
      names.map { name =>
        val gc0 = gcMs
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          failures += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val (memMb, diskMb) = storageMb
        diag += s"""{"pass":$pass,"q":"$name","sec":${math.round(sec * 1000) / 1000.0},""" +
          s""""gc_ms":${gcMs - gc0},"store_mb":$memMb,"store_disk_mb":$diskMb,"heap_mb":$heapMb}"""
        name -> sec
      }.toMap
    }
    try {
      val dout = java.nio.file.Paths.get("target", "bench_diag.json")
      java.nio.file.Files.createDirectories(dout.getParent)
      java.nio.file.Files.write(dout,
        (diag.mkString("", "\n", "\n")).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] target/bench_diag.json write failed: ${e.getMessage}")
    }
    val results = names.map(n => n -> timed.map(_(n)).min)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failures.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // total/failures LAST: the driver stores only the TAIL of stdout, so
    // leading keys get truncated away on long lines (both r01 and r02 lost
    // "value" and the first ~18 per-query timings — VERDICT r02 §Bench).
    // provenance names the producing binary+invocation so the two
    // committed artifacts read unambiguously: BENCH_r{N}.json is the
    // DRIVER's stdout snapshot of this same line (its own invocation,
    // minutes apart), BENCHFULL_r{N}.json is the in-round copy of
    // target/bench.json (VERDICT r11 #7)
    val prov = s"graft.Bench local[$cpus] min-of-$passes sf=$sfDir"
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","provenance":"$prov","passes":$passes,"queries":$qs,"failures":$fs,"value":$total}"""
    println(line)
    // The driver's stdout tail TRUNCATES the per-query map (BENCH_r08
    // recovered only 61/98 rows), which could hide a per-query regression
    // — so the complete line is also written as a file artifact.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] target/bench.json write failed: ${e.getMessage}")
    }
    // Compact summary printed LAST (VERDICT r16 #4): the driver
    // snapshots only the TAIL of stdout, and the full per-query line
    // outgrew it two rounds running (BENCH_r15/r16 "parsed": null —
    // 61/105 rows recoverable by regex). The tail must END with a short
    // self-contained JSON line that always parses; the full per-query
    // map stays in the line above and in target/bench.json (committed
    // per round as BENCHFULL_r{N}.json, the authoritative sweep).
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","provenance":"$prov; compact tail line, full per-query map in target/bench.json","n_queries":${names.length},"failures":$fs,"value":$total}""")
    spark.stop()
  }
}
