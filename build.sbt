ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventstodbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and named streaming memory sinks — run
// them sequentially in the forked JVM.
Test / parallelExecution := false
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // events.ts is Parquet TIMESTAMP(NANOS): Spark 4.x refuses it unless this
  // legacy flag is on (reads as LongType epoch-ns). See SURVEY.md §7.4.1.
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen compiles one generated class per plan stage; a
  // 103-query bench sweep saturates the JVM's default 240 MB reserved
  // code cache mid-run, after which the JIT stops compiling and the
  // compute-bound kernels (exact-sim dot products) run partly
  // interpreted — measured r13: q76 1.77 → 1.46 s, q78 0.93 → 0.65 s
  // under 512 MB, full-sweep totals equal. The same setting belongs in
  // spark.{driver,executor}.extraJavaOptions on a real cluster.
  "-XX:ReservedCodeCacheSize=512m",
)
