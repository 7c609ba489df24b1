ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigqueryetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The external driver parses Bench's one-line JSON out of the last
// 2000 chars of stdout. sbt's default LoggedOutput prefixes every
// forked-run line with "[info] " — every round so far recorded
// "parsed": null because of it. StdoutOutput passes the forked JVM's
// stdout/stderr through raw, so the JSON line lands unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 8g measured best: raising to 48g made identical benches 2-4x
  // slower AND noisy (sys-time storms from heap-growth page zeroing +
  // large-heap G1 geometry); the sweep-tail block pressure is handled
  // by Bench/Verify dropping checkpoint blocks between queries
  // instead. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 150+ codegen-heavy queries in one JVM overflow the default 240m
  // JIT code cache mid-sweep; once it fills, whole-stage-codegen
  // classes run interpreted and every later query measures 4-5x slow
  // (observed on untouched TPC-H entries in the r7 cold sweep).
  // 768m: at 174 registry queries the old 512m reserve left 2.5%
  // guard margin (472m needed) — 768m restores >30% headroom, and
  // CodeCacheFlushing lets the sweeper reclaim cold compiled methods
  // if occupancy ever does approach the reserve instead of silently
  // disabling the compiler.
  "-XX:ReservedCodeCacheSize=768m",
  "-XX:+UseCodeCacheFlushing",
  // Whole-stage-codegen CLASS cache (static conf, so set as a system
  // property before any session exists). The default is 100 entries —
  // a 184-query sweep holds thousands of distinct codegen units, so
  // the LRU thrashes and every re-run of a complex plan re-compiles
  // its generated classes through janino AND re-JITs them from zero.
  // Measured on the 4 heaviest queries (xr8/xr13/xd5/xs7b, median-of-3
  // protocol): 30.2 s -> 19.4 s wall (-36%), sweep JIT time 236 s ->
  // 153 s. Sized to hold the full registry's units (~30/query) with
  // headroom; entries are (source string -> compiled class), ~30 KB
  // each, bounded ~150 MB worst case on the 8 g heap.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
)
