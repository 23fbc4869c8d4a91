ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "unionindexernodespark"
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
// Forked run output passes through RAW (no "[info] " logger prefix):
// the driver parses the bench's final JSON metric line from captured
// stdout, and a prefixed line fails a strict per-line json parse.
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
  // local[32] + an 88-query catalog needs headroom: 8g spent the
  // bench tail in GC (measured ~2-4x inflation on late queries); the
  // host has 128 GiB, so size like a real executor would be sized.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A long catalog run generates one codegen class per plan stage;
  // at the JDK-17 default (240m reserved, ~117m non-profiled heap)
  // the 100x ScaleEvidence sweep FILLED the code cache at t=665s —
  // "CodeHeap 'non-profiled nmethods' is full. Compiler has been
  // disabled." — and every later stage ran interpreter-only (d39
  // 884s vs 7s compiled, d38 95s vs 2.3s). Size it like a real
  // long-lived executor would be sized.
  "-XX:ReservedCodeCacheSize=1g",
)
