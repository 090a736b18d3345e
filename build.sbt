ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rivulusspark"
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
// The driver parses the bench's one-line JSON from sbt stdout. sbt's
// default LoggedOutput strategy prefixes every forked-process line with
// "[info] ", so no line ever starts with '{' and the driver's parse has
// recorded null in every round (BENCH_r01..r18: "parsed": null). Inherit
// sbt's raw stdout instead so JSON lines print bare at column 0.
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] runs 32 concurrent tasks in ONE JVM: at 8g the heavy
  // aggregate stages (10M+-entry hash maps × 32 tasks) plus a long
  // bench run's accumulated garbage push GC time past 50% of stage
  // wall time (measured: gc=2.4s inside a 2.3s-wall stage). 24g keeps
  // task working sets + the family memos comfortably resident on the
  // 128 GiB host while staying under the compressed-oops ceiling.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~140 queries × whole-stage-codegen classes overflow the default
  // 240m code cache late in a bench run — the JIT then stops compiling
  // and compute-heavy kernels run interpreted (2-3× per-query swings).
  "-XX:ReservedCodeCacheSize=512m",
)
