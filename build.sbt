ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimevotingdataengineeringspark"
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
// Name-preserving test diagnostics: -oDF prints full stack traces with
// durations to stdout; -u writes per-suite JUnit XML under
// target/test-reports so a failing test's NAME survives any log
// truncation (a flake you cannot name is a flake you cannot fix).
Test / testOptions ++= Seq(
  Tests.Argument(TestFrameworks.ScalaTest, "-oDF"),
  Tests.Argument(TestFrameworks.ScalaTest, "-u", "target/test-reports"),
)
// The round driver parses the LAST stdout line of `sbt runMain` as JSON;
// sbt's default logger prefixes forked-process output with "[info] ",
// which breaks that parse (BENCH_r{1..6}.json all show parsed:null).
// StdoutOutput sends the forked JVM's stdout straight through, unprefixed.
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
  // 16g default: the 130+-query bench/verify mains accumulate
  // broadcast relations faster than the ContextCleaner reclaims them
  // at 8g, and the box has 128 GiB (override via SPARK_DRIVER_MEM)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// Diagnostic passthrough: extra JVM flags for the forked run JVM
// (e.g. GC/code-cache logging while profiling a bench run) without
// editing the build. Empty by default — the driver contract is
// untouched.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
