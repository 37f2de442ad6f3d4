ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "knowledgegraphawarerecommendersystemswithdbpediaspark"
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
// The driver parses graft.Bench's one-line JSON from STDOUT. With
// fork := true sbt's default outputStrategy is LoggedOutput, which
// prefixes every forked-process line with "[info] " — that prefix broke
// the driver's JSON parse in BENCH_r10–r14 (parsed: null). StdoutOutput
// passes the forked JVM's stdout/stderr through raw.
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
  // 16g default: local[32] with collect_list/GraphX stages GC-thrashes
  // an 8g heap when the box is otherwise loaded (BENCH_r04 showed 3-8×
  // inflation on exactly those stages); the container has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // headroom for the suite's generated classes: JDK17's 240 MB default
  // code cache runs close to full before the headline folds execute.
  // r14: the suite is 222 queries + warmup replays (~3× the class count
  // 512m was sized for at 76 queries), and the bench's LAST-run hot
  // queries measured ~8× their isolated CPU (q213: 892 vs ~105
  // CPU-s) — the interpreted-mode signature of a full code cache, so
  // 512m → 1g. The container has 128 GiB; reserved ≠ committed.
  "-XX:ReservedCodeCacheSize=1g",
)
// The 658-test suite shares ONE session and one forked JVM; suite-level
// persisted blocks accumulate across all suites and the r14 driver run
// aborted mid-suite with "SparkContext was shut down" — the local-mode
// signature of a fatal executor-thread error (heap exhaustion) tearing
// the context down. A later -Xmx overrides the inherited 16g; the
// container has 128 GiB, reserved ≠ committed.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "28g")}"
