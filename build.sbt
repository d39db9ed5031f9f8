ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datacompyspark"
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
// Pass forked-run output through verbatim: sbt's default logger prefixes
// every line with "[info] ", which breaks line-oriented JSON parsing of
// the Bench/Verify contract output.
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
  // Whole-stage codegen emits one JIT-compiled class per generated stage;
  // a 46-query bench overflows the JVM's default 240m reserved code cache,
  // after which the JIT disables itself and every later query runs
  // interpreted (the round-3/4 bench showed exactly that shape: queries
  // late in the alphabetical order 5-20x slower with byte-identical plans,
  // high run-to-run variance). 1g keeps the JIT on for the whole run.
  "-XX:ReservedCodeCacheSize=1g",
  // The driver main thread runs analysis, optimization, and Janino codegen
  // for every (AQE-replanned) stage; with the default handful of JIT
  // compiler threads the C2 queue backs up behind the stream of generated
  // classes and the driver's OWN hot paths (Catalyst rules) run at C1 or
  // interpreted speed for long stretches — thread-level sampling showed the
  // main thread pegged as the only busy thread for over half a 46-query
  // bench run, with per-query times varying 5-20x between runs. More
  // compiler threads drain the queue while 32 cores sit mostly idle.
  "-XX:CICompilerCount=12",
  // 32g default: the sandbox has 128 GiB and local[32] puts all executor
  // storage+execution in this one heap — at 8g the bench's persisted compare
  // caches and dedup postings evicted each other (round-3 regression).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// Dual-ANSI sweep: the reference CI runs every suite under
// spark.sql.ansi.enabled false AND true (test-package.yml + pytest-ansi.ini);
// mirror that by running the full ScalaTest suite in two forked JVMs, one
// per mode. spark.* system properties flow into SparkConf automatically, so
// no test-code changes are needed. Forked groups run sequentially (sbt's
// default ForkedTestGroup limit), avoiding warehouse/catalog collisions.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jvmOpts = (Test / javaOptions).value.toVector
  def group(name: String, ansi: Boolean) =
    Tests.Group(s"ansi-$name", tests, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(jvmOpts :+ s"-Dspark.sql.ansi.enabled=$ansi")))
  Seq(group("on", ansi = true), group("off", ansi = false))
}
