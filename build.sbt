ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbdeltaspark"
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
// Suites MUST run serially: GraftSourceSpec toggles the JVM-global
// graft.testUtilities system property around its gate assertions, and a
// concurrently running suite would transiently see the opened gate (or
// trip the gated-intercept). Forked suites are already sequential by
// sbt default (no testForkedParallel); this pins that contract so a
// future parallelism tweak can't silently reintroduce the race.
Test / parallelExecution := false
// Pass the forked JVM's stdout through UNPREFIXED: the bench driver tails
// stdout for the final JSON headline line, and sbt's default LoggedOutput
// would wrap it in "[info] ", breaking the driver's parser.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] = driver AND all executor threads in ONE heap; 8g GC-thrashes
  // under 32 concurrent shuffle tasks at sf0.1×10 (the machine has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // The JDK default ReservedCodeCacheSize (240 MB) fills after ~35 distinct
  // whole-stage-codegen'd plans in one JVM; the JIT then disables itself and
  // every subsequent query runs interpreted at 30-300× (root cause of the
  // r2/r3 bench collapses). On a real cluster set the same flag via
  // spark.driver.extraJavaOptions / spark.executor.extraJavaOptions.
  "-XX:ReservedCodeCacheSize=1g",
)
