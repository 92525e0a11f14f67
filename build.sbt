ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rustcheatersdatapipelinespark"
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
// Forked output goes to stdout UNPREFIXED: sbt's default LoggedOutput
// prepends "[info] "/"[error] " to every forked-process line, which makes
// the bench's contract JSON line (`{"metric":...}`) unparseable by any
// line-oriented json.loads consumer — BENCH_r01..r14 all show
// `parsed: null` even when the complete JSON line sat inside the kept
// tail, because the line always arrived as `[info] {...}`.
outputStrategy := Some(StdoutOutput)
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
  // Spark 4's session-artifact isolation (default ON) resolves every
  // classloader miss via a driver RPC file-download; with no session
  // artifacts in play it is pure overhead (see GraftSession). Session-
  // creation-time conf, so pin it for every forked JVM.
  "-Dspark.sql.artifact.isolation.enabled=false",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
