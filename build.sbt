ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flumedbspark"
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
// The forked run's stdout must pass through UNPREFIXED: sbt's default
// LoggedOutput stamps every line with "[info] ", which broke the
// bench's one-line JSON contract for the r17/r18 driver captures
// (BENCH_r17/r18.json: parsed=null). StdoutOutput hands the child's
// stdout straight through.
run / outputStrategy := Some(StdoutOutput)
// Forking hides sbt's sys-props from the child JVM, so Bench's capture
// provenance self-reported "java" under sbt; stamp the launcher into
// the forked environment instead.
run / envVars += ("GRAFT_BENCH_LAUNCHER" -> "sbt")
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
