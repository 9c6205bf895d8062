ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aproximacion1etlspark"
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
// Forked `run` output normally passes through sbt's logger, which prefixes
// every line with "[info] " — that prefix breaks machine parsing of the
// one-line JSON contract Bench/Verify print. Stream the forked process's
// stdout/stderr through untouched instead.
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
) ++ {
  // local[32] shares ONE driver heap across 32 executor threads: a small
  // fixed -Xmx (~150MB of execution memory per slot at 8g) showed 2-4x
  // per-query bench swings from GC pauses landing inside timed windows.
  // But a fixed LARGE -Xmx over-commits small contributor machines, so
  // the default SCALES WITH THE BOX: 20% of physical RAM (the 128GiB
  // bench box -> ~25g, a 16GiB laptop -> ~3g, never a failed JVM start).
  // SPARK_DRIVER_MEM pins an explicit size when you know better.
  sys.env.get("SPARK_DRIVER_MEM") match {
    case Some(m) => Seq(s"-Xmx$m")
    case None    => Seq("-XX:MaxRAMPercentage=20.0")
  }
}
