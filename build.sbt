ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oculusdatapipelinespark"
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
// Forked run output: inherit this process's stdout/stderr directly.
// sbt's default LoggedOutput strategy prefixes every forked-stdout line
// with "[info] " — which made graft.Bench's machine-readable report
// line start with "[info] {" instead of "{", unparseable by any
// line-starts-with-JSON collector (observed as parsed:null for seven
// consecutive BENCH_r*.json despite the complete line sitting in the
// captured tail).
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
  // local[32] at sf0.1 with ~20 persisted stage outputs: 8g left the
  // unified-memory pool (~60% of heap) under 5g for 32 concurrent task
  // threads, so storage evicted to disk and execution spilled under any
  // co-tenant memory pressure — per-query bench times spiked 5-20x on
  // the shared grading machine. The host has 128 GiB; give the single
  // local-mode JVM a real slice of it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
