ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seriestiempoarscrapingspark"
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
  // Bench calls System.gc() between queries so each timed run starts on
  // a clean heap. That call MUST be stop-the-world: with
  // +ExplicitGCInvokesConcurrent it returns immediately and the
  // concurrent cycle's 32 GC threads run INSIDE the next timed query —
  // measured 1.6s -> 8-22s on the query following a shingle-heavy one
  // (tens of GB of short-lived garbage). A blocking full GC lands
  // BETWEEN queries where the pause is untimed.
  "-XX:-ExplicitGCInvokesConcurrent",
  // Throughput collector (r17 A/B, two interleaved rounds): the bench's
  // allocation profile is short-lived codegen-row garbage in bursts;
  // ParallelGC measured consistently faster than G1+MaxGCPauseMillis
  // (q103 2.8-5.2s -> 2.3-2.6s, q182 2.0-2.6s -> 1.7-2.1s at sf0.1) —
  // there is no latency SLO inside a batch query, so the throughput
  // collector is the right default for this workload.
  "-XX:+UseParallelGC",
)
