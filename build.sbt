ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arcdebeziumpipelinepluginspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Fixed, pre-touched heap: this sandbox's hypervisor (firecracker)
  // demand-faults guest memory, so a growing heap pays first-touch
  // page-fault storms INSIDE timed regions (measured: first 1M-event
  // apply draw 3-8x slower than the second, 30-47% sys time; with
  // pre-touch the draws are equal). Faulting moves to JVM startup.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  // G1's concurrent cycles fall behind the allocation rate of JSON-heavy
  // decode at high thread counts (measured: 2x slowdown, growing per-batch
  // cost); the throughput collector keeps per-batch cost flat.
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
