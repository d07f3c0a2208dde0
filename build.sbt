ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "busdatapipelinespark"
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
// Forked run output passes through UNDECORATED: sbt's default LoggedOutput
// prefixes every stdout line with "[info] ", which breaks any consumer that
// json-parses a program's output line (e.g. the bench driver).
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
  // 16g default (was 8g), still env-overridable. In local mode driver and
  // executors share ONE heap; a long-lived session running the whole
  // 176-query surface accumulates broadcast/shuffle/codegen state whose
  // cleanup rides on GC, and under 8g the r15 baseline bench measured
  // full-GC storms as 4-38 s steady-run spikes (q141 steady [6.8, 8.3,
  // 38.1] vs 4.2 cold; q162 [6.7, 8.5, 27.7]). At 16g the same bench on
  // the same box ran 212->170 s cold / 120->92 s steady with every spike
  // gone (OPTIMIZATION_r15.md). The box has 128 GiB; 16g also covers the
  // sf10 tier's driver state with margin.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_FLAGS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
