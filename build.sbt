ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pglogicalreplicationspark"
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
// Forked run output must reach stdout WITHOUT sbt's "[info] " prefix:
// the driver parses Bench/Verify stdout as bare JSON lines.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // A 300-query double-pass bench generates thousands of whole-stage
  // codegen classes; the JDK default 240m code cache fills late in
  // pass 1 and the JIT silently stops compiling — compute-heavy
  // queries then run partially interpreted with 10-20x task-time
  // inflation (measured: q87 0.5s -> 9.8s, q88 0.5s -> 9.0s in-suite
  // while bit-identical in isolation). Size the cache to the suite
  // and keep flushing enabled so long sessions degrade gracefully.
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("SPARK_EXTRA_JVM_OPTS").toSeq
  .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
