ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "psxdatapipelinespark"
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
// Pass the forked JVM's stdout straight through (no "[info] " prefix):
// Bench/Verify print machine-readable JSON lines that downstream
// parsers read from captured stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark sessions are process-global (getOrCreate + active/default
// registries): suites running concurrently in the forked JVM race
// ExtensionsSpec's clear-and-rebuild of the session. Run sequentially.
Test / parallelExecution := false
Test / testForkedParallel := false
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
// Heap is clamped BELOW 32g: crossing the compressed-oops boundary
// doubles every object pointer and measurably slows the row-heavy
// operators (dedup verify: ~20s at 8-30g vs 50-120s at 33-48g on the
// same query). local[N] workloads here never need more than 30g.
val requestedMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val clampedMem = {
  val g = "([0-9]+)g".r
  requestedMem match {
    case g(n) if n.toInt > 30 => "30g"
    case other => other
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$clampedMem",
  // pre-size the heap: lazy heap growth under allocation-heavy
  // operators causes multi-x run-to-run variance on large heaps
  s"-Xms$clampedMem",
  "-XX:+AlwaysPreTouch",
  // 40+ codegen'd queries in one JVM overflow the default 240m JIT
  // code cache; once full, late queries run interpreted (5-10x)
  "-XX:ReservedCodeCacheSize=1g",
)
