ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "barcospark"
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
// pass the forked program's stdout through VERBATIM (no "[info] " line
// prefix): Bench prints one machine-read JSON line that downstream
// tooling parses from stdout
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
  // ceiling only — the host has 128 GiB. Execution memory is OFF-HEAP
  // (Graft.configure), so the heap holds only caches, broadcasts, and
  // small objects; 24g is ample and keeps worst-case GC pauses bounded
  // (48g measured no better on any workload here).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Batch-throughput collector: with Tungsten execution memory off-heap
  // (Graft.configure) the heap holds only small short-lived objects;
  // ParallelGC beats G1's concurrent cycles on memory-bandwidth-starved
  // hosts (measured 5.9 s -> 3.9 s on the 2M-msg produce).
  "-XX:+UseParallelGC",
  // The CI host's disk throttles to single-digit MB/s with ~1 s fsyncs
  // under load, which turns KB-sized topic writes into 120 s+ stalls.
  // Tests and benches put their SCRATCH data (topic stores, staged bench
  // messages, checkpoints) on tmpfs so they measure the engine, not the
  // broken device; testdata reads still come from the real disk. A real
  // deployment writes to cluster/object storage and never sees this knob.
  s"-Djava.io.tmpdir=${if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"}",
)
