ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pineconedatasetsspark"
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
// Forked runMain output passes through UNPREFIXED (no "[info] "/"[error] "
// decoration): the bench driver parses the totals JSON line from a bounded
// stdout tail, and sbt's default LoggedOutput both prefixes every line and
// routes the child's stderr at error level — which buried the JSON line
// behind decorated log noise (BENCH_r10 "parsed": null). showSuccess=false
// additionally drops sbt's trailing "[success] Total time" line, so the
// bench totals JSON is the FINAL stdout line of the whole invocation.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // local[32] runs all 32 "executors" in this one JVM; at 8g the
  // array-heavy operators (minhash signatures, shingle sets) GC-thrash
  // with 10x run-to-run variance. The box has 128 GiB — size like a real
  // executor fleet would be sized.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-Xms8g",
  "-XX:+UseG1GC",
  // On this virtualized host, cross-vCPU wakeups cost 50-75us, so a
  // 23-thread parallel GC barrier turns millisecond young pauses into
  // multi-second stalls (observed 4.3 s). Few GC threads = few barriers.
  "-XX:ParallelGCThreads=8",
  "-XX:ConcGCThreads=2",
  // 46 queries × whole-stage-codegen classes overflow the default 240 MB
  // code cache mid-bench; once full, C2 stops compiling and hot loops run
  // interpreted (30x slowdowns on later queries). Size it for the suite.
  "-XX:ReservedCodeCacheSize=2g",
) ++ sys.env.get("GRAFT_EXTRA_JVM").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
