ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "zefspark"
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
  // -Xmx is a cap, not a reservation. 8g proved too small for the full
  // 99-query bench: ~5 GB of unified memory thrashes once the shared
  // graph-encode caches exceed it, and every cache-leaning query pays
  // disk-deserialize churn (measured: whole bench 303.8 s at 8g vs
  // 51.7 s at 24g, same 4 cores — gql_parsed_nested alone 65 s → 2.1 s).
  // The harness machine has 128 GiB; size the single local JVM like the
  // executor fleet it stands in for.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // diagnostic lever: SPARK_GRAFT_GCLOG=1 streams GC events to stderr so
  // intermittent multi-second stalls can be attributed to (or cleared of)
  // collector pauses without changing anything else about the run
  (if (sys.env.contains("SPARK_GRAFT_GCLOG")) Seq("-Xlog:gc") else Seq.empty) ++
  // ad-hoc diagnostic flags for the forked run JVM (e.g. spark.eventLog.*
  // system properties — SparkConf reads -Dspark.* automatically); sbt's own
  // -J options don't reach forked mains, this does
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
