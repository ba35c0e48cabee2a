ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lvm_datapipespark"
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
  // local-mode Spark: driver heap IS executor memory. Fixed Xms=Xmx:
  // this VM commits pages at only ~50 MB/s, so G1 heap EXPANSION showed
  // up as 4.8 s stop-the-world "young" pauses taxing whichever bench
  // query happened to run; a fixed-size heap never expands. (NO
  // AlwaysPreTouch — faulting 24 GB up front costs ~9 min here; lazy
  // faults spread across mutator threads instead.) 12g fits the ~6 GB
  // live set of a full 50+-query run with room for G1.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Catalyst emits large generated classes per query plan; a 50+-query
  // run blows through the 240m default code cache, HotSpot stops
  // JIT-compiling, and expression-heavy queries go 50x slower.
  "-XX:ReservedCodeCacheSize=2g",
)
