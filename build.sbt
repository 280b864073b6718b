ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wopenspark"
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
  // local[32] runs 32 concurrent array-heavy tasks in one JVM; 8g keeps
  // the bench permanently in GC once the dedup queries have run
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 116 codegen-heavy queries in one JVM push the default 240m
  // segmented code cache to the occupancy where the JDK-17 sweeper
  // flushes warm nmethods; the recompile churn made late bench queries
  // stochastically 2-17x slower (measured: full-run 202s/123s/103s at
  // default vs 81s/83s at 512m, dp01 85s worst-case vs 7.8s). GC was
  // ruled out first (-Xlog:gc total 2.9s for the worst pair).
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
