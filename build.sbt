ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ftmcolumnstorespark"
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
// Right-size the heap: sf0.1 at local[32] fits comfortably in 16g,
// and an oversized heap (e.g. 96g) turns old-gen full GCs into
// multi-second pauses that land on arbitrary bench queries and read
// as phantom regressions. Cap whatever the environment asks for at
// 16g; smaller explicit values pass through unchanged.
val driverMem: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val Mib = "^(\\d+)m$".r
  val Gib = "^(\\d+)g$".r
  val mib = req match {
    case Mib(n) => n.toLong
    case Gib(n) => n.toLong * 1024
    case _      => 8 * 1024L
  }
  math.min(mib, 16 * 1024L).toString + "m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
