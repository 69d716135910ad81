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
// Pass the forked program's stdout through VERBATIM instead of routing
// it through sbt's logger: the logger prefixes every line with
// "[info] ", so the one-line JSON contract Bench/Verify print for the
// harness never appeared as a bare parseable line (five rounds of
// BENCH_r*.json show "parsed": null with the JSON visibly sitting in
// the captured tail behind an "[info] " prefix).
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
// Right-size the heap: sf0.1 at local[32] fits comfortably in 16g,
// and an oversized heap (e.g. 96g) turns old-gen full GCs into
// multi-second pauses that land on arbitrary bench queries and read
// as phantom regressions. Cap whatever the environment asks for at
// 16g; smaller explicit values pass through unchanged. Larger scale
// factors (sf1 is 10× the data) legitimately need more: set
// SPARK_DRIVER_MEM_FORCE to bypass the cap entirely. Any silent
// override is logged so an OOM is never a mystery.
val driverMem: String = {
  val Mib = "^(\\d+)\\s*m$".r
  val Gib = "^(\\d+)\\s*g$".r
  def parseMib(s: String): Option[Long] = s.trim.toLowerCase match {
    case Mib(n) => Some(n.toLong)
    case Gib(n) => Some(n.toLong * 1024)
    case _      => None
  }
  sys.env.get("SPARK_DRIVER_MEM_FORCE").flatMap(parseMib) match {
    case Some(forced) => forced.toString + "m" // explicit escape hatch, no cap
    case None =>
      val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val mib = parseMib(req).getOrElse {
        println(s"[graft] SPARK_DRIVER_MEM='$req' not parseable " +
          "(want e.g. 4096m or 16g); using default 8g")
        8 * 1024L
      }
      val capped = math.min(mib, 16 * 1024L)
      if (capped < mib)
        println(s"[graft] SPARK_DRIVER_MEM=$req capped to 16g " +
          "(bench noise guard); set SPARK_DRIVER_MEM_FORCE to override")
      capped.toString + "m"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
