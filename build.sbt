ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jsonschemaspark"
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
// Pass the forked process's stdout through UNPREFIXED: sbt's default
// LoggedOutput strategy prepends "[info] " to every stdout line, which
// breaks machine parsing of Bench's single JSON metric line.
outputStrategy := Some(StdoutOutput)
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
// SPARK_DRIVER_MEM is honored up to 16g. Heaps far beyond the working
// set measured STRICTLY slower on this suite — BENCH_r02's warm>cold
// inversion: at -Xmx89g (the driver-conditions heap) warm suite runs
// degraded 5-10x (46s vs 4.8s at 16g, identical workload) because G1
// sizes eden/old toward the big ceiling, so every run commits tens of GB
// of fresh zeroed pages and takes multi-second evacuation pauses
// (GC(56) 6.4s; experiments + gc logs in BENCH/BASELINE.md round 3).
// 16g is ~4x the suite's live set. A workload that genuinely needs a
// bigger heap sets SPARK_GRAFT_XMX — an explicit, never-clamped override.
val forkHeap: String = sys.env.get("SPARK_GRAFT_XMX").getOrElse {
  val requested = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  val unit = "(?i)^(\\d+)([kmgt])b?$".r
  requested match {
    case unit(n, u) =>
      val mb = u.toLowerCase match {
        case "k" => n.toLong / 1024
        case "m" => n.toLong
        case "g" => n.toLong * 1024
        case "t" => n.toLong * 1024 * 1024
      }
      if (mb > 16384) "16g" else requested
    case other =>
      // unparseable (plain bytes or an exotic driver-emitted format):
      // never pass through unclamped — that silently reintroduces the
      // G1 ballooning this clamp exists to prevent. Plain byte counts
      // are valid -Xmx values; anything else falls back to the clamp.
      scala.util.Try(other.trim.toLong).toOption match {
        case Some(b) if b > 0 && b <= 16L * 1024 * 1024 * 1024 => other.trim
        case _ => "16g"
      }
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkHeap",
)
