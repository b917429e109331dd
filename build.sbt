ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ght2dmspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// all suites share one SparkSession (graft.TestSpark) — run serially
Test / parallelExecution := false
// LocalClusterSpec owns its JVM's SparkContext lifecycle (it starts a
// local[4] session, stops it, then starts a local-cluster[2,2,2048]
// one with separate executor processes), so it runs in its own forked
// test JVM; everything else shares the TestSpark session in one JVM.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (cluster, rest) = tests.partition(_.name == "graft.LocalClusterSpec")
  Seq(
    Tests.Group("graft", rest, Tests.SubProcess(opts)),
    Tests.Group("local-cluster", cluster, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
// the two groups must not run concurrently (CPU contention skews the
// suites' plan-shape timing assertions; and both fork big JVMs)
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
