ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "micmac_li3dsspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// RetrySpec needs maxTaskFailures > 1, which is a SparkContext-level
// setting (`local[4, 2]`) — it cannot share the one-attempt session
// every other suite uses, so it runs in its own forked JVM. The two
// groups run sequentially (ForkedTestGroup limit), keeping the suite's
// resource profile identical to the ungrouped run.
Test / testGrouping := {
  // start from the configured fork options (they carry workingDirectory
  // = baseDirectory and the output strategy) instead of a bare
  // ForkOptions(), which would run test JVMs in sbt's process cwd
  val forkOpts = (Test / forkOptions).value
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val (retry, rest) =
    (Test / definedTests).value.partition(_.name == "graft.RetrySpec")
  Seq(
    new Tests.Group("retry", retry, Tests.SubProcess(forkOpts)),
    new Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
