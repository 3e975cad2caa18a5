ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sbb_nerspark"
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
  // Shuffle/spill local dirs (guide §1.2 step 3 — config AFTER the
  // algorithm; §7.1-style evidence first): in-JVM stack sampling of the
  // kg map stage showed 38% of RUNNABLE task-thread samples inside
  // FileOutputStream.open0 + UnixFileSystem syscalls — this sandbox's
  // root fs (ext4 on virtio) serializes concurrent file creates, so
  // shuffle-file creation, not compute, dominated every shuffling
  // stage. Default the local dirs to the memory-backed fs — the local
  // analog of pointing spark.local.dir at fast local NVMe on a
  // production node (shuffle data here is ≤ tens of MB; /dev/shm is
  // 126 GiB). Parameterised: a deployment overrides via
  // SPARK_GRAFT_LOCAL_DIR (e.g. an NVMe array path).
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
    "/dev/shm/spark-local")}",
)
// Bypass-merge shuffle concatenation: FileChannel.transferTo on this
// host mmaps+unmaps every per-partition spill file (stack-sampled:
// copyFileStreamNIO -> transferToTrustedChannel -> map0/unmap0 was
// ~50% of q73's runnable task samples; munmap TLB shootdowns hurt at
// 32 threads). Stream-copy instead — Spark exposes the flag for
// exactly such filesystems.
javaOptions += "-Dspark.file.transferTo=false"
