ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pageplusspark"
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
  "-XX:+UseParallelGC",
  // On a fully-subscribed local[32] box the default ParallelGC thread count
  // (5/8 x cores = 23) competes with the 32 mutator threads and costs ~40%
  // extraction throughput; 8 collector threads keep up with the allocation
  // rate and mirror per-executor GC sizing on a real cluster (an 8-core
  // executor JVM defaults to 8 GC threads). Neutral at local[8] and below.
  "-XX:ParallelGCThreads=8",
  // Shuffle/block-manager scratch on tmpfs (r6, guide §2.1: local disk
  // bandwidth is a shuffle limit). Every exchange writes M x R shuffle
  // files; on this VM's virtio /tmp the file create/write/close chain
  // measured 4-6 s of summed shuffle-write time for 3 MB exchanges —
  // pure fixed overhead at 1024 files per exchange. Query-scale shuffle
  // data here is MBs against a 126 GB tmpfs; production twin: NVMe/ramdisk
  // spark.local.dir, standard cluster practice. Parameterised: honor an
  // explicit SPARK_LOCAL_DIRS, fall back to /dev/shm when present.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_LOCAL_DIRS",
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local" else "/tmp")}",
  // Same rationale for every other scratch surface: java.io.tmpdir feeds
  // streaming temp checkpoints (per-batch WAL/commit fsyncs), the Bench
  // replicate dir, xml_dir_ingest's file tree; the warehouse dir takes the
  // bucketed/partitioned saveAsTable writes + Hadoop commit renames.
  s"-Djava.io.tmpdir=${if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"}",
  s"-Dspark.sql.warehouse.dir=${if (new java.io.File("/dev/shm").isDirectory)
    "/dev/shm/spark-warehouse" else "spark-warehouse"}",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
scalacOptions ++= Seq("-encoding", "UTF-8", "-deprecation")
