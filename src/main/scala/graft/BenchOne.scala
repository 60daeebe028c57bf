package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named query from [[SparkEntry.queries]] repeatedly in
  * a warm session (the full [[Bench]] times each query once, cold — useful for
  * the driver signal, useless for isolating a single query's regression).
  *
  * Usage: runMain graft.BenchOne <sfDir> <queryName> [runs]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 5
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-one-$name")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      // drain the executed plan's RDD — same protocol as Bench (a Dataset
      // count() over a top-k degrades to a sampled global sort that
      // re-executes the child; an RDD count over the compiled plan doesn't)
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      System.err.println(f"[benchone] $name run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
