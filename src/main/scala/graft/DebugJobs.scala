package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Temporary optimization-round instrumentation: run ONE query with a job
  * listener printing per-job wall time + description, to attribute a heavy
  * query's seconds to its constituent jobs. Not part of the bench. */
object DebugJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-debugjobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var log = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          log ::= f"job ${je.jobId}%4d ${ms}%9.1f ms  $desc"
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        log ::= f"  stage ${si.stageId}%4d wall=$ms%6d ms run=$run%6d ms tasks=${si.numTasks}%3d  ${si.name.take(90)}"
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      log = Nil
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) it.next())
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      System.err.println(f"==== $name run $r: $sec%.3f s, ${log.size} jobs ====")
      log.reverse.foreach(System.err.println)
    }
    spark.stop()
  }
}
