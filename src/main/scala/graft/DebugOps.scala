package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Optimization-round instrumentation #2: run ONE query and, for EVERY query
  * execution it triggers (including eager checkpoint materializations), dump
  * the executed plan's per-operator metrics — operator name, output rows and
  * any time metrics — so heavy stages can be attributed to operators instead
  * of guessed at. Not part of the bench. */
object DebugOps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-debugops")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (k, m) =>
          m.value > 0 && (k.contains("time") || k.contains("Time") ||
            k == "numOutputRows" || k.contains("spill") || k.contains("dataSize"))
        }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
      if (interesting.nonEmpty || depth < 3)
        out.append("  " * depth).append(p.nodeName)
          .append("  ").append(interesting.mkString(" ")).append("\n")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, out)
        case q: QueryStageExec => walk(q.plan, depth + 1, out)
        case r: ReusedExchangeExec => walk(r.child, depth + 1, out)
        case _ => p.children.foreach(walk(_, depth + 1, out))
      }
    }

    @volatile var execs = List.empty[String]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val sb = new StringBuilder
        sb.append(f"---- exec $fn ${durationNs / 1e9}%.3f s ----\n")
        try walk(qe.executedPlan, 0, sb)
        catch { case e: Throwable => sb.append(s"walk failed: $e\n") }
        execs ::= sb.toString
      }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })

    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      execs = Nil
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) it.next())
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      System.err.println(f"==== $name run $r: $sec%.3f s, ${execs.size} executions ====")
      if (r == runs) execs.reverse.foreach(System.err.println)
    }
    spark.stop()
  }
}
