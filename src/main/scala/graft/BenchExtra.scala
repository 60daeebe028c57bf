package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4) — NOT the driver
  * bench. Times a subset of `SparkEntry.queries` with the exact Bench
  * protocol (same session config, same toRdd drain, min of N runs) so a
  * single query can be iterated on without the 25-minute full run, and
  * optionally writes `.explain("formatted")` for each to plans/<tag>/.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra [--plans plans/r06 --suffix _before] q1 q2 ..."
  * With no query args, times the ~20 most expensive queries from r5.
  */
object BenchExtra {

  val DefaultHeavy: Seq[String] = Seq(
    "cluster_canonical", "host_rank_converged", "neardup_clusters",
    "corpus_filter", "hits_scores", "corpus_pipeline", "code_detect",
    "anchor_text_agg", "domain_pareto", "bpe_train", "asof_join_exec",
    "audience_overlap", "oph_minhash", "fulltext_skew_dehyphenate",
    "bpe_fertility", "hll_cumulative", "index_delta", "host_quality_rollup",
    "cms_freq", "registered_domain", "crawl_budget", "ann_lsh",
    "audio_phash_dedup", "minhash_neardup", "ngram_jaccard")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("GRAFT_BENCHX_RUNS", "2").toInt

    var plansDir: Option[String] = None
    var suffix = ""
    var all = false
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--all" => all = true; i += 1
        case q => names += q; i += 1
      }
    }
    val selected =
      if (all) SparkEntry.queries.keys.toSeq.sorted
      else if (names.isEmpty) DefaultHeavy else names.toSeq

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    plansDir.foreach(d => new java.io.File(d).mkdirs())

    val times = selected.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchx: $name")
      plansDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/$name$suffix.txt"), plan)
        } catch { case e: Exception =>
          System.err.println(s"[benchx] plan dump failed for $name: $e")
        }
      }
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd
            .foreachPartition(it => while (it.hasNext) it.next())
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[benchx] $name failed: $e"); None
        }
      }
      val ok = (1 to runs).flatMap(_ => once())
      val t = if (ok.isEmpty) -1.0 else ok.min
      System.err.println(f"[benchx] $name%-28s min=$t%7.3f s  runs=${ok.map(x => f"$x%.3f").mkString(",")}")
      name -> t
    }
    spark.sparkContext.setJobDescription(null)
    def f(d: Double): String = "%.3f".format(d)
    println(times.map { case (k, v) => s""""$k":${f(v)}""" }
      .mkString("""{"benchx":{""", ",", s"""},"sf":"$sfDir","total":${f(times.map(_._2).filter(_ > 0).sum)}}"""))
    spark.stop()
  }
}
