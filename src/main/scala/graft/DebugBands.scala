package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary r6 instrumentation: band-bucket occupancy of the LSH candidate
  * generators at a given SF — evidence for the hot-bucket cap threshold. */
object DebugBands {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(16)

    def report(label: String, bands: org.apache.spark.sql.DataFrame): Unit = {
      val top = bands.groupBy("band").agg(count(lit(1)).as("n"))
        .orderBy(desc("n")).limit(10).collect()
      System.err.println(s"[bands] $label top buckets: " +
        top.map(r => r.getLong(1)).mkString(","))
    }

    for ((label, df) <- Seq(
        ("planted", graft.textops.Dedup.planted(docs)),
        ("plantedTail", graft.textops.Dedup.plantedTail(docs)),
        ("raw", docs.select("doc_id", "text")))) {
      val (reps, _) = graft.textops.Dedup.textGroups(df)
      val mh = reps.select("doc_id", "text").as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, t) =>
          val sig = graft.textops.TextHash.minHashSignature(
            graft.textops.TextHash.wordShingles(t))
          graft.textops.TextHash.bandKeys(sig).map(b => (id, b))
        }).toDF("doc_id", "band")
      report(s"$label/minhash", mh)
      val oph = reps.select("doc_id", "text").as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, t) =>
          val sig = graft.textops.TextHash.ophSignature(
            graft.textops.TextHash.wordShingles(t))
          graft.textops.TextHash.ophBandKeys(sig).map(b => (id, b))
        }).toDF("doc_id", "band")
      report(s"$label/oph", oph)
      val sim = reps.select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.textops.TextHash.simHashKeys(
            graft.textops.TextHash.simHash(t)).map(c => (id, c))
        }.toDF("doc_id", "band")
      report(s"$label/simhashKeys", sim)
    }
    spark.stop()
  }
}
