package pageplus.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpoint-resumable execution (SURVEY §2.10, north_rule): committed work is
  * recorded in a manifest table of urls; a resumed run processes only the
  * anti-join remainder, making re-runs idempotent. This is the parquet stand-in
  * for Iceberg snapshot metadata — with a real catalog the manifest read
  * becomes a snapshot-diff, the seam being exactly these two functions.
  */
object Checkpoint {

  /** Record completed urls (append — each batch commit adds a manifest file). */
  def commit(done: DataFrame, manifestDir: String): Unit =
    done.select("url").write.mode("append").parquet(manifestDir)

  /** Rows of `input` not yet committed. Left-anti join on url — at scale this
    * shuffles only on the (compact) url key, and AQE turns it into a broadcast
    * when the manifest is small. */
  def pending(input: DataFrame, manifestDir: String): DataFrame = {
    val spark = input.sparkSession
    val exists =
      try {
        val p = new org.apache.hadoop.fs.Path(manifestDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      } catch { case _: Exception => false }
    if (!exists) input
    else input.join(spark.read.parquet(manifestDir).select("url"), Seq("url"), "left_anti")
  }
}
