package pageplus.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import pageplus.data.PagesFromDocuments
import pageplus.spark.Pipeline

/** Structured Streaming lift of the batch extraction (SURVEY §2.10): the same
  * typed transforms run unchanged under `readStream`. Documents are
  * embarrassingly parallel, so no stateful operator or watermark is needed —
  * the streaming surface exists for incremental ingest (new corpus files
  * appearing in the table location) with exactly-once file-source semantics.
  */
object StreamingExtract {

  private val counter = new AtomicInteger(0)

  /** Run the extraction as a streaming query over the documents parquet and
    * drain it synchronously into a memory sink; returns the result table. */
  def extractOnce(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    // the file-stream source wants a directory; select our table's file by name
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val pages = PagesFromDocuments.liftDf(stream)(PagesFromDocuments.cleanDoc).toDF()
    val extracted = Pipeline.fulltext(pages).toDF()
    val name = s"stream_extract_${counter.incrementAndGet()}"
    val q = extracted.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
