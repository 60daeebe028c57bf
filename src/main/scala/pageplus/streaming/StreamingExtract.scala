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

  /** Same lift for the HTML main-content path: generate -> parse -> block
    * score under readStream, proving every per-row extraction surface of the
    * engine is streaming-ready without code changes. */
  def htmlContentOnce(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val extracted = graft.webtext.WebText.mainContent(
      graft.webtext.WebText.htmlPages(stream).toDF()).toDF()
    val name = s"stream_html_${counter.incrementAndGet()}"
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

  /** Stateful gap-based sessionization under Structured Streaming:
    * `flatMapGroupsWithState` carries (lastSec, nSessions, nEvents) per user —
    * the custom-state operator surface (KeyValueGroupedDataset) the window
    * aggregation doesn't exercise. Events are sorted by (sec, event_id) inside
    * each group per micro-batch; with the AvailableNow one-shot drain used
    * here that is exact and equals the batch q11 answer. Across multiple
    * micro-batches the state assumes batch-ordered arrival per user — the
    * standard gap-sessionization caveat a production deployment would handle
    * by buffering within the watermark before folding into state. */
  def sessionizeOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val evs = stream
      .withColumn("sec", graft.TimeCols.ntzEpochSeconds(col("ts")))
      .select(col("user_id"), col("sec"), col("event_id"))
      .as[(Long, Long, Long)]
    val sessions = evs.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[(Long, Long, Long)]) =>
          val sorted = it.toArray.sortBy(e => (e._2, e._3))
          var (last, ns, ne) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, sec, _) =>
            if (last == Long.MinValue || sec - last > 1800L) ns += 1
            ne += 1
            last = sec
          }
          state.update((last, ns, ne))
          Iterator((user, ns, ne))
      }
      .toDF("user_id", "n_sessions", "n_events")
    val name = s"stream_sessions_${counter.incrementAndGet()}"
    val q = sessions.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // the memory sink in update mode APPENDS one row per user per micro-batch
    // (no upsert); keep each user's LAST update — n_events grows monotonically,
    // so the max (n_events, n_sessions) struct is the final state even if the
    // source ever splits into multiple batches
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("last"))
      .select(col("user_id"), col("last.n_sessions").as("n_sessions"),
        col("last.n_events").as("n_events"))
  }

  /** Streaming windowed aggregation over the events table: event-time watermark
    * + 1-hour tumbling windows (the Structured Streaming shape the engine
    * offers for incremental corpora metrics). Drained synchronously; complete
    * mode so every window is emitted for the batch-equivalence oracle. */
  def eventsWindowedOnce(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val agg = stream
      // parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP. A plain cast
      // injects the session zone (and a DST gap would even corrupt the window
      // boundary), so the watermark column is the wall-clock interpreted as
      // UTC, and the emitted hour string is formatted straight off the NTZ
      // value — both session-TZ-invariant (see graft.TimeCols).
      .withColumn("evt", graft.TimeCols.ntzAsUtcInstant(col("ts")))
      .withWatermark("evt", "1 hour")
      .groupBy(
        window(col("evt"), "1 hour"),
        // functionally determined by the window, TZ-free to render
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("hour"), col("event_type"), col("n"), col("value_cents"))
    val name = s"stream_events_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
