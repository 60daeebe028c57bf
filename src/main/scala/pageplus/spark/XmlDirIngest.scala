package pageplus.spark

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's LITERAL input mode — a directory of individual PAGE-XML
  * files (`io/utils.py:9-47` walks a dir, sniffs each file) — as a Spark
  * source: `binaryFile` scan -> one row per file -> the same fused
  * parse+extract pipeline as the parquet path. At 10^12 documents a
  * files-on-disk layout is the LANDING format, not the working one (small
  * files kill any object store and the scan loses column pruning /
  * predicate pushdown), so the contract is: ingest the directory ONCE into
  * the Iceberg `pages` table, scan parquet thereafter — this source is that
  * landing step, and the byte-identity oracle proves nothing is lost on the
  * way in.
  */
object XmlDirIngest {

  /** Materialize `pages` rows as one `<stem>.xml` file per document —
    * distributed per-partition IO (no driver collect), idempotent behind a
    * `_SUCCESS` marker (the bench-table caching pattern). Fixture use: the
    * sandbox has no real crawl directory, so the proven pages lift writes
    * one. */
  def writeXmlDir(pages: DataFrame, dir: String): String = {
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(dir).mkdirs()
      pages.select("url", "html").foreachPartition { it: Iterator[Row] =>
        it.foreach { r =>
          val stem = r.getString(0).stripPrefix("doc://")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$stem.xml"), r.getAs[Array[Byte]](1))
        }
      }
      marker.createNewFile()
    }
    dir
  }

  /** Directory scan: one (url, html) row per `*.xml` file, url recovered
    * from the file stem. PAGE sniffing stays the parser's per-row error-row
    * contract downstream (non-PAGE bytes yield `parseOk = false` rows, never
    * silent drops — same as the table path). */
  def readXmlDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .load(dir)
      .select(
        concat(lit("doc://"), regexp_extract(col("path"), "([^/]+)\\.xml$", 1)).as("url"),
        col("content").as("html"))
}
