package pageplus.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog seam (SURVEY §1, environment note): the sandbox stands the Iceberg
  * `pages` table in with parquet, but every pipeline consumes a [[PagesSource]]
  * so a real Iceberg/HMS catalog is a configuration switch, not a code change.
  * Set `graft.pages.table` (catalog table name) or `graft.pages.path` (parquet
  * directory) on the session.
  */
sealed trait PagesSource {
  def pages(spark: SparkSession): DataFrame
}

/** Parquet-directory stand-in (the sandbox default). */
final case class ParquetPages(path: String) extends PagesSource {
  override def pages(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Catalog table (Iceberg/HMS/temp view) — snapshot metadata, partition
  * pruning and time travel come from the catalog, not this code. */
final case class CatalogPages(table: String) extends PagesSource {
  override def pages(spark: SparkSession): DataFrame = spark.read.table(table)
}

object PagesSource {
  def fromConf(spark: SparkSession): PagesSource = {
    val table = spark.conf.get("graft.pages.table", "")
    if (table.nonEmpty) CatalogPages(table)
    else ParquetPages(spark.conf.get("graft.pages.path"))
  }
}
