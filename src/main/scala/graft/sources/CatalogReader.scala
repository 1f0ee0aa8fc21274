package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.CatalogModel
import graft.functions.GF

/** Catalog plane: data.json scan + exploded relational views
  * (SURVEY §2.1 S3, §1.4).
  *
  * The nested catalog document becomes four flat DataFrames joined by
  * identifier — `catalogs`, `datasets`, `distributions`, `fields` — which
  * is what all metadata queries run against. The metadata plane is small
  * (thousands of rows even in production), so these views broadcast for
  * free when joined against the 100 TB data plane.
  */
object CatalogReader {

  /** S3 — multiline JSON catalog scan with the declared schema
    * (reference base.py:408-421 `get_metadata_from_file`). */
  def readJson(spark: SparkSession, path: String, catalogId: String): DataFrame =
    spark.read.option("multiLine", value = true)
      .schema(CatalogModel.schema).json(path)
      .withColumn("catalog_id", lit(catalogId))

  /** Exploded dataset view: one row per dataset, catalog columns kept. */
  def datasets(catalog: DataFrame): DataFrame =
    catalog.select(col("catalog_id"),
        explode(col("dataset")).as("ds"))
      .select(col("catalog_id"), col("ds.*"))
      .withColumnRenamed("identifier", "dataset_id")

  /** Exploded distribution view with dataset_id derivation (SURVEY §2.4
    * J3: dataset id of "N.M" is split(".")[0], reference
    * processors.py:133-134). */
  def distributions(catalog: DataFrame): DataFrame =
    catalog.select(col("catalog_id"),
        explode(col("dataset")).as("ds"))
      .select(col("catalog_id"), col("ds.identifier").as("dataset_id"),
        explode(col("ds.distribution")).as("dist"))
      .select(col("catalog_id"), col("dataset_id"), col("dist.*"))
      .withColumnRenamed("identifier", "distribution_id")

  /** Exploded field view: one row per declared series column.
    * Field ids/titles whitespace-stripped as on xlsx load (F1,
    * reference base.py:940-948 `clean_catalog`). */
  def fields(catalog: DataFrame): DataFrame =
    distributions(catalog)
      .select(col("catalog_id"), col("dataset_id"), col("distribution_id"),
        explode(col("field")).as("f"))
      .select(col("catalog_id"), col("dataset_id"), col("distribution_id"),
        GF.stripSpaces(col("f.id")).as("field_id"),
        GF.stripSpaces(col("f.title")).as("field_title"),
        col("f.type").as("field_type"),
        col("f.specialType").as("specialType"),
        col("f.specialTypeDetail").as("specialTypeDetail"),
        col("f.scrapingIdentifierCell").as("scrapingIdentifierCell"),
        col("f.scrapingDataStartCell").as("scrapingDataStartCell"))

  /** P1 — time-series-only filter: keep distributions having a field with
    * specialType == "time_index" (reference base.py:478-487). Uses the
    * `exists` higher-order function on the nested array — no explode, no
    * shuffle. */
  def timeSeriesDistributions(distributions: DataFrame): DataFrame =
    distributions.filter(
      exists(col("field"), f => f.getField("specialType") === "time_index"))

  /** P5 — method classification (reference base.py:123-153):
    * csv_file when downloadURL present; else by scrapingFileURL extension:
    * txt -> text_file, xls/xlsx -> excel_file, anything else -> null. */
  def withMethod(distributions: DataFrame): DataFrame =
    distributions.withColumn("method",
      when(col("downloadURL").isNotNull, "csv_file")
        .when(GF.fileExtension(col("scrapingFileURL")) === "txt", "text_file")
        .when(GF.fileExtension(col("scrapingFileURL")).isin("xls", "xlsx"),
          "excel_file"))

  /** P7 — strip scraping-only metadata before publishing
    * (reference base.py:662-671). */
  def stripScrapingMetadata(distributions: DataFrame): DataFrame =
    distributions.drop("scrapingFileURL", "scrapingFileSheet")
}
