package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.CatalogReader

/** Catalog metadata validation (SURVEY §2.9 catalog-level; reference
  * validate_catalog against the config/schemas JSON-Schemas + harvest
  * filtering).
  *
  * Each schema rule is a violation query over the exploded views; the
  * union of violations is the error report (the reference's
  * reporte-catalogo-errores), and the harvest filter (P4) keeps datasets
  * with zero violations.
  */
object CatalogValidator {

  private val AccrualPattern =
    "^(R/P\\d+(\\.\\d+)?[YMWD]|R/PT\\d+[HMS]|eventual)$"

  /** Violation rows `(level, identifier, rule)` for the whole catalog
    * document. */
  def violations(spark: SparkSession, catalog: DataFrame): DataFrame = {
    val datasets = CatalogReader.datasets(catalog)
    val distributions = CatalogReader.distributions(catalog)
    val fields = CatalogReader.fields(catalog)

    def missing(df: DataFrame, level: String, idCol: String,
        required: Seq[String]): Seq[DataFrame] =
      required.filter(df.columns.contains).map(c =>
        df.filter(col(c).isNull)
          .select(lit(level).as("level"), col(idCol).cast("string")
            .as("identifier"), lit(s"missing required: $c").as("rule"))) ++
        required.filterNot(df.columns.contains).map(c =>
          df.limit(1).select(lit(level).as("level"),
            col(idCol).cast("string").as("identifier"),
            lit(s"missing required: $c").as("rule")))

    // required keys per config/schemas/{catalog,dataset,distribution}.json
    val catalogReq = missing(catalog, "catalog", "catalog_id",
      Seq("dataset", "title", "description", "publisher",
        "superThemeTaxonomy"))
    val datasetReq = missing(datasets, "dataset", "dataset_id",
      Seq("title", "description", "publisher", "superTheme", "distribution",
        "accrualPeriodicity", "issued"))
    val distributionReq = missing(distributions, "distribution",
      "distribution_id", Seq("title", "issued"))

    val accrual = datasets
      .filter(col("accrualPeriodicity").isNotNull &&
        !col("accrualPeriodicity").rlike(AccrualPattern))
      .select(lit("dataset").as("level"),
        col("dataset_id").as("identifier"),
        lit("invalid accrualPeriodicity").as("rule"))

    // field ids unique within the catalog; titles unique per distribution
    val dupIds = fields.filter(col("field_id").isNotNull)
      .groupBy(col("catalog_id"), col("field_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(lit("field").as("level"), col("field_id").as("identifier"),
        lit("duplicate field id in catalog").as("rule"))
    val dupTitles = fields.filter(col("field_title").isNotNull)
      .groupBy(col("distribution_id"), col("field_title"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(lit("field").as("level"),
        concat_ws(":", col("distribution_id"), col("field_title"))
          .as("identifier"),
        lit("duplicate field title in distribution").as("rule"))

    (catalogReq ++ datasetReq ++ distributionReq ++
      Seq(accrual, dupIds, dupTitles)).reduce(_ union _)
  }

  /** P4 — harvest filter: the datasets view restricted to datasets with
    * zero violations (reference generate_datasets_report harvest='valid'). */
  def harvestableDatasets(spark: SparkSession, catalog: DataFrame): DataFrame = {
    val datasets = CatalogReader.datasets(catalog)
    val bad = violations(spark, catalog)
      .filter(col("level") === "dataset")
      .select(col("identifier").as("dataset_id")).distinct()
    datasets.join(bad, Seq("dataset_id"), "left_anti")
  }
}
