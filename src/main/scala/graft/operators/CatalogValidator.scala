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

  /** draft-04 `format: email` (catalog.json:14-21, dataset.json:18-29). */
  private val EmailPattern = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"

  /** draft-04 `format: uri` — absolute URI with a scheme
    * (catalog.json:30, dataset.json:75-81, distribution.json:9-16). */
  private val UriPattern = "^[a-zA-Z][a-zA-Z0-9+.\\-]*:\\S+$"

  /** `temporalOrNull` ISO interval (mixed-types.json:35-41): two ISO
    * date(/time)s joined by '/'. */
  private val TemporalPattern =
    "^\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?(([+-]\\d{2}:\\d{2})|Z)?" +
      "/\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?(([+-]\\d{2}:\\d{2})|Z)?$"

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

    // --- format depth (email / uri / temporal / theme references) ---
    def nonEmpty(c: org.apache.spark.sql.Column) =
      c.isNotNull && length(c) > 0
    def violation(df: DataFrame, level: String, idCol: String,
        cond: org.apache.spark.sql.Column, rule: String): DataFrame =
      df.filter(cond).select(lit(level).as("level"),
        col(idCol).cast("string").as("identifier"), lit(rule).as("rule"))

    val emailChecks = Seq(
      violation(catalog, "catalog", "catalog_id",
        nonEmpty(col("publisher.mbox")) &&
          !col("publisher.mbox").rlike(EmailPattern),
        "invalid email: publisher.mbox"),
      violation(datasets, "dataset", "dataset_id",
        nonEmpty(col("publisher.mbox")) &&
          !col("publisher.mbox").rlike(EmailPattern),
        "invalid email: publisher.mbox"),
      violation(datasets, "dataset", "dataset_id",
        nonEmpty(col("contactPoint.hasEmail")) &&
          !col("contactPoint.hasEmail").rlike(EmailPattern),
        "invalid email: contactPoint.hasEmail"))

    val uriChecks = Seq(
      violation(catalog, "catalog", "catalog_id",
        nonEmpty(col("superThemeTaxonomy")) &&
          !col("superThemeTaxonomy").rlike(UriPattern),
        "invalid uri: superThemeTaxonomy"),
      violation(datasets, "dataset", "dataset_id",
        nonEmpty(col("landingPage")) &&
          !col("landingPage").rlike(UriPattern),
        "invalid uri: landingPage"),
      violation(distributions, "distribution", "distribution_id",
        nonEmpty(col("downloadURL")) &&
          !col("downloadURL").rlike(UriPattern),
        "invalid uri: downloadURL"),
      violation(distributions, "distribution", "distribution_id",
        nonEmpty(col("accessURL")) &&
          !col("accessURL").rlike(UriPattern),
        "invalid uri: accessURL"))

    // temporalOrNull: the interval must match the pattern AND parse to
    // start <= end (interval semantics, mixed-types.json:35-41)
    val temporalStart = to_date(regexp_extract(col("temporal"),
      "^(\\d{4}-\\d{2}-\\d{2})", 1))
    val temporalEnd = to_date(regexp_extract(col("temporal"),
      "/(\\d{4}-\\d{2}-\\d{2})", 1))
    val temporalChecks = Seq(
      violation(datasets, "dataset", "dataset_id",
        nonEmpty(col("temporal")) &&
          !col("temporal").rlike(TemporalPattern),
        "invalid temporal interval"),
      violation(datasets, "dataset", "dataset_id",
        nonEmpty(col("temporal")) &&
          col("temporal").rlike(TemporalPattern) &&
          temporalStart > temporalEnd,
        "temporal interval start after end"))

    // dataset.theme values must reference themeTaxonomy ids
    // (theme.json + pydatajson's taxonomy check)
    val themeIds = catalog.select(col("catalog_id"),
        explode_outer(col("themeTaxonomy")).as("th"))
      .select(col("catalog_id"), col("th.id").as("theme_ref"))
    val themeRefs = datasets
      .select(col("catalog_id"), col("dataset_id"),
        explode(col("theme")).as("theme_ref"))
    val badThemeRefs = themeRefs
      .join(themeIds, Seq("catalog_id", "theme_ref"), "left_anti")
      .select(lit("dataset").as("level"),
        col("dataset_id").cast("string").as("identifier"),
        concat(lit("theme not in themeTaxonomy: "), col("theme_ref"))
          .as("rule"))

    (catalogReq ++ datasetReq ++ distributionReq ++
      Seq(accrual, dupIds, dupTitles) ++
      emailChecks ++ uriChecks ++ temporalChecks ++
      Seq(badThemeRefs)).reduce(_ union _)
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
