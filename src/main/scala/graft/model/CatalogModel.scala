package graft.model

import org.apache.spark.sql.types._

/** Catalog metadata model — the DCAT-like data.json profile
  * (SURVEY §1.1; reference config/schemas/{catalog,dataset,distribution,
  * field,theme}.json, fixture tests/project/mock/test1.json).
  *
  * Case classes mirror the nested document; `schema` is the explicit
  * StructType used for `spark.read.option("multiLine", true).json` so the
  * scan never depends on inference (SURVEY §1.3: schema is declared, not
  * inferred).
  */
final case class FieldMeta(
    id: Option[String],
    title: Option[String],
    `type`: Option[String],
    description: Option[String],
    units: Option[String],
    specialType: Option[String],        // "time_index" marks the index field
    specialTypeDetail: Option[String],  // ISO repeat duration (frequency)
    scrapingIdentifierCell: Option[String],
    scrapingDataStartCell: Option[String])

final case class DistributionMeta(
    identifier: Option[String],
    title: Option[String],
    description: Option[String],
    issued: Option[String],
    modified: Option[String],
    format: Option[String],
    fileName: Option[String],
    accessURL: Option[String],
    downloadURL: Option[String],
    scrapingFileURL: Option[String],
    scrapingFileSheet: Option[String],
    field: Option[Seq[FieldMeta]])

final case class PublisherMeta(name: Option[String], mbox: Option[String])
final case class ContactPoint(fn: Option[String], hasEmail: Option[String])
final case class ThemeMeta(id: Option[String], label: Option[String],
    description: Option[String])

final case class DatasetMeta(
    identifier: Option[String],
    title: Option[String],
    description: Option[String],
    publisher: Option[PublisherMeta],
    superTheme: Option[Seq[String]],
    theme: Option[Seq[String]],
    keyword: Option[Seq[String]],
    accrualPeriodicity: Option[String],
    issued: Option[String],
    modified: Option[String],
    language: Option[Seq[String]],
    spatial: Option[String],
    temporal: Option[String],
    landingPage: Option[String],
    source: Option[String],
    contactPoint: Option[ContactPoint],
    distribution: Option[Seq[DistributionMeta]])

final case class CatalogMeta(
    identifier: Option[String],
    title: Option[String],
    description: Option[String],
    publisher: Option[PublisherMeta],
    superThemeTaxonomy: Option[String],
    issued: Option[String],
    modified: Option[String],
    language: Option[Seq[String]],
    license: Option[String],
    rights: Option[String],
    spatial: Option[String],
    homepage: Option[String],
    themeTaxonomy: Option[Seq[ThemeMeta]],
    dataset: Option[Seq[DatasetMeta]])

object CatalogModel {
  val fieldSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("title", StringType),
    StructField("type", StringType), StructField("description", StringType),
    StructField("units", StringType), StructField("specialType", StringType),
    StructField("specialTypeDetail", StringType),
    StructField("scrapingIdentifierCell", StringType),
    StructField("scrapingDataStartCell", StringType)))

  val distributionSchema: StructType = StructType(Seq(
    StructField("identifier", StringType), StructField("title", StringType),
    StructField("description", StringType), StructField("issued", StringType),
    StructField("modified", StringType), StructField("format", StringType),
    StructField("fileName", StringType), StructField("accessURL", StringType),
    StructField("downloadURL", StringType),
    StructField("scrapingFileURL", StringType),
    StructField("scrapingFileSheet", StringType),
    StructField("field", ArrayType(fieldSchema))))

  private val publisherSchema = StructType(Seq(
    StructField("name", StringType), StructField("mbox", StringType)))

  val datasetSchema: StructType = StructType(Seq(
    StructField("identifier", StringType), StructField("title", StringType),
    StructField("description", StringType),
    StructField("publisher", publisherSchema),
    StructField("superTheme", ArrayType(StringType)),
    StructField("theme", ArrayType(StringType)),
    StructField("keyword", ArrayType(StringType)),
    StructField("accrualPeriodicity", StringType),
    StructField("issued", StringType), StructField("modified", StringType),
    StructField("language", ArrayType(StringType)),
    StructField("spatial", StringType), StructField("temporal", StringType),
    StructField("landingPage", StringType), StructField("source", StringType),
    StructField("contactPoint", StructType(Seq(
      StructField("fn", StringType), StructField("hasEmail", StringType)))),
    StructField("distribution", ArrayType(distributionSchema))))

  val schema: StructType = StructType(Seq(
    StructField("identifier", StringType), StructField("title", StringType),
    StructField("description", StringType),
    StructField("publisher", publisherSchema),
    StructField("superThemeTaxonomy", StringType),
    StructField("issued", StringType), StructField("modified", StringType),
    StructField("language", ArrayType(StringType)),
    StructField("license", StringType), StructField("rights", StringType),
    StructField("spatial", StringType), StructField("homepage", StringType),
    StructField("themeTaxonomy", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("label", StringType),
      StructField("description", StringType))))),
    StructField("dataset", ArrayType(datasetSchema))))

  /** Long/tidy canonical series schema (SURVEY §1.4) — the engine's
    * internal representation of all series data. Partitionable by
    * catalog_id/distribution_id for 100 TB layouts. */
  val seriesLongSchema: StructType = StructType(Seq(
    StructField("catalog_id", StringType, nullable = false),
    StructField("dataset_id", StringType, nullable = false),
    StructField("distribution_id", StringType, nullable = false),
    StructField("serie_id", StringType, nullable = false),
    StructField("indice_tiempo", DateType, nullable = false),
    StructField("valor", DoubleType)))
}
