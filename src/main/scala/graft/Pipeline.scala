package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GF
import graft.model.Frequency
import graft.operators.{Reports, TimeSeriesOps}
import graft.sinks.SingleFileCsv
import graft.sources.{CatalogReader, CatalogXlsx, CellGrid, Ingest}

import scala.util.{Failure, Success, Try}

/** The reference's ETL lifecycle re-expressed Spark-first (SURVEY §3):
  *
  *   catalog (JSON S3 or 5-sheet XLSX S4) → TS manifest w/ method (P1/P5)
  *   → ingest stage (S1/S2, D2 dedup, S8 workbook-grid cache)
  *   → per-distribution processing (S5 CSV / S6 TXT / S7 grid scrape)
  *   → validation battery (§2.9, violations-as-data)
  *   → ordered single-file CSV sink (K1)
  *   → status reports + indicators (A1-A3, O1)
  *
  * Fault isolation (§2.10): each distribution is wrapped in Try; a
  * failure becomes an ERROR report row with the exception repr, never a
  * job abort — the reference's try/except per distribution, kept as
  * data. Distribution-level parallelism is Spark-job-level here (each
  * distribution's plan is independent); on a cluster, thousands of
  * distributions pipeline through the scheduler concurrently.
  */
object Pipeline {

  final case class DistributionResult(
      catalogId: String, datasetId: String, distributionId: String,
      status: String, message: String, outputPath: String, rows: Long)

  final case class RunResult(report: DataFrame, indicators: DataFrame)

  /** One time-series distribution to process (the metadata plane is
    * tiny; the manifest lives on the driver, the DATA never does). */
  final case class ManifestEntry(catalogId: String, datasetId: String,
      distributionId: String, method: Option[String],
      downloadURL: Option[String], scrapingFileURL: Option[String],
      scrapingFileSheet: Option[String], fileName: Option[String])

  /** One declared series column of a distribution. */
  final case class FieldEntry(distributionId: String,
      fieldTitle: Option[String], specialType: Option[String],
      specialTypeDetail: Option[String], identifierCell: Option[String],
      dataStartCell: Option[String])

  /** Process a data.json catalog (S3 path). */
  def run(spark: SparkSession, catalogPath: String, catalogId: String,
      outputDir: String, host: String = "https://example.org",
      grids: Map[String, DataFrame] = Map.empty,
      stagingDir: Option[String] = None,
      replace: Boolean = true): RunResult = {
    val catalog = CatalogReader.readJson(spark, catalogPath, catalogId)
    val distributions = CatalogReader.withMethod(
      CatalogReader.timeSeriesDistributions(
        CatalogReader.distributions(catalog)))
    val manifest = distributions
      .select(col("catalog_id"), col("dataset_id"), col("distribution_id"),
        col("method"), col("downloadURL"), col("scrapingFileURL"),
        col("scrapingFileSheet"), col("fileName"))
      .collect().toSeq.map(m => ManifestEntry(
        m.getAs[String]("catalog_id"), m.getAs[String]("dataset_id"),
        m.getAs[String]("distribution_id"),
        Option(m.getAs[String]("method")),
        Option(m.getAs[String]("downloadURL")),
        Option(m.getAs[String]("scrapingFileURL")),
        Option(m.getAs[String]("scrapingFileSheet")),
        Option(m.getAs[String]("fileName"))))
    val fields = CatalogReader.fields(catalog).collect().toSeq.map(f =>
      FieldEntry(f.getAs[String]("distribution_id"),
        Option(f.getAs[String]("field_title")),
        Option(f.getAs[String]("specialType")),
        Option(f.getAs[String]("specialTypeDetail")),
        Option(f.getAs[String]("scrapingIdentifierCell")),
        Option(f.getAs[String]("scrapingDataStartCell"))))
    process(spark, manifest, fields, outputDir, grids, stagingDir, replace)
  }

  /** Process a 5-sheet XLSX catalog (S4 path) — same semantics, the
    * manifest assembles from the flattened sheet views. */
  def runXlsx(spark: SparkSession, xlsxPath: String, catalogId: String,
      outputDir: String, grids: Map[String, DataFrame] = Map.empty,
      stagingDir: Option[String] = None,
      replace: Boolean = true): RunResult = {
    val views = CatalogXlsx.readViews(spark, xlsxPath)
    def opt(r: org.apache.spark.sql.Row, c: String): Option[String] =
      if (r.schema.fieldNames.contains(c)) Option(r.getAs[String](c)) else None

    val fieldRows = views.fields.collect().toSeq
    val fields = fieldRows.map(f => FieldEntry(
      opt(f, "distribution_identifier").getOrElse(""),
      opt(f, "title"), opt(f, "specialType"), opt(f, "specialTypeDetail"),
      opt(f, "scrapingIdentifierCell"), opt(f, "scrapingDataStartCell")))
    val tsDistributionIds = fields
      .filter(_.specialType.contains("time_index"))
      .map(_.distributionId).toSet

    val manifest = views.distributions.collect().toSeq.flatMap { d =>
      val disId = opt(d, "identifier").getOrElse("")
      if (!tsDistributionIds.contains(disId)) None
      else {
        val downloadURL = opt(d, "downloadURL")
        val scrapingURL = opt(d, "scrapingFileURL")
        // P5 dispatch on the flattened row (reference base.py:123-153)
        val ext = scrapingURL.map(_.split('.').last.toLowerCase)
        val method =
          if (downloadURL.isDefined) Some("csv_file")
          else if (ext.contains("txt")) Some("text_file")
          else if (ext.exists(Set("xls", "xlsx"))) Some("excel_file")
          else None
        Some(ManifestEntry(catalogId,
          opt(d, "dataset_identifier")
            .getOrElse(disId.split('.').head), // J3 fallback
          disId, method, downloadURL, scrapingURL,
          opt(d, "scrapingFileSheet"), opt(d, "fileName")))
      }
    }
    process(spark, manifest, fields, outputDir, grids, stagingDir, replace)
  }

  /** The shared processing core. */
  def process(spark: SparkSession, manifest: Seq[ManifestEntry],
      fields: Seq[FieldEntry], outputDir: String,
      grids: Map[String, DataFrame], stagingDir: Option[String],
      replace: Boolean): RunResult = {
    import spark.implicits._

    // S1/S2 + D2: land each distinct scraping source once into staging,
    // then parse each workbook once into a cached grid (the S8 cache).
    val landedGrids: Map[String, DataFrame] = stagingDir match {
      case None => Map.empty
      case Some(staging) =>
        val urls = manifest
          .filter(_.method.contains("excel_file"))
          .flatMap(_.scrapingFileURL).distinct
        val ingestManifest = urls
          .map(u => (u, s"$staging/${u.split('/').last}"))
          .toDF("url", "target")
        val landed = if (urls.isEmpty) Map.empty[String, String]
          else Ingest.fetchAll(spark, ingestManifest)
            .filter(col("status").isin("OK", "SKIPPED"))
            .select(col("url"), col("target")).as[(String, String)]
            .collect().toMap
        landed.map { case (url, path) =>
          url -> CellGrid.cached(CatalogXlsx.toGrid(spark, path))
        }
    }
    val allGrids = landedGrids ++ grids

    val results = manifest.map { m =>
      val fileName = m.fileName.getOrElse(s"${m.distributionId}.csv")
      val outPath = s"$outputDir/catalog/${m.catalogId}/dataset/" +
        s"${m.datasetId}/distribution/${m.distributionId}/download/$fileName"
      // P9 skip/replace gate (reference base.py:155-163): an existing
      // output short-circuits the whole distribution unless --replace
      if (!replace &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(outPath))) {
        DistributionResult(m.catalogId, m.datasetId, m.distributionId,
          "SKIPPED", "exists", outPath, 0L)
      } else Try {
        val wide = m.method match {
          case Some("csv_file") =>
            readDistributionCsv(spark, m.downloadURL.get)
          case Some("excel_file") =>
            scrapeFromGrid(spark, m, fields, allGrids)
          case Some("text_file") =>
            readDistributionTxtFromStaging(spark, m, stagingDir)
          case other =>
            throw new IllegalArgumentException(s"no processor for $other")
        }
        val ordered = wide.orderBy(col("indice_tiempo"))
        val n = ordered.count()
        if (n == 0) throw new IllegalStateException("empty distribution")
        validate(spark, ordered, m.distributionId)
        SingleFileCsv.write(ordered, outPath)
        DistributionResult(m.catalogId, m.datasetId, m.distributionId,
          "OK", "", outPath, n)
      } match {
        case Success(r) => r
        case Failure(e) =>
          DistributionResult(m.catalogId, m.datasetId, m.distributionId,
            "ERROR", e.toString.take(500), outPath, 0L)
      }
    }

    val report = results.toDF()
      .withColumnRenamed("status", "distribution_status")
    val datasetReport = report
      .groupBy(col("catalogId"), col("datasetId"))
      .agg(max(when(col("distribution_status") === "ERROR", 1).otherwise(0))
        .as("has_error"))
      .withColumn("dataset_status",
        when(col("has_error") === 1, "ERROR").otherwise("OK"))
    RunResult(
      Reports.sortByStatus(report, "distribution_status",
        Seq("distributionId")),
      Reports.indicators(datasetReport, report))
  }

  /** S6 — TXT distribution from the staging dir (landed by the ingest
    * stage) or directly from a local scrapingFileURL. */
  private def readDistributionTxtFromStaging(spark: SparkSession,
      m: ManifestEntry, stagingDir: Option[String]): DataFrame = {
    val url = m.scrapingFileURL.get
    val path = stagingDir.map(s => s"$s/${url.split('/').last}")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .getOrElse(url)
    Ingest.readDistributionTxt(spark, path)
  }

  /** S5 — direct-download CSV distribution: header CSV with an
    * `indice_tiempo` date column and double series columns. */
  def readDistributionCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val valueCols = raw.columns.filter(_ != "indice_tiempo")
    raw.select(
      to_date(col("indice_tiempo")).as("indice_tiempo") +:
        valueCols.map(c => GF.normalizeValue(col(c)).as(c)): _*)
  }

  /** S7 — scrape one distribution from its workbook's cell grid using
    * the field metadata coordinates, then align wide (J1). */
  private def scrapeFromGrid(spark: SparkSession, m: ManifestEntry,
      fields: Seq[FieldEntry], grids: Map[String, DataFrame]): DataFrame = {
    val url = m.scrapingFileURL.getOrElse(
      throw new IllegalArgumentException(
        s"${m.distributionId} has no scrapingFileURL"))
    val sheet = m.scrapingFileSheet.getOrElse("")
    val grid = grids.getOrElse(url,
      throw new IllegalArgumentException(s"no grid for $url"))
    val myFields = fields.filter(_.distributionId == m.distributionId)
    val timeField = myFields
      .find(_.specialType.contains("time_index"))
      .getOrElse(throw new IllegalArgumentException(
        s"${m.distributionId} has no time_index field"))
    val freq = timeField.specialTypeDetail
      .flatMap(Frequency.fromIso).getOrElse(Frequency.Monthly)
    val series = myFields
      .filter(_.specialType.isEmpty)
      .map(f => CellGrid.SeriesSpec(
        f.fieldTitle.getOrElse(""),
        f.identifierCell.getOrElse(""),
        f.dataStartCell.getOrElse("")))
    val long = CellGrid.scrapeDistribution(grid, sheet,
      timeField.identifierCell.getOrElse(""),
      timeField.dataStartCell.getOrElse(""), freq, series)
    TimeSeriesOps.alignWide(long, series.map(_.serieId))
  }

  /** §2.9 — validation battery over the wide frame; throws (caught by
    * the per-distribution Try) on a hard violation. */
  private def validate(spark: SparkSession, wide: DataFrame,
      disId: String): Unit = {
    val agg = wide.agg(
      count(lit(1)).as("n"),
      countDistinct(col("indice_tiempo")).as("n_distinct"),
      count(when(col("indice_tiempo").isNull, 1)).as("n_null_time"))
      .head()
    if (agg.getAs[Long]("n_null_time") > 0)
      throw new IllegalStateException(s"$disId: null time index")
    if (agg.getAs[Long]("n_distinct") != agg.getAs[Long]("n"))
      throw new IllegalStateException(s"$disId: duplicate time index")
  }
}
