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
  *   catalog JSON (S3) → exploded views → TS manifest w/ method (P1/P5)
  *   → per-distribution processing (S5 direct CSV / S7 grid scrape)
  *   → validation battery (§2.9, violations-as-data)
  *   → ordered single-file CSV sink (K1) + rewritten downloadURL (F7)
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

  /** Process every time-series distribution of a catalog document.
    *
    * @param catalogPath multiline data.json path
    * @param outputDir   output root (layout per F8)
    * @param host        public host replacing the output dir in
    *                    rewritten downloadURLs (F7)
    * @param grids       optional pre-parsed workbook grids keyed by
    *                    scrapingFileURL (the S8 workbook cache)
    */
  def run(spark: SparkSession, catalogPath: String, catalogId: String,
      outputDir: String, host: String = "https://example.org",
      grids: Map[String, DataFrame] = Map.empty,
      stagingDir: Option[String] = None,
      replace: Boolean = true): RunResult = {
    import spark.implicits._

    val catalog = CatalogReader.readJson(spark, catalogPath, catalogId)
    val distributions = CatalogReader.withMethod(
      CatalogReader.timeSeriesDistributions(
        CatalogReader.distributions(catalog)))
    val fields = CatalogReader.fields(catalog)

    // The metadata plane is tiny: collect the manifest on the driver and
    // drive one independent Spark plan per distribution (fault isolation
    // boundary). The *data* of each distribution never touches the
    // driver.
    val manifest = distributions
      .select(col("catalog_id"), col("dataset_id"), col("distribution_id"),
        col("method"), col("downloadURL"), col("scrapingFileURL"),
        col("scrapingFileSheet"), col("fileName"))
      .collect()

    val fieldRows = fields.collect()

    // S1/S2 + D2: land each distinct scraping source once into staging,
    // then parse each workbook once into a cached grid (the S8 cache).
    val landedGrids: Map[String, DataFrame] = stagingDir match {
      case None => Map.empty
      case Some(staging) =>
        val urls = manifest.toSeq
          .filter(m => m.getAs[String]("method") == "excel_file")
          .flatMap(m => Option(m.getAs[String]("scrapingFileURL")))
          .distinct
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

    val results = manifest.toSeq.map { m =>
      val cid = m.getAs[String]("catalog_id")
      val did = m.getAs[String]("dataset_id")
      val disId = m.getAs[String]("distribution_id")
      val fileName = Option(m.getAs[String]("fileName"))
        .getOrElse(s"$disId.csv")
      val outPath = s"$outputDir/catalog/$cid/dataset/$did/" +
        s"distribution/$disId/download/$fileName"
      // P9 skip/replace gate (reference base.py:155-163): an existing
      // output short-circuits the whole distribution unless --replace
      if (!replace &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(outPath))) {
        DistributionResult(cid, did, disId, "SKIPPED", "exists", outPath, 0L)
      } else Try {
        val wide = m.getAs[String]("method") match {
          case "csv_file" =>
            readDistributionCsv(spark, m.getAs[String]("downloadURL"))
          case "excel_file" =>
            scrapeFromGrid(spark, m, fieldRows, allGrids)
          case "text_file" =>
            readDistributionTxtFromStaging(spark, m, stagingDir)
          case other =>
            throw new IllegalArgumentException(s"no processor for $other")
        }
        val ordered = wide.orderBy(col("indice_tiempo"))
        val n = ordered.count()
        if (n == 0) throw new IllegalStateException("empty distribution")
        validate(spark, ordered, disId)
        SingleFileCsv.write(ordered, outPath)
        DistributionResult(cid, did, disId, "OK", "", outPath, n)
      } match {
        case Success(r) => r
        case Failure(e) =>
          DistributionResult(cid, did, disId, "ERROR",
            e.toString.take(500), outPath, 0L)
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
      m: org.apache.spark.sql.Row, stagingDir: Option[String]): DataFrame = {
    val url = m.getAs[String]("scrapingFileURL")
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
  private def scrapeFromGrid(spark: SparkSession,
      m: org.apache.spark.sql.Row,
      fieldRows: Array[org.apache.spark.sql.Row],
      grids: Map[String, DataFrame]): DataFrame = {
    val disId = m.getAs[String]("distribution_id")
    val url = m.getAs[String]("scrapingFileURL")
    val sheet = Option(m.getAs[String]("scrapingFileSheet")).getOrElse("")
    val grid = grids.getOrElse(url,
      throw new IllegalArgumentException(s"no grid for $url"))
    val myFields = fieldRows.filter(
      _.getAs[String]("distribution_id") == disId)
    val timeField = myFields
      .find(f => f.getAs[String]("specialType") == "time_index")
      .getOrElse(throw new IllegalArgumentException(
        s"$disId has no time_index field"))
    val freq = Frequency
      .fromIso(timeField.getAs[String]("specialTypeDetail"))
      .getOrElse(Frequency.Monthly)
    val series = myFields
      .filter(f => f.getAs[String]("specialType") == null)
      .map(f => CellGrid.SeriesSpec(
        f.getAs[String]("field_title"),
        f.getAs[String]("scrapingIdentifierCell"),
        f.getAs[String]("scrapingDataStartCell")))
      .toSeq
    val long = CellGrid.scrapeDistribution(grid, sheet,
      timeField.getAs[String]("scrapingIdentifierCell"),
      timeField.getAs[String]("scrapingDataStartCell"), freq, series)
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
