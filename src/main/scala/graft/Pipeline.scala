package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GF
import graft.model.Frequency
import graft.operators.{CatalogValidator, Reports, TimeSeriesOps}
import graft.sinks.{ReportXlsx, SingleFileCsv}
import graft.sources.{CatalogReader, CatalogXlsx, CellGrid, Ingest}

import scala.util.{Failure, Success, Try}

/** The reference's ETL lifecycle re-expressed Spark-first (SURVEY §3):
  *
  *   catalog (JSON S3 or 5-sheet XLSX S4) → TS manifest w/ method (P1/P5)
  *   → ingest stage (S1/S2, D2 dedup, S8 workbook-grid cache)
  *   → BATCHED scrape of every excel distribution (S7 via
  *     CellGrid.scrapeAll: all workbooks in one grid, two broadcast
  *     joins) + per-item CSV/TXT reads (S5/S6)
  *   → validation battery (§2.9: per-serie summary, frequency
  *     conformance, header drift — each ONE job for the whole catalog)
  *   → ordered single-file CSV sink (K1)
  *   → status reports + indicators (A1-A3, O1)
  *
  * Fault isolation (§2.10): spec assembly and the final write of each
  * distribution are wrapped in Try; a failure becomes an ERROR report
  * row with the exception repr, never a job abort — the reference's
  * try/except per distribution, kept as data.
  *
  * Scale shape: the driver loop of the reference (one python iteration
  * per distribution, reference base.py:155-207) becomes O(1) Spark jobs
  * for scrape + validation regardless of distribution count, plus one
  * (tiny, checkpoint-backed) write job per output file — the only
  * per-distribution cost left is the K1 exact-filename sink itself.
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
      replace: Boolean = true,
      download: Ingest.DownloadConfig = Ingest.DownloadConfig(),
      interactive: Boolean = false,
      distributionIdFilter: Option[String] = None): RunResult = {
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
    // K4 extraction-stage artifacts (base.py:434-451): the catalog error
    // report + the harvestable-datasets report
    val reportsDir = s"$outputDir/reportes/$catalogId"
    ReportXlsx.writeErrorsReport(
      CatalogValidator.violations(spark, catalog), reportsDir)
    ReportXlsx.writeDatasetsCompleteReport(
      CatalogValidator.harvestableDatasets(spark, catalog), reportsDir)
    process(spark, manifest, fields, outputDir, grids, stagingDir, replace,
      download, interactive, distributionIdFilter)
  }

  /** Process a 5-sheet XLSX catalog (S4 path) — same semantics, the
    * manifest assembles from the flattened sheet views. */
  def runXlsx(spark: SparkSession, xlsxPath: String, catalogId: String,
      outputDir: String, grids: Map[String, DataFrame] = Map.empty,
      stagingDir: Option[String] = None,
      replace: Boolean = true,
      download: Ingest.DownloadConfig = Ingest.DownloadConfig(),
      interactive: Boolean = false,
      distributionIdFilter: Option[String] = None): RunResult = {
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
    process(spark, manifest, fields, outputDir, grids, stagingDir, replace,
      download, interactive, distributionIdFilter)
  }

  /** One excel distribution with its validated, parsed scrape spec. */
  private final case class ExcelPrep(m: ManifestEntry, url: String,
      sheet: String, freq: Frequency, timeDataStartCell: String,
      series: Seq[CellGrid.SeriesSpec], headerCells: Seq[(String, String)])

  private val CellRef = "^[A-Za-z]+[0-9]+$".r

  private def requireCell(disId: String, what: String, cell: String): String =
    cell match {
      case CellRef() => cell
      case other => throw new IllegalArgumentException(
        s"$disId: bad $what cell '$other'")
    }

  /** The shared processing core. */
  def process(spark: SparkSession, manifest: Seq[ManifestEntry],
      fields: Seq[FieldEntry], outputDir: String,
      grids: Map[String, DataFrame], stagingDir: Option[String],
      replace: Boolean,
      download: Ingest.DownloadConfig = Ingest.DownloadConfig(),
      interactive: Boolean = false,
      distributionIdFilter: Option[String] = None): RunResult = {
    import spark.implicits._
    // reference --distribution-id-filter (main.py:62-66): restrict the
    // run to one distribution id when given
    val manifest0 = manifest
    val manifestF = distributionIdFilter match {
      case Some(id) => manifest0.filter(_.distributionId == id)
      case None => manifest0
    }

    // S1/S2 + D2: land each distinct scraping source once into staging,
    // then parse each workbook once into a cached grid (the S8 cache).
    val landedGrids: Map[String, DataFrame] = stagingDir match {
      case None => Map.empty
      case Some(staging) =>
        val urls = manifestF
          .filter(_.method.contains("excel_file"))
          .flatMap(_.scrapingFileURL).distinct
        val ingestManifest = urls
          .map(u => (u, s"$staging/${u.split('/').last}"))
          .toDF("url", "target")
        // --interactive reuses already-staged files instead of
        // re-downloading (reference base.py:917-925); a normal run
        // always fetches fresh sources
        val landed = if (urls.isEmpty) Map.empty[String, String]
          else Ingest.fetchAllConfigured(spark, ingestManifest, download,
              replace = !interactive)
            .filter(col("status").isin("OK", "SKIPPED"))
            .select(col("url"), col("target")).as[(String, String)]
            .collect().toMap
        landed.map { case (url, path) =>
          url -> CellGrid.cached(CatalogXlsx.toGrid(spark, path))
        }
    }
    val allGrids = landedGrids ++ grids

    def outPathOf(m: ManifestEntry): String = {
      val fileName = m.fileName.getOrElse(s"${m.distributionId}.csv")
      s"$outputDir/catalog/${m.catalogId}/dataset/" +
        s"${m.datasetId}/distribution/${m.distributionId}/download/$fileName"
    }

    // P9 skip/replace gate (reference base.py:155-163): an existing
    // output short-circuits the whole distribution unless --replace
    val (toSkip, active) = manifestF.partition(m => !replace &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(outPathOf(m))))
    val skippedResults = toSkip.map(m =>
      DistributionResult(m.catalogId, m.datasetId, m.distributionId,
        "SKIPPED", "exists", outPathOf(m), 0L))

    val (excelItems, directItems) =
      active.partition(_.method.contains("excel_file"))

    // ---- spec assembly per excel distribution; failures isolate here
    val preps: Seq[Either[DistributionResult, ExcelPrep]] =
      excelItems.map { m =>
        Try {
          val url = m.scrapingFileURL.getOrElse(
            throw new IllegalArgumentException(
              s"${m.distributionId} has no scrapingFileURL"))
          if (!allGrids.contains(url))
            throw new IllegalArgumentException(s"no grid for $url")
          val myFields = fields.filter(_.distributionId == m.distributionId)
          val timeField = myFields
            .find(_.specialType.contains("time_index"))
            .getOrElse(throw new IllegalArgumentException(
              s"${m.distributionId} has no time_index field"))
          val freq = timeField.specialTypeDetail.flatMap(Frequency.fromIso)
            .getOrElse(Frequency.Monthly)
          val series = myFields.filter(_.specialType.isEmpty).map(f =>
            CellGrid.SeriesSpec(f.fieldTitle.getOrElse(""),
              f.identifierCell.getOrElse(""),
              requireCell(m.distributionId, "dataStart",
                f.dataStartCell.getOrElse(""))))
          val headers = myFields
            .flatMap(f => f.identifierCell.filter(CellRef.matches)
              .map(c => (f.fieldTitle.getOrElse(""), c)))
          ExcelPrep(m, url, m.scrapingFileSheet.getOrElse(""), freq,
            requireCell(m.distributionId, "timeDataStart",
              timeField.dataStartCell.getOrElse("")),
            series, headers)
        }.toEither.left.map(e =>
          DistributionResult(m.catalogId, m.datasetId, m.distributionId,
            "ERROR", e.toString.take(500), outPathOf(m), 0L))
      }
    val prepErrors = preps.collect { case Left(r) => r }
    val okPreps = preps.collect { case Right(p) => p }

    // per-distribution scrape — the FALLBACK path when the batch core
    // fails at execution time (one unreadable workbook must degrade to
    // that workbook's ERROR rows, never abort the catalog — the
    // reference's per-distribution try/except, base.py:155-207)
    def scrapeOneFallback(p: ExcelPrep): DistributionResult = {
      val d = p.m.distributionId
      val outPath = outPathOf(p.m)
      Try {
        val grid = allGrids(p.url)
        val long = CellGrid.scrapeDistribution(grid, p.sheet,
          p.timeDataStartCell, p.timeDataStartCell, p.freq, p.series)
        val wide = TimeSeriesOps.alignWide(long,
          p.series.map(_.serieId), ordered = false)
        val (n, warnings0) = validateWide(wide, d, Some(p.freq))
        // T2 — the reference's trim WARNING (base.py:165-182): the time
        // column keeps non-empty rows past the last detected date
        val b = CellGrid.tableBounds(grid, p.sheet, p.timeDataStartCell,
          p.freq).head()
        val trimWarning = trimMessage(
          if (b.isNullAt(0)) None else Some(b.getInt(0)),
          if (b.isNullAt(1)) None else Some(b.getInt(1)),
          p.timeDataStartCell)
        val drift = CellGrid.headerDrift(grid, p.sheet, p.series)
          .collect().toSeq.map(r =>
            s"${r.getAs[String]("serie_id")}<>" +
              s"'${Option(r.getAs[String]("found")).getOrElse("")}'")
        val warnings = trimWarning.toSeq ++ warnings0 ++
          (if (drift.nonEmpty) Seq(s"header drift: ${drift.mkString(", ")}")
           else Seq.empty)
        val existed = java.nio.file.Files
          .exists(java.nio.file.Paths.get(outPath))
        SingleFileCsv.write(wide, outPath, sortBy = Seq("indice_tiempo"))
        DistributionResult(p.m.catalogId, p.m.datasetId, d,
          if (warnings.nonEmpty) "WARNING" else "OK",
          noteOf(warnings, existed, replace), outPath, n)
      } match {
        case Success(r) => r
        case Failure(e) =>
          DistributionResult(p.m.catalogId, p.m.datasetId, d,
            "ERROR", e.toString.take(500), outPath, 0L)
      }
    }

    // T2 WARNING text (reference base.py:165-182: "la distribución
    // termina en la fila N, pero no se detectó fecha en la fila M"),
    // naming the time-index cell the way the reference reports its
    // coordinate alongside the row numbers
    def trimMessage(detectedEnd: Option[Int], tableEnd: Option[Int],
        timeCell: String): Option[String] = (detectedEnd, tableEnd) match {
      case (Some(de), Some(te)) if te > de => Some(
        s"table ends at row $te but no date detected at row ${de + 1} " +
          s"(time index cell $timeCell)")
      case (None, Some(te)) => Some(
        s"table ends at row $te but no date detected at all " +
          s"(time index cell $timeCell)")
      case _ => None
    }

    // "Replaced" note (reference base.py:183-191): an OK distribution
    // whose existing output was overwritten under --replace reports
    // note=Replaced; warnings take precedence (the reference's elif)
    def noteOf(warnings: Seq[String], existed: Boolean,
        replace: Boolean): String =
      if (warnings.nonEmpty) warnings.mkString("; ").take(500)
      else if (existed && replace) "Replaced"
      else ""

    // ---- the batch core: ONE combined grid, ONE scrape, ONE job per
    // validation family — none of it scales with distribution count.
    // Wrapped in Try (ADVICE r2): a batch-stage failure (e.g. a grid
    // that errors at execution time) falls back to per-distribution
    // scrapes so one bad workbook cannot take down the whole run.
    val excelResults: Seq[DistributionResult] =
      if (okPreps.isEmpty) Seq.empty
      else Try {
        // globally-unique sheet key: url NUL sheet (NUL can't occur in
        // either part)
        def sheetKey(url: String, sheet: String) = url + "\u0000" + sheet
        val combined = okPreps.map(_.url).distinct.sorted
          .map(u => allGrids(u).select(
            concat(lit(u), lit("\u0000"), col("sheet")).as("sheet"),
            col("row"), col("col"), col("value")))
          .reduce(_.unionByName(_))
        val specs = okPreps.flatMap(p => p.series.map(sp =>
          CellGrid.BatchSeriesSpec(p.m.distributionId, sp.serieId,
            sheetKey(p.url, p.sheet), sp.dataStartCell,
            p.timeDataStartCell, p.freq.code)))
        // the batch long form is staged ONCE as parquet partitioned by
        // distribution: the validation jobs below scan it columnar, and
        // each per-distribution write reads ONLY its pruned partition —
        // an in-memory checkpoint would make every write re-scan the
        // whole catalog's blocks (O(N × catalog) at 20k distributions).
        val stagePath = s"$outputDir/.graft-batch-long"
        CellGrid.scrapeAll(combined, specs)
          .write.mode("overwrite").partitionBy("distribution_id")
          .parquet(stagePath)
        // partition values are distribution IDs like "1.1" — keep them
        // strings (type inference would read them back as doubles)
        val infKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val infWas = spark.conf.get(infKey, "true")
        val batchLong =
          try { spark.conf.set(infKey, "false"); spark.read.parquet(stagePath) }
          finally spark.conf.set(infKey, infWas)

        // §2.9 per-serie battery — ONE job for the whole catalog
        val summary = TimeSeriesOps.validationSummary(batchLong,
            keys = Seq("distribution_id", "serie_id")).collect()
          .map(r => (r.getAs[String]("distribution_id"),
            r.getAs[String]("serie_id")) -> r).toMap

        // T3 frequency conformance at each distribution's DECLARED
        // frequency — one windowed pass, one job
        val freqSpec = okPreps
          .map(p => (p.m.distributionId, p.freq.months.getOrElse(0)))
          .toDF("distribution_id", "freq_months")
        val gapW = Window
          .partitionBy(col("distribution_id"), col("serie_id"))
          .orderBy(col("indice_tiempo"))
        val gapCounts: Map[String, Long] = batchLong
          .join(broadcast(freqSpec), Seq("distribution_id"))
          .withColumn("prev", lag(col("indice_tiempo"), 1).over(gapW))
          .withColumn("step", when(col("freq_months") > 0,
            months_between(col("indice_tiempo"), col("prev")) /
              col("freq_months"))
            .otherwise(datediff(col("indice_tiempo"), col("prev"))
              .cast("double")))
          .filter(col("prev").isNotNull && col("step") =!= 1.0)
          .groupBy(col("distribution_id"))
          .agg(count(lit(1)).as("n_gaps"))
          .collect()
          .map(r => r.getAs[String]("distribution_id") ->
            r.getAs[Long]("n_gaps")).toMap

        // V2 header drift — ONE broadcast join for every header cell of
        // every distribution (processors.py:147-148)
        val driftSpecs = okPreps.flatMap(p => p.headerCells.map {
          case (title, cell) =>
            (p.m.distributionId, title, sheetKey(p.url, p.sheet), cell) })
        val drifts: Map[String, Seq[String]] =
          CellGrid.headerDriftAll(combined, driftSpecs).collect()
            .groupBy(_.getAs[String]("distribution_id"))
            .map { case (d, rows) => d -> rows.toSeq.map(r =>
              s"${r.getAs[String]("serie_id")}<>" +
                s"'${Option(r.getAs[String]("found")).getOrElse("")}'") }

        // T2 table-end trim bounds — ONE job for the whole catalog
        // (base.py:165-182); composed labels count as detected, so a
        // composed-time sheet never false-warns
        val bounds: Map[String, (Option[Int], Option[Int])] =
          CellGrid.tableBoundsAll(combined, okPreps.map(p =>
              (p.m.distributionId, sheetKey(p.url, p.sheet),
                p.timeDataStartCell, p.freq.code)).distinct)
            .collect()
            .map(r => r.getAs[String]("distribution_id") -> (
              (if (r.isNullAt(1)) None else Some(r.getInt(1))),
              (if (r.isNullAt(2)) None else Some(r.getInt(2))))).toMap

        // distinct periods per distribution = the wide row count
        val periodCounts: Map[String, Long] = batchLong
          .groupBy(col("distribution_id"))
          .agg(countDistinct(col("indice_tiempo")).as("n")).collect()
          .map(r => r.getAs[String]("distribution_id") ->
            r.getAs[Long]("n")).toMap

        val batchResults = okPreps.map { p =>
          val d = p.m.distributionId
          val outPath = outPathOf(p.m)
          Try {
            val n = periodCounts.getOrElse(d, 0L)
            if (n == 0) throw new IllegalStateException(
              s"$d: empty distribution")
            val errors = Seq.newBuilder[String]
            val warnings = Seq.newBuilder[String]
            p.series.foreach { sp =>
              summary.get((d, sp.serieId)) match {
                case None => errors += s"${sp.serieId}: no data scraped"
                case Some(r) =>
                  if (!r.getAs[Boolean]("is_distinct") ||
                    !r.getAs[Boolean]("is_monotonic"))
                    errors += s"${sp.serieId}: duplicate or " +
                      "non-monotonic time index"
                  // missing ratio vs the distribution's period count
                  // (absent cells produce no long rows at all)
                  val miss = 1.0 - r.getAs[Long]("n_values").toDouble / n
                  if (miss > 0.5)
                    errors += f"${sp.serieId}: missing ratio $miss%.3f > 0.5"
              }
            }
            bounds.get(d).foreach { case (de, te) =>
              trimMessage(de, te, p.timeDataStartCell)
                .foreach(warnings += _) }
            gapCounts.get(d).foreach(g =>
              warnings += s"$g frequency gap(s) vs ${p.freq.iso}")
            drifts.get(d).foreach(ds =>
              warnings += s"header drift: ${ds.mkString(", ")}")
            val errs = errors.result()
            if (errs.nonEmpty)
              DistributionResult(p.m.catalogId, p.m.datasetId, d,
                "ERROR", errs.mkString("; ").take(500), outPath, 0L)
            else {
              val slice = batchLong
                .filter(col("distribution_id") === d)
                .select(col("serie_id"), col("indice_tiempo"), col("valor"))
              val wide = TimeSeriesOps.alignWide(slice,
                p.series.map(_.serieId), ordered = false)
              val existed = java.nio.file.Files
                .exists(java.nio.file.Paths.get(outPath))
              SingleFileCsv.write(wide, outPath,
                sortBy = Seq("indice_tiempo"))
              val warns = warnings.result()
              DistributionResult(p.m.catalogId, p.m.datasetId, d,
                if (warns.nonEmpty) "WARNING" else "OK",
                noteOf(warns, existed, replace), outPath, n)
            }
          } match {
            case Success(r) => r
            case Failure(e) =>
              DistributionResult(p.m.catalogId, p.m.datasetId, d,
                "ERROR", e.toString.take(500), outPath, 0L)
          }
        }
        // every action is complete — drop the staging partition tree
        val hp = new org.apache.hadoop.fs.Path(stagePath)
        org.apache.hadoop.fs.FileSystem
          .get(hp.toUri, spark.sparkContext.hadoopConfiguration)
          .delete(hp, true)
        batchResults
      } match {
        case Success(rs) => rs
        case Failure(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "batch excel core failed " +
              s"(${e.toString.take(200)}); falling back to " +
              "per-distribution scrapes")
          okPreps.map(scrapeOneFallback)
      }

    // ---- per-item path for direct CSV / TXT distributions
    val directResults = directItems.map { m =>
      val outPath = outPathOf(m)
      Try {
        val wide = m.method match {
          case Some("csv_file") =>
            readDistributionCsv(spark, m.downloadURL.get)
          case Some("text_file") =>
            readDistributionTxtFromStaging(spark, m, fields, stagingDir)
          case other =>
            throw new IllegalArgumentException(s"no processor for $other")
        }
        val freq = fields.filter(_.distributionId == m.distributionId)
          .find(_.specialType.contains("time_index"))
          .flatMap(_.specialTypeDetail).flatMap(Frequency.fromIso)
        val (n, warnings) = validateWide(wide, m.distributionId, freq)
        val existed = java.nio.file.Files
          .exists(java.nio.file.Paths.get(outPath))
        SingleFileCsv.write(wide, outPath, sortBy = Seq("indice_tiempo"))
        DistributionResult(m.catalogId, m.datasetId, m.distributionId,
          if (warnings.nonEmpty) "WARNING" else "OK",
          noteOf(warnings, existed, replace), outPath, n)
      } match {
        case Success(r) => r
        case Failure(e) =>
          DistributionResult(m.catalogId, m.datasetId, m.distributionId,
            "ERROR", e.toString.take(500), outPath, 0L)
      }
    }

    val results =
      skippedResults ++ prepErrors ++ excelResults ++ directResults

    // K4 scraping-stage artifacts (exact names + column sets,
    // base.py:43-55,873-915): reporte-datasets.xlsx and
    // reporte-distributions.xlsx under reportes/<catalogId>/
    manifestF.headOption.foreach { first =>
      val reportsDir = s"$outputDir/reportes/${first.catalogId}"
      val datasetRows = results.groupBy(_.datasetId).toSeq.sortBy(_._1)
        .map { case (ds, rs) =>
          ds -> (if (rs.exists(_.status == "ERROR")) "ERROR" else "OK") }
      val manifestById = manifestF.map(m => m.distributionId -> m).toMap
      val timeCoordById = fields
        .filter(_.specialType.contains("time_index"))
        .map(f => f.distributionId -> f.dataStartCell.getOrElse("")).toMap
      val distRows = results.map { r =>
        val m = manifestById.get(r.distributionId)
        ReportXlsx.DistributionReportRow(r.datasetId, r.distributionId,
          r.status, r.message,
          m.flatMap(x => x.scrapingFileURL.orElse(x.downloadURL))
            .getOrElse(""),
          m.flatMap(_.scrapingFileSheet).getOrElse(""),
          timeCoordById.getOrElse(r.distributionId, ""))
      }
      ReportXlsx.writeDatasetsReport(datasetRows, reportsDir)
      ReportXlsx.writeDistributionsReport(distRows, reportsDir)
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
      m: ManifestEntry, fields: Seq[FieldEntry],
      stagingDir: Option[String]): DataFrame = {
    val url = m.scrapingFileURL.get
    val path = stagingDir.map(s => s"$s/${url.split('/').last}")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .getOrElse(url)
    // field-metadata-driven parsing (load_ts_distribution semantics,
    // processors.py:51-80): time column by declared title, declared
    // series in declaration order
    val myFields = fields.filter(_.distributionId == m.distributionId)
    Ingest.readDistributionTxt(spark, path,
      timeFieldTitle = myFields.find(_.specialType.contains("time_index"))
        .flatMap(_.fieldTitle).getOrElse("indice_tiempo"),
      declaredSeries = myFields.filter(_.specialType.isEmpty)
        .flatMap(_.fieldTitle))
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

  /** §2.9 — the validation battery for a WIDE frame (direct CSV/TXT
    * path), in ONE aggregation job: row counts, null/duplicate time
    * index, per-column missing ratio, and frequency conformance at the
    * declared frequency. Hard violations throw (caught by the per-item
    * Try → ERROR row); soft ones return as WARNING messages — the
    * reference's warning/error split (base.py:165-207). */
  private def validateWide(wide: DataFrame, disId: String,
      freq: Option[Frequency]): (Long, Seq[String]) = {
    val valueCols = wide.columns.filter(_ != "indice_tiempo").toSeq
    // one distribution = one small frame; the single-partition window
    // is the per-item path only (the excel batch path windows by key).
    // A constant partition key keeps WindowExec's partition spec
    // non-empty (no global-window warning) with identical semantics.
    val w = Window.partitionBy(col("_p")).orderBy(col("indice_tiempo"))
    val step: Column = freq.flatMap(_.months) match {
      case Some(mo) =>
        months_between(col("indice_tiempo"), col("prev")) / mo
      case None =>
        datediff(col("indice_tiempo"), col("prev")).cast("double")
    }
    val gapAgg =
      if (freq.isDefined)
        sum(when(col("prev").isNotNull && step =!= 1.0, 1L).otherwise(0L))
          .as("n_gaps")
      else lit(0L).as("n_gaps")
    val aggCols = Seq(
      count(lit(1)).as("n"),
      countDistinct(col("indice_tiempo")).as("n_distinct"),
      count(when(col("indice_tiempo").isNull, 1)).as("n_null_time"),
      gapAgg) ++
      valueCols.zipWithIndex.map { case (c, i) =>
        count(col(c)).as(s"nv_$i") }
    val row = wide
      .withColumn("_p", lit(0))
      .withColumn("prev", lag(col("indice_tiempo"), 1).over(w))
      .agg(aggCols.head, aggCols.tail: _*).head()
    val n = row.getAs[Long]("n")
    if (n == 0)
      throw new IllegalStateException(s"$disId: empty distribution")
    if (row.getAs[Long]("n_null_time") > 0)
      throw new IllegalStateException(s"$disId: null time index")
    if (row.getAs[Long]("n_distinct") != n)
      throw new IllegalStateException(s"$disId: duplicate time index")
    valueCols.zipWithIndex.foreach { case (c, i) =>
      val miss = 1.0 - row.getAs[Long](s"nv_$i").toDouble / n
      if (miss > 0.5) throw new IllegalStateException(
        f"$disId: $c missing ratio $miss%.3f > 0.5")
    }
    val warnings = Seq.newBuilder[String]
    val gaps = row.getAs[Long]("n_gaps")
    if (gaps > 0)
      warnings += s"$gaps frequency gap(s) vs ${freq.map(_.iso).getOrElse("")}"
    (n, warnings.result())
  }
}
