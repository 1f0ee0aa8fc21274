package graft.sinks

import java.nio.file.Path
import org.apache.spark.sql.DataFrame
import graft.sources.XlsxLite

/** K4 — report XLSX sinks (SURVEY §2.2 K4). The reference writes four
  * NAMED artifacts per catalog (filenames base.py:43-55):
  *
  *  - `reporte-datasets.xlsx` — 2 columns (base.py:873-884)
  *  - `reporte-distributions.xlsx` — 7 columns, status-sorted
  *    ERROR < WARNING < OK (base.py:886-915)
  *  - `reporte-catalogo-errores.xlsx` — catalog validation errors
  *    (validate_catalog only_errors export, base.py:434-443)
  *  - `reporte-datasets-completos.xlsx` — harvestable datasets report
  *    (generate_datasets_report harvest='valid', base.py:444-451)
  *
  * Reports are small collected frames; writes are driver-side via
  * XlsxLite.
  */
object ReportXlsx {

  val DatasetsReportName = "reporte-datasets.xlsx"
  val DistributionsReportName = "reporte-distributions.xlsx"
  val ErrorsReportName = "reporte-catalogo-errores.xlsx"
  val DatasetsCompleteReportName = "reporte-datasets-completos.xlsx"

  /** One row of reporte-distributions.xlsx (exact column set,
    * base.py:886-901). */
  final case class DistributionReportRow(datasetIdentifier: String,
      distributionIdentifier: String, distributionStatus: String,
      distributionNote: String, distributionSource: String,
      distributionSheet: String, timeIndexCoord: String)

  private def statusRank(s: String): Int = s match {
    case "ERROR" => 0
    case "WARNING" => 1
    case "OK" => 2
    case _ => 3
  }

  /** Write one report DataFrame as a single-sheet workbook with a
    * header row (the generic K4 writer). */
  def write(report: DataFrame, path: String, sheet: String = "report"): Unit = {
    val header = report.columns.toSeq
    val rows = report.collect().toSeq.map(r =>
      header.indices.map(i => Option(r.get(i)).map(_.toString).orNull))
    XlsxLite.write(path, Seq(sheet -> (header +: rows)))
  }

  /** reporte-datasets.xlsx: (dataset_identifier, dataset_status),
    * base.py:873-884. */
  def writeDatasetsReport(rows: Seq[(String, String)], dir: String): Path =
    XlsxLite.write(s"$dir/$DatasetsReportName", Seq("Sheet1" ->
      (Seq("dataset_identifier", "dataset_status") +:
        rows.map { case (id, st) => Seq(id, st) })))

  /** reporte-distributions.xlsx: the 7-column report sorted by the
    * ERROR < WARNING < OK categorical (base.py:886-915). */
  def writeDistributionsReport(rows: Seq[DistributionReportRow],
      dir: String): Path = {
    val header = Seq("dataset_identifier", "distribution_identifier",
      "distribution_status", "distribution_note", "distribution_source",
      "distribution_sheet", "time_index_coord")
    val sorted = rows.sortBy(r =>
      (statusRank(r.distributionStatus), r.distributionIdentifier))
    XlsxLite.write(s"$dir/$DistributionsReportName", Seq("Sheet1" ->
      (header +: sorted.map(r => Seq(r.datasetIdentifier,
        r.distributionIdentifier, r.distributionStatus, r.distributionNote,
        r.distributionSource, r.distributionSheet, r.timeIndexCoord)))))
  }

  /** reporte-catalogo-errores.xlsx from the violation rows
    * `(level, identifier, rule)` (CatalogValidator.violations — the
    * re-expression of validate_catalog only_errors, base.py:434-443). */
  def writeErrorsReport(violations: DataFrame, dir: String): Path = {
    val rows = violations.select("level", "identifier", "rule")
      .collect().toSeq
      .map(r => Seq(r.getString(0), r.getString(1), r.getString(2)))
    XlsxLite.write(s"$dir/$ErrorsReportName", Seq("errores" ->
      (Seq("level", "identifier", "rule") +: rows)))
  }

  /** reporte-datasets-completos.xlsx: harvestable datasets
    * (generate_datasets_report harvest='valid', base.py:444-451). */
  def writeDatasetsCompleteReport(datasets: DataFrame, dir: String): Path = {
    val cols = Seq("dataset_id", "title", "accrualPeriodicity")
      .filter(datasets.columns.contains)
    val rows = datasets.select(cols.head, cols.tail: _*).collect().toSeq
      .map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).orNull) :+ "valid")
    XlsxLite.write(s"$dir/$DatasetsCompleteReportName", Seq("datasets" ->
      ((cols.map {
        case "dataset_id" => "dataset_identifier"
        case "title" => "dataset_title"
        case "accrualPeriodicity" => "dataset_accrualPeriodicity"
        case c => c
      } :+ "harvest") +: rows)))
  }
}
