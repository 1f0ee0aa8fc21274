package graft.sinks

import org.apache.spark.sql.DataFrame
import graft.sources.XlsxLite

/** K4 — report XLSX sinks (SURVEY §2.2 K4; reference base.py:679-703:
  * reporte-datasets.xlsx / reporte-distributions.xlsx per catalog, plus
  * the validation-stage error report). Reports are small collected
  * frames; the write is driver-side via XlsxLite. */
object ReportXlsx {

  /** Write one report DataFrame as a single-sheet workbook with a
    * header row. */
  def write(report: DataFrame, path: String, sheet: String = "report"): Unit = {
    val header = report.columns.toSeq
    val rows = report.collect().toSeq.map(r =>
      header.indices.map(i => Option(r.get(i)).map(_.toString).orNull))
    XlsxLite.write(path, Seq(sheet -> (header +: rows)))
  }
}
