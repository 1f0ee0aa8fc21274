package graft.model

/** Frequency ADT — the reference's accrualPeriodicity vocabulary
  * (reference processors.py:230-238 `freq_iso_to_xlseries`;
  * tests/project/config/schemas/accrualPeriodicity.json).
  *
  * Semester ("R/P6M") has no Spark interval literal, so each frequency
  * carries its own period arithmetic (months-per-period or daily) used by
  * the gap/conformance validators (SURVEY §2.8 T3).
  */
sealed abstract class Frequency(
    val iso: String,       // ISO-8601 repeat duration, e.g. "R/P1Y"
    val code: String,      // pandas-style short code the reference maps to
    val months: Option[Int] // period length in months; None => daily
) {
  /** Spark SQL interval expression string for one period. */
  def intervalExpr: String =
    months.map(m => s"interval $m months").getOrElse("interval 1 days")
}

object Frequency {
  case object Annual    extends Frequency("R/P1Y", "Y", Some(12))
  case object Semester  extends Frequency("R/P6M", "S", Some(6))
  case object Quarterly extends Frequency("R/P3M", "Q", Some(3))
  case object Monthly   extends Frequency("R/P1M", "M", Some(1))
  case object Daily     extends Frequency("R/P1D", "D", None)

  val all: Seq[Frequency] = Seq(Annual, Semester, Quarterly, Monthly, Daily)

  def fromIso(iso: String): Option[Frequency] = all.find(_.iso == iso)
  def fromCode(code: String): Option[Frequency] = all.find(_.code == code)
}

/** Distribution processing method (reference base.py:123-153 dispatch):
  * downloadURL present => csv_file; scrapingFileURL *.txt => text_file;
  * *.xls/xlsx => excel_file. SURVEY §2.3 P5.
  */
sealed abstract class Method(val name: String)
object Method {
  case object CsvFile   extends Method("csv_file")
  case object TextFile  extends Method("text_file")
  case object ExcelFile extends Method("excel_file")
  val all: Seq[Method] = Seq(CsvFile, TextFile, ExcelFile)
}
