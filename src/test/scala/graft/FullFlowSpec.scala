package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.Reports
import graft.sources.XlsxLite

/** The complete reference flow: catalog JSON -> ingest the XLSX source
  * over file:// (S1/S2) -> parse to grid (S4 machinery) -> scrape (S7)
  * -> validate -> CSV sink (K1) -> report. */
class FullFlowSpec extends SparkSpec {

  test("excel scrape path end-to-end through ingest + staging") {
    val dir = Files.createTempDirectory("graft-full")
    // the source workbook, as a real xlsx file
    val wb = dir.resolve("fuente.xlsx").toString
    XlsxLite.write(wb, Seq("serie" -> Seq(
      Seq("indice_tiempo", "pib", "consumo"),
      Seq("2019", "100.5", "70.25"),
      Seq("2020", "s.d.", "72"),
      Seq("2021", "110", "75.5"))))

    val catalogJson =
      s"""{"identifier":"e2e","title":"t","description":"d",
         |"publisher":{"name":"p"},"superThemeTaxonomy":"http://x",
         |"dataset":[{"identifier":"1","title":"ds","description":"d",
         | "publisher":{"name":"p"},"superTheme":["ECON"],
         | "accrualPeriodicity":"R/P1Y","issued":"2020-01-01",
         | "distribution":[{"identifier":"1.1","title":"anual",
         |  "issued":"2020-01-01","fileName":"anual.csv",
         |  "scrapingFileURL":"file://$wb","scrapingFileSheet":"serie",
         |  "field":[
         |   {"title":"indice_tiempo","type":"date",
         |    "specialType":"time_index","specialTypeDetail":"R/P1Y",
         |    "scrapingIdentifierCell":"A1","scrapingDataStartCell":"A2"},
         |   {"id":"pib","title":"pib","type":"number",
         |    "scrapingIdentifierCell":"B1","scrapingDataStartCell":"B2"},
         |   {"id":"consumo","title":"consumo","type":"number",
         |    "scrapingIdentifierCell":"C1","scrapingDataStartCell":"C2"}
         |  ]}]}]}""".stripMargin.replace("\n", "")
    val catPath = dir.resolve("catalog.json")
    Files.writeString(catPath, catalogJson)

    val out = dir.resolve("out").toString
    val result = Pipeline.run(spark, catPath.toString, "e2e", out,
      stagingDir = Some(dir.resolve("staging").toString))

    val report = result.report.collect()
    assert(report.length == 1)
    assert(report.head.getAs[String]("distribution_status") == "OK")

    val csv = Paths.get(out,
      "catalog/e2e/dataset/1/distribution/1.1/download/anual.csv")
    assert(Files.exists(csv))
    val lines = Files.readAllLines(csv)
    assert(lines.get(0) == "indice_tiempo,pib,consumo")
    assert(lines.get(1) == "2019-01-01,100.5,70.25")
    assert(lines.get(2) == "2020-01-01,,72.0" ||
      lines.get(2) == "2020-01-01,\"\",72.0")
    assert(lines.get(3) == "2021-01-01,110.0,75.5")

    // the staged copy landed once (D2 + S8)
    assert(Files.exists(dir.resolve("staging/fuente.xlsx")))
  }

  test("mail subject formatting (F9)") {
    val now = java.time.LocalDateTime.of(2026, 8, 12, 9, 30)
    assert(Reports.mailSubject("Scraping", "sspm", "staging", now) ==
      "[staging] Scraping: sspm - 12/08/2026 09:30")
    assert(Reports.mailSubject("Scraping", "sspm", "production", now) ==
      "Scraping: sspm - 12/08/2026 09:30")
  }
}
