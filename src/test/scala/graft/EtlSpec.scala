package graft

import java.nio.file.{Files, Paths}
import graft.sources.XlsxLite

/** The reference's full `main.py` lifecycle: index.yaml → catalog
  * download → pipeline → named reports, with per-catalog fault
  * isolation and the catalog-id filter. */
class EtlSpec extends SparkSpec {

  test("Etl.runAll drives index.yaml end-to-end (main.py:41-97)") {
    val dir = Files.createTempDirectory("graft-etl")
    // the source workbook for the scraped distribution
    val wb = dir.resolve("fuente.xlsx").toString
    XlsxLite.write(wb, Seq("serie" -> Seq(
      Seq("indice_tiempo", "pib"),
      Seq("2019", "100.5"),
      Seq("2020", "s.d."),
      Seq("2021", "110"))))
    val catalogJson =
      s"""{"identifier":"cat1","title":"t","description":"d",
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
         |    "scrapingIdentifierCell":"B1","scrapingDataStartCell":"B2"}
         |  ]}]}]}""".stripMargin.replace("\n", "")
    val catFile = dir.resolve("data.json")
    Files.writeString(catFile, catalogJson)

    val configDir = dir.resolve("config")
    Files.createDirectories(configDir)
    Files.writeString(configDir.resolve("index.yaml"),
      s"""cat1:
         |  url: file://$catFile
         |  formato: json
         |otro:
         |  url: file:///nonexistent/missing.json
         |  formato: json
         |""".stripMargin)
    Files.writeString(configDir.resolve("config_downloads.yaml"),
      """defaults:
        |  tries: 1
        |  retry_delay: 0
        |""".stripMargin)
    Files.writeString(configDir.resolve("config_general.yaml"),
      "environment: testing\n")

    val out = dir.resolve("out").toString
    val results = Etl.runAll(spark, Etl.Args(
      configDir = configDir.toString, outputDir = out))

    // cat1 succeeded; 'otro' (dead url) was isolated, not fatal
    assert(results.keySet == Set("cat1"))
    val report = results("cat1").report.collect()
    assert(report.length == 1 &&
      report.head.getAs[String]("distribution_status") == "OK")

    // catalog document landed; scrape output + named reports written
    assert(Files.exists(Paths.get(s"$out/catalog/cat1/catalog.json")))
    assert(Files.exists(Paths.get(
      s"$out/catalog/cat1/dataset/1/distribution/1.1/download/anual.csv")))
    assert(Files.exists(Paths.get(
      s"$out/reportes/cat1/reporte-datasets.xlsx")))
    assert(Files.exists(Paths.get(
      s"$out/reportes/cat1/reporte-distributions.xlsx")))
    assert(Files.exists(Paths.get(
      s"$out/reportes/cat1/reporte-catalogo-errores.xlsx")))

    // the catalog-id filter restricts the run
    val filtered = Etl.runAll(spark, Etl.Args(
      configDir = configDir.toString,
      outputDir = dir.resolve("out2").toString,
      catalogIdFilter = Some("nope")))
    assert(filtered.isEmpty)
  }

  test("arg parsing mirrors the reference CLI flags") {
    val a = Etl.parseArgs(Seq("--config-dir", "/c", "--output", "/o",
      "--replace", "false", "--interactive",
      "--catalog-id-filter", "sspm", "--distribution-id-filter", "168.1"))
    assert(a == Etl.Args("/c", None, "/o", replace = false,
      interactive = true, Some("sspm"), Some("168.1")))
    intercept[IllegalArgumentException](Etl.parseArgs(Seq("--bogus")))
  }
}
