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

  test("xlsx-catalog ETL end-to-end (S4 -> S7 -> K1)") {
    val dir = Files.createTempDirectory("graft-xcat")
    val wb = dir.resolve("fuente2.xlsx").toString
    XlsxLite.write(wb, Seq("datos" -> Seq(
      Seq("indice_tiempo", "empleo"),
      Seq("2022-01", "95.5"),
      Seq("2022-02", "96"),
      Seq("2022-03", "///"))))
    val catXlsx = dir.resolve("catalog.xlsx").toString
    XlsxLite.write(catXlsx, Seq(
      "catalog" -> Seq(
        Seq("catalog_identifier", "catalog_title"),
        Seq("xcat", "XLSX catalog")),
      "dataset" -> Seq(
        Seq("dataset_identifier", "dataset_title", "dataset_accrualPeriodicity"),
        Seq("3", "ds3", "R/P1M")),
      "distribution" -> Seq(
        Seq("distribution_dataset_identifier", "distribution_identifier",
          "distribution_title", "distribution_scrapingFileURL",
          "distribution_scrapingFileSheet", "distribution_fileName"),
        Seq("3", "3.1", "mensual", s"file://$wb", "datos", "mensual.csv")),
      "field" -> Seq(
        Seq("field_distribution_identifier", "field_id", "field_title",
          "field_specialType", "field_specialTypeDetail",
          "field_scrapingIdentifierCell", "field_scrapingDataStartCell"),
        Seq("3.1", null, "indice_tiempo", "time_index", "R/P1M", "A1", "A2"),
        Seq("3.1", "empleo", "empleo", null, null, "B1", "B2")),
      "theme" -> Seq(Seq("theme_id", "theme_label"))))

    val out = dir.resolve("out").toString
    val result = Pipeline.runXlsx(spark, catXlsx, "xcat", out,
      stagingDir = Some(dir.resolve("staging").toString))
    val row = result.report.head()
    assert(row.getAs[String]("distribution_status") == "OK",
      row.getAs[String]("message"))
    val csv = Paths.get(out,
      "catalog/xcat/dataset/3/distribution/3.1/download/mensual.csv")
    val lines = Files.readAllLines(csv)
    assert(lines.get(0) == "indice_tiempo,empleo")
    assert(lines.get(1) == "2022-01-01,95.5")
    assert(lines.get(3) == "2022-03-01,\"\"" || lines.get(3) == "2022-03-01,")
  }

  test("training-data pipeline end-to-end: curate -> shards -> manifest") {
    // the extension surface composes: raw documents through the
    // curation funnel, survivors sharded into the corpus lake, manifest
    // totals consistent at every stage
    import graft.operators.{Curation, Sampling}
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    val funnel = Curation.funnel(docs, "text", "doc_id")
    val byReason = funnel.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason.values.sum == docs.count(),
      "funnel must account for every document")
    val kept = Curation.curate(docs, "text", "doc_id")
    assert(kept.count() == byReason.getOrElse("kept", 0L))

    val dir = java.nio.file.Files
      .createTempDirectory("graft-e2e-corpus").toString
    CorpusLake.writeShards(kept, "doc_id", dir, epoch = 2, nShards = 3)
    val m = CorpusLake.manifest(spark, dir).collect()
    assert(m.map(_.getAs[Long]("n_examples")).sum == kept.count(),
      "every kept doc lands in exactly one shard")

    // split fractions are the deterministic hash split of the KEPT set
    val bySplit = m.groupBy(_.getAs[String]("split")).view
      .mapValues(_.map(_.getAs[Long]("n_examples")).sum).toMap
    val expected = Sampling.withSplit(kept, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit == expected, s"$bySplit != $expected")

    // reading a split back yields only kept, correctly-assigned docs
    val train = CorpusLake.forSplit(spark, dir, "train")
    assert(train.count() == expected.getOrElse("train", 0L))
  }

  test("mail subject formatting (F9)") {
    val now = java.time.LocalDateTime.of(2026, 8, 12, 9, 30)
    assert(Reports.mailSubject("Scraping", "sspm", "staging", now) ==
      "[staging] Scraping: sspm - 12/08/2026 09:30")
    assert(Reports.mailSubject("Scraping", "sspm", "production", now) ==
      "Scraping: sspm - 12/08/2026 09:30")
  }
}
