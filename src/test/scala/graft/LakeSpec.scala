package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.ReportXlsx
import graft.sources.XlsxLite

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("series lake partitions by catalog and prunes on read") {
    val dir = Files.createTempDirectory("graft-lake").toString
    val series = Seq(
      ("cat_a", "1", "1.1", "s1", java.sql.Date.valueOf("2020-01-01"), 1.0),
      ("cat_a", "1", "1.1", "s1", java.sql.Date.valueOf("2020-02-01"), 2.0),
      ("cat_b", "2", "2.1", "s2", java.sql.Date.valueOf("2020-01-01"), 3.0))
      .toDF("catalog_id", "dataset_id", "distribution_id", "serie_id",
        "indice_tiempo", "valor")
    SeriesLake.write(series, dir)
    // physical layout: one directory per catalog
    assert(Files.exists(java.nio.file.Paths.get(dir, "catalog_id=cat_a")))
    val slice = SeriesLake.forCatalog(spark, dir, "cat_a")
    assert(slice.count() == 2)
    // partition pruning visible in the plan: the catalog predicate is a
    // PartitionFilter (directory-level skip), not a data filter
    val p = slice.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("= cat_a"),
      s"partition pruning not applied:\n$p")
  }

  test("K4 report XLSX sink round-trips the report") {
    val dir = Files.createTempDirectory("graft-k4")
    val report = Seq(
      ("1.1", "OK", ""), ("1.2", "ERROR", "boom"))
      .toDF("distribution_id", "distribution_status", "message")
    val path = dir.resolve("reporte-distributions.xlsx").toString
    ReportXlsx.write(report, path)
    val cells = XlsxLite.read(path)
    assert(cells.exists(c => c.row == 1 && c.value == "distribution_status"))
    assert(cells.exists(c => c.value == "boom"))
    // empty string cells written, nulls skipped
    assert(cells.count(_.row == 2) == 3)
  }
}
