package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.GF

/** S4 / K3 — the 5-sheet XLSX encoding of the catalog model
  * (SURVEY §1.1: sheets `catalog, dataset, distribution, field, theme`
  * with prefix-flattened columns like `catalog_identifier`,
  * `dataset_title`, `field_scrapingIdentifierCell`).
  *
  * Reading lands each sheet as a string-typed DataFrame with the prefix
  * stripped, which IS the engine's exploded relational view — no nested
  * reassembly needed. Field ids/titles are whitespace-stripped on load
  * (F1, the reference's clean_catalog).
  */
object CatalogXlsx {

  final case class CatalogViews(catalog: DataFrame, datasets: DataFrame,
      distributions: DataFrame, fields: DataFrame, themes: DataFrame)

  private val SheetNames = Seq("catalog", "dataset", "distribution",
    "field", "theme")

  /** Read the 5-sheet workbook into the relational views. */
  def readViews(spark: SparkSession, path: String): CatalogViews = {
    val cells = XlsxLite.read(path)
    val bySheet = cells.groupBy(_.sheet)
    val dfs = SheetNames.map { name =>
      name -> sheetToDf(spark, name, bySheet.getOrElse(name, Seq.empty))
    }.toMap
    val fields0 = dfs("field")
    val fields =
      if (fields0.columns.contains("id") && fields0.columns.contains("title"))
        fields0.withColumn("id", GF.stripSpaces(col("id")))
          .withColumn("title", GF.stripSpaces(col("title")))
      else fields0
    CatalogViews(dfs("catalog"), dfs("dataset"), dfs("distribution"),
      fields, dfs("theme"))
  }

  /** One sheet -> DataFrame: row 1 is the header; `<sheet>_` prefixes are
    * stripped from column names; all columns StringType. */
  private def sheetToDf(spark: SparkSession, sheet: String,
      cells: Seq[XlsxLite.Cell]): DataFrame = {
    if (cells.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(Seq.empty[StructField]))
    val header = cells.filter(_.row == 1).sortBy(_.col)
    val colNames = header.map(c => stripPrefix(c.value, sheet)).toIndexedSeq
    val colByIdx = header.map(_.col).zipWithIndex.toMap
    val maxRow = cells.map(_.row).max
    val data = cells.filter(_.row > 1).groupBy(_.row)
    val rows = (2 to maxRow).flatMap { r =>
      data.get(r).map { rowCells =>
        val arr = Array.fill[String](colNames.size)(null)
        rowCells.foreach(c =>
          colByIdx.get(c.col).foreach(i => arr(i) = c.value))
        Row.fromSeq(arr.toIndexedSeq)
      }
    }
    val schema = StructType(colNames.map(n => StructField(n, StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def stripPrefix(name: String, sheet: String): String =
    if (name != null && name.startsWith(sheet + "_"))
      name.drop(sheet.length + 1)
    else name

  /** K3 — write the views back as the 5-sheet workbook (inverse of S4),
    * prefix-flattened headers restored. */
  def writeViews(path: String, views: CatalogViews): Unit = {
    def sheetRows(df: DataFrame, sheet: String): Seq[Seq[String]] = {
      if (df.columns.isEmpty) return Seq(Seq.empty)
      val header = df.columns.map(c => s"${sheet}_$c").toSeq
      val body = df.collect().toSeq.map(r =>
        df.columns.indices.map(i => Option(r.get(i)).map(_.toString).orNull))
      header +: body
    }
    XlsxLite.write(path, Seq(
      "catalog" -> sheetRows(views.catalog, "catalog"),
      "dataset" -> sheetRows(views.datasets, "dataset"),
      "distribution" -> sheetRows(views.distributions, "distribution"),
      "field" -> sheetRows(views.fields, "field"),
      "theme" -> sheetRows(views.themes, "theme")))
  }

  /** Any workbook -> the engine's cell-grid DataFrame, feeding the S7
    * scrape operator: real XLSX sources run through the exact same
    * relational extraction as synthetic grids. */
  def toGrid(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    XlsxLite.read(path)
      .map(c => (c.sheet, c.row, c.col, c.value))
      .toDF("sheet", "row", "col", "value")
  }
}
