package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB layout for the long-form series table (SURVEY §1.4):
  * parquet partitioned by `catalog_id` (coarse pruning by tenant /
  * source) — a query for one catalog or one series touches only its
  * partition directories, and Catalyst turns `catalog_id = 'x'` into
  * partition pruning (zero I/O on other catalogs) plus min/max row-group
  * skipping on `serie_id`/`indice_tiempo` within files.
  *
  * At cluster scale the same writer adds a bucket spec on `serie_id`
  * (bucketBy into a table) so per-series windows/joins co-locate without
  * a shuffle; plain path-partitioned parquet keeps this demo
  * catalog-agnostic.
  */
object SeriesLake {

  /** Write long-form series `(catalog_id, dataset_id, distribution_id,
    * serie_id, indice_tiempo, valor)` partitioned by catalog. */
  def write(series: DataFrame, path: String): Unit =
    series.write
      .mode("overwrite")
      .partitionBy("catalog_id")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One catalog's slice — relies on partition pruning, never a scan of
    * the whole lake. */
  def forCatalog(spark: SparkSession, path: String, catalogId: String): DataFrame =
    read(spark, path).filter(col("catalog_id") === catalogId)
}
