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

  /** Small-file compaction for one lake partition. Incremental ETL
    * appends a few files per run; over months a partition accumulates
    * thousands of tiny parquet files and scan parallelism degrades into
    * task-scheduling + footer-read overhead. Rewrites the partition
    * into ceil(bytes / targetFileBytes) files via a temp directory +
    * rename swap, all through the Hadoop FileSystem API (works on
    * local, HDFS, or object-store committers alike). Returns the new
    * file count. */
  def compactCatalog(spark: SparkSession, path: String, catalogId: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val partDir = new HPath(s"$path/catalog_id=$catalogId")
    val fs = FileSystem.get(partDir.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partDir)) return 0
    val bytes = fs.listStatus(partDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new HPath(s"$path/.compact-$catalogId.tmp")
    fs.delete(tmp, true)
    // read the single partition directly (no catalog_id column inside)
    spark.read.parquet(partDir.toString)
      .repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: drop the committer's marker, then move the live dir aside
    // BEFORE moving tmp into place — the original data survives any
    // single failure (a crash between the renames leaves the partition
    // recoverable from the .bak dir; nothing is deleted until the new
    // data is live). Every rename result is checked: a false return
    // (e.g. object-store rename refusal) aborts loudly instead of
    // silently reporting success with the partition gone.
    fs.delete(new HPath(tmp, "_SUCCESS"), false)
    val backup = new HPath(s"$path/.compact-$catalogId.bak")
    fs.delete(backup, true)
    if (!fs.rename(partDir, backup))
      sys.error(s"compactCatalog: failed to move $partDir aside to $backup; " +
        "partition left untouched")
    if (!fs.rename(tmp, partDir)) {
      // roll back so the live partition is never left missing
      fs.rename(backup, partDir)
      sys.error(s"compactCatalog: failed to move $tmp into place at $partDir; " +
        "original partition restored")
    }
    fs.delete(backup, true)
    n
  }

  /** Save a frame as a BUCKETED, bucket-sorted external parquet table —
    * the co-location contract for the 100 TB join/agg tier. Bucketing
    * pays the key shuffle ONCE at write time: every later equi-join or
    * aggregate on `bucketKey` between tables that agree on the bucket
    * count plans WITHOUT a ShuffleExchange (Catalyst recognizes the
    * `HashPartitioning(bucketKey, buckets)` output partitioning of the
    * bucketed scan), so the repeated-analytics cost at scale is the
    * join itself, never the fact-table re-shuffle. `sortCols` orders
    * rows inside each bucket file (min/max row-group skipping + cheaper
    * merge-sort for SMJ inputs).
    *
    * The bucket count is a LAYOUT contract, not a tuning knob: both
    * sides of a co-located join must have been written with the same
    * `buckets`, and re-bucketing means rewriting — pick it from target
    * bucket-file size (bytes / buckets ≈ 128 MB–1 GB), not from
    * today's cluster width. External table (explicit `path`), so the
    * files outlive any one session's in-memory catalog and re-register
    * on the next `writeBucketed`/`saveAsTable`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketKey: String, buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketKey)
      .format("parquet")
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
