package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of
  * "push down and prune". Parquet keeps min/max statistics per file and
  * row group; a plain sort makes them selective on ONE column, while a
  * Z-order (Morton) sort interleaves the bits of two columns so file
  * ranges stay narrow on BOTH — the standard lakehouse layout technique
  * for multi-dimensional point/range lookups over 100 TB.
  */
object Layout {

  /** Morton/Z-value of two non-negative int columns: the low `bits`
    * bits of each, interleaved (a even positions, b odd). Pure integer
    * bit arithmetic — codegen'd, shuffle-free; values beyond the bit
    * budget are clamped so ordering degrades gracefully instead of
    * wrapping. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val cap = (1L << bits) - 1
    val ca = least(greatest(a.cast("long"), lit(0L)), lit(cap))
    val cb = least(greatest(b.cast("long"), lit(0L)), lit(cap))
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(cb, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `nFiles` parquet files range-partitioned AND sorted
    * by the Z-value of (colA, colB) — every file covers a compact
    * rectangle-ish region of the (A, B) plane, so a selective predicate
    * on EITHER column touches a small fraction of files (file-level
    * min/max skip) and of row groups within them. One shuffle; the z
    * column itself is dropped from the output.
    *
    * `aligned = true` (default) splits the z domain into `nFiles` EQUAL
    * ranges, so files are exact power-of-two tiles of the plane —
    * maximal pruning on uniform-ish data, but file sizes follow the
    * data's density. `aligned = false` uses sampled range partitioning:
    * balanced file sizes under skew, tiles drift off power-of-two
    * boundaries and prune a little worse. */
  def zOrderWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int, bits: Int = 16,
      aligned: Boolean = true): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    val z = df.withColumn("__z", zValue(col(colA), col(colB), bits))
    val parted =
      if (aligned) {
        val span = (1L << (2 * bits)) / nFiles max 1L
        // integer division — a double floor() loses exactness for
        // bits > 26 (z up to 2^62 exceeds the 2^53 mantissa)
        z.withColumn("__zb", expr(s"__z div ${span}L"))
          .repartitionByRange(nFiles, col("__zb"))
          .sortWithinPartitions(col("__z"))
          .drop("__zb")
      } else
        z.repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
    parted.drop("__z").write.mode("overwrite").parquet(path)
  }

  /** File-level pruning report for a predicate `lo <= c <= hi` against
    * a parquet directory: fraction of files whose [min, max] on `c`
    * intersects the range (what a statistics-based scan must read).
    * Test/ops instrumentation — one tiny agg per file. */
  def pruneFraction(spark: org.apache.spark.sql.SparkSession, path: String,
      c: String, lo: Long, hi: Long): Double = {
    // list via the Hadoop FileSystem API (like CorpusLake/Dedup) so the
    // report works on hdfs://, s3a:// etc., not just the local FS
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val root = new HPath(path)
    val fs = FileSystem.get(root.toUri,
      spark.sparkContext.hadoopConfiguration)
    val listed =
      if (fs.exists(root)) fs.listStatus(root) else Array.empty[org.apache.hadoop.fs.FileStatus]
    val files = listed
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no parquet files under $path")
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
      // a zero-row file has null stats and can never contain a match
      !r.isNullAt(0) && !(r.getLong(1) < lo || r.getLong(0) > hi)
    }
    hit.toDouble / files.length
  }
}
