package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guard for CPU-dense per-row work (optimization
  * guide §2.5, "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * Parquet scans parallelize at ROW-GROUP grain; the bench fixtures
  * are single-file single-row-group tables, so however small
  * `maxPartitionBytes` is set, every scan is ONE effective task and
  * all map-side work before the first exchange (regex tokenization,
  * digest hashing, decimal power sums, pair scoring under a broadcast
  * join) runs on one core. [[Dedup.shingleRows]] has guarded against
  * this since r12; this is the same guard as a shared helper for the
  * other CPU-dense operator heads.
  *
  * The guard is layout-adaptive, not a local[32] constant: a scan
  * backed by fewer files than `defaultParallelism` is spread (hash by
  * `keys` when the consumer wants co-location, round-robin otherwise);
  * a many-file production scan — already parallel — passes through
  * untouched, so no corpus-grain shuffle is added at cluster scale.
  * Callers must be order-insensitive (exact aggregates, pinned-order
  * folds, per-row scalars): everything downstream of a shuffle already
  * holds that by the engine's determinism discipline. */
object Spread {
  def fewFileScan(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < parts) {
      if (keys.nonEmpty) df.repartition(parts, keys: _*)
      else df.repartition(parts)
    } else df
  }
}
