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
  * The guard is layout-adaptive, not a local[32] constant, and decides
  * from the frame's actual SCAN SPLITS (`df.rdd.getNumPartitions`),
  * not its file count: a single-file production table with many row
  * groups splits into many scan partitions under `maxPartitionBytes`
  * and passes through untouched — no corpus-grain shuffle is added at
  * cluster scale — while the fixtures' single-row-group files split
  * into a handful of partitions (only one non-empty) and get spread.
  *
  * Caller contract: pass a SCAN-ADJACENT frame — a file scan plus
  * per-row projections/filters only, no exchanges, no checkpointed
  * inputs. Two reasons: (a) a frame with zero input files (derived /
  * in-memory relation) cannot be classified by layout, so it passes
  * through; (b) `df.rdd` on an exchange-bearing frame would force AQE
  * stage materialization at plan-construction time. All three call
  * sites (EntityResolution.blockedNamePairs, Profiling
  * .correlationMatrix, Dedup.exactSubstrSpans) pass bare
  * scan+project frames. Callers must be order-insensitive (exact
  * aggregates, pinned-order folds, per-row scalars): everything
  * downstream of a shuffle already holds that by the engine's
  * determinism discipline. */
object Spread {
  def fewFileScan(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles == 0 ⇒ not a classifiable scan (checkpointed or
    // in-memory input): pass through rather than guess.
    if (df.inputFiles.isEmpty) df
    else {
      val splits = df.rdd.getNumPartitions
      if (splits < parts) {
        if (keys.nonEmpty) df.repartition(parts, keys: _*)
        else df.repartition(parts)
      } else df
    }
  }
}
