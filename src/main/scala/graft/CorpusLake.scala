package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** The OUTPUT side of the training-data pipeline: the curated corpus
  * persisted as training shards a data loader streams directly (engine
  * extension; companion to [[SeriesLake]]'s input-side layout).
  *
  * Layout: parquet partitioned by `split` (train/val/test — the
  * deterministic hash split) and `shard` (a hash bucket of the salted
  * shuffle key), repartitioned BY those same keys before the write so
  * every (split, shard) directory holds exactly ONE file — no
  * small-file accumulation — and `sortWithinPartitions` on the shuffle
  * key bakes the canonical training order INTO the file: a reader
  * streams examples in deterministic shuffled order with zero sort, on
  * any engine, because both split and order derive from portable
  * hashes of the document id (Sampling.withSplit /
  * Sampling.shuffleKey). Re-sharding for a different worker count is a
  * metadata change (`nShards`), not a semantic one — example order
  * within the epoch permutation is unchanged.
  */
object CorpusLake {

  /** Write `docs` as training shards under `path`. Keeps all input
    * columns and adds `split`, `shard`, `shuffle_key`. */
  def writeShards(docs: DataFrame, idCol: String, path: String,
      epoch: Int, nShards: Int, trainPct: Int = 80,
      valPct: Int = 10): Unit =
    Sampling.withSplit(docs, idCol, trainPct, valPct)
      .withColumn("shuffle_key", Sampling.shuffleKey(col(idCol), epoch))
      .withColumn("shard",
        pmod(col("shuffle_key"), lit(nShards)).cast("int"))
      .repartition(col("split"), col("shard"))
      // partition columns lead the sort: the partitionBy writer demands
      // rows grouped by (split, shard) and would inject its OWN
      // non-stable sort on just those keys if unsatisfied, destroying
      // the baked-in shuffle order — leading with them makes the
      // existing ordering satisfy the writer, so the suffix
      // (shuffle_key, id) order survives into the files
      .sortWithinPartitions(col("split"), col("shard"),
        col("shuffle_key"), col(idCol))
      .write.mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One split's slice — partition pruning, never a full-lake scan. */
  def forSplit(spark: SparkSession, path: String, split: String): DataFrame =
    read(spark, path).filter(col("split") === split)

  /** The trainer-facing manifest: per (split, shard) example counts
    * and the shuffle-key range — what an epoch planner reads instead
    * of listing files. One aggregation job. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_examples"),
        min(col("shuffle_key")).as("min_key"),
        max(col("shuffle_key")).as("max_key"))
      .orderBy(col("split"), col("shard"))
}
