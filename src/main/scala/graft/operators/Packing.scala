package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: streaming documents into fixed-capacity context
  * windows — the layout stage between a curated corpus and a training
  * run (engine extension, SURVEY §2.12).
  */
object Packing {

  /** Assign each row a bin id within its shard: rows stream in `ordCol`
    * order and a row belongs to bin `exclusive-running-sum div
    * capacity` — the deterministic streaming chunker. A document
    * straddling a capacity boundary stays in the earlier bin, so bins
    * may overflow by less than one document; exact greedy packing is
    * inherently sequential, and this is its distributed approximation
    * (same assignments on any cluster size).
    *
    * The only shuffle is the window keyed by `shardCol` — at 100 TB
    * that is the ingest shard / source, thousands of independent
    * partitions, each sorted locally. Never a global window. */
  def packBins(docs: DataFrame, shardCol: String, ordCol: String,
      tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(ordCol))
    docs.withColumn("__cum",
        sum(col(tokensCol)).over(w) - col(tokensCol))
      // integer division on nonnegative longs == floor
      .withColumn("bin", (col("__cum") / lit(capacity)).cast("long"))
      .drop("__cum")
  }

  /** Per-bin packing report: documents per bin, token fill, and fill
    * ratio against the capacity. */
  def binStats(packed: DataFrame, shardCol: String, tokensCol: String,
      capacity: Long): DataFrame =
    packed.groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("bin_tokens"))
      .withColumn("fill_ratio",
        round(col("bin_tokens").cast("double") / capacity, 6))
}
