package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GF

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

  /** Power-of-two length bucketing — the batch-scheduling view of a
    * corpus: documents padded to the next 2^k boundary batch together,
    * and this report prices the padding waste per (key, bucket). The
    * bucket boundary is computed with INTEGER bit arithmetic
    * (`1 << len(bin(n-1))`), never floating log2, whose representation
    * error flips exact powers of two to the wrong bucket — and which an
    * external engine might round differently. One partial-aggregatable
    * groupBy. */
  def lengthBuckets(docs: DataFrame, tokensCol: String,
      keys: Seq[String] = Nil): DataFrame = {
    val bucketed = docs
      .withColumn("__n", greatest(col(tokensCol).cast("long"), lit(1L)))
      .withColumn("bucket_cap",
        when(col("__n") === 1, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(__n - 1)))")))
    bucketed.groupBy(keys.map(col) :+ col("bucket_cap"): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .withColumn("padding",
        col("n_docs") * col("bucket_cap") - col("sum_tokens"))
      .withColumn("waste_ratio",
        round(col("padding").cast("double") /
          (col("n_docs") * col("bucket_cap")), 6))
  }

  /** Sliding-window token chunking — the RAG/embedding prep step: split
    * each document's token stream into chunks of `chunkSize` tokens
    * with `overlap` tokens carried over between consecutive chunks
    * (stride = chunkSize − overlap). The final chunk keeps its natural
    * (shorter) length; a document shorter than one chunk yields exactly
    * one chunk.
    *
    * Pure per-row expression work: chunk starts are a `sequence()` at
    * stride spacing, each chunk a `slice()` of the token array — no
    * shuffle, no window, fully parallel over documents. Output grain is
    * (id, chunk_idx) with start_pos (0-based), n_tokens and the
    * re-joined chunk_text. */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val arr = Dedup.normTokens(col(textCol))
    docs
      .withColumn("__arr", arr)
      .filter(size(col("__arr")) > 0)
      // last start: the largest multiple of stride still leaving >
      // `overlap` unseen tokens — floor((n-overlap-1)/stride)*stride,
      // clamped at 0 so short docs chunk once. Spark `/` on integrals
      // is true division; floor() makes the intent explicit and safe
      // for the negative n <= overlap edge.
      .withColumn("__starts", sequence(lit(0L),
        greatest(floor((size(col("__arr")) - lit(overlap) - lit(1))
            .cast("double") / lit(stride.toDouble)).cast("long"),
          lit(0L)) * lit(stride.toLong),
        lit(stride.toLong)))
      .select(col(idCol), posexplode(col("__starts")).as(Seq("chunk_idx", "__s")),
        col("__arr"))
      .select(col(idCol), col("chunk_idx"), col("__s").as("start_pos"),
        slice(col("__arr"), col("__s").cast("int") + lit(1), lit(chunkSize))
          .as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_pos"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
