package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB (builder-prompt
  * scale items: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles the join case at runtime; aggregation skew on
  * a dominant group key still concentrates one reducer. The classic fix
  * is the two-stage salted aggregate below: a random-ish salt spreads
  * the hot key over `saltBuckets` partial groups, then a second (tiny)
  * aggregate folds the partials. Works for any algebraic aggregate
  * (sum/count/min/max); the engine exposes the common count/sum shape.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): engine code avoids
    * rand() so retried tasks and resumed jobs stay deterministic —
    * hash an existing high-cardinality column instead. */
  def salt(entropyCol: Column, buckets: Int): Column =
    pmod(hash(entropyCol), lit(buckets))

  /** Two-stage salted sum/count per key. `entropyCol` must be
    * high-cardinality (a row id, timestamp, line number). Result
    * equals a direct groupBy(keys).agg(count, sum) but the first
    * shuffle distributes each hot key over `saltBuckets` reducers. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      entropyCol: String, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(col(entropyCol), saltBuckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }

  /** Salted equi-join for a hot-keyed FACT against a small-but-not-
    * broadcastable dimension: the fact side salts each row into one of
    * `saltBuckets` sub-keys, the dimension side replicates each row
    * once per bucket (explode of a literal range — dimension size ×
    * buckets stays modest), and the join runs on (key, salt) so a hot
    * key spreads over `saltBuckets` reducers instead of one. Result
    * equals `fact.join(dim, keys)`. AQE's skew-join handles most of
    * this at runtime; the explicit form is for engines/pipelines where
    * AQE is off or the skew is known up front. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      entropyCol: String, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact
      .withColumn("__salt", salt(col(entropyCol), saltBuckets))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact
      .join(replicatedDim, keys :+ "__salt")
      .drop("__salt")
  }
}
