package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Key-skew diagnostic: the one-row report that says whether a key
    * is safe to shuffle on BEFORE a job burns a cluster on it.
    * Emits (n_keys, n_rows, max_share, top10_share, gini) over the
    * key's row-count distribution.
    *
    * Gini comes from the exact integer identity
    * G = (2·Σᵢ i·cᵢ − (n+1)·Σᵢ cᵢ) / (n·Σᵢ cᵢ) with counts ranked
    * ascending — Σ i·cᵢ is invariant under tie order, so the value is
    * deterministic however ranks break ties. Everything is integer
    * until the final division; the key-count frame is key-grain
    * (small), the only data-scale stage is the first count. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    // key-grain counts collapse immediately to COUNT-grain (c, m) =
    // (row count, how many keys have it): every window below runs over
    // that tiny frame, never over the keys — Σ i·cᵢ for consecutive
    // ranks offset+1..offset+m with equal c is c·(m·offset + m(m+1)/2)
    val grouped = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
    val wAsc = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    grouped
      .withColumn("_off", coalesce(sum(col("m")).over(wAsc), lit(0L)))
      .withColumn("_cumtop", coalesce(sum(col("m")).over(wDesc), lit(0L)))
      .withColumn("_ic",
        col("c") * (col("m") * col("_off") +
          shiftright(col("m") * (col("m") + 1), 1)))
      .withColumn("_top10c",
        col("c") * greatest(lit(0L),
          least(col("m"), lit(10L) - col("_cumtop"))))
      .agg(sum(col("m")).as("n_keys"),
        sum(col("c") * col("m")).as("n_rows"),
        max(col("c")).as("_maxc"),
        sum(col("_top10c")).as("_top10"),
        sum(col("_ic")).as("_ic"))
      .select(col("n_keys"), col("n_rows"),
        round(col("_maxc") / col("n_rows"), 6).as("max_share"),
        round(col("_top10") / col("n_rows"), 6).as("top10_share"),
        round((lit(2L) * col("_ic") - (col("n_keys") + 1) * col("n_rows"))
          / (col("n_keys") * col("n_rows")), 6).as("gini"))
  }
}
