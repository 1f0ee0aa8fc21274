package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GF

/** Portable cardinality sketches. Spark's own HLL
  * (`approx_count_distinct`) is correct but engine-specific — no
  * external oracle can reproduce its estimates. The KMV
  * (k-minimum-values) sketch over the portable 32-bit hash IS
  * reproducible: any engine with the same hash derives the same k-th
  * minimum and therefore the same estimate (Bar-Yossef et al. 2002,
  * public).
  */
object Sketches {

  /** KMV distinct-count estimate per group: with the k-th smallest of
    * the DISTINCT hash values m_k over a hash space of size 2^32, the
    * estimator is (k-1) · 2^32 / m_k; groups with fewer than k distinct
    * values report their exact count. One distinct + one window over
    * group-local hashes (WindowGroupLimit prunes to the k smallest per
    * group before the final aggregate — never materializes the full
    * rank). */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val hashed = df
      .select(col(groupCol), GF.hash32(col(valueCol).cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_min"))
      .select(col(groupCol),
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(round((lit(k) - 1) * lit(4294967296.0) / col("kth_min"), 2))
          .as("approx_distinct"),
        col("n_seen").cast("long").as("n_seen"))
  }
}
