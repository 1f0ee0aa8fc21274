package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Relational data profiling — the first thing a pipeline runs against
  * an unknown 100 TB table (engine extension; the reference's
  * validation plane checks declared expectations, a profile DISCOVERS
  * them).
  *
  * ONE aggregation job for every requested column: all metrics are agg
  * expressions over a single scan, unpivoted to long form afterwards
  * (the explode runs on the one-row result — no second pass, no
  * per-column scans). Exact `countDistinct` keeps oracle parity and is
  * the default; `approx = true` swaps in HLL `approx_count_distinct`
  * for the 100 TB path, where N exact distincts would expand the scan
  * N-fold (Spark's multi-distinct Expand).
  */
object Profiling {

  /** Profile `cols` of `df`: one row per column with
    * `(column, n_rows, n_null, n_distinct, min_value, max_value,
    * mean_value)`. min/max are rendered as strings so every column
    * type fits one schema; mean is null for non-numeric columns. */
  def profile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"nn_$c"),
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"),
        (if (isNum) round(avg(col(c).cast("double")), 4)
         else lit(null).cast("double")).as(s"av_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("column"),
      col("n_rows"),
      (col("n_rows") - col(s"nn_$c")).as("n_null"),
      col(s"nd_$c").cast("long").as("n_distinct"),
      col(s"mn_$c").as("min_value"),
      col(s"mx_$c").as("max_value"),
      col(s"av_$c").as("mean_value")))
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
