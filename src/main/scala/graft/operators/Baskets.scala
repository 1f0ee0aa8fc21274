package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analytics: pairwise support and lift
  * over items grouped into baskets.
  *
  * The pair space is the scale hazard: all-pairs per basket is
  * quadratic in basket width. The operator therefore pairs at a
  * CHOSEN item grain (e.g. brand rather than SKU) after an in-basket
  * distinct, so the per-basket width is bounded by the grain's domain
  * — the same bounded-block discipline as the dedup tier's LSH
  * buckets. Pair counting is one shuffle at (itemA, itemB) grain;
  * marginals are an item-grain aggregate broadcast back onto the
  * pair frame.
  */
object Baskets {

  /** Pairwise lift: for each unordered item pair (a < b), the number
    * of baskets containing both, each alone, and
    * lift = P(a,b) / (P(a)·P(b)) over the basket universe.
    *
    * `df` is exploded (basket, item) rows; duplicates within a basket
    * collapse first so support counts baskets, not rows. Pairs with
    * joint support below `minSupport` are dropped BEFORE the marginal
    * join — the long tail of singleton pairs never reaches a second
    * shuffle. */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val nBaskets = items.select(col("_b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val marginal = items.groupBy(col("_i"))
      .agg(count(lit(1)).as("_n"))
    val pairs = items.select(col("_b"), col("_i").as("item_a"))
      .join(items.select(col("_b"), col("_i").as("item_b")), Seq("_b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(broadcast(marginal.select(col("_i").as("item_a"),
        col("_n").as("n_a"))), Seq("item_a"))
      .join(broadcast(marginal.select(col("_i").as("item_b"),
        col("_n").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_both"), col("n_a"),
        col("n_b"),
        round(col("n_both").cast("double") * col("n_baskets") /
          (col("n_a") * col("n_b")), 4).as("lift"))
  }
}
