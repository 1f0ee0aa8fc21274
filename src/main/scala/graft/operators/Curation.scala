package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the decision stage of a training-data
  * pipeline, composing the dedup and quality operators into one
  * per-document verdict with FIRST-FAILING-RULE attribution — the
  * funnel report curation teams read to see where the corpus is lost
  * (reference has no equivalent; engine extension alongside Dedup /
  * TextAnalysis, SURVEY §2.12).
  */
object Curation {

  /** Per-doc curation decision. Rules evaluate in priority order and
    * the first failure names the `reason`:
    *
    *  1. `duplicate`   — not the min-id keeper of its exact-content
    *                     group (md5 over normalized text);
    *  2. `too_short`   — fewer than `minTokens` whitespace tokens;
    *  3. `low_quality` — composite quality score (TextAnalysis
    *                     .qualityScore weights) below `minQuality`;
    *  4. `kept`.
    *
    * Scale shape: the dedup leg is ONE groupBy shuffling a 16-byte
    * digest plus a digest-keyed join back; length and quality are pure
    * per-row codegen'd expressions. Nothing here is corpus-quadratic.
    * Returns the input columns plus `n_tokens`, `quality_score`,
    * `reason`. */
  def funnel(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20, minQuality: Double = 0.55): DataFrame = {
    val withDigest = docs.withColumn("__digest",
      md5(Dedup.normalizeText(col(textCol))))
    val keepers = withDigest.groupBy(col("__digest"))
      .agg(min(col(idCol)).as("__keeper"))
    val scored = TextAnalysis.qualityScore(
      withDigest.join(keepers, Seq("__digest")), textCol)
    scored.withColumn("reason",
      when(col(idCol) =!= col("__keeper"), "duplicate")
        .when(col("n_tokens") < minTokens, "too_short")
        .when(col("quality_score") < minQuality, "low_quality")
        .otherwise("kept"))
      .drop("__digest", "__keeper")
  }

  /** The surviving corpus: rows the funnel kept, original columns. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20, minQuality: Double = 0.55): DataFrame =
    funnel(docs, textCol, idCol, minTokens, minQuality)
      .filter(col("reason") === "kept")
      .select(docs.columns.map(col): _*)
}
