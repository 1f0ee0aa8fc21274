package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GF

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both operators key off the portable 32-bit hash (GF.hash32) of the
  * document id, so assignments are stable across runs, engines and
  * cluster sizes — the property a 100 TB pipeline needs so that
  * re-running a stage never shuffles examples between train and
  * validation. Pure per-row expression work: zero shuffles, fully
  * codegen'd.
  */
object Sampling {

  /** Hash bucket in [0, 100) for an id column. */
  def pctBucket(id: Column): Column =
    pmod(GF.hash32(id.cast("string")), lit(100))

  /** Deterministic train/validation/test split: `trainPct`% of hash
    * space to train, next `valPct`% to validation, rest to test. */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, splitCol: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = pctBucket(col(idCol))
    df.withColumn(splitCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic ~`pct`% sample (hash-gated filter — the scalable
    * substitute for rand()-based sampling, which is neither stable nor
    * replay-safe). */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(pctBucket(col(idCol)) < pct)
}
