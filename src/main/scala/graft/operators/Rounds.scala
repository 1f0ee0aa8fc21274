package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override for the METADATA-PLANE jobs of
  * bounded-round iterative loops (BPE merge training and friends).
  *
  * Why: each round of such a loop runs one tiny action (a top-1 /
  * head-sized collect over vocabulary-grain state). Under AQE every
  * such action becomes materialize-shuffle-stage → replan → final
  * stage — two scheduler round-trips plus a replanning pass — while
  * the data per round is a few thousand rows. The round wall is
  * driver latency, not compute (r17 ProfileQuery: 35–50 % of the BPE
  * queries' wall is driver gap, 33 jobs/query). Disabling AQE for
  * exactly those in-loop actions halves the jobs per round; the
  * surrounding corpus-grain stages (the base vocabulary aggregation
  * before the loop, the final corpus-grain join after it) execute
  * OUTSIDE the scope and keep AQE — the r17 A/B showed global
  * AQE-off badly hurts join-heavy corpus-grain queries, so the
  * toggle must stay scoped. This holds at production scale too: the
  * in-loop state stays vocabulary-grain by construction (bounded by
  * distinct words, not corpus rows), so the fixed-partition shuffle
  * the loop falls back to is bounded the same way.
  *
  * The prior value is captured and RESTORED (set back, or unset only
  * if it was never set) so a session-level override survives the
  * scope — the r17 advisor flagged plain unset as lossy. */
object Rounds {
  def withConf[T](spark: SparkSession, kvs: (String, String)*)
      (body: => T): T = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** AQE off for the scope of `body` — the bounded-round tiny-job
    * case above. */
  def withoutAqe[T](spark: SparkSession)(body: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(body)
}
