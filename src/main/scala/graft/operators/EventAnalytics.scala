package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the event stream table — ordered-sequence
  * funnels and retention cohorts, the two queries every product/events
  * warehouse serves (engine extension alongside the streaming surface
  * in `graft.streaming.EventStream`; the reference has no equivalent).
  *
  * Both operators work on an integer microsecond timestamp column so
  * every derived quantity (week indexes, lags) is exact integer
  * arithmetic — nothing here depends on FP or timezone semantics.
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user, step i counts only if an
    * event of `steps(i)` occurred STRICTLY AFTER that user's step i−1
    * completion (first qualifying occurrence wins — the standard
    * "ordered funnel" semantics, not mere set membership). Returns one
    * row per step: `step` (1-based), `event_type`, `n_users`, and
    * `avg_lag_sec` — the mean seconds from the previous step's
    * completion (null for step 1), computed as an exact integer µs sum
    * over users divided once.
    *
    * Scale shape: each step is one type-pruned scan + a user-keyed
    * min-aggregation + a user-keyed join with the (shrinking) previous
    * step frame — all partial-aggregatable, all keyed by user, no
    * windows over the full event table. Steps are few (a funnel is
    * 3-6 stages), so the chain length is a constant. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", usCol: String = "us",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stage frames: (user, t, t_prev) = first qualifying time of step i
    // and the step-(i−1) completion it beat. Fully declarative — the
    // result is ONE DataFrame (union of per-step one-row aggregates),
    // no driver-side actions; a branch recomputes at most the 5-stage
    // prefix of keyed aggregates above it.
    def stepRow(i: Int, stage: DataFrame): DataFrame =
      stage.agg(count(lit(1)).as("n_users"),
          sum(col("t") - col("t_prev")).as("_lag_us"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as(typeCol),
          col("n_users"),
          round(col("_lag_us").cast("double") /
            (col("n_users") * 1000000.0), 6).as("avg_lag_sec"))
    val frames = stageFrames(events, steps, userCol, usCol, typeCol)
    val first = frames.head.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(steps.head).as(typeCol),
        col("n_users"), lit(null).cast("double").as("avg_lag_sec"))
    val rows = Seq.newBuilder[DataFrame]
    rows += first
    for (i <- 1 until steps.length) rows += stepRow(i, frames(i))
    rows.result().reduce(_ unionAll _)
  }

  /** Per-step (user, t, t_prev) frames shared by [[funnel]] and
    * [[funnelTiming]]: frame 0 is (user, t); frame i ≥ 1 keeps only
    * users whose step-i event strictly follows their step-(i−1)
    * completion. */
  private def stageFrames(events: DataFrame, steps: Seq[String],
      userCol: String, usCol: String,
      typeCol: String): Seq[DataFrame] = {
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(usCol)).as("t"))
    val frames = Seq.newBuilder[DataFrame]
    frames += stage
    for (i <- 1 until steps.length) {
      val prev = stage.select(col(userCol), col("t").as("t_prev"))
      stage = events.filter(col(typeCol) === steps(i))
        .join(prev, Seq(userCol))
        .filter(col(usCol) > col("t_prev"))
        .groupBy(col(userCol))
        .agg(min(col(usCol)).as("t"), min(col("t_prev")).as("t_prev"))
      frames += stage
    }
    frames.result()
  }

  /** Time-to-convert distribution per funnel step: for every step
    * after the first, exact p50/p90 and max of the per-user lag from
    * the previous step's completion, in seconds (6 dp). The funnel
    * says WHERE users stop; this says how long the ones who continue
    * take — the input to timeout/abandonment thresholds.
    *
    * Exact `percentile` (quantile_cont interpolation) keeps the result
    * oracle-portable; at true 100 TB user counts swap the flag for
    * approx_percentile the way corpusStats documents. Scale shape is
    * the funnel's: per-step user-keyed aggregations, each step's
    * percentile computed over one (shrinking) stage frame. */
  def funnelTiming(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", usCol: String = "us",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.length >= 2, "timing needs at least two steps")
    val frames = stageFrames(events, steps, userCol, usCol, typeCol)
    val rows = (1 until steps.length).map { i =>
      frames(i).select((col("t") - col("t_prev")).as("lag_us"))
        .agg(count(lit(1)).as("n_users"),
          percentile(col("lag_us"), lit(0.5)).as("_p50"),
          percentile(col("lag_us"), lit(0.9)).as("_p90"),
          max(col("lag_us")).as("_max"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as(typeCol),
          col("n_users"),
          round(col("_p50") / 1000000.0, 6).as("p50_lag_sec"),
          round(col("_p90") / 1000000.0, 6).as("p90_lag_sec"),
          round(col("_max") / 1000000.0, 6).as("max_lag_sec"))
    }
    rows.reduce(_ unionAll _)
  }

  /** Weekly retention cohorts: users are grouped by the epoch-week of
    * their FIRST event (`cohort_week = min(us) ∕ 7 days`, integer), and
    * each (cohort, week-offset) cell counts the distinct users active
    * that week. Week indexes are integer divisions of the µs timestamp
    * — portable across engines and immune to locale week rules.
    *
    * Scale shape: one user-keyed min-agg for cohorts, a user-keyed join
    * back (users table is the small side at corpus scale — broadcast
    * when it fits), and one (cohort, offset)-keyed count-distinct whose
    * partial aggregation does the heavy lifting. */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      usCol: String = "us"): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val withWeek = events.select(col(userCol),
      floor(col(usCol) / weekUs).as("week"))
    val cohorts = withWeek.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    withWeek.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Inter-arrival bot heuristic: per user, the gap statistics that
    * separate organic traffic from scripted clients — event count,
    * median gap, fraction of sub-`fastUs` gaps, and the verdict
    * (`is_bot` = at least `minEvents` events AND median gap under
    * `fastUs`). The standard first-pass abuse filter an events
    * warehouse runs before sessionized metrics are trusted.
    *
    * Gaps are exact integer µs via one user-keyed lag window (ties on
    * identical timestamps break by the event id, so the ordering is
    * total and engine-portable); the median is `percentile` over each
    * user's own gaps — row grain, but partitioned BY USER: the window
    * and the aggregation both shuffle on the user key, never a global
    * sort. The median stays in µs: the interpolated value is a
    * MIDPOINT OF INTEGERS (exact in double on any engine) — dividing
    * to seconds first would put it on a rounding boundary where engine
    * FP paths differ by an ulp. Single-event users have no gaps and
    * are never bots. */
  def botScore(events: DataFrame, userCol: String = "user_id",
      usCol: String = "us", idCol: String = "event_id",
      minEvents: Long = 20L, fastUs: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(usCol), col(idCol))
    events
      .withColumn("_gap", col(usCol) - lag(col(usCol), 1).over(w))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        percentile(col("_gap"), lit(0.5)).as("median_gap_us"),
        // over GAPS, not events: the first event has no gap and stays
        // out of both numerator and denominator (avg skips nulls)
        round(avg(when(col("_gap").isNotNull,
          when(col("_gap") < fastUs, 1.0).otherwise(0.0))), 6)
          .as("fast_frac"))
      .withColumn("is_bot",
        col("n_events") >= minEvents &&
          col("median_gap_us") < fastUs.toDouble)
  }

  /** SCD2-style validity intervals from a change log: treat each row
    * as the observed state of `keyCol` at `tsCol`, COLLAPSE runs of
    * identical consecutive states (a re-crawl that observed no change
    * is not a new version), and emit one row per surviving change with
    * its half-open validity window — `valid_to` = next change's
    * timestamp, null while current. The standard "latest-known state
    * as of T" materialization every warehouse keeps for dimensions.
    *
    * Scale shape: two key-partitioned windows (dedup-lag + lead) over
    * the SAME (key, time) ordering — one shuffle, sorts amortized
    * across both. Ties at identical timestamps break by `idCol` so
    * the ordering is total; state comparison is null-safe. */
  def validityIntervals(changes: DataFrame, keyCol: String,
      tsCol: String, idCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val collapsed = changes
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      // the first observation is kept EXPLICITLY: when its state is
      // null, `null <=> lag(...)=null` is true and a bare
      // change-predicate would drop the key's first interval entirely
      .filter(col("_rn") === 1 || !(col(stateCol) <=> col("_prev")))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"))
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("state"))
    collapsed.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
  }

  /** First-touch / last-touch conversion attribution: each conversion
    * event's value is credited to the user's earliest (first-touch)
    * and most recent (last-touch) non-conversion event type before it.
    *
    * One user-keyed window carries both models — `first`/`last` with
    * ignoreNulls over a mask that hides conversions — so there is no
    * per-conversion lookback join; the scan stays a single
    * user-partitioned sort at any scale. Conversions with no prior
    * touch attribute to null (absence, not a fabricated channel).
    *
    * Returns (model, touch_type, n_conversions, revenue). */
  def conversionAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, valueCol: String,
      conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol) =!= conversionType, col(typeCol))
    val tagged = events
      .withColumn("_first", first(touch, ignoreNulls = true).over(w))
      .withColumn("_last", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
    def side(model: String, c: Column): DataFrame =
      tagged.groupBy(c.as("touch_type"))
        .agg(count(lit(1)).as("n_conversions"),
          round(sum(col(valueCol)), 4).as("revenue"))
        .select(lit(model).as("model"), col("touch_type"),
          col("n_conversions"), col("revenue"))
    side("first", col("_first")).unionByName(side("last", col("_last")))
  }

  /** Event-type transition matrix (the Markov/path-analysis view of a
    * clickstream): per (from, to) adjacent-pair counts and the
    * row-normalized transition probability. One user-keyed lag window,
    * pair-grain aggregation; the from-marginal re-joins by broadcast
    * (type-domain-sized). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_from", lag(col(typeCol), 1).over(w))
      .filter(col("_from").isNotNull)
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val marg = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(marg), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("_tot"), 6).as("p"))
  }

  /** Consecutive-day activity streaks (the gaps-and-islands shape):
    * distinct active days per user collapse to runs of consecutive
    * dates via the rank-offset island key (day − row_number is
    * constant exactly along a consecutive run), then per user: streak
    * count, longest streak, total active days. Two user-keyed
    * operations sharing one shuffle partitioning — distinct days,
    * window, island aggregate, user aggregate. */
  def activityStreaks(events: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(dayCol))
    val islands = events.select(col(userCol), col(dayCol)).distinct()
      .withColumn("_grp", date_sub(col(dayCol), row_number().over(w)))
      .groupBy(col(userCol), col("_grp"))
      .agg(count(lit(1)).as("_len"))
    islands.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("_len")).as("longest_streak"),
        sum(col("_len")).as("active_days"))
  }

  /** Pairwise A/B conversion lift with a two-proportion z statistic:
    * per ordered variant pair, unit counts, conversion rates, absolute
    * lift, and z under the pooled-proportion null — the closed-form
    * experiment readout (a |z| ≳ 1.96 pair moved at the 5% level).
    * The per-variant aggregate is unit-grain (one shuffle); the pair
    * frame is variants², metadata joined driver-free via a broadcast
    * self-cross. The z expression's parenthesization is pinned so an
    * external engine reproduces every digit. */
  def abLift(units: DataFrame, variantCol: String,
      convertedCol: String): DataFrame = {
    val g = units.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convertedCol), 1L).otherwise(0L)).as("conv"))
    val a = g.select(col("variant").as("variant_a"), col("n").as("na"),
      col("conv").as("ca"))
    val b = g.select(col("variant").as("variant_b"), col("n").as("nb"),
      col("conv").as("cb"))
    val pa = col("ca") / col("na").cast("double")
    val pb = col("cb") / col("nb").cast("double")
    val pool = (col("ca") + col("cb")) / (col("na") + col("nb"))
      .cast("double")
    a.crossJoin(broadcast(b))
      .filter(col("variant_a") < col("variant_b"))
      .select(col("variant_a"), col("variant_b"),
        col("na"), col("ca"), col("nb"), col("cb"),
        round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
        round(pa - pb, 6).as("lift"),
        round((pa - pb) /
          sqrt(pool * (lit(1.0) - pool) *
            (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4).as("z"))
  }
}
