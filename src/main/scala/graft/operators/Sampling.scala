package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Fine hash bucket in [0, 10000) — basis-point resolution for
    * stratified rates like 3.75%. */
  def bpBucket(id: Column): Column =
    pmod(GF.hash32(id.cast("string")), lit(10000))

  /** Exact-k deterministic sample per group — the bottom-k-by-
    * hash-priority form (the rate-gated [[withStratifiedFlag]] keeps a
    * FRACTION; this keeps exactly `min(k, |group|)` rows): rank rows by
    * (hash32(id), id) inside each group and keep the k smallest. A
    * uniform-without-replacement draw that any engine replays — and,
    * because the priority is a pure function of the id, the sample is
    * STABLE UNDER GROWTH in the bottom-k sense (a new row displaces at
    * most one old member, the classic bottom-k sketch property).
    * rank <= k prunes as WindowGroupLimit: partial top-k heaps run
    * map-side, the shuffle carries at most k rows per (partition,
    * group). */
  def bottomK(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(GF.hash32(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Stratified deterministic sampling — the training-mixture
    * constructor: each stratum (language, source, quality band …) keeps
    * its own fraction of rows, hash-gated per id so the sample is
    * stable across runs and engines. Rates are per-stratum fractions in
    * [0, 1]; strata absent from the map fall back to `defaultRate`.
    *
    * The rate table rides a broadcast join (a dozen strata, never a
    * shuffle of the fact side); the gate itself is one codegen'd
    * comparison per row. Adds boolean `sampled`; `stratifiedSample`
    * filters to the kept rows. */
  def withStratifiedFlag(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be fractions in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => (s, math.round(r * 10000).toInt) }
      .toDF(strataCol, "_thr_bp")
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("_thr_bp", coalesce(col("_thr_bp"),
        lit(math.round(defaultRate * 10000).toInt)))
      .withColumn("sampled", bpBucket(col(idCol)) < col("_thr_bp"))
      .drop("_thr_bp")
  }

  /** The kept rows of [[withStratifiedFlag]]. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    withStratifiedFlag(df, strataCol, idCol, rates, defaultRate)
      .filter(col("sampled")).drop("sampled")

  /** Mixture rebalancing — the "hit these target domain/language shares"
    * constructor of a training corpus. Given target shares per stratum
    * (fractions summing to <= 1), the operator computes the LARGEST
    * corpus achievable by downsampling only (no stratum can be
    * upsampled): the binding stratum is the one with the smallest
    * `count / share`, every stratum's keep-rate is
    * `share * scale / count` (capped at 1) with
    * `scale = min_s(count_s / share_s)`, and rows are kept by the same
    * deterministic basis-point hash gate as [[withStratifiedFlag]] —
    * stable across runs, engines and cluster sizes.
    *
    * Scale shape: one partial-agg count per stratum (tiny result), a
    * one-row global min broadcast back onto the rate table, and a
    * broadcast join of the dozen-row rate table onto the corpus — the
    * fact side never shuffles. Returns the input plus `rate_bp` (the
    * per-stratum keep threshold in basis points) and boolean `sampled`.
    * Strata absent from `targetShares` get rate 0 (dropped). */
  def mixtureRebalance(df: DataFrame, strataCol: String, idCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.values.forall(s => s > 0 && s <= 1),
      "target shares must be fractions in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val shareDf = targetShares.toSeq.sortBy(_._1).toDF(strataCol, "_share")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .join(broadcast(shareDf), Seq(strataCol), "inner")
    val scale = counts.agg(
      min(col("_n").cast("double") / col("_share")).as("_scale"))
    val rates = counts.crossJoin(broadcast(scale))
      .withColumn("rate_bp",
        floor(least(col("_share") * col("_scale") / col("_n"), lit(1.0))
          * 10000).cast("long"))
      .select(col(strataCol), col("rate_bp"))
    df.join(broadcast(rates), Seq(strataCol), "left")
      .withColumn("rate_bp", coalesce(col("rate_bp"), lit(0L)))
      .withColumn("sampled", bpBucket(col(idCol)) < col("rate_bp"))
  }

  /** Salted shuffle key for training-data ordering: the portable hash
    * of (epoch, id). Exposed so callers can co-sort side tables. */
  def shuffleKey(id: Column, epoch: Int): Column =
    GF.hash32(concat(lit(s"sh${epoch}_"), id.cast("string")))

  /** Weighted top-k sampling without replacement, per stratum —
    * Efraimidis–Spirakis A-ES with a DETERMINISTIC uniform: each row
    * draws u = (hash32(id) + 0.5) / 2^32 ∈ (0,1) and priority
    * ln(u)/w (the log of u^(1/w); maximizing it draws row i with
    * probability proportional to w_i, the classic weighted-reservoir
    * key); the k highest-priority rows per stratum win. Hash-derived u
    * makes the "random" draw replayable on any engine, cluster size,
    * or retry — the property every other sampler in this file holds.
    * Priorities round to 9 dp with an id tiebreak so cross-engine
    * libm ulp drift cannot flip a rank.
    *
    * Scale shape: priority is one codegen'd projection; the
    * per-stratum rank plans as WindowGroupLimit, so every map task
    * pre-prunes to its local top-k before the tiny final sort — the
    * shuffle carries ≈ strata × k rows, not the corpus. */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (GF.hash32(col(idCol).cast("string")) + lit(0.5)) /
      lit(4294967296.0)
    val pri = round(log(u) / col(weightCol).cast("double"), 9)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("priority").desc, col(idCol))
    // non-positive weights have no A-ES priority (ln(u)/w flips sign
    // or divides by zero) — excluded, matching "weight ∝ inclusion
    // probability" semantics where w <= 0 means never sampled
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("priority", pri)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic corpus shuffle — the training-order randomizer.
    * rand()-based shuffles are neither stable nor replay-safe (a
    * retried partition re-rolls its values); ordering by a salted
    * portable hash gives the same permutation on any engine, cluster
    * size, or partition count, and each `epoch` is an independent
    * permutation. At scale this is one range-partitioned total sort —
    * Spark samples the key distribution to build balanced ranges, and
    * hash values are uniform by construction so the sort never skews.
    * The emitted `shuffle_key` column lets downstream stages (or an
    * external engine) verify or resume the exact order. */
  def deterministicShuffle(docs: DataFrame, idCol: String,
      epoch: Int): DataFrame =
    docs.withColumn("shuffle_key", shuffleKey(col(idCol), epoch))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Temperature-scaled mixture allocation — the standard multilingual
    * /multi-source rebalancing rule (weight ∝ countᵅ, α < 1 up-weights
    * small sources) turned into an EXACT integer token budget per
    * group via largest-remainder apportionment: floor every ideal
    * share, then hand the leftover units to the largest fractional
    * remainders (group-name tiebreak). Allocations always sum to
    * `budget` exactly.
    *
    * Determinism discipline: group counts partial-aggregate to one row
    * per group (metadata scale); the weight denominator folds in
    * group-sorted order so the IEEE sum has exactly one order on any
    * engine; α = 0.5 routes through `sqrt` — correctly rounded by
    * IEEE 754, unlike `pow`, so an external oracle reproduces every
    * double bit-for-bit and the floor/remainder ranking can never
    * diverge at a boundary. The leftover count is a sum of LONGS
    * (order-free). Returns (group, n_docs, weight, alloc). */
  def temperatureAllocation(df: DataFrame, grpCol: String,
      budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val counts = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_raw",
        if (alpha == 0.5) sqrt(col("n_docs"))
        else pow(col("n_docs"), alpha))
    val tot = counts
      .agg(sort_array(collect_list(struct(col(grpCol), col("w_raw"))))
        .as("arr"))
      .select(aggregate(col("arr"), lit(0.0d),
        (acc, x) => acc + x.getField("w_raw")).as("tot"))
    val ideal = counts.crossJoin(broadcast(tot))
      .withColumn("weight", col("w_raw") / col("tot"))
      .withColumn("base", floor(lit(budget) * col("weight")).cast("long"))
      .withColumn("rem", lit(budget) * col("weight") - col("base"))
    val leftover = ideal.agg(
      (lit(budget) - sum(col("base"))).as("leftover"))
    val rankW = Window.orderBy(col("rem").desc, col(grpCol))
    ideal.crossJoin(broadcast(leftover))
      .withColumn("_rk", row_number().over(rankW))
      .select(col(grpCol), col("n_docs"),
        round(col("weight"), 6).as("weight"),
        (col("base") + when(col("_rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
  }

  /** Token-budget curriculum phases: order the corpus by `scoreCol`
    * DESC (ties by id), walk it accumulating `tokensCol`, and assign
    * each document phase = floor(tokens-before-it / phaseBudget) — the
    * curriculum/annealing data schedule ("highest-quality docs fill
    * phase 0, train on phases in order"; quality-ordered multi-epoch
    * schedules in LLM data curation).
    *
    * The naive plan is a global-ORDER-BY running sum — a single-
    * partition window that serializes the corpus through one task. This
    * runs the scalable two-pass split instead:
    *  1. coarse-bin the score (`floor(score · scoreBins)`), aggregate
    *     token mass per bin — bins are metadata-scale (<= scoreBins+1
    *     rows), so the running offset over bins is a trivially cheap
    *     window on a tiny frame, then broadcast back;
    *  2. the exact running sum runs per-bin: a window PARTITIONED by
    *     bin, ordered (score desc, id) — parallel across bins, which is
    *     exactly how a range-partitioned global sort would lay the data
    *     out anyway.
    * Docs in bin b before-count = (mass of all finer/higher bins) +
    * (running sum within b), which equals the global running sum
    * because binning is order-consistent with the sort key.
    *
    * Caveat the binning inherits from range partitioning: a single
    * score value holding >> 1/scoreBins of total tokens makes one bin
    * big; its window still parallelizes nothing within the bin. That is
    * a data-skew property (same fix as any sort skew: finer bins or a
    * secondary split key). */
  def curriculumPhases(docs: DataFrame, scoreCol: String,
      tokensCol: String, idCol: String, phaseBudget: Long,
      scoreBins: Int = 1000): DataFrame = {
    require(phaseBudget > 0, "phaseBudget must be positive")
    val binned = docs.withColumn("_bin",
      floor(col(scoreCol).cast("double") * scoreBins).cast("long"))
    val binMass = binned.groupBy(col("_bin"))
      .agg(sum(col(tokensCol).cast("long")).as("_mass"))
    // running offset over DESC-ordered bins; single-partition window on
    // a metadata-scale frame (scoreBins rows), then broadcast
    val wBins = Window.orderBy(col("_bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = binMass
      .withColumn("_off", coalesce(sum(col("_mass")).over(wBins), lit(0L)))
      .select(col("_bin"), col("_off"))
    val wIn = Window.partitionBy(col("_bin"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    binned.join(broadcast(offsets), Seq("_bin"))
      .withColumn("_before",
        col("_off") + coalesce(sum(col(tokensCol).cast("long")).over(wIn),
          lit(0L)))
      // integer `div`, not double `/`: token totals at 100 TB exceed
      // the 2^53 double mantissa and floor(double) would misassign
      .withColumn("phase", expr(s"_before div ${phaseBudget}L"))
      .drop("_bin", "_off", "_before")
  }

  /** Leakage-safe train/val/test split — the split a dedup-aware
    * pipeline must use: near-duplicate documents landing in different
    * splits leak training text into validation, so the hash-space
    * assignment keys off the DUPLICATE-CLUSTER id (the min member id
    * from [[Dedup.duplicateClusters]]) instead of the document id.
    * Every member of a cluster shares one split by construction;
    * singletons (absent from `labels`) fall back to their own id,
    * which IS their cluster id under the min-member convention.
    *
    * Scale shape: `labels` is pair-derived, so it only carries docs
    * that collided in LSH — typically a small fraction of the corpus;
    * the left join shuffles on the id key (sort-merge at crawl scale,
    * broadcast when the duplicate fraction is small enough). The split
    * itself stays the one codegen'd hash comparison every other
    * sampler in this file uses. */
  def clusterSplit(df: DataFrame, idCol: String, labels: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      splitCol: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val l = labels.select(col("id").as(idCol), col("cluster"))
    val b = pctBucket(col("split_key"))
    df.join(l, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
      .withColumn(splitCol,
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("cluster")
  }

  /** Water-filling token-budget allocation — "give source i tokens
    * ∝ weight wᵢ, but never more than maxEpochs passes over what it
    * has": aᵢ = min(capᵢ, t·wᵢ) with the water level t chosen so
    * Σaᵢ = budget (all-capped when the budget exceeds Σcap). This is
    * the allocator behind mixture specs with repeat-factor ceilings —
    * a temperature/target weight vector meets finite source sizes and
    * the surplus from capped sources redistributes to the rest.
    *
    * The level has the classic closed form: sort sources by
    * rᵢ = capᵢ/wᵢ ascending; with the first i−1 sources capped the
    * candidate level is tᵢ = (budget − Σ_{j<i} capⱼ)/(W − Σ_{j<i} wⱼ),
    * and the true level is tᵢ at the FIRST i with rᵢ ≥ tᵢ (each
    * earlier prefix is infeasible; t strictly grows past each capped
    * source). That is two prefix sums and a first_value over the
    * source-grain aggregate — metadata scale (one row per source), so
    * the single-partition window is free; only the per-source mass
    * aggregation touches the corpus. All prefix sums are over LONGS
    * (exact, order-free); doubles appear only in the final division,
    * identical one-op IEEE on any engine.
    *
    * `masses` is source-grain: (grpCol, availCol tokens available,
    * weightCol integer milliweight). Returns per source: available,
    * cap, weight_mw, allocated = min(cap, floor(t·w)), epochs. */
  def budgetAllocation(masses: DataFrame, grpCol: String,
      availCol: String, weightCol: String, budget: Long,
      maxEpochs: Int): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val base = masses.select(col(grpCol),
        col(availCol).cast("long").as("available"),
        col(weightCol).cast("long").as("weight_mw"))
      .withColumn("cap", col("available") * maxEpochs)
      .withColumn("_r", col("cap") / col("weight_mw"))
    // source-grain frame: the orderBy window is single-partition by
    // design and tiny by construction (one row per source)
    val ord = Window.orderBy(col("_r"), col(grpCol))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val leveled = base
      .withColumn("_capPre", coalesce(sum(col("cap")).over(pre), lit(0L)))
      .withColumn("_wPre",
        coalesce(sum(col("weight_mw")).over(pre), lit(0L)))
      .withColumn("_wTot", sum(col("weight_mw")).over(all))
      .withColumn("_t",
        (lit(budget) - col("_capPre")) / (col("_wTot") - col("_wPre")))
      .withColumn("_tStar", first(
        when(col("_r") >= col("_t"), col("_t")), ignoreNulls = true)
        .over(all))
    leveled
      // no feasible level -> budget >= sum(cap): everyone runs capped
      .withColumn("allocated",
        when(col("_tStar").isNull, col("cap"))
          .otherwise(least(col("cap"),
            floor(col("_tStar") * col("weight_mw")).cast("long"))))
      .withColumn("epochs",
        round(col("allocated") / col("available"), 6))
      .select(col(grpCol), col("available"), col("cap"),
        col("weight_mw"), col("allocated"), col("epochs"))
  }
}
