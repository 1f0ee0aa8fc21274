package graft.operators

import graft.GraftCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Population Stability Index between a reference and a current
    * population of a numeric column, per group — the standard
    * "did my corpus drift between epochs" monitor a 100 TB pipeline
    * runs before retraining (PSI < 0.1 stable, > 0.25 shifted;
    * standard credit-scoring practice, public).
    *
    * Binning is equal-width over the REFERENCE group's [min, max]
    * (floor((x−min)/width), clamped to [0, bins−1]) — pure arithmetic
    * on both engines, so bin assignment is bit-identical and the whole
    * statistic is oracle-portable. Empty bins smooth to share 1e−6
    * before the log (the conventional PSI guard against ln 0).
    *
    * Scale shape: per-group min/max is one metadata-scale aggregation
    * broadcast back; binning is a codegen'd projection; the bin counts
    * are ONE partially-aggregated groupBy per side ((group, bin) grain
    * — rows = groups × bins, metadata scale); the PSI fold runs over
    * that tiny frame. Neither population shuffles more than its bin
    * counts. */
  /** Per-group [min, max] of `valCol` — the bin edges every PSI
    * population is binned against. One metadata-scale aggregation. */
  def rangeEdges(ref: DataFrame, valCol: String,
      groupCol: String): DataFrame =
    ref.groupBy(col(groupCol))
      .agg(min(col(valCol).cast("double")).as("lo"),
        max(col(valCol).cast("double")).as("hi"))

  /** Equal-width bin counts of `df` against broadcast `edges`
    * (groupCol, lo, hi): floor((x−lo)/width) clamped to [0, bins−1].
    * Only bins with rows appear — (group, bin) grain output. Shared by
    * batch [[psiDrift]] and the streaming guard's reference histogram
    * so both sides bin bit-identically. */
  def histogram(df: DataFrame, valCol: String, groupCol: String,
      edges: DataFrame, bins: Int, cntName: String = "n"): DataFrame = {
    val v = col(valCol).cast("double")
    df.join(broadcast(edges.select(col(groupCol), col("lo"), col("hi"))),
        Seq(groupCol))
      .withColumn("bin",
        // degenerate width (constant reference column) pins bin 0 —
        // avoids NaN/Inf division whose clamping is engine-specific
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(greatest(
            floor((v - col("lo")) / ((col("hi") - col("lo")) / bins)),
            lit(0L)), lit(bins - 1L))).cast("long"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as(cntName))
  }

  def psiDrift(ref: DataFrame, cur: DataFrame, valCol: String,
      groupCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val edges = rangeEdges(ref, valCol, groupCol)
    // align the two histograms by union + re-aggregate, not a
    // full-outer join: full-outer can't broadcast (it would sort-merge
    // even at (group, bin) grain) while the union's second aggregation
    // combines map-side into the same tiny frame
    val joined = histogram(ref, valCol, groupCol, edges, bins, "n_ref")
        .withColumn("n_cur", lit(0L))
      .unionByName(histogram(cur, valCol, groupCol, edges, bins, "n_cur")
        .withColumn("n_ref", lit(0L)))
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .select(col(groupCol), col("n_ref"), col("n_cur"))
    val totals = joined.groupBy(col(groupCol))
      .agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val scored = joined.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol),
        greatest(col("n_ref") / col("t_ref"), lit(1e-6)).as("p_ref"),
        greatest(col("n_cur") / col("t_cur"), lit(1e-6)).as("p_cur"))
      .groupBy(col(groupCol))
      .agg(round(sum((col("p_cur") - col("p_ref"))
          * log(col("p_cur") / col("p_ref"))), 6).as("psi"),
        count(lit(1)).cast("long").as("n_bins_present"))
    // A group present only in cur — a brand-new language/source, exactly
    // the drift this monitor exists to flag — has no reference edges and
    // would vanish from the inner-joined histograms. Surface it with a
    // sentinel row (psi = null, n_bins_present = 0) instead of dropping
    // it. Metadata-scale: one distinct per side, anti-joined.
    val curOnly = cur.select(col(groupCol)).distinct()
      .join(edges.select(col(groupCol)), Seq(groupCol), "left_anti")
      .select(col(groupCol),
        lit(null).cast("double").as("psi"),
        lit(0L).as("n_bins_present"))
    scored.unionByName(curOnly)
  }

  /** Per-group equal-width histogram as a REPORT (the binning
    * [[psiDrift]] uses internally, exposed with explicit bin edges) —
    * the distribution snapshot dashboards render. Edges derive from
    * each group's own [min, max]; empty bins are absent (the report is
    * (group, bin)-grain, metadata scale).
    *
    * Scale shape: identical to psiDrift's histogram — one
    * metadata-scale edges aggregation broadcast back, one
    * partially-aggregated (group, bin) count. */
  def histogramReport(df: DataFrame, valCol: String, groupCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val edges = rangeEdges(df, valCol, groupCol)
    histogram(df, valCol, groupCol, edges, bins)
      .join(broadcast(edges), Seq(groupCol))
      .select(col(groupCol), col("bin"),
        round(col("lo") + col("bin") * ((col("hi") - col("lo")) / bins), 6)
          .as("lo_edge"),
        round(col("lo") + (col("bin") + 1) *
          ((col("hi") - col("lo")) / bins), 6).as("hi_edge"),
        col("n"))
  }

  /** KL divergence of each group's realized source mix from declared
    * target shares — "how far is my corpus from the mixture the
    * training recipe asked for", in nats; the acceptance check run
    * after mixtureRebalance. Sources missing a target get share 1e−6
    * (the same smoothing convention as PSI) so an unplanned source
    * shows up as a large, finite penalty rather than ∞.
    *
    * Scale shape: one (group, source) partial-agg count; the KL fold
    * runs over that metadata-scale frame with the target map compiled
    * into the projection. */
  def mixKlDivergence(df: DataFrame, groupCol: String, srcCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    val target = targetShares.foldLeft(lit(1e-6)) {
      case (acc, (s, q)) => when(col(srcCol) === s, lit(q)).otherwise(acc)
    }
    df.groupBy(col(groupCol), col(srcCol))
      .agg(count(lit(1)).as("n_src"))
      .withColumn("q", target)
      .groupBy(col(groupCol))
      .agg(sum(col("n_src")).as("n_rows"),
        sum(col("n_src") * log(col("n_src"))).as("_nlogn"),
        sum(col("n_src") * log(col("q"))).as("_nlogq"))
      .select(col(groupCol), col("n_rows"),
        // KL = Σ p ln(p/q) = (Σ n ln n − Σ n ln q)/N − ln N
        round((col("_nlogn") - col("_nlogq")) / col("n_rows") -
          log(col("n_rows")), 6).as("kl_nats"))
  }

  /** Schema-drift report between two snapshots of the same table: the
    * per-column profile of each side joined and flagged. Catches the
    * three upstream breakages that silently poison a pipeline —
    * `null_spike` (null rate rose more than `nullSpike` absolute),
    * `distinct_drop` (cardinality collapsed below `distinctDropRatio`
    * of the reference — a constant-fill or truncated-join symptom),
    * and `mean_shift` (numeric mean moved more than `meanShiftRel`
    * relative). All comparisons run on the profile's rounded outputs —
    * identical arithmetic on identical inputs, so the booleans are
    * engine-portable.
    *
    * Scale shape: two one-pass profiles (one agg job per side) joined
    * at column-name grain — metadata scale. */
  def profileDiff(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      nullSpike: Double = 0.05, distinctDropRatio: Double = 0.5,
      meanShiftRel: Double = 0.1): DataFrame = {
    def side(df: DataFrame, sfx: String): DataFrame =
      profile(df, cols).select(col("column"),
        round(col("n_null") / col("n_rows"), 6).as(s"null_rate_$sfx"),
        col("n_distinct").as(s"n_distinct_$sfx"),
        col("mean_value").as(s"mean_$sfx"))
    side(ref, "ref").join(side(cur, "cur"), Seq("column"))
      .select(col("column"),
        col("null_rate_ref"), col("null_rate_cur"),
        col("n_distinct_ref"), col("n_distinct_cur"),
        col("mean_ref"), col("mean_cur"),
        (col("null_rate_cur") - col("null_rate_ref") > nullSpike)
          .as("null_spike"),
        (col("n_distinct_cur") < lit(distinctDropRatio) * col("n_distinct_ref"))
          .as("distinct_drop"),
        when(col("mean_ref").isNull || col("mean_cur").isNull, lit(false))
          .otherwise(abs(col("mean_cur") - col("mean_ref")) >
            lit(meanShiftRel) * abs(col("mean_ref"))).as("mean_shift"))
      .orderBy(col("column"))
  }

  /** Source concentration per group: Herfindahl–Hirschman index
    * (Σ share²) of the source mix plus the top source's share — the
    * "is my German data all one domain" monitor; HHI → 1 means a
    * single source dominates and the group's diversity is an illusion.
    * Exact from integer counts; the only floating point is the final
    * share arithmetic, rounded 6 dp.
    *
    * Scale shape: one (group, source) partial-agg count, then one
    * group-grain re-aggregation over that metadata-scale frame. */
  def sourceConcentration(df: DataFrame, groupCol: String,
      srcCol: String): DataFrame = {
    df.groupBy(col(groupCol), col(srcCol))
      .agg(count(lit(1)).as("n_src"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("n_src")).as("n_rows"),
        max(col("n_src")).as("_top"),
        sum(col("n_src") * col("n_src")).as("_sq"))
      .select(col(groupCol), col("n_sources"), col("n_rows"),
        round(col("_top").cast("double") / col("n_rows"), 6)
          .as("top_share"),
        round(col("_sq").cast("double") / (col("n_rows") * col("n_rows")),
          6).as("hhi"))
  }

  /** Per-dimension statistics of an embedding column — the QA pass
    * that catches collapsed dimensions (std ≈ 0), dead dimensions
    * (mean ≈ min ≈ max) and scale blow-ups before a corpus of vectors
    * is trusted for ANN or training. One row per dimension:
    * (dim, n, mean, std, min_v, max_v).
    *
    * Scale shape: posexplode multiplies rows × dims, but the groupBy
    * aggregates PARTIALLY before its shuffle — each map task reduces
    * its slice to one row per dimension, so the exchange carries
    * partitions × dims rows regardless of corpus size. Dimension count
    * is the vector width (tens to thousands): the result is metadata
    * scale. */
  def embeddingDimStats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mean"),
        round(stddev(col("v")), 6).as("std"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  /** Embedding-integrity audit at VECTOR grain — the admission check a
    * 100 TB embedding store runs per ingest batch before any vector
    * reaches an ANN index: dimension consistency (a resized encoder
    * shows up as dim_min != dim_max), non-finite values (one NaN
    * poisons every dot product it touches), all-zero vectors (cosine
    * against them is 0/0), and the L2-norm envelope (collapsed or
    * exploding norms flag a broken encoder checkpoint long before
    * recall drops).
    *
    * One pass, one shuffle at group grain: every per-vector signal is
    * a sequential HOF fold over the array (the same left-to-right
    * order an external oracle's list fold uses, so the rounded norms
    * agree bit-for-bit), and the groupBy partially aggregates to
    * #groups rows before the exchange. */
  def embeddingHygiene(emb: DataFrame, vecCol: String,
      grpCol: String): DataFrame = {
    val asD = transform(col(vecCol), x => x.cast("double"))
    // x - x == 0 exactly for finite x; NaN and +-Inf both yield NaN,
    // and Spark's NaN = 0 comparison is false -> flagged non-finite
    val nonFinite = exists(asD, x => !((x - x) === lit(0.0)))
    val allZero = forall(asD, x => x === lit(0.0))
    val norm = round(sqrt(aggregate(asD, lit(0.0),
      (acc, x) => acc + x * x)), 6)
    emb.select(col(grpCol), size(col(vecCol)).as("dim"),
        nonFinite.cast("int").as("bad"), allZero.cast("int").as("zer"),
        norm.as("nrm"))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dim")).cast("long").as("dim_min"),
        max(col("dim")).cast("long").as("dim_max"),
        sum(col("bad")).cast("long").as("n_nonfinite"),
        sum(col("zer")).cast("long").as("n_zero"),
        min(col("nrm")).as("norm_min"),
        max(col("nrm")).as("norm_max"),
        round(avg(col("nrm")), 4).as("norm_mean"))
  }

  /** Classifier-calibration report — does confidence MEAN anything?
    * Bins predictions by confidence (equal-width, conf ∈ [0,1], top
    * bin closed) and compares each bin's mean confidence against its
    * realized accuracy; the per-bin |gap| is the reliability-diagram
    * reading behind an ECE number. A well-calibrated router (langid,
    * quality classifier, code-vs-prose) can be thresholded by
    * confidence; an uncalibrated one needs this table to pick cutoffs.
    *
    * One pass, one shuffle at bin grain (≤ `bins` rows out):
    * `df` needs a confidence column in [0,1] and a 0/1 correctness
    * column. gap is computed from the ROUNDED bin aggregates so an
    * external oracle replaying the same rounding agrees exactly. */
  def confidenceCalibration(df: DataFrame, confCol: String,
      correctCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    df.select(
        least(floor(col(confCol) * bins), lit(bins - 1)).cast("int")
          .as("bin"),
        col(confCol), col(correctCol).cast("int").as("ok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(confCol)), 4).as("mean_conf"),
        round(avg(col("ok")), 4).as("accuracy"))
      .withColumn("gap",
        round(abs(col("mean_conf") - col("accuracy")), 4))
  }

  /** EXACT per-group quantiles computed at VALUE grain — the scale path
    * for percentiles of discrete-ish 100 TB signals (document lengths,
    * token counts, latencies in ms): `groupBy (group, value)` partially
    * aggregates row-grain data down to the distinct-value domain
    * BEFORE anything sorts, a per-group cumulative window then runs
    * over only #distinct-values rows, and each requested q picks the
    * SMALLEST value whose cumulative count reaches q·n — exact
    * `percentile_disc` semantics, no interpolation arithmetic and no
    * sketch error. Contrast the row-grain paths: an exact sort-based
    * percentile shuffles every row to a sort, `approx_percentile`
    * trades exactness for memory; this is exact AND shuffles only the
    * value histogram.
    *
    * The q·n threshold is compared in double (`cum >= q * n`) — the
    * same IEEE multiply on any engine, so an external oracle replaying
    * the window form matches bit-for-bit. Returns (group, q, value)
    * for every q in `qs`.
    *
    * The whole trick DEPENDS on a small distinct-value domain: on a
    * continuous double column every value is distinct, the histogram
    * degenerates to row grain and the per-group cumulative window
    * becomes a single-task sort of the whole group. A fractional
    * `valCol` therefore REQUIRES `valuePrecision` — the declared
    * number of decimal places the caller's domain actually has; values
    * are rounded to it before the group-by, which bounds the domain
    * and makes the quantiles exact at that precision. Integral-typed
    * columns pass through untouched. */
  def exactQuantilesByValue(df: DataFrame, valCol: String,
      groupCol: String, qs: Seq[Double],
      valuePrecision: Option[Int] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
    val continuous = df.schema(valCol).dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }
    require(!continuous || valuePrecision.isDefined,
      s"exactQuantilesByValue: '$valCol' is fractional — a continuous " +
        "domain is all-distinct, which collapses the value-grain plan " +
        "into a row-grain single-task sort per group. Pass " +
        "valuePrecision=Some(d) to round to your domain's actual " +
        "precision (exact at d decimals), or use approxQuantiles / " +
        "histogram for genuinely continuous signals")
    val v = valuePrecision match {
      case Some(d) => round(col(valCol), d)
      case None => col(valCol)
    }
    val counts = df.groupBy(col(groupCol), v.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val totW = Window.partitionBy(col(groupCol))
    counts
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(totW))
      // explode the few requested quantiles against the value-grain
      // frame; min(v) over the rows clearing the threshold IS the
      // discrete quantile — a partial-aggregatable min, no extra sort
      .select(col(groupCol), col("v"), col("cum"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cum").cast("double") >= col("q") * col("n"))
      .groupBy(col(groupCol), col("q"))
      .agg(min(col("v")).as("value"))
  }

  /** k-anonymity audit over a quasi-identifier set — the privacy gate
    * run before releasing / training on user-adjacent tables: every
    * row whose (quasi-column) combination is shared by fewer than `k`
    * rows is re-identifiable by that combination. One summary row:
    * group count, row count, smallest group, and the below-k exposure
    * (groups, rows, % of rows at risk).
    *
    * Two chained aggregations, both partial-aggregatable: the
    * quasi-group sizes combine map-side, and the summary folds the
    * group-grain frame (bounded by the quasi-domain product, not the
    * table). NULL quasi-values group as values, matching SQL GROUP BY
    * — an absent attribute is itself an identifying signal. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k < 2 makes every row anonymous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("grp_n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("grp_n")).as("n_rows"),
        min(col("grp_n")).as("min_group"),
        sum(when(col("grp_n") < k, 1L).otherwise(0L))
          .as("groups_below_k"),
        sum(when(col("grp_n") < k, col("grp_n")).otherwise(0L))
          .as("rows_below_k"))
      .select(lit(k).as("k"), col("n_groups"), col("n_rows"),
        col("min_group"), col("groups_below_k"), col("rows_below_k"),
        round(col("rows_below_k") * lit(100.0) / col("n_rows"), 6)
          .as("at_risk_pct"))
  }

  /** Per-group centroid-distance outliers — the embedding-space "this
    * vector does not belong to its label" screen (mislabeled examples,
    * encoder failures, garbage inputs): cosine of every vector against
    * its group centroid, flagged when it falls at or below the group's
    * exact `q`-quantile (discrete, an actual observed value — no
    * interpolation, so the threshold is engine-portable).
    *
    * Determinism discipline mirrors the k-means cells: centroids are
    * per-dimension averages ROUNDED to 4 dp before any cosine, so the
    * one order-sensitive float reduction in the plan is quantized away;
    * the cosine itself is a sequential fold (codegen'd expression) over
    * exact inputs, rounded to 6 dp.
    *
    * Scale shape: centroids aggregate at (group × dim) grain and come
    * back as one tiny broadcast; the threshold is a second group-grain
    * broadcast. The corpus is touched by exactly two scans (centroid
    * sum, then score) and zero row-grain shuffles beyond the centroid
    * aggregation. */
  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
      grpCol: String, q: Double = 0.05): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val centroids = emb
      .select(col(grpCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col(grpCol), col("d"))
      .agg(round(avg(col("x")), 4).as("c"))
      .groupBy(col(grpCol))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col(grpCol),
        transform(col("dc"), x => x.getField("c")).as("centroid"))
    val scored = emb
      .join(broadcast(centroids), Seq(grpCol))
      .withColumn("cos_centroid",
        round(Similarity.cosine(col(vecCol).cast("array<double>"),
          col("centroid")), 6))
      .graftCp(false)
    val thresholds = exactQuantilesByValue(
        scored.select(col(grpCol), col("cos_centroid")),
        "cos_centroid", grpCol, Seq(q),
        // cos_centroid is already 6-dp quantized above; this declares it
        valuePrecision = Some(6))
      .select(col(grpCol), col("value").as("threshold"))
    scored.join(broadcast(thresholds), Seq(grpCol))
      .select(col(grpCol), col(idCol), col("cos_centroid"),
        col("threshold"),
        (col("cos_centroid") <= col("threshold")).as("is_outlier"))
  }

  /** Pearson correlation matrix over fixed-point numeric columns — the
    * feature-redundancy screen. ONE aggregation pass computes every
    * power sum (n, Σx, Σx², Σxy for all pairs) as EXACT decimal(38,0)
    * integers over scaled values (`scale` decimal places, cents-style),
    * so the only floating-point work is the final r formula on one row
    * of exact sums: r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)).
    * No co-moment streaming (whose merge order is the answer), no
    * second scan, engine-reproducible at 6 dp.
    *
    * Scale shape: a single partial-aggregatable agg over the scan —
    * O(k²) sum expressions for k columns, one reduce to one row; the
    * pair explode runs on that row. Decimal sums cannot overflow
    * before ~10³⁸ (a 100 TB table of 10⁹-unit values sums to ~10²⁶). */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
      scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val mult = math.pow(10, scale).toLong
    def fx(n: String) =
      round(col(n) * mult).cast("long").cast("decimal(38,0)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.map(n => sum(fx(n)).as(s"s_$n")) ++
      cols.map(n => sum(fx(n) * fx(n)).as(s"ss_$n")) ++
      pairs.map { case (a, b) => sum(fx(a) * fx(b)).as(s"sp_${a}_$b") }
    // the O(k²) decimal power sums are the map-side cost — spread a
    // few-file scan or one core computes them all (guide §2.5); sums
    // are exact decimals, so partitioning cannot move a bit
    val one = Spread.fewFileScan(df.select(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      def d(n: String) =
        col("n") * col(s"ss_$n") - col(s"s_$n") * col(s"s_$n")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round(num.cast("double") /
          nullif(sqrt(d(a).cast("double")) * sqrt(d(b).cast("double")),
            lit(0.0)), 6).as("corr"))
    }
    one.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("n"), col("p.corr"))
  }

  /** Mutual information between two categorical columns (nats), plus
    * marginal entropies and the min-normalized NMI — "does knowing X
    * tell you anything about Y" for mixture/leakage analysis (e.g.
    * language × source: high NMI means sources are language-siloed).
    *
    * All counts are exact longs at (x, y) cell grain (bounded by the
    * category-domain product, not the table); the entropy/MI folds run
    * over cell-sorted arrays so the IEEE summation has exactly one
    * order on any engine — the same determinism discipline as the
    * temperature allocator. One corpus-grain aggregation, then
    * metadata-scale broadcasts. */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .agg(count(lit(1)).as("cxy"))
      .graftCp(false)
    val xs = cells.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val ys = cells.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = cells.agg(sum(col("cxy")).as("n"))
    def foldSum(arr: Column, field: String): Column =
      aggregate(arr, lit(0.0d), (acc, s) => acc + s.getField(field))
    val mi = cells
      .join(broadcast(xs), Seq("x")).join(broadcast(ys), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("term",
        col("cxy").cast("double") / col("n") *
          log((col("cxy").cast("double") * col("n")) /
            (col("cx").cast("double") * col("cy"))))
      .agg(sort_array(collect_list(struct(col("x"), col("y"),
        col("term")))).as("arr"))
      .select(foldSum(col("arr"), "term").as("mi"))
    def entropy(marg: DataFrame, key: String, cnt: String): DataFrame =
      marg.crossJoin(broadcast(tot))
        .withColumn("term",
          -(col(cnt).cast("double") / col("n")) *
            log(col(cnt).cast("double") / col("n")))
        .agg(sort_array(collect_list(struct(col(key), col("term"))))
          .as("arr"))
        .select(foldSum(col("arr"), "term").as(s"h_$key"))
    tot.crossJoin(entropy(xs, "x", "cx"))
      .crossJoin(entropy(ys, "y", "cy"))
      .crossJoin(mi)
      .select(col("n"),
        round(col("h_x"), 6).as("h_x"),
        round(col("h_y"), 6).as("h_y"),
        round(col("mi"), 6).as("mi"),
        round(col("mi") / nullif(least(col("h_x"), col("h_y")), lit(0.0)),
          6).as("nmi"))
  }

  /** Equi-depth (quantile) binning per group: each row lands in one of
    * `nBins` equal-population bins in value order (ntile semantics:
    * the first N mod nBins bins hold one extra row). Emits
    * per-(group, bin) count and value envelope: the profile that
    * catches "uniform-width histogram says fine, all the mass sits in
    * one bin".
    *
    * Scale shape: the output is a pure function of the per-group VALUE
    * HISTOGRAM — which rows land in which bin under ties is
    * tiebreak-dependent, but tied rows share the value, so per-bin
    * count (fixed by ntile arithmetic) and min/max value are
    * tiebreak-invariant. So the only row-grain stage is a
    * partial-aggregatable groupBy to (group, value, count); the rank
    * window then runs over the value DOMAIN, and bin membership is
    * closed-form arithmetic on each value's global rank range — no
    * per-group total-order sort of the raw rows (the old ntile window
    * put every row of a group through ONE task; at corpus scale a hot
    * group is a straggler-then-OOM). Value ranks and counts stay exact
    * in longs; the two floor-divisions run in double but are exact for
    * counts < 2⁵² (quotient ≤ nBins, operands integer-exact). */
  def equiDepthBins(df: DataFrame, groupCol: String, valCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"equiDepthBins: nBins must be >= 1, got $nBins")
    val hist = df.select(col(groupCol), col(valCol).as("_v"))
      .groupBy(col(groupCol), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val k = lit(nBins.toLong)
    // ntile over N rows: base = N div k rows per bin, the first
    // rem = N mod k bins take one extra. Rank r (1-based) lands in
    //   r <= rem·(base+1):  bin = ceil(r / (base+1))
    //   else:               bin = rem + ceil((r - rem·(base+1)) / base)
    // (the base = 0 case — fewer rows than bins — never reaches the
    // second branch: N = rem, so every rank satisfies the first).
    def ceilDivPos(a: Column, b: Column): Column =
      floor((a + b - lit(1L)).cast("double") / b.cast("double"))
        .cast("long")
    def binOf(r: Column, base: Column, rem: Column): Column =
      when(r <= rem * (base + lit(1L)), ceilDivPos(r, base + lit(1L)))
        .otherwise(rem + ceilDivPos(r - rem * (base + lit(1L)), base))
    val ranked = hist
      .withColumn("_hi", sum(col("_c")).over(wOrd))
      .withColumn("_lo", col("_hi") - col("_c") + lit(1L))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("_base",
        ((col("_n") - col("_n") % k) / k).cast("long"))
      .withColumn("_rem", col("_n") % k)
    // each value overlaps the contiguous bin run [bin(lo), bin(hi)]
    // (≤ nBins rows out per value; total ≤ |domain| + nBins·|groups|)
    ranked
      .withColumn("bin",
        explode(sequence(binOf(col("_lo"), col("_base"), col("_rem")),
          binOf(col("_hi"), col("_base"), col("_rem")))))
      .withColumn("_size",
        col("_base") + when(col("bin") <= col("_rem"), 1L).otherwise(0L))
      .groupBy(col(groupCol), col("bin").cast("int").as("bin"))
      .agg(max(col("_size")).as("n"),
        round(min(col("_v")), 4).as("v_min"),
        round(max(col("_v")), 4).as("v_max"))
  }

  /** Dominant principal component of an embedding column via
    * EXACT-INTEGER power iteration — the embedding-drift /
    * anisotropy-direction probe ("is one direction eating the
    * space").
    *
    * Determinism strategy (the q159 correlation-matrix discipline,
    * extended through the iteration): vectors quantize to 1e-4-unit
    * BIGINTs; the covariance quantizes to 1e-6-unit integers via ONE
    * closed-form double expression per cell (scalar, no reduction
    * ordering); then all `iters` matrix-vector products run in
    * DECIMAL(38,0) integer arithmetic — bit-exact on any engine, no
    * float sums anywhere until the single final normalization.
    * Un-normalized iterates grow by ≤ dims·max|covµ| per step:
    * 64 dims × 3 iterations stays far under the 38-digit ceiling.
    *
    * Scale shape: count, per-dim sums and the upper-triangle product
    * sums all come from ONE custom TypedImperativeAggregate
    * ([[graft.functions.PcaMomentsAgg]], the sketch-family pattern) —
    * per-row work is d(d+1)/2 multiply-adds into a flat primitive
    * 128-bit-cell buffer, ZERO row materialization (the previous
    * flatten+posexplode form created n·d(d+1)/2 UnsafeRows before its
    * partial aggregate — invisible at test dims, a ~295k-row expansion
    * per input row at d=768). The exchange carries one 16-byte/cell
    * buffer per partition partial; the single output row posexplodes
    * at CELL grain, pos resolves to (i, j) through a dims²/2-row
    * broadcast, and the lower triangle mirrors from the same cells
    * (c(i,j) = c(j,i) exactly — identical products, identical sums).
    * Every iteration afterwards is metadata-scale (dims² × dims
    * broadcast joins). No self-join of the table against itself.
    *
    * Returns (dim, loading, eigenvalue): loading normalized so the
    * largest-|w| dimension (smallest index on ties) equals 1.0;
    * eigenvalue is the Rayleigh-style ratio of the last two iterate
    * maxima, rescaled to real units. */
  def pcaPowerComponent(emb: DataFrame, vecCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 2, "pcaPowerComponent needs >= 2 iterations")
    val dec = "decimal(38,0)"
    // Ragged-input guard: `dims` is probed from one row, and every
    // triangle position below assumes exactly that length — a row
    // with a different/null length would silently mis-key covariance
    // cells (or crash the flatten). Malformed vectors are DROPPED,
    // the MultiModal decline-to-null discipline: n, sums and products
    // all come from the same conforming subset.
    val dims = emb.select(size(col(vecCol)).as("_d"))
      .filter(col("_d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    if (dims == 0) {
      // no non-empty vector anywhere: empty result, stable schema
      val s = emb.sparkSession
      import s.implicits._
      return Seq.empty[(Int, Double, Double)]
        .toDF("dim", "loading", "eigenvalue")
    }
    val clean = emb.filter(size(col(vecCol)) === dims)
    // ONE scan: quantize once per row (codegen'd projection), then the
    // moments aggregate folds count, Σqᵢ and the upper-triangle Σqᵢqⱼ
    // into a flat 128-bit-cell buffer — exact (same DECIMAL(38,0)
    // cells as the relational form it replaced), no per-row triangle
    // materialization. localCheckpoint: the one-row result feeds three
    // branches (n / sx / sxy) — without it each branch re-scans.
    val moments = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      clean
        .select(transform(col(vecCol),
          v => round(v.cast("double") * 1e4).cast("long")).as("_q"))
        .agg(ColumnBridge.column(graft.functions.PcaMomentsAgg(
            ColumnBridge.expression(col("_q")), dims)
          .toAggregateExpression()).as("m"))
        .graftCp(false)
    }
    val n = moments.select(col("m.n").as("n"))
    val sx = moments.select(posexplode(col("m.sx")).as(Seq("i", "sx")))
    val posAgg = moments
      .select(posexplode(col("m.sxy")).as(Seq("pos", "sxy")))
    // pos -> (i, j) lookup for the row-major upper triangle
    val posIdx = {
      val s = emb.sparkSession
      import s.implicits._
      (for (i <- 0 until dims; j <- i until dims)
        yield (i * dims - i * (i - 1) / 2 + (j - i), i, j))
        .toDF("pos", "i", "j")
    }
    val cells = posAgg.join(broadcast(posIdx), Seq("pos"))
      .select(col("i"), col("j"), col("sxy"))
    val sxy = cells.unionByName(cells.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("sxy")))
    // covariance cell in 1e-6 units: ONE scalar double expression —
    // identical parenthesization on the oracle side reproduces every
    // IEEE intermediate
    val cov = sxy
      .join(broadcast(sx.select(col("i"), col("sx").as("sxi"))), Seq("i"))
      .join(broadcast(sx.select(col("i").as("j"), col("sx").as("sxj"))),
        Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        round(
          (col("sxy").cast("double") / col("n") -
            col("sxi").cast("double") * col("sxj").cast("double") /
              col("n") / col("n")) / 100.0)
          .cast(dec).as("c"))
      .graftCp(false)
    // integer power iteration from the all-ones vector
    var w = cov.groupBy(col("i")).agg(sum(col("c")).as("w"))
    var wPrev = w
    for (_ <- 2 to iters) {
      wPrev = w
      w = cov
        .join(broadcast(w.select(col("i").as("j"), col("w").as("wj"))),
          Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("c") * col("wj")).as("w"))
    }
    def maxRef(frame: DataFrame): DataFrame = {
      val m = frame.agg(max(abs(col("w"))).as("maxabs"))
      frame.crossJoin(broadcast(m))
        .filter(abs(col("w")) === col("maxabs"))
        .orderBy(col("i")).limit(1)
        .select(col("w").as("ref"), col("maxabs"))
    }
    val refLast = maxRef(w)
    val refPrev = maxRef(wPrev)
    w.crossJoin(broadcast(refLast))
      .crossJoin(broadcast(
        refPrev.select(col("maxabs").as("maxabs_prev"))))
      .select(col("i").as("dim"),
        round(col("w").cast("double") / col("ref").cast("double"), 6)
          .as("loading"),
        round(col("maxabs").cast("double") /
          col("maxabs_prev").cast("double") / 1e6, 6).as("eigenvalue"))
      .orderBy(col("dim"))
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total (the lower
    * weighted median — a pure integer definition, no interpolation,
    * so any engine lands on the same value). Values collapse to
    * (group, value) grain FIRST — the cumulative window runs over the
    * distinct-value domain, never the raw rows (the q127 exact-
    * quantile discipline). `2·cum ≥ total` keeps the crossing test in
    * integers. */
  def weightedMedian(df: DataFrame, grpCol: String, valCol: String,
      weightCol: String): DataFrame = {
    // NOTE (r18): a two-level cumulative sum (order-preserving 2^12
    // integer buckets: coarse per-(group,bucket) running starts
    // broadcast back under a per-(group,bucket) fine window) was built
    // and A/B-measured as a net LOSS at bench scale (q208 flat-to-
    // -7%, q209 0.64× — the broadcast barrier and two extra stages
    // outweigh parallelizing the 3-task window), so the single
    // cumulative window per group stays. At extreme per-group
    // distinct-value domains the window task is the bound; the
    // two-level shape in the r18 notes is the known remedy.
    val byVal = df.groupBy(col(grpCol), col(valCol).as("_v"))
      .agg(sum(col(weightCol)).as("_w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("_v"))
    byVal
      .withColumn("_cum", sum(col("_w")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("_tot", sum(col("_w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(grpCol))))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(grpCol))
      .agg(min(col("_v")).as("weighted_median"),
        max(col("_tot")).as("total_weight"))
  }

  /** Robust (median/MAD) outlier report per group: median and median
    * absolute deviation — both EXACT lower medians over distinct-value
    * domains ([[weightedMedian]] with unit weights) — plus how many
    * rows sit beyond `nMads` MADs. The robust screen where
    * mean/stddev-based z-scores are torn up by the outliers they're
    * hunting. Integer thresholds: |x − med| > nMads·MAD compares
    * longs, no float boundary. Three group-keyed passes (median,
    * deviation median, flag count) — each at distinct-value grain. */
  def madOutliers(df: DataFrame, grpCol: String, valCol: String,
      nMads: Int = 3): DataFrame = {
    val base = df.select(col(grpCol), col(valCol).cast("long").as("_x"),
      lit(1L).as("_one"))
    val med = weightedMedian(base, grpCol, "_x", "_one")
      .select(col(grpCol), col("weighted_median").as("_med"))
    val dev = base.join(med, Seq(grpCol))
      .withColumn("_d", abs(col("_x") - col("_med")))
    val mad = weightedMedian(
        dev.select(col(grpCol), col("_d"), lit(1L).as("_one")),
        grpCol, "_d", "_one")
      .select(col(grpCol), col("weighted_median").as("_mad"))
    dev.join(mad, Seq(grpCol))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"),
        max(col("_med")).as("median"),
        max(col("_mad")).as("mad"),
        sum(when(col("_d") > lit(nMads) * col("_mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** 2-D skyline (Pareto front) per group: rows not dominated by any
    * other (x lower-or-equal AND y higher-or-equal, one strict) —
    * "cheapest for its size class". The EXISTS formulation plans a
    * quadratic nested-loop; in 2-D the front falls out of ONE window:
    * on the DISTINCT (x, y) grain ordered by (x asc, y desc), a pair
    * is on the front iff its y strictly beats the running max over the
    * preceding rows (anything earlier is no-more-expensive; beating
    * its best y means nothing dominates). Distinct grain makes ties
    * exact: equal-(x, y) duplicates are all undominated and all
    * return via the semi-join back. */
  def skyline2D(df: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pairs = df.select(col(grpCol), col(xCol), col(yCol)).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col(xCol), col(yCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val front = pairs
      .withColumn("_pm", max(col(yCol)).over(w))
      .filter(col("_pm").isNull || col(yCol) > col("_pm"))
      .select(col(grpCol), col(xCol), col(yCol))
    df.join(front, Seq(grpCol, xCol, yCol), "left_semi")
  }

  /** Deterministic per-group mode: the most frequent value, smallest
    * value on count ties (an arbitrary-but-pinned tiebreak — engines
    * otherwise disagree silently). Value-grain count then a rank-1
    * WindowGroupLimit prune; reports the winner's count and how many
    * values tied it. */
  def modeBy(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val counts = df.groupBy(col(grpCol), col(valCol))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol)).orderBy(col("n").desc, col(valCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(grpCol))
    counts
      .withColumn("_rk", row_number().over(w))
      .withColumn("n_tied", sum(when(col("n") === max(col("n")).over(wAll),
        1L).otherwise(0L)).over(wAll))
      .filter(col("_rk") === 1)
      .select(col(grpCol), col(valCol).as("mode"), col("n").as("n_mode"),
        col("n_tied"))
  }

  /** Functional-dependency audit: for each candidate A → B, does every
    * A-value determine ONE B-value — the schema-inference /
    * denormalization-safety check ("is this column a lookup of that
    * key or does it secretly vary"). Per pair: distinct LHS values,
    * how many of them violate (≥ 2 distinct B), and the verdict.
    * NULLs count as values (a key mapping to {x, NULL} is a real
    * violation).
    *
    * One LHS-grain aggregate per pair (partial countDistinct, then a
    * 1-row reduce) — pairs are a handful, each pass reads only its two
    * columns, so the scans stay column-pruned and independent. */
  def functionalDependencies(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate dependency")
    pairs.map { case (a, b) =>
      df.groupBy(col(a))
        .agg(countDistinct(coalesce(col(b).cast("string"),
          lit("\u0000null"))).as("_nb"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("_nb") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(a).as("lhs"), lit(b).as("rhs"), col("n_lhs"),
          col("n_violating"), (col("n_violating") === 0).as("fd_holds"))
    }.reduce(_ unionByName _)
  }
}
