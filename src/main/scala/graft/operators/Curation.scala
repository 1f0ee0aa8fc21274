package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-group document cap — the C4/RefinedWeb-style "at most N pages
    * per domain" rule that stops any one source from dominating the
    * corpus. Rows are ranked inside each group by the given priority
    * columns (highest-value first, id tie-break keeps it total) and
    * only the top `maxPerGroup` survive.
    *
    * Scale shape: one shuffle by `groupCol`, and because the rank
    * filter sits directly on the `row_number` window Spark rewrites it
    * to WindowGroupLimit — each map task keeps only its local top-N per
    * group before the shuffle, so a 100 TB corpus with a 10k-page cap
    * moves O(groups × N) rows, not the whole table. Returns the input
    * columns plus `grp_rank`. */
  def capPerGroup(docs: DataFrame, groupCol: String, idCol: String,
      maxPerGroup: Int, priorityDesc: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = priorityDesc.map(c => col(c).desc) :+ col(idCol).asc
    val w = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    docs.withColumn("grp_rank", row_number().over(w))
      .filter(col("grp_rank") <= maxPerGroup)
  }

  /** The surviving corpus: rows the funnel kept, original columns. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20, minQuality: Double = 0.55): DataFrame =
    funnel(docs, textCol, idCol, minTokens, minQuality)
      .filter(col("reason") === "kept")
      .select(docs.columns.map(col): _*)

  /** Per-group winsorization: clip a numeric column to its group's
    * [pLo, pHi] exact percentiles — the outlier-taming normalizer for
    * heavy-tailed pipeline signals (document lengths, per-domain page
    * counts) where a global clip would flatten small strata.
    *
    * Determinism: thresholds round to 6 dp BEFORE the comparison (the
    * same convention as qualityQuantileGate) so the clip verdict is
    * engine-portable. Returns the input plus `lo`, `hi`, `clipped`
    * (the clamped value) and `clip_dir` (-1 below, 0 inside, 1 above).
    *
    * Scale shape: the threshold frame is one percentile aggregation —
    * rows = #groups, metadata scale — broadcast back onto the corpus;
    * the big side never shuffles and the clamp itself is a pure
    * codegen'd projection. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val v = col(valCol).cast("double")
    val thresholds = df.groupBy(col(groupCol))
      .agg(round(percentile(v, lit(pLo)), 6).as("lo"),
        round(percentile(v, lit(pHi)), 6).as("hi"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .withColumn("clipped", least(greatest(v, col("lo")), col("hi")))
      .withColumn("clip_dir",
        when(v < col("lo"), -1).when(v > col("hi"), 1).otherwise(0))
  }

  /** Per-group percentile-rank calibration: maps a raw signal to its
    * [0, 1] rank within the group — the cross-source score normalizer
    * (a quality score of 0.7 means different things from different
    * classifiers/sources; its within-source rank is comparable). Uses
    * SQL `percent_rank` = (rank−1)/(n−1), which is TIE-STABLE: equal
    * raw values share a rank, so no tiebreak column is needed and the
    * result is engine-portable as-is (rank arithmetic is integer;
    * the single division rounds 6 dp).
    *
    * Scale shape: one keyed window per group — groups partition the
    * shuffle, no global sort. Singleton groups define rank 0. */
  def percentileCalibrate(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol).cast("double"))
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  /** Extract the lowercased host of a URL column (scheme-mandatory;
    * port/path/query stripped). Empty string when no host parses. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** Domain-blocklist filter with PARENT-DOMAIN semantics: a doc is
    * blocked when its URL host equals a blocklist entry OR sits under
    * one (`a.b.example.com` matches entry `example.com`) — the standard
    * crawl-exclusion rule (spam/SEO/adult domain lists block whole
    * registrable domains, not single hosts).
    *
    * Scale shape: each host explodes to its ≤ #labels dot-suffixes and
    * equi-joins the BROADCAST blocklist — a real-world blocklist is
    * 10⁴-10⁶ entries (broadcastable), the corpus side stays an
    * equi-join at (doc, suffix) grain; no LIKE scan, no cartesian.
    * Returns the input plus `host` and `blocked_by` (the most specific
    * — longest — matching entry; null when kept). */
  def domainBlocklist(docs: DataFrame, urlCol: String, idCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val spark = docs.sparkSession
    import spark.implicits._
    val blockDf = blocked.map(_.toLowerCase).distinct.toDF("_entry")
    val withHost = docs.withColumn("host", urlHost(col(urlCol)))
    // all dot-suffixes of the host: a.b.c -> [a.b.c, b.c, c]
    val sufs = withHost.select(col(idCol).as("_bid"),
        explode(expr("transform(sequence(1, size(split(host, '[.]'))), " +
          "i -> array_join(slice(split(host, '[.]'), i, " +
          "size(split(host, '[.]'))), '.'))")).as("_suffix"))
      .join(broadcast(blockDf), col("_suffix") === col("_entry"))
      .groupBy(col("_bid"))
      // suffixes of one host all differ in length, so the longest match
      // is unique — no tiebreak needed
      .agg(max_by(col("_entry"), length(col("_entry"))).as("blocked_by"))
    withHost.join(sufs.withColumnRenamed("_bid", idCol), Seq(idCol), "left")
  }
}
