package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
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

  /** The estimate every KMV surface derives from its (n_seen, kth_min)
    * pair: exact `n_seen` below k; the (k-1)·2³²/kth_min estimator at
    * k — UNLESS the k-th minimum is non-positive. hash32 CAN emit 0
    * (md5 window "00000000"), and a zero k-th minimum would turn the
    * estimator into a division by zero (Infinity/NaN propagating into
    * round and the oracle diff); `n_seen` (= k, a lower bound) is the
    * defensible degenerate answer. Every oracle carries the same
    * `kth_min <= 0` arm so the two sides cannot diverge on it. */
  def kmvEstimate(nSeen: org.apache.spark.sql.Column,
      kthMin: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    when(nSeen < k || kthMin <= 0, nSeen.cast("double"))
      .otherwise(round((lit(k) - 1) * lit(4294967296.0) / kthMin, 2))

  /** Driver/executor-side twin of [[kmvEstimate]] for the streaming
    * state handler (EventStream.kmvDistinctStream) — same guard, same
    * HALF_UP 2-dp rounding as Spark's `round`, asserted equal in
    * SketchesSpec. Without the `kthMin <= 0` arm the streaming path
    * would compute BigDecimal(Infinity) and THROW, killing the query —
    * strictly worse than the batch side's silent Infinity row. */
  def kmvEstimateJvm(nSeen: Long, kthMin: Long, k: Int): Double =
    if (nSeen < k || kthMin <= 0L) nSeen.toDouble
    else BigDecimal((k - 1) * 4294967296.0 / kthMin)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** KMV distinct-count estimate per group: with the k-th smallest of
    * the DISTINCT hash values m_k over a hash space of size 2^32, the
    * estimator is (k-1) · 2^32 / m_k; groups with fewer than k distinct
    * values report their exact count. One distinct + one window over
    * group-local hashes (WindowGroupLimit prunes to the k smallest per
    * group before the final aggregate — never materializes the full
    * rank). */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    // null values hash to null and are SKIPPED — a null is not a
    // distinct value, and engines disagree on null sort position
    // (Spark NULLS FIRST vs DuckDB NULLS LAST), so letting it into the
    // window would both inflate n_seen and make the k-th minimum
    // engine-dependent. The native form (KmvSketchAgg) skips likewise.
    val hashed = df
      .select(col(groupCol), GF.hash32(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_min"))
      .select(col(groupCol),
        kmvEstimate(col("n_seen"), col("kth_min"), k).as("approx_distinct"),
        col("n_seen").cast("long").as("n_seen"))
  }

  /** Column surface of the native bounded-state KMV aggregate
    * ([[graft.functions.KmvSketchAgg]]): aggregates an already-hashed
    * long column into `struct(n_seen, kth_min)`. */
  def kmvAgg(hash: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.KmvSketchAgg(ColumnBridge.expression(hash), k)
        .toAggregateExpression())
  }

  /** [[kmvDistinct]] re-expressed over the native TypedImperativeAggregate:
    * IDENTICAL output (asserted by q194 sharing q29's oracle and by
    * SketchesSpec group-for-group), different shuffle shape — the
    * composed form moves one row per distinct (group, hash) and then
    * windows; this one moves a ≤k-long buffer per (partition, group),
    * merging map-side. At crawl scale the distinct domain is the big
    * thing; the buffer is 512 bytes. */
  def kmvDistinctNative(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame =
    df.groupBy(col(groupCol))
      .agg(kmvAgg(GF.hash32(col(valueCol).cast("string")), k).as("kmv"))
      .select(col(groupCol),
        kmvEstimate(col("kmv.n_seen"), col("kmv.kth_min"), k)
          .as("approx_distinct"),
        col("kmv.n_seen").as("n_seen"))

  /** KMV sketch ALGEBRA — pairwise distinct-count overlap from
    * sketches alone (Bar-Yossef et al. 2002; Beyer et al. 2007 "On
    * synopses for distinct-value estimation", both public): for every
    * pair of groups, estimate |A∪B| from the bottom-k of the MERGED
    * hash sets, and Jaccard/|A∩B| from how many of the union sketch's
    * members appear in BOTH side sketches. Sound because bottom-k(A∪B)
    * ⊆ bottom-k(A) ∪ bottom-k(B): any union-sketch member from A is ≤
    * the union's k-th minimum ≤ A's k-th minimum, hence inside A's
    * sketch — membership tests never need the full sets.
    *
    * Scale shape: per-group sketches prune to ≤ k rows via
    * WindowGroupLimit (the q29 shape); everything after — pairing,
    * merge, membership — is (groups² × k) METADATA, the whole point of
    * sketch algebra: cross-source overlap questions answered without
    * re-scanning sources. Deterministic (k-smallest-distinct sets are
    * order-free; one double division per estimate), so the oracle
    * replays every digit. */
  def kmvPairOverlap(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val h = df.select(col(groupCol).as("g"),
        GF.hash32(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull).distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    val bk = h.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select(col("g"), col("h"))
      .localCheckpoint(false)
    val groups = bk.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("g1"))
      .crossJoin(broadcast(groups.select(col("g").as("g2"))))
      .filter(col("g1") < col("g2"))
    val mu = pairs.join(bk.withColumnRenamed("g", "g1"), Seq("g1"))
      .select(col("g1"), col("g2"), col("h"))
      .unionByName(pairs.join(bk.withColumnRenamed("g", "g2"), Seq("g2"))
        .select(col("g1"), col("g2"), col("h")))
      .distinct()
    val wp = Window.partitionBy(col("g1"), col("g2")).orderBy(col("h"))
    val topu = mu.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= k).select(col("g1"), col("g2"), col("h"))
    val flagged = topu
      .join(bk.select(col("g").as("g1"), col("h"), lit(1).as("ina")),
        Seq("g1", "h"), "left")
      .join(bk.select(col("g").as("g2"), col("h"), lit(1).as("inb")),
        Seq("g2", "h"), "left")
    flagged.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_u"), max(col("h")).as("kth"),
        sum(coalesce(col("ina"), lit(0)) * coalesce(col("inb"), lit(0)))
          .as("n_common"))
      .select(col("g1"), col("g2"),
        kmvEstimate(col("n_u"), col("kth"), k).as("union_est"),
        round(col("n_common").cast("double") / col("n_u"), 6)
          .as("jaccard_est"),
        col("n_common").cast("long").as("n_common"))
  }

  /** One surviving (token, residual-count) candidate. */
  case class MgCandidate(tok: String, n: Long)

  /** Misra-Gries heavy-hitters summary: a BOUNDED (k entries) candidate
    * map per group, guaranteed to contain every value with true
    * frequency > N/(k+1) (Misra & Gries 1982; mergeable form per
    * Agarwal et al. 2012 — both public). This is the 100 TB shape of
    * "top tokens": the exact per-token groupBy
    * (TextAnalysis.topTokens) shuffles one row per DISTINCT token —
    * fine until the vocabulary itself is huge — while this aggregator
    * carries at most k entries per partition regardless of vocabulary,
    * merging partial summaries map-side like any partial aggregate.
    *
    * The summary is order-sensitive: residual counts (and which
    * below-threshold tokens linger) depend on partition merge order, so
    * the output is NOT run-deterministic and has no SQL oracle — the
    * spec asserts the containment guarantee against exact counts
    * instead. Callers wanting exact ranks re-count just the candidates
    * in a second cheap pass. */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
        Seq[MgCandidate]] {
    type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(b: Buf, tok: String): Buf = {
      if (b.contains(tok)) b(tok) += 1L
      else if (b.size < k) b(tok) = 1L
      else {
        // decrement-all: every stored count pays for the unstored token.
        // Decide on an immutable snapshot, mutate after — in-flight
        // mutation of a mutable.HashMap under iteration is undefined
        // behavior even when value-only updates happen to work today.
        b.toList.foreach { case (t, n) =>
          if (n == 1L) b.remove(t) else b(t) = n - 1L
        }
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (t, n) => a(t) = a.getOrElse(t, 0L) + n }
      if (a.size > k) {
        // subtract the (k+1)-th largest residual from everything; at
        // most k entries stay strictly positive. Snapshot before
        // mutating (same discipline as reduce).
        val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        a.toList.foreach { case (t, n) =>
          if (n - cut <= 0L) a.remove(t) else a(t) = n - cut
        }
      }
      a
    }

    override def finish(b: Buf): Seq[MgCandidate] =
      b.toSeq.map { case (t, n) => MgCandidate(t, n) }
        .sortBy(c => (-c.n, c.tok))

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[MgCandidate]] =
      ExpressionEncoder[Seq[MgCandidate]]()
  }

  /** Heavy-hitter candidates per group over an already-tokenized
    * column: one aggregation, constant state per group. */
  def heavyHitters(df: DataFrame, groupCol: String, tokenCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k))
    df.groupBy(col(groupCol))
      .agg(mg(col(tokenCol)).as("candidates"))
  }

  /** Column surface of the native Count-Min Sketch aggregate
    * ([[graft.functions.CmsSketchAgg]]): folds an already-hashed long
    * column into a depth × width counter matrix
    * (`array<array<long>>`). */
  def cmsAgg(hash: org.apache.spark.sql.Column, depth: Int, width: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.CmsSketchAgg(ColumnBridge.expression(hash),
        depth, width).toAggregateExpression())
  }

  /** CMS point query as a PLAIN PROJECTION over a built sketch: the
    * min across depth rows of each row's universal-hash bucket for the
    * probe key's hash. One-sided by construction (collisions only
    * ADD), so `estimate ≥ true count` always, and
    * `estimate ≤ true + N/width` in expectation per row. The probe
    * never rescans the corpus — at 100 TB the sketch is built once
    * (one fixed-size matrix through the exchange) and any number of
    * keys are scored against the broadcast one-row sketch. */
  def cmsEstimate(cms: org.apache.spark.sql.Column,
      hash: org.apache.spark.sql.Column, depth: Int, width: Int)
      : org.apache.spark.sql.Column = {
    require(depth >= 1, s"cmsEstimate: depth must be >= 1, got $depth")
    require(width >= 2, s"cmsEstimate: width must be >= 2, got $width")
    // Same low-32-bit mask as CmsBuffer.add: in-contract hashes
    // (GF.hash32 ∈ [0, 2³²)) are unchanged, out-of-contract longs probe
    // the same bucket the aggregate counted them in instead of a
    // negative index.
    val h32 = hash.bitwiseAND(lit(0xFFFFFFFFL))
    val perRow = (0 until depth).map { i =>
      val u = (h32 * lit(2L * i + 1) + lit(101L * i + 17)) %
        lit(GF.MinhashPrime)
      element_at(element_at(cms, i + 1), (u % width).cast("int") + lit(1))
    }
    val est = if (perRow.size == 1) perRow.head else least(perRow: _*)
    // The caller's (depth, width) must MATCH the sketch's own
    // dimensions: a mismatched width probes the wrong buckets and still
    // returns plausible numbers, a too-large depth turns element_at
    // into nulls that least() silently skips. Cross-check against the
    // matrix itself and fail fast — the cost is two size() calls on a
    // broadcast one-row sketch.
    when(size(cms) === lit(depth) &&
        size(element_at(cms, 1)) === lit(width), est)
      .otherwise(raise_error(format_string(
        s"graft cmsEstimate: sketch dims %dx%d != caller ($depth" +
          s"x$width)",
        size(cms), size(element_at(cms, 1)))).cast("long"))
  }

  /** CMS measurement harness (the q230 shape, same discipline as the
    * ANN recall harness): build the sketch over every value, then
    * score the top-k TRUE-heaviest values against it — true count,
    * CMS estimate and the (≥ 0) overcount side by side. The exact
    * per-value groupBy exists only to grade the sketch; the
    * production path is [[cmsAgg]] + [[cmsEstimate]] with no
    * value-grain shuffle at all. Deterministic end to end (portable
    * hashes, counter sums, min over rows), so the SQL oracle replays
    * every digit. */
  def cmsTopKAccuracy(df: DataFrame, valueCol: String, depth: Int,
      width: Int, topK: Int): DataFrame = {
    val hashed = df.select(col(valueCol).as("value"),
        GF.hash32(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull)
    val sketch = hashed.agg(cmsAgg(col("h"), depth, width).as("cms"))
    val top = hashed.groupBy(col("value"), col("h"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("value"))
      .limit(topK)
    top.crossJoin(broadcast(sketch))
      .select(col("value"), col("true_cnt"),
        cmsEstimate(col("cms"), col("h"), depth, width).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("true_cnt"))
      .orderBy(col("true_cnt").desc, col("value"))
  }
}
