package graft.operators

import graft.GraftCheckpointOps
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
      .graftCp(false)
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

  /** The ONE Misra-Gries residual-add + cut implementation, shared by
    * [[MisraGriesAgg]]'s partial merge and [[MisraGriesMergeAgg]]'s
    * stored-summary rollup so the cut rule cannot drift: fold
    * `entries` into `a`, then subtract the (k+1)-th largest residual —
    * at most k entries stay strictly positive. Snapshot before
    * mutating (in-flight mutation of a mutable.HashMap under iteration
    * is undefined behavior even when value-only updates happen to
    * work today). */
  private def mgAddAndCut(
      a: scala.collection.mutable.HashMap[String, Long],
      entries: Iterable[(String, Long)], k: Int)
      : scala.collection.mutable.HashMap[String, Long] = {
    entries.foreach { case (t, n) => a(t) = a.getOrElse(t, 0L) + n }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.toList.foreach { case (t, n) =>
        if (n - cut <= 0L) a.remove(t) else a(t) = n - cut
      }
    }
    a
  }

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

    override def merge(a: Buf, b: Buf): Buf = mgAddAndCut(a, b, k)

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
    // broadcast one-row sketch. A NULL sketch (e.g. an outer-join miss)
    // is not a mismatch: it keeps aggregate-style null propagation
    // (size(NULL) is NULL, which must not fall into the error arm).
    when(cms.isNull, lit(null).cast("long"))
      .when(size(cms) === lit(depth) &&
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

  /** Column surface of the native HDR quantile sketch
    * ([[graft.functions.HdrSketchAgg]]): folds a raw long measure into
    * the sorted bucket histogram `array<struct<bucket,cnt>>`. */
  def hdrAgg(measure: org.apache.spark.sql.Column, sBits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.HdrSketchAgg(ColumnBridge.expression(measure),
        sBits).toAggregateExpression())
  }

  /** Column twin of [[graft.functions.HdrBuckets.lowerBound]]: the
    * smallest |value| in bucket `b`, exact integer arithmetic only
    * (the variable-width shift goes through the Catalyst ShiftLeft
    * node directly — `functions.shiftleft` only takes a literal
    * shift). Any member of the bucket is within a 2^−sBits relative
    * factor of this bound — the sketch's whole guarantee rides on
    * this reconstruction, so it is asserted against the JVM twin over
    * the full bucket range in the spec. */
  def hdrLowerBound(b: org.apache.spark.sql.Column, sBits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def shl(v: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.ShiftLeft(
          ColumnBridge.expression(v),
          ColumnBridge.expression(n.cast("int"))))
    val ba = abs(b)
    val sub = ba.bitwiseAND(lit((1L << sBits) - 1)) + lit(1L << sBits)
    val lbAbs = when(ba < lit(1L << (sBits + 1)), ba)
      .otherwise(shl(sub, shiftright(ba, sBits) - lit(1L)))
    signum(b).cast("long") * lbAbs
  }

  /** Quantile probe as a PLAIN PROJECTION over a built sketch: total
    * N from the bucket counts, rank = max(⌈φ·N⌉, 1), one ordered fold
    * to the first bucket whose cumulative count reaches the rank,
    * then the exact-integer lower-bound reconstruction. The estimate
    * q̂ satisfies q̂ ≤ v* < q̂·(1 + 2^−sBits) against the exact
    * rank-⌈φ·N⌉ value v* (exact below 2^sBits) — for every v* except
    * the single point Long.MinValue, which the bucket map clamps to
    * Long.MaxValue's bucket (see HdrSketchAgg). Like cmsEstimate: the
    * corpus is built into the sketch once; any number of φ probes run
    * against the broadcast one-row histogram. */
  def hdrQuantile(sk: org.apache.spark.sql.Column, phi: Double,
      sBits: Int): org.apache.spark.sql.Column = {
    require(phi > 0.0 && phi <= 1.0,
      s"hdrQuantile: phi must be in (0,1], got $phi")
    val n = aggregate(sk, lit(0L), (acc, x) => acc + x.getField("cnt"))
    // φ is a literal and N < 2⁵²: the double product is exact enough
    // that ceil never crosses an integer boundary spuriously
    val rank = greatest(ceil(lit(phi) * n).cast("long"), lit(1L))
    val bucket = aggregate(sk,
      struct(lit(0L).as("cum"), lit(null).cast("long").as("b")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("cnt")
        struct(cum.as("cum"),
          coalesce(acc.getField("b"),
            when(cum >= rank, x.getField("bucket"))).as("b"))
      },
      acc => acc.getField("b"))
    hdrLowerBound(bucket, sBits)
  }

  /** Driver/executor-side twin of [[hdrQuantile]] for the streaming
    * state handler (EventStream.hdrQuantileStream): same rank rule
    * (max(⌈φ·N⌉, 1)), same ordered cumulative walk, same
    * [[graft.functions.HdrBuckets.lowerBound]] reconstruction —
    * asserted equal to the batch Column path prefix-for-prefix in
    * StreamingSpec. Empty sketch → None, the exact twin of the Column
    * path's NULL (aggregate over an empty array finds no bucket), so
    * the two surfaces cannot diverge on the degenerate case either. */
  def hdrQuantileJvm(counts: Seq[(Long, Long)], phi: Double,
      sBits: Int): Option[Long] = {
    if (counts.isEmpty) return None
    val sorted = counts.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    val rank = math.max(math.ceil(phi * n).toLong, 1L)
    var cum = 0L
    var i = 0
    var bucket = sorted.last._1
    var found = false
    while (i < sorted.length && !found) {
      cum += sorted(i)._2
      if (cum >= rank) { bucket = sorted(i)._1; found = true }
      i += 1
    }
    Some(graft.functions.HdrBuckets.lowerBound(bucket, sBits))
  }

  /** HDR measurement harness (the q230/q97 shape): build the sketch
    * over the measure, grade its quantile estimates against the EXACT
    * rank-⌈φ·N⌉ values side by side, with the relative error and the
    * in-bound verdict. The exact side runs at value grain (the q127
    * shape: histogram → cumulative → rank lookup), and exists only to
    * grade the sketch — the production path is [[hdrAgg]] +
    * [[hdrQuantile]], no value-grain shuffle at all. Deterministic
    * end to end (integer buckets, counter sums, ordered folds): the
    * SQL oracle replays every digit. */
  def hdrQuantileAccuracy(df: DataFrame, groupCol: String,
      measureCol: String, sBits: Int, phis: Seq[Double]): DataFrame = {
    require(phis.nonEmpty, "hdrQuantileAccuracy: need at least one phi")
    val vals = df.select(col(groupCol).as("grp"),
        col(measureCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val sketch = vals.groupBy(col("grp"))
      .agg(hdrAgg(col("v"), sBits).as("hdr"))
    // exact side, value grain: domain histogram + ordered cumulative
    val wOrd = Window.partitionBy(col("grp")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("grp"))
    val ranked = vals.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
    val perPhi = phis.map { phi =>
      val rank = greatest(ceil(lit(phi) * col("n")).cast("long"), lit(1L))
      ranked.filter(col("cum") >= rank)
        .groupBy(col("grp"))
        .agg(min(col("v")).as("exact_q"), first(col("n")).as("n"))
        .withColumn("phi", lit(phi))
    }.reduce(_ unionByName _)
    // the probes run on the group-grain sketch frame (tiny), one row
    // per (group, phi), then broadcast-join back to the exact side
    val probes = phis.map { phi =>
      sketch.select(col("grp"), lit(phi).as("phi"),
        hdrQuantile(col("hdr"), phi, sBits).as("hdr_q"))
    }.reduce(_ unionByName _)
    perPhi.join(broadcast(probes), Seq("grp", "phi"))
      .select(col("grp"), col("phi"), col("n"), col("exact_q"),
        col("hdr_q"))
      .withColumn("rel_err",
        round((col("exact_q") - col("hdr_q")).cast("double") /
          greatest(abs(col("hdr_q")).cast("double"), lit(1.0)), 6))
      // |q̂| ≤ |v*| < |q̂|·(1+2^−s) with matching sign (the bound is
      // magnitude-relative; negative buckets mirror, so the estimate
      // is the endpoint closest to zero on either side)
      .withColumn("within_bound",
        (signum(col("hdr_q")) === signum(col("exact_q")) ||
          col("hdr_q") === col("exact_q")) &&
          abs(col("hdr_q")) <= abs(col("exact_q")) &&
          (abs(col("exact_q")) - abs(col("hdr_q"))).cast("double") <
            abs(col("hdr_q")).cast("double") / math.pow(2.0, sBits) +
              lit(1.0))
      .orderBy(col("grp"), col("phi"))
  }

  // -------------------------------------------------------------------
  // Persistable sketch state + stored-state rollup (the lakehouse
  // pattern: daily sketches on parquet -> monthly rollup WITHOUT
  // rescanning raw data). KMV/CMS/HDR states are symmetric multiset
  // functions, so stored-merge ≡ direct-build hash-exactly (q234 gate,
  // LakeSpec parquet round-trip); Misra-Gries rolls up with the
  // mergeable-summaries guarantee instead of exact state equality.
  // -------------------------------------------------------------------

  /** Column surface of [[graft.functions.KmvStateAgg]]: the PERSISTABLE
    * KMV form — the sorted `array<long>` of the k smallest distinct
    * hashes, storable on parquet and re-mergeable by [[kmvMergeState]].
    */
  def kmvState(hash: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.KmvStateAgg(ColumnBridge.expression(hash), k)
        .toAggregateExpression())
  }

  /** Column surface of [[graft.functions.KmvMergeAgg]]: folds stored
    * KMV state columns into the combined state — hash-identical to a
    * direct build over the union of the inputs' raw data, PROVIDED
    * the stored states were built with k' >= this k (see the
    * aggregate's precondition note: merging down is exact, merging up
    * silently biases low, and the state cannot carry its k). */
  def kmvMergeState(state: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.KmvMergeAgg(ColumnBridge.expression(state), k)
        .toAggregateExpression())
  }

  /** The [[kmvEstimate]] pair derived from a STORED state array by
    * plain projection: n_seen = size(state) (the buffer is bounded at
    * k), kth_min = last element (the state is sorted ascending). */
  def kmvEstimateFromState(state: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    kmvEstimate(size(state).cast("long"),
      when(size(state) > 0, element_at(state, -1)), k)

  /** Column surface of [[graft.functions.CmsMergeAgg]]: folds stored
    * CMS counter matrices (element-wise add) — exact, any rollup tree. */
  def cmsMerge(cms: org.apache.spark.sql.Column, depth: Int, width: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.CmsMergeAgg(ColumnBridge.expression(cms),
        depth, width).toAggregateExpression())
  }

  /** Column surface of [[graft.functions.HdrMergeAgg]]: folds stored
    * HDR bucket histograms (bucket-wise count add) — exact, any rollup
    * tree, no sBits needed to merge. */
  def hdrMerge(sk: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.HdrMergeAgg(ColumnBridge.expression(sk))
        .toAggregateExpression())
  }

  /** Canonical content digest of a stored long-array sketch state
    * (KMV): md5 over the comma-joined decimal values — replayable in
    * any SQL engine, used by the q234 stored-merge gate. */
  def longArrayDigest(arr: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    md5(concat_ws(",", transform(arr, x => x.cast("string"))))

  /** Same digest for a CMS matrix (rows flattened in order). */
  def cmsDigest(cms: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = longArrayDigest(flatten(cms))

  /** Same digest for an HDR histogram (`bucket:cnt` pairs in bucket
    * order — the aggregates emit sorted histograms). */
  def hdrDigest(sk: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    md5(concat_ws(",", transform(sk, e =>
      concat_ws(":", e.getField("bucket").cast("string"),
        e.getField("cnt").cast("string")))))

  /** Misra-Gries rollup over STORED candidate summaries (the
    * [[MisraGriesAgg]] output column): pairwise residual-add + cut at
    * the (k+1)-th largest — the mergeable-summaries form (Agarwal et
    * al. 2012). Unlike KMV/CMS/HDR the summary is order-sensitive, so
    * rollup is NOT hash-identical to a direct build; the containment
    * guarantee (every value with true frequency > N/(k+1) survives)
    * holds for any merge tree and is what the spec asserts. */
  class MisraGriesMergeAgg(k: Int)
      extends Aggregator[Seq[MgCandidate],
        scala.collection.mutable.HashMap[String, Long], Seq[MgCandidate]] {
    type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(b: Buf, cands: Seq[MgCandidate]): Buf =
      mgAddAndCut(b, cands.map(c => c.tok -> c.n), k)

    override def merge(a: Buf, b: Buf): Buf = mgAddAndCut(a, b, k)

    override def finish(b: Buf): Seq[MgCandidate] =
      b.toSeq.map { case (t, n) => MgCandidate(t, n) }
        .sortBy(c => (-c.n, c.tok))

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[MgCandidate]] =
      ExpressionEncoder[Seq[MgCandidate]]()
  }

  /** Rollup of stored heavy-hitter summaries to a coarser group grain:
    * one aggregation over `candCol` (a [[heavyHitters]] output column,
    * possibly persisted and read back). */
  def mergeHeavyHitters(df: DataFrame, groupCol: String, candCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGriesMergeAgg(k),
      ExpressionEncoder[Seq[MgCandidate]]())
    df.groupBy(col(groupCol))
      .agg(mg(col(candCol)).as("candidates"))
  }
}
