package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned joins: shuffle-volume reduction for the 100-TB fact ×
  * selective-dim shape.
  *
  * The problem at scale: `fact JOIN dim_subset` where the dim subset is
  * selective (say 2% of orders) but too large to broadcast. A plain
  * shuffle join moves EVERY fact row through the exchange; the 98% that
  * can never match are shuffled, sorted and only then discarded by the
  * join. Spark's own fix for this shape is runtime row-level filtering
  * (`InjectRuntimeFilter`), but it only fires inside a single query's
  * plan under conf-gated heuristics. This operator makes the same
  * machinery explicit and reusable ACROSS stages/queries: build the
  * bloom once (a distributed `BloomFilterAggregate` — partial-merged,
  * never a driver-side row collect), keep the ~O(bits) sketch, and
  * prune any number of downstream fact scans with a codegen'd
  * `BloomFilterMightContain` probe that sits right on top of the
  * parquet scan, BEFORE the exchange.
  *
  * Exactness is preserved by construction: a bloom filter has no false
  * negatives, so pruning drops only non-matching rows; the false
  * positives it lets through (~fpp of the pruned stream) are removed by
  * the real join that follows. Results are byte-identical to the plain
  * join — the oracle for q227 is the plain SQL semi join.
  *
  * Sizing: bits = -n·ln(fpp)/ln(2)², the standard formula; at the
  * default fpp=1% that is ~9.6 bits/key — a 1M-key build side costs a
  * 1.2 MB sketch, far below what a broadcast hash relation for the same
  * keys would need (and the sketch ships once per executor). Keys are
  * hashed with XxHash64 (seed 42) on BOTH sides, the same pairing
  * Spark's InjectRuntimeFilter plants, so any key type works and the
  * probe stays inside whole-stage codegen.
  */
object JoinPrune extends Logging {

  /** Build a serialized bloom filter over the non-null `keys(keyCol)`
    * with a distributed aggregate (map-side partials merge; the driver
    * only ever sees the final ~bits/8-byte sketch). Returns None when
    * the build side has no non-null keys (the aggregate yields null at
    * cardinality 0) — callers should treat None as "nothing can match".
    *
    * Sizing without a sizing SCAN: `expectedKeys = 0` (the default)
    * sizes from Catalyst plan statistics — driver-side plan metadata,
    * zero extra jobs. `optimizedPlan.stats.rowCount` when the plan
    * carries one (CBO / LocalRelation / limit); otherwise a
    * size-in-bytes estimate (pruned-plan bytes ÷ key width) REFINED
    * DOWNWARD ONLY from the session conf
    * `spark.sql.optimizer.runtime.bloomFilter.expectedNumItems`
    * (1 M items — the same stats-absent default Spark's own
    * InjectRuntimeFilter uses). Downward-only because the byte
    * estimate can be garbage-large after joins (size products), and
    * because parquet's on-disk encoding is narrower than the
    * in-memory `defaultSize` divisor — so the estimate leans small,
    * which is the SAFE direction: under-sizing degrades fpp (the
    * prune admits more false positives, each removed by the real
    * join that follows) but results stay exact. A ~10-100 k-key dim
    * build thus gets a ~tens-of-KB sketch instead of the 1.2 MB
    * conf-default one (every task allocates + merges a partial of
    * that size), while a genuinely huge build still rides the conf
    * default. Callers that know their cardinality can still pass it.
    *
    * `BloomFilterAggregate` silently caps its inputs at the session
    * confs `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits`; we clamp to the same values explicitly and warn, so
    * an over-sized request degrades loudly instead of silently. */
  def buildBloom(keys: DataFrame, keyCol: String,
      expectedKeys: Long = 0L, fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedKeys >= 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: n=$expectedKeys fpp=$fpp")
    val conf = keys.sparkSession.conf
    val sizedKeys = if (expectedKeys > 0) expectedKeys
      else statsExpectedKeys(keys, keyCol)
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val wantBits = math.max(64L,
      math.ceil(-sizedKeys * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    if (sizedKeys > maxItems || wantBits > maxBits) {
      logWarning(s"bloom request (n=$sizedKeys, bits=$wantBits) exceeds " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits); " +
        "clamping — fpp will degrade. Raise the " +
        "spark.sql.optimizer.runtime.bloomFilter.* confs for full sizing.")
    }
    val numItems = math.min(sizedKeys, maxItems)
    val numBits = math.min(wantBits, maxBits)
    logInfo(s"buildBloom($keyCol): expectedKeys=$numItems " +
      s"(${if (expectedKeys > 0) "caller" else "plan stats"}), " +
      s"bits=$numBits (~${numBits / 8192} KiB), fpp=$fpp")
    val hashed = new XxHash64(Seq(ColumnBridge.expression(col(keyCol))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(numItems), Literal(numBits)).toAggregateExpression()
    val row = keys.filter(col(keyCol).isNotNull)
      .select(ColumnBridge.column(agg).as("bf")).head()
    Option(row.getAs[Array[Byte]]("bf"))
  }

  /** Stats-derived expected-keys for [[buildBloom]] — driver-side plan
    * metadata only, zero jobs. `rowCount` when the optimized key
    * projection carries one (CBO / LocalRelation / Range / limit);
    * otherwise `sizeInBytes ÷ key width`, refined DOWNWARD ONLY from
    * the session's expectedNumItems conf (the byte estimate can be
    * garbage-large after joins, and under-sizing is the safe
    * direction — see [[buildBloom]]). */
  private[graft] def statsExpectedKeys(keys: DataFrame,
      keyCol: String): Long = {
    val confDefault = keys.sparkSession.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
      "1000000").toLong
    val plan = keys.select(col(keyCol)).queryExecution.optimizedPlan
    val stats = plan.stats
    stats.rowCount match {
      case Some(rc) => math.max(64L, rc.min(BigInt(Long.MaxValue)).toLong)
      case None =>
        val keyWidth = math.max(1L,
          plan.output.map(_.dataType.defaultSize).sum.toLong)
        val est = stats.sizeInBytes / keyWidth
        if (est <= 0 || est >= confDefault) confDefault
        else math.max(1024L, est.toLong)
    }
  }

  /** Codegen'd probe column: true iff `keyCol` MIGHT be in the bloom.
    * XxHash64 is non-nullable (a null key hashes to the seed), so this
    * alone does NOT drop null keys — `bloomPrune` adds the explicit
    * isNotNull conjunct to match inner/semi join semantics. */
  def mightContain(keyCol: Column, bloom: Array[Byte]): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(keyCol)))))

  /** Prune `fact` to rows whose non-null `factKey` might match the
    * bloom. This is the pre-exchange filter: place it directly on the
    * scan so only ~selectivity·N + fpp·N rows enter the shuffle. The
    * isNotNull conjunct keeps the prune a strict superset-of-semi-join
    * even standalone (null keys never match an equi join). */
  def bloomPrune(fact: DataFrame, factKey: String,
      bloom: Array[Byte]): DataFrame =
    fact.filter(col(factKey).isNotNull && mightContain(col(factKey), bloom))

  /** Exact semi join accelerated by a bloom pre-filter: prune the fact
    * side with the sketch, then finish with the real left-semi join
    * (which eliminates bloom false positives). `expectedKeys` sizes the
    * sketch when known; the 0 default sizes from the session's
    * expectedNumItems conf with NO pre-count scan (see
    * [[buildBloom]] — under-sizing only degrades fpp). An empty
    * (or all-null-keyed) build side short-circuits to zero rows. The
    * build key is renamed to a reserved name before the join so
    * same-named fact/build keys (the normal case) never hit an
    * ambiguous-reference error. */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame,
      factKey: String, buildKey: String,
      expectedKeys: Long = 0L, fpp: Double = 0.01): DataFrame =
    buildBloom(build, buildKey, expectedKeys, fpp) match {
      case None => fact.limit(0)
      case Some(bloom) =>
        val keys = build.select(col(buildKey).as("__jp_key")).distinct()
        bloomPrune(fact, factKey, bloom)
          .join(keys, col(factKey) === col("__jp_key"), "leftsemi")
    }
}
