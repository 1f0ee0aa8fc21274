package graft.operators

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
  * join — the oracle for q227 is the plain SQL join.
  *
  * Sizing: bits = -n·ln(fpp)/ln(2)², the standard formula; at the
  * default fpp=1% that is ~9.6 bits/key — a 10M-key build side costs a
  * 12 MB sketch, far below what a broadcast hash relation for the same
  * keys would need (and the sketch ships once per executor). Keys are
  * hashed with XxHash64 on BOTH sides, the same pairing Spark's
  * InjectRuntimeFilter plants, so any key type works and the probe
  * stays inside whole-stage codegen.
  */
object JoinPrune {

  /** Build a serialized bloom filter over `keys(keyCol)` with a
    * distributed aggregate (map-side partials merge; the driver only
    * ever sees the final ~bits/8-byte sketch). */
  def buildBloom(keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: n=$expectedKeys fpp=$fpp")
    val numBits = math.max(64L,
      math.ceil(-expectedKeys * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val hashed = XxHash64(Seq(ColumnBridge.expression(col(keyCol))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    val row = keys.filter(col(keyCol).isNotNull)
      .select(ColumnBridge.column(agg).as("bf")).head()
    row.getAs[Array[Byte]]("bf")
  }

  /** Codegen'd probe column: true iff `keyCol` MIGHT be in the bloom.
    * Null keys probe to null, so a filter on it also drops null keys —
    * matching inner/semi join semantics. */
  def mightContain(keyCol: Column, bloom: Array[Byte]): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ColumnBridge.expression(keyCol)))))

  /** Prune `fact` to rows whose `factKey` might match the bloom. This
    * is the pre-exchange filter: place it directly on the scan so only
    * ~selectivity·N + fpp·N rows enter the shuffle. */
  def bloomPrune(fact: DataFrame, factKey: String,
      bloom: Array[Byte]): DataFrame =
    fact.filter(mightContain(col(factKey), bloom))

  /** Exact semi join accelerated by a bloom pre-filter: prune the fact
    * side with the sketch, then finish with the real left-semi join
    * (which eliminates bloom false positives). `expectedKeys` sizes the
    * sketch; pass the build side's approximate distinct count. */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame,
      factKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedKeys, fpp)
    bloomPrune(fact, factKey, bloom)
      .join(build.select(col(buildKey)).distinct(),
        col(factKey) === col(buildKey), "leftsemi")
  }
}
