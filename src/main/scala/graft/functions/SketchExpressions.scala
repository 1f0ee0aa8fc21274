package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bounded k-minimum-values state: the k smallest DISTINCT hash values
  * seen so far. Insertion keeps the invariant directly (reject ≥ max
  * once full), so state is O(k) longs regardless of input cardinality
  * — and the k-smallest-distinct SET is order-independent, which is
  * what makes the aggregate deterministic under any partitioning.
  */
final class KmvBuffer(val k: Int) {
  // sorted distinct; last() is the current k-th minimum once size == k
  val mins = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.pollLast(); () }
    }
  }
}

/** Native KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the bounded-state form of the
  * composed [[graft.operators.Sketches.kmvDistinct]] pipeline
  * (distinct → per-group window top-k). The composed form shuffles
  * ONE ROW PER DISTINCT hash; this aggregate ships one ≤k-long buffer
  * per (partition, group) partial and merges map-side like any
  * partial aggregate — the crawl-scale shape when the distinct domain
  * itself is huge. Same estimator (Bar-Yossef et al. 2002), same
  * output: the two forms are asserted equal on every group.
  *
  * Input is the already-hashed value (e.g. `GF.hash32`): keeping the
  * hash outside the aggregate keeps the hot projection codegen'd and
  * the aggregate generic over any long-valued hash. Null hashes are
  * skipped. Output is `struct(n_seen, kth_min)`; callers derive the
  * estimate `(k-1)·2³² / kth_min` (or exact `n_seen` when `n_seen<k`)
  * in a plain projection.
  *
  * SQL surface: `graft_kmv(h, k)` (k a literal), registered through
  * [[graft.GraftExtensions]].
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"graft_kmv: k must be >= 1, got $k")

  override def prettyName: String = "graft_kmv"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv expects an integral hash column, got ${dt.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_seen", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = true)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.mins.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.mins.size.toLong
    val kth: Any = if (n == 0) null else buf.mins.last()
    InternalRow(n, kth)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.mins.size)
    bb.putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.mins.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Count-Min Sketch state: a depth × width counter matrix. Every
  * insert bumps ONE counter per row (the row's universal-hash bucket),
  * so the matrix is a sum over inputs — merge is element-wise add and
  * the result is order- and partitioning-independent by construction.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  /** h is contractually the portable 32-bit hash (GF.hash32 ∈ [0, 2³²)).
    * Row i's bucket is GF.universalHash(·, i) mod width — the same
    * (2i+1)·h + (101i+17) mod 4294967311 family minhash uses, so the
    * SQL oracle replays every counter bit-for-bit. The SQL surface
    * (`graft_cms`) accepts ANY integral column, though: mask to the low
    * 32 bits BEFORE the arithmetic so an out-of-contract input (a
    * negative hash, or a full-range long whose h·(2i+1) would overflow)
    * lands in a valid bucket instead of throwing
    * ArrayIndexOutOfBoundsException mid-aggregate. In-contract inputs
    * already satisfy h == (h & 0xFFFFFFFF), so oracle parity is
    * untouched; after the mask h·31 + c < 2³⁷, far inside Long. */
  def add(h: Long): Unit = {
    val h32 = h & 0xFFFFFFFFL
    var i = 0
    while (i < depth) {
      val u = (h32 * (2L * i + 1) + (101L * i + 17)) % 4294967311L
      counts(i * width + (u % width).toInt) += 1L
      i += 1
    }
  }
}

/** Native Count-Min Sketch (Cormode & Muthukrishnan 2005) as a
  * `TypedImperativeAggregate` — the frequency-estimate member of the
  * sketch trio next to [[KmvSketchAgg]] (distinct counts) and
  * `MisraGriesAgg` (heavy-hitter candidates). CMS answers "how often
  * does key x occur?" for ANY x with a one-sided guarantee
  * (estimate ≥ true count; overshoot ≤ N/width per row, min over
  * depth rows) from O(depth · width) state — the corpus-scale shape
  * when the vocabulary itself is too large to shuffle: partials merge
  * map-side like any partial aggregate, the exchange carries one
  * fixed-size matrix per (partition, group), and probe keys are
  * scored later in a plain projection (see
  * [[graft.operators.Sketches.cmsEstimate]]) without touching the
  * corpus again.
  *
  * Input is the already-hashed value (`GF.hash32`), same contract as
  * [[KmvSketchAgg]]: the hash stays in the codegen'd hot projection,
  * the aggregate stays generic over any long-valued hash. Null hashes
  * are skipped. Row hashes are the minhash universal family
  * (`GF.universalHash`), fully replayable in portable SQL — so the
  * DuckDB oracle reproduces not just the error bound but every
  * counter and every estimate digit. Output is the counter matrix
  * `array<array<long>>` (depth rows of width counters).
  *
  * SQL surface: `graft_cms(h, depth, width)` (literals), registered
  * through [[graft.GraftExtensions]].
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"graft_cms: depth must be in [1,16], got $depth")
  require(width >= 2, s"graft_cms: width must be >= 2, got $width")

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms expects an integral hash column, got ${dt.catalogString}")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < buf.counts.length) {
      buf.counts(i) += other.counts(i); i += 1
    }
    buf
  }

  override def eval(buf: CmsBuffer): Any = {
    val rows = new Array[Any](depth)
    var i = 0
    while (i < depth) {
      val row = new Array[Any](width)
      var j = 0
      while (j < width) { row(j) = buf.counts(i * width + j); j += 1 }
      rows(i) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.counts.length)
    var i = 0
    while (i < buf.counts.length) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(depth, width)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Shared bucket arithmetic for the HDR quantile sketch — ONE
  * implementation used by the aggregate's update path, the Column-side
  * reconstruction ([[graft.operators.Sketches.hdrLowerBound]]) and the
  * specs, so the three can never drift.
  *
  * Base-2 log buckets with `sBits` linear sub-buckets per octave (the
  * HdrHistogram layout, Tene; same guarantee family as DDSketch,
  * Masson/Rim/Lee VLDB'19): for a ≥ 2^s with n = ⌊log₂ a⌋,
  * bucket = (n−s)·2^s + (a >> (n−s)); values below 2^s are exact.
  * The map is monotone and CONTIGUOUS (level n's last bucket + 1 is
  * level n+1's first), every bucket spans ≤ 2^(n−s) values, so a
  * bucket's lower bound under-estimates any member by a factor
  * ≤ 1 + 2^−s. Negative values mirror through the sign
  * (bucket(−a) = −bucket(a)), keeping the whole map monotone over the
  * full signed-long line. All arithmetic is exact integer ops — which
  * is the point: the SQL oracle replays every bucket id and every
  * lower bound digit-for-digit, no float log anywhere. */
object HdrBuckets {
  def bucketOf(v: Long, sBits: Int): Long = {
    val neg = v < 0
    // |Long.MinValue| overflows; clamp to MaxValue — same bucket as
    // MaxValue, an error of < 2^-s at the extreme of the line
    val a = if (v == Long.MinValue) Long.MaxValue
            else if (neg) -v else v
    val b =
      if (a < (1L << sBits)) a
      else {
        val n = 63 - java.lang.Long.numberOfLeadingZeros(a)
        ((n - sBits).toLong << sBits) + (a >>> (n - sBits))
      }
    if (neg) -b else b
  }

  /** Inverse: the smallest |value| landing in bucket `b` (sign
    * mirrored for b < 0 — the bucket endpoint CLOSEST TO ZERO, so the
    * relative-error bound holds with the same sign convention). */
  def lowerBound(b: Long, sBits: Int): Long = {
    val neg = b < 0
    val ba = if (neg) -b else b
    val lb =
      if (ba < (1L << (sBits + 1))) ba
      else {
        val nMinusS = (ba >> sBits) - 1
        val sub = (ba & ((1L << sBits) - 1)) + (1L << sBits)
        sub << nMinusS.toInt
      }
    if (neg) -lb else lb
  }
}

/** HDR quantile-sketch state: a sparse bucket → count map. Bounded by
  * construction: ≤ (64 − s)·2^s + 2^(s+1) buckets over the whole
  * signed-long line (s = 7 → ~7.5k), in practice ⌈log₂(max/min)⌉·2^s
  * for the data's actual range — independent of row count AND of the
  * value domain's cardinality, which is what the exact value-grain
  * quantile path can't promise. */
final class HdrBuffer {
  val counts = new scala.collection.mutable.LongMap[Long]()

  def add(bucket: Long): Unit =
    counts.update(bucket, counts.getOrElse(bucket, 0L) + 1L)
}

/** Native HDR quantile sketch as a `TypedImperativeAggregate` — the
  * quantile member of the sketch family next to [[KmvSketchAgg]]
  * (distinct counts), `MisraGriesAgg` (heavy hitters) and
  * [[CmsSketchAgg]] (frequencies). Answers "what value sits at rank
  * ⌈φ·N⌉?" to within a 2^−sBits RELATIVE VALUE error from
  * O(2^s · log range) state per group: partials merge map-side
  * (bucket-wise add), the exchange carries one small map per
  * (partition, group), and quantile probes are plain projections over
  * the finished sketch ([[graft.operators.Sketches.hdrQuantile]]) —
  * the corpus is never rescanned and the value domain is never
  * shuffled.
  *
  * Why fixed log-buckets and not KLL/GK: a compaction-based sketch's
  * state depends on MERGE ORDER — two runs over the same multiset
  * with different partitionings give different (equally valid)
  * sketches, so no SQL oracle can replay it and no run is
  * reproducible. The fixed-bucket map is a symmetric function of the
  * input multiset: order- and partition-independent by construction
  * (the q230 CMS discipline), deterministic to the last digit, at the
  * cost of a value-relative rather than rank-relative guarantee.
  *
  * Input is the raw long measure (token counts, byte lengths, cents —
  * quantize floats upstream); null skipped. Output is the sorted
  * bucket histogram `array<struct<bucket:long, cnt:long>>`.
  *
  * Guarantee exception: the single input Long.MinValue (|v| = 2⁶³
  * overflows negation) clamps to Long.MaxValue's bucket, so the
  * 2^−sBits relative bound does not hold at that one point of the
  * line — every other long honours it ([[HdrBuckets.bucketOf]]).
  *
  * SQL surface: `graft_hdr(v, sBits)` (sBits literal), registered
  * through [[graft.GraftExtensions]].
  */
case class HdrSketchAgg(
    child: Expression,
    sBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HdrBuffer] with UnaryLike[Expression] {

  require(sBits >= 1 && sBits <= 12,
    s"graft_hdr: sBits must be in [1,12], got $sBits")

  override def prettyName: String = "graft_hdr"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hdr expects an integral measure column, got ${dt.catalogString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): HdrBuffer = new HdrBuffer

  override def update(buf: HdrBuffer, input: InternalRow): HdrBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.add(HdrBuckets.bucketOf(v.asInstanceOf[Number].longValue, sBits))
    buf
  }

  override def merge(buf: HdrBuffer, other: HdrBuffer): HdrBuffer = {
    other.counts.foreachEntry { (b, c) =>
      buf.counts.update(b, buf.counts.getOrElse(b, 0L) + c)
    }
    buf
  }

  override def eval(buf: HdrBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy(_._1)
    val rows = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      rows(i) = InternalRow(sorted(i)._1, sorted(i)._2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: HdrBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.counts.size)
    bb.putInt(buf.counts.size)
    buf.counts.foreachEntry { (b, c) => bb.putLong(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HdrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new HdrBuffer
    var i = 0
    while (i < n) { buf.counts.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HdrSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HdrSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HdrSketchAgg =
    copy(child = newChild)
}

// ---------------------------------------------------------------------
// Persistable sketch STATE + stored-state re-merge aggregates.
//
// The lakehouse rollup pattern (daily sketches written to parquet,
// merged into weekly/monthly sketches WITHOUT rescanning raw data)
// needs two things the in-flight aggregates above don't expose: a
// full-state output for KMV (struct(n_seen, kth_min) is an ANSWER, not
// a mergeable state — re-merging needs all k minima), and aggregates
// whose INPUT is a stored state column. CMS and HDR already emit their
// full state (counter matrix / bucket histogram), so they only need
// the merge side. All three states are symmetric functions of the
// input multiset (k-smallest-distinct set, counter sums, bucket sums),
// so stored-merge ≡ direct-build EXACTLY — asserted hash-for-hash by
// the q234 gate and the LakeSpec parquet round-trip.
// ---------------------------------------------------------------------

/** KMV full-state output: the sorted array of the k smallest distinct
  * hashes — the PERSISTABLE form of [[KmvSketchAgg]] (same buffer, same
  * update path). `struct(n_seen, kth_min)` is derivable by projection
  * (`size(state)`, `element_at(state, -1)`), so this strictly
  * supersedes it for storage; the answer-shaped twin stays for the
  * in-flight surfaces that never persist.
  *
  * SQL surface: `graft_kmv_state(h, k)`. */
case class KmvStateAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"graft_kmv_state: k must be >= 1, got $k")

  override def prettyName: String = "graft_kmv_state"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_state expects an integral hash column, got ${dt.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.mins.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = KmvStateAgg.evalState(buf)

  override def serialize(buf: KmvBuffer): Array[Byte] =
    KmvStateAgg.serializeState(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvStateAgg.deserializeState(bytes, k)

  override def withNewMutableAggBufferOffset(offset: Int): KmvStateAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvStateAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvStateAgg =
    copy(child = newChild)
}

object KmvStateAgg {
  /** TreeSet iterates ascending, so the emitted state is sorted — the
    * canonical form both the oracle and the equality gates rely on. */
  def evalState(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def serializeState(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.mins.size)
    bb.putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserializeState(bytes: Array[Byte], k: Int): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.mins.add(bb.getLong); i += 1 }
    buf
  }
}

/** Re-merge of STORED KMV states: folds `array<long>` state columns
  * (from [[KmvStateAgg]], possibly persisted and read back) into the
  * combined state. Exact by the bottom-k algebra: bottom-k(A ∪ B) =
  * bottom-k(bottom-k(A) ∪ bottom-k(B)), so any rollup tree gives the
  * hash-identical state a direct build over the raw data would.
  *
  * PRECONDITION (contractual — the state array cannot carry its k, so
  * unlike [[CmsMergeAgg]]'s dimension check this cannot fail fast):
  * stored states must have been built with k' >= this merge's k.
  * Merging DOWN (k <= k') is exact — bottom-k of bottom-k' unions is
  * the true bottom-k. Merging UP (k > k') is silently wrong: each
  * stored array already dropped values ranked past k' that may belong
  * in the union's bottom-k, so the merged state saturates with the
  * wrong members and the estimate biases low. A stored array LONGER
  * than k is accepted (that is the k' > k case); keeping one k across
  * the whole lake is the simple safe policy. */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"graft_kmv_merge: k must be >= 1, got $k")

  override def prettyName: String = "graft_kmv_merge"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv_merge expects array<bigint> KMV state, got ${dt.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { buf.insert(arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.mins.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = KmvStateAgg.evalState(buf)

  override def serialize(buf: KmvBuffer): Array[Byte] =
    KmvStateAgg.serializeState(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvStateAgg.deserializeState(bytes, k)

  override def withNewMutableAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** Re-merge of STORED CMS matrices: folds `array<array<long>>` state
  * columns (from [[CmsSketchAgg]], possibly persisted) by element-wise
  * add. Counters are sums over the input multiset, so any rollup tree
  * reproduces the direct build exactly. A stored matrix whose
  * dimensions don't match the declared (depth, width) fails fast —
  * silently adding misaligned counters would yield plausible garbage.
  *
  * SQL surface: `graft_cms_merge(cms, depth, width)`. */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"graft_cms_merge: depth must be in [1,16], got $depth")
  require(width >= 2, s"graft_cms_merge: width must be >= 2, got $width")

  override def prettyName: String = "graft_cms_merge"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(LongType, _), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_merge expects array<array<bigint>> CMS state, got ${dt.catalogString}")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (m.numElements() != depth)
        throw new IllegalArgumentException(
          s"graft_cms_merge: stored sketch depth ${m.numElements()} != $depth")
      var i = 0
      while (i < depth) {
        val row = m.getArray(i)
        if (row.numElements() != width)
          throw new IllegalArgumentException(
            s"graft_cms_merge: stored sketch width ${row.numElements()} != $width")
        var j = 0
        while (j < width) {
          buf.counts(i * width + j) += row.getLong(j); j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < buf.counts.length) {
      buf.counts(i) += other.counts(i); i += 1
    }
    buf
  }

  override def eval(buf: CmsBuffer): Any = {
    val rows = new Array[Any](depth)
    var i = 0
    while (i < depth) {
      val row = new Array[Any](width)
      var j = 0
      while (j < width) { row(j) = buf.counts(i * width + j); j += 1 }
      rows(i) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.counts.length)
    var i = 0
    while (i < buf.counts.length) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(depth, width)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Re-merge of STORED HDR histograms: folds
  * `array<struct<bucket,cnt>>` state columns (from [[HdrSketchAgg]],
  * possibly persisted) by bucket-wise count add. Bucket ids are
  * data-independent (fixed log-bucket map), so no sBits parameter is
  * needed to merge and any rollup tree reproduces the direct build
  * exactly.
  *
  * SQL surface: `graft_hdr_merge(sk)`. */
case class HdrMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HdrBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_hdr_merge"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
          StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hdr_merge expects array<struct<bucket:bigint,cnt:bigint>> HDR state, got ${dt.catalogString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): HdrBuffer = new HdrBuffer

  override def update(buf: HdrBuffer, input: InternalRow): HdrBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val e = arr.getStruct(i, 2)
        val b = e.getLong(0)
        buf.counts.update(b, buf.counts.getOrElse(b, 0L) + e.getLong(1))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: HdrBuffer, other: HdrBuffer): HdrBuffer = {
    other.counts.foreachEntry { (b, c) =>
      buf.counts.update(b, buf.counts.getOrElse(b, 0L) + c)
    }
    buf
  }

  override def eval(buf: HdrBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy(_._1)
    val rows = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      rows(i) = InternalRow(sorted(i)._1, sorted(i)._2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: HdrBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.counts.size)
    bb.putInt(buf.counts.size)
    buf.counts.foreachEntry { (b, c) => bb.putLong(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HdrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new HdrBuffer
    var i = 0
    while (i < n) { buf.counts.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HdrMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HdrMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HdrMergeAgg =
    copy(child = newChild)
}
