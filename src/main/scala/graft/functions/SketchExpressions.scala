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
