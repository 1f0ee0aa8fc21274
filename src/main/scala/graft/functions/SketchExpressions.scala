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
