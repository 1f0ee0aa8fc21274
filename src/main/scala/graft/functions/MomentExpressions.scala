package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact first + second moments of a quantized embedding column in ONE
  * pass: row count, per-dimension sums Σqᵢ, and the upper triangle of
  * the product sums Σqᵢqⱼ — the inputs the exact-integer covariance
  * (Profiling.pcaPowerComponent) needs.
  *
  * Why an aggregate and not the flatten+posexplode pipeline it
  * replaces: the relational form materialized n·d(d+1)/2 UnsafeRows
  * BEFORE the partial aggregate — invisible at test dims, a ~295k-row
  * expansion PER INPUT ROW at production embedding dims (768). Here
  * the per-row work is the same d(d+1)/2 multiply-adds but into a
  * flat primitive buffer, zero row materialization; the exchange
  * carries one buffer per partition partial (16 bytes/cell), and the
  * output is a single row the caller posexplodes at CELL grain —
  * d(d+1)/2 rows total, not per input row.
  *
  * Exactness: each cell accumulates in a SIGNED 128-BIT integer
  * (hi/lo long pair, carry-propagating adds), so cell sums are exact
  * for any row count (overflow would need Σ|qᵢqⱼ| ≥ 2¹²⁷); products
  * qᵢ·qⱼ themselves ride 64-bit math, exact as long as |q| < 3.0e9 —
  * the same contract as the long-arithmetic pipeline this replaces
  * (1e-4-unit quantization ⇒ |v| < 3e5, far beyond real embeddings).
  * Output decimals are DECIMAL(38,0), bit-identical to the old
  * `sum(cast(decimal(38,0)))` cells, so the q175 oracle is untouched.
  *
  * Input: the pre-quantized `array<long>` vector (quantization stays
  * in the codegen'd projection, the aggregate stays generic). Rows
  * whose length differs from `dims` are SKIPPED — same
  * decline-to-null discipline as the caller's ragged-input filter,
  * enforced again here so a mis-wired caller can't mis-key cells.
  * NOTE (r16 advisor): this is an n-semantics change vs the relational
  * form it replaced — a row whose vector contains a NULL element was
  * previously counted in n (its null cells skipped by sum); this
  * aggregate drops the whole row from n, sx and sxy. Intended: a
  * partially-null vector is a malformed input, not a sparse one. A
  * future null-bearing fixture diverging here is this contract, not a
  * regression.
  * Output: `struct(n:long, sx:array<decimal(38,0)>,
  * sxy:array<decimal(38,0)>)` with sxy in row-major upper-triangle
  * order (the caller's pos → (i,j) map).
  */
final class PcaMomentsBuffer(val dims: Int) {
  val tri: Int = dims * (dims + 1) / 2
  var n: Long = 0L
  // cell c ∈ [0, dims): Σq_c; cell dims + t: triangle product sum t
  val hi = new Array[Long](dims + tri)
  val lo = new Array[Long](dims + tri)

  /** acc(idx) += v, signed 128-bit (lo unsigned, hi carries sign). */
  def add(idx: Int, v: Long): Unit = {
    val l = lo(idx)
    val newLo = l + v
    // unsigned carry out of the low word (Hacker's Delight 2-13)
    val carry = ((l & v) | ((l | v) & ~newLo)) >>> 63
    hi(idx) = hi(idx) + (v >> 63) + carry
    lo(idx) = newLo
  }

  /** acc(idx) += (oHi, oLo), 128-bit + 128-bit. */
  def add128(idx: Int, oHi: Long, oLo: Long): Unit = {
    val l = lo(idx)
    val newLo = l + oLo
    val carry = ((l & oLo) | ((l | oLo) & ~newLo)) >>> 63
    hi(idx) = hi(idx) + oHi + carry
    lo(idx) = newLo
  }

  def toBigInteger(idx: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi(idx)).shiftLeft(64)
      .add(new java.math.BigInteger(1, ByteBuffer.allocate(8)
        .putLong(lo(idx)).array()))
}

case class PcaMomentsAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PcaMomentsBuffer]
  with UnaryLike[Expression] {

  require(dims >= 1 && dims <= 4096,
    s"graft_pca_moments: dims must be in [1,4096], got $dims")

  override def prettyName: String = "graft_pca_moments"
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pca_moments expects array<bigint>, got ${dt.catalogString}")
    }

  private val dec = DecimalType(38, 0)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(dec, containsNull = false), nullable = false),
    StructField("sxy", ArrayType(dec, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): PcaMomentsBuffer =
    new PcaMomentsBuffer(dims)

  override def update(buf: PcaMomentsBuffer, input: InternalRow)
      : PcaMomentsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dims && !(0 until dims).exists(arr.isNullAt)) {
        val qs = arr.toLongArray()
        buf.n += 1L
        var i = 0
        var pos = dims
        while (i < dims) {
          val qi = qs(i)
          buf.add(i, qi)
          var j = i
          while (j < dims) {
            buf.add(pos, qi * qs(j)); pos += 1; j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: PcaMomentsBuffer, other: PcaMomentsBuffer)
      : PcaMomentsBuffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.hi.length) {
      buf.add128(i, other.hi(i), other.lo(i)); i += 1
    }
    buf
  }

  override def eval(buf: PcaMomentsBuffer): Any = {
    def decOf(idx: Int): Decimal =
      Decimal(new java.math.BigDecimal(buf.toBigInteger(idx)), 38, 0)
    val sx = new Array[Any](dims)
    var i = 0
    while (i < dims) { sx(i) = decOf(i); i += 1 }
    val sxy = new Array[Any](buf.tri)
    var t = 0
    while (t < buf.tri) { sxy(t) = decOf(dims + t); t += 1 }
    InternalRow(buf.n,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sx),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sxy))
  }

  override def serialize(buf: PcaMomentsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.hi.length)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.hi.length) { bb.putLong(buf.hi(i)); bb.putLong(buf.lo(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PcaMomentsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new PcaMomentsBuffer(dims)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.hi.length) { buf.hi(i) = bb.getLong; buf.lo(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): PcaMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PcaMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): PcaMomentsAgg =
    copy(child = newChild)
}
