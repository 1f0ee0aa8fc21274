package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the two hottest scalar chains in the engine —
  * measured (r17 profiling) as the dominant CPU of every shingle /
  * token / digest stage:
  *
  *  - [[Md5Hash32Expr]] computes `conv(substring(md5(s), off, 8), 16,
  *    10)::long` without materializing the 32-char hex string or
  *    string-parsing it back: one digest, eight nibbles read straight
  *    from the digest bytes. Same value bit-for-bit (GFSpec pins
  *    equality against the composed form and the JVM twin); the oracle
  *    side is untouched — DuckDB still replays the hex/conv form.
  *  - [[NormTextExpr]] / [[NormTokensExpr]] compute
  *    `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9]+", " "),
  *    "\\s+", " "))` and its whitespace-token split in ONE pass over
  *    the UTF-8 bytes instead of two full regex rewrites plus a regex
  *    split. Lowercasing delegates to `UTF8String.toLowerCase` — the
  *    exact method Spark's `lower` calls — and the run scan uses the
  *    UTF-8 property that multi-byte sequences never contain ASCII
  *    bytes, so "maximal [a-z0-9] runs of the lowered string" is
  *    byte-exact with the regex composition (GFSpec pins equality on
  *    curated fixtures; PropertySpec sweeps generated Unicode strings
  *    against the composed forms).
  *
  * Both are per-row scalars with static-call codegen (the
  * CharEntropyExpr pattern): no UDF, no boxing, WholeStageCodegen
  * keeps the row pipeline fused.
  */
object HotExpressions {

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of hex nibbles [hexOffset, hexOffset+8) (1-based) of
    * md5(s), as an unsigned-in-63-bits long — bit-equal to
    * `conv(substring(md5(s), hexOffset, 8), 16, 10)::long`. */
  def md5Window32(s: UTF8String, hexOffset: Int): Long = {
    val md = mdPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var k = hexOffset - 1
    val end = hexOffset + 7
    while (k < end) {
      val b = digest(k >> 1) & 0xff
      val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      k += 1
    }
    v
  }

  /** Both hex windows of ONE md5 digest — the two-band fingerprint
    * form ([[Md5Hash32Expr]] twice would digest twice). */
  def md5Window32Pair(s: UTF8String, off1: Int,
      off2: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val md = mdPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    def window(off: Int): Long = {
      var v = 0L
      var k = off - 1
      val end = off + 7
      while (k < end) {
        val b = digest(k >> 1) & 0xff
        val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
        v = (v << 4) | nib
        k += 1
      }
      v
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](window(off1), window(off2)))
  }

  private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** One-pass twin of `Dedup.normalizeText`: lowercase, then the
    * maximal [a-z0-9] runs joined by single spaces. */
  def normText(s: UTF8String): UTF8String = {
    val low = s.toLowerCase
    val n = low.numBytes
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var inRun = false
    while (i < n) {
      val b = low.getByte(i)
      if (isKeep(b)) {
        if (!inRun && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b; o += 1
        inRun = true
      } else inRun = false
      i += 1
    }
    // trailing space never emitted (spaces only precede a kept byte)
    UTF8String.fromBytes(out, 0, o)
  }

  /** One-pass twin of `GF.wsTokens(Dedup.normalizeText(s))`: the
    * maximal [a-z0-9] runs of the lowered string, as an array. */
  def normTokens(s: UTF8String): ArrayData = {
    val low = s.toLowerCase
    val n = low.numBytes
    val toks = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      if (isKeep(low.getByte(i))) {
        val start = i
        while (i < n && isKeep(low.getByte(i))) i += 1
        toks += copyBytes(low, start, i)
      } else i += 1
    }
    new GenericArrayData(toks.toArray)
  }

  private def copyBytes(s: UTF8String, from: Int, until: Int): UTF8String = {
    val arr = new Array[Byte](until - from)
    var k = from
    while (k < until) { arr(k - from) = s.getByte(k); k += 1 }
    UTF8String.fromBytes(arr)
  }
}

/** `conv(substring(md5(s), hexOffset, 8), 16, 10)::long` as one native
  * expression — the portable-hash primitive under every minhash /
  * simhash / sketch / sampling operator, minus the hex-string
  * round-trip. */
case class Md5Hash32Expr(child: Expression, hexOffset: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_hash32"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string" &&
        hexOffset >= 1 && hexOffset <= 25) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and 1 <= hexOffset <= 25")

  override def nullSafeEval(input: Any): Any =
    HotExpressions.md5Window32(input.asInstanceOf[UTF8String], hexOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HotExpressions.md5Window32($c, $hexOffset)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Expr =
    copy(child = newChild)
}

/** Two hex windows of one md5 digest as struct<h1:long, h2:long> —
  * bit-equal to (conv(substring(md5(s), off1, 8), 16, 10),
  * conv(substring(md5(s), off2, 8), 16, 10)) with a single digest and
  * no hex round-trip. */
case class Md5Hash32PairExpr(child: Expression, off1: Int, off2: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_hash32_pair"
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h2", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string" &&
        off1 >= 1 && off1 <= 25 && off2 >= 1 && off2 <= 25)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and 1 <= offsets <= 25")

  override def nullSafeEval(input: Any): Any =
    HotExpressions.md5Window32Pair(input.asInstanceOf[UTF8String], off1, off2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HotExpressions.md5Window32Pair($c, $off1, $off2)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash32PairExpr = copy(child = newChild)
}

/** One-pass canonical text normalization (lowercase, non-[a-z0-9] runs
  * to single spaces, trimmed) — the native form of the regex chain in
  * `Dedup.normalizeText`. */
case class NormTextExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_norm_text"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any =
    HotExpressions.normText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HotExpressions.normText($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)
}

/** One-pass normalized whitespace tokens — the native form of
  * `GF.wsTokens(Dedup.normalizeText(s))`, the tokenization under every
  * shingle / n-gram / token-count operator. Declared with the same
  * array type (containsNull = true) as the split-based form so plans
  * and schemas are unchanged. */
case class NormTokensExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_norm_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any =
    HotExpressions.normTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HotExpressions.normTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTokensExpr =
    copy(child = newChild)
}
