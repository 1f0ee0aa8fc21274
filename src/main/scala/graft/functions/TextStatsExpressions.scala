package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the quality-signal battery
  * (`TextAnalysis.qualitySignals`) — the per-document scoring pass a
  * curation funnel runs over EVERY document of the corpus, so its
  * per-row cost is a first-order term at 100 TB.
  *
  * The composable form spent three full `regexp_replace` scans of the
  * text (punctuation / digit / uppercase counts via length deltas)
  * plus an interpreted higher-order `filter(..., isin(...))` for the
  * stopword count — HOFs are CodegenFallback, so that filter also
  * broke whole-stage codegen for the whole projection (the q172
  * megamorphic-degradation hazard). These expressions compute the same
  * numbers in one byte-walk / one hash-probe loop, inside codegen.
  *
  * Exactness contract (the DuckDB oracles hash the derived ratios):
  *  - `graft_char_class_counts` returns [n_chars, n_punct, n_digit,
  *    n_upper] with the regex classes' exact semantics: n_chars =
  *    `length(t)` (code points); n_punct = code points NOT matching
  *    `[A-Za-z0-9\s]` (Java `\s` is ASCII-only, so EVERY non-ASCII
  *    code point counts as punct, exactly as the regex class does);
  *    n_digit = `[0-9]`; n_upper = `[A-Z]`. Code points are counted
  *    as UTF-8 lead bytes (continuation bytes 0b10xxxxxx skipped) —
  *    the same count `UTF8String.numChars` gives `length()`.
  *  - `graft_count_in_set` counts array elements (occurrences, not
  *    distinct) equal to a member of the literal set — the
  *    `size(filter(arr, t -> t.isin(...)))` semantics.
  */
object TextStats {
  /** [n_chars, n_punct (non-[A-Za-z0-9\s]), n_digit, n_upper]. */
  def charClassCounts(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var chars = 0L
    var punct = 0L
    var digit = 0L
    var upper = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) { // a code point starts here
        chars += 1
        if (b >= 0) { // ASCII
          val c = b.toChar
          if (c >= '0' && c <= '9') digit += 1
          else if (c >= 'A' && c <= 'Z') upper += 1
          else if (!((c >= 'a' && c <= 'z') || c == ' ' || c == '\t' ||
              c == '\n' || c == '\u000B' || c == '\f' || c == '\r'))
            punct += 1
        } else punct += 1 // non-ASCII: outside every ASCII class
      }
      i += 1
    }
    Array(chars, punct, digit, upper)
  }

  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** `graft_char_class_counts(t)`: one-pass [n_chars, n_punct, n_digit,
  * n_upper] — see [[TextStats]]. */
case class CharClassCountsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_char_class_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override def nullSafeEval(v: Any): Any = new GenericArrayData(
    TextStats.charClassCounts(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.TextStats.charClassCounts($c));")

  override protected def withNewChildInternal(
      newChild: Expression): CharClassCountsExpr = copy(child = newChild)
}

/** `graft_count_in_set(arr)`: occurrences of `words` members in the
  * string array — the codegen'd form of
  * `size(filter(arr, t -> t.isin(words)))`. The membership set is
  * built once per expression instance and shared by every row. */
case class CountInSetExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "graft_count_in_set"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument")
    }

  override def nullSafeEval(v: Any): Any =
    TextStats.countInSet(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.TextStats.countInSet($a, $setRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountInSetExpr = copy(child = newChild)
}
