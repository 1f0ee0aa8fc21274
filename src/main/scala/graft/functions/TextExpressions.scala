package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions — per-row scalars too loop-heavy
  * for composed built-ins (an explode + groupBy per DOCUMENT would turn
  * a projection into a shuffle) but too hot for a boxing Scala UDF.
  * Same preference-order-(b) rationale as CellCoordExpressions.
  */
object TextExpressions {

  /** Shannon entropy (nats) of the character distribution of `s`,
    * computed as ln(n) − (Σ cᵢ·ln cᵢ)/n over integer char counts cᵢ.
    *
    * Deterministic by construction: counts accumulate into a dense
    * ASCII table plus a SORTED map for the long tail, and the fold runs
    * in ascending char order — the sum never depends on input order, so
    * the value is bit-stable across partitionings and engines (modulo
    * the final 1-ulp-scale log rounding, which callers absorb with
    * round(·, 6)). Empty string → 0.0.
    *
    * Chars are UTF-16 code units; for the ASCII corpora this equals the
    * code-point distribution an external oracle computes. */
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val ascii = new Array[Int](128)
    var tail: java.util.TreeMap[Character, Integer] = null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < 128) ascii(c) += 1
      else {
        if (tail == null) tail = new java.util.TreeMap[Character, Integer]()
        val prev = tail.get(c)
        tail.put(c, if (prev == null) 1 else prev + 1)
      }
      i += 1
    }
    var sum = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) sum += c * math.log(c)
      j += 1
    }
    if (tail != null) {
      val it = tail.values().iterator()
      while (it.hasNext) { val c = it.next().toInt; sum += c * math.log(c) }
    }
    math.log(n) - sum / n
  }

  /** Jaro similarity over UTF-16 code units — the standard definition:
    * matches within a floor(max/2)−1 window, half-counted
    * transpositions, (m/|a| + m/|b| + (m−t)/m)/3. Both-empty → 1.0,
    * one-empty → 0.0 (the DuckDB/utf8proc convention, so the oracle's
    * `jaro_similarity` agrees bit-for-bit on ASCII/BMP input). */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val n1 = s1.length; val n2 = s2.length
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = FLOOR(mismatched-position count / 2): the
    // utf8proc/RapidFuzz convention the oracle uses (a trailing odd
    // mismatch doesn't count), not the fractional t of some texts
    val t = (half / 2).toDouble
    (m / n1 + m / n2 + (m - t) / m) / 3.0
  }

  /** Jaro-Winkler: the Jaro score boosted by the shared prefix
    * (capped at 4, scale 0.1) — applied only above the classic 0.7
    * threshold, matching the oracle's `jaro_winkler_similarity`. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s1 = a.toString; val s2 = b.toString
    val max = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Canonical text fold for matching/dedup keys: canonical decompose
    * (NFD), strip combining marks, recompose (NFC), lowercase (root
    * locale). 'Café' → 'cafe', 'Ñandú' → 'nandu'; characters without a
    * decomposition ('œ') pass through — the same folding utf8proc's
    * `strip_accents` + `lower` performs, so an external oracle can
    * reproduce keys exactly. */
  def foldText(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val str = s.toString
    // fast path: ASCII never changes under NFD/strip/NFC
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 128) ascii = false; i += 1 }
    val stripped =
      if (ascii) str
      else {
        val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var j = 0
        while (j < nfd.length) {
          val c = nfd.charAt(j)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          j += 1
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      }
    UTF8String.fromString(stripped.toLowerCase(java.util.Locale.ROOT))
  }
}

/** Character-distribution Shannon entropy of a string, in nats — the
  * classic gibberish/boilerplate quality signal (near-zero = one
  * repeated char, high = uniform noise). */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_char_entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any =
    TextExpressions.entropy(input.asInstanceOf[UTF8String])

  // a static call keeps the row inside WholeStageCodegen (no row
  // boxing, no closure); the loop body itself needn't be inlined
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

/** Jaro-Winkler similarity of two strings (0..1) — the classic
  * record-linkage comparator, as a native binary expression so blocked
  * entity-matching pair scoring stays inside WholeStageCodegen. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.typeName == "string" &&
        right.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments")

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextExpressions.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** Accent-fold + case-fold normalization (NFD → strip marks → NFC →
  * lowercase) for canonical matching keys. */
case class FoldTextExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fold_text"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any =
    TextExpressions.foldText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.foldText($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldTextExpr =
    copy(child = newChild)
}
