package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
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
