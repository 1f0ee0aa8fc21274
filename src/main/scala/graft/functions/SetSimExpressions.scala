package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native set-similarity verification for the exact AllPairs/PPJoin
  * pipeline (`Dedup.prefixFilterJoin`) — the literature-standard
  * merge-based verify (Xiao et al., WWW'08 §4-5) as a single
  * whole-stage-codegen'd expression over per-document SORTED DISTINCT
  * shingle arrays, replacing a shingle-grain relational join +
  * count aggregate that re-exploded every candidate pair.
  *
  * Two exactness-preserving stages run inside one scalar call:
  *
  *  1. **Partition filter** (the PPJoin+ suffix filter generalized to
  *     the full sets): a depth-bounded divide-and-conquer LOWER bound
  *     on the symmetric difference |AΔB|. Probe the median element of
  *     one array, binary-search it in the other; elements left of the
  *     probe can only match left of it (both arrays share one total
  *     order), so |AΔB| ≥ H(left parts) + H(right parts) + (probe
  *     found ? 0 : 1), recursively, with ||Al|−|Bl|| at the leaves.
  *     Since |A∩B| = (|A|+|B|−|AΔB|)/2, the bound caps the possible
  *     overlap; candidates provably below the required overlap
  *     α = ⌈t/(1+t)·(|A|+|B|)⌉ are rejected in O(depth·log n) without
  *     touching most of either array. (The paper applies this to the
  *     post-prefix suffixes; applying it to the full sets is the same
  *     bound with the shared prefix token folded in — equally exact,
  *     and independent of per-candidate prefix positions.)
  *  2. **Early-exit merge**: one two-pointer pass over both sorted
  *     arrays counts the exact intersection, aborting as soon as
  *     intersection-so-far + min(remaining) < α — the positional
  *     pruning of the paper's verify loop.
  *
  * Survivors return the EXACT Jaccard |A∩B|/(|A|+|B|−|A∩B|) as the
  * same long-count double division the relational verify computed, so
  * results are bit-identical. Rejections return null — only pairs with
  * J < t are ever rejected (α uses a 1e-9 slack so float rounding can
  * only ADMIT an exactly-at-threshold pair, never drop one; the ≥ t
  * filter outside remains the semantic gate).
  *
  * Requirements: both inputs are array<string> with non-null elements,
  * strictly ascending in the default binary (UTF8_BINARY) order —
  * exactly what `sort_array(collect_list(...))` over a distinct
  * shingle relation produces. Null arrays yield null.
  */
object SetSim {
  /** Recursion depth of the partition filter: 3 levels ≈ 8 leaf
    * segments, the WWW'08-recommended MAXDEPTH regime — deeper probes
    * tighten the bound less than they cost. */
  val MaxDepth = 3

  private val Eps = 1e-9

  /** Minimal integer overlap for Jaccard ≥ t at sizes (na, nb):
    * J ≥ t ⟺ |A∩B| ≥ t/(1+t)·(na+nb). */
  def requiredOverlap(na: Int, nb: Int, t: Double): Long =
    math.max(1L, math.ceil(t / (1.0 + t) * (na + nb) - Eps).toLong)

  /** Depth-bounded lower bound on |AΔB| between a[la,ha) and b[lb,hb)
    * (both strictly ascending in binary order). */
  def hammingLower(a: ArrayData, la: Int, ha: Int,
      b: ArrayData, lb: Int, hb: Int, depth: Int): Int = {
    val na = ha - la
    val nb = hb - lb
    if (na == 0 || nb == 0 || depth <= 0) return math.abs(na - nb)
    val mb = (lb + hb) >>> 1
    val probe = b.getUTF8String(mb)
    // binary search for probe in a[la, ha): lo = first index ≥ probe
    var lo = la
    var hi = ha
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getUTF8String(mid).compareTo(probe) < 0) lo = mid + 1
      else hi = mid
    }
    val found = lo < ha && a.getUTF8String(lo).compareTo(probe) == 0
    hammingLower(a, la, lo, b, lb, mb, depth - 1) +
      hammingLower(a, if (found) lo + 1 else lo, ha, b, mb + 1, hb,
        depth - 1) +
      (if (found) 0 else 1)
  }

  /** True iff the partition filter CANNOT rule out Jaccard ≥ t:
    * upper-bounded overlap (na+nb−H)/2 reaches the required α. */
  def passesBound(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return false
    val h = hammingLower(a, 0, na, b, 0, nb, MaxDepth)
    (na + nb - h) / 2 >= requiredOverlap(na, nb, t)
  }

  /** Exact Jaccard of the two sorted sets, or any negative value when
    * the pair is provably below t (partition filter or early-exit
    * merge). Negative = "reject": true Jaccard is never negative. */
  def jaccardOrNeg(a: ArrayData, b: ArrayData, t: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return -1.0
    val alpha = requiredOverlap(na, nb, t)
    if ((na + nb - hammingLower(a, 0, na, b, 0, nb, MaxDepth)) / 2 < alpha)
      return -1.0
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < alpha) return -1.0
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (inter < alpha) -1.0
    else inter.toDouble / (na.toLong + nb.toLong - inter)
  }

  private[functions] def arrOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
}

/** `graft_set_jaccard(a, b, t)`: exact Jaccard of two sorted distinct
  * string arrays, null when provably < t — see [[SetSim]]. */
case class PPJoinJaccardExpr(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  import SetSim._

  override def prettyName: String = "graft_set_jaccard"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrOk(left.dataType) && arrOk(right.dataType) &&
        threshold > 0.0 && threshold <= 1.0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments and t in (0, 1]")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val j = jaccardOrNeg(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], threshold)
    if (j < 0) null else j
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      s"""
         |double $j = graft.functions.SetSim.jaccardOrNeg($a, $b, $threshold);
         |if ($j < 0) { ${ev.isNull} = true; } else { ${ev.value} = $j; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PPJoinJaccardExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_set_overlap_bound(a, b, t)`: the partition-filter verdict
  * alone (true = the pair survives into the exact merge) — the
  * scaling diagnostics count these survivors as "candidates entering
  * exact verification". */
case class PPJoinBoundExpr(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {
  import SetSim._

  override def prettyName: String = "graft_set_overlap_bound"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrOk(left.dataType) && arrOk(right.dataType) &&
        threshold > 0.0 && threshold <= 1.0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments and t in (0, 1]")

  override def nullSafeEval(l: Any, r: Any): Any =
    passesBound(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      threshold)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = " +
      s"graft.functions.SetSim.passesBound($a, $b, $threshold);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PPJoinBoundExpr =
    copy(left = newLeft, right = newRight)
}
