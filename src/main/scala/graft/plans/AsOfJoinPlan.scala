package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension exemplar (builder-prompt preference order
  * (c)): the AS-OF JOIN Spark's relational algebra lacks, as a custom
  * logical node + planner strategy + physical merge pass, registered
  * through `SparkSessionExtensions` (see [[graft.GraftExtensions]]).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`,
  * the oracle the engine's composed version q61 already matches): every
  * left row picks the right row with equal keys and the LARGEST right
  * time ≤ its own; no such row → nulls. Right (key, time) pairs are
  * expected unique (pre-aggregate otherwise) — among exact duplicates
  * the sort-order-last row wins, which is only deterministic when the
  * pair is unique.
  *
  * Why a physical operator when a union + last-over-window composition
  * exists: the composed plan sorts the UNION of both sides and carries
  * window state per payload column; this exec asks Catalyst for the
  * join-standard layout — both children hash-clustered on the keys and
  * sorted (keys, time), the same requirement SortMergeJoin declares, so
  * EnsureRequirements plans the shuffles/sorts and AQE still re-plans
  * them — then streams ONE forward merge pass per partition with a
  * single buffered candidate row: no union, no window buffers, no
  * second sort of the left payload. */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    keys: Seq[String], timeCol: String, payload: Seq[String],
    payloadOut: Seq[AttributeReference])
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut

  /** Every left column passes through and the right contributes keys,
    * time and payload — declared as references so ColumnPruning keeps
    * them (a node with an empty reference set would have its children
    * pruned to nothing underneath it). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output.filter(a =>
        keys.contains(a.name) || a.name == timeCol ||
          payload.contains(a.name)))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Construction entry point: mints the `asof_<c>` output attributes
    * ONCE. They ride the case-class copies unchanged afterwards — a
    * lazily-derived output would re-mint ExprIds on every optimizer
    * copy and orphan parent references. */
  def apply(left: LogicalPlan, right: LogicalPlan, keys: Seq[String],
      timeCol: String, payload: Seq[String]): AsOfJoin = {
    val outs = payload.map { c =>
      val a = right.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"asof payload column $c missing"))
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    new AsOfJoin(left, right, keys, timeCol, payload, outs)
  }
}

/** Planner rule: AsOfJoin logical → AsOfJoinExec physical. The exec
  * carries only names + minted output attributes — never the logical
  * node, whose relation chain (FileIndex etc.) must not ride the task
  * closure. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.keys, j.timeCol, j.payload, j.payloadOut,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** One forward merge pass per co-partitioned, co-sorted partition pair:
  * advance the right iterator while its (keys, time) ≤ the left row's,
  * holding the last consumed row; it matches iff its keys equal the
  * left row's. O(|L| + |R|) per partition, one buffered right row of
  * state. */
case class AsOfJoinExec(keys: Seq[String], timeCol: String,
    payload: Seq[String], payloadOut: Seq[AttributeReference],
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  private def byName(side: SparkPlan, names: Seq[String]): Seq[Attribute] =
    names.map(n => side.output.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"column $n missing in ${side.output}")))

  private def leftKeyTime = byName(left, keys :+ timeCol)
  private def rightKeyTime = byName(right, keys :+ timeCol)

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(byName(left, keys)),
    ClusteredDistribution(byName(right, keys)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeyTime.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    rightKeyTime.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = byName(left, keys).map(_.dataType)
    val ktTypes = leftKeyTime.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val nKeys = keys.length
    val lKT = leftKeyTime
    val rKT = rightKeyTime
    val payloadAttrs = byName(right, payload)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(ktTypes)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val projLkt = UnsafeProjection.create(lKT, lOut)
      val projRkt = UnsafeProjection.create(rKT, rOut)
      val projLk = UnsafeProjection.create(lKT.take(nKeys), lOut)
      val projRk = UnsafeProjection.create(rKT.take(nKeys), rOut)
      // output projection over the joined (left ++ right) row; the
      // right half of the INPUT schema binds with FORCED nullability —
      // the unmatched case feeds a null row, and BindReferences takes
      // nullability from the input schema (a non-nullable binding would
      // skip the null check and read zeros)
      val projOut = UnsafeProjection.create(
        (lOut ++ payloadAttrs).map(a => a: Expression),
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      var cand: InternalRow = null
      var candKey: InternalRow = null
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      lIter.map { l =>
        val lkt = projLkt(l)
        while (rNext != null && ktOrd.compare(projRkt(rNext), lkt) <= 0) {
          cand = rNext.copy()
          candKey = projRk(cand).copy()
          rNext = if (rIter.hasNext) rIter.next() else null
        }
        val matched = cand != null &&
          keyOrd.compare(candKey, projLk(l)) == 0
        projOut(joined(l, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
