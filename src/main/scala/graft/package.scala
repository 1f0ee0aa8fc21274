import org.apache.spark.sql.DataFrame

/** Engine-wide lineage-truncation helper.
  *
  * Every operator that materializes a multi-consumer intermediate uses
  * `df.graftCp(eager)` instead of calling `DataFrame.localCheckpoint`
  * directly. In normal runs (bench, verify, production) the two are
  * IDENTICAL — `graftCp` delegates to `localCheckpoint` — but when the
  * JVM property `graft.plan.keepLineage` is set (only `graft.PlanDump`
  * sets it, for its `_lineage.txt` artifacts) the helper is the
  * identity, so a dumped plan shows the full pre-checkpoint lineage:
  * checkpointed subtrees otherwise collapse to `Scan ExistingRDD` and
  * hide the expressions the optimization rounds must substantiate
  * (r17 verdict: the q126/q204/q75 after-plans could not show the
  * native hash/tokenizer or the shared shingle subtree). The property
  * is read at plan-construction time, never per row.
  */
package object graft {
  private[graft] val KeepLineageProp = "graft.plan.keepLineage"

  implicit final class GraftCheckpointOps(private val df: DataFrame)
      extends AnyVal {
    def graftCp(eager: Boolean): DataFrame =
      if (java.lang.Boolean.getBoolean(KeepLineageProp)) df
      else df.localCheckpoint(eager)
  }
}
