package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing: classify every key of two snapshots of the same
  * logical table as added / removed / changed / unchanged.
  *
  * This generalizes the reference's per-file skip/replace decision
  * (`series_tiempo_ar_scraping/base.py` — an existing output is kept or
  * replaced wholesale) to a row-level delta report: the question a
  * re-harvest actually wants answered is "WHICH series changed since
  * the last catalog snapshot", and at training-corpus scale the same
  * operator reports what a new crawl added/retired relative to the
  * served corpus.
  *
  * Scale design (100 TB snapshots):
  *  - ONE full-outer sort-merge join on the key columns; both sides
  *    shuffle-partition by key, no broadcast of anything unbounded.
  *  - With `fingerprint = true` the compare columns are collapsed to a
  *    single xxhash64 per side BEFORE the join, so the shuffle carries
  *    (key, 8 bytes) instead of the full row — the right shape when
  *    snapshots are wide. The hash is Spark-internal (engine-specific),
  *    so fingerprint mode trades oracle-portability for shuffle width;
  *    `false` compares the columns themselves null-safely.
  *  - Column pruning reaches the scans either way: only key + compare
  *    columns are read.
  */
object Snapshot {

  val StatusAdded = "added"
  val StatusRemoved = "removed"
  val StatusChanged = "changed"
  val StatusUnchanged = "unchanged"

  /** Row-level diff of `newSnap` against `oldSnap` on `keyCols`.
    *
    * Output: keyCols ++ (for each compare column c: `old_c`, `new_c`)
    * ++ `status`. With `fingerprint = true` the per-column old/new
    * values are replaced by a single `old_fp`/`new_fp` hash pair.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], fingerprint: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")

    val (oldSide, newSide, oldVals, newVals) =
      if (fingerprint) {
        // xxhash64 skips NULL inputs (state passes through unchanged), so
        // hashing the raw columns would make (NULL, 5) and (5, NULL)
        // collide. Interleave a never-null isNull flag per column so NULL
        // position shifts change the hashed sequence.
        val fp = (d: DataFrame) => d.select(
          keyCols.map(col) :+
            xxhash64(compareCols.flatMap(c =>
              Seq(col(c).isNull, col(c))): _*).as("_fp"): _*)
        (fp(oldSnap).withColumnRenamed("_fp", "old_fp"),
          fp(newSnap).withColumnRenamed("_fp", "new_fp"),
          Seq("old_fp"), Seq("new_fp"))
      } else {
        val side = (d: DataFrame, p: String) => d.select(
          keyCols.map(col) ++
            compareCols.map(c => col(c).as(s"${p}_$c")): _*)
        (side(oldSnap, "old"), side(newSnap, "new"),
          compareCols.map("old_" + _), compareCols.map("new_" + _))
      }

    // presence markers survive the outer join even when every payload
    // column of a side is legitimately NULL
    val l = oldSide.withColumn("_old_present", lit(true))
    val r = newSide.withColumn("_new_present", lit(true))
    val joined = l.join(r, keyCols, "full_outer")

    val same: Column = oldVals.zip(newVals)
      .map { case (a, b) => col(a) <=> col(b) }
      .reduce(_ && _)
    val status = when(col("_old_present").isNull, lit(StatusAdded))
      .when(col("_new_present").isNull, lit(StatusRemoved))
      .when(same, lit(StatusUnchanged))
      .otherwise(lit(StatusChanged))

    joined.select(
      keyCols.map(col) ++ (oldVals ++ newVals).map(col) :+
        status.as("status"): _*)
  }

  /** Per-status row counts — the one-line health report of a
    * re-harvest ("3 series changed, 1 added, 0 removed"). */
  def diffSummary(diffed: DataFrame): DataFrame =
    diffed.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
