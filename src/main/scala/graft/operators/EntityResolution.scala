package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution and relational data-quality operators.
  *
  * Record linkage at corpus scale is blocking + bounded pair scoring:
  * the all-pairs comparator is quadratic, so candidate pairs ONLY ever
  * materialize inside an equi-join on a blocking key, and the scorer is
  * a native codegen'd expression ([[graft.functions.JaroWinklerExpr]])
  * so the pair scan stays inside WholeStageCodegen. The same shape the
  * dedup tier uses for LSH buckets (Dedup.scala), applied to entity
  * names instead of shingle signatures.
  */
object EntityResolution {

  /** Accent-fold + case-fold canonical key (native FoldTextExpr). */
  def foldKey(c: Column): Column = {
    graft.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_fold_text", c)
  }

  /** Jaro-Winkler similarity column (native JaroWinklerExpr). */
  def jaroWinkler(a: Column, b: Column): Column = {
    graft.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_jaro_winkler", a, b)
  }

  /** Blocked fuzzy name matching: within each blocking key, score all
    * ordered pairs (idA < idB) with Jaro-Winkler and keep each left
    * record's top-`k` matches at or above `minSim`.
    *
    * The pair space is bounded by the block size — the equi-join on
    * `block` shuffles each side once, and a skewed blocking key shows
    * up as one oversized partition AQE splits. Returns
    * (id_a, id_b, name_a, name_b, sim) with sim rounded to 4. */
  def blockedNamePairs(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, minSim: Double, k: Int): DataFrame = {
    // pair scoring is CPU-dense per-row work that runs UNDER the
    // broadcast join, i.e. inside the scan stage — spread a few-file
    // scan first or one core scores every pair (guide §2.5; measured
    // 1.9 s single-task vs ~0.3 s spread at sf0.1)
    val in = Spread.fewFileScan(df)
    val a = in.select(col(blockCol).as("_block"), col(idCol).as("id_a"),
      col(nameCol).as("name_a"))
    val b = df.select(col(blockCol).as("_block"), col(idCol).as("id_b"),
      col(nameCol).as("name_b"))
    val scored = a.join(b, "_block")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(jaroWinkler(col("name_a"), col("name_b")), 4))
      .filter(col("sim") >= minSim)
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("sim").desc, col("id_b"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk", "_block")
  }

  /** One foreign-key audit: rows of `fact` whose `fkCol` has no match
    * in `dim.pkCol` (nulls excluded — a null FK is absence, not an
    * orphan). Returns a 1-row frame (check, rows, orphans).
    *
    * The orphan probe is a left-anti join: broadcast when the dim is a
    * dimension, shuffle-hash on the key when both sides are facts —
    * exactly what the planner picks from sizes, nothing to hint. */
  def fkAudit(check: String, fact: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame = {
    val keyed = fact.select(col(fkCol).as("_fk")).filter(col("_fk").isNotNull)
    // ONE fact pass: left join against the distinct PK set and count
    // rows + unmatched rows together — the r16 form scanned the fact
    // twice (total count + anti-join count) and crossJoined the two
    // 1-row frames. Distinct PKs keep the left join fanout-free, so
    // `rows` is exact and `orphans` ≡ the anti-join count.
    keyed
      .join(dim.select(col(pkCol).as("_fk")).distinct()
          .withColumn("_hit", lit(1)),
        Seq("_fk"), "left")
      .agg(count(lit(1)).as("rows"),
        (count(lit(1)) - count(col("_hit"))).as("orphans"))
      .select(lit(check).as("check"), col("rows"), col("orphans"))
  }

  /** Run a battery of FK audits and union the one-row results — the
    * referential-integrity report a lake ingest gate runs before
    * publishing a snapshot. */
  def referentialAudit(
      checks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    checks.map { case (name, fact, fk, dim, pk) =>
      fkAudit(name, fact, fk, dim, pk)
    }.reduce(_.unionByName(_))

  /** Benford first-significant-digit audit of a positive numeric
    * column: per digit 1..9, the observed share vs log10(1+1/d) and
    * the chi-square contribution n·(p̂−p)²/p. One groupBy on a 9-value
    * key — the total re-joins by broadcast, never a second scan.
    *
    * The digit comes from the DECIMAL STRING of floor(x) — exact in
    * any engine, where a log10/pow round-trip can put a value like
    * 999.999… on the wrong side of a power of ten. */
  /** Golden-record survivorship: collapse every entity's update
    * history to ONE record where each field independently keeps its
    * most recent NON-NULL value (recency by `orderCols`, which must
    * totally order updates within a key — ties would make the answer
    * engine-dependent). A later null does NOT erase an earlier value —
    * that's the difference from plain "latest row wins".
    *
    * Shape: one partial-aggregatable `max_by` per field over the
    * struct (isNotNull, orderCols…) — non-null beats null, recency
    * breaks the rest. No window, no sort, ONE groupBy shuffle at
    * entity grain; map-side partials carry one candidate per field. */
  def survivorship(df: DataFrame, keyCol: String, orderCols: Seq[String],
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "survivorship needs at least one field")
    val aggs = fields.map { f =>
      max_by(col(f), struct(
        col(f).isNotNull +: orderCols.map(col): _*)).as(f)
    } :+ count(lit(1)).as("n_updates")
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Header/detail reconciliation: per header row, the declared amount
    * vs the sum recomputed from its detail lines, both in exact
    * integer cents — the "does the rollup column actually roll up"
    * audit between fact tables. Returns header-grain rows with the
    * difference; headers with NO detail lines surface with a null
    * recomputed sum (a dropped-lines bug looks exactly like that, and
    * an inner join would hide it). One detail-grain aggregate + one
    * key-grain join. */
  def reconcile(header: DataFrame, keyCol: String, declaredCents: Column,
      detail: DataFrame, detailKeyCol: String,
      detailCents: Column): DataFrame = {
    val sums = detail.groupBy(col(detailKeyCol).as(keyCol))
      .agg(sum(detailCents).as("recomputed_cents"),
        count(lit(1)).as("n_lines"))
    header.select(col(keyCol), declaredCents.as("declared_cents"))
      .join(sums, Seq(keyCol), "left")
      .select(col(keyCol), col("declared_cents"), col("recomputed_cents"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        (col("declared_cents") - col("recomputed_cents")).as("diff_cents"))
  }

  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(
      floor(col(valueCol)).cast("long").cast("string"), 1, 1).cast("int")
    val counts = df.filter(col(valueCol) >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 6).as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("exp_share"),
        round(col("total") *
          pow(col("n") / col("total") - log10(lit(1.0) + lit(1.0) / col("digit")), 2) /
          log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }
}
