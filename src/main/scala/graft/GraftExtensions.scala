package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CellColIndexExpr, CellRowExpr, CharEntropyExpr, FoldTextExpr, JaroWinklerExpr, VecDotExpr, VecNormExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Enable with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * then `SELECT graft_cell_row('A8'), graft_cell_col('BA37')` works in
  * plain Spark SQL — the engine's operators compose with any SQL
  * workload, not only the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator tier: the as-of join planner strategy and the
    // fold-idempotence optimizer rule ride the same extension point
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.FoldTextIdempotence)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "",
      "", "built-in")

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

  /** Bridge a Column-composition function into an expression builder:
    * wrap the child expressions as Columns, compose, unwrap. The
    * resulting tree is ordinary Catalyst expressions — codegen'd like
    * any built-in. */
  private def fromColumns(f: Seq[Column] => Column)
      : Seq[Expression] => Expression =
    children => ExpressionUtils.expression(
      f(children.map(ExpressionUtils.column)))

  /** Extract a literal int argument (e.g. the shingle width) at
    * resolution time. */
  private def litInt(e: Expression, name: String, fn: String): Int = {
    require(e.foldable, s"$fn: $name must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a literal integer, got $other")
    }
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cell_row"),
      info("graft_cell_row",
        "graft_cell_row(coord) - row number of a cell coordinate ('A8' -> 8)"),
      (children: Seq[Expression]) => CellRowExpr(children.head)),
    (FunctionIdentifier("graft_cell_col"),
      info("graft_cell_col",
        "graft_cell_col(coord) - 1-based column index ('BA37' -> 53)"),
      (children: Seq[Expression]) => CellColIndexExpr(children.head)),
    (FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot",
        "graft_vec_dot(a, b) - dot product of two float/double arrays " +
          "(sequential double fold, allocation-free)"),
      (children: Seq[Expression]) =>
        VecDotExpr(children.head, children(1))),
    (FunctionIdentifier("graft_vec_norm"),
      info("graft_vec_norm",
        "graft_vec_norm(a) - euclidean norm of a float/double array"),
      (children: Seq[Expression]) => VecNormExpr(children.head)),
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (prefix " +
          "cap 4, scale 0.1, 0.7 boost threshold) for record linkage"),
      (children: Seq[Expression]) =>
        JaroWinklerExpr(children.head, children(1))),
    (FunctionIdentifier("graft_fold_text"),
      info("graft_fold_text",
        "graft_fold_text(s) - accent-fold + case-fold normalization " +
          "(NFD, strip marks, NFC, lowercase) for canonical match keys"),
      (children: Seq[Expression]) => FoldTextExpr(children.head)),
    (FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(s) - Shannon entropy (nats) of the string's " +
          "character distribution, order-independent fold"),
      (children: Seq[Expression]) => CharEntropyExpr(children.head)),
    (FunctionIdentifier("graft_normalize_value"),
      info("graft_normalize_value",
        "graft_normalize_value(s) - the reference's 19-token missing-" +
          "value normalization: missing tokens and non-numeric junk " +
          "to NULL, else parsed double (F6)"),
      fromColumns(cols => graft.functions.GF.normalizeValue(cols.head))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(text, n) - word n-gram shingle array over " +
          "normalized whitespace tokens (n literal). Convenience " +
          "surface: corpus-scale jobs should use the projection-split " +
          "Scala operator (Dedup.shingleRows)"),
      (children: Seq[Expression]) => ExpressionUtils.expression(
        graft.operators.Dedup.shinglesCol(
          ExpressionUtils.column(children.head),
          litInt(children(1), "n", "graft_shingles")))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(text) - 32-bit SimHash of the normalized token " +
          "multiset; bit-identical to the Dedup.simhash operator"),
      fromColumns(cols => graft.operators.Dedup.simhashCol(cols.head))),
    (FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "graft_lsh_bucket(text, band) - the MinHash-LSH md5 bucket of " +
          "one band (band literal; k=8, bands=4, shingle n=3 — the " +
          "signature-index defaults), for SQL-side probes of the " +
          "persisted dedup index"),
      (children: Seq[Expression]) => ExpressionUtils.expression(
        graft.operators.Dedup.lshBucketCol(
          ExpressionUtils.column(children.head),
          litInt(children(1), "band", "graft_lsh_bucket")))),
    (FunctionIdentifier("graft_kmv"),
      info("graft_kmv",
        "graft_kmv(h, k) - bounded-state KMV distinct-count sketch " +
          "over an already-hashed long column (k literal): aggregates " +
          "to struct(n_seen, kth_min); estimate is (k-1)*2^32/kth_min"),
      (children: Seq[Expression]) =>
        graft.functions.KmvSketchAgg(children.head,
          litInt(children(1), "k", "graft_kmv"))),
    (FunctionIdentifier("graft_cms"),
      info("graft_cms",
        "graft_cms(h, depth, width) - Count-Min Sketch frequency " +
          "summary over an already-hashed long column (depth/width " +
          "literals): aggregates to a depth x width counter matrix " +
          "array<array<long>>; point estimate = min over rows of the " +
          "row's universal-hash bucket"),
      (children: Seq[Expression]) =>
        graft.functions.CmsSketchAgg(children.head,
          litInt(children(1), "depth", "graft_cms"),
          litInt(children(2), "width", "graft_cms"))),
    (FunctionIdentifier("graft_hdr"),
      info("graft_hdr",
        "graft_hdr(v, sBits) - HDR quantile sketch over a raw long " +
          "measure (sBits literal): base-2 log buckets with 2^sBits " +
          "linear sub-buckets, aggregates to the sorted bucket " +
          "histogram array<struct<bucket,cnt>>; quantile estimates " +
          "carry a 2^-sBits relative value error"),
      (children: Seq[Expression]) =>
        graft.functions.HdrSketchAgg(children.head,
          litInt(children(1), "sBits", "graft_hdr"))),
    (FunctionIdentifier("graft_kmv_state"),
      info("graft_kmv_state",
        "graft_kmv_state(h, k) - persistable KMV state (k literal): " +
          "the sorted array<long> of the k smallest distinct hashes; " +
          "store it and roll up later with graft_kmv_merge"),
      (children: Seq[Expression]) =>
        graft.functions.KmvStateAgg(children.head,
          litInt(children(1), "k", "graft_kmv_state"))),
    (FunctionIdentifier("graft_kmv_merge"),
      info("graft_kmv_merge",
        "graft_kmv_merge(state, k) - rollup of stored KMV states " +
          "(k literal): hash-identical to a direct build over the " +
          "union of the inputs' raw data PROVIDED the stored states " +
          "were built with k' >= k (merging down is exact; merging up " +
          "is silently biased - the state cannot carry its k)"),
      (children: Seq[Expression]) =>
        graft.functions.KmvMergeAgg(children.head,
          litInt(children(1), "k", "graft_kmv_merge"))),
    (FunctionIdentifier("graft_cms_merge"),
      info("graft_cms_merge",
        "graft_cms_merge(cms, depth, width) - rollup of stored CMS " +
          "counter matrices (literals): element-wise add, exact for " +
          "any rollup tree; mismatched stored dimensions fail fast"),
      (children: Seq[Expression]) =>
        graft.functions.CmsMergeAgg(children.head,
          litInt(children(1), "depth", "graft_cms_merge"),
          litInt(children(2), "width", "graft_cms_merge"))),
    (FunctionIdentifier("graft_hdr_merge"),
      info("graft_hdr_merge",
        "graft_hdr_merge(sk) - rollup of stored HDR bucket histograms: " +
          "bucket-wise count add, exact for any rollup tree"),
      (children: Seq[Expression]) =>
        graft.functions.HdrMergeAgg(children.head)))

  /** Install the functions on an ALREADY-RUNNING session (withExtensions
    * only applies to sessions built after it). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  /** Install the planner strategy on an ALREADY-RUNNING session via
    * `experimentalMethods` (the runtime-mutable strategy hook; optimizer
    * rules have no runtime hook and only apply through
    * `spark.sql.extensions` / `withExtensions`). Idempotent. */
  def registerPlanner(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      em.extraStrategies = graft.plans.AsOfJoinStrategy +: em.extraStrategies
  }
}
