package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CellColIndexExpr, CellRowExpr, CharEntropyExpr, VecDotExpr, VecNormExpr}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "",
      "", "built-in")

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
    (FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(s) - Shannon entropy (nats) of the string's " +
          "character distribution, order-independent fold"),
      (children: Seq[Expression]) => CharEntropyExpr(children.head)))

  /** Install the functions on an ALREADY-RUNNING session (withExtensions
    * only applies to sessions built after it). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
