package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge for the SQL function registry.
  *
  * Spark 4 unified `Column` around `ColumnNode` and made the classic
  * converters (`org.apache.spark.sql.classic.ExpressionUtils` /
  * `ColumnNodeToExpressionConverter`) `private[sql]`; registering
  * Column-composed functions through
  * `SparkSessionExtensions.injectFunction` needs exactly that
  * conversion. This one-file shim lives in the sql package solely to
  * re-export the converters — the standard extension-library pattern;
  * no Spark internals are modified or shadowed.
  *
  * `expression` converts EAGERLY (the same conversion Dataset.select
  * performs) so the returned tree is ordinary Catalyst nodes the
  * analyzer resolves in place — `ExpressionUtils.expression` alone
  * returns a lazy `ColumnNodeExpression` wrapper that analyzer rules
  * never unwrap when it is injected via the function registry. */
object ColumnBridge {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
