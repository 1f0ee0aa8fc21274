package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for cell-coordinate math — the engine's
  * exemplar of preference order (b) from SURVEY §7.2: a scalar too
  * awkward for composed built-ins gets a codegen'd `Expression`, never
  * a Scala UDF (which would box rows and break whole-stage codegen).
  *
  * Coordinate grammar per the reference's cell references ("A8",
  * "BA37"; processors.py:223-228): letters = base-26 column, digits =
  * 1-based row. Malformed input -> null (the engine's
  * violations-as-data convention).
  */
abstract class CellCoordExpression extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.typeName == "string")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")

  /** @return Integer result or null for malformed coords. */
  protected def parse(s: UTF8String): Any

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])
}

/** Column letters of a cell coordinate -> 1-based index ("A8" -> 1,
  * "BA37" -> 53). */
case class CellColIndexExpr(child: Expression) extends CellCoordExpression {
  override def prettyName: String = "graft_cell_col"

  override protected def parse(s: UTF8String): Any = {
    val str = s.toString
    var i = 0
    var acc = 0L
    while (i < str.length && str.charAt(i).isLetter) {
      acc = acc * 26 + (str.charAt(i).toUpper - 'A' + 1)
      if (acc > Int.MaxValue) return null
      i += 1
    }
    if (i == 0 || i >= str.length) return null
    var j = i
    while (j < str.length) {
      if (!str.charAt(j).isDigit) return null
      j += 1
    }
    acc.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |String $str = $c.toString();
         |int $i = 0; long $acc = 0L; boolean ${ev.isNull}_ok = true;
         |while ($i < $str.length() && Character.isLetter($str.charAt($i))) {
         |  $acc = $acc * 26 + (Character.toUpperCase($str.charAt($i)) - 'A' + 1);
         |  if ($acc > Integer.MAX_VALUE) { ${ev.isNull}_ok = false; break; }
         |  $i++;
         |}
         |if ($i == 0 || $i >= $str.length()) ${ev.isNull}_ok = false;
         |if (${ev.isNull}_ok) {
         |  for (int $j = $i; $j < $str.length(); $j++) {
         |    if (!Character.isDigit($str.charAt($j))) { ${ev.isNull}_ok = false; break; }
         |  }
         |}
         |if (${ev.isNull}_ok) { ${ev.value} = (int) $acc; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row number of a cell coordinate ("A8" -> 8). */
case class CellRowExpr(child: Expression) extends CellCoordExpression {
  override def prettyName: String = "graft_cell_row"

  override protected def parse(s: UTF8String): Any = {
    val str = s.toString
    var i = 0
    while (i < str.length && str.charAt(i).isLetter) i += 1
    if (i == 0 || i >= str.length) return null
    var acc = 0L
    var j = i
    while (j < str.length) {
      val ch = str.charAt(j)
      if (!ch.isDigit) return null
      acc = acc * 10 + (ch - '0')
      if (acc > Int.MaxValue) return null
      j += 1
    }
    acc.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |String $str = $c.toString();
         |int $i = 0; long $acc = 0L; boolean ${ev.isNull}_ok = true;
         |while ($i < $str.length() && Character.isLetter($str.charAt($i))) $i++;
         |if ($i == 0 || $i >= $str.length()) ${ev.isNull}_ok = false;
         |if (${ev.isNull}_ok) {
         |  for (int $j = $i; $j < $str.length(); $j++) {
         |    char ch = $str.charAt($j);
         |    if (!Character.isDigit(ch)) { ${ev.isNull}_ok = false; break; }
         |    $acc = $acc * 10L + (ch - '0');
         |    if ($acc > Integer.MAX_VALUE) { ${ev.isNull}_ok = false; break; }
         |  }
         |}
         |if (${ev.isNull}_ok) { ${ev.value} = (int) $acc; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
