package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) drops
  * out of whole-stage codegen (lambda eval per element); this expression
  * generates a primitive `double` loop inside the stage instead — rung (b)
  * of the custom-operator ladder. The fold is sequential left-to-right, so
  * results stay bit-identical to the HOF version and to the DuckDB oracle's
  * `list_reduce`.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> (call sites guarantee it; the SQL surface
  // documents it). No ExpectsInputTypes: AbstractDataType is private[sql].
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API + SQL-registration surface for the native vector expressions. */
object NativeVector {

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def norm2(a: Column): Column = dot(a, a)

  /** cos = dot/sqrt(n2a*n2b) — same shape as VectorFunctions.cosine and the
    * SQL oracle, just with the native kernel inside.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  private val info = new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot")
  private def builder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => ArrayDot(a, b)
    case _ => throw new IllegalArgumentException("graft_dot takes exactly 2 arguments")
  }

  /** Register `graft_dot` into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "graft_dot", info, builder)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` — rung (c):
  * library functions installed at session build time, usable from pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        (children: Seq[Expression]) => ArrayDot(children(0), children(1))))
}
