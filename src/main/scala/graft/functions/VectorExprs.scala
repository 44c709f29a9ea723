package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector dot product — the hot inner loop of every similarity /
  * near-dup operator (SURVEY §2.8 LLM extensions; Dedup.d05, Similarity,
  * DedupOps).
  *
  * Why a custom Expression (decision per the builder brief's preference
  * order): the declarative form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * uses higher-order functions, which are CodegenFallback in Spark — every
  * row pays interpreted lambda dispatch per ELEMENT plus an intermediate
  * zipped-array allocation, and the enclosing Project falls out of
  * WholeStageCodegen. This expression generates a tight primitive loop
  * (`doGenCode`), keeps the stage fused, and allocates nothing.
  *
  * Semantics: left-to-right sum over the common prefix of the two arrays —
  * bit-identical to the fold it replaces on null-free vectors (null
  * elements are treated as 0.0; the engine's embedding columns are
  * null-free by construction).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
  import org.apache.spark.sql.classic.ExpressionColumnHelper.expr

  /** Codegen'd dot product of two vector columns (cast to array<double>). */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(expr(a.cast("array<double>")), expr(b.cast("array<double>"))))

  /** Codegen'd L2 norm: sqrt(v·v). */
  def l2(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))
}
