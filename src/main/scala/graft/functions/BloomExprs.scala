package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains_any(bloom, values)` — true iff ANY element of the
  * `array<long>` column might be in the serialized
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * Why a custom Expression (builder-brief preference order, same reasoning as
  * [[DotProduct]]): the declarative form `exists(values, v =>
  * might_contain(bloom, v))` is a higher-order function — CodegenFallback,
  * per-element interpreted lambda dispatch — and Spark's own
  * `BloomFilterMightContain` is scalar-only. This expression deserializes the
  * filter ONCE per task (transient lazy + codegen reference object, exactly
  * `BloomFilterMightContain`'s approach), probes with a tight short-circuit
  * loop, and stays inside WholeStageCodegen.
  *
  * The bloom side must be FOLDABLE (a plan literal): the filter is a
  * broadcast-sized sketch built once from the benchmark corpus — see
  * [[graft.streaming.CurationStream]] for the producing aggregation.
  *
  * No false negatives (a present element always returns true); false
  * positives at the filter's configured FPP. Null elements are skipped; a
  * null array yields null.
  */
case class BloomContainsAny(bloom: Expression, values: Expression)
  extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = values
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_any"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bloom.dataType != BinaryType || !bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_contains_any expects a foldable binary bloom filter, got " +
          s"${bloom.dataType.simpleString} (foldable=${bloom.foldable})")
    else values.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_any expects array<bigint> values, got ${dt.simpleString}")
    }
  }

  /** Deserialized once per task / codegen reference; the serialized bytes
    * travel in the plan (they're a literal). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloomBytes: Any, arr: Any): Any = {
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i) && filter.mightContainLong(data.getLong(i)))
        return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, arr) => {
      val bf = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
      val found = ctx.freshName("found")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |boolean $found = false;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  if (!$arr.isNullAt($i) && $bf.mightContainLong($arr.getLong($i))) {
         |    $found = true;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, values = newRight)
}

object BloomExprs {
  import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
  import org.apache.spark.sql.classic.ExpressionColumnHelper.expr

  /** Codegen'd any-element bloom probe over an `array<long>` column. */
  def containsAny(bloom: Column, values: Column): Column =
    toCol(BloomContainsAny(expr(bloom), expr(values)))
}
