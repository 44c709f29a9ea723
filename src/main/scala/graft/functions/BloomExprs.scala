package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Broadcast-handle variant of [[BloomContainsAny]]: the serialized sketch
  * rides a Spark broadcast (torrented to each executor once) instead of the
  * logical plan, so analyzer/optimizer plan copies, event-log plan dumps, and
  * driver plan memory stay independent of sketch size — at the operator's
  * documented envelope (10⁸ grams, fpp 1e-3 ≈ 170 MiB) a plan literal is a
  * real driver cost even though tasks never re-ship it.
  *
  * The expression itself is the codegen reference object: it travels with the
  * plan carrying only the (tiny) broadcast handle, and the sketch is
  * deserialized lazily once per deserialized instance (i.e. per executor
  * task-binary, not per row). Same probe semantics as [[BloomContainsAny]]:
  * no false negatives, null elements skipped, null array yields null. */
case class BloomBroadcastContainsAny(bcast: Broadcast[Array[Byte]],
    values: Expression) extends UnaryExpression {

  override def child: Expression = values
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_broadcast_contains_any"

  override def checkInputDataTypes(): TypeCheckResult = values.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_broadcast_contains_any expects array<bigint> values, got ${dt.simpleString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bcast.value))

  /** Shared by interpreted eval and the codegen'd call — a single virtual
    * call per row with the short-circuit loop inside. */
  def probe(data: ArrayData): Boolean = {
    val n = data.numElements()
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i) && filter.mightContainLong(data.getLong(i)))
        return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(arr: Any): Any =
    probe(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("graftBloomBc", this,
        classOf[BloomBroadcastContainsAny].getName)
      s"${ev.value} = $ref.probe($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(values = newChild)
}

object BloomExprs {
  import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
  import org.apache.spark.sql.classic.ExpressionColumnHelper.expr

  /** Codegen'd any-element bloom probe over an `array<long>` column. */
  def containsAny(bloom: Column, values: Column): Column =
    toCol(BloomContainsAny(expr(bloom), expr(values)))

  /** [[containsAny]] with the sketch behind a broadcast handle — the form
    * the production decontamination paths use (plan stays literal-free). */
  def containsAnyBroadcast(bloom: Broadcast[Array[Byte]], values: Column): Column =
    toCol(BloomBroadcastContainsAny(bloom, expr(values)))
}
