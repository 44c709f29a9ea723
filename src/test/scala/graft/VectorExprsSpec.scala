package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._

/** Native DotProduct spec: bit-identical to the declarative fold it
  * replaces, stays inside WholeStageCodegen (the fold is CodegenFallback),
  * and handles nulls/mismatched lengths. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)

  test("bit-identical to the aggregate/zip_with fold on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val cmp = e.select(
        VectorExprs.dot($"v", $"v").as("native"),
        hofDot($"v", $"v").as("hof"))
      .filter($"native" =!= $"hof") // exact double comparison, no tolerance
    assert(cmp.count() == 0, "left-to-right sum must match exactly")
  }

  test("stays inside WholeStageCodegen where the fold falls out") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(transform($"embedding", x => x.cast("double")).as("v"))
    val nativePlan = e.select(VectorExprs.dot($"v", $"v"))
      .queryExecution.executedPlan.toString
    val hofPlan = e.select(hofDot($"v", $"v"))
      .queryExecution.executedPlan.toString
    assert(nativePlan.linesIterator.next().startsWith("*("),
      s"native dot must fuse:\n$nativePlan")
    assert(!hofPlan.linesIterator.next().startsWith("*("),
      "precondition: the HOF form is CodegenFallback (else this expr is moot)")
  }

  test("null inputs, null elements, mismatched lengths") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0))),      // common prefix only
      (None, Some(Seq(1.0))),                                // null input
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val out = df.select(VectorExprs.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 11.0)
    assert(spark.range(1).select(VectorExprs.l2(array(lit(3.0), lit(4.0)))).head.getDouble(0) == 5.0)
  }
}
