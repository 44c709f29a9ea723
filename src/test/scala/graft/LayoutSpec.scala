package graft

import graft.functions.Layout
import org.apache.spark.sql.functions._

/** Z-order key: bit-for-bit parity with the driver-side reference, and the
  * locality property that makes it a layout key — range-bucketing the key
  * bounds BOTH dimensions per bucket (sub-rectangles, not stripes). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey matches the local reference on a value grid") {
    val vals = (0 until 64).map(i => (i.toLong * 17 % 1024, i.toLong * 31 % 1024))
    val got = vals.toDF("x", "y")
      .withColumn("z", Layout.zorderKey($"x", $"y", 10))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == Layout.zorderKeyLocal(x, y, 10), s"mismatch at ($x,$y)")
    }
  }

  test("graft_zorder SQL function agrees with the Column form and validates args") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_zorder(x, y, 10) AS z FROM VALUES (3L, 5L), (1023L, 0L) AS t(x, y)")
      .as[Long].collect().toSeq
    assert(got == Seq(Layout.zorderKeyLocal(3, 5, 10), Layout.zorderKeyLocal(1023, 0, 10)))
    // default width + 2-arg form
    assert(spark.sql("SELECT graft_zorder(7L, 9L) AS z").as[Long].head() ==
      Layout.zorderKeyLocal(7, 9, 21))
    // bits must be a literal: a column reference is a plan-time error
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zorder(x, y, CAST(x AS INT)) FROM VALUES (1L, 2L) AS t(x, y)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_zorder"))
  }

  test("sortableBits is strictly order-preserving over the double line") {
    val vals = Seq(Double.NegativeInfinity, -1.7e308, -3.5, -2.0, -1.0,
      -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue, 1e-300,
      0.5, 1.0, 2.0, 3.5, 1.7e308, Double.PositiveInfinity)
    // driver-side reference: strictly increasing along the sorted line
    vals.sliding(2).foreach { case Seq(a, b) =>
      assert(Layout.sortableBitsLocal(a) < Layout.sortableBitsLocal(b),
        s"order violated at ($a, $b)")
      case _ =>
    }
    // NaN above +Inf (Spark's sort order)
    assert(Layout.sortableBitsLocal(Double.NaN) >
      Layout.sortableBitsLocal(Double.PositiveInfinity))
    // codegen'd Expression matches the reference bit-for-bit (indexed: a
    // Double-keyed map would fold −0.0 and +0.0 into one entry)
    val got = vals.zipWithIndex.toDF("v", "i")
      .withColumn("b", Layout.sortableBits($"v"))
      .select($"i", $"b").as[(Int, Long)].collect().toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == Layout.sortableBitsLocal(v), s"at $v") }
    // null propagates
    assert(Seq[Option[Double]](None).toDF("v")
      .select(Layout.sortableBits($"v")).head().isNullAt(0))
  }

  test("range-bucketed zorder keys bound both dimensions (locality)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(($"l_orderkey" % 1024).as("xk"), ($"l_partkey" % 1024).as("yk"))
      .withColumn("bucket", shiftright(Layout.zorderKey($"xk", $"yk", 10), 14))
    val boxes = li.groupBy($"bucket")
      .agg(min($"xk").as("x0"), max($"xk").as("x1"),
        min($"yk").as("y0"), max($"yk").as("y1"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(boxes.nonEmpty)
    // top 6 bits of a 20-bit key pin 3 high bits of each dim -> spans <= 128
    boxes.foreach { case (b, x0, x1, y0, y1) =>
      assert(x1 - x0 < 128 && y1 - y0 < 128,
        s"bucket $b box ($x0..$x1, $y0..$y1) exceeds the 128-wide cell")
    }
  }
}
