package graft

import graft.functions.{functions => gf, GraftExtensions, XidGen}
import org.apache.spark.sql.functions._

/** Native xid expression spec — format, uniqueness, k-ordering, codegen, and
  * SQL registration (SURVEY §2.4 K2 / §4.3 custom-expression decision). */
class XidSpec extends SparkSpec {
  import spark.implicits._

  test("encode matches the public rs/xid test vector") {
    // xid README: "9m4e2mr0ui3e8a215n4g" <-> these 12 bytes
    val bytes = Array(0x4d, 0x88, 0xe1, 0x5b, 0x60, 0xf4, 0x86, 0xe4,
      0x28, 0x41, 0x2d, 0xc9).map(_.toByte)
    assert(XidGen.encode(bytes) == "9m4e2mr0ui3e8a215n4g")
  }

  test("xids are 20 chars over the base32hex alphabet and unique at volume") {
    val df = spark.range(100000).select(gf.xid().as("id"))
    val agg = df.agg(
      count_distinct($"id").as("uniq"),
      min(length($"id")).as("minlen"), max(length($"id")).as("maxlen"),
      max($"id".rlike("^[0-9a-v]{20}$").cast("int")).as("okmax"),
      min($"id".rlike("^[0-9a-v]{20}$").cast("int")).as("okmin")).first()
    assert(agg.getAs[Long]("uniq") == 100000L, "unique across parallel partitions")
    assert(agg.getAs[Int]("minlen") == 20 && agg.getAs[Int]("maxlen") == 20)
    assert(agg.getAs[Int]("okmin") == 1, "alphabet/format")
  }

  test("k-ordered: later seconds sort lexicographically later") {
    val early = XidGen.next(1700000000L)
    val late = XidGen.next(1700000001L)
    assert(early < late)
    assert(XidGen.next(0L) < XidGen.next(1L))
  }

  test("stays inside WholeStageCodegen") {
    val plan = spark.range(10).select(gf.xid()).queryExecution.executedPlan
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.toString.linesIterator.next().startsWith("*("),
      s"xid() must not break the codegen pipeline; got:\n$plan")
  }

  test("registers as a SQL function via extensions descriptor") {
    GraftExtensions.register(spark)
    val ids = spark.sql("SELECT xid() AS id FROM range(100)")
      .select($"id").as[String].collect()
    assert(ids.distinct.length == 100)
    assert(ids.forall(_.matches("^[0-9a-v]{20}$")))
  }
}
