package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling fact tables on their join key so repeated joins
  * run exchange-free (SURVEY §2.8 joins row / builder brief "bucketing for
  * co-located joins"). At 100 TB this converts every fact-fact join on the
  * bucket key from a full shuffle into a local zip of bucket files. */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with no Exchange on either side") {
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    li.write.mode("overwrite").option("path", s"$wh/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("graft_li_b")
    o.write.mode("overwrite").option("path", s"$wh/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("graft_o_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_li_b")
        .join(spark.table("graft_o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
    }
  }
}
