// in graft.ext so the private[ext] unitVecs/cachedFit are timeable
package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** One-off stage profile of d15's plan at a given dir (round 21): times
  * each sub-plan with the noop drain so the remaining cost after the
  * CosineDropAgg re-plan is attributable — assignment scan, drop
  * aggregation, anti join, final sort.
  *   sbt "Test/runMain graft.ext.D15Stages /root/repo/target/sf1.0"
  */
object D15Stages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1.0")
    val spark = GraftSession.get()
    import spark.implicits._
    def drain(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"== $tag rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val e = Tables.loadSpread(spark, dir, "embeddings")
    drain(e, "scan")
    val uv = Similarity.unitVecs(e, "vec_id", "embedding", "vec_id")
    drain(uv, "unitVecs")
    val cents = Similarity.cachedFit("d15", dir)(
      Similarity.kmeansFit(uv.filter($"vec_id" < 256), "vec_id", "__u",
        k = 8, iters = 2))
    println("== fit cached")
    val asg = Similarity.kmeansAssign(uv, "vec_id", "__u", cents)
      .select($"vec_id", $"cluster")
    drain(asg, "assign")
    val withCid = e.join(asg, Seq("vec_id"))
    drain(withCid, "withCid")
    val drop = DedupOps.cosineDropIds(withCid, "vec_id", "embedding", "cluster", 0.35)
      .select($"id_b".as("vec_id"))
    drain(drop, "dropSet")
    val anti = withCid.join(drop, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cluster")
    drain(anti, "anti")
    drain(anti.orderBy($"vec_id"), "full")
    spark.stop()
  }
}

/** Companion probe: cluster-size skew + a local replay of CosineDropAgg's
  * finish on the LARGEST cluster, timed, to attribute the drop stage cost.
  *   sbt "Test/runMain graft.ext.D15Finish /root/repo/target/sf1.0"
  */
object D15Finish {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1.0")
    val spark = GraftSession.get()
    import spark.implicits._
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val uv = Similarity.unitVecs(e, "vec_id", "embedding", "vec_id")
    val cents = Similarity.cachedFit("d15", dir)(
      Similarity.kmeansFit(uv.filter($"vec_id" < 256), "vec_id", "__u",
        k = 8, iters = 2))
    val asg = Similarity.kmeansAssign(uv, "vec_id", "__u", cents)
      .select($"vec_id", $"cluster")
    val sizes = asg.groupBy($"cluster").count().orderBy($"count".desc)
      .as[(Long, Long)].collect()
    println(s"== cluster sizes: ${sizes.mkString(", ")}")
    val biggest = sizes.head._1
    val members = e.join(asg, Seq("vec_id")).filter($"cluster" === biggest)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    println(s"== biggest cluster $biggest: ${members.length} rows")
    val agg = new graft.functions.Aggregators.CosineDropAgg(0.35)
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val out = agg.finish(members.toVector)
      println(f"== finish rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s dropped=${out.length}")
    }
    spark.stop()
  }
}

/** Third probe: isolate the dropSet stage — input projection alone, a
  * trivial count agg on the same grouping, the CosineDropAgg udaf, and an
  * explode-only variant — to attribute the 6 s (encoder vs shuffle vs
  * finish).
  *   sbt "Test/runMain graft.ext.D15Pieces /root/repo/target/sf1.0"
  */
object D15Pieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1.0")
    val spark = GraftSession.get()
    import spark.implicits._
    def drain(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"== $tag rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val uv = Similarity.unitVecs(e, "vec_id", "embedding", "vec_id")
    val cents = Similarity.cachedFit("d15", dir)(
      Similarity.kmeansFit(uv.filter($"vec_id" < 256), "vec_id", "__u",
        k = 8, iters = 2))
    val asg = Similarity.kmeansAssign(uv, "vec_id", "__u", cents)
      .select($"vec_id", $"cluster")
    val withCid = e.join(asg, Seq("vec_id"))
    val proj = withCid
      .select(col("cluster").as("__blk"), col("vec_id").cast("long").as("__id"),
        transform(col("embedding"), x => x.cast("double")).as("__v"))
    drain(proj, "proj")
    drain(proj.groupBy(col("__blk")).agg(count(lit(1))), "countAgg")
    drain(proj.groupBy(col("__blk"))
      .agg(sum(element_at(col("__v"), 1))), "sumAgg")
    val agg = udaf(new graft.functions.Aggregators.CosineDropAgg(0.35),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Double])]())
    val dropA = proj.groupBy(col("__blk"))
      .agg(agg(col("__id"), col("__v")).as("__drop"))
    drain(dropA, "dropAgg")
    drain(dropA.select(explode(col("__drop")).as("__dropId")), "dropExplode")
    spark.stop()
  }
}
