package graft.scratch

import graft.{GraftSession, Tables}
import graft.ext.{DedupOps, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off measurement harness: mean recall@3 of the banded knn-graph on
  * the 500-vector witness slice, swept over multi-probe counts at the
  * PRODUCTION band width (adaptivePlanes over the full corpus — the config
  * s26 actually serves). Run:
  *   sbt "Test/runMain graft.scratch.KnnRecallSweep /root/testdata/sf0.001"
  */
object KnnRecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get()
    import spark.implicits._
    val full = Tables.loadSpread(spark, dir, "embeddings")
    val n = full.count()
    val w = DedupOps.adaptivePlanes(n, 512L, 4)
    println(s"== corpus n=$n productionWidth=$w")
    val e = full.filter($"vec_id" < 500)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.l2($"v"))
      .localCheckpoint(true)
    val win = Window.partitionBy($"qid").orderBy($"cos6".desc, $"vec_id")
    val truth = broadcast(
        e.select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn")))
      .join(e, $"qid" =!= $"vec_id")
      .withColumn("cos6", round(
        graft.functions.VectorExprs.dot($"qv", $"v") / ($"qn" * $"nrm"), 6))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter($"rk" <= 3).select($"qid", $"vec_id")
      .localCheckpoint(true)
    for (probes <- Seq(0, 1, 2, 3)) {
      val t0 = System.nanoTime()
      val approx = DedupOps.knnGraph(full.filter($"vec_id" < 500),
          "vec_id", "embedding", k = 3, planesPerBand = w, probes = probes)
        .select($"src".as("qid"), $"dst".as("vec_id"))
      val mean = Similarity.recallAtK(truth, approx, "qid", "vec_id", k = 3)
        .agg(avg($"recall")).as[Double].head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== probes=$probes meanRecall@3=$mean%.4f (${secs}%.1f s)")
    }
    spark.stop()
  }
}
