package graft.scratch

import graft.{GraftSession, Tables}
import graft.ext.{DedupOps, LshTuning, Retrieval, Similarity}
import org.apache.spark.sql.functions._

/** One-off measurement harness (round-18 verdict #3): mean agreement@5 of
  * the SERVED hybrid fusion against the s34 brute fusion, swept over the
  * probed leg's budget target — the curve that picks
  * [[Similarity.S02FusionTargetRecall]]. Also re-measures the knn-graph
  * recall@3 at one NON-DEFAULT horizon target (verdict #4's done gate).
  * Run:
  *   sbt "Test/runMain graft.scratch.FusionSweep /root/testdata/sf0.001"
  */
object FusionSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get()
    import spark.implicits._
    val truth = Similarity.s34RrfHybrid(spark, dir)
      .select($"query_id", $"id").localCheckpoint(true)
    val ham = Similarity.hammingRankingFromSigs(
      Similarity.binarySigTable(spark, dir), k = 10).localCheckpoint(true)
    val pw = Similarity.bucketPlanes(
      Tables.cachedCount(spark, dir, "embeddings"))
    def agreement(target: Double, k: Int): (Int, Double, Double) = {
      val budget = (w: Int) =>
        LshTuning.probeBudget(target, Similarity.S02NeighborCos, w,
          Similarity.s02ProbeBits(w))
      val probed = Similarity.s02ProbedRanking(spark, dir, k = k, budget)
      val fused = Retrieval.rrfFuse(Seq(probed, ham),
        "query_id", "id", "rank", k = 5).select($"query_id", $"id")
      val mean = Similarity.recallAtK(truth, fused, "query_id", "id", k = 5)
        .agg(avg($"recall")).as[Double].head()
      (budget(pw), (budget(pw) + 1).toDouble / (1L << pw), mean)
    }
    println(s"== dir=$dir width=$pw")
    for ((t, k) <- Seq((0.8, 10), (0.85, 10), (0.9, 10), (0.95, 10),
        (0.975, 10), (0.9, 20), (0.95, 20))) {
      val t0 = System.nanoTime()
      val (b, frac, mean) = agreement(t, k)
      println(f"target=$t%.3f k=$k budget=$b fraction=$frac%.3f " +
        f"agreement@5=$mean%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    // verdict #4 done gate: knn-graph recall@3 vs brute truth at one
    // non-default horizon target, config derived from the model
    val full = Tables.loadSpread(spark, dir, "embeddings")
    val n = Tables.cachedCount(spark, dir, "embeddings")
    val e = full
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.l2($"v"))
      .localCheckpoint(true)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos6".desc, $"vec_id")
    val gTruth = broadcast(
        e.select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn")))
      .join(e, $"qid" =!= $"vec_id")
      .withColumn("cos6", round(
        graft.functions.VectorExprs.dot($"qv", $"v") / ($"qn" * $"nrm"), 6))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter($"rk" <= 3).select($"qid", $"vec_id")
      .localCheckpoint(true)
    for ((hc, hr) <- Seq((0.35, 0.85), (0.35, 0.95))) {
      val (b, q, mr) = DedupOps.tuneGraphConfig(n, hc, hr, 32L)
      val approx = DedupOps.knnGraphAuto(full, "vec_id", "embedding", k = 3,
          targetHorizon = Some(hc), horizonRecall = hr,
          knownCount = Some(n))
        .select($"src".as("qid"), $"dst".as("vec_id"))
      val rec = Similarity.recallAtK(gTruth, approx, "qid", "vec_id", k = 3)
        .agg(avg($"recall")).as[Double].head()
      println(f"horizon=cos $hc%.2f@$hr%.2f -> bands=$b probes=$q " +
        f"model=$mr%.3f measured recall@3=$rec%.4f")
    }
    spark.stop()
  }
}
