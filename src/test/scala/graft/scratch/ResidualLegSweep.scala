package graft.scratch

import graft.{GraftSession, Tables}
import graft.ext.{DedupOps, LshTuning, Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness (round-20, round-19 verdict #5): could an
  * s09-style RESIDUAL-quantizer leg replace the exact-cosine IVF leg in
  * the past-width-cap fusion (s38) — same 0.95 probe target, same
  * auto-nlist sizing, same Hamming co-leg — at better agreement or cost?
  *
  * The residual leg swaps [[Similarity.ivfRankingTop]]'s exact in-list
  * cosine for the s09 shape: residual-PQ ADC scoring of the probed
  * candidates + exact-cosine rerank of the top refine·k. Per-candidate
  * math drops from a dim-length dot to m LUT adds, at the price of ADC
  * ranking error feeding the rerank cutoff.
  *
  * Run (both gate scales):
  *   sbt "Test/runMain graft.scratch.ResidualLegSweep /root/testdata/sf0.001"
  *   sbt "Test/runMain graft.scratch.ResidualLegSweep /root/testdata/sf0.01"
  */
object ResidualLegSweep {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get()
    import spark.implicits._
    val n = Tables.cachedCount(spark, dir, "embeddings")
    val nlist = DedupOps.semanticDedupNlist(n)
    val np = LshTuning.ivfNprobe(Similarity.S02FusionTargetRecall, nlist)
    println(s"== residual-leg sweep dir=$dir n=$n nlist=$nlist nprobe=$np")

    val truth = Similarity.s34RrfHybrid(spark, dir)
      .select($"query_id", $"id").localCheckpoint(true)

    def agreement(fused: DataFrame): Double =
      Similarity.recallAtK(truth, fused.select($"query_id", $"id"),
          "query_id", "id", k = 5)
        .agg(avg($"recall")).head.getDouble(0)

    def time2[A](mk: () => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    // ---- current leg: exact-cosine IVF ranking from the list store
    def currentFused(): DataFrame = Similarity.rrfIvfFusedTop5(spark, dir)
    val aCur = agreement(currentFused())
    val tCur = time2(() => currentFused())
    println(f"current ivf leg:  agreement@5=$aCur%.4f  min-time=$tCur%.2f s")

    // ---- residual leg: s09 shape at the leg's sizing/probe depth
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val q = e.filter($"vec_id" < 20).localCheckpoint(true)
    val model = Similarity.ivfPqTrain(e, "vec_id", "embedding",
      nlist = nlist, m = 8, ksub = 16, iters = 2, byResidual = true)
    val codes = Similarity.ivfPqEncode(model, e, "vec_id", "embedding")
      .localCheckpoint(true) // untimed: the content-addressed-store analogue
    def residualFused(refine: Int): DataFrame = {
      val leg = Similarity.ivfPqSearch(model, codes, e, q,
          "vec_id", "embedding", k = 10, nprobe = np, refine = refine)
        .select($"query_id", $"id", $"rank")
      val ham = Similarity.hammingRankingFromSigs(
        Similarity.binarySigTable(spark, dir), k = 10)
      Retrieval.rrfFuse(Seq(leg, ham), "query_id", "id", "rank", k = 5)
    }
    for (refine <- Seq(2, 4)) {
      val aRes = agreement(residualFused(refine))
      val tRes = time2(() => residualFused(refine))
      println(f"residual leg (refine=$refine): agreement@5=$aRes%.4f  " +
        f"min-time=$tRes%.2f s")
    }
  }
}
