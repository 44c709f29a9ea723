package graft.scratch

import graft.{GraftSession, Tables}
import graft.ext.DedupOps
import org.apache.spark.sql.functions._

/** One-off: time knnGraph at a dir across (width, probes, target) configs.
  *   sbt "Test/runMain graft.scratch.KnnBenchSweep <dir> <w:p:target,...>"
  */
object KnnBenchSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val n = e.count()
    println(s"== n=$n")
    for (cfg <- args(1).split(",")) {
      val Array(tgt, p) = cfg.split(":").map(_.toInt)
      val w = DedupOps.adaptivePlanes(n, tgt.toLong, 4)
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val cnt = DedupOps.knnGraph(e, "vec_id", "embedding", k = 3,
          planesPerBand = w, probes = p).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"== target=$tgt w=$w probes=$p rep=$rep rows=$cnt ${secs}%.1f s")
      }
    }
    spark.stop()
  }
}
