package graft.scratch

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** One-off: time the PRODUCTION auto-k semanticDedup (corpus-proportional
  * cluster count) at a given dir — the counter-evidence to d15's fixed-k=8
  * oracle-witness config at large SF.
  *   sbt "Test/runMain graft.scratch.SemDedupSf10 /root/repo/target/sf10"
  */
object SemDedupSf10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = GraftSession.get()
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val n = e.count()
    val k = graft.ext.DedupOps.semanticDedupNlist(n)
    println(s"== n=$n autoK=$k")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val kept = graft.ext.DedupOps.semanticDedup(
        e, "vec_id", "embedding", threshold = 0.995)
      kept.write.format("noop").mode("overwrite").save()
      println(f"== rep=$rep ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
