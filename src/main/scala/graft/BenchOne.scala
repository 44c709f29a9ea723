package graft
import org.apache.spark.sql.SparkSession

/** Single-query bench/explain tool for iterating on one operator:
  *
  * {{{ sbt "runMain graft.BenchOne d04_ngram_jaccard /root/testdata/sf0.1 3" }}}
  *
  * Prints the formatted physical plan once, then per-rep wall seconds (after
  * an untimed sf0.001 warmup like [[Bench]]). Same session config as Bench so
  * numbers are comparable.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        // SPARK_GRAFT_SHUFFLE sizes the shuffle for scale-up probes: at
        // the 100x dataset the candidate transients of the banded
        // operators want more, smaller sort spills than cores (the
        // round-16 s26 spill diagnosis); default stays the core count
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      // SPARK_GRAFT_KNN_RANK={window|heap} forces the knn-graph ranking
      // plan for the partitions x plan sweep (round-17 verdict #2);
      // unset = knnGraphAuto's estimate-driven switch
      .config("spark.graft.knngraph.rankPlan",
        sys.env.getOrElse("SPARK_GRAFT_KNN_RANK", "auto"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    // noop drain, NOT count(): a count-only plan lets Catalyst DELETE
    // unreferenced output expressions (q37's percentile aggs measured
    // 0.48 s under count() vs 3.31 s under the noop sink — the round-10
    // footgun now recorded in the verify skill). Same methodology as
    // Bench, so BenchOne numbers are comparable to the per-round record.
    def drain(dir: String): Unit =
      q(spark, dir).write.format("noop").mode("overwrite").save()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) drain(warmDir)
    q(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      drain(sfDir)
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
