package graft
import org.apache.spark.sql.SparkSession

/** [[BenchOne]] for a LIST of queries in one JVM — the scale-probe tool
  * for measuring a changed subset at an alternate SF dir without paying
  * one JVM start per query:
  *
  * {{{ sbt "runMain graft.BenchSome target/sf1.0 3 s25_mmr_rerank q40_percentiles_hist" }}}
  *
  * Same session shape and noop-drain methodology as [[Bench]]; per-query
  * min-of-reps printed as one summary line each.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BenchSome <sfDir> <reps> <query>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    // fail fast on a misspelled query name (round-20 ADVICE: a bad name
    // otherwise printed min=-1.000 as a normal summary line at rc=0 — easy
    // to mistake for a valid measurement in bench notes)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: " +
        unknown.mkString(", "))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.graft.knngraph.rankPlan",
        sys.env.getOrElse("SPARK_GRAFT_KNN_RANK", "auto"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drain(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach(n => try drain(n, warmDir) catch { case _: Throwable => () })
    var anyAllFailed = false
    names.foreach { n =>
      var firstErr: Option[Throwable] = None
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { drain(n, sfDir); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          if (firstErr.isEmpty) firstErr = Some(t)
          Double.NaN
        }
      }
      val ok = ts.filterNot(_.isNaN)
      println(f"[benchsome] $n min=${ok.minOption.getOrElse(-1.0)}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
      // a query with NO successful rep is an error, not a measurement
      // (round-20 ADVICE): surface the first exception and exit nonzero
      if (ok.isEmpty) {
        anyAllFailed = true
        firstErr.foreach(t => println(
          s"[benchsome] $n FAILED every rep: ${t.getClass.getName}: ${t.getMessage}"))
      }
    }
    spark.stop()
    if (anyAllFailed) sys.exit(1)
  }
}
