package graft
import org.apache.spark.sql.SparkSession

/** Executed-plan dump for one query: runs the query (so AQE finalizes), then
  * prints the physical plan actually executed — ReusedExchange, runtime
  * broadcast conversions and skew splits included, which
  * [[BenchOne]]'s pre-execution `explain` cannot show.
  *
  * {{{ sbt "runMain graft.PlanDump d06_simhash_hamming /root/testdata/sf0.01" }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // collect() executes df's OWN QueryExecution (count() would build a new
    // one and leave this plan un-executed → AQE would print the initial,
    // never-run plan with isFinalPlan=false)
    val n = df.collect().length
    val full = df.queryExecution.executedPlan.toString
    // an executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" — count scans/reuse in the final section only
    val p = full.split("== Initial Plan ==").head
    println(s"[plandump] $name rows=$n scans=${p.split("Scan parquet").length - 1} " +
      s"reused=${p.contains("ReusedExchange")}")
    println(p)
    spark.stop()
  }
}
