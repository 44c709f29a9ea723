package graft
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence files the
  * optimization rounds commit under plans/rNN/.
  *
  * {{{ sbt "runMain graft.PlanSnap plans/r20 before s25_mmr_rerank t27_bpe_segment" }}}
  *
  * Uses the same session shape as [[Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cores, AQE on) so the printed plan is the plan the
  * bench runs. This is the PRE-execution formatted plan (join strategy,
  * PushedFilters, ReadSchema, Exchange placement, codegen spans);
  * [[PlanDump]] remains the tool for the POST-execution AQE-final plan.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <query>...")
    val outDir = new java.io.File(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    outDir.mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"${name}_$tag.txt").toPath,
        s"== $name ($tag, $sfDir) ==\n" + txt)
      println(s"[plansnap] wrote ${name}_$tag.txt " +
        s"(exchanges=${"Exchange".r.findAllIn(txt).length})")
    }
    spark.stop()
  }
}
