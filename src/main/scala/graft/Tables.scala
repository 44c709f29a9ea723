package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are parquet; loading through here keeps the scan declarative so
  * Catalyst applies predicate pushdown and column pruning — at 100 TB the scan
  * must only read the columns/rows each query touches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize the driver-generated `ts` column to session-zoned TIMESTAMP
    * across the encodings the generator has produced:
    *  - TIMESTAMP(NANOS): no native Spark type — read as LongType via
    *    spark.sql.legacy.parquet.nanosAsLong (set in GraftSession/Verify/
    *    Bench) and converted here. Integer `div` keeps full precision — a
    *    double round-trip would corrupt µs at 1e18 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
    *    TIMESTAMP_NTZ; cast interprets the wall-clock in the session zone
    *    (UTC everywhere here), matching both the nanos path's instants and
    *    DuckDB's naive-timestamp oracle reads.
    * Already-LTZ data passes through untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Load a table and ensure downstream per-row CPU work can use the whole
    * cluster: when the scan yields fewer splits than the available
    * parallelism (tiny files / single parquet row group — exactly the local
    * test fixture), round-robin repartition; otherwise leave the scan's
    * natural partitioning alone.
    *
    * At 100 TB the scan produces thousands of row-group splits and this is a
    * deliberate NO-OP — an unconditional repartition there would shuffle the
    * entire corpus for nothing. The condition is what makes the helper safe
    * to use on every CPU-bound chain (tokenize/shingle/hash, vector math).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view for `spark.sql` surfaces. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
