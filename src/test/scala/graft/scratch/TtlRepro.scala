package graft.scratch

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import scala.concurrent.duration._

/** Minimal reproduction harness for the round-3 TWS TTL hang (NEXT.md):
  * a TTLConfig'd ValueState processor in TimeMode.ProcessingTime hung its
  * first micro-batch at local[4]/RocksDB. Run standalone under `timeout`:
  *   sbt "Test/runMain graft.scratch.TtlRepro <mode>"
  * mode: ttl-proc | ttl-none | ttl-hdfs (HDFS state store + TTL)
  */
object TtlRepro {
  final case class Evt(k: Long, v: Long)
  final case class Out(k: Long, n: Long)

  final class DedupProc extends StatefulProcessor[Long, Evt, Out] {
    @transient private var seen: ValueState[Long] = _
    var ttl: TTLConfig = TTLConfig.NONE
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)
    override def handleInputRows(k: Long, rows: Iterator[Evt],
        tv: TimerValues): Iterator[Out] = {
      val n = rows.size.toLong
      if (seen.exists()) Iterator.empty
      else { seen.update(n); Iterator.single(Out(k, n)) }
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("ttl-proc")
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    if (mode != "ttl-hdfs")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (mode == "ttl-nodata-off")
      b.config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Evt]
    mem.addData(Evt(1L, 10), Evt(2L, 20), Evt(1L, 30))

    val proc = new DedupProc
    proc.ttl = if (mode == "ttl-none") TTLConfig.NONE
      else TTLConfig(java.time.Duration.ofMinutes(1))
    implicit val outEnc = Encoders.product[Out]
    val out = mem.toDS()
      .groupByKey(_.k)
      .transformWithState(proc, TimeMode.ProcessingTime(), OutputMode.Update())

    val dir = java.nio.file.Files.createTempDirectory("ttlrepro").toString
    val q = out.writeStream
      .format("memory").queryName("ttl_repro").outputMode("update")
      .option("checkpointLocation", dir)
      .start()
    println(s"[repro] mode=$mode started, processing first batch...")
    val t0 = System.nanoTime()
    q.processAllAvailable()
    println(f"[repro] first batch done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println("[repro] rows: " + spark.table("ttl_repro").collect().mkString(", "))
    q.stop(); spark.stop()
    println("[repro] SUCCESS")
  }
}
