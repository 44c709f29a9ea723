package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming exact-dedup with a state TTL — the transformWithState twin of
  * `dropDuplicatesWithinWatermark` for pipelines that key on PROCESSING
  * time: a key is emitted on first sight and suppressed for `ttl`, after
  * which the state store expires the entry and the key may be emitted again.
  *
  * This is the shape a 100 TB ingest dedup needs: state is one small record
  * per DISTINCT key seen within the TTL horizon (not per event), hash-
  * partitioned by key on RocksDB, and the TTL bounds state size without any
  * watermark plumbing — the store evicts expired rows itself (Spark encodes
  * the expiry alongside the value and filters/cleans up on read/maintenance),
  * so retention needs no timers and no extra state.
  *
  * ==Operational requirement (Spark 4.1.2)==
  * A `TimeMode.ProcessingTime` transformWithState query must run with
  * `spark.sql.streaming.noDataMicroBatches.enabled=false`. With the default
  * (true), every no-data micro-batch advances processing time, which marks
  * the stateful operator as needing another cleanup batch — scheduling an
  * ENDLESS chain of no-data micro-batches: the query burns CPU scheduling
  * hundreds of empty stages per minute and `processAllAvailable` never
  * returns (reproduced minimally in graft.scratch.TtlRepro: hangs with the
  * default, 3 s with it disabled, identical output; event-time TWS like
  * [[TwsSessions]] does not loop). [[dedupWithTtl]] asserts the setting
  * rather than silently hanging.
  */
object TwsDedup {

  /** First-sight pass-through with TTL'd suppression state. Emits the FIRST
    * event per key (at-least-once downstream contract like the reference
    * sink's, SURVEY.md §2.6); duplicates within `ttl` are dropped. */
  final class DedupProcessor[T](ttl: java.time.Duration)
      extends StatefulProcessor[String, T, T] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[T],
        tv: TimerValues): Iterator[T] = {
      // rows of one key in one batch are also duplicates of each other:
      // emit only the first, whether or not state existed before
      if (!rows.hasNext || seen.exists()) Iterator.empty
      else { seen.update(true); Iterator.single(rows.next()) }
    }
  }

  /** Dedup `events` on `key`, suppressing repeats for `ttl` of processing
    * time. Output rows are the first-seen events, unchanged. */
  def dedupWithTtl[T: Encoder](events: Dataset[T], key: T => String,
      ttl: java.time.Duration): Dataset[T] = {
    val conf = events.sparkSession.conf
    require(conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "false",
      "processing-time transformWithState requires " +
        "spark.sql.streaming.noDataMicroBatches.enabled=false on this Spark " +
        "version; the default loops no-data micro-batches forever (see " +
        "TwsDedup scaladoc)")
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(key)
      .transformWithState(new DedupProcessor[T](ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
