package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Event-time twin of [[DedupProcessor]]: state TTL measured on EVENT time
    * (Spark's `TTLConfig` is processing-time only, so expiry here is a
    * first-class event-time TIMER armed at firstSeen + ttl — the same
    * mechanism [[TwsSessions]] uses). A key is emitted on first sight and
    * suppressed until the WATERMARK passes its expiry; the fired timer
    * clears the state, and a later arrival re-emits and re-arms.
    *
    * Operationally this is the variant that needs NO
    * `noDataMicroBatches.enabled=false` precondition: event-time TWS does
    * not loop no-data micro-batches (the round-3 repro was specific to
    * processing-time cleanup batches), and expiry is driven by the data's
    * own clock — a paused stream expires nothing, exactly what replaying a
    * backlog wants. State: one (expiry, timer) pair per distinct key inside
    * the TTL horizon, on RocksDB. */
  final class EventTimeDedupProcessor[T](ttlMs: Long, eventTimeMs: T => Long)
      extends StatefulProcessor[String, T, T] {
    @transient private var expiresAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      expiresAt = getHandle.getValueState[Long]("expiresAt",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[T],
        tv: TimerValues): Iterator[T] = {
      if (!rows.hasNext || expiresAt.exists()) Iterator.empty
      else {
        // fold to the MINIMUM event time: a micro-batch's iterator order is
        // not guaranteed, so "first seen" anchors on the data's own clock —
        // which row emits and when the key expires is deterministic no
        // matter how the batch's rows were partitioned or ordered
        var first = rows.next()
        var firstTs = eventTimeMs(first)
        while (rows.hasNext) {
          val r = rows.next()
          val ts = eventTimeMs(r)
          if (ts < firstTs) { first = r; firstTs = ts }
        }
        val exp = firstTs + ttlMs
        expiresAt.update(exp)
        getHandle.registerTimer(exp)
        Iterator.single(first)
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[T] = {
      // guard like TwsSessions: only a timer covering the CURRENT horizon
      // clears (a re-armed key's stale timer must not expire the new state)
      if (expiresAt.exists() && expiresAt.get() <= info.getExpiryTimeInMs)
        expiresAt.clear()
      Iterator.empty
    }
  }

  /** Dedup `events` on `key`, suppressing repeats for `ttl` of EVENT time:
    * the first event per key is emitted; duplicates are dropped until the
    * watermark passes firstSeen + ttl, after which the key may re-emit.
    * `events` must carry a watermark (`withWatermark` upstream).
    *
    * First-seen is DETERMINISTIC: within a micro-batch the minimum-event-time
    * row of a new key emits and anchors the expiry, whatever the batch order.
    *
    * Late-data contract (spec-pinned): an arrival BELOW the watermark is
    * dropped by the operator's watermark filter before the processor runs —
    * even for a key whose state already expired, it neither re-emits nor
    * re-arms state. A below-watermark replay is by definition a duplicate the
    * upstream already delivered inside the horizon; admitting it would arm an
    * expiry timer the watermark has already passed. In-horizon arrivals after
    * expiry re-emit (the at-least-once downstream contract, like the
    * reference sink's delivery semantics). */
  def dedupWithTtlEventTime[T: Encoder](events: Dataset[T], key: T => String,
      eventTime: T => java.sql.Timestamp,
      ttl: java.time.Duration): Dataset[T] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(key)
      .transformWithState(
        new EventTimeDedupProcessor[T](ttl.toMillis, t => eventTime(t).getTime),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming quality-aware dedup — [[graft.ext.DedupOps.keepBestPerGroup]]
    * in streaming form (round-13 NEXT #4): within an event-time window of
    * `ttl` from a key's first sight, BUFFER the best arrival
    * (score DESC, tieBreak ASC) and emit it only when the WATERMARK passes
    * firstSeen + ttl (the fired timer). Append-mode-correct by
    * construction: nothing emits until the group can no longer change (the
    * session_window discipline) — the emit-first [[EventTimeDedupProcessor]]
    * cannot retract when a better duplicate arrives later. A post-expiry
    * arrival opens a fresh window (the at-least-once downstream contract).
    *
    * State: ONE best-so-far row per distinct key inside the TTL horizon
    * (never per event), on RocksDB; expiry is an event-time timer, so a
    * paused stream ages nothing. In-batch and cross-batch winner selection
    * is deterministic whenever (score, tieBreak) pairs are distinct —
    * exactly d16's contract with tieBreak in the id role. */
  final class KeepBestProcessor[T](ttlMs: Long, eventTimeMs: T => Long,
      score: T => Double, tieBreak: T => String, rowEnc: Encoder[T])
      extends StatefulProcessor[String, T, T] {
    // (expiresAt, bestScore, bestTie, bestRow)
    @transient private var st: ValueState[(Long, Double, String, T)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, String, T)]("best",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.STRING, rowEnc), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[T],
        tv: TimerValues): Iterator[T] = {
      var cur: (Long, Double, String, T) =
        if (st.exists()) st.get() else null
      val firstSight = cur == null
      var minTs = Long.MaxValue
      while (rows.hasNext) {
        val r = rows.next()
        val s = score(r)
        val tb = tieBreak(r)
        val ts0 = eventTimeMs(r)
        if (ts0 < minTs) minTs = ts0
        if (cur == null || s > cur._2 || (s == cur._2 && tb < cur._3))
          cur = (if (cur == null) 0L else cur._1, s, tb, r)
      }
      if (cur != null) {
        // the window anchors on the batch's MIN event time at first sight
        // (iterator order must not matter), and never moves afterwards
        val expiry = if (firstSight) minTs + ttlMs else cur._1
        if (firstSight) getHandle.registerTimer(expiry)
        st.update((expiry, cur._2, cur._3, cur._4))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[T] = {
      // only a timer covering the CURRENT window emits+clears (a re-armed
      // key's stale timer must not flush the new window early)
      if (st.exists() && st.get()._1 <= info.getExpiryTimeInMs) {
        val best = st.get()._4
        st.clear()
        Iterator.single(best)
      } else Iterator.empty
    }
  }

  /** Keep the best-scoring event per key within `ttl` of EVENT time; the
    * winner emits when the watermark passes firstSeen + ttl. `events` must
    * carry a watermark (`withWatermark` upstream). */
  def keepBestWithTtlEventTime[T: Encoder](events: Dataset[T],
      key: T => String, eventTime: T => java.sql.Timestamp,
      score: T => Double, tieBreak: T => String,
      ttl: java.time.Duration): Dataset[T] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    events
      .groupByKey(key)
      .transformWithState(
        new KeepBestProcessor[T](ttl.toMillis, t => eventTime(t).getTime,
          score, tieBreak, implicitly[Encoder[T]]),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
