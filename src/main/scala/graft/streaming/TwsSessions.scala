package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import StatefulSessions.{ClosedSession, SessionState, UserEvent}

/** Gap sessionizer on Spark 4's `transformWithState` — the successor API to
  * `flatMapGroupsWithState` ([[StatefulSessions]] is the FMGWS twin; both
  * emit identical sessions, asserted by StreamingPipelineSpec). Differences
  * the new API surfaces explicitly:
  *
  *   - typed state handles (`getValueState`) with optional TTL instead of a
  *     single implicit `GroupState`;
  *   - first-class event-time TIMERS (`registerTimer`/`handleExpiredTimer`)
  *     instead of one timeout slot — the processor deletes and re-arms its
  *     timer as the session extends, and ignores stale firings;
  *   - runs only on the RocksDB state store provider (the 100 TB state
  *     backend; session config in [[graft.GraftSession]]).
  *
  * Scale contract is unchanged: one small state record + one timer per
  * ACTIVE user, hash-partitioned by key, bounded by the watermark horizon.
  */
object TwsSessions {

  final class SessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, UserEvent, ClosedSession] {
    private val gapUs = gapSeconds * 1000000L
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    private def close(user: Long, s: SessionState): ClosedSession =
      ClosedSession(user, new Timestamp(s.start / 1000L), s.nEvents, s.sumValue)

    private def timerMsFor(s: SessionState): Long =
      s.lastUs / 1000L + gapSeconds * 1000L

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        tv: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
      val closed = Seq.newBuilder[ClosedSession]
      var cur = if (state.exists()) Some(state.get()) else None
      val prevTimer = cur.map(timerMsFor)
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs > gapUs =>
            closed += close(user, s)
            cur = Some(SessionState(us, us, 1L, e.value))
          case Some(s) =>
            cur = Some(s.copy(lastUs = math.max(s.lastUs, us),
              nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // re-arm: drop the previous timer (stale firings are also guarded in
        // handleExpiredTimer, but deleting keeps the timer store minimal)
        val t = timerMsFor(s)
        prevTimer.filter(_ != t).foreach(getHandle.deleteTimer)
        if (!prevTimer.contains(t)) getHandle.registerTimer(t)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // a timer may fire after the session it guarded was extended — only a
      // timer matching the CURRENT state's horizon closes the session
      if (state.exists() && timerMsFor(state.get()) <= info.getExpiryTimeInMs) {
        val out = close(user, state.get())
        state.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  /** [[StatefulSessions.sessionize]] on the transformWithState API: same
    * input contract (watermarked [[UserEvent]] stream), same output. */
  def sessionize(events: Dataset[UserEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
