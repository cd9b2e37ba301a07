package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven sessionization on the `transformWithState` API (SURVEY
  * §2B q_stream_transform_timers) — the new-API twin of
  * [[SessionTimeout]]: the SAME gap-split fold
  * ([[SessionTimeout.fold]], shared verbatim), but state lives in a
  * named [[ValueState]] and the "state that closes itself" mechanic is
  * an explicit event-time TIMER instead of GroupStateTimeout. Together
  * with `RunningTotals` (ValueState, TimeMode.None) this completes the
  * transformWithState surface a migrating pipeline needs: named state
  * + registerTimer/handleExpiredTimer.
  *
  * Timer discipline: every batch re-arms a timer at `last + gap`.
  * Earlier timers for the key are NOT deleted — when one fires,
  * [[handleExpiredTimer]] checks it against the CURRENT session's
  * expiry and ignores stale ones (a timer armed before newer events
  * arrived). This is the safe pattern: with a 0-delay watermark any
  * post-seal event has event time past the old expiry, so a fresh
  * session can never be wrongly sealed by a leftover timer.
  */
class SessionTimers
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
      (Long, Long, Long)] {

  // the one open session per user: (start_us, last_us, n)
  @transient private var open: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[(Long, Long, Long)]("open",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      tv: TimerValues): Iterator[(Long, Long, Long)] = {
    val incoming = rows.map(r => SessionTimeout.us(r._2)).toArray.sorted
    if (incoming.isEmpty) return Iterator.empty
    val prev = if (open.exists()) Some(open.get()) else None
    val (closed, cur) = SessionTimeout.fold(user, prev, incoming)
    open.update(cur)
    getHandle.registerTimer(SessionTimeout.expiryMs(cur._2))
    closed.iterator
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    if (!open.exists()) return Iterator.empty
    val (st, la, n) = open.get()
    val currentExpiry = SessionTimeout.expiryMs(la)
    if (info.getExpiryTimeInMs() >= currentExpiry) {
      // the firing timer covers the live session: sealed
      open.clear()
      Iterator((user, st, n))
    } else Iterator.empty // stale timer from before newer events
  }
}
