package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Timeout-driven sessionization state function (SURVEY §2B
  * q_stream_stateful_timeout) — shared by the contract query and the
  * StreamingSpec epoch proof so the tested function IS the shipped one.
  *
  * State per user = the one open session `(start_us, last_us, n)`.
  * Arriving events are gap-split in exact unix micros: a gap > 30 min
  * closes the current session (emitted immediately); the survivor goes
  * back into the state store with an event-time timeout at
  * `last_event + 30 min`. When the watermark passes that point Spark
  * invokes the function with `hasTimedOut` and NO input rows — the
  * session seals itself, which is what distinguishes this operator from
  * an accumulate-only flatMapGroupsWithState. State is O(users),
  * partitioned by the group key; at 100 TB the same plan runs with the
  * state store on RocksDB.
  */
object SessionTimeout {

  val gapUs: Long = 30L * 60 * 1000 * 1000

  private[streaming] def us(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** THE session expiry instant in ms for a session whose last event
    * is at `lastUs` — the one formula behind GroupState's
    * setTimeoutTimestamp, SessionTimers' registerTimer, AND its
    * stale-timer comparison. Those three sites must stay bit-identical
    * (the stale check compares a fired timer against a recomputation;
    * any drift makes every timer look stale and sessions never seal,
    * silently), so none of them spells the arithmetic inline. */
  private[streaming] def expiryMs(lastUs: Long): Long =
    lastUs / 1000L + gapUs / 1000L

  /** The pure gap-split fold, shared by BOTH state APIs (GroupState
    * here, ValueState+timers in [[SessionTimers]]): feed sorted
    * incoming event micros into the open session; a gap > 30 min
    * closes it. Returns (closed sessions as (user, start_us, n), the
    * surviving open session). `incoming` must be non-empty.
    *
    * The open session's bounds are monotone: an event that falls
    * within the gap extends `last` to max(last, t) and `start` to
    * min(start, t) — never backward/forward past what was already
    * observed. A cross-batch out-of-order event (admissible up to the
    * watermark delay) that merely lands INSIDE the open span must not
    * shrink `last`: setting last = t would make the NEXT event's gap
    * measure from the stale earlier point and spuriously split the
    * session (state last 10:00, a batch delivering 9:35 then 10:20
    * would split, though the sorted truth is one session) — and a
    * shrunken last also shrinks the timeout expiry, letting an
    * already-armed stale timer in [[SessionTimers]] wrongly seal the
    * live session.
    *
    * Out-of-order events EARLIER than `start - gap` are NOT part of
    * the open session (a naive `t - last <= gap` guard is vacuously
    * true for any early t and would corrupt `start`): the fold
    * gap-splits the whole batch into runs, merges the open interval
    * in by position (an interval bridging two runs fuses all three),
    * and seals every session earlier than the latest one. With only
    * one open session in state, an early session seals as soon as it
    * is observed — the best achievable without retaining raw events. */
  private[streaming] def fold(user: Long, open: Option[(Long, Long, Long)],
      incoming: Array[Long])
      : (Seq[(Long, Long, Long)], (Long, Long, Long)) = {
    // gap-split the sorted batch into runs (start, last, n)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    incoming.foreach { t =>
      if (runs.nonEmpty && t - runs.last._2 <= gapUs) {
        val (s, l, n) = runs.last
        runs(runs.size - 1) = (s, math.max(l, t), n + 1)
      } else runs += ((t, t, 1L))
    }
    // splice the open interval in by start order, then gap-merge once;
    // the interval-proximity test (next.start - prev.last <= gap) also
    // covers overlap, so a run inside the open span merges cleanly
    open.foreach { o =>
      val i = runs.indexWhere(_._1 >= o._1)
      if (i < 0) runs += o else runs.insert(i, o)
    }
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    runs.foreach { r =>
      if (merged.nonEmpty && r._1 - merged.last._2 <= gapUs) {
        val (s, l, n) = merged.last
        merged(merged.size - 1) = (s, math.max(l, r._2), n + r._3)
      } else merged += r
    }
    // the latest session stays open; everything earlier seals now
    (merged.init.toSeq.map(s => (user, s._1, s._3)), merged.last)
  }

  /** flatMapGroupsWithState body: emits `(user_id, start_us, n)` for
    * every CLOSED session (gap-closed now, or timeout-sealed). */
  def update(user: Long, it: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long)] =
    if (state.hasTimedOut) {
      // watermark passed last_event + gap: sealed — emit and clear
      val (start, _, n) = state.get
      state.remove()
      Iterator((user, start, n))
    } else {
      val incoming = it.map(r => us(r._2)).toArray.sorted
      val (closed, cur) = fold(user, state.getOption, incoming)
      val (st, la, n) = cur
      state.update((st, la, n))
      state.setTimeoutTimestamp(expiryMs(la))
      closed.iterator
    }
}
