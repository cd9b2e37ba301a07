package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` processor (SURVEY §2B q_stream_transform_state)
  * — the Spark 4 arbitrary-state API, the successor surface to
  * flatMapGroupsWithState: state is DECLARED to the engine as named,
  * individually-evolvable primitives ([[ValueState]] here; ListState /
  * MapState / timers are the same handle), instead of one opaque blob.
  * That declaration is what buys RocksDB-backed state, per-state TTL
  * and state-schema evolution on a live checkpoint — the operational
  * properties a 100 TB streaming pipeline needs from its state store.
  *
  * Semantics: per-user running (n_events, cents, min_us, max_us).
  * Sums accumulate as exact integer cents so batching order cannot
  * change the answer; emissions are cumulative per key, so the drained
  * sink's final state per user is the emission with the highest n —
  * deterministic under any micro-batch split (the same contract
  * q_stream_stateful's oracle relies on).
  *
  * Shared verbatim between the contract query and the StreamingSpec
  * epoch proof, so the tested function IS the shipped one.
  */
class RunningTotals
    extends StatefulProcessor[Long, (Long, Long, Long),
      (Long, Long, Long, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long, Long, Long)](
      "totals", Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  /** Input rows are (user_id, event micros, exact cents). */
  override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
      tv: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    var (n, cents, minUs, maxUs) =
      if (totals.exists()) totals.get()
      else (0L, 0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, us, c) =>
      n += 1; cents += c
      if (us < minUs) minUs = us
      if (us > maxUs) maxUs = us
    }
    totals.update((n, cents, minUs, maxUs))
    Iterator((user, n, cents, minUs, maxUs))
  }
}
