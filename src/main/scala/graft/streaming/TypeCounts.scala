package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `transformWithState` processor over MAP state (SURVEY §2B
  * q_stream_transform_map) — the composite-state sibling of
  * [[RunningTotals]]'s ValueState: per user, a [[MapState]] keyed by
  * event_type holding (count, exact cents). The point of MapState over
  * a ValueState[Map[...]] blob is operational, and it is exactly what
  * the 100 TB state store needs: the engine sees each (user, type)
  * entry individually, so a micro-batch touching one event type reads
  * and writes ONE RocksDB entry — not a serialized whole-map round
  * trip per user per batch — and TTL/eviction can act per entry.
  *
  * Emissions are cumulative per (user, type) and only for types the
  * batch touched; the drained sink reduces to the max-count emission
  * per key, deterministic under any micro-batch split (the
  * q_stream_transform_state contract, one key level deeper).
  *
  * Shared verbatim between the contract query and the StreamingSpec
  * epoch proof, so the tested function IS the shipped one. */
class TypeCounts
    extends StatefulProcessor[Long, (Long, String, Long),
      (Long, String, Long, Long)] {

  @transient private var counts: MapState[String, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, (Long, Long)]("counts",
      Encoders.STRING, Encoders.product[(Long, Long)], TTLConfig.NONE)

  /** Input rows are (user_id, event_type, exact cents). */
  override def handleInputRows(user: Long,
      rows: Iterator[(Long, String, Long)],
      tv: TimerValues): Iterator[(Long, String, Long, Long)] = {
    // fold the batch locally, reading each touched entry from the
    // store at most once; write each back once
    val touched = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long)]
    rows.foreach { case (_, et, c) =>
      // one point-read per first-touched entry: getValue returns null
      // for an absent key, so a containsKey probe first would double
      // the RocksDB round trips this class exists to minimize
      val cur = touched.getOrElse(et, {
        val v = counts.getValue(et)
        if (v != null) v else (0L, 0L)
      })
      touched(et) = (cur._1 + 1, cur._2 + c)
    }
    touched.foreach { case (et, v) => counts.updateValue(et, v) }
    touched.iterator.map { case (et, (n, c)) => (user, et, n, c) }.toSeq
      .iterator
  }
}
