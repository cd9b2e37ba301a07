package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** KeyValueGroupedDataset stateful-processing surface: sessionization via
  * flatMapGroupsWithState must agree with the declarative gaps-and-islands
  * plan (q_stream_session). Batch invocation exercises the same user code
  * a streaming query runs per epoch. */
case class Ev(user_id: Long, ts: Timestamp)
case class Sess(user_id: Long, session_start: Timestamp, n: Long)

class StatefulSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessionization equals gaps-and-islands") {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    val sessions = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], _: GroupState[Long]) => {
          val ts = it.map(_.ts).toArray.sortBy(_.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
          var start = ts.head
          var prev = ts.head
          var n = 0L
          ts.foreach { t =>
            if ((t.getTime - prev.getTime) * 1000 > gapUs) {
              out += Sess(uid, start, n); start = t; n = 0
            }
            n += 1; prev = t
          }
          out += Sess(uid, start, n)
          out.iterator
        })
      .collect().map(s => (s.user_id, s.session_start, s.n)).toSet

    val declarative = SparkEntry.queries("q_stream_session")(
        spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    assert(sessions == declarative,
      s"diff: ${(sessions -- declarative).take(3)} / ${(declarative -- sessions).take(3)}")
  }

}
