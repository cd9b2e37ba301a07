package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True Structured Streaming semantics (SURVEY §2B q_stream_watermark_late
  * + batch≡stream equivalences, declared ScalaTest-scope). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late rows in append mode (epoch-by-epoch)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val q = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 hour"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win"), $"k", $"n")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_spec").start()
    try {
      // epoch 1: two on-time rows in the 10:00 window
      ms.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:20:00"), "a"))
      q.processAllAvailable()
      // epoch 2: event far ahead -> watermark passes 11:00, closes window
      ms.addData((ts("2024-01-01 13:00:00"), "a"))
      q.processAllAvailable()
      // epoch 3: late row for the closed 10:00 window -> must be dropped
      ms.addData((ts("2024-01-01 10:45:00"), "a"))
      q.processAllAvailable()
      // one more future row so any (wrongly) accepted late data would emit
      ms.addData((ts("2024-01-01 16:00:00"), "a"))
      q.processAllAvailable()
      val emitted = spark.table("wm_spec")
        .select($"win", $"n").as[(Timestamp, Long)].collect().toMap
      assert(emitted(ts("2024-01-01 10:00:00")) == 2L,
        s"closed 10:00 window must have on-time count 2, got $emitted")
    } finally q.stop()
  }

  test("gaps-and-islands sessionization equals session_window (sf0.001)") {
    val batch = SparkEntry.queries("q_stream_session")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val sw = Tables.events(spark, TestSpark.sf0001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(batch == sw,
      s"diff: ${(batch -- sw).take(3)} / ${(sw -- batch).take(3)}")
  }

  test("streaming dropDuplicates keeps one row per key like batch dedup") {
    val batchKeys = SparkEntry.queries("q_stream_dedup")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val dd = Tables.events(spark, TestSpark.sf0001)
      .dropDuplicates("user_id", "event_type")
      .collect().map(r => (r.getLong(2), r.getString(3))).toSet
    assert(batchKeys == dd)
  }

  test("watermark query restores the session confs it scopes to the stream") {
    val s = spark
    val before = s.conf.get("spark.sql.shuffle.partitions")
    SparkEntry.queries("q_stream_watermark_late")(s, TestSpark.sf0001).count()
    assert(s.conf.get("spark.sql.shuffle.partitions") == before,
      "stream-scoped shuffle.partitions leaked into the shared session")
  }

  test("q_stream_watermark_late (complete replay) equals batch tumbling") {
    val streamed = SparkEntry.queries("q_stream_watermark_late")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val batch = SparkEntry.queries("q_stream_tumbling")(
      spark, TestSpark.sf0001)
      .select(col("win_start"), col("event_type"), col("n"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }
}
