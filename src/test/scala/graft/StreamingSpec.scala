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

  test("stream-stream join drops late rows once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("p_ts", "p_user").withWatermark("p_ts", "10 minutes")
    val q = c.join(b, $"c_user" === $"p_user" && $"p_ts" > $"c_ts"
        && $"p_ts" <= $"c_ts" + expr("INTERVAL 5 MINUTES"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_spec").start()
    try {
      // epoch 1: click + in-band purchase -> one joined pair
      clicks.addData((ts("2024-01-01 10:00:00"), 1L))
      buys.addData((ts("2024-01-01 10:02:00"), 1L))
      q.processAllAvailable()
      // epoch 2: both streams far ahead -> watermark passes 11:50,
      // the 10:00 click's join state is evictable
      clicks.addData((ts("2024-01-01 12:00:00"), 9L))
      buys.addData((ts("2024-01-01 12:00:01"), 8L))
      q.processAllAvailable()
      // epoch 3: a LATE purchase that would have matched the 10:00
      // click -> dropped, no second pair
      buys.addData((ts("2024-01-01 10:03:00"), 1L))
      q.processAllAvailable()
      val pairs = spark.table("ssj_spec").count()
      assert(pairs == 1,
        s"late purchase must not join against evicted state, got $pairs")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits the null row only after the " +
      "watermark seals it, and evicts the state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user")
      .withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("p_ts", "p_user")
      .withWatermark("p_ts", "10 minutes")
    val q = c.join(b, $"c_user" === $"p_user" && $"p_ts" > $"c_ts"
        && $"p_ts" <= $"c_ts" + expr("INTERVAL 5 MINUTES"), "leftOuter")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_spec").start()
    def user2Rows() = spark.table("ssj_outer_spec")
      .filter($"c_user" === 2L)
      .select($"p_user").collect().map(r => Option(r.get(0))).toSeq
    try {
      // epoch 1: user 1 matched pair, user 2 click with no purchase
      clicks.addData((ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:00:00"), 2L))
      buys.addData((ts("2024-01-01 10:02:00"), 1L))
      q.processAllAvailable()
      // the match emits immediately; the unmatched click must NOT —
      // a purchase inside its band could still arrive
      assert(spark.table("ssj_outer_spec").filter($"c_user" === 1L)
        .count() == 1)
      assert(user2Rows().isEmpty,
        "outer row emitted before the watermark sealed the band")
      // epoch 2: both streams far ahead -> watermark passes the band
      clicks.addData((ts("2024-01-01 12:00:00"), 8L))
      buys.addData((ts("2024-01-01 12:00:00"), 9L))
      q.processAllAvailable()
      assert(user2Rows() == Seq(None),
        "sealed unmatched click must emit exactly one null-extended row")
      // epoch 3: a LATE in-band purchase for user 2 -> state already
      // evicted, no retroactive join, no second row
      buys.addData((ts("2024-01-01 10:03:00"), 2L))
      q.processAllAvailable()
      assert(user2Rows() == Seq(None),
        "evicted click state must not retro-join a late purchase")
    } finally q.stop()
  }

  test("full-outer stream-stream join null-extends BOTH sides on " +
      "watermark passage, each exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user")
      .withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("p_ts", "p_user")
      .withWatermark("p_ts", "10 minutes")
    val q = c.join(b, $"c_user" === $"p_user" && $"p_ts" > $"c_ts"
        && $"p_ts" <= $"c_ts" + expr("INTERVAL 5 MINUTES"), "fullOuter")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_full_spec").start()
    def rowsOf(filter: org.apache.spark.sql.Column) =
      spark.table("ssj_full_spec").filter(filter)
        .select($"c_user", $"p_user")
        .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    try {
      // epoch 1: user 1 matched pair; user 2 click with no purchase;
      // user 3 purchase with no click
      clicks.addData((ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:00:00"), 2L))
      buys.addData((ts("2024-01-01 10:02:00"), 1L),
        (ts("2024-01-01 10:02:00"), 3L))
      q.processAllAvailable()
      // the match emits immediately; neither unmatched side may —
      // a partner inside each band could still arrive
      assert(rowsOf($"c_user" === 1L) == Seq((Some(1L), Some(1L))))
      assert(rowsOf($"c_user" === 2L || $"p_user" === 3L).isEmpty,
        "outer rows emitted before the watermark sealed their bands")
      // epoch 2: both streams far ahead -> watermark passes both bands
      clicks.addData((ts("2024-01-01 12:00:00"), 8L))
      buys.addData((ts("2024-01-01 12:00:00"), 9L))
      q.processAllAvailable()
      assert(rowsOf($"c_user" === 2L) == Seq((Some(2L), None)),
        "sealed unmatched CLICK must emit one null-extended row")
      assert(rowsOf($"p_user" === 3L) == Seq((None, Some(3L))),
        "sealed unmatched PURCHASE must emit one null-extended row")
      // epoch 3: late partners for both -> state evicted on both sides,
      // no retroactive joins, no second rows
      buys.addData((ts("2024-01-01 10:03:00"), 2L))
      clicks.addData((ts("2024-01-01 10:00:00"), 3L))
      q.processAllAvailable()
      assert(rowsOf($"c_user" === 2L || $"p_user" === 2L)
        == Seq((Some(2L), None)),
        "evicted click state must not retro-join a late purchase")
      assert(rowsOf($"c_user" === 3L || $"p_user" === 3L)
        == Seq((None, Some(3L))),
        "evicted purchase state must not retro-join a late click")
    } finally q.stop()
  }

  test("EventTimeTimeout seals an idle user's session with no new input " +
      "for that key") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        graft.streaming.SessionTimeout.update)
      .toDF("user_id", "start_us", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("session_to_spec").start()
    def emitted() = spark.table("session_to_spec")
      .as[(Long, Long, Long)].collect().toSet
    try {
      // epoch 1: user 1's burst — an open session, nothing emitted
      ms.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not emit early")
      // epoch 2: only user 2 speaks, far ahead -> watermark passes
      // user 1's timeout (10:35) and the state SEALS ITSELF: the
      // session emits although user 1 contributed no new row
      ms.addData((2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val us1000 = ts("2024-01-01 10:00:00").toInstant.getEpochSecond * 1000000L
      assert(emitted() == Set((1L, us1000, 2L)),
        s"idle user's session must close via timeout, got ${emitted()}")
    } finally q.stop()
  }

  test("a cross-batch early straggler seals alone and leaves the open " +
      "session intact (watermark delay > gap)") {
    // end-to-end witness of the fold's disorder semantics through the
    // real engine: with a 2-hour watermark delay an event a FULL GAP
    // before the open session's start is admissible in a later batch —
    // it must emit as its own closed session, never be absorbed into
    // the open one (which would corrupt start_us in the sealed output)
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "2 hours")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        graft.streaming.SessionTimeout.update)
      .toDF("user_id", "start_us", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("session_ooo_spec").start()
    def emitted() = spark.table("session_ooo_spec")
      .as[(Long, Long, Long)].collect().toSet
    def us(s: String) = ts(s).toInstant.getEpochSecond * 1000000L
    try {
      // epoch 1: the open session 10:00..10:05
      ms.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not emit early")
      // epoch 2: a straggler at 08:30 — above the current watermark
      // (10:05 - 2 h = 08:05, so it is NOT dropped as late) yet a full
      // gap before the open session's 10:00 start: it seals ALONE,
      // immediately
      ms.addData((1L, ts("2024-01-01 08:30:00")))
      q.processAllAvailable()
      assert(emitted() == Set((1L, us("2024-01-01 08:30:00"), 1L)),
        s"straggler must seal alone, got ${emitted()}")
      // epoch 3: push the watermark past the open session's timeout —
      // the sealed output must carry the UNCORRUPTED 10:00 start and
      // n=2 (absorbing the straggler would have made it 08:30 / 3)
      ms.addData((2L, ts("2024-01-01 23:00:00")))
      q.processAllAvailable()
      assert(emitted().contains((1L, us("2024-01-01 10:00:00"), 2L)),
        s"open session must seal with intact bounds, got ${emitted()}")
    } finally q.stop()
  }

  test("SessionTimers seals an idle user's session via an event-time " +
      "timer with no new input for that key") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming."
      + "state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Timestamp)]
    val q = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.SessionTimers,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_us", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_timer_spec").start()
    def emitted() = spark.table("tws_timer_spec")
      .as[(Long, Long, Long)].collect().toSet
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not emit early")
      // only user 2 speaks, far ahead -> the watermark passes user 1's
      // timer (10:35) and handleExpiredTimer seals the idle session
      ms.addData((2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val us1000 = ts("2024-01-01 10:00:00").toInstant.getEpochSecond * 1000000L
      assert(emitted() == Set((1L, us1000, 2L)),
        s"idle user's session must close via the timer, got ${emitted()}")
      // user 1 returns: a FRESH session forms after the seal, and a
      // later in-data gap closes it inline (fold path, not timer path)
      ms.addData((1L, ts("2024-01-01 13:00:00")),
        (1L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val us1300 = ts("2024-01-01 13:00:00").toInstant.getEpochSecond * 1000000L
      assert(emitted().contains((1L, us1300, 1L)),
        s"gap-closed resumed session must emit inline, got ${emitted()}")
    } finally {
      q.stop()
      spark.conf.set(provKey, prevProv)
    }
  }

  test("q_stream_transform_timers equals q_stream_stateful_timeout " +
      "(both state APIs, sf0.001)") {
    val timers = SparkEntry.queries("q_stream_transform_timers")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val fmgws = SparkEntry.queries("q_stream_stateful_timeout")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    assert(timers == fmgws,
      s"the two state APIs must seal identical session sets")
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

  test("flatMapGroupsWithState accumulates per-key state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          it.foreach { r => n += 1; cents += r._2 }
          state.update((n, cents))
          Iterator((user, n, cents))
      }
      .toDF("user_id", "n_events", "cents")
      .writeStream.outputMode("update")
      .format("memory").queryName("fmgws_spec").start()
    try {
      ms.addData((1L, 100L), (1L, 50L), (2L, 10L))
      q.processAllAvailable()
      ms.addData((1L, 25L))              // batch 2: state must carry over
      q.processAllAvailable()
      val byBatchOrder = spark.table("fmgws_spec")
        .as[(Long, Long, Long)].collect().toSeq
      // user 1 emitted twice — (2, 150) after batch 1, (3, 175) after
      // batch 2 (proof the state store carried (2, 150) across batches)
      assert(byBatchOrder.filter(_._1 == 1L).toSet
        == Set((1L, 2L, 150L), (1L, 3L, 175L)), s"got $byBatchOrder")
      assert(byBatchOrder.filter(_._1 == 2L) == Seq((2L, 1L, 10L)))
    } finally q.stop()
  }

  test("q_stream_stateful equals the batch per-user aggregate (sf0.001)") {
    val streamed = SparkEntry.queries("q_stream_stateful")(
      spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(cast(value as decimal(14,2)) * 100 as bigint)"))
          .cast("double") / 100).as("sum_val"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch)
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

  test("RunningTotals carries ValueState across micro-batches (epochs)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming."
      + "state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Long, Long)] // (user, us, cents)
    val q = ms.toDS().groupByKey(_._1)
      .transformWithState(new graft.streaming.RunningTotals,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n", "cents", "min_us", "max_us")
      .writeStream.outputMode("update")
      .format("memory").queryName("tws_spec").start()
    try {
      // epoch 1: two rows for user 1, one for user 2
      ms.addData((1L, 100L, 50L), (1L, 300L, 25L), (2L, 200L, 10L))
      q.processAllAvailable()
      // epoch 2: user 1 again — the emission must RESUME from stored
      // state (n=3), not restart; user 2's state is untouched
      ms.addData((1L, 50L, 5L))
      q.processAllAvailable()
      val out = spark.table("tws_spec")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(out == Set(
        (1L, 2L, 75L, 100L, 300L), // epoch-1 cumulative for user 1
        (2L, 1L, 10L, 200L, 200L), // epoch-1 user 2
        (1L, 3L, 80L, 50L, 300L)), // epoch-2 resumes: min drops to 50
        s"got $out")
    } finally {
      q.stop()
      spark.conf.set(provKey, prevProv)
    }
  }

  test("q_stream_transform_state equals the batch aggregate (sf0.001)") {
    val streamed = SparkEntry.queries("q_stream_transform_state")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(cast(value as decimal(14,2)) * 100 as bigint)"))
          .cast("double") / 100).as("sum_val"),
        min(unix_micros(col("ts"))).as("min_us"),
        max(unix_micros(col("ts"))).as("max_us"))
      .orderBy(col("user_id"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("a stopped stream resumes from its checkpoint exactly-once") {
    import spark.implicits._
    // the restart contract production relies on: offsets + state live in
    // the checkpoint, so a second start() neither re-reads batch-1 files
    // (no duplicates) nor misses files that arrived while stopped
    val dir = java.nio.file.Files.createTempDirectory("ckpt_spec").toFile
    val src = new java.io.File(dir, "in"); src.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append")
        .parquet(s"$src/$name")
    def start() = spark.readStream
      .schema("k LONG, v LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"${src.getAbsolutePath}/*")
      .groupBy($"k").agg(sum($"v").as("s"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("ckpt_spec_sink").start()
    try {
      write("b1", Seq((1L, 10L), (2L, 20L)))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      write("b2", Seq((1L, 5L)))
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = spark.table("ckpt_spec_sink")
          .as[(Long, Long)].collect().sorted.toSeq
        // duplicates would make k=1 -> 25 into 35; a missed b2 -> 10
        assert(got == Seq((1L, 15L), (2L, 20L)), got)
      } finally q2.stop()
    } finally {
      spark.catalog.dropTempView("ckpt_spec_sink")
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("stream-static join enriches each micro-batch from the static dim") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // epoch proof for q_stream_static_join's topology: the dim row is
    // resolved per batch (STATELESS join — a key arriving in a later
    // epoch still finds it), and stream keys missing from the dim drop
    val dim = Seq((1L, "gold"), (2L, "steel")).toDF("k", "seg")
    val ms = MemoryStream[(Long, Long)] // (k, v)
    val q = ms.toDF().toDF("k", "v")
      .join(broadcast(dim), Seq("k"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_spec").start()
    try {
      ms.addData((1L, 10L), (3L, 99L)) // 3 has no dim row -> dropped
      q.processAllAvailable()
      ms.addData((2L, 20L), (1L, 30L)) // later epoch still enriches
      q.processAllAvailable()
      val got = spark.table("ss_join_spec")
        .select($"k", $"v", $"seg").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(got == Seq((1L, 10L, "gold"), (1L, 30L, "gold"),
        (2L, 20L, "steel")), got)
    } finally {
      q.stop()
      spark.catalog.dropTempView("ss_join_spec")
    }
  }
}
