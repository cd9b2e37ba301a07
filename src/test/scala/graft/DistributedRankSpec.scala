package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-pass distributed ranker must equal the single-window
  * NTILE/PERCENT_RANK formulation exactly, including the uneven-bucket
  * and fewer-rows-than-buckets edges, while range-partitioning the data
  * instead of funneling it through one task.
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaWindow(n: Int) = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, TestSpark.sf001)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(n).over(w).as("nt"), percent_rank().over(w).as("pct"))
      .orderBy(col("c_custkey"))
  }

  private def viaDistributed(n: Int, parts: Int) =
    graft.operators.DistributedRank.withRankCols(
        Tables.customer(spark, TestSpark.sf001)
          .select(col("c_custkey"), col("c_acctbal")),
        Seq(col("c_acctbal"), col("c_custkey")), numBuckets = n,
        parts = parts)
      .select(col("c_custkey"), col("c_acctbal"), col("nt"), col("pct"))
      .orderBy(col("c_custkey"))

  test("distributed rank equals the global window (sf0.01, ntile 4)") {
    val expected = viaWindow(4).collect().map(_.toString).toSeq
    val got = viaDistributed(4, parts = 8).collect().map(_.toString).toSeq
    assert(got == expected)
  }

  test("uneven buckets: ntile 7 over 1500 rows (1500 = 7*214 + 2)") {
    val expected = viaWindow(7).collect().map(_.toString).toSeq
    val got = viaDistributed(7, parts = 8).collect().map(_.toString).toSeq
    assert(got == expected)
  }

  test("fewer rows than buckets and the single-row pct edge") {
    import spark.implicits._
    val tiny = Seq((3, 10.0), (1, 30.0), (2, 20.0))
      .toDF("c_custkey", "c_acctbal")
    val got = graft.operators.DistributedRank.withRankCols(tiny,
        Seq(col("c_acctbal"), col("c_custkey")), numBuckets = 4, parts = 4)
      .select(col("c_custkey"), col("nt"), col("pct"), col("_gr_rank"))
      .orderBy(col("_gr_rank")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // 3 rows into 4 buckets: each of the first 3 buckets gets one row
    assert(got.toSeq == Seq((3, 1, 0.0, 1L), (2, 2, 0.5, 2L),
      (1, 3, 1.0, 3L)))
    val one = graft.operators.DistributedRank.withRankCols(
        Seq((1, 1.0)).toDF("c_custkey", "c_acctbal"),
        Seq(col("c_acctbal")), numBuckets = 4, parts = 4)
      .select(col("nt"), col("pct")).collect().head
    assert(one.getInt(0) == 1 && one.getDouble(1) == 0.0)
  }

  test("surrogate ids at scale equal the window form, duplicates share ids") {
    val df = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("event_type"), col("user_id"))
    val win = graft.etl.MicMacEtl
      .withSurrogateIds(df, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("id").cast("long"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    val dist = graft.etl.MicMacEtl
      .withSurrogateIdsAtScale(df, Seq("event_type"), parts = 8)
      .select(col("event_id"), col("event_type"), col("id"))
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(dist == win)
  }

  test("at-scale surrogate ids keep NULL keys and replace a prior id") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")),
        (4L, None), (5L, Some("a")))
      .toDF("row_id", "k").withColumn("id", lit(-1))
    val win = graft.etl.MicMacEtl.withSurrogateIds(df, Seq("k"))
      .select(col("row_id"), col("id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = graft.etl.MicMacEtl
      .withSurrogateIdsAtScale(df, Seq("k"), parts = 4)
      .select(col("row_id"), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.size == 5, "NULL-keyed rows must not be dropped")
    assert(dist == win, s"window=$win at-scale=$dist")
  }

  test("at-scale surrogate ids carry no single-task sort (high-card key)") {
    val plan = graft.etl.MicMacEtl
      .withSurrogateIdsAtScale(
        Tables.events(spark, TestSpark.sf001).select(col("event_id")),
        Seq("event_id"), parts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    assert(plan.contains("windowspecdefinition(_gr_pid"),
      s"expected pid-partitioned data window in:\n$plan")
  }

  test("tie-safe variant matches rank()/percent_rank() on duplicate keys") {
    import spark.implicits._
    // only 3 distinct acctbal values over 12 rows: heavy ties
    val dup = (1 to 12).map(i => (i, (i % 3) * 10.0))
      .toDF("c_custkey", "c_acctbal")
    val w = Window.orderBy(col("c_acctbal"))
    val expected = dup
      .select(col("c_custkey"), rank().over(w).cast("long").as("r"),
        percent_rank().over(w).as("pct"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val got = graft.operators.DistributedRank
      .withRankColsTieSafe(dup, Seq(col("c_acctbal")), numBuckets = 4,
        parts = 4)
      .select(col("c_custkey"), col("_gr_rank"), col("pct"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == expected)
  }

  test("one pinned range partitioning feeds both passes (cache pin)") {
    graft.operators.DistributedRank.releasePins()
    val df = viaDistributed(4, parts = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Correctness of the offset join requires both consumers to observe
    // the SAME range partition boundaries. ReusedExchange used to carry
    // that, but it is plan-shape dependent (r10: a downstream
    // coalesce(1) file write at sf1 broke reuse and ranks silently
    // collided — RangePartitioner's sample seed includes the RDD id, so
    // independent materializations draw different bounds). The operator
    // now pins the ranged frame with persist; the executed plan must
    // show BOTH passes reading the in-memory relation — a consumer on
    // the cached frame cannot resample bounds. (This does NOT also
    // claim a unique range exchange: the test query's final orderBy
    // adds its own, and AQE's toString repeats subtrees, so counting
    // "rangepartitioning" occurrences proves nothing either way. The
    // pinned RELATION carrying the range exchange is asserted below
    // instead.)
    val cacheScans = "InMemoryTableScan".r.findAllIn(plan).length
    assert(cacheScans >= 2,
      s"expected both passes on the cached ranged frame, " +
        s"found $cacheScans cache scans:\n$plan")
    // the pin wraps the RANGED frame: the in-memory relation's cache
    // builder itself must carry the range exchange, proving the bounds
    // the offsets described are the bounds the data rows have
    assert(plan.contains("InMemoryRelation")
        && plan.contains("rangepartitioning"),
      s"expected the cached relation to carry the range exchange:\n$plan")
    // lifecycle: the pin is a registered resource and releasePins is
    // the explicit boundary — this call must find the frames this
    // query pinned (one per viaDistributed invocation) and drop them
    val released = graft.operators.DistributedRank.releasePins()
    assert(released >= 1,
      s"expected at least one pinned frame to release, got $released")
    assert(graft.operators.DistributedRank.releasePins() == 0,
      "second release must find nothing — the registry is cleared")
  }

  test("pin registry is thread-scoped: a foreign release frees nothing") {
    // a multi-query driver runs rank queries on concurrent threads; one
    // query's boundary release must never unpersist another's
    // still-in-flight frame (replanning a released frame can draw
    // different range bounds — the silent-rank bug the pin prevents)
    graft.operators.DistributedRank.releasePins()
    val df = viaDistributed(4, parts = 8)
    df.collect() // this thread now holds >=1 pin
    var foreign = -1
    val t = new Thread(() => {
      foreign = graft.operators.DistributedRank.releasePins()
    })
    t.start(); t.join()
    assert(foreign == 0,
      s"another thread's release must not see this thread's pins, " +
        s"released $foreign")
    assert(graft.operators.DistributedRank.releasePins() >= 1,
      "the owning thread's pins must survive the foreign release")
  }

  test("releaseAllPins reaches pins made by a retired thread") {
    // the registry is a map keyed by thread id, NOT a ThreadLocal: a
    // pool thread that pinned and then died must not strand its pins
    // as a permanent CacheManager leak — the janitor API frees them
    graft.operators.DistributedRank.releaseAllPins()
    var pinned = 0
    val worker = new Thread(() => {
      viaDistributed(4, parts = 8).collect()
      pinned = 1
    })
    worker.start(); worker.join()
    assert(pinned == 1, "worker must have pinned before dying")
    assert(graft.operators.DistributedRank.releasePins() == 0,
      "this thread pinned nothing — per-thread release stays scoped")
    assert(graft.operators.DistributedRank.releaseAllPins() >= 1,
      "the dead worker's pins must be releasable from any thread")
    assert(graft.operators.DistributedRank.releaseAllPins() == 0,
      "second global release must find nothing")
  }

  test("plan range-partitions the data — no single-task sort of rows") {
    val plan = viaDistributed(4, parts = 8).queryExecution
      .executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    // the only unpartitioned window must be over the per-partition
    // counts (8 rows), never over the data: the data-side window
    // carries the _gr_pid partition spec
    assert(plan.contains("windowspecdefinition(_gr_pid"),
      s"expected pid-partitioned data window in:\n$plan")
  }
}
