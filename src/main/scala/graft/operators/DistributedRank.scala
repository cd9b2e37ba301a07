package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-pass global ranking (VERDICT r1 #9 / r2 #6: the
  * window family's 100x scale answer).
  *
  * `Window.orderBy` with no partition key funnels every row through ONE
  * task — semantically exact and harmless on a dimension table (which
  * is why q_win_ntile_pctrank keeps it), but a scale-killer on a fact
  * table. This operator computes the same NTILE / PERCENT_RANK / global
  * row number with no single-task global sort:
  *
  *   1. range-repartition on the sort key, so partitions are globally
  *      ordered BETWEEN themselves (Spark samples split points);
  *   2. count rows per range partition — one row per PARTITION, not per
  *      data row — and prefix-sum the counts into partition start
  *      offsets (a window over at most `parts` rows);
  *   3. broadcast-join the offsets back onto the ranged data by
  *      partition id; partition offset + local row_number is then the
  *      exact global row number, computed independently per partition.
  *
  * Both passes MUST observe the SAME range partitioning, and that is a
  * CORRECTNESS requirement, not an optimization: RangePartitioner
  * samples its split points with a seed derived from the underlying
  * RDD id, so two independent materializations of the "same"
  * repartitionByRange can draw slightly different bounds — the offsets
  * would then describe a partitioning the data rows don't have, and
  * global ranks silently duplicate or skip. ReusedExchange usually
  * provides that single materialization, but it is plan-shape
  * dependent (a downstream coalesce + file write at sf1 was measured
  * breaking it: 761/772/776 batches across three runs of the same
  * 50 000-row query — r10, found by the sf1 oracle gate). The ranged
  * frame is therefore pinned with persist(MEMORY_AND_DISK): one
  * shuffle feeds both passes by construction. Block eviction is safe —
  * a recomputed partition re-reads the SAME shuffle with the
  * partitioner object's already-computed bounds.
  *
  * The pin is a RESOURCE, and it is the FULL ranged input, not
  * metadata: Dataset.persist registers a strong CacheManager entry
  * that no LRU or GC ever drops (only blocks are evicted; the entry —
  * and its disk blocks — live until unpersist). A long-running driver
  * that calls this operator per query and never releases would
  * accumulate one full-input cache entry per call. Callers MUST
  * therefore call [[releasePins]] once the returned frame's results
  * are materialized and no further action will run on it (the
  * query-loop harnesses Bench/Verify do so between queries); releasing
  * EARLY is the one forbidden move — a later action on a released
  * frame replans the exchange and can draw different bounds, which is
  * exactly the silent-rank bug the pin exists to prevent.
  *
  * The sort key must be a TOTAL order (append a unique tiebreaker, as
  * the declared contract's `(c_acctbal, c_custkey)` does). Under a
  * total order rank == row_number, which makes NTILE and PERCENT_RANK
  * exact; with ties the caller must layer a per-key min on top.
  */
object DistributedRank {

  /** Every ranged frame pinned since its last release, grouped by the
    * PINNING thread's id — the explicit lifecycle for the correctness
    * persist (see class doc). [[releasePins]] is thread-scoped: a
    * multi-query driver running rank queries on concurrent threads
    * must not have one query's boundary release unpersist another's
    * still-in-flight frame (replanning a released frame can draw
    * different range bounds — the silent-rank bug the pin prevents).
    * Build the frame and release it on the SAME thread. The registry
    * itself is process-global (a map keyed by a per-thread token
    * object, NOT a ThreadLocal holding the pins), so pins made by a
    * retired pool thread are never stranded — [[releaseAllPins]] can
    * reach every pin from any thread. The key is a token rather than
    * the thread id because the JDK documents ids as reusable after
    * thread death: a recycled id would hand a dead thread's pins to an
    * unrelated new thread, whose boundary release could then unpersist
    * a frame some consumer still holds. And a registry, not
    * auto-expiry: only the caller knows when release is safe. */
  private val pins = scala.collection.mutable.Map
    .empty[AnyRef, scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** Identity token per thread — never recycled, unlike thread ids. */
  private val token = ThreadLocal.withInitial[AnyRef](() => new Object)

  private def pin(df: DataFrame): DataFrame = pins.synchronized {
    pins.getOrElseUpdate(token.get(),
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]) +=
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }

  private def drain(
      buf: Option[scala.collection.mutable.ArrayBuffer[DataFrame]]): Int =
    buf.fold(0) { b =>
      b.foreach(_.unpersist(blocking = false)); b.size
    }

  /** Unpersists every frame THIS THREAD pinned since its last call and
    * returns how many were released. Call at a query boundary — after
    * the results of every frame this thread obtained from the operator
    * have been materialized and no further action will run on them.
    * Safe to call when nothing is pinned. */
  def releasePins(): Int =
    drain(pins.synchronized(pins.remove(token.get())))

  /** Unpersists every pin from EVERY thread — the janitor escape hatch
    * for drivers whose pinning threads are pooled or already retired.
    * Only safe when no rank query is in flight anywhere in the process
    * (shutdown, or a known-idle boundary): releasing a frame another
    * thread is still acting on reintroduces the different-bounds rank
    * bug. Returns how many frames were released. */
  def releaseAllPins(): Int = {
    val all = pins.synchronized {
      val snapshot = pins.values.toList
      pins.clear()
      snapshot
    }
    all.map(b => drain(Some(b))).sum
  }

  /** Adds `_gr_rank` (global 1-based row number, bigint), `nt`
    * (NTILE(`numBuckets`), int) and `pct` (PERCENT_RANK, double) to
    * `df`, ordered by `sortCols`. Intermediate `_gr_*` helper columns
    * are dropped; `_gr_rank` is kept for callers that want the raw
    * rank.
    */
  def withRankCols(df: DataFrame, sortCols: Seq[Column], numBuckets: Int,
      parts: Int = 32): DataFrame =
    ranked(df, sortCols, numBuckets, parts).drop("_gr_total")

  /** Exact under DUPLICATE sort keys: `_gr_rank` and `pct` follow
    * `rank()` / `percent_rank()` window semantics (equal keys share the
    * min row number) instead of silently diverging. One extra window
    * partitioned BY the sort key — shuffles on the key, still no
    * global single-task sort. `nt` stays row_number-based within a tie
    * group, exactly as window NTILE is.
    */
  def withRankColsTieSafe(df: DataFrame, sortCols: Seq[Column],
      numBuckets: Int, parts: Int = 32): DataFrame = {
    val wKey = Window.partitionBy(sortCols: _*)
    ranked(df, sortCols, numBuckets, parts)
      .withColumn("_gr_rank", min(col("_gr_rank")).over(wKey))
      .withColumn("pct", pctCol)
      .drop("_gr_total")
  }

  /** PERCENT_RANK from `_gr_rank` / `_gr_total`: (rank-1)/(total-1),
    * 0.0 for the single-row edge — shared by the plain and tie-safe
    * paths so the semantics cannot diverge. */
  private def pctCol: Column =
    when(col("_gr_total") > 1,
      (col("_gr_rank") - 1).cast("double") / (col("_gr_total") - 1))
    .otherwise(lit(0.0))

  /** Adds `_gr_psum` — the exact global running sum of `valueCol`
    * (bigint) over the total `sortCols` order — via the same two-pass
    * range-partition scheme as the ranks: per-partition sums prefix
    * into start offsets (metadata-sized window), local running sums
    * add the broadcast offset. No single-task global sort; the interval
    * sweep-line primitive (concurrency counting, inventory balance)
    * at fact-table scale. `sortCols` must be a total order.
    */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      parts: Int = 32): DataFrame = {
    // pin = the one-partitioning guarantee (see class doc: correctness,
    // not caching — unpinned branches can draw different range bounds;
    // released by the caller via releasePins at its query boundary)
    val ranged = pin(df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_gr_pid", spark_partition_id())
      .withColumn("_gr_v", valueCol.cast("bigint")))
    val wOff = Window.orderBy(col("_gr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("_gr_pid"))
      .agg(sum(col("_gr_v")).as("_gr_cnt"))
      .select(col("_gr_pid"),
        coalesce(sum(col("_gr_cnt")).over(wOff), lit(0L)).as("_gr_off"))
    val wLocal = Window.partitionBy(col("_gr_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets), Seq("_gr_pid"))
      .withColumn("_gr_psum", col("_gr_off") + sum(col("_gr_v")).over(wLocal))
      .drop("_gr_pid", "_gr_v", "_gr_off")
  }

  private def ranked(df: DataFrame, sortCols: Seq[Column], numBuckets: Int,
      parts: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    // pin = the one-partitioning guarantee (see class doc: correctness,
    // not caching — unpinned branches can draw different range bounds;
    // released by the caller via releasePins at its query boundary)
    val ranged = pin(df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_gr_pid", spark_partition_id()))
    // Pass 1: per-partition counts -> start offsets. <= `parts` rows, so
    // the orderBy-without-partition window here is metadata-sized.
    val wOff = Window.orderBy(col("_gr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_cnt"))
      .select(col("_gr_pid"),
        coalesce(sum(col("_gr_cnt")).over(wOff), lit(0L)).as("_gr_off"),
        sum(col("_gr_cnt")).over(Window.partitionBy()).as("_gr_total"))
    // Pass 2: local row_number per range partition + broadcast offset.
    val wLocal = Window.partitionBy(col("_gr_pid")).orderBy(sortCols: _*)
    val q = expr("_gr_total div " + numBuckets)
    val r = expr("_gr_total % " + numBuckets)
    // NTILE semantics: the first (total mod n) buckets hold one extra
    // row. When total < n, r = total and the first branch covers every
    // rank with bucket size q+1 = 1 (the ELSE's q=0 divisor is never
    // evaluated — CASE short-circuits).
    val nt = when(col("_gr_rank") <= r * (q + lit(1L)),
        expr(s"(_gr_rank - 1) div (_gr_total div $numBuckets + 1)") + lit(1L))
      .otherwise(r + expr(
        s"""(_gr_rank - (_gr_total % $numBuckets)
           |  * (_gr_total div $numBuckets + 1) - 1)
           | div (_gr_total div $numBuckets)""".stripMargin) + lit(1L))
    ranged
      .join(broadcast(offsets), Seq("_gr_pid"))
      .withColumn("_gr_rank", col("_gr_off") + row_number().over(wLocal))
      .withColumn("nt", nt.cast("int"))
      .withColumn("pct", pctCol)
      .drop("_gr_pid", "_gr_off")
  }
}
