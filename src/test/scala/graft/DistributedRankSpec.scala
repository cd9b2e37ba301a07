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
    assert(plan.contains("hashpartitioning(_gr_pid"),
      s"expected a hash exchange on the bucket id in:\n$plan")
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

  test("bounds are frozen literals: re-materialization cannot shift ranks") {
    // The exact r10 sf1 failure shape: a downstream coalesce(1) file
    // write broke ReusedExchange, the two passes re-materialized the
    // ranged frame independently, and RangePartitioner (sample seed
    // folds in the RDD id) drew DIFFERENT bounds per materialization —
    // ranks silently collided. Bounds are now collected once and
    // embedded as literals, so the bucket id is a pure function of the
    // row: any plan shape, any number of materializations, same ranks.
    val ranked = graft.operators.DistributedRank.withRankCols(
      Tables.customer(spark, TestSpark.sf001)
        .select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal"), col("c_custkey")), numBuckets = 4, parts = 8)
    val n = Tables.customer(spark, TestSpark.sf001).count()
    val out = GraftTmp.dir("rank_bounds_spec")
    ranked.coalesce(1).write.mode("overwrite").parquet(out)
    val ranks = spark.read.parquet(out)
      .select(col("_gr_rank")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to n),
      "ranks must be exactly 1..N through a coalesce(1) write")
    // and a second, independent materialization of the SAME frame
    // agrees row-for-row (nothing resamples: the bounds are literals)
    val a = ranked.orderBy(col("c_custkey")).collect().map(_.toString).toSeq
    val b = ranked.orderBy(col("c_custkey")).collect().map(_.toString).toSeq
    assert(a == b, "two materializations must agree exactly")
    // no persist pin anywhere: the old design's full-input cache entry
    // (a 100 TB liability and an explicit release lifecycle) is gone
    assert(spark.sharedState.cacheManager.isEmpty,
      "the operator must not register cache entries")
  }

  test("a bounds proxy on a key prefix changes nothing but balance") {
    import spark.implicits._
    // proxy = a DIFFERENT frame (shifted distribution, different column
    // name, prefix only) — the running sum must still be exact, because
    // bounds only place bucket boundaries, never reorder rows
    val df = (1 to 500).map(i => (i.toLong % 37, i.toLong, 1L))
      .toDF("k", "id", "v")
    val proxy = (1 to 100).map(i => (i * 5L % 37))
      .toDF("other_name")
    val plain = graft.operators.DistributedRank
      .withRunningSum(df, Seq(col("k"), col("id")), col("v"), parts = 8)
      .select(col("k"), col("id"), col("_gr_psum"))
      .collect().map(_.toString).sorted.toSeq
    val viaProxy = graft.operators.DistributedRank
      .withRunningSum(df, Seq(col("k"), col("id")), col("v"), parts = 8,
        boundsFrom = Some((proxy, Seq(col("other_name")))))
      .select(col("k"), col("id"), col("_gr_psum"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaProxy == plain)
    // and a type-mismatched proxy is a loud error, not silent drift
    val bad = Seq(1.5).toDF("other_name")
    intercept[IllegalArgumentException] {
      graft.operators.DistributedRank.withRunningSum(df,
        Seq(col("k"), col("id")), col("v"), parts = 8,
        boundsFrom = Some((bad, Seq(col("other_name")))))
    }
  }

  test("rank path accepts a bounds proxy and a NULL-sampling proxy is safe") {
    import spark.implicits._
    // (a) withRankCols via proxy == without: bounds place boundaries,
    // never reorder — parity with withRunningSum's knob (ADVICE r11)
    val df = (1 to 500).map(i => ((i * 7L) % 37, i.toLong))
      .toDF("k", "id")
    val proxy = (1 to 100).map(i => (i * 5L % 37)).toDF("other_name")
    def ranksOf(bf: Option[(org.apache.spark.sql.DataFrame,
        Seq[org.apache.spark.sql.Column])]) =
      graft.operators.DistributedRank.withRankCols(df,
          Seq(col("k"), col("id")), numBuckets = 4, parts = 8,
          boundsFrom = bf)
        .select(col("id"), col("_gr_rank"), col("nt"), col("pct"))
        .collect().map(_.toString).sorted.toSeq
    assert(ranksOf(Some((proxy, Seq(col("other_name"))))) == ranksOf(None))
    // (b) a NULLABLE proxy whose samples include NULLs must not violate
    // the literal's nullability invariant (ADVICE r11: a NULL frozen
    // into a non-nullable-typed literal lets codegen read garbage).
    // Every proxy value NULL makes NULL split points all but certain.
    val nullProxy = (1 to 100).map(_ => None: Option[Long])
      .toDF("other_name")
    val viaNulls = graft.operators.DistributedRank.withRankCols(df,
        Seq(col("k"), col("id")), numBuckets = 4, parts = 8,
        boundsFrom = Some((nullProxy, Seq(col("other_name")))))
      .select(col("id"), col("_gr_rank"), col("nt"), col("pct"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaNulls == ranksOf(None),
      "NULL split points may cost balance, never rank correctness")
    // (c) tie-safe variant exposes the same knob
    val tieSafe = graft.operators.DistributedRank.withRankColsTieSafe(df,
        Seq(col("k")), numBuckets = 4, parts = 8,
        boundsFrom = Some((proxy, Seq(col("other_name")))))
      .select(col("id"), col("_gr_rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("k"))
    val wantTie = df.select(col("id"), rank().over(w).cast("long").as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tieSafe == wantTie)
  }

  test("sampled bounds keep buckets balanced on smooth data") {
    // balance is the ONE property the sketch can silently lose without
    // failing any correctness gate — pin it: on near-uniform keys the
    // largest range bucket must stay within a small factor of the mean
    import spark.implicits._
    val n = 20000
    val rows = (1 to n).map(i => ((i * 2654435761L) % 1000003, i.toLong))
    val df = rows.toDF("k", "id").repartition(8)
    val parts = 16
    val bounds = graft.operators.DistributedRank
      .collectBounds(df, Seq(col("k"), col("id")), parts)
      .map(b => (b.getLong(0), b.getLong(1)))
    assert(bounds.size >= parts - 4,
      s"expected ~${parts - 1} split points, got ${bounds.size}")
    assert(bounds == bounds.sorted, "split points must be ascending")
    // bucket sizes under the operator's own semantics: bucket i holds
    // keys in (bounds(i-1), bounds(i)] under the (k, id) tuple order
    import scala.math.Ordering.Implicits._
    val sizes = rows.groupBy(key =>
        bounds.indexWhere(key <= _) match {
          case -1 => bounds.size
          case i => i
        })
      .values.map(_.size).toSeq
    assert(sizes.sum == n)
    val mean = n.toDouble / (bounds.size + 1)
    assert(sizes.max <= 2.5 * mean,
      s"largest bucket ${sizes.max} vs mean $mean — sketch degenerated")
  }

  test("two independent operator calls draw identical bounds") {
    // the sketch seed folds in only the partition index — same input,
    // same candidates, same split points, every call
    val df = Tables.customer(spark, TestSpark.sf001)
      .select(col("c_custkey"), col("c_acctbal"))
    val key = Seq(col("c_acctbal"), col("c_custkey"))
    val b1 = graft.operators.DistributedRank.collectBounds(df, key, 8)
    val b2 = graft.operators.DistributedRank.collectBounds(df, key, 8)
    assert(b1.nonEmpty, "sf0.01 customer must yield split points")
    assert(b1 == b2, s"bounds must be deterministic: $b1 vs $b2")
  }

  test("plan buckets the data — no single-task sort, no cache, no range exchange") {
    val inner = graft.operators.DistributedRank.withRankCols(
      Tables.customer(spark, TestSpark.sf001)
        .select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal"), col("c_custkey")), numBuckets = 4, parts = 8)
    inner.collect()
    val plan = inner.queryExecution.executedPlan.toString
    // the data's one shuffle is HASH on the frozen-literal bucket id;
    // the only unpartitioned window is over the per-bucket counts
    // (<= `parts` rows), never over the data
    assert(plan.contains("hashpartitioning(_gr_pid"),
      s"expected a hash exchange on the bucket id in:\n$plan")
    assert(plan.contains("windowspecdefinition(_gr_pid"),
      s"expected pid-partitioned data window in:\n$plan")
    assert(!plan.contains("windowspecdefinition(c_acctbal"),
      s"data must never flow through an un-keyed window in:\n$plan")
    assert(!plan.contains("InMemoryRelation"),
      s"no persist pin may remain in:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no RangePartitioner (nondeterministic bounds) may remain in:\n$plan")
  }
}
