package graft

import graft.functions.ThetaSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("geomean Aggregator matches closed form on a known set") {
    import spark.implicits._
    // geomean(2, 8) = 4; geomean(1..5) = (120)^(1/5)
    val got = Seq(2.0, 8.0).toDF("x")
      .agg(graft.functions.GeoMean.geomean(col("x"))).head.getDouble(0)
    assert(math.abs(got - 4.0) < 1e-12)
    val got2 = (1 to 5).map(_.toDouble).toDF("x")
      .agg(graft.functions.GeoMean.geomean(col("x"))).head.getDouble(0)
    assert(math.abs(got2 - math.pow(120.0, 0.2)) < 1e-12)
  }

  test("sketch SQL surfaces are null-safe: NULL/empty in, NULL out") {
    import spark.implicits._
    // all-NULL group: the aggregates skip NULLs (valid empty sketch /
    // empty buffer); the SCALAR surfaces must then yield NULL — the
    // AVG/percentile_approx convention — never throw or NPE the task
    val allNull = Seq[java.lang.Double](null, null).toDF("x")
    val kllRow = allNull
      .agg(graft.functions.KllQuantile.kll(col("x")).as("sk"))
      .select(graft.functions.KllQuantile
        .kllEstimate(col("sk"), lit(0.5)).as("est"))
      .head
    assert(kllRow.isNullAt(0),
      "kll_estimate over an all-NULL group must be NULL")
    val geoRow = allNull
      .agg(graft.functions.GeoMean.geomean(col("x")).as("g")).head
    assert(geoRow.isNullAt(0),
      "geomean over an all-NULL group must be NULL (like EXP(AVG(LN)))")
    // NULL sketch columns (the outer-join case): every estimate
    // surface returns NULL instead of failing
    val nullSketch = Seq(Tuple1(null: Array[Byte]))
      .toDF("sk")
    assert(nullSketch.select(graft.functions.KllQuantile
        .kllEstimate(col("sk"), lit(0.5))).head.isNullAt(0))
    assert(nullSketch.select(graft.functions.KllQuantile
        .kllCount(col("sk"))).head.isNullAt(0))
    assert(nullSketch.select(graft.functions.FreqItems
        .hitters(col("sk"))).head.isNullAt(0))
    val nullCms = Seq((null: Seq[Long], "tok"), (Seq(1L, 2L), null))
      .toDF("sk", "key")
    val cmsOut = nullCms.select(graft.functions.CountMin
      .cmsEstimate(col("sk"), col("key"))).collect()
    assert(cmsOut.forall(_.isNullAt(0)),
      "cms_estimate must be NULL for a NULL sketch or NULL key")
  }

  test("scalar sketch surfaces degrade to NULL on malformed bytes") {
    import spark.implicits._
    // the cms_estimate shape rule extended to every binary scalar
    // surface: a column that is not the expected sketch's wire form
    // (wrong type fed through a join, truncated bytes) must yield
    // NULL, never exception-storm each task. The AGGREGATE merge
    // surfaces deliberately keep rejecting garbage loudly — silently
    // skipping inputs would under-count
    val junk = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("sk")
    assert(junk.select(graft.functions.KllQuantile
      .kllEstimate(col("sk"), lit(0.5))).head.isNullAt(0),
      "kll_estimate on junk bytes must be NULL")
    assert(junk.select(graft.functions.KllQuantile
      .kllCount(col("sk"))).head.isNullAt(0),
      "kll_count on junk bytes must be NULL")
    assert(junk.select(graft.functions.ThetaSketch
      .thetaEstimate(col("sk"))).head.isNullAt(0),
      "theta_estimate on junk bytes must be NULL")
    assert(junk.select(graft.functions.ThetaSketch
      .thetaAnotB(col("sk"), col("sk"))).head.isNullAt(0),
      "theta_a_not_b on junk bytes must be NULL")
    assert(junk.select(graft.functions.FreqItems
      .hitters(col("sk"))).head.isNullAt(0),
      "freq-items hitters on junk bytes must be NULL")
  }

  test("approx_count_distinct within 5% of exact (q_agg_approx_hll, sf0.01)") {
    val r = SparkEntry.queries("q_agg_approx_hll")(spark, TestSpark.sf001).head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("merged daily HLL sketches estimate distinct users within 5%") {
    val merged = SparkEntry.queries("q_agg_hll_reaggregate")(
        spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, TestSpark.sf001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    exact.foreach { case (et, ex) =>
      val est = merged(et).toDouble
      assert(math.abs(est - ex) / ex < 0.05,
        s"$et: merged-sketch estimate $est vs exact $ex")
    }
  }

  test("approx quantiles within 1% rank error of exact (sf0.01)") {
    val qs = Seq(0.25, 0.5, 0.75, 0.99)
    // exploded shape: one (l_returnflag, q_idx, q_val) row per quantile
    val rows = SparkEntry.queries("q_agg_approx_quantile")(
        spark, TestSpark.sf001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.map(_._2).toSet == qs.indices.toSet)
    val li = Tables.lineitem(spark, TestSpark.sf001)
    rows.groupBy(_._1).foreach { case (flag, perFlag) =>
      val sorted = li.filter(col("l_returnflag") === flag)
        .select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
        .collect().map(_.getDouble(0))
      perFlag.foreach { case (_, idx, v) =>
        // rank error: the approx value's position must be within 1% of
        // the requested rank (percentile_approx accuracy=1000 => 1/1000)
        val q = qs(idx)
        val lo = sorted.count(_ < v).toDouble / sorted.length
        val hi = sorted.count(_ <= v).toDouble / sorted.length
        assert(q >= lo - 0.01 && q <= hi + 0.01,
          s"$flag q$q: value $v sits at rank [$lo,$hi]")
      }
    }
  }

  test("merged daily KLL sketches hit exact quantiles within rank error") {
    val rows = SparkEntry.queries("q_agg_kll_reaggregate")(
        spark, TestSpark.sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf001)
    rows.foreach { case (typ, nSketches, nValues, p50, p95, p99) =>
      val sorted = ev.filter(col("event_type") === typ)
        .select(col("value")).orderBy(col("value"))
        .collect().map(_.getDouble(0))
      // coverage: the merged sketch saw every non-null value once
      assert(nValues == sorted.length,
        s"$typ: sketch n $nValues != ${sorted.length}")
      assert(nSketches > 1, s"$typ: merge law untested with 1 sketch")
      // rank error: k=200 KLL bounds normalized rank error at ~1.65%
      // (99% conf); gate at 3% to keep the test deterministic-ish
      Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99).foreach { case (q, v) =>
        val lo = sorted.count(_ < v).toDouble / sorted.length
        val hi = sorted.count(_ <= v).toDouble / sorted.length
        assert(q >= lo - 0.03 && q <= hi + 0.03,
          s"$typ q$q: value $v sits at rank [$lo,$hi]")
      }
    }
  }

  test("theta set algebra is EXACT below nominal entries (sf0.01)") {
    // sf0.01 distinct custkeys per status (~1.45k) sit below lgK=12's
    // 4096 nominal entries, so every sketch stays in exact mode and
    // the whole query result must EQUAL the exact set-op counts —
    // the strongest check an approximate structure admits
    val r = SparkEntry.queries("q_agg_theta_segments")(
      spark, TestSpark.sf001).head()
    val o = Tables.orders(spark, TestSpark.sf001)
      .select(col("o_orderstatus").as("st"), col("o_custkey").as("ck"))
    def keys(st: String): Set[Long] =
      o.filter(col("st") === st).select(col("ck"))
        .distinct().collect().map(_.getLong(0)).toSet
    val (f, oo, p) = (keys("F"), keys("O"), keys("P"))
    val exact = Seq(f.size, oo.size, p.size,
      (f | oo | p).size, (f & oo & p).size, (f -- oo -- p).size)
    val got = (0 until 6).map(r.getLong)
    assert(got == exact.map(_.toLong), s"got=$got exact=$exact")
  }

  test("theta estimates within 5% in estimation mode (sf0.1)") {
    // sf0.1 distincts (~14.5k) exceed 4096 -> true estimation regime;
    // 1.6% RSE per sketch, gate at 5% (intersection error compounds)
    val r = SparkEntry.queries("q_agg_theta_segments")(
      spark, TestSpark.sf01).head()
    val o = Tables.orders(spark, TestSpark.sf01)
      .select(col("o_orderstatus").as("st"), col("o_custkey").as("ck"))
    def keys(st: String): Set[Long] =
      o.filter(col("st") === st).select(col("ck"))
        .distinct().collect().map(_.getLong(0)).toSet
    val (f, oo, p) = (keys("F"), keys("O"), keys("P"))
    val exact = Seq(f.size, oo.size, p.size,
      (f | oo | p).size, (f & oo & p).size, (f -- oo -- p).size)
    // set-op error is NOT relative to the result: a theta set op keeps
    // ~frac = k/n of each input's key space, so a result of exact
    // cardinality m is estimated from ~m*frac retained samples —
    // Binomial, std ≈ sqrt(m/frac). For m ~ 20 (F\O\P) that std is
    // ~9 keys while 5% of m is ~1 key. Gate each column at
    // max(5% relative, 4 std) — tight for the big sets, honest for
    // the tiny ones.
    val frac = math.pow(2.0, ThetaSketch.LgK) / (f | oo | p).size
    (0 until 6).foreach { i =>
      val est = r.getLong(i).toDouble
      val ex = exact(i).toDouble
      val tol = math.max(0.05 * ex, 4 * math.sqrt(ex / frac))
      assert(math.abs(est - ex) <= tol,
        s"col $i: est $est vs exact $ex (tol $tol)")
    }
  }

  test("KLL merge law: merged partition sketches equal one-shot answers") {
    import graft.functions.KllQuantile
    val vals = Tables.events(spark, TestSpark.sf001)
      .select(col("value").as("v"),
        (col("event_id") % 7).as("part"))
    val oneShot = vals.agg(KllQuantile.kll(col("v")).as("sk"))
      .select(KllQuantile.kllEstimate(col("sk"), lit(0.9)))
      .head().getDouble(0)
    val merged = vals.groupBy(col("part"))
      .agg(KllQuantile.kll(col("v")).as("sk"))
      .agg(KllQuantile.kllMerge(col("sk")).as("msk"))
      .select(KllQuantile.kllEstimate(col("msk"), lit(0.9)))
      .head().getDouble(0)
    // both are sketch estimates of the same stream; their RANKS must
    // both sit within the sketch's error of 0.9 — assert against the
    // exact data rather than each other (merge order differs)
    val sorted = vals.select(col("v")).orderBy(col("v"))
      .collect().map(_.getDouble(0))
    Seq(oneShot, merged).foreach { v =>
      val lo = sorted.count(_ < v).toDouble / sorted.length
      val hi = sorted.count(_ <= v).toDouble / sorted.length
      assert(0.9 >= lo - 0.03 && 0.9 <= hi + 0.03,
        s"estimate $v sits at rank [$lo,$hi]")
    }
  }

  test("frequent-items sketch: exact regime on the corpus, bounds under purge") {
    import graft.functions.FreqItems
    // exact regime: the 31-token vocabulary never purges at capacity
    // 256, so every estimate equals the exact count and the
    // proven-frequent list IS the full vocabulary per language
    val tok = Tables.documents(spark, TestSpark.sf001)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("tok"))
    val exact = tok.groupBy(col("lang"), col("tok")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val sketches = tok.repartition(7) // force the distributed merge path
      .groupBy(col("lang"))
      .agg(FreqItems.sketchColumn(col("tok")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk"))
    assert(sketches.nonEmpty)
    sketches.foreach { case (lang, sk) =>
      val hh = FreqItems.heavyHitters(sk, noFalsePositives = true)
      val langExact = exact.collect { case ((l, t), n) if l == lang => t -> n }
      assert(hh.size == langExact.size,
        s"$lang: exact regime must enumerate the whole vocab")
      hh.foreach { case (item, est, lb, ub) =>
        assert(est == langExact(item) && lb == est && ub == est,
          s"$lang/$item: exact regime must have est == truth == bounds")
      }
    }
    // estimation regime: heavy items + a long singleton tail force
    // purges; the guarantees (lb <= truth <= ub, no-false-negatives
    // coverage of truly-heavy items) must survive the merge path
    import spark.implicits._
    val heavy = Seq.fill(2000)("hot1") ++ Seq.fill(900)("hot2")
    val tail = (0 until 3000).map(i => s"cold$i")
    val sk2 = (heavy ++ tail).toDF("item").repartition(5)
      .agg(FreqItems.sketchColumn(col("item")).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val all = FreqItems.heavyHitters(sk2, noFalsePositives = false)
    val hot1 = all.find(_._1 == "hot1")
    val hot2 = all.find(_._1 == "hot2")
    assert(hot1.nonEmpty && hot2.nonEmpty,
      "no-false-negatives list must cover every truly-heavy item")
    assert(hot1.get._3 <= 2000 && 2000 <= hot1.get._4,
      s"hot1 bounds must bracket the truth: ${hot1.get}")
    assert(hot2.get._3 <= 900 && 900 <= hot2.get._4,
      s"hot2 bounds must bracket the truth: ${hot2.get}")
  }

  test("upsert-dedup is idempotent: re-staging changes nothing") {
    val once = SparkEntry.queries("q_etl_upsert_dedup")(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    // baseline: counts straight off the target table
    val base = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type")).collect().map(_.toString).toSeq
    assert(once == base, "upsert of duplicate staging rows must be a no-op")
  }
}
