package graft

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
