package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB techniques that don't show up in the oracle queries:
  * bucketed co-located joins (no shuffle), salted skew aggregation
  * (same answer, spread keys), and partition-pruned reads. */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val l = Tables.lineitem(spark, TestSpark.sf0001)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == l.count(), "no rows lost by bucketing")
    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE lineitem_b")
  }

  test("salted aggregation equals direct aggregation (skew pattern)") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("s"))
      .orderBy(col("event_type"))
      .collect().map(_.toString).toSeq
    // stage 1: spread each hot key over 16 salt buckets; stage 2: merge
    val salted = ev
      .withColumn("salt", (col("event_id") % 16).cast("int"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(14,2)")).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("s"))
      .orderBy(col("event_type"))
      .collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    // the automatic counterpart to q_join_skew_salted: when one key
    // dominates a shuffle partition, AQE's OptimizeSkewedJoin splits
    // that partition into subtasks at runtime — no salting code. Toy
    // thresholds make the 30k-row hot key register as skewed.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // v is hash-scrambled so the hot partition's shuffle BYTES are
      // genuinely large (an all-constant column compresses to nothing
      // and would dodge the byte-based skew detector)
      val fact = (1 to 100).flatMap { k =>
        val n = if (k == 1) 30000 else 30
        (0 until n).map(i =>
          (k.toLong, math.floorMod(i * 0x9e3779b97f4a7c15L, 1000003L)))
      }.toDF("k", "v").repartition(7)
      val dim = (1 to 100).map(k => (k.toLong, s"tag_$k")).toDF("dk", "tag")
      val joined = fact.join(dim, $"k" === $"dk")
        .groupBy($"tag").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 30000 + 99 * 30)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom prefilter keeps every matching row and prunes most others") {
    val keys = Tables.customer(spark, TestSpark.sf001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bloom = keys.stat.bloomFilter("c_custkey", 50000, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    val orders = Tables.orders(spark, TestSpark.sf001)
    val total = orders.count()
    val prefiltered = orders.filter(mightContain(col("o_custkey")))
    val kept = prefiltered.count()
    val exact = orders
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val exactAfterBloom = prefiltered
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(exactAfterBloom == exact,
      "bloom must never drop a matching row (no false negatives)")
    // ~1/5 of customers are BUILDING; with fpp 0.01 the prefilter should
    // pass well under half the fact rows
    assert(kept < total / 2,
      s"prefilter kept $kept of $total rows — bloom is not selective")
  }

  test("partitioned write enables partition pruning in the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, TestSpark.sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type")
      || plan.contains("PartitionFilters: [(event_type"), plan)
    val direct = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "click").count()
    assert(pruned.count() == direct)
  }

  test("z-order layout yields disjoint per-file z ranges (stats pruning)") {
    // run the contract query (it writes the z-ordered layout) then
    // check the LAYOUT claim the oracle can't see: each written file
    // covers a z-range disjoint from every other file's, which is what
    // lets parquet min/max stats prune scans on either interleaved
    // dimension
    SparkEntry.queries("q_etl_zorder")(spark, TestSpark.sf0001).collect()
    val files = new java.io.File(graft.GraftTmp.dir("zorder_sink")).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1, "need multiple files to prove disjointness")
    val ranges = files.flatMap { f =>
      val r = spark.read.parquet(f).agg(min(col("z")), max(col("z"))).head()
      if (r.isNullAt(0)) None // empty range partition at toy scale
      else Some((r.getLong(0), r.getLong(1)))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping z ranges: $hi > $lo2 in ${ranges.toSeq}")
      case _ =>
    }
  }
}
