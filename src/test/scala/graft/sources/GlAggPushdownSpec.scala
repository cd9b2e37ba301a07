package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftTmp, TestSpark}

/** Aggregate-pushdown semantics grid: the partial aggregation the
  * scan emits (one pre-aggregated row per group per SPLIT, merged by
  * Spark's final aggregate) must be indistinguishable from the plain
  * row scan for every (group, agg, filter) shape — including NULL
  * group keys, all-NULL files, count vs count(*) null handling, the
  * pushed-filter-before-aggregation ordering, and shapes the source
  * DECLINES (min/max on strings), where the row scan must silently
  * stand. Law: equality with Spark-on-parquet on a NULL-rich
  * multi-file table. PlanSpec pins that the pushed shape actually
  * engages; this spec pins that engaging it can never change answers. */
class GlAggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ready: Unit = {
    val gl = GraftTmp.dir("aggpush_gl")
    val pq = GraftTmp.dir("aggpush_pq")
    val fs = new Path(gl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(gl), true); fs.delete(new Path(pq), true)
    val rows: Seq[(java.lang.Long, String)] =
      (0 until 90).map { i =>
        val v: java.lang.Long = if (i % 7 == 0) null else Long.box(i % 13)
        val s: String = if (i % 5 == 0) null else "abcxy"(i % 5).toString
        (v, s)
      }
    val df = rows.toDF("v", "s")
    df.write.format("graftlines")
      .option("clusterBy", "v").option("clusterPartitions", "6")
      .mode("append").save(gl)
    df.coalesce(1).write.parquet(pq)
    spark.read.format("graftlines").load(gl).createOrReplaceTempView("agp_gl")
    spark.read.parquet(pq).createOrReplaceTempView("agp_pq")
  }

  private val groups = Seq("", "s", "v", "s, v")
  private val aggs = Seq(
    "count(*) AS n",
    "count(v) AS cv, count(s) AS cs",
    "min(v) AS mn, max(v) AS mx",
    "count(*) AS n, min(v) AS mn, count(s) AS cs",
    // min/max on strings: DECLINED by the source (UTF-16 vs UTF8
    // ordering) — the whole aggregation must fall back to the row scan
    "min(s) AS smn, max(s) AS smx, count(*) AS n")
  private val filters = Seq(
    "", "WHERE v > 5", "WHERE NOT (v = 5) OR s IS NULL",
    "WHERE s IS NOT NULL AND v <= 9")

  test("every (group, agg, filter) shape matches parquet exactly") {
    ready
    var checked = 0
    for (g <- groups; a <- aggs; f <- filters) {
      val sel = if (g.isEmpty) a else s"$g, $a"
      val by = if (g.isEmpty) "" else s"GROUP BY $g"
      def q(t: String) =
        spark.sql(s"SELECT $sel FROM $t $f $by")
          .collect().map(_.toString).sorted.toSeq
      val (got, exp) = (q("agp_gl"), q("agp_pq"))
      assert(got == exp,
        s"shape `SELECT $sel FROM t $f $by` diverged: gl=$got pq=$exp")
      checked += 1
    }
    assert(checked == groups.size * aggs.size * filters.size)
  }

  test("a file of only NULL values aggregates identically") {
    ready
    // append an all-NULL-v file: its stats record min=max=NULL, its
    // partial min/max state must merge as absent, and count(v) adds 0
    val gl = GraftTmp.dir("aggpush_gl")
    val pq = GraftTmp.dir("aggpush_pq")
    val extra: Seq[(java.lang.Long, String)] =
      Seq((null, "z"), (null, null), (null, "z"))
    extra.toDF("v", "s").coalesce(1)
      .write.format("graftlines").mode("append").save(gl)
    extra.toDF("v", "s").coalesce(1).write.mode("append").parquet(pq)
    def q(t: String) = spark.sql(
      s"SELECT s, count(*) AS n, count(v) AS cv, min(v) AS mn, " +
        s"max(v) AS mx FROM $t GROUP BY s")
      .collect().map(_.toString).sorted.toSeq
    spark.read.format("graftlines").load(gl)
      .createOrReplaceTempView("agp_gl2")
    spark.read.parquet(pq).createOrReplaceTempView("agp_pq2")
    assert(q("agp_gl2") == q("agp_pq2"),
      "the all-NULL file must not poison merged min/max or counts")
  }
}
