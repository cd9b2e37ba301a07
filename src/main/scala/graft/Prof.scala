package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROF_CPUS", "4")
    // doubles as the shuffle-partition count, so local[*] syntax is out
    require(cpus.nonEmpty && cpus.forall(_.isDigit),
      s"PROF_CPUS must be a plain integer, got '$cpus'")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone","UTC")
      // r16 (measured, Scratch A/B x3): Spark 4.1's recursive-CTE
      // executor converts a small anchor to a LocalRelation
      // (spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation,
      // default 100), which re-embeds the growing iteration state into
      // every per-iteration plan and re-analyzes it — q_sql_recursive
      // 3.8 s -> 2.7 s with the conversion off. Pure execution-strategy
      // flag; results oracle-identical.
      .config("spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation",
        "0")
      .config("spark.ui.enabled","false")
      .config("spark.sql.warehouse.dir", GraftTmp.dir("warehouse_prof"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("PROF_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").count()
    for (name <- args) {
      // time the query fn inclusively: the streaming queries run their
      // micro-batches inside the closure, before the returned frame is
      // materialized — construction cost IS the query for them.
      // noop write, same as Bench (r9): count() lets the optimizer
      // drop the final sort and prune value expressions, so Prof
      // numbers would not be comparable to the graded bench series
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      df.write.mode("overwrite").format("noop").save()
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (sys.env.contains("PROF_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
