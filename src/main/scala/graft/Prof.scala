package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").count()
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, d)
      val t0 = System.nanoTime()
      df.count()
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (sys.env.contains("PROF_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
