package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: manufacture a ~sf1 fixture from the sf0.1 testdata by
  * stacking REP key-shifted replicas, so heavy operators can be
  * measured at 10x the benchmark scale (VERDICT r8 "What's missing"
  * #3: every 100 TB claim was plan-pinned but none was measured past
  * sf0.1 — this closes the one-decade gap that IS reachable locally).
  *
  * Construction (deterministic, no RNG):
  *  - fact/dim keys shift by `replica * stride(keyFamily)` so every FK
  *    chain stays intact within its replica and key spaces never
  *    collide; nation/region (fixed 25/5-row dims) are shared, and
  *    nationkey FKs stay unshifted — exactly how TPC-H itself scales.
  *    Strides are per key FAMILY, sized just above each dim's key
  *    range, so the scaled keys stay DENSE like real TPC-H surrogate
  *    keys (a uniform huge stride would make small dims artificially
  *    sparse — it pushed sf1 suppkeys past the 2^26 dense-domain bound
  *    the bitmap-distinct operator documents, failing a query the real
  *    data shape would never fail).
  *  - `documents.text` gets a per-replica prefix token (replica 0
  *    unchanged), so the corpus grows 10x with near-duplicate
  *    STRUCTURE preserved (each doc gains 9 near-copies — a realistic
  *    dup rate for web-scale corpora) without collapsing into exact
  *    dups; n_chars is recomputed to stay truthful.
  *  - `embeddings` keeps vector VALUES (ids shift): the similarity
  *    probes measure candidate-generation throughput, and identical
  *    vectors across replicas are the worst case for top-k heaps
  *    (maximal ties), not a shortcut.
  *  - `events` keeps timestamps (ids shift): stream/window probes see
  *    10x density per window, which is what a 10x cluster ingest
  *    looks like to a fixed window width.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [replicas]
  * (defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1 x10). Output
  * layout matches TESTDATA.md (`<out>/<table>.parquet`), so every
  * SparkEntry query runs against it unmodified via PROF_SF_DIR.
  */
object ScaleUp {
  // per-key-family replica strides: > the family's max key at sf0.1
  // (suppkey 1k, partkey 20k, custkey 15k, orderkey ~600k, event_id
  // 100k, user_id small, doc_id 5k, vec_id 2k), with headroom
  private val Strides: Map[String, Long] = Map(
    "s_suppkey" -> 10000L, "l_suppkey" -> 10000L,
    "p_partkey" -> 100000L, "l_partkey" -> 100000L,
    "c_custkey" -> 100000L, "o_custkey" -> 100000L,
    "o_orderkey" -> 10000000L, "l_orderkey" -> 10000000L,
    "event_id" -> 1000000L, "user_id" -> 100000L,
    "doc_id" -> 100000L, "vec_id" -> 100000L)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val rep = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Stack `rep` copies of `df`, shifting every column in `keys` by
      * replica * its family stride; `extra` post-processes each
      * replica frame. */
    def stack(df: DataFrame, keys: Seq[String],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until rep).map { k =>
        val shifted = keys.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(k * Strides(c))))
        extra(shifted, k)
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // shared fixed-size dims: copy through unchanged
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    write(stack(tbl("customer"), Seq("c_custkey")), "customer")
    write(stack(tbl("supplier"), Seq("s_suppkey")), "supplier")
    write(stack(tbl("part"), Seq("p_partkey")), "part")
    write(stack(tbl("orders"), Seq("o_orderkey", "o_custkey")), "orders")
    write(stack(tbl("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(stack(tbl("events"), Seq("event_id", "user_id")), "events")
    write(stack(tbl("documents"), Seq("doc_id"), (d, k) =>
      if (k == 0) d
      else d.withColumn("text", concat(lit(s"r$k "), col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents")
    write(stack(tbl("embeddings"), Seq("vec_id")), "embeddings")

    spark.stop()
  }
}
