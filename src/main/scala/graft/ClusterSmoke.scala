package graft

import org.apache.spark.sql.SparkSession

/** Multi-JVM differential smoke (r11 VERDICT #3): run a representative
  * query slice twice — once on `local[4]` (one JVM, the mode every
  * gate uses) and once on `local-cluster[2,2,1024]` (TWO separate
  * executor JVMs launched from SPARK_HOME, real network shuffle, real
  * closure/broadcast serialization across processes) — and require
  * byte-identical results. This witnesses the failure classes
  * `local[*]` structurally cannot: a closure capturing a non-
  * serializable driver object, a custom SparkPlan or Expression that
  * only works because everything shares one heap, a broadcast that
  * never actually crosses a process boundary.
  *
  * The slice deliberately covers the engine's custom moving parts:
  * the frozen-bounds DistributedRank (driver-collected literal bounds
  * + broadcast offsets), the native AsOfJoin LogicalPlan/Exec, the
  * graftlines DSv2 connector (scan + versioned write/read round trip),
  * a flatMapGroupsWithState streaming query (cross-process state
  * store), and a dedup/text query (custom Catalyst expressions).
  *
  * Opt-in (not part of `sbt test`): {{{
  *   SPARK_SCALA_VERSION=2.13 sbt -batch "runMain graft.ClusterSmoke [sfDir]"
  * }}}
  * (the env var is required: the standalone worker's executor-command
  * builder infers the Scala version from a source-tree layout that a
  * binary SPARK_HOME does not have, and fails without it).
  * Exits nonzero on any divergence. Caveats (documented in
  * BASELINE.md): local-cluster still shares one machine and one disk —
  * it proves serialization and wire-level correctness, not
  * executor-loss recovery or cluster-scale scheduling.
  */
object ClusterSmoke {

  private val slice = Seq(
    "q_win_ntile_distributed", // DistributedRank: sketch + frozen bounds
    "q_join_asof",             // native AsOfJoin plan/exec
    "q_source_dsv2",           // graftlines DSv2 scan + pushdown
    "q_stream_stateful",       // flatMapGroupsWithState across JVMs
    "q_dedup_exact",           // md5-normalize dedup (custom exprs)
    "q_sim_cosine_topk",       // fdot codegen expression on executors
    "q_join_broadcast",        // broadcast actually crossing processes
    "q_agg_pricing_summary",   // partial+final hash agg over the wire
    "q_agg_udaf_geomean")      // custom Aggregator serialization

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-cluster-smoke-$master")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", GraftTmp.dir("warehouse_smoke"))
    if (master.startsWith("local-cluster")) {
      // executor JVMs are launched fresh from SPARK_HOME and know
      // nothing about sbt's classpath: hand them ours (graft classes)
      // and the same JDK17 add-opens the driver fork uses
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      b.config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "1g")
    }
    b.getOrCreate()
  }

  /** Canonical result of each slice query plus a graftlines versioned
    * write/read round trip, as sorted row strings. */
  private def runAll(master: String, sfDir: String)
      : Map[String, Seq[String]] = {
    val spark = session(master)
    try {
      spark.sparkContext.setLogLevel("WARN")
      val qs = slice.map { name =>
        name -> SparkEntry.queries(name)(spark, sfDir)
          .collect().map(_.toString).sorted.toSeq
      }.toMap
      // graftlines round trip: versioned appends from EXECUTOR tasks,
      // then latest + time-travel reads back through the DSv2 scan
      val dir = GraftTmp.dir(s"smoke_gl_${master.replaceAll("[^a-z0-9]", "_")}")
      val hp = new org.apache.hadoop.fs.Path(dir)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(hp, true); fs.mkdirs(hp)
      fs.create(new org.apache.hadoop.fs.Path(hp,
        graft.sources.GraftLines.VersionMarker), true).close()
      import spark.implicits._
      (0L until 100L).toDF("v").repartition(4)
        .write.format("graftlines").mode("append").save(dir)
      (100L until 150L).toDF("v").repartition(4)
        .write.format("graftlines").mode("append").save(dir)
      val latest = spark.read.format("graftlines").load(dir)
        .collect().map(_.toString).sorted.toSeq
      val v1 = spark.read.format("graftlines").option("versionAsOf", 1)
        .load(dir).collect().map(_.toString).sorted.toSeq
      qs + ("gl_roundtrip_latest" -> latest) + ("gl_roundtrip_v1" -> v1)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    println(s"[cluster-smoke] reference run on local[4] ($sfDir)")
    val ref = runAll("local[4]", sfDir)
    println(s"[cluster-smoke] cluster run on local-cluster[2,2,1024]")
    val got = runAll("local-cluster[2,2,1024]", sfDir)
    var bad = 0
    (ref.keySet ++ got.keySet).toSeq.sorted.foreach { k =>
      val (r, g) = (ref.getOrElse(k, Nil), got.getOrElse(k, Nil))
      if (r == g && r.nonEmpty)
        println(s"[cluster-smoke] OK   $k (${r.size} rows identical)")
      else if (r.isEmpty) { bad += 1
        println(s"[cluster-smoke] FAIL $k: empty reference result") }
      else { bad += 1
        println(s"[cluster-smoke] FAIL $k: ${r.size} vs ${g.size} rows; " +
          s"first diff: ${r.zipAll(g, "<none>", "<none>")
            .find(p => p._1 != p._2).getOrElse(("", ""))}") }
    }
    if (bad > 0) {
      println(s"[cluster-smoke] $bad DIVERGENT results")
      sys.exit(1)
    }
    println(s"[cluster-smoke] all ${ref.size} checks identical across JVMs")
  }
}
