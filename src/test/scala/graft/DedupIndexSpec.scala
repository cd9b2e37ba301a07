package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex

/** Persistent MinHash-LSH dedup index contract (build/append/probe
  * split — a gate-verified operator surface like AnnIndex, not a
  * contract query key):
  *
  *  1. fidelity through increments — build(base) + append(delta)
  *     reproduces the frozen q_dedup_minhash_lsh output BIT-FOR-BIT
  *     via selfPairs, so neither storage nor the incremental path
  *     loses or invents a candidate pair;
  *  2. history probing — pairsAgainst a pre-append index returns
  *     exactly the cross (history x batch) subset of the one-shot
  *     query's pairs, in both the point-lookup and the bulk form;
  *  3. corpus independence — serving reads only the index tables and
  *     the batch, never the document archive;
  *  4. versioning — `versionAsOf` serves the pre-append index after
  *     an append (all three tables advance in lockstep);
  *  5. loud gates — id collisions, in-batch duplicates, empty
  *     batches, and foreign-geometry indexes are refused.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  // the sf0.01 fixture's frozen-query pairs are (92,450) (107,387)
  // (166,323) (267,413) (285,301) (458,462): cut 250 puts three pairs
  // across the cut and three inside the delta, none inside the base
  private val cut = 250L
  private def docs = Tables.documents(spark, TestSpark.sf001)
  private def base = docs.filter(col("doc_id") < cut)
  private def delta = docs.filter(col("doc_id") >= cut)

  /** (a, b, est_jac-as-string) — est_jac is the query's DECIMAL
    * (`/ 128.0`), so string form keeps the compare exact without
    * caring about the runtime decimal class */
  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
      .toSeq

  /** the frozen query's rows — the reference for every gate below */
  private lazy val oneShot: Seq[(Long, Long, String)] =
    triples(SparkEntry.queries("q_dedup_minhash_lsh")(spark, TestSpark.sf001))

  test("build(base) + append(delta) reproduces the frozen LSH query") {
    val idx = GraftTmp.dir("dedup_idx_incr")
    DedupIndex.build(spark, idx, base)
    DedupIndex.append(spark, idx, delta)
    val got = triples(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx)))
    assert(got == oneShot,
      "incrementally built index must emit q_dedup_minhash_lsh's " +
        "exact rows — storage or the append path lost/invented pairs")
    assert(got.nonEmpty, "fixture produced no candidate pairs")
  }

  test("pairsAgainst returns exactly the cross pairs, both forms") {
    val idx = GraftTmp.dir("dedup_idx_cross")
    DedupIndex.build(spark, idx, base)
    val f = DedupIndex.loadFrames(spark, idx)
    // all base ids < all delta ids, and the one-shot query sorts each
    // pair (a < b) — so its cross subset is exactly {a < cut <= b},
    // matching pairsAgainst's (a = history, b = batch) orientation
    val expected = oneShot.filter(p => p._1 < cut && p._2 >= cut)
    assert(expected.nonEmpty, "fixture has no cross pairs — cut is bad")
    val bulk = triples(DedupIndex.pairsAgainstJoin(spark, f, delta))
    assert(bulk == expected,
      "bulk probe must return the one-shot query's cross pairs")
    // the point-lookup form on a probe-sized slice (60 docs <= the
    // dispatch threshold) that still contains a cross-pair member
    val probe = docs.filter(col("doc_id") >= 320 && col("doc_id") < 380)
    val expProbe = expected.filter(p => p._2 >= 320 && p._2 < 380)
    assert(expProbe.nonEmpty, "probe window misses every cross pair")
    val small = DedupIndex.pairsAgainstCollect(spark, f, probe)
    assert(triples(small) == expProbe,
      "point-lookup probe must return the same cross pairs")
    // the dispatcher picks the point-lookup form under the threshold
    assert(rows(DedupIndex.pairsAgainst(spark, f, probe)) == rows(small))
    // corpus independence: the only document scans in a probe plan
    // are the BATCH's own (they carry the batch's id pushdown); the
    // archive is served purely from the index tables
    val plan = DedupIndex.pairsAgainstJoin(spark, f, delta)
      .queryExecution.executedPlan.toString
    plan.split("\n").filter(l => l.contains("Scan parquet")
        || l.contains("FileScan parquet")).foreach { l =>
      assert(l.contains("GreaterThanOrEqual(doc_id"),
        s"probe plan scans the archive, not just the batch:\n$l")
    }
  }

  test("versionAsOf serves the pre-append index") {
    // cut at 350 so the BASE itself holds pairs — (166,323) and
    // (285,301) — making the time-travel compare non-vacuous
    val idx = GraftTmp.dir("dedup_idx_ver")
    DedupIndex.build(spark, idx, docs.filter(col("doc_id") < 350))
    val pre = rows(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx)))
    assert(pre.nonEmpty, "base index has no pairs — gate is vacuous")
    DedupIndex.append(spark, idx, docs.filter(col("doc_id") >= 350))
    val v1 = rows(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx, versionAsOf = Some(1))))
    assert(v1 == pre,
      "time travel must serve the pre-append index bit-for-bit")
    val live = rows(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx)))
    assert(live != pre, "append visibly changed nothing — bad fixture")
  }

  test("ingest dedups against history, then within the batch, then indexes survivors") {
    val idx = GraftTmp.dir("dedup_idx_ingest")
    DedupIndex.build(spark, idx, base)
    val rep = DedupIndex.ingest(spark, idx, delta, threshold = 0.8)
    // every report frame below is evaluated AFTER the append landed —
    // the version pin must keep them on the pre-ingest index
    val histDrop = triples(rep.droppedAgainstHistory).sorted
    assert(histDrop ==
        oneShot.filter(p => p._1 < cut && p._2 >= cut).sorted,
      "history drops must be exactly the cross pairs at the threshold")
    val edges = triples(rep.withinBatchEdges).sorted
    assert(edges == oneShot.filter(p => p._1 >= cut).sorted,
      "within-batch evidence must be the delta-internal pairs")
    val keptIds = rep.kept.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // dropped: the history-dup batch members and each delta-internal
    // cluster's non-minimum member
    val expectDropped = Set(323L, 387L, 450L, 413L, 301L, 462L)
    assert(keptIds == (250L until 500L).toSet -- expectDropped,
      s"kept set wrong: ${keptIds.size} ids")
    // greedy post-condition: the indexed corpus has no pair at the
    // threshold beyond what build() already contained (here: none)
    val post = DedupIndex.selfPairs(spark,
        DedupIndex.loadFrames(spark, idx))
      .filter(col("est_jac") >= 0.8)
    assert(post.isEmpty, "post-ingest index still has near-dup pairs")
    // the index grew by exactly the kept docs
    assert(DedupIndex.loadFrames(spark, idx).sketches
      .select(col("doc_id")).distinct().count() == 250 + keptIds.size)
    // ingesting into a never-built directory fails loudly
    val e = intercept[IllegalArgumentException] {
      DedupIndex.ingest(spark, GraftTmp.dir("dedup_idx_nobuild"), delta)
    }
    assert(e.getMessage.contains("build"), s"$e")
  }

  test("sf0.1 scale gate: incremental build at 10x still matches the query") {
    // the AnnIndexSpec convention: the same fidelity invariant at
    // 5 000 documents, with the build split into two appends — the
    // denser corpus exercises hot buckets and multi-file clustering
    val idx = GraftTmp.dir("dedup_idx_sf01")
    val all = Tables.documents(spark, TestSpark.sf01)
    DedupIndex.build(spark, idx, all.filter(col("doc_id") < 2500))
    DedupIndex.append(spark, idx, all.filter(col("doc_id") >= 2500))
    val got = triples(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx)))
    val oneShot01 = triples(
      SparkEntry.queries("q_dedup_minhash_lsh")(spark, TestSpark.sf01))
    assert(got.size == oneShot01.size && got == oneShot01,
      s"sf0.1 incremental index diverged: ${got.size} vs " +
        s"${oneShot01.size} pairs")
    assert(oneShot01.nonEmpty)
  }

  test("expire retires versions in lockstep after appends") {
    // clean directory: generation numbers must be deterministic here
    // (GraftTmp paths persist across local re-runs)
    val idx = GraftTmp.dir("dedup_idx_expire")
    val p = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    DedupIndex.build(spark, idx, base)
    DedupIndex.append(spark, idx, delta)
    val live = rows(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx)))
    assert(DedupIndex.expire(spark, idx, keepLast = 1) == Seq(1),
      "expire must report the one retired generation")
    assert(rows(DedupIndex.selfPairs(spark,
      DedupIndex.loadFrames(spark, idx))) == live,
      "live serving must be untouched by retention")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.selfPairs(spark,
        DedupIndex.loadFrames(spark, idx, versionAsOf = Some(1))).collect()
    }
    assert(e.getMessage.contains("generation"), s"$e")
  }

  test("append refuses collisions, duplicates, and empty batches") {
    val idx = GraftTmp.dir("dedup_idx_guards")
    DedupIndex.build(spark, idx, base)
    val clash = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, idx, docs.filter(col("doc_id") < 5))
    }
    assert(clash.getMessage.contains("collides"), s"$clash")
    val dup = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, idx,
        delta.limit(4).withColumn("doc_id", col("doc_id") % 2 + 10000L))
    }
    assert(dup.getMessage.contains("repeats"), s"$dup")
    val empty = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, idx, docs.filter(col("doc_id") < 0))
    }
    assert(empty.getMessage.contains("no usable"), s"$empty")
    // a one-word document is not usable either
    val tiny = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, idx, spark.createDataFrame(Seq(
        (90000L, "en", "word"))).toDF("doc_id", "lang", "text"))
    }
    assert(tiny.getMessage.contains("no usable"), s"$tiny")
    // a foreign-geometry index is never served or appended
    val f = DedupIndex.loadFrames(spark, idx)
    import spark.implicits._
    val foreign = f.copy(meta = Seq(("nbands", 16L), ("rowsperband", 8L),
      ("nperm", 128L)).toDF("key", "value"))
    val geom = intercept[IllegalArgumentException] {
      DedupIndex.selfPairs(spark, foreign)
    }
    assert(geom.getMessage.contains("geometry"), s"$geom")
  }
}
