package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE apply/encode contract (the encode half of q_text_bpe_train —
  * gate-verified surface, not a contract query key):
  *
  *  1. hand-tokenized golden fixture — the classic low/lower/lowest
  *     corpus: learned merges AND the encoded token sequences match
  *     values derived by hand from the BPE rule;
  *  2. apply∘train determinism — training twice yields the same
  *     merges, encoding twice the same tokens;
  *  3. train parity — Bpe.train equals the frozen q_text_bpe_train
  *     query's merge rows on the real corpus;
  *  4. conservation + packing wire-up — token concatenation restores
  *     every word, and packWithBpe (where q_pack_sequences would
  *     consume the exact counts) fills windows consistently.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** tiny corpus as a one-table parquet dir shaped like `documents` */
  private lazy val goldenDir: String = {
    import spark.implicits._
    val dir = GraftTmp.dir("bpe_golden")
    Seq(
      (1L, "en", "web", 10L, "low low low lower lower lowest"),
      (2L, "en", "web", 10L, "low slow slowest"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("golden fixture: merges and encodings match the hand derivation") {
    // word weights: low x4, lower x2, lowest x1, slow x1, slowest x1
    // pair counts r1: l|o 4+2+1+1+1=9, o|w 9, w|e 2+1+1(west in slowest? no:
    //   lower -> w|e, lowest -> w|e, slowest -> w|e) = 4 ... the
    // leading tie l|o vs o|w (both 9) breaks LEXICALLY: 'l|o' < 'o|w'.
    // r1 = (l,o) -> lo: low=<lo><w>, lower=<lo><w><e><r>, ...
    // r2 pairs: lo|w = 9 again (every word), wins.
    // r2 = (lo,w) -> low: low=<low>, lower=<low><e><r>,
    //   lowest=<low><e><s><t>, slow=<s><low>, slowest=<s><low><e><s><t>
    // r3 pairs: low|e = 2+1+1 = 4, e|r = 2, e|s = 1+1 = 2, s|t = 2,
    //   s|low = 2 -> (low,e) wins at 4.
    val merges = Bpe.train(spark, goldenDir, 3)
    assert(merges.map(m => (m.a, m.b, m.nPair)) ==
      Seq(("l", "o", 9L), ("lo", "w", 9L), ("low", "e", 4L)),
      s"learned merges diverge from the hand derivation: $merges")
    val toks = Bpe.tokenize(spark, goldenDir, merges)
      .orderBy(col("doc_id"))
      .collect().map(_.getSeq[String](2).toList).toList
    assert(toks == List(
      List("low", "low", "low", "lowe", "r", "lowe", "r",
        "lowe", "s", "t"),
      List("low", "s", "low", "s", "lowe", "s", "t")),
      s"encoded tokens diverge from the hand derivation: $toks")
  }

  test("training past the mergeable horizon fails loudly, not with an NPE") {
    import spark.implicits._
    val dir = GraftTmp.dir("bpe_short")
    // single-char words only: round 1 has no adjacent pair to merge
    Seq((1L, "en", "web", 5L, "a b c a b"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Bpe.train(spark, dir, 1))
    assert(e.getMessage.contains("no adjacent symbol pair"))
  }

  test("apply-of-train is deterministic") {
    val m1 = Bpe.train(spark, goldenDir, 3)
    val m2 = Bpe.train(spark, goldenDir, 3)
    assert(m1 == m2, "training twice must learn the same merges")
    val t1 = Bpe.tokenize(spark, goldenDir, m1).orderBy(col("doc_id"))
      .collect().map(_.toString).toList
    val t2 = Bpe.tokenize(spark, goldenDir, m1).orderBy(col("doc_id"))
      .collect().map(_.toString).toList
    assert(t1 == t2, "encoding twice must yield the same tokens")
  }

  test("train parity with the frozen q_text_bpe_train query at sf0.001") {
    val fromQuery = SparkEntry.queries("q_text_bpe_train")(
      spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0).toInt, r.getString(1),
        r.getString(2), r.getLong(3))).toList
    val fromOp = Bpe.train(spark, TestSpark.sf0001, 3)
      .map(m => (m.round, m.a, m.b, m.nPair)).toList
    assert(fromOp == fromQuery,
      s"operator merges $fromOp != query merges $fromQuery")
  }

  test("ranked encode hash-equals the replace chain at small counts") {
    val merges = Bpe.train(spark, goldenDir, 3)
    val chain = Bpe.tokenize(spark, goldenDir, merges)
      .orderBy(col("doc_id")).collect().map(_.toString).toList
    val ranked = Bpe.tokenizeRanked(spark, goldenDir, merges)
      .orderBy(col("doc_id")).collect().map(_.toString).toList
    assert(ranked == chain,
      "rank-table encode diverges from the replace chain on the golden " +
        s"fixture:\n$ranked\nvs\n$chain")
    // and on the real corpus
    val c2 = Bpe.tokenize(spark, TestSpark.sf0001,
      Bpe.train(spark, TestSpark.sf0001, 3))
      .orderBy(col("doc_id")).collect().map(_.toString).toList
    val r2 = Bpe.tokenizeRanked(spark, TestSpark.sf0001,
      Bpe.train(spark, TestSpark.sf0001, 3))
      .orderBy(col("doc_id")).collect().map(_.toString).toList
    assert(r2 == c2, "rank-table encode diverges at sf0.001")
  }

  /** Independent reference for the big-vocabulary gate: the training
    * query's own delimited-string replace chain, run DRIVER-SIDE with
    * plain java.lang.String.replace (left-to-right, non-overlapping —
    * the same semantics as Spark's replace builtin), one merge per
    * fold in training order. A completely separate code path from
    * encodeWord's min-rank loop. */
  private def chainReference(word: String,
      merges: Seq[Bpe.Merge]): List[String] = {
    val sy0 = word.toLowerCase.map(c => s"<$c>").mkString
    val folded = merges.foldLeft(sy0)((sy, m) =>
      sy.replace(s"<${m.a}><${m.b}>", s"<${m.a}${m.b}>"))
    "<([^>]*)>".r.findAllMatchIn(folded).map(_.group(1)).toList
  }

  test("ranked encode scales to 1000 merges with an O(1) plan") {
    import spark.implicits._
    // fabricate a 1000-merge vocabulary the way a real tokenizer's
    // looks (each merge extends a learned prefix by one symbol):
    // merge k fuses (base[0,k), base[k]) -> base[0,k+1). Training
    // 1000 Spark rounds would take hours; the ENCODE semantics only
    // require that no merge's inputs are minted by a later merge,
    // which this list satisfies (merge k's left side is minted by
    // merge k-1, its right side is an original char). The base opens
    // with "qz" and 'q' never recurs, so every prefix ≥ 2 chars is
    // ANCHORED — no merge pattern can fire at a spurious position and
    // break the chain (a naive cycled base stalls at depth 36: the
    // rank-1..35 merges fuse EVERY cycle, leaving no bare char for
    // rank 36's pattern) — all 1000 ranks genuinely fire on base.
    val alpha = "abcdefghijklmnoprstuvwxyz0123456789" // 35 chars, no 'q'
    val base = "qz" + (0 until 999).map(i => alpha(i % 35)).mkString
    val merges = (1 to 1000).map(k =>
      Bpe.Merge(k, base.substring(0, k), base.substring(k, k + 1), 1L))
    val dir = GraftTmp.dir("bpe_big")
    // the full base word (collapses to ONE 1001-char token), a prefix
    // (fires 499 ranks), a doubled base (every pattern fires twice),
    // repeating and vocabulary-free words
    val corpus = Seq(base, base.substring(0, 500), base + base,
      "abcabc", "zz9", "qz")
    corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, "en", "web", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Bpe.tokenizeRanked(spark, dir, merges)
      .orderBy(col("doc_id")).collect()
      .map(_.getSeq[String](2).toList).toList
    val want = corpus.map(chainReference(_, merges)).toList
    assert(got == want,
      "1000-merge rank-table encode diverges from the driver-side " +
        "replace-chain reference")
    // the deep merges really fired: the base word is ONE token, the
    // doubled base exactly two (every rank matched twice), the
    // half-prefix stops at rank 499's output
    assert(got.head == List(base))
    assert(got(2) == List(base, base))
    assert(got(1).head == base.substring(0, 500))
    // plan size is O(1) in the vocabulary: the 1000-merge plan is the
    // 3-merge plan (the table rides the broadcast, not the tree), and
    // no replace chain appears anywhere
    def planOf(ms: Seq[Bpe.Merge]) = Bpe.tokenizeRanked(spark, dir, ms)
      .queryExecution.optimizedPlan.toString
    val p3 = planOf(merges.take(3)); val p1000 = planOf(merges)
    assert(!p1000.contains("replace("), "replace chain leaked into plan")
    assert(p3.length == p1000.length,
      s"plan grew with the vocabulary: ${p3.length} -> ${p1000.length}")
  }

  test("tokens conserve the text and drive the packing wire-up") {
    val merges = Bpe.train(spark, TestSpark.sf0001, 3)
    // conservation: concatenating a doc's BPE tokens restores exactly
    // its lowercased [a-z0-9]+ word stream — encode never drops,
    // duplicates, or reorders a character
    val bad = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
      .join(Bpe.tokenize(spark, TestSpark.sf0001, merges)
        .select(col("doc_id"), col("bpe_tokens")), "doc_id")
      .withColumn("joined", concat_ws("", col("bpe_tokens")))
      .withColumn("expected", concat_ws("", expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))
      .filter(col("joined") =!= col("expected"))
      .count()
    assert(bad == 0L, s"$bad docs fail BPE token conservation")
    // packing on exact BPE counts: window accounting must conserve
    // tokens and assign every doc to exactly one pack
    val packs = Bpe.packWithBpe(spark, TestSpark.sf0001, merges)
    val total = packs.agg(sum(col("tokens")), sum(col("n_docs")))
      .collect()(0)
    val direct = Bpe.tokenize(spark, TestSpark.sf0001, merges)
      .agg(sum(col("n_bpe_tok")), count(lit(1))).collect()(0)
    assert(total.getLong(0) == direct.getLong(0),
      "packing lost or invented tokens")
    assert(total.getLong(1) == direct.getLong(1),
      "packing lost or duplicated docs")
  }
}
