package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE APPLY — the encode half q_text_bpe_train lacks: that query
  * LEARNS merges (and stays frozen, oracle-gated), but nothing in the
  * engine tokenized WITH them; token counting everywhere else is
  * whitespace/regex. Real packing and token-budget accounting run on
  * the trained tokenizer's ids, so this operator closes the loop:
  * train -> encode -> exact token counts -> packing.
  *
  * Representation is the training query's own, engine-portable one: a
  * word becomes a both-side-delimited symbol string ('<h><e><l><l><o>')
  * and ONE merge (a,b)->ab is `replace(sy, '<a><b>', '<ab>')`, whose
  * left-to-right non-overlapping semantics equal BPE's leftmost-first
  * rule for a single merge. Applying the learned merges IN TRAINING
  * ORDER is exactly how BPE inference tokenizes (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: encoding is a PURE NARROW MAP in both forms — the
  * merge list is driver metadata folded into one codegen'd replace
  * chain ([[encodeExpr]], right for toy vocabularies) or broadcast as
  * a rank table consulted by one UDF ([[tokenizeRanked]], the
  * production form: plan size O(1) in the vocabulary, which a 32k
  * merge list requires) — so tokenization shuffles nothing either
  * way; at 100 TB it rides the document scan. The
  * packing consumer (packWithBpe) is q_pack_sequences' cumulative
  * layout with the whitespace token count swapped for the BPE count —
  * the wire-up that query's contract freeze keeps out of the graded
  * key set (BpeSpec gates it instead).
  */
object Bpe {

  /** Learned merges in training order, with their pair counts. */
  final case class Merge(round: Int, a: String, b: String, nPair: Long)

  /** Train `rounds` BPE merges on the documents table — the SAME loop
    * as q_text_bpe_train (one vocabulary collapse, then per round one
    * pair-explode + hash agg with only the winning pair row touching
    * the driver), returned as driver metadata for [[encodeExpr]]. */
  def train(s: SparkSession, d: String, rounds: Int): Seq[Merge] = {
    var cur = graft.Tables.documents(s, d)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("w"))
      .withColumn("sy", expr("regexp_replace(t, '(.)', '<$1>')"))
      .select(col("sy"), col("w"))
      // r16 (guide §1.2): LAZY — round 1's collect materializes it
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = cur
        .withColumn("syms", expr("regexp_extract_all(sy, '<([^>]*)>', 1)"))
        .filter(size(col("syms")) >= 2)
        .select(col("w"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            | i -> concat(element_at(syms, i), '|',
            |             element_at(syms, i + 1)))""".stripMargin)).as("p"))
        .groupBy(col("p")).agg(sum(col("w")).as("cnt"))
        .orderBy(col("cnt").desc, col("p"))
        .limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          s"BPE training round $r found no adjacent symbol pair — the " +
            "corpus has no multi-character words left to merge; ask for " +
            "fewer rounds"))
      val Array(a, b) = top.getString(0).split("\\|", -1)
      merges += Merge(r, a, b, top.getLong(1))
      cur = cur.withColumn("sy", expr(s"replace(sy, '<$a><$b>', '<$a$b>')"))
      if (r < rounds) cur = cur.localCheckpoint(eager = false)
    }
    merges.result()
  }

  /** Column expression tokenizing ONE word column with the merge list:
    * delimit every char, fold the merges in training order (each is
    * the training query's own `replace(sy, '<a><b>', '<ab>')`), read
    * the symbols back. Codegen'd builtins only — no UDF, no shuffle. */
  def encodeExpr(word: Column, merges: Seq[Merge]): Column = {
    val sy0 = regexp_replace(lower(word), "(.)", "<$1>")
    val chained = merges.foldLeft(sy0) { (sy, m) =>
      call_function("replace", sy,
        lit(s"<${m.a}><${m.b}>"), lit(s"<${m.a}${m.b}>"))
    }
    regexp_extract_all(chained, lit("<([^>]*)>"), lit(1))
  }

  /** Merge-rank table for [[encodeWord]]: pair key "a|b" -> rank
    * (training order). '|' cannot occur inside a symbol — symbols are
    * substrings of lowercased [a-z0-9]+ words — so the key is
    * unambiguous, and it is the SAME key the training loop groups on. */
  def rankTable(merges: Seq[Merge]): Map[String, Int] =
    merges.map(m => s"${m.a}|${m.b}" -> m.round).toMap

  /** Encode ONE word against the rank table: repeatedly merge every
    * leftmost-first occurrence of the lowest-rank adjacent pair until
    * no pair is in the table.
    *
    * This equals applying the merges once each in training order (the
    * [[encodeExpr]] replace chain): a merge only FUSES two adjacent
    * symbols, so existing adjacencies are destroyed, never created —
    * for pair (a_j, b_j) to newly appear after a later merge i > j,
    * one of its symbols would have to be the symbol merge i minted,
    * which is impossible because merge j was learned over symbols
    * that existed before merge i ran. Hence rank order == the order
    * the chain would fire anyway, but the cost is O(len²) per word
    * and O(1) in the vocabulary — where the chain is O(V) PLAN SIZE,
    * and a 32k-merge vocabulary cannot analyze or codegen a 32k-deep
    * expression tree (the engine's r1 method-size negative result). */
  def encodeWord(word: String, ranks: Map[String, Int]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse(syms(i) + "|" + syms(i + 1), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // fuse every leftmost-first non-overlapping occurrence — the
        // exact semantics of one `replace(sy, '<a><b>', '<ab>')`
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.getOrElse(syms(j) + "|" + syms(j + 1), Int.MaxValue)
                == best) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(syms)
  }

  /** Production-scale [[tokenize]]: identical output, but the merge
    * list rides ONE broadcast rank table consulted by a single UDF —
    * plan node count O(1) in the vocabulary (the replace chain grows
    * linearly and dies around method-size limits long before a real
    * 32k-merge tokenizer), one table copy per executor instead of a
    * V-deep expression tree per task. Still a pure narrow map: zero
    * shuffle, rides the document scan at 100 TB. */
  def tokenizeRanked(s: SparkSession, d: String,
      merges: Seq[Merge]): DataFrame = {
    val bc = s.sparkContext.broadcast(rankTable(merges))
    val tok = udf((words: Seq[String]) =>
      words.flatMap(w => encodeWord(w, bc.value)))
    graft.Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        tok(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("bpe_tokens"))
      .withColumn("n_bpe_tok", size(col("bpe_tokens")).cast("long"))
  }

  /** Tokenize the documents table: per doc the BPE token array over
    * its [a-z0-9]+ words (in order) and the exact token count. */
  def tokenize(s: SparkSession, d: String, merges: Seq[Merge]): DataFrame = {
    val words = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    graft.Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        flatten(transform(words,
          w => encodeExpr(w, merges))).as("bpe_tokens"))
      .withColumn("n_bpe_tok", size(col("bpe_tokens")).cast("long"))
  }

  /** q_pack_sequences' deterministic cumulative packing, driven by the
    * EXACT BPE token counts instead of the whitespace count — where
    * that (frozen, oracle-gated) query would consume this operator. */
  def packWithBpe(s: SparkSession, d: String, merges: Seq[Merge],
      window: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenize(s, d, merges)
      .select(col("doc_id"), col("lang"), col("n_bpe_tok").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div $window"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"),
        round(sum(col("n_tok")).cast("double") / window, 4).as("fill"))
      .orderBy(col("lang"), col("pack_id"))
  }
}
