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
  * Scale shape: encoding is a PURE NARROW MAP — the merge list is
  * vocabulary-sized driver metadata folded into one codegen'd column
  * expression (a replace chain), so tokenization shuffles nothing and
  * broadcasts nothing; at 100 TB it rides the document scan. The
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
      .localCheckpoint()
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
      if (r < rounds) cur = cur.localCheckpoint()
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
