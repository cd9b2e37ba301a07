package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data pipeline operators beyond the dedup/similarity core
  * (task brief: "the operations a large-scale training-data pipeline
  * would need"): corpus rebalancing by stratified deterministic
  * sampling, Gopher-style repetition filtering, and TF-IDF salient
  * terms. All three shuffle on bounded keys (lang / token / doc_id),
  * never doc x doc, and every score is exact integer-ratio arithmetic
  * so the DuckDB oracle hash-matches bit-for-bit.
  */
object Pipeline extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // Corpus rebalancing: downsample every language to the smallest
      // language's document count using a deterministic content-free
      // hash gate (no RNG — rerunning the pipeline, or running it on
      // another engine, keeps the same documents). The per-lang rates
      // are a 5-row aggregate broadcast back onto the corpus, so the
      // only full-data pass is a hash + integer compare per row: at
      // 100 TB this is a map-only filter after a metadata-sized agg.
      // Keep iff u * n_lang < 65536 * n_min, where u is the first 16
      // md5 bits of doc_id — pure BIGINT math, expectation n_min kept
      // per language.
      "q_sample_stratified",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // counts feeds the target agg AND the gate join — lazy-
        // checkpoint the 5-row frame so the corpus count agg runs once
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
          .localCheckpoint(eager = false)
        val target = counts.agg(min(col("n_lang")).as("n_min"))
        val gated = docs
          .join(broadcast(counts), Seq("lang"))
          .crossJoin(broadcast(target))
          .withColumn("u", HashGate.u16("doc_id"))
          .withColumn("keep", col("u") * col("n_lang") < lit(65536L) * col("n_min"))
        gated.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            round(sum(when(col("keep"), 1L).otherwise(0L)).cast(DoubleType)
              / count(lit(1)), 4).as("kept_rate"))
          .orderBy(col("lang"))
      },
      Some("""WITH counts AS MATERIALIZED (SELECT lang, COUNT(*)::BIGINT AS n_lang
        |                FROM documents GROUP BY lang),
        |target AS (SELECT MIN(n_lang)::BIGINT AS n_min FROM counts),
        |gated AS (SELECT d.lang,
        |            (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 4))::BIGINT
        |               * c.n_lang < 65536 * t.n_min) AS keep
        |          FROM documents d
        |          JOIN counts c USING (lang) CROSS JOIN target t)
        |SELECT lang, COUNT(*)::BIGINT AS n_total,
        |  SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
        |    AS kept_rate
        |FROM gated GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      // PPS (probability-proportional-to-size) sampling (added r6):
      // sample ~20 documents per language with inclusion probability
      // proportional to the document's byte weight — the
      // byte-budgeted cousin of q_sample_stratified, used when the
      // training mix is specified in tokens/bytes rather than docs
      // (big docs must not be undersampled per byte). Poisson-PPS
      // gate: keep iff u * S < 65536 * k * w, where u is the first 16
      // md5 bits of doc_id, w = n_chars, S = per-lang weight total —
      // P(keep) = min(1, k*w/S). Both products run in DECIMAL(38,0)
      // (Spark) / HUGEINT (DuckDB): u ≤ 2^16, so u*S overflows BIGINT
      // once a language's char total passes 2^46 ≈ 70 TB — exactly the
      // target scale. 128-bit integer compare is exact on both
      // engines, so the gate stays engine-independent.
      // Deterministic, content-free, engine-independent; the per-lang
      // totals are a metadata-sized broadcast and the gate itself is a
      // map-only pass — no shuffle touches the corpus rows.
      "q_sample_pps",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("u", HashGate.u16("doc_id"))
        val tot = docs.groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("s_w"), count(lit(1)).as("n_docs"))
        docs.join(broadcast(tot), Seq("lang"))
          .withColumn("keep",
            col("u").cast("decimal(38,0)") * col("s_w")
              < lit(65536L) * lit(20L) * col("n_chars").cast("decimal(38,0)"))
          .groupBy(col("lang"))
          .agg(max(col("n_docs")).as("n_docs"),
            max(col("s_w")).as("w_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_chars")).otherwise(0L))
              .as("w_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH d AS MATERIALIZED (SELECT lang, n_chars,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS u
        |       FROM documents),
        |t AS (SELECT lang, SUM(n_chars)::BIGINT AS s_w,
        |        COUNT(*)::BIGINT AS n_docs
        |      FROM d GROUP BY 1)
        |SELECT d.lang, MAX(t.n_docs)::BIGINT AS n_docs,
        |  MAX(t.s_w)::BIGINT AS w_total,
        |  SUM(CASE WHEN d.u::HUGEINT * t.s_w < 65536::HUGEINT * 20 * d.n_chars
        |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  SUM(CASE WHEN d.u::HUGEINT * t.s_w < 65536::HUGEINT * 20 * d.n_chars
        |      THEN d.n_chars ELSE 0 END)::BIGINT AS w_kept
        |FROM d JOIN t USING (lang) GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      // Gopher-style repetition quality filter: flag documents whose
      // most frequent word exceeds 10% of tokens, or whose duplicate
      // word-bigram fraction exceeds 20%. Both signals shuffle on
      // (doc_id, gram) — the inverted-index shape — and reduce to one
      // row per doc before the per-lang rollup; fractions are exact
      // BIGINT ratios so the flags are engine-independent.
      "q_text_repetition",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("tok"))
        val topw = tok.groupBy(col("doc_id"), col("lang"), col("tok"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(max(col("n")).as("max_tok"), sum(col("n")).as("n_tok"))
        val big = docs
          .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))
            .as("bg"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("bg")).as("n_dist_bg"),
            count(lit(1)).as("n_bg"))
        topw.join(big, Seq("doc_id"), "left")
          .withColumn("top_frac",
            col("max_tok").cast(DoubleType) / col("n_tok"))
          .withColumn("dup_bg_frac",
            coalesce((col("n_bg") - col("n_dist_bg")).cast(DoubleType)
              / col("n_bg"), lit(0.0)))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("top_frac") > 0.1, 1L).otherwise(0L))
              .as("n_flag_top"),
            sum(when(col("dup_bg_frac") > 0.2, 1L).otherwise(0L))
              .as("n_flag_dup"),
            round(max(col("top_frac")), 4).as("max_top_frac"),
            round(max(col("dup_bg_frac")), 4).as("max_dup_frac"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (SELECT doc_id, lang,
        |         unnest(string_split(lower(text), ' ')) AS tok
        |       FROM documents),
        |topw AS (SELECT doc_id, lang, MAX(n)::BIGINT AS max_tok,
        |           SUM(n)::BIGINT AS n_tok
        |         FROM (SELECT doc_id, lang, tok, COUNT(*) AS n
        |               FROM tok GROUP BY 1, 2, 3)
        |         GROUP BY 1, 2),
        |big AS (SELECT doc_id,
        |          COUNT(DISTINCT bg)::BIGINT AS n_dist_bg,
        |          COUNT(*)::BIGINT AS n_bg
        |        FROM (SELECT doc_id,
        |                unnest(list_transform(range(1, len(w)),
        |                  i -> w[i] || ' ' || w[i+1])) AS bg
        |              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |                    FROM documents)
        |              WHERE len(w) >= 2)
        |        GROUP BY doc_id),
        |j AS (SELECT t.lang,
        |        t.max_tok::DOUBLE / t.n_tok AS top_frac,
        |        COALESCE((b.n_bg - b.n_dist_bg)::DOUBLE / b.n_bg, 0.0)
        |          AS dup_bg_frac
        |      FROM topw t LEFT JOIN big b USING (doc_id))
        |SELECT lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(CASE WHEN top_frac > 0.1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_flag_top,
        |  SUM(CASE WHEN dup_bg_frac > 0.2 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_flag_dup,
        |  ROUND(MAX(top_frac), 4) AS max_top_frac,
        |  ROUND(MAX(dup_bg_frac), 4) AS max_dup_frac
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      // Boilerplate/stopword detection (added r4): tokens whose
      // document frequency within a language reaches 50% of that
      // language's docs are boilerplate candidates — the df test is an
      // exact integer compare (2*df >= n_docs), and the reported
      // coverage (share of ALL token occurrences that boilerplate
      // tokens account for) is one BIGINT ratio per lang. Shuffles on
      // (lang, token) — vocabulary-keyed, the same inverted-index
      // shape as the tf-idf op, never doc x doc; the per-lang doc
      // counts are a 5-row broadcast.
      "q_text_boilerplate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("tok"))
        val nDocs = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val vocab = tok.groupBy(col("lang"), col("tok"))
          .agg(countDistinct(col("doc_id")).as("df"),
            count(lit(1)).as("occ"))
          .join(broadcast(nDocs), Seq("lang"))
          .withColumn("boiler", col("df") * 2 >= col("n_docs"))
        vocab.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_vocab"),
            sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
            round(sum(when(col("boiler"), col("occ")).otherwise(0L))
              .cast(DoubleType) / sum(col("occ")), 4).as("coverage"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (SELECT doc_id, lang,
        |         unnest(string_split(lower(text), ' ')) AS tok
        |       FROM documents),
        |nd AS (SELECT lang, COUNT(*)::BIGINT AS n_docs
        |       FROM documents GROUP BY lang),
        |vocab AS (SELECT t.lang, t.tok,
        |            COUNT(DISTINCT t.doc_id)::BIGINT AS df,
        |            COUNT(*)::BIGINT AS occ,
        |            ANY_VALUE(nd.n_docs) AS n_docs
        |          FROM tok t JOIN nd USING (lang)
        |          GROUP BY t.lang, t.tok)
        |SELECT lang, COUNT(*)::BIGINT AS n_vocab,
        |  SUM(CASE WHEN df * 2 >= n_docs THEN 1 ELSE 0 END)::BIGINT
        |    AS n_boiler,
        |  ROUND(SUM(CASE WHEN df * 2 >= n_docs THEN occ ELSE 0 END)::DOUBLE
        |    / SUM(occ), 4) AS coverage
        |FROM vocab GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      // Salient terms per language: tf = term count within the lang
      // slice, df = corpus-wide document frequency, score = tf * N / df
      // (the unsmoothed multiplicative idf variant — chosen over
      // tf*ln(N/df) because tf*N and df are exact BIGINTs, so the one
      // double division is bit-identical on both engines and the
      // ranking cannot drift on a libm ulp). Shuffles on (lang, token)
      // and token — vocabulary-keyed, never doc x doc; top-10 per lang
      // is a bounded window over the vocab aggregate.
      "q_tfidf_topterms",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("tok"))
        val tf = tok.groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = tok.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(n))
          .withColumn("score",
            (col("tf") * col("n_docs")).cast(DoubleType) / col("df"))
        scored
          .withColumn("r", row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("score").desc, col("tok").asc)))
          .filter(col("r") <= 10)
          .select(col("lang"), col("r"), col("tok"), col("tf"), col("df"),
            round(col("score"), 4).as("score"))
          .orderBy(col("lang"), col("r"))
      },
      // tok/tf/df AS MATERIALIZED: DuckDB inlines per reference, and
      // tok (the full-corpus unnest) is referenced from tf, df and the
      // scoring join — one tokenize, not three (the q_graph_pagerank
      // CTE-inlining lesson applied to the linear-multiplicity family)
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id, lang,
        |         unnest(string_split(lower(text), ' ')) AS tok
        |       FROM documents),
        |tf AS MATERIALIZED (SELECT lang, tok, COUNT(*)::BIGINT AS tf
        |       FROM tok GROUP BY 1, 2),
        |df AS MATERIALIZED (SELECT tok, COUNT(*)::BIGINT AS df
        |       FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok),
        |n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
        |scored AS (SELECT tf.lang, tf.tok, tf.tf, df.df,
        |             (tf.tf * n.n_docs)::DOUBLE / df.df AS score
        |           FROM tf JOIN df USING (tok) CROSS JOIN n)
        |SELECT lang, r::INTEGER AS r, tok, tf, df, ROUND(score, 4) AS score
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY score DESC, tok ASC) AS r
        |      FROM scored)
        |WHERE r <= 10 ORDER BY lang, r""".stripMargin)),

    QueryDef(
      // BM25 retrieval scoring (added r7): the ranking function behind
      // keyword search / RAG candidate retrieval — top-20 documents for
      // a 3-term probe query, scored sum_t idf(t) * tf*(k1+1) /
      // (tf + k1*(1-b+b*dl/avgdl)) with k1=1.2, b=0.75. Determinism by
      // construction instead of by tolerance: idf uses the
      // multiplicative Robertson form (N-df+0.5)/(df+0.5) — no ln, so
      // no libm ulp — every input is an exact BIGINT and both engines
      // evaluate the IDENTICAL IEEE expression tree; the 3 per-term
      // scores land in separate max-of-one-row columns and sum in
      // fixed left-to-right order, so float association cannot drift
      // the ranking. Shuffles key on (doc_id, tok) / tok — the
      // inverted-index shape, never doc x doc; df and the corpus
      // scalars are broadcast; top-20 is TakeOrdered (no global sort
      // materialized). At 100 TB the tf rows for 3 probe terms are df-
      // bounded — the posting lists, not the corpus.
      "q_text_bm25",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("tok"))
        val probes = Seq("spark", "merge", "window")
        // exactly two corpus tokenization passes: dl (all tokens) and
        // tf (probe-filtered); df and the corpus scalars derive from
        // those aggregates — df = docs holding a tf row, n_tok = Σ dl
        // dl is read by the score join AND the scalar rollup, and its
        // subtree carries the tokenize + groupBy shuffle — materialize
        // once (doc-count-sized, far smaller than the corpus)
        val dl = tok.groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("dl"))
          .localCheckpoint(eager = false)
        val tf = tok.filter(col("tok").isin(probes: _*))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        // n_docs counts DOCUMENTS (the oracle's COUNT(*) FROM
        // documents), not dl rows: a zero-token doc (NULL/empty text)
        // would otherwise shrink Spark's n_docs while the oracle's
        // stands, skewing every idf. Identical on the current fixture;
        // divergence-proof on any other.
        val scalars = dl.agg(sum(col("dl")).as("n_tok"))
          .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        val sterm = tf.join(broadcast(dfc), Seq("tok"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(scalars))
          .withColumn("avgdl",
            col("n_tok").cast(DoubleType) / col("n_docs"))
          .withColumn("sc",
            ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
              * ((col("tf") * lit(2.2))
                / (col("tf") + lit(1.2)
                  * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
        def tfOf(t: String) = coalesce(
          max(when(col("tok") === t, col("tf"))), lit(0L))
        def scOf(t: String) = coalesce(
          max(when(col("tok") === t, col("sc"))), lit(0.0))
        sterm.groupBy(col("doc_id"))
          .agg(first(col("lang")).as("lang"), first(col("dl")).as("dl"),
            tfOf("spark").as("tf_spark"), tfOf("merge").as("tf_merge"),
            tfOf("window").as("tf_window"),
            (scOf("spark") + scOf("merge") + scOf("window")).as("score_raw"))
          .orderBy(col("score_raw").desc, col("doc_id").asc)
          .limit(20)
          .select(col("doc_id"), col("lang"), col("dl"), col("tf_spark"),
            col("tf_merge"), col("tf_window"),
            round(col("score_raw"), 4).as("score"))
      },
      // tok AS MATERIALIZED: referenced by dl/tf/df/gs — one
      // full-corpus tokenize instead of four under DuckDB's
      // per-reference CTE inlining
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id, lang,
        |         unnest(string_split(lower(text), ' ')) AS tok
        |       FROM documents),
        |dl AS MATERIALIZED (SELECT doc_id, lang, COUNT(*)::BIGINT AS dl
        |       FROM tok GROUP BY 1, 2),
        |tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM tok
        |       WHERE tok IN ('spark', 'merge', 'window') GROUP BY 1, 2),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id)::BIGINT AS df FROM tok
        |       WHERE tok IN ('spark', 'merge', 'window') GROUP BY 1),
        |gs AS (SELECT (SELECT COUNT(*)::BIGINT FROM documents) AS n_docs,
        |              (SELECT COUNT(*)::BIGINT FROM tok) AS n_tok),
        |sc AS (SELECT tf.doc_id, tf.tok, tf.tf,
        |         ((gs.n_docs - df.df + 0.5::DOUBLE)
        |            / (df.df + 0.5::DOUBLE))
        |         * ((tf.tf * 2.2::DOUBLE)
        |            / (tf.tf + 1.2::DOUBLE
        |               * (0.25::DOUBLE + 0.75::DOUBLE
        |                  * (dl.dl / (CAST(gs.n_tok AS DOUBLE)
        |                              / gs.n_docs))))) AS sc
        |       FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
        |       CROSS JOIN gs),
        |agg AS (SELECT doc_id,
        |          COALESCE(MAX(CASE WHEN tok = 'spark' THEN tf END), 0)
        |            ::BIGINT AS tf_spark,
        |          COALESCE(MAX(CASE WHEN tok = 'merge' THEN tf END), 0)
        |            ::BIGINT AS tf_merge,
        |          COALESCE(MAX(CASE WHEN tok = 'window' THEN tf END), 0)
        |            ::BIGINT AS tf_window,
        |          COALESCE(MAX(CASE WHEN tok = 'spark' THEN sc END),
        |              0.0::DOUBLE)
        |            + COALESCE(MAX(CASE WHEN tok = 'merge' THEN sc END),
        |              0.0::DOUBLE)
        |            + COALESCE(MAX(CASE WHEN tok = 'window' THEN sc END),
        |              0.0::DOUBLE) AS score_raw
        |        FROM sc GROUP BY doc_id)
        |SELECT a.doc_id, d.lang, d.dl, tf_spark, tf_merge, tf_window,
        |  ROUND(score_raw, 4) AS score
        |FROM agg a JOIN dl d USING (doc_id)
        |ORDER BY score_raw DESC, a.doc_id ASC LIMIT 20""".stripMargin)),

    QueryDef(
      // Bigram-LM quality scoring (added r6): per-document
      // cross-entropy under a per-language add-one-smoothed bigram
      // model fit on the corpus itself — the classic cheap perplexity
      // filter (KenLM-shaped, without the external model) that training
      // pipelines run between the heuristic gates and the expensive
      // classifiers. xent = -avg over the doc's bigrams of
      // ln((c2+1)/(c1+V)): every count is an exact corpus BIGINT and
      // the division is one IEEE op on identical inputs, so the ln-ulp
      // caveat that pushed q_tfidf_topterms / q_text_commonality to
      // integer arithmetic is contained here — ln feeds only a
      // ROUND(x, 4) per-doc OUTPUT (drift ~1e-13, five sig-figs below
      // the rounding step), never a cross-row ranking. Shuffle keys are
      // (lang, w1[, w2]) — vocabulary-bounded, map-side combinable,
      // never doc x doc; the per-lang vocab frame is a broadcast
      // scalar row per language.
      "q_text_perplexity",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            split(lower(col("text")), " ").as("w"))
          .filter(size(col("w")) >= 2)
        val big = docs.select(col("doc_id"), col("lang"),
            explode(expr(
              "transform(sequence(0, size(w) - 2)," +
                " i -> struct(w[i] as w1, w[i + 1] as w2))")).as("b"))
          .select(col("doc_id"), col("lang"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c2 = big.groupBy(col("lang"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("c2"))
        val c1 = big.groupBy(col("lang"), col("w1"))
          .agg(count(lit(1)).as("c1"))
        val vocab = docs
          .select(col("lang"), explode(col("w")).as("tok"))
          .groupBy(col("lang")).agg(countDistinct(col("tok")).as("v"))
        big.join(c2.hint("shuffle_hash"), Seq("lang", "w1", "w2"))
          .join(c1.hint("shuffle_hash"), Seq("lang", "w1"))
          .join(broadcast(vocab), Seq("lang"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_bigrams"),
            round(-avg(log((col("c2") + lit(1)).cast(DoubleType)
              / (col("c1") + col("v")))), 4).as("xent"))
          .orderBy(col("doc_id"))
      },
      // docs/big AS MATERIALIZED: big (the full-corpus bigram unnest)
      // feeds c1, c2 AND the scoring join — one expansion, not three
      Some("""WITH docs AS MATERIALIZED (SELECT doc_id, lang,
        |         string_split(lower(text), ' ') AS w
        |       FROM documents
        |       WHERE len(string_split(lower(text), ' ')) >= 2),
        |big AS MATERIALIZED (SELECT doc_id, lang,
        |          unnest(w[1:len(w) - 1]) AS w1,
        |          unnest(w[2:len(w)]) AS w2
        |        FROM docs),
        |c2 AS (SELECT lang, w1, w2, COUNT(*)::BIGINT AS c2
        |       FROM big GROUP BY 1, 2, 3),
        |c1 AS (SELECT lang, w1, COUNT(*)::BIGINT AS c1
        |       FROM big GROUP BY 1, 2),
        |v AS (SELECT lang, COUNT(DISTINCT tok)::BIGINT AS v
        |      FROM (SELECT lang, unnest(w) AS tok FROM docs)
        |      GROUP BY 1)
        |SELECT b.doc_id, b.lang, COUNT(*)::BIGINT AS n_bigrams,
        |  ROUND(-AVG(LN((c2.c2 + 1.0) / (c1.c1 + v.v))), 4) AS xent
        |FROM big b
        |JOIN c2 ON b.lang = c2.lang AND b.w1 = c2.w1 AND b.w2 = c2.w2
        |JOIN c1 ON b.lang = c1.lang AND b.w1 = c1.w1
        |JOIN v ON b.lang = v.lang
        |GROUP BY 1, 2 ORDER BY b.doc_id""".stripMargin)),

    QueryDef(
      // Temperature-scaled language mixing (added r7): the standard
      // multilingual-LM rebalance — sampling weight q_l ∝ p_l^(1/T)
      // with T = 2, i.e. q_l ∝ sqrt(n_l) (normalizations cancel), so
      // low-resource languages are boosted and high-resource ones
      // damped. sqrt is IEEE-754 correctly rounded in BOTH engines
      // (the reason this query uses T = 2 and not pow(x, 0.3), whose
      // libm results may differ in the last ulp); the only
      // inter-engine drift is summation order across the per-lang
      // rows, bounded to ulps and absorbed by round(6) per §2C.
      // Shape at scale: one metadata-sized agg (rows = languages), an
      // unpartitioned window over that tiny frame, zero corpus
      // re-reads — the expected-doc column is what a downstream
      // PPS-style gate (q_sample_pps) would consume as its target.
      "q_sample_temperature",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy()
        counts
          .withColumn("wgt", sqrt(col("n_docs").cast(DoubleType)))
          .withColumn("p_raw", round(col("n_docs").cast(DoubleType)
            / sum(col("n_docs")).over(w), 6))
          .withColumn("p_temp", round(col("wgt")
            / sum(col("wgt")).over(w), 6))
          // greatest(...) guards a language so rare that p_raw rounds
          // to 0.0: Spark's non-ANSI double division would yield NULL
          // where DuckDB yields inf — one clamped definition on both
          // sides keeps the engines aligned at every distribution
          .withColumn("boost", round(col("p_temp")
            / greatest(col("p_raw"), lit(1e-6)), 4))
          .select(col("lang"), col("n_docs"), col("p_raw"),
            col("p_temp"), col("boost"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n_docs
        |       FROM documents GROUP BY 1)
        |SELECT lang, n_docs,
        |  ROUND(n_docs::DOUBLE / SUM(n_docs) OVER (), 6) AS p_raw,
        |  ROUND(sqrt(n_docs::DOUBLE) / SUM(sqrt(n_docs::DOUBLE)) OVER (), 6)
        |    AS p_temp,
        |  ROUND(ROUND(sqrt(n_docs::DOUBLE)
        |          / SUM(sqrt(n_docs::DOUBLE)) OVER (), 6)
        |        / GREATEST(ROUND(n_docs::DOUBLE / SUM(n_docs) OVER (),
        |                        6), 1e-6), 4)
        |    AS boost
        |FROM c ORDER BY lang""".stripMargin)),

    QueryDef(
      // EXACT-k deterministic sampling (added r7): exactly
      // min(k, n_lang) documents per language, the same set on every
      // rerun and every engine — order statistics on a content-free
      // md5 hash (60 bits so the integer fits BIGINT in both
      // engines), which rate-gates (q_sample_stratified / q_sample_pps)
      // cannot deliver: a rate keeps k only in expectation. The oracle
      // states the semantics as the window rank (rn <= k) — the naive
      // full-sort-per-group plan — while the Spark side runs the
      // functions.BottomK bounded-heap aggregate: O(k) state per
      // group, partial+final, shuffle carries k triples per language,
      // never the corpus. The id-sum over the selected set is the set
      // fingerprint that proves both plans picked identical documents.
      "q_sample_bottomk",
      (s, d) => {
        val h = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            expr(HashGate.h60Sql("cast(doc_id as string)")).as("hh"))
        h.groupBy(col("lang"))
          .agg(graft.functions.BottomK.bottomK(col("hh"), col("doc_id"),
            col("n_chars")).as("bk"))
          .select(col("lang"),
            element_at(col("bk"), 1).as("n_kept"),
            element_at(col("bk"), 2).as("id_sum"),
            element_at(col("bk"), 3).as("w_kept"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH h AS (SELECT lang, doc_id, n_chars,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hh
        |       FROM documents
        |       WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY hh, doc_id) AS rn FROM h)
        |SELECT lang, COUNT(*)::BIGINT AS n_kept,
        |  SUM(doc_id)::BIGINT AS id_sum, SUM(n_chars)::BIGINT AS w_kept
        |FROM r WHERE rn <= ${graft.functions.BottomK.K}
        |GROUP BY 1 ORDER BY lang""".stripMargin)),

    QueryDef(
      // Distribution-drift monitoring via PSI (added r7): the check a
      // pipeline runs when a new data drop arrives — has the value
      // distribution moved? Three population splits of orders are
      // compared on the same o_totalprice histogram (50k-wide buckets):
      // the md5 hash split (expected PSI ~ 0 — the null case), the
      // F-vs-O status split, and urgent-vs-rest priority. ONE scan
      // fans each row into its (comparison, side) memberships (array +
      // explode, map-only); the single corpus shuffle is the
      // (cmp, bucket) count agg — bucket-cardinality keys, map-side
      // combinable. PSI = sum over buckets of (pa-pb)*ln(pa/pb) with
      // Laplace (+1 / +K) smoothing so empty-on-one-side buckets stay
      // finite; every ln argument is an exact ratio of BIGINT products
      // (< 2^53, doubles carry them exactly), so the ln-ulp caveat is
      // contained to the ROUND(psi, 4) output — the q_text_perplexity
      // rule. K = observed buckets per comparison, data-derived on
      // both engines.
      "q_etl_drift_psi",
      (s, d) => {
        val sides = Tables.orders(s, d)
          .select(
            least(floor(col("o_totalprice") / 50000), lit(9))
              .cast(IntegerType).as("bucket"),
            explode(array(
              struct(lit("hash_split").as("cmp"),
                when(HashGate.bucket("o_orderkey", 10) < 8,
                  "A").otherwise("B").as("side")),
              struct(lit("status_F_vs_O").as("cmp"),
                when(col("o_orderstatus") === "F", "A")
                  .when(col("o_orderstatus") === "O", "B").as("side")),
              struct(lit("priority_urgent_vs_rest").as("cmp"),
                when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "A")
                  .otherwise("B").as("side")))).as("m"))
          .select(col("bucket"), col("m.cmp").as("cmp"),
            col("m.side").as("side"))
          .filter(col("side").isNotNull)
        // perBucket feeds the totals agg AND the PSI join — lazy-
        // checkpoint the bucket-cardinality frame so the corpus fan-out
        // agg runs once, not once per consumer
        val perBucket = sides.groupBy(col("cmp"), col("bucket"))
          .agg(count(when(col("side") === "A", 1)).as("ca"),
            count(when(col("side") === "B", 1)).as("cb"))
          .localCheckpoint(eager = false)
        val tot = perBucket.groupBy(col("cmp"))
          .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
            count(lit(1)).as("k"))
        perBucket.join(broadcast(tot), Seq("cmp"))
          .withColumn("pa", (col("ca") + 1).cast(DoubleType)
            / (col("na") + col("k")))
          .withColumn("pb", (col("cb") + 1).cast(DoubleType)
            / (col("nb") + col("k")))
          .groupBy(col("cmp"))
          .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
            first(col("k")).as("n_buckets"),
            round(sum((col("pa") - col("pb"))
              * log(col("pa") / col("pb"))), 4).as("psi"))
          .orderBy(col("cmp"))
      },
      Some("""WITH sides AS (
        |  SELECT LEAST(FLOOR(o_totalprice / 50000), 9)::INTEGER AS bucket,
        |    u.cmp, u.side
        |  FROM orders, LATERAL (VALUES
        |    ('hash_split',
        |     CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 2))
        |            ::INTEGER % 10 < 8 THEN 'A' ELSE 'B' END),
        |    ('status_F_vs_O',
        |     CASE WHEN o_orderstatus = 'F' THEN 'A'
        |          WHEN o_orderstatus = 'O' THEN 'B' END),
        |    ('priority_urgent_vs_rest',
        |     CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |          THEN 'A' ELSE 'B' END)) AS u(cmp, side)
        |  WHERE u.side IS NOT NULL),
        |pb AS (SELECT cmp, bucket,
        |    COUNT(CASE WHEN side = 'A' THEN 1 END)::BIGINT AS ca,
        |    COUNT(CASE WHEN side = 'B' THEN 1 END)::BIGINT AS cb
        |  FROM sides GROUP BY 1, 2),
        |tot AS (SELECT cmp, SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb,
        |    COUNT(*)::BIGINT AS k FROM pb GROUP BY 1)
        |SELECT pb.cmp, ANY_VALUE(na) AS n_a, ANY_VALUE(nb) AS n_b,
        |  ANY_VALUE(k) AS n_buckets,
        |  ROUND(SUM(((ca + 1)::DOUBLE / (na + k)
        |             - (cb + 1)::DOUBLE / (nb + k))
        |    * LN(((ca + 1)::DOUBLE / (na + k))
        |         / ((cb + 1)::DOUBLE / (nb + k)))), 4) AS psi
        |FROM pb JOIN tot USING (cmp)
        |GROUP BY pb.cmp ORDER BY pb.cmp""".stripMargin)),

    QueryDef(
      // Robust outlier detection via median/MAD (added r7): the
      // anomaly gate that mean/stddev can't provide (both are dragged
      // by the very outliers being hunted) — per event_type, flag
      // values beyond 3 MADs from the median. Exact medians on both
      // engines (Spark `percentile`, DuckDB `quantile_cont` — the same
      // lower + (higher-lower)*frac interpolation on the same sorted
      // doubles, so med/MAD are bit-identical and the 3-MAD gate needs
      // no tolerance; subtraction/abs/compare are all single IEEE
      // ops). Three passes over events, each one shuffle keyed on
      // event_type with the 5-row med/MAD frames broadcast back — at
      // 100 TB you'd swap the exact percentile for the KLL sketch
      // (q_agg_kll_reaggregate) and keep this plan shape; this is the
      // exact twin that validates it.
      "q_ts_anomaly_mad",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val mad = ev.join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
            first(col("med")).as("med"))
        ev.join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("value") - col("med"))
              > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outlier"),
            round(first(col("med")), 4).as("med"),
            round(first(col("mad")), 4).as("mad"))
          .orderBy(col("event_type"))
      },
      Some("""WITH med AS (SELECT event_type,
        |         quantile_cont(value, 0.5) AS med
        |       FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type,
        |          quantile_cont(abs(e.value - m.med), 0.5) AS mad,
        |          ANY_VALUE(m.med) AS med
        |        FROM events e JOIN med m USING (event_type)
        |        GROUP BY 1)
        |SELECT e.event_type, COUNT(*)::BIGINT AS n,
        |  SUM(CASE WHEN abs(e.value - m.med) > 3.0::DOUBLE * m.mad
        |           THEN 1 ELSE 0 END)::BIGINT AS n_outlier,
        |  ROUND(ANY_VALUE(m.med), 4) AS med,
        |  ROUND(ANY_VALUE(m.mad), 4) AS mad
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      // Domain-mixture sampling (added r8): apply a TARGET MIXTURE of
      // per-domain sampling weights to the corpus — the DoReMi /
      // Pile-style "web 50%, books 100%, code 25%..." knob every
      // pretraining pipeline turns. Differs from q_sample_stratified
      // (which equalizes to the smallest stratum from observed counts):
      // here the weights are an EXTERNAL config, carried as a tiny
      // literal frame and broadcast onto the corpus, so the whole
      // operator is ONE map-only hash-gate pass over the documents —
      // no corpus aggregate even as a prelude. The gate is the same
      // RNG-free md5 16-bit uniform used by the whole sampling family:
      // keep iff u < w * 65536 — rerunning, resuming, or running on
      // another engine keeps the SAME documents (the property that
      // makes mixtures reproducible across pipeline generations). At
      // 100 TB: broadcast of a 20-row weights table + codegen'd
      // filter; output audits realized vs target mixture in exact
      // integer arithmetic (u-threshold counts, char sums).
      "q_sample_mixture",
      (s, d) => {
        val w = (0 until 20).map { i =>
          (s"src$i", Seq(65536L, 32768L, 16384L, 6554L)(i % 4))
        }
        val weights = s.createDataFrame(w).toDF("source", "w_u16")
        Tables.documents(s, d)
          .withColumn("u", HashGate.u16("doc_id"))
          .join(broadcast(weights), Seq("source"))
          .filter(col("u") < col("w_u16"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            min(col("u")).as("min_u"), max(col("u")).as("max_u"))
          .orderBy(col("source"))
      },
      Some("""WITH w AS (
        |  SELECT 'src' || i::VARCHAR AS source,
        |    CASE i % 4 WHEN 0 THEN 65536 WHEN 1 THEN 32768
        |               WHEN 2 THEN 16384 ELSE 6554 END AS w_u16
        |  FROM range(20) t(i)),
        |docs AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS u
        |  FROM documents)
        |SELECT d.source, COUNT(*)::BIGINT AS n_kept,
        |  SUM(d.n_chars)::BIGINT AS chars_kept,
        |  MIN(d.u) AS min_u, MAX(d.u) AS max_u
        |FROM docs d JOIN w ON d.source = w.source
        |WHERE d.u < w.w_u16
        |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    QueryDef(
      // Deterministic global corpus shuffle (added r8 — the training
      // ORDER op: every epoch of LLM training needs the corpus in a
      // reproducible pseudorandom order, identical across reruns,
      // resumes, and engines; rand() delivers none of that). Order =
      // the total (md5(doc_id), doc_id) sort — content-independent,
      // seedable by salting the hash, and stable by construction. The
      // global position comes from operators/DistributedRank (frozen-
      // literal range buckets + broadcast prefix offsets, PlanSpec-
      // pinned family — NEVER a single-task window sort, which is
      // exactly how naive ROW_NUMBER() OVER (ORDER BY …) dies at
      // 100 TB); positions then
      // pack into 64-doc training batches whose composition the oracle
      // pins exactly (id/char sums per batch — set equality, not just
      // counts). One bucket-id shuffle + metadata-sized offset frame.
      "q_sample_shuffle",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            expr(HashGate.h60Sql("cast(doc_id as string)")).as("h"))
        graft.operators.DistributedRank.withRankCols(docs,
            Seq(col("h"), col("doc_id")), numBuckets = 4)
          .select(expr("(_gr_rank - 1) div 64").as("batch"),
            col("doc_id"), col("n_chars"))
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"),
            sum(col("n_chars")).as("char_sum"))
          .orderBy(col("batch"))
      },
      Some("""SELECT (rn - 1) // 64 AS batch, COUNT(*)::BIGINT AS n_docs,
        | SUM(doc_id)::BIGINT AS id_sum, SUM(n_chars)::BIGINT AS char_sum
        |FROM (SELECT doc_id, n_chars,
        |        ROW_NUMBER() OVER (ORDER BY
        |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
        |          doc_id) AS rn
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      // BPE merge training, 3 rounds (added r8 — the real
      // byte-pair-encoding learning loop behind every modern
      // tokenizer, not the q_text_tokens regex approximation: count
      // adjacent symbol pairs across the corpus, merge the most
      // frequent, repeat). Determinism: ties break on the pair's
      // '<a>|<b>' string (pure ASCII — no collation drift), counts are
      // exact BIGINTs, and merge APPLICATION is `replace` on a
      // both-side-delimited symbol string ('<h><e><l><l><o>'), whose
      // left-to-right non-overlapping semantics are identical in both
      // engines AND equal to BPE's leftmost-first rule for a single
      // merge. Scale shape: the corpus collapses to a (token, weight)
      // frame ONCE (one shuffle on the token key — vocabulary-sized
      // from then on, the standard BPE-training factorization); each
      // round is one pair-explode + hash agg over the vocab and a
      // map-only replace, with only the ONE winning pair row touching
      // the driver (the PageRank-scalar discipline). Oracle unrolls
      // the same 3 rounds.
      "q_text_bpe_train",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("w"))
          .withColumn("sy", expr("regexp_replace(t, '(.)', '<$1>')"))
          .select(col("sy"), col("w"))
          // r16 (guide §1.2): LAZY — round 1's first() materializes it
          .localCheckpoint(eager = false)
        var cur = toks
        val merges = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, String, Long)]
        for (r <- 1 to 3) {
          val top = cur
            .withColumn("syms",
              expr("regexp_extract_all(sy, '<([^>]*)>', 1)"))
            .filter(size(col("syms")) >= 2)
            .select(col("w"), explode(expr(
              """transform(sequence(1, size(syms) - 1),
                | i -> concat(element_at(syms, i), '|',
                |             element_at(syms, i + 1)))""".stripMargin))
              .as("p"))
            .groupBy(col("p")).agg(sum(col("w")).as("cnt"))
            .orderBy(col("cnt").desc, col("p"))
            .first() // ONE metadata row to the driver per round
          val Array(a, b) = top.getString(0).split("\\|", -1)
          merges += ((r.toLong, a, b, top.getLong(1)))
          cur = cur.withColumn("sy",
              expr(s"replace(sy, '<$a><$b>', '<$a$b>')"))
          // the post-merge frame is only read by the NEXT round's pair
          // count — materializing it on the final round is a whole
          // wasted Spark job (merges were already collected)
          if (r < 3) cur = cur.localCheckpoint(eager = false)
        }
        import s.implicits._
        merges.toSeq.toDF("round", "sym_a", "sym_b", "n_pair")
          .orderBy(col("round"))
      },
      Some("""WITH tok0 AS MATERIALIZED (
        |  SELECT regexp_replace(t, '(.)', '<\1>', 'g') AS sy,
        |         COUNT(*)::BIGINT AS w
        |  FROM (SELECT unnest(regexp_extract_all(lower(text),
        |          '[a-z0-9]+')) AS t FROM documents) u
        |  GROUP BY t),
        |p1 AS MATERIALIZED (SELECT string_split(p, '|')[1] AS pa,
        |         string_split(p, '|')[2] AS pb, SUM(w) AS cnt
        |       FROM (SELECT w, unnest(list_transform(range(1, len(a)),
        |               i -> a[i] || '|' || a[i+1])) AS p
        |             FROM (SELECT w, regexp_extract_all(sy,
        |                     '<([^>]*)>', 1) AS a FROM tok0) x
        |             WHERE len(a) >= 2) y
        |       GROUP BY pa, pb ORDER BY cnt DESC, pa || '|' || pb
        |       LIMIT 1),
        |tok1 AS MATERIALIZED (SELECT replace(sy, '<' || p1.pa || '><' || p1.pb || '>',
        |           '<' || p1.pa || p1.pb || '>') AS sy, w
        |         FROM tok0 CROSS JOIN p1),
        |p2 AS MATERIALIZED (SELECT string_split(p, '|')[1] AS pa,
        |         string_split(p, '|')[2] AS pb, SUM(w) AS cnt
        |       FROM (SELECT w, unnest(list_transform(range(1, len(a)),
        |               i -> a[i] || '|' || a[i+1])) AS p
        |             FROM (SELECT w, regexp_extract_all(sy,
        |                     '<([^>]*)>', 1) AS a FROM tok1) x
        |             WHERE len(a) >= 2) y
        |       GROUP BY pa, pb ORDER BY cnt DESC, pa || '|' || pb
        |       LIMIT 1),
        |tok2 AS MATERIALIZED (SELECT replace(sy, '<' || p2.pa || '><' || p2.pb || '>',
        |           '<' || p2.pa || p2.pb || '>') AS sy, w
        |         FROM tok1 CROSS JOIN p2),
        |p3 AS MATERIALIZED (SELECT string_split(p, '|')[1] AS pa,
        |         string_split(p, '|')[2] AS pb, SUM(w) AS cnt
        |       FROM (SELECT w, unnest(list_transform(range(1, len(a)),
        |               i -> a[i] || '|' || a[i+1])) AS p
        |             FROM (SELECT w, regexp_extract_all(sy,
        |                     '<([^>]*)>', 1) AS a FROM tok2) x
        |             WHERE len(a) >= 2) y
        |       GROUP BY pa, pb ORDER BY cnt DESC, pa || '|' || pb
        |       LIMIT 1)
        |SELECT 1::BIGINT AS round, pa AS sym_a, pb AS sym_b,
        |       cnt::BIGINT AS n_pair FROM p1
        |UNION ALL SELECT 2::BIGINT, pa, pb, cnt::BIGINT FROM p2
        |UNION ALL SELECT 3::BIGINT, pa, pb, cnt::BIGINT FROM p3
        |ORDER BY round""".stripMargin))
  )
}
