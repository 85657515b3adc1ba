package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashF

/** N-gram language-model operators over the documents corpus: hot
  * (repeated) n-gram mining and stupid-backoff scoring — the n-gram-LM
  * tier of a training-data pipeline (dedup at phrase granularity,
  * perplexity-style quality filtering) alongside the unigram/bigram
  * surprisal operators in PipelineQueries. */
object LmQueries {

  /** word 5-grams of the space-split text, as (doc_id, ng) rows;
    * documents shorter than 5 tokens contribute none. Built map-side —
    * whether the TEXT of an n-gram ever rides an exchange is each
    * consumer's contract (see callers). */
  private def grams5(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    docs.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 5,
          sequence(lit(1), size(col("w")) - 4))
        .otherwise(array().cast("array<int>"))).as("i"),
        col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(5))).as("ng"))
  }

  // ------------------------------------------------------ hot n-grams
  /** Hot n-gram mining (the phrase-granularity complement of
    * dedup_paragraph — Lee et al. 2022's observation that training
    * corpora repeat SPANS, not just documents): every word 5-gram
    * appearing in ≥ 2 distinct documents, with document frequency and
    * occurrence count.
    *
    * Two-pass scale shape: pass 1 counts distinct docs per 58-bit
    * n-gram HASH — the corpus-wide exchange carries (hash, doc_id)
    * longs, never text. Pass 2 equi-joins the hot hashes back (hash
    * join, filter pushed to the candidate side) and re-aggregates BY
    * EXACT TEXT, so a pass-1 hash collision can only add a spurious
    * candidate that the exact re-count then drops — the hash tier is
    * purely a pruner, correctness never depends on it. Only CANDIDATE
    * n-grams (the hot set, by construction the corpus's repeated
    * boilerplate) carry text on the pass-2 exchange — the same
    * candidate-only contract as the dedup family. */
  def ngramHot(s: SparkSession, d: String): DataFrame = {
    val T = 2
    // r17-opt: Spread parallelizes the 5-gram explode+hash, which runs
    // twice (hot set + join-back) over the same scan
    val grams = grams5(graft.Spread(s, s"$d/documents.parquet",
        Tables.documents(s, d), col("doc_id")))
      .withColumn("hg", HashF.polyHashWide(col("ng")))
    val hot = grams.select("doc_id", "hg").groupBy("hg")
      .agg(countDistinct(col("doc_id")).as("df_h"))
      .filter(col("df_h") >= T).select("hg")
    grams.join(hot, "hg")
      .groupBy("ng")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("n_occ"))
      .filter(col("df") >= T)
      .select(col("ng").as("ngram"), col("df"), col("n_occ"))
      .orderBy(desc("df"), col("ngram"))
  }

  val ngramHotSql: String = """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents),
    g AS (SELECT doc_id,
        array_to_string(list_slice(w, CAST(i AS INT), CAST(i + 4 AS INT)),
          ' ') AS ng
      FROM base, UNNEST(range(1, GREATEST(len(w) - 3, 1))) AS t(i)),
    f AS (SELECT ng AS ngram, COUNT(DISTINCT doc_id) AS df,
        COUNT(*) AS n_occ
      FROM g GROUP BY 1)
    SELECT ngram, df, n_occ FROM f WHERE df >= 2
    ORDER BY df DESC, ngram"""

  // ---------------------------------------- stupid-backoff trigram LM
  /** Trigram stupid-backoff scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the smoothing built FOR
    * distributed count tables: no discount mass bookkeeping, just
    * S(w₃|w₁w₂) = c₃/c₂ if seen, else 0.4·c(w₂w₃)/c(w₂), else
    * 0.4²·(c(w₃)+1)/N — the +1 floors unseen words so ln never sees
    * zero). Train on 90% of the corpus (doc_id % 10 ≠ 0), score the
    * held-out 10% — self-scoring would never exercise backoff since
    * every observed trigram has c₃ ≥ 1.
    *
    * Scale shape mirrors text_bigram_logprob: scored-doc trigram
    * INSTANCES pre-aggregate per (doc, trigram) map-side, the count
    * tables are genuine big×big hash joins on the n-gram keys (an LM
    * count table is NOT broadcastable at corpus scale — this is the
    * canonical distributed-LM-scoring join), the unigram total is the
    * one broadcast scalar, and per-doc sums go through DECIMAL(38,12).
    * The per-branch hit counters (exact integers) pin the backoff
    * routing cross-engine, not just the float score. */
  def textStupidBackoff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = split(col("text"), " ")
    // held-out trigram instances, multiplicity pre-aggregated
    val tri = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2))
        .otherwise(array().cast("array<int>"))).as("i"), col("w"))
      .select(col("doc_id"), element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"),
        element_at(col("w"), col("i") + 2).as("w3"))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("n"))
    // training count tables
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), w.as("w"))
    val uni = train.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).as("t"))
    val bi = train
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val tri3 = train
      .select(explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2))
        .otherwise(array().cast("array<int>"))).as("i"), col("w"))
      .select(element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"),
        element_at(col("w"), col("i") + 2).as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))

    val scored = tri
      .join(tri3, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("cb").as("cb12")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cb").as("cb23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("tok").as("w2"), col("cu").as("cu2")),
        Seq("w2"), "left")
      .join(uni.select(col("tok").as("w3"), col("cu").as("cu3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("branch",
        when(col("ct").isNotNull, lit(0))
          .when(col("cb23").isNotNull, lit(1))
          .otherwise(lit(2)))
      .withColumn("sc",
        when(col("branch") === 0, col("ct").cast("double") / col("cb12"))
          .when(col("branch") === 1,
            lit(0.4) * (col("cb23").cast("double") / col("cu2")))
          .otherwise(lit(0.4) * lit(0.4) *
            ((coalesce(col("cu3"), lit(0L)) + 1).cast("double") / col("t"))))
    scored.groupBy("doc_id")
      .agg(sum(col("n")).as("n_trigrams"),
        sum(when(col("branch") === 0, col("n")).otherwise(0L))
          .as("n_tri_hit"),
        sum(when(col("branch") === 1, col("n")).otherwise(0L))
          .as("n_big_hit"),
        sum(when(col("branch") === 2, col("n")).otherwise(0L))
          .as("n_uni_hit"),
        sum((col("n").cast("double") * log(col("sc")))
          .cast("decimal(38,12)")).as("s"))
      .select(col("doc_id"), col("n_trigrams"),
        col("n_tri_hit"), col("n_big_hit"), col("n_uni_hit"),
        round(-col("s").cast("double") / col("n_trigrams"), 6)
          .as("avg_neg_logscore"))
      .orderBy("doc_id")
  }

  val textStupidBackoffSql: String = """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents),
    tri AS (SELECT doc_id, w[CAST(i AS INT)] AS w1,
        w[CAST(i + 1 AS INT)] AS w2, w[CAST(i + 2 AS INT)] AS w3,
        COUNT(*) AS n
      FROM base, UNNEST(range(1, GREATEST(len(w) - 1, 1))) AS t(i)
      WHERE doc_id % 10 = 0 GROUP BY doc_id, w1, w2, w3),
    train AS (SELECT * FROM base WHERE doc_id % 10 != 0),
    uni AS (SELECT unnest(w) AS tok FROM train),
    freq AS (SELECT tok, COUNT(*) AS cu FROM uni GROUP BY tok),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t FROM freq),
    bi AS (SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
        COUNT(*) AS cb
      FROM train, UNNEST(range(1, len(w))) AS t(i) GROUP BY 1, 2),
    tri3 AS (SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
        w[CAST(i + 2 AS INT)] AS w3, COUNT(*) AS ct
      FROM train, UNNEST(range(1, GREATEST(len(w) - 1, 1))) AS t(i)
      GROUP BY 1, 2, 3),
    scored AS (SELECT doc_id, n,
        CASE WHEN ct IS NOT NULL THEN 0
             WHEN cb23.cb IS NOT NULL THEN 1 ELSE 2 END AS branch,
        CASE WHEN ct IS NOT NULL THEN CAST(ct AS DOUBLE) / cb12.cb
             WHEN cb23.cb IS NOT NULL
               THEN 0.4 * (CAST(cb23.cb AS DOUBLE) / cu2.cu)
             ELSE 0.4 * 0.4 *
               (CAST(COALESCE(cu3.cu, 0) + 1 AS DOUBLE) / t) END AS sc
      FROM tri
      LEFT JOIN tri3 USING (w1, w2, w3)
      LEFT JOIN bi cb12 ON tri.w1 = cb12.w1 AND tri.w2 = cb12.w2
      LEFT JOIN bi cb23 ON tri.w2 = cb23.w1 AND tri.w3 = cb23.w2
      LEFT JOIN freq cu2 ON tri.w2 = cu2.tok
      LEFT JOIN freq cu3 ON tri.w3 = cu3.tok
      CROSS JOIN tot)
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_trigrams,
      CAST(SUM(CASE WHEN branch = 0 THEN n ELSE 0 END) AS BIGINT)
        AS n_tri_hit,
      CAST(SUM(CASE WHEN branch = 1 THEN n ELSE 0 END) AS BIGINT)
        AS n_big_hit,
      CAST(SUM(CASE WHEN branch = 2 THEN n ELSE 0 END) AS BIGINT)
        AS n_uni_hit,
      ROUND(-CAST(SUM(CAST(n * ln(sc) AS DECIMAL(38,12))) AS DOUBLE)
        / SUM(n), 6) AS avg_neg_logscore
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------- Kneser-Ney bigram LM
  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * standard n-gram smoothing KenLM implements, and the principled
    * counterpart to [[textStupidBackoff]]'s heuristic): absolute
    * discount D = 0.75 off every seen bigram, redistributed via the
    * CONTINUATION distribution — p_cont(w) ∝ how many distinct
    * contexts w follows, the fix for the "San Francisco" pathology
    * where raw unigram frequency overweights words that only ever
    * appear in one collocation.
    *
    *   p(w₂|w₁) = (max(c(w₁w₂)−D, 0) + D·N₁₊(w₁·)·p_cont(w₂)) / c(w₁)
    *   p_cont(w₂) = (N₁₊(·w₂)+1) / (B+V)   [add-one floor: unseen w₂
    *                                        scores, ln never sees 0]
    *   c(w₁) = 0  →  p = p_cont(w₂)         [unseen context backs all
    *                                        the way off]
    *
    * c(w₁) is the bigram-marginal Σ_w c(w₁w), not the raw unigram
    * count, so the seen and discount masses sum exactly to 1 before
    * the floor. Train on 90% (doc_id % 10 ≠ 0), score the held-out
    * 10%. Scale shape is the same as the other LM scorers: count
    * tables are big×big hash joins on n-gram keys, type-count scalars
    * (B, V) broadcast, per-doc sums in DECIMAL(38,12). The integer
    * n_ctx_known column pins the context-known/unknown routing. */
  def textKnBigram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = split(col("text"), " ")
    def bigrams(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.select(extra :+ w.as("w"): _*)
        .select(extra :+ explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"): _*)
        .select(extra :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
    val held = bigrams(docs.filter(col("doc_id") % 10 === 0),
      Seq(col("doc_id")))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val cb = bigrams(train, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val c1 = cb.groupBy("w1").agg(sum(col("cb")).as("c1"),
      count(lit(1)).as("n1p_fwd")) // distinct continuations of w1
    val nbwd = cb.groupBy("w2").agg(count(lit(1)).as("n1p_bwd"))
    val scal = cb.agg(count(lit(1)).as("bb"))
      .crossJoin(broadcast(
        train.select(explode(w).as("tok")).agg(
          countDistinct(col("tok")).as("vv"))))

    val scored = held
      .join(cb, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(nbwd.select(col("w2"), col("n1p_bwd")), Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .withColumn("pcont",
        (coalesce(col("n1p_bwd"), lit(0L)) + 1).cast("double") /
          (col("bb") + col("vv")))
      .withColumn("p",
        when(col("c1").isNotNull,
          (greatest(coalesce(col("cb"), lit(0L)).cast("double") - 0.75,
            lit(0.0)) +
            lit(0.75) * col("n1p_fwd") * col("pcont")) / col("c1"))
          .otherwise(col("pcont")))
    scored.groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"),
        sum(when(col("c1").isNotNull, col("n")).otherwise(0L))
          .as("n_ctx_known"),
        sum((col("n").cast("double") * log(col("p")))
          .cast("decimal(38,12)")).as("s"))
      .select(col("doc_id"), col("n_bigrams"), col("n_ctx_known"),
        round(-col("s").cast("double") / col("n_bigrams"), 6)
          .as("avg_neg_logprob"))
      .orderBy("doc_id")
  }

  val textKnBigramSql: String = """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents),
    held AS (SELECT doc_id, w[CAST(i AS INT)] AS w1,
        w[CAST(i + 1 AS INT)] AS w2, COUNT(*) AS n
      FROM base, UNNEST(range(1, len(w))) AS t(i)
      WHERE doc_id % 10 = 0 GROUP BY doc_id, w1, w2),
    train AS (SELECT * FROM base WHERE doc_id % 10 != 0),
    cb AS (SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
        COUNT(*) AS cb
      FROM train, UNNEST(range(1, len(w))) AS t(i) GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1,
        COUNT(*) AS n1p_fwd FROM cb GROUP BY 1),
    nbwd AS (SELECT w2, COUNT(*) AS n1p_bwd FROM cb GROUP BY 1),
    scal AS (SELECT
      (SELECT COUNT(*) FROM cb) AS bb,
      (SELECT COUNT(DISTINCT tok) FROM
        (SELECT unnest(w) AS tok FROM train)) AS vv),
    scored AS (SELECT doc_id, n, c1.c1 AS c1,
        CASE WHEN c1.c1 IS NOT NULL THEN
          (GREATEST(CAST(COALESCE(cb.cb, 0) AS DOUBLE) - 0.75, 0.0) +
            0.75 * n1p_fwd *
            (CAST(COALESCE(n1p_bwd, 0) + 1 AS DOUBLE) / (bb + vv)))
            / c1.c1
        ELSE CAST(COALESCE(n1p_bwd, 0) + 1 AS DOUBLE) / (bb + vv)
        END AS p
      FROM held
      LEFT JOIN cb USING (w1, w2)
      LEFT JOIN c1 USING (w1)
      LEFT JOIN nbwd USING (w2)
      CROSS JOIN scal)
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
      CAST(SUM(CASE WHEN c1 IS NOT NULL THEN n ELSE 0 END) AS BIGINT)
        AS n_ctx_known,
      ROUND(-CAST(SUM(CAST(n * ln(p) AS DECIMAL(38,12))) AS DOUBLE)
        / SUM(n), 6) AS avg_neg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------- retrieval nDCG
  /** Retrieval-quality evaluation: nDCG@10 of the BM25 ranking (same
    * arithmetic as bm25_topk, same vocabulary-filtered postings shape)
    * against a graded-relevance truth — rel(q, d) = total query-term
    * frequency in the document, capped at 8 — a label the ranker does
    * not see (BM25 length-normalizes and idf-weights; raw capped
    * frequency is an independent signal, so the two rankings genuinely
    * diverge and nDCG lands strictly below 1). DCG terms rel/log2(rank+1) go through DECIMAL(38,12)
    * before summing (order-free); the ideal ranking sorts the same
    * grades (ties by doc_id) corpus-wide, so IDCG is the true optimum,
    * not the optimum of the retrieved set. The eval-harness shape:
    * rank, join truth, two tiny per-query aggregates. */
  def retrievalNdcgEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val queryTerms: Seq[(String, String)] = Seq(
      "q1" -> "spark", "q1" -> "join",
      "q2" -> "window", "q2" -> "agg",
      "q3" -> "hash", "q3" -> "table", "q3" -> "scan")
    val qt = queryTerms.toDF("query_id", "t")
    val terms = queryTerms.map(_._2).distinct
    val docs = Tables.documents(s, d)
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("tot_len"))
    val tf = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("dl"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("doc_id", "dl", "t")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t")
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    val scored = tf
      .join(broadcast(qt), Seq("t"))
      .join(broadcast(dfreq), Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(log(
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)), 9))
      .withColumn("avgdl", col("tot_len").cast("double") / col("n_docs"))
      .withColumn("c", col("idf") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("c").cast("decimal(38,12)")).cast("double"), 6)
        .as("score"))
    val rel = tf.join(broadcast(qt), Seq("t"))
      .groupBy("query_id", "doc_id")
      .agg(least(sum(col("tf")), lit(8L)).as("rel"))
    val wScore = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val dcg = scored.withColumn("rank", row_number().over(wScore))
      .filter(col("rank") <= 10)
      .join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(sum((col("rel") / (log(col("rank") + lit(1.0)) / log(lit(2.0))))
        .cast("decimal(38,12)")).as("dcg_d"))
    val wRel = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rel").desc, col("doc_id"))
    val idcg = rel.withColumn("irank", row_number().over(wRel))
      .filter(col("irank") <= 10)
      .groupBy("query_id")
      .agg(sum((col("rel") /
        (log(col("irank") + lit(1.0)) / log(lit(2.0))))
        .cast("decimal(38,12)")).as("idcg_d"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"),
        round(col("dcg_d").cast("double"), 6).as("dcg10"),
        round(col("idcg_d").cast("double"), 6).as("idcg10"),
        round(col("dcg_d").cast("double") /
          col("idcg_d").cast("double"), 6).as("ndcg10"))
      .orderBy("query_id")
  }

  val retrievalNdcgEvalSql: String = """
    WITH qt AS (SELECT * FROM (VALUES
        ('q1', 'spark'), ('q1', 'join'),
        ('q2', 'window'), ('q2', 'agg'),
        ('q3', 'hash'), ('q3', 'table'), ('q3', 'scan'))
      AS v(query_id, t)),
    stats AS (SELECT COUNT(*) AS n_docs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_len
      FROM documents),
    toks AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS dl,
        unnest(string_split(text, ' ')) AS t
      FROM documents),
    tf AS (SELECT doc_id, dl, t, COUNT(*) AS tf FROM toks
      WHERE t IN (SELECT DISTINCT t FROM qt)
      GROUP BY doc_id, dl, t),
    dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    contrib AS (SELECT qt.query_id, tf.doc_id,
        ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9) *
          (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * dl /
            (CAST(tot_len AS DOUBLE) / n_docs))) AS c
      FROM tf JOIN qt ON tf.t = qt.t
      JOIN dfreq ON tf.t = dfreq.t CROSS JOIN stats),
    scored AS (SELECT query_id, doc_id,
        ROUND(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
      FROM contrib GROUP BY query_id, doc_id),
    rel AS (SELECT qt.query_id, tf.doc_id,
        LEAST(CAST(SUM(tf.tf) AS BIGINT), 8) AS rel
      FROM tf JOIN qt ON tf.t = qt.t GROUP BY 1, 2),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id) AS rank FROM scored),
    dcg AS (SELECT ranked.query_id,
        SUM(CAST(rel / (ln(rank + 1.0) / ln(2.0)) AS DECIMAL(38,12)))
          AS dcg_d
      FROM ranked JOIN rel ON ranked.query_id = rel.query_id
        AND ranked.doc_id = rel.doc_id
      WHERE rank <= 10 GROUP BY 1),
    ideal AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY rel DESC, doc_id) AS irank FROM rel),
    idcg AS (SELECT query_id,
        SUM(CAST(rel / (ln(irank + 1.0) / ln(2.0)) AS DECIMAL(38,12)))
          AS idcg_d
      FROM ideal WHERE irank <= 10 GROUP BY 1)
    SELECT dcg.query_id AS query_id,
      ROUND(CAST(dcg_d AS DOUBLE), 6) AS dcg10,
      ROUND(CAST(idcg_d AS DOUBLE), 6) AS idcg10,
      ROUND(CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE), 6) AS ndcg10
    FROM dcg JOIN idcg ON dcg.query_id = idcg.query_id
    ORDER BY query_id"""

  // ------------------------------------------------ vocabulary growth
  /** Heaps-law vocabulary-growth curve: cumulative distinct tokens vs
    * cumulative token count over a doc_id-ordered prefix sweep — the
    * curve tokenizer vocab sizing and dedup-health monitoring read
    * (sub-Heaps growth flags duplication; super-linear flags noise).
    * Scale shape: ONE aggregate finds each token's FIRST document
    * (min doc_id — map-side combinable, the exchange carries token
    * hashes... here tokens, a bounded vocabulary by definition of the
    * output), one aggregate per bucket for token totals, and the
    * cumulative sums run over the B-row bucket table (B = 10), not the
    * corpus. */
  def vocabGrowth(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nb = 10
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val w = split(col("text"), " ")
    val toks = docs.crossJoin(broadcast(mx))
      .select(expr(s"cast(doc_id * $nb div (mx + 1) as int)")
        .as("bucket"), explode(w).as("tok"))
    val firstSeen = toks.groupBy("tok").agg(min(col("bucket")).as("b0"))
      .groupBy("b0").agg(count(lit(1)).as("new_types"))
    val perBucket = toks.groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"))
    val cw = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    perBucket
      .join(firstSeen.withColumnRenamed("b0", "bucket"), Seq("bucket"),
        "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cw))
      .withColumn("cum_types", sum(col("new_types")).over(cw))
      .select(col("bucket"), col("cum_tokens"), col("cum_types"),
        round(col("cum_types").cast("double") / col("cum_tokens"), 6)
          .as("type_token_ratio"))
      .orderBy("bucket")
  }

  val vocabGrowthSql: String = """
    WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
    toks AS (SELECT CAST(doc_id * 10 // (mx + 1) AS INT) AS bucket,
        unnest(string_split(text, ' ')) AS tok
      FROM documents, mx),
    fs AS (SELECT b0, COUNT(*) AS new_types FROM
      (SELECT tok, MIN(bucket) AS b0 FROM toks GROUP BY tok)
      GROUP BY b0),
    pb AS (SELECT bucket, COUNT(*) AS n_tokens FROM toks GROUP BY bucket),
    j AS (SELECT pb.bucket, n_tokens,
        COALESCE(new_types, 0) AS new_types
      FROM pb LEFT JOIN fs ON pb.bucket = fs.b0)
    SELECT bucket,
      CAST(SUM(n_tokens) OVER (ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_tokens,
      CAST(SUM(new_types) OVER (ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_types,
      ROUND(CAST(SUM(new_types) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
        CAST(SUM(n_tokens) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        AS type_token_ratio
    FROM j ORDER BY bucket"""

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("vocab_growth", vocabGrowth, Some(vocabGrowthSql)),
    QuerySpec("retrieval_ndcg_eval", retrievalNdcgEval,
      Some(retrievalNdcgEvalSql)),
    QuerySpec("ngram_hot", ngramHot, Some(ngramHotSql)),
    QuerySpec("text_stupid_backoff", textStupidBackoff,
      Some(textStupidBackoffSql)),
    QuerySpec("text_kn_bigram", textKnBigram, Some(textKnBigramSql)))
}
