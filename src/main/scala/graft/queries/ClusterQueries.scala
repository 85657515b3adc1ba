package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Embedding-cluster analytics: the label-level diagnostics a curation
  * pipeline runs AFTER clustering/labeling — nearest-centroid confusion
  * (how separable are the labels?), split-half centroid drift (is the
  * labeled population stable across a partition of the corpus?), and
  * cluster topic labeling (which words characterize each label's
  * documents?). Built on the same determinism idioms as the `emb_*`
  * family: per-(label, dim) statistics through exact DECIMAL
  * aggregation, per-vector folds in deterministic element order, and
  * centroid matrices as bounded driver state broadcast into a codegen
  * kernel ([[graft.functions.VecF.sqDistToCentroids]]) so corpus
  * vectors are assigned where they sit and never shuffle.
  */
object ClusterQueries {

  // ------------------------------------------- nearest-centroid confusion
  /** Confusion matrix of a nearest-centroid classifier against the
    * stored labels: per-label centroids (exact decimal per-dimension
    * means), then every vector assigned to its closest centroid in one
    * codegen scan. The off-diagonal mass is the label-separability
    * audit that decides whether embedding-space sampling can trust the
    * labels. Scale: centroids are k×dim driver state (bounded by the
    * label vocabulary, NOT the corpus); assignment broadcasts them —
    * vectors never ride an exchange. */
  def embLabelConfusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val cents = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("label", "i")
      .agg(Q.davg(col("v").cast("double")).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val labels = cents.keys.map(_._1).toSeq.distinct.sorted
    val dim = cents.keys.map(_._2).max + 1
    val cvecs: Seq[Seq[Double]] = labels.map(l =>
      (0 until dim).map(i => cents((l, i))))
    val lmap = labels.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("idx", "pred_label")
    emb.withColumn("dists",
        graft.functions.VecF.sqDistToCentroids(col("embedding"), cvecs))
      // argmin, first occurrence = lowest label (labels are sorted)
      .withColumn("idx",
        (expr("array_position(dists, array_min(dists))") - 1).cast("int"))
      .join(broadcast(lmap), "idx")
      .groupBy(col("label").as("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  val embLabelConfusionSql: String = {
    def sqDist(e: String, c: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         | [(CAST($e[CAST(i AS INT)] AS DOUBLE) - $c[CAST(i AS INT)]) *
         |  (CAST($e[CAST(i AS INT)] AS DOUBLE) - $c[CAST(i AS INT)])
         |  FOR i IN range(1, len($e) + 1)]),
         | (x, y) -> x + y)""".stripMargin
    s"""
    WITH x AS (
      SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
             unnest([CAST(v AS DOUBLE) FOR v IN embedding]) AS v
      FROM embeddings),
    m AS (SELECT label, i, ${Sql.davg("v")} AS c
      FROM x GROUP BY label, i),
    cents AS (SELECT label AS clabel, list(c ORDER BY i) AS cvec
      FROM m GROUP BY label),
    dists AS (
      SELECT e.vec_id, e.label, cents.clabel,
        ${sqDist("e.embedding", "cents.cvec")} AS dist
      FROM embeddings e CROSS JOIN cents),
    a AS (SELECT vec_id, label, clabel AS pred_label FROM (
        SELECT vec_id, label, clabel, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY dist, clabel) AS rn FROM dists)
      WHERE rn = 1)
    SELECT label AS true_label, pred_label, COUNT(*) AS n
    FROM a GROUP BY 1, 2
    ORDER BY true_label, pred_label"""
  }

  // --------------------------------------------- split-half centroid drift
  /** Per-label centroid drift between the two vec_id-parity halves of
    * the corpus: ‖mean_A − mean_B‖₂ per label. A stable population
    * drifts by O(1/√n); a label whose drift spikes is either tiny or
    * non-stationary — the embedding-space twin of kl_snapshot_drift.
    * Per-(label, half, dim) means are exact-decimal; the 64-dim
    * distance folds in fixed dimension order (array_sort by dim ↔
    * `list(d ORDER BY dim)`), so the double sqrt lands on identical
    * bits in both engines. Scale: the exploded stream shuffles scalar
    * (label, dim, v) rows once into a label×dim-bounded aggregate;
    * the fold runs over 64-element arrays AFTER aggregation. */
  def embCentroidDrift(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val counts = emb.groupBy("label")
      .agg(sum(when(expr("vec_id % 2") === 0, 1).otherwise(0)).as("n_a"),
        sum(when(expr("vec_id % 2") === 1, 1).otherwise(0)).as("n_b"))
    val means = emb
      .select(expr("vec_id % 2").as("half"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(Q.davg(when(col("half") === 0, col("v").cast("double")))
          .as("m0"),
        Q.davg(when(col("half") === 1, col("v").cast("double")))
          .as("m1"))
      .withColumn("dd", col("m0") - col("m1"))
    means.groupBy("label")
      .agg(collect_list(struct(col("dim"), col("dd"))).as("ds"))
      .withColumn("drift", expr(
        "ROUND(SQRT(aggregate(transform(array_sort(ds), s -> s.dd * s.dd)," +
          " CAST(0.0 AS DOUBLE), (a, x) -> a + x)), 6)"))
      .join(broadcast(counts), "label")
      .select("label", "n_a", "n_b", "drift")
      .orderBy("label")
  }

  val embCentroidDriftSql: String = s"""
    WITH x AS (
      SELECT vec_id % 2 AS half, label,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest([CAST(v AS DOUBLE) FOR v IN embedding]) AS v
      FROM embeddings),
    m AS (SELECT label, dim,
        ${Sql.davg("CASE WHEN half = 0 THEN v END")} AS m0,
        ${Sql.davg("CASE WHEN half = 1 THEN v END")} AS m1
      FROM x GROUP BY label, dim),
    dr AS (SELECT label,
        ROUND(SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          [y * y FOR y IN list(m0 - m1 ORDER BY dim)]),
          (a, b) -> a + b)), 6) AS drift
      FROM m GROUP BY label),
    c AS (SELECT label,
        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b
      FROM embeddings GROUP BY label)
    SELECT label, n_a, n_b, drift
    FROM dr JOIN c USING (label)
    ORDER BY label"""

  // ------------------------------------------------- cluster topic terms
  /** Top-3 characteristic terms per embedding label: documents joined
    * to their vectors' labels (vec_id = doc_id), term counts per
    * label, and a tf·idf-style score c_lt · ln(L / df_t) where df_t is
    * the number of LABELS a term appears in (a term in every label
    * scores 0 — it characterizes nothing). The human-readable "what is
    * cluster 7 about" report after any clustering pass. Scale: tokens
    * shuffle as (label, token) scalars; the per-term label-frequency
    * join is big×big on the token key; L is one broadcast scalar; the
    * top-3 window partitions by label. */
  def clusterLabelTerms(s: SparkSession, d: String): DataFrame = {
    // tokenize BEFORE the label join and pre-aggregate per (doc, term):
    // the join exchange then carries (doc_id, term, count) scalars,
    // never the document text (plan-contract-enforced in ScaleSpec)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val ct = toks
      .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")),
        col("doc_id") === col("vec_id"))
      .groupBy("label", "term").agg(sum(col("c")).as("c_lt"))
    val df = ct.groupBy("term")
      .agg(countDistinct(col("label")).as("df_t"))
    val nl = ct.agg(countDistinct(col("label")).as("n_labels"))
    val w = Window.partitionBy("label")
      .orderBy(col("score").desc, col("term"))
    ct.join(df, "term")
      .crossJoin(broadcast(nl))
      .withColumn("score", expr(ScoreF))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("label"), col("rank"), col("term"), col("c_lt"),
        col("df_t"), col("score"))
      .orderBy("label", "rank")
  }

  private val ScoreF: String =
    "ROUND(c_lt * LN(CAST(n_labels AS DOUBLE) / df_t), 6)"

  val clusterLabelTermsSql: String = s"""
    WITH toks AS (SELECT doc_id, term, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents) GROUP BY 1, 2),
    ct AS (SELECT e.label, t.term, CAST(SUM(t.c) AS BIGINT) AS c_lt
      FROM toks t JOIN embeddings e ON t.doc_id = e.vec_id
      GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT label) AS df_t
      FROM ct GROUP BY 1),
    nl AS (SELECT COUNT(DISTINCT label) AS n_labels FROM ct),
    sc AS (SELECT label, term, c_lt, df_t, $ScoreF AS score,
        ROW_NUMBER() OVER (PARTITION BY label
          ORDER BY $ScoreF DESC, term) AS rank
      FROM ct JOIN df USING (term), nl)
    SELECT label, rank, term, c_lt, df_t, score
    FROM sc WHERE rank <= 3
    ORDER BY label, rank"""

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("emb_label_confusion", embLabelConfusion,
      Some(embLabelConfusionSql)),
    QuerySpec("emb_centroid_drift", embCentroidDrift,
      Some(embCentroidDriftSql)),
    QuerySpec("cluster_label_terms", clusterLabelTerms,
      Some(clusterLabelTermsSql)))
}
