package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.BitmapF

/** Fourth-sweep engine components: operators whose value is the state
  * or plan they carry, not just the rows they return — exact-distinct
  * bitmap rollups, binary-quantized retrieval, incremental join-view
  * maintenance, positional phrase search.
  */
object EngineQueries {

  // ---------------------------------------------------------------
  // bitmap_distinct — exact distinct via mergeable roaring bitmaps
  // ---------------------------------------------------------------

  /** Exact distinct user-days per event type, PLUS the `__all__`
    * rollup computed by OR-ing the five per-type bitmap states —
    * never re-touching the raw keys. `COUNT(DISTINCT …)` cannot do
    * that second step: distinct counts don't add, so every rollup
    * level costs another shuffle of the key set; the compressed
    * bitmap state (RoaringLite — 16 bits/key sparse, 1 bit/key dense)
    * makes exact distinct behave like SUM. Same ObjectHashAggregate /
    * map-side-partial plan as the HLL sketch, but the answer is exact.
    *
    * The key is (user_id << 16) | day: one container per user, the
    * user's active days as that container's low bits — so
    * `state_words` (total longs shipped) is a pure function of the
    * member set (exact-sized sparse arrays, 2 + ceil(days/4) words
    * per user) and the oracle can predict it to the word.
    */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        (col("user_id") * 65536L +
          pmod(expr("ts_us div 86400000000"), lit(65536L))).as("k"))
    val perType = keys.groupBy("event_type")
      .agg(BitmapF.bitmap(col("k")).as("state"))
    val allRow = perType
      .agg(BitmapF.bitmapMerge(col("state")).as("state"))
      .select(lit("__all__").as("event_type"), col("state"))
    perType.unionByName(allRow)
      .select(col("event_type"),
        expr("aggregate(state, 0L, (acc, c) -> acc + (c[1] & 4294967295))")
          .as("n_exact"),
        size(col("state")).cast("long").as("n_containers"),
        expr("aggregate(state, 0L, (acc, c) -> acc + size(c))")
          .as("state_words"))
      .orderBy("event_type")
  }

  val bitmapDistinctSql: String = """
    WITH keys AS (
      SELECT event_type,
        user_id * 65536 + (epoch_us(ts) // 86400000000) % 65536 AS k
      FROM events WHERE user_id IS NOT NULL),
    cont AS (
      SELECT event_type, k // 65536 AS hi, COUNT(DISTINCT k) AS n
      FROM keys GROUP BY 1, 2),
    cont_all AS (
      SELECT k // 65536 AS hi, COUNT(DISTINCT k) AS n
      FROM keys GROUP BY 1),
    per AS (
      SELECT event_type,
        CAST(SUM(n) AS BIGINT) AS n_exact,
        CAST(COUNT(*) AS BIGINT) AS n_containers,
        CAST(SUM(2 + (n + 3) // 4) AS BIGINT) AS state_words
      FROM cont GROUP BY 1
      UNION ALL
      SELECT '__all__',
        CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        CAST(SUM(2 + (n + 3) // 4) AS BIGINT)
      FROM cont_all)
    SELECT event_type, n_exact, n_containers, state_words
    FROM per ORDER BY event_type"""

  // ---------------------------------------------------------------
  // sim_topk_binary — sign-quantized Hamming prefilter + exact rerank
  // ---------------------------------------------------------------

  /** Binary-signature ANN: Hamming over 32-bit-per-word sign
    * signatures selects 32 candidates per query (bounded TopK
    * aggregate — map-side partial, no per-query window over the
    * corpus), then only those pay the exact-cosine rerank. Stage 1
    * never reads the float vectors. See
    * [[graft.pipeline.Similarity.binaryTopK]] for the plan argument.
    */
  def simTopkBinary(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.pipeline.Similarity.binaryTopK(
        emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, prefilter = 32)
      .orderBy("query_id", "rank")
  }

  val simTopkBinarySql: String = {
    val dot = PipelineQueries.dotSql("q.embedding", "c.embedding")
    val sig = """
      [list_reduce(list_prepend(CAST(0 AS BIGINT),
        [CASE WHEN embedding[32*w + i + 1] >= 0 THEN (CAST(1 AS BIGINT) << i)
              ELSE CAST(0 AS BIGINT) END FOR i IN range(0, 32)]),
        (a, b) -> a | b) FOR w IN range(0, (len(embedding)+31)//32)]"""
    s"""
    WITH e AS (SELECT vec_id, embedding,
      sqrt(${PipelineQueries.dotSql("embedding", "embedding")}) AS norm,
      $sig AS sig FROM embeddings),
    pre AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(list_sum([bit_count(xor(q.sig[j], c.sig[j]))
          FOR j IN range(1, len(q.sig) + 1)]) AS INT) AS hamming
      FROM e q, e c WHERE q.vec_id < 8 AND c.vec_id != q.vec_id),
    short AS (SELECT *, ROW_NUMBER() OVER
      (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS pr FROM pre),
    rr AS (
      SELECT s.query_id, s.neighbor_id, s.hamming,
        ROUND($dot / (q.norm * c.norm), 6) AS cos
      FROM short s
      JOIN e q ON s.query_id = q.vec_id
      JOIN e c ON s.neighbor_id = c.vec_id
      WHERE s.pr <= 32),
    ranked AS (SELECT *, ROW_NUMBER() OVER
      (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM rr)
    SELECT query_id, neighbor_id, hamming, cos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank"""
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("bitmap_distinct", bitmapDistinct, Some(bitmapDistinctSql)),
    QuerySpec("sim_topk_binary", simTopkBinary, Some(simTopkBinarySql)))
}
