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

  // ---------------------------------------------------------------
  // ivm_delta_join — incremental maintenance of a JOIN view
  // ---------------------------------------------------------------

  /** The join counterpart to `ivm_merge_agg`'s aggregate proof: a
    * revenue-per-month view over orders⋈lineitem, maintained under a
    * batch arriving on BOTH sides by the textbook delta decomposition
    *
    *   Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB
    *
    * (batches split at 1998-07-01 on each side's own date). The query
    * computes the view both ways — merged from the four quadrant
    * partials vs recomputed from scratch — and emits the equality as
    * a checked column, so the algebraic contract is part of the
    * oracle-verified answer, not a comment.
    *
    * Why this is the 100 TB shape: in steady state only the three
    * delta terms run, and each joins a SMALL delta against the big
    * old side — here pinned by broadcasting the delta side, so no
    * re-shuffle of the accumulated fact table ever happens; the view
    * partials merge like SUM (exact DECIMAL, order-independent).
    */
  def ivmDeltaJoin(s: SparkSession, d: String): DataFrame = {
    val T = "1998-07-01"
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(Q.Dec).as("rev"))
    val oOld = o.filter(col("o_orderdate") < lit(T))
    val oNew = o.filter(col("o_orderdate") >= lit(T))
    val lOld = l.filter(col("l_shipdate") < lit(T))
    val lNew = l.filter(col("l_shipdate") >= lit(T))
    // old⋈old is the persisted view's own partial; the three delta
    // terms broadcast their delta side against the old fact table
    def quad(of: DataFrame, lf: DataFrame): DataFrame =
      of.join(lf, col("o_orderkey") === col("l_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(col("rev")).as("rev_part"), count(lit(1)).as("n_part"))
    val parts = quad(oOld, lOld)
      .unionByName(quad(oOld, broadcast(lNew)))
      .unionByName(quad(broadcast(oNew), lOld))
      .unionByName(quad(broadcast(oNew), lNew))
    val maintained = parts.groupBy("month").agg(
      round(sum(col("rev_part")), 2).cast("double").as("rev_maintained"),
      sum(col("n_part")).as("n_items"))
    val full = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(round(sum(col("rev")), 2).cast("double").as("rev_full"),
        count(lit(1)).as("n_full"))
    maintained.join(full, Seq("month"))
      .select(col("month"), col("n_items"), col("rev_maintained"),
        col("rev_full"),
        (col("rev_maintained") === col("rev_full") &&
          col("n_items") === col("n_full")).as("consistent"))
      .orderBy("month")
  }

  val ivmDeltaJoinSql: String = {
    val quads = Seq(
      ("o_orderdate <  TIMESTAMP '1998-07-01'", "l_shipdate <  TIMESTAMP '1998-07-01'"),
      ("o_orderdate <  TIMESTAMP '1998-07-01'", "l_shipdate >= TIMESTAMP '1998-07-01'"),
      ("o_orderdate >= TIMESTAMP '1998-07-01'", "l_shipdate <  TIMESTAMP '1998-07-01'"),
      ("o_orderdate >= TIMESTAMP '1998-07-01'", "l_shipdate >= TIMESTAMP '1998-07-01'"))
      .map { case (oc, lc) => s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
          SUM(rev) AS rev_part, COUNT(*) AS n_part
        FROM o JOIN l ON o_orderkey = l_orderkey
        WHERE $oc AND $lc GROUP BY 1""" }
      .mkString(" UNION ALL ")
    s"""
    WITH o AS (SELECT o_orderkey, o_orderdate FROM orders),
    l AS (SELECT l_orderkey, l_shipdate,
      CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS rev
      FROM lineitem),
    parts AS ($quads),
    m AS (SELECT month, CAST(ROUND(SUM(rev_part), 2) AS DOUBLE) AS rev_maintained,
      CAST(SUM(n_part) AS BIGINT) AS n_items FROM parts GROUP BY 1),
    f AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS rev_full,
      CAST(COUNT(*) AS BIGINT) AS n_full
      FROM o JOIN l ON o_orderkey = l_orderkey GROUP BY 1)
    SELECT m.month, n_items, rev_maintained, rev_full,
      (rev_maintained = rev_full AND n_items = n_full) AS consistent
    FROM m JOIN f USING (month) ORDER BY month"""
  }

  // ---------------------------------------------------------------
  // seq_patterns — frequent event-type sequences (order matters)
  // ---------------------------------------------------------------

  /** Sequential pattern mining, the ordered complement of
    * `assoc_rules`' unordered itemsets: frequent length-2 and
    * length-3 event-type runs where consecutive events belong to the
    * same user and are ≤ 30 min apart (the sessionize gap). One keyed
    * window per user (two LEADs — never a global sort), then a plain
    * count aggregate over the emitted patterns; per-user state is the
    * user's own history, the same bound every sessionization here
    * carries. Support is both raw occurrences and distinct users, the
    * two numbers a curriculum/funnel designer actually reads.
    */
  def seqPatterns(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L // 30 min
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("u1", lead(col("ts_us"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("u2", lead(col("ts_us"), 2).over(w))
    val bi = ev
      .filter(col("t1").isNotNull && col("u1") - col("ts_us") <= gapUs)
      .select(lit(2).as("n"),
        concat_ws(">", col("event_type"), col("t1")).as("pattern"),
        col("user_id"))
    val tri = ev
      .filter(col("t2").isNotNull &&
        col("u1") - col("ts_us") <= gapUs && col("u2") - col("u1") <= gapUs)
      .select(lit(3).as("n"),
        concat_ws(">", col("event_type"), col("t1"), col("t2")).as("pattern"),
        col("user_id"))
    bi.unionByName(tri)
      .groupBy("n", "pattern")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("occurrences") >= 5)
      .orderBy(col("n"), col("occurrences").desc, col("pattern"))
  }

  val seqPatternsSql: String = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        LEAD(event_type, 1) OVER w AS t1,
        LEAD(epoch_us(ts), 1) OVER w AS u1,
        LEAD(event_type, 2) OVER w AS t2,
        LEAD(epoch_us(ts), 2) OVER w AS u2
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    pats AS (
      SELECT 2 AS n, event_type || '>' || t1 AS pattern, user_id
      FROM ev WHERE t1 IS NOT NULL AND u1 - ts_us <= 1800000000
      UNION ALL
      SELECT 3, event_type || '>' || t1 || '>' || t2, user_id
      FROM ev WHERE t2 IS NOT NULL
        AND u1 - ts_us <= 1800000000 AND u2 - u1 <= 1800000000)
    SELECT n, pattern, COUNT(*) AS occurrences,
      COUNT(DISTINCT user_id) AS n_users
    FROM pats GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ORDER BY n, occurrences DESC, pattern"""

  // ---------------------------------------------------------------
  // phrase_search — positional posting-list intersection
  // ---------------------------------------------------------------

  /** Exact phrase queries the inverted-index way (what `bm25_topk`'s
    * bag-of-words scoring cannot answer): tokenize once into
    * positional postings (doc_id, pos, term), then a phrase of L
    * words is L−1 equi-joins on (doc_id, pos + offset). Each join
    * side is first FILTERED to one term — the selectivity an index
    * lookup gives for free — so at corpus scale only the matched
    * terms' postings move, hash-partitioned by (doc_id, pos); a
    * production layout would persist the postings bucketed by term to
    * make the filter a partition prune. No regex scan of the raw text
    * ever runs.
    */
  def phraseSearch(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val perPhrase = Phrases.map { p =>
      val ws = p.split(' ')
      var m = tokens.filter(col("term") === ws(0))
        .select(col("doc_id"), col("pos").as("p0"))
      for (i <- 1 until ws.length) {
        val ti = tokens.filter(col("term") === ws(i))
          .select(col("doc_id").as(s"d$i"), (col("pos") - i).as(s"q$i"))
        m = m.join(ti, col("doc_id") === col(s"d$i") &&
            col(s"q$i") === col("p0"))
          .drop(s"d$i", s"q$i")
      }
      m.agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("occurrences"))
        .select(lit(p).as("phrase"), col("n_docs"), col("occurrences"))
    }
    perPhrase.reduce(_ unionByName _)
      .filter(col("occurrences") > 0)
      .orderBy("phrase")
  }

  private val Phrases =
    Seq("key agg row", "table table", "fast key scan", "value table part")

  val phraseSearchSql: String = {
    val branches = Phrases.map { p =>
      val ws = p.split(' ')
      val conds = ws.zipWithIndex
        .map { case (w, i) => s"tk[i + $i] = '$w'" }.mkString(" AND ")
      s"""
      SELECT '$p' AS phrase,
        CAST(COUNT(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
        CAST(COALESCE(SUM(occ), 0) AS BIGINT) AS occurrences
      FROM (SELECT doc_id,
          list_sum([CASE WHEN $conds THEN 1 ELSE 0 END
            FOR i IN range(1, len(tk) - ${ws.length - 1} + 1)]) AS occ
        FROM t) HAVING COALESCE(SUM(occ), 0) > 0"""
    }.mkString(" UNION ALL ")
    s"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    $branches ORDER BY phrase"""
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("bitmap_distinct", bitmapDistinct, Some(bitmapDistinctSql)),
    QuerySpec("sim_topk_binary", simTopkBinary, Some(simTopkBinarySql)),
    QuerySpec("ivm_delta_join", ivmDeltaJoin, Some(ivmDeltaJoinSql)),
    QuerySpec("seq_patterns", seqPatterns, Some(seqPatternsSql)),
    QuerySpec("phrase_search", phraseSearch, Some(phraseSearchSql)))
}
