package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed suffix ranks by prefix doubling, and the repeat-profile
  * operator built on them: for every document, the EXACT length of the
  * longest token span that also occurs anywhere else in the corpus
  * (capped at [[Cap]]) — the memorization / contamination fingerprint
  * that span-HASHING fundamentally cannot produce (hashes answer "is
  * this fixed-length window duplicated", never "how long is the
  * longest duplicated run here").
  *
  * Algorithm (the distributed form of the classic suffix-array
  * construction, Manber–Myers doubling):
  *
  *  1. dense-rank the token column itself ([[rankWithin]] — the only
  *     exchange that ever carries token text, and each token rides it
  *     exactly once);
  *  2. log₂(Cap) doubling rounds: rank_k = dense rank of the pair
  *     (rank_{k-1}[i], rank_{k-1}[i+2^{k-1}]), missing → −1. Each
  *     round is ONE position-keyed self-join plus ONE [[rankWithin]]
  *     range-partitioned sort — no distinct, no join-back: the rank
  *     is assigned in the same pass that sorts the rows, and every
  *     previous level rides along as a column, so the END of the loop
  *     holds ONE wide table (doc, pos, r0..rK) with every level.
  *     Exchanges carry (doc, pos, ranks…) longs only.
  *  3. order suffixes by rank_K (dense ranks are order-preserving at
  *     every level, so this IS the lexicographic suffix order capped
  *     at Cap tokens), assign a global ordinal the same way, and pair
  *     each suffix with its order neighbor;
  *  4. LCP walk k = K..0: if rank_k matches at the current offset,
  *     advance 2^k; then clip to the suffixes' remaining lengths
  *     (end-of-document structure is part of the padded rank; the
  *     clip restores exact span semantics). Auto-dispatched like
  *     [[DenseGraph]]: when the wide rank table fits a broadcast
  *     ([[DenseWalkMaxRows]]) the walk is ONE map-side pass per
  *     neighbor pair against the broadcast rank map; above the guard
  *     it falls back to log₂(Cap)+1 int-keyed joins against the same
  *     wide table. SuffixRanksSpec pins both walks to identical rows.
  *  5. per-position max LCP = max(prev, next neighbor) — the classic
  *     suffix-array property that the best match of a suffix is one
  *     of its order neighbors; per-doc aggregate.
  *
  * Exact and engine-independent: the DuckDB oracle sorts the literal
  * 64-token prefixes and compares neighbors token by token, and the
  * per-doc results hash-match.
  */
object SuffixRanks {

  /** max repeat length measured; 2^6 — callers wanting longer runs pay
    * one more doubling round per factor of 2 */
  val Cap = 64

  /** Dense rank (0-based) of `keyCols` appended to EVERY row of `df`
    * as `outCol`, with no distinct pass and no join-back: range-
    * partition by the keys, sort within partitions, collect P
    * per-partition summaries (distinct count, first/last key — driver
    * state is P rows), stitch boundary-continued keys on the driver,
    * and assign `base(p) + localDistinctIdx` in a second lazy pass
    * over the same shuffle output. */
  def rankWithin(df: DataFrame, keyCols: Seq[String],
                 outCol: String): DataFrame =
    rankWithinTotal(df, keyCols, outCol, None)._1

  /** As [[rankWithin]], also returning the number of distinct keys.
    * When `uniformLead = Some(domain)` the LEADING key column is known
    * to be a dense rank in [0, domain) — true for every doubling round
    * after the first — so range boundaries are a closed formula
    * (`lead·P / domain`) and the range-partitioner's SAMPLING pass is
    * skipped entirely: one shuffle, one stats pass per round. */
  def rankWithinTotal(df: DataFrame, keyCols: Seq[String], outCol: String,
                      uniformLead: Option[Long]): (DataFrame, Long) = {
    val s = df.sparkSession
    val cols = keyCols.map(col)
    val others = df.columns.filterNot(keyCols.contains).map(col)
    val proj = df.select(cols ++ others: _*)
    val nk = keyCols.length
    uniformLead match {
      case Some(domain) =>
        // equal keys share a lead, a lead maps to exactly one block, so
        // blocks never split across partitions and no boundary
        // stitching is needed: rank = base(block) + index-in-block.
        // The shuffle itself stays a SQL hash exchange (UnsafeRow),
        // only the two scan passes drop to the RDD.
        val p = math.max(1, s.sparkContext.defaultParallelism)
        val dom = math.max(1L, domain)
        val blk = least(lit(p - 1L),
          col(keyCols.head).cast("long") * p / dom).cast("int").as("__blk")
        val sorted = proj.withColumn("__blk", blk)
          .repartition(p, col("__blk"))
          .sortWithinPartitions(col("__blk") +: cols: _*)
        val rdd = sorted.rdd
        rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nf = proj.schema.length // __blk is the LAST field
        def keyOf(r: Row): Seq[Any] = r.toSeq.take(nk)
        val stats = rdd.mapPartitions { it =>
          val counts = scala.collection.mutable.LinkedHashMap
            .empty[Int, Long]
          var last: Seq[Any] = null
          var lastBlk = -1
          it.foreach { r =>
            val b = r.getInt(nf)
            val k = keyOf(r)
            if (b != lastBlk || last == null || k != last) {
              counts(b) = counts.getOrElse(b, 0L) + 1
            }
            last = k; lastBlk = b
          }
          counts.iterator
        }.collect()
        val perBlk = stats.groupBy(_._1).map { case (b, xs) =>
          b -> xs.map(_._2).sum
        }
        val blocks = perBlk.keys.toArray.sorted
        val base = new java.util.HashMap[Int, Long]()
        var total = 0L
        blocks.foreach { b => base.put(b, total); total += perBlk(b) }
        val bcBase = s.sparkContext.broadcast(base)
        val ranked = rdd.mapPartitions { it =>
          val bm = bcBase.value
          var idx = -1L
          var last: Seq[Any] = null
          var lastBlk = -1
          it.map { r =>
            val b = r.getInt(nf)
            if (b != lastBlk) { idx = -1L; lastBlk = b }
            val k = keyOf(r)
            if (last == null || k != last || idx < 0) { idx += 1; last = k }
            Row.fromSeq(r.toSeq.take(nf) :+ (bm.get(b) + idx))
          }
        }
        // cache the assigned output: later rounds and the LCP walk
        // re-read each level several times, and without this every
        // consumer replays the whole reduce-side chain back to round 0
        // (RDD-level cache — reaped by the ContextCleaner when the
        // level goes out of scope, no cacheManager entry to leak)
        ranked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = s.createDataFrame(ranked,
          proj.schema.add(outCol, org.apache.spark.sql.types.LongType,
            nullable = false))
        rdd.unpersist(blocking = false)
        (out, total)
      case None =>
        val sorted = proj.repartitionByRange(cols: _*)
          .sortWithinPartitions(cols: _*)
        val rdd = sorted.rdd
        rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def keyOf(r: Row): Seq[Any] = r.toSeq.take(nk)
        val stats = rdd.mapPartitionsWithIndex { (p, it) =>
          var n = 0L
          var first: Seq[Any] = null
          var last: Seq[Any] = null
          it.foreach { r =>
            val k = keyOf(r)
            if (last == null || k != last) {
              n += 1
              if (first == null) first = k
            }
            last = k
          }
          Iterator((p, n, first, last))
        }.collect().sortBy(_._1)
        val base = new Array[Long](stats.length)
        var total = 0L
        var lastKey: Seq[Any] = null
        stats.foreach { case (p, n, first, last) =>
          if (n > 0) {
            val cont = lastKey != null && first == lastKey
            base(p) = total - (if (cont) 1L else 0L)
            total = base(p) + n
            lastKey = last
          } else base(p) = total
        }
        val ranked = rdd.mapPartitionsWithIndex { (p, it) =>
          var idx = -1L
          var last: Seq[Any] = null
          it.map { r =>
            val k = keyOf(r)
            if (last == null || k != last) { idx += 1; last = k }
            Row.fromSeq(r.toSeq :+ (base(p) + idx))
          }
        }
        // createDataFrame over an RDD is already a LEAF logical plan:
        // no Catalyst lineage to blow up downstream joins. Cached for
        // the same multi-consumer reason as the fast path above.
        ranked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = s.createDataFrame(ranked,
          proj.schema.add(outCol, org.apache.spark.sql.types.LongType,
            nullable = false))
        rdd.unpersist(blocking = false)
        (out, total)
    }
  }

  /** Rows above which the LCP walk uses joins instead of a broadcast
    * rank map: 2²² positions × ~(2+K)·8 B ≈ 270 MB — the same
    * dense/sparse dispatch shape as [[DenseGraph.DenseMaxPairs]]. */
  val DenseWalkMaxRows: Long = 1L << 22

  /** Per-document repeat profile: (doc_id, n_tokens, max_repeat,
    * n_pos_rep16). Eager (builds the rank levels at call time). */
  def maxRepeatProfile(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    maxRepeatProfileImpl(docs, idCol, textCol, forceJoinWalk = false)

  /** Test seam: the join-walk form regardless of size. */
  def maxRepeatProfileJoinWalk(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    maxRepeatProfileImpl(docs, idCol, textCol, forceJoinWalk = true)

  private def maxRepeatProfileImpl(docs: DataFrame, idCol: String,
                                   textCol: String, forceJoinWalk: Boolean)
      : DataFrame = {
    val s = docs.sparkSession
    val K = (63 - java.lang.Long.numberOfLeadingZeros(Cap.toLong)).toInt // 6
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("p0", "tok")))
      .select(col("doc"), (col("p0") + 1).as("pos"), col("tok"))
    // wide accumulation: rk holds (doc, pos, r0..rk) after round k
    var (rk, total) = rankWithinTotal(toks, Seq("tok"), "r0", None)
    rk = rk.drop("tok")
    var k = 0
    while (k < K) {
      val off = 1 << k
      // fetch rank[pos+off] WITHOUT a join: per-doc positions are the
      // dense range 1..n, so once rows are doc-partitioned and
      // pos-sorted the shifted rank is an in-memory array lookup —
      // one hash exchange instead of a sort-merge self-join
      val paired = shiftFetch(rk, s"r$k", off)
        .withColumnRenamed(s"r$k", "rcur")
      val (next, t) = rankWithinTotal(paired, Seq("rcur", "rshift"),
        s"r${k + 1}", Some(total))
      rk = next.withColumnRenamed("rcur", s"r$k").drop("rshift")
      total = t
      k += 1
    }
    val wide = rk // one flat table with all levels (RDD-cached per level)
    // suffix order by top-level rank; global ordinal; neighbor pairs.
    // Ordinal keys are all-distinct, so its total IS the position
    // count — the walk dispatch reuses it instead of a count job.
    val (ordT, nRows) = rankWithinTotal(
      wide.select(col(s"r$K"), col("doc"), col("pos")),
      Seq(s"r$K", "doc", "pos"), "o", Some(total))
    val ord = ordT.select(col("doc"), col("pos"), col("o"))
    val adj = ord.as("a").join(
        ord.select((col("o") - 1).as("o"), col("doc").as("dj"),
          col("pos").as("pj")),
        Seq("o"))
      .select(col("a.doc").as("di"), col("a.pos").as("pi"),
        col("dj"), col("pj"))
    val walked =
      if (!forceJoinWalk && nRows <= DenseWalkMaxRows)
        denseWalk(s, wide, adj, K)
      else joinWalk(wide, adj, K)
    // clip to remaining doc lengths (padded ranks treat end-of-doc as
    // structure; the true common prefix never exceeds either remainder)
    val nTok = docs.select(col(idCol).as("doc"),
      size(split(col(textCol), " ")).cast("long").as("n"))
    val lcp = walked
      .join(nTok.select(col("doc").as("di"), col("n").as("ni")), Seq("di"))
      .join(nTok.select(col("doc").as("dj"), col("n").as("nj")), Seq("dj"))
      .select(col("di"), col("pi"), col("dj"), col("pj"),
        least(col("l"), lit(Cap.toLong),
          col("ni") - col("pi") + 1, col("nj") - col("pj") + 1).as("lcp"))
    // per-position max over (prev, next) neighbors
    val perPos = lcp.select(col("di").as("doc"), col("pi").as("pos"),
        col("lcp"))
      .unionByName(lcp.select(col("dj").as("doc"), col("pj").as("pos"),
        col("lcp")))
      .groupBy("doc", "pos").agg(max(col("lcp")).as("m"))
    nTok.join(
        perPos.groupBy("doc").agg(max(col("m")).as("max_repeat"),
          sum(when(col("m") >= 16, 1L).otherwise(0L)).as("n_pos_rep16")),
        Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n").as("n_tokens"),
        coalesce(col("max_repeat"), lit(0L)).as("max_repeat"),
        coalesce(col("n_pos_rep16"), lit(0L)).as("n_pos_rep16"))
      .orderBy("doc_id")
  }


  /** Appends `rshift` = value of `rankCol` at (doc, pos + off), −1
    * beyond the document end — computed by buffering each document's
    * rows inside a doc-partitioned pos-sorted pass (per-doc positions
    * are dense 1..n by construction), so the shifted fetch costs one
    * hash exchange and zero joins. Per-task memory is one document's
    * rows at a time. */
  private def shiftFetch(df: DataFrame, rankCol: String, off: Int)
      : DataFrame = {
    val s = df.sparkSession
    val p = math.max(1, s.sparkContext.defaultParallelism)
    val sorted = df.repartition(p, col("doc"))
      .sortWithinPartitions("doc", "pos")
    val schema = sorted.schema
    val di = schema.fieldIndex("doc")
    val pi = schema.fieldIndex("pos")
    val ri = schema.fieldIndex(rankCol)
    val rdd = sorted.rdd.mapPartitions { it =>
      new Iterator[Row] {
        val buf = new scala.collection.mutable.ArrayBuffer[Row]()
        var out: Iterator[Row] = Iterator.empty
        var pending: Row = null
        def flush(): Unit = {
          val n = buf.length
          val ranks = new Array[Long](n)
          var i = 0
          while (i < n) { ranks(i) = buf(i).getLong(ri); i += 1 }
          out = buf.toIndexedSeq.iterator.map { r =>
            val pos = r.getAs[Number](pi).intValue()
            val sh = if (pos - 1 + off < n) ranks(pos - 1 + off) else -1L
            Row.fromSeq(r.toSeq :+ sh)
          }
          buf.clear()
        }
        def hasNext: Boolean = {
          while (!out.hasNext && (pending != null || it.hasNext)) {
            val r = if (pending != null) { val x = pending; pending = null; x }
              else it.next()
            if (buf.nonEmpty && buf.last.get(di) != r.get(di)) {
              pending = r
              flush()
            } else buf += r
          }
          if (!out.hasNext && buf.nonEmpty) flush()
          out.hasNext
        }
        def next(): Row = { hasNext; out.next() }
      }
    }
    s.createDataFrame(rdd,
      schema.add("rshift", org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** Dense-regime walk: broadcast (doc,pos) → rank vector, one
    * map-side pass over the neighbor pairs. */
  private def denseWalk(s: org.apache.spark.sql.SparkSession,
                        wide: DataFrame, adj: DataFrame, K: Int)
      : DataFrame = {
    import s.implicits._
    val rows = wide.collect()
    val m = new java.util.HashMap[Long, Array[Long]](rows.length * 2)
    rows.foreach { r =>
      val key = (r.getAs[Number]("doc").longValue() << 32) |
        r.getAs[Number]("pos").longValue()
      m.put(key, Array.tabulate(K + 1)(i => r.getAs[Long](s"r$i")))
    }
    val bc = s.sparkContext.broadcast(m)
    adj.select(col("di").cast("long"), col("pi").cast("long"),
        col("dj").cast("long"), col("pj").cast("long"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        val mm = bc.value
        it.map { case (di, pi, dj, pj) =>
          var l = 0L
          var kk = K
          while (kk >= 0) {
            val a = mm.get((di << 32) | (pi + l))
            val b = mm.get((dj << 32) | (pj + l))
            val ra = if (a == null) -1L else a(kk)
            val rb = if (b == null) -1L else b(kk)
            if (ra == rb) l += (1L << kk)
            kk -= 1
          }
          (di, pi, dj, pj, l)
        }
      }.toDF("di", "pi", "dj", "pj", "l")
  }

  /** At-scale walk: log₂(Cap)+1 int-keyed joins against the wide
    * rank table. */
  private def joinWalk(wide: DataFrame, adj: DataFrame, K: Int)
      : DataFrame = {
    var cur = adj.withColumn("l", lit(0L))
    var kk = K
    while (kk >= 0) {
      val la = wide.select(col("doc").as("di"), col("pos").as("ka"),
        col(s"r$kk").as("rka"))
      val lb = wide.select(col("doc").as("dj"), col("pos").as("kb"),
        col(s"r$kk").as("rkb"))
      cur = cur
        .withColumn("ka", col("pi") + col("l"))
        .withColumn("kb", col("pj") + col("l"))
        .join(la, Seq("di", "ka"), "left")
        .join(lb, Seq("dj", "kb"), "left")
        .withColumn("l",
          when(coalesce(col("rka"), lit(-1L)) ===
            coalesce(col("rkb"), lit(-1L)),
            col("l") + (1L << kk)).otherwise(col("l")))
        .drop("ka", "kb", "rka", "rkb")
      kk -= 1
    }
    cur
  }
}
