package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphEdges

/** Pins the hot-order-safe co-purchase pair expansion: with a planted
  * hot order (10⁴ parts — the quadratic-fanout hazard the naive
  * self-join cannot split across tasks) the chunked path activates,
  * every shuffle cell stays bounded, and the emitted pair multiset is
  * IDENTICAL to the naive expansion. On a normal corpus the plan IS
  * the naive join (probe says no hot orders). */
class GraphEdgesSpec extends SparkSpec {

  private def naive(op: org.apache.spark.sql.DataFrame) =
    op.as("x").join(op.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.o").as("o"), col("x.p").as("a"), col("y.p").as("b"))

  test("planted 10^4-part hot order: rows identical, cells bounded") {
    import spark.implicits._
    val hotK = 10000
    val rows =
      // the hot order: 10^4 parts in one order (5·10⁷ pairs — far too
      // many to collect, so the comparison below is aggregate-side)
      (0 until hotK).map(p => (1L, p.toLong)) ++
      // normal orders: ≤ 5 parts each, overlapping part space
      (0 until 500).flatMap(o =>
        (0 until 1 + o % 5).map(i => (100L + o, ((o * 13 + i * 7) % 200).toLong)))
    val raw = rows.toDF("o", "p").repartition(8)
    val op = raw.distinct()

    val (pairs, probed) = GraphEdges.coPurchasePairs(op, raw)
    // order-independent fingerprint: (count, Σ xxhash64(o,a,b)) — any
    // lost, duplicated, or altered (order, pair) row moves it
    def fp(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("o"), col("a"), col("b"))
          .cast("decimal(38,0)"))).first()
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    val got = fp(pairs)
    val want = fp(naive(op))
    assert(got == want, s"chunked expansion changed the pairs: " +
      s"$got vs $want")
    assert(got._1 == hotK.toLong * (hotK - 1) / 2 +
      fp(naive(op.filter(col("o") =!= 1L)))._1)
    // one row per (order, unordered pair): no (o,a,b) group exceeds 1
    assert(pairs.groupBy("o", "a", "b").count()
      .filter(col("count") > 1).limit(1).count() == 0,
      "duplicate (order, pair) rows")

    // bounded task skew: the chunk histogram of the hot order — the
    // same hash-chunk assignment the expansion uses — concentrates
    // near Chunk, so each (o, ci, cj) cell carries ≈ Chunk² pairs,
    // never the naive k²/2 in one task
    val nb = math.ceil(hotK.toDouble / GraphEdges.Chunk).toInt
    val chunkSizes = op.filter(col("o") === 1L)
      .select(pmod(xxhash64(col("p")), lit(nb)).cast("int").as("c"))
      .groupBy("c").count().collect().map(_.getLong(1))
    assert(chunkSizes.length == nb)
    assert(chunkSizes.max <= 4L * GraphEdges.Chunk,
      s"hash chunking degenerated: max chunk ${chunkSizes.max}")
    probed.foreach(_.unpersist())
  }

  test("dense-graph fan-out guard bails on one mega-order") {
    import spark.implicits._
    // 12000 parts in one order: rows pass the 2^22 row guard but the
    // pair fan-out (7.2e7 > 2^26) must reject the CSR build
    val op = (0 until 12000).map(p => (1L, p.toLong)).toDF("o", "p")
    assert(graft.operators.DenseGraph.densePath(spark, op).isEmpty)
    assert(graft.operators.DenseGraph.trianglesDense(spark, op).isEmpty)
  }

  test("seeded random heavy-tailed corpora: chunked == naive") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    for (trial <- 1 to 2) {
      // heavy-tailed order sizes: mostly small, a few over the hot
      // bound, part ids colliding across orders
      val rows = (0 until 60).flatMap { o =>
        val k = if (o % 20 == 0) 1100 + rnd.nextInt(800)
          else 1 + rnd.nextInt(8)
        (0 until k).map(i => (o.toLong, rnd.nextInt(3000).toLong))
      }
      val raw = rows.toDF("o", "p").repartition(6)
      val op = raw.distinct()
      val (pairs, probed) = GraphEdges.coPurchasePairs(op, raw)
      def fp(df: org.apache.spark.sql.DataFrame) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("o"), col("a"), col("b"))
            .cast("decimal(38,0)"))).first()
        (r.getLong(0),
          if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
      }
      assert(fp(pairs) == fp(naive(op)), s"trial $trial diverged")
      assert(probed.nonEmpty, s"trial $trial: hot path did not engage")
      probed.foreach(_.unpersist())
    }
  }

  test("normal corpus takes the naive plan and matches it") {
    import spark.implicits._
    val rows = (0 until 300).flatMap(o =>
      (0 until 1 + o % 6).map(i => (o.toLong, ((o * 11 + i * 3) % 97).toLong)))
    val raw = rows.toDF("o", "p")
    val op = raw.distinct()
    val (pairs, probed) = GraphEdges.coPurchasePairs(op, raw)
    // cold corpus: the raw-row probe persists nothing and the plan is
    // byte-identical to the naive self-join
    assert(probed.isEmpty, "probe persisted state on a cold corpus")
    val got = pairs.collect().map(_.toSeq).toSet
    val want = naive(op).collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
