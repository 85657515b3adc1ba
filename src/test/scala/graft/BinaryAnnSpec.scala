package graft

import org.apache.spark.sql.functions._

import graft.functions.VecF
import graft.pipeline.Similarity

/** SignPack/HammingDist kernels and the two-stage binary retrieval
  * plan: signature correctness vs a Scala reference, Hamming algebra,
  * and the stage-1 shape (bounded TopK partial aggregate; the float
  * vector column absent from the Hamming scan's output). */
class BinaryAnnSpec extends SparkSpec {

  private def refSig(v: Array[Float]): Array[Long] = {
    val out = new Array[Long]((v.length + 31) / 32)
    v.indices.foreach(i => if (v(i) >= 0f) out(i / 32) |= 1L << (i % 32))
    out
  }

  test("SignPack matches the Scala reference on real embeddings") {
    val rows = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("embedding"), VecF.signPack(col("embedding")).as("sig"))
      .limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      assert(r.getSeq[Long](1).toArray.sameElements(refSig(v)))
    }
  }

  test("HammingDist equals popcount-of-xor on the packed words") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), VecF.signPack(col("embedding")).as("sig"))
    val pairs = e.toDF("ia", "sa").crossJoin(e.toDF("ib", "sb"))
      .filter(col("ia") < col("ib")).limit(50)
      .select(col("sa"), col("sb"), VecF.hamming(col("sa"), col("sb")).as("h"))
      .collect()
    pairs.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      val want = a.zip(b).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      assert(r.getInt(2) == want)
    }
  }

  test("stage 1 plans as a bounded TopK partial over signatures only") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val q = Similarity.binaryTopK(emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 3, prefilter = 16)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(plan.toLowerCase.contains("partial_topkaggregator"),
      plan.take(1200))
    assert(plan.contains("hamming_dist"), plan.take(1200))
    // the rerank rows exist and respect the k bound
    val rows = q.collect()
    assert(rows.nonEmpty && rows.length <= 4 * 3)
  }

  test("rerank equals brute force restricted to the Hamming survivors") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter(col("vec_id") < 4)
    // with prefilter >= corpus size the prefilter is a no-op, so the
    // result must equal the exact brute-force top-k outright
    val n = emb.count().toInt
    val got = Similarity.binaryTopK(emb, queries, "vec_id", "embedding",
        k = 5, prefilter = n)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank").collect()
    val want = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
        && g.getDouble(2) == w.getDouble(2) && g.getInt(3) == w.getInt(3))
    }
  }
}
