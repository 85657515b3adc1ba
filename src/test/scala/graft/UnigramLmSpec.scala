package graft

import graft.pipeline.UnigramLm

/** Correctness load for the unigram-LM trainer (its EM fixed point is
  * not SQL-expressible, so the driver only rows-checks unigram_train —
  * the invariants live here). */
class UnigramLmSpec extends SparkSpec {

  private def costs(m: (String, Long)*) = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    m.foreach { case (k, v) => h.put(k, v) }
    h
  }

  test("Viterbi picks the cheaper multi-char piece") {
    assert(UnigramLm.segment("ab", costs("a" -> 100L, "b" -> 100L,
      "ab" -> 150L)).toSeq == Seq("ab"))
  }

  test("Viterbi tie breaks to the smallest split point") {
    // dp(2): i=0 cost 200 via "ab", i=1 cost 200 via "a"+"b" — the
    // ascending scan with strict < keeps i=0
    assert(UnigramLm.segment("ab", costs("a" -> 100L, "b" -> 100L,
      "ab" -> 200L)).toSeq == Seq("ab"))
  }

  test("missing chars fail loudly") {
    intercept[IllegalArgumentException] {
      UnigramLm.segment("ax", costs("a" -> 100L))
    }
  }

  test("trained vocab: chars floored, round-trip segmentation, " +
      "costs match the in-memory replay") {
    val d = sf("sf0.001")
    val vocab = UnigramLm.train(spark, d)
    assert(vocab.nonEmpty && vocab.size <= UnigramLm.VocabSize)
    // every piece cost is round(1e6·ln(total/usage)) of the SAME table
    val total = vocab.map(_._2).sum
    vocab.foreach { case (p, u, c) =>
      assert(u >= 1L, s"piece '$p' with usage $u")
      assert(c == math.round(1e6 * math.log(total.toDouble / u)),
        s"cost of '$p' diverges from its usage")
    }
    // chars of the corpus alphabet all present (never pruned) and the
    // tokenizer round-trips every corpus word
    val cs = costs(vocab.map(v => (v._1, java.lang.Long.valueOf(v._3)))
      .map { case (k, v) => (k, v.longValue()) }: _*)
    val words = UnigramLm.wordTable(spark, d)
      .select("word").collect().map(_.getString(0))
    words.foreach { w =>
      assert(UnigramLm.segment(w, cs).mkString == w, s"round-trip of '$w'")
    }
  }

  test("unigram_train query emits the vocab deterministically") {
    val d = sf("sf0.001")
    val a = graft.queries.PipelineQueries.unigramTrain(spark, d)
      .collect().map(_.toSeq).toSeq
    val b = graft.queries.PipelineQueries.unigramTrain(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
