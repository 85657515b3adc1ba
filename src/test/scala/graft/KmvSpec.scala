package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvAggregator, KmvF}

class KmvSpec extends SparkSpec {

  test("reduce keeps a sorted distinct buffer bounded at k") {
    val a = new KmvAggregator(4)
    var buf = a.zero
    Seq(50L, 10L, 30L, 10L, 40L, 20L, 5L).foreach(h => buf = a.reduce(buf, h))
    // k=4 smallest distinct of {50,10,30,40,20,5} = {5,10,20,30}
    assert(buf.toSeq == Seq(5L, 10L, 20L, 30L))
    // larger than current max at capacity: unchanged
    assert(a.reduce(buf, 99L).toSeq == Seq(5L, 10L, 20L, 30L))
    assert(a.finish(buf) == graft.functions.KmvSummary(4, 30L))
  }

  test("merge min-merges sorted buffers, dropping duplicates") {
    val a = new KmvAggregator(4)
    val m = a.merge(Array(1L, 5L, 9L), Array(2L, 5L, 7L, 11L))
    assert(m.toSeq == Seq(1L, 2L, 5L, 7L))
    assert(a.merge(Array.emptyLongArray, Array(3L)).toSeq == Seq(3L))
    assert(a.merge(Array(3L), Array.emptyLongArray).toSeq == Seq(3L))
    // fully duplicate inputs collapse
    assert(a.merge(Array(1L, 2L), Array(1L, 2L)).toSeq == Seq(1L, 2L))
  }

  test("aggregator equals the distinct+window formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.functions.HashF.polyHash(col("user_id").cast("string")).as("h"))
    val viaAgg = df.groupBy("event_type")
      .agg(KmvF.kmv(k)(col("h")).as("kmv"))
      .select(col("event_type"), col("kmv.kk").as("kk"), col("kmv.hk").as("hk"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val viaWindow = df.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("int").as("kk"), max(col("h")).as("hk"))
    val a = viaAgg.collect().map(r => r.getString(0) ->
      ((r.getInt(1), r.getLong(2)))).toMap
    val b = viaWindow.collect().map(r => r.getString(0) ->
      ((r.getInt(1), r.getLong(2)))).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }
}
