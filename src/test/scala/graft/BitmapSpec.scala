package graft

import org.apache.spark.sql.functions._

import graft.functions.{BitmapF, RoaringLite => R}

/** RoaringLite exact-distinct bitmap: container algebra (sparse
  * insert, dense promotion at 4097, OR-merge in every kind pairing),
  * equivalence with a reference Set under adversarial interleavings,
  * and the ObjectHashAggregate partial plan shape. */
class BitmapSpec extends SparkSpec {

  private def stateOf(keys: Seq[Long]): Array[Array[Long]] =
    keys.foldLeft(Array.empty[Array[Long]])(R.add)

  test("sparse container stays sorted, exact-sized, idempotent") {
    val ks = Seq(7L, 3L, 3L, 9L, 0L, 65535L, 7L)
    val st = stateOf(ks)
    assert(st.length == 1)
    val c = st(0)
    assert(!R.isDense(c) && R.card(c) == 5)
    assert(c.length == 2 + (5 + 3) / 4) // exact sizing, no padding
    assert((0 until 5).map(R.low(c, _)) == Seq(0, 3, 7, 9, 65535))
  }

  test("dense promotion at 4097 members, cardinality maintained") {
    // stride-3 lows so the sparse phase exercises packed shifting
    val lows = (0 until 4097).map(i => (i * 3 % 65536).toLong)
    val st = stateOf(lows)
    assert(st.length == 1)
    val c = st(0)
    assert(R.isDense(c) && R.card(c) == 4097)
    assert(c.length == 2 + R.DenseWords)
    // re-adding any member is a no-op
    val st2 = R.add(st, lows(1234))
    assert(R.cardinality(st2) == 4097)
  }

  test("merge matches Set semantics across all container pairings") {
    // sparse+sparse (stays sparse), sparse+sparse (promotes),
    // sparse+dense, dense+dense — plus cross-container keys
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(3000)(rnd.nextInt(200000).toLong)
    val b = Seq.fill(3000)(rnd.nextInt(200000).toLong)
    val big = (0 until 5000).map(i => 300000L + i * 2) // dense block
    for ((l, r) <- Seq((a, b), (a, big), (big, a ++ b), (big, big))) {
      val m = R.merge(stateOf(l), stateOf(r))
      assert(R.cardinality(m) == (l ++ r).toSet.size)
      // merged state equals the state built from the union directly
      val direct = stateOf(l ++ r)
      assert(m.length == direct.length)
      m.zip(direct).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("merge is commutative and the zero state is an identity") {
    val a = stateOf(Seq(1L, 99999L, 5L))
    val b = stateOf(Seq(5L, 70000L))
    val ab = R.merge(a, b); val ba = R.merge(b, a)
    assert(ab.length == ba.length)
    ab.zip(ba).foreach { case (x, y) => assert(x.sameElements(y)) }
    assert(R.merge(Array.empty, a).sameElements(a))
    assert(R.merge(a, Array.empty).sameElements(a))
  }

  test("aggregate equals countDistinct on real data; plan is " +
      "ObjectHashAggregate with a map-side partial") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").as("k"))
    val q = ev.groupBy("event_type")
      .agg(BitmapF.bitmap(col("k")).as("state"))
      .select(col("event_type"),
        expr("aggregate(state, 0L, (acc, c) -> acc + (c[1] & 4294967295))")
          .as("n"))
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.toLowerCase.contains("partial_bitmapaggregator"),
      plan.take(800))
  }

  test("second-level bitmapMerge rollup equals global countDistinct") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").as("k"))
    val rolled = ev.groupBy("event_type")
      .agg(BitmapF.bitmap(col("k")).as("state"))
      .agg(BitmapF.bitmapMerge(col("state")).as("state"))
      .select(expr("aggregate(state, 0L, (acc, c) -> acc + (c[1] & 4294967295))"))
      .collect()(0).getLong(0)
    val exact = ev.select(countDistinct(col("k"))).collect()(0).getLong(0)
    assert(rolled == exact)
  }
}
