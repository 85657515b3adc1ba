package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashKernels, HllAggregator, HllF, HllSketch}

class HllSpec extends SparkSpec {

  test("rho matches the 50-bit leading-zero definition at the edges") {
    assert(HllSketch.rho(0L) == 51)               // empty pattern
    assert(HllSketch.rho(1L) == 50)               // 49 leading zeros + 1
    assert(HllSketch.rho(2L) == 49)
    assert(HllSketch.rho(3L) == 49)
    assert(HllSketch.rho((1L << 49) - 1) == 2)    // 49-bit value
    assert(HllSketch.rho(1L << 49) == 1)          // top bit of the window
    // max w under the PW modulus stays inside the 50-bit window
    val wMax = (HashKernels.PW - 1) / 256
    assert(wMax < (1L << 50) && HllSketch.rho(wMax) == 1)
  }

  test("update/merge reproduce a sequentially built register file") {
    val hashes = (0 until 5000).map { i =>
      HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"k$i:salt-suffix-mix"),
        HashKernels.PW)
    }
    val ref = new Array[Int](256)
    hashes.foreach { h =>
      val b = (h % 256).toInt
      val r = HllSketch.rho(h / 256)
      if (r > ref(b)) ref(b) = r
    }
    // arbitrary split points: merge(partials) == whole
    val agg = new HllAggregator
    val parts = hashes.grouped(1234).map { chunk =>
      chunk.foldLeft(agg.zero)(agg.reduce)
    }
    val merged = parts.foldLeft(agg.zero)(agg.merge)
    assert(agg.finish(merged).toSeq == ref.toSeq)
    // idempotent re-merge
    assert(agg.merge(merged.clone(), merged.clone()).toSeq == ref.toSeq)
  }

  test("estimate lands within HLL error bounds on 100k distinct keys") {
    // the double-hash key scheme sketch_hll_distinct uses: fold,
    // decimal round-trip, fold with salt (see SketchQueries.hllHash —
    // a single salted fold measures −38% here from lattice bias)
    def h(key: String): Long = {
      val h1 = HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        HashKernels.PW)
      HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          s"$h1:hll256salt-mixer"), HashKernels.PW)
    }
    val agg = new HllAggregator
    var regs = agg.zero
    var i = 0
    while (i < 100000) {
      regs = agg.reduce(regs, h(s"user$i:day"))
      i += 1
    }
    val r = agg.finish(regs)
    val k = r.max
    val s = r.map(v => 1L << (k - v)).sum
    val est = HllSketch.Alpha256 * 65536.0 * (1L << k) / s
    // sigma = 1.04/sqrt(256) = 6.5%; allow ~2 sigma
    assert(math.abs(est - 100000) / 100000 < 0.13, s"estimate $est")
  }

  test("the Spark aggregation equals the driver-side register build") {
    val s = spark
    import s.implicits._
    val df = (0 until 2000).map(i => s"key$i:hll256salt-mixer").toDF("k")
      .repartition(7) // force partial sketches + a real merge
      .select(graft.functions.HashF.polyHashWide(col("k")).as("h"))
    val sparkRegs = df.agg(HllF.hll(col("h")).as("regs"))
      .head.getSeq[Int](0)
    val refAgg = new HllAggregator
    val ref = (0 until 2000).foldLeft(refAgg.zero) { (b, i) =>
      refAgg.reduce(b, HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          s"key$i:hll256salt-mixer"), HashKernels.PW))
    }
    assert(sparkRegs == refAgg.finish(ref).toSeq)
  }

  test("empty input finishes to all-zero registers") {
    val agg = new HllAggregator
    assert(agg.finish(agg.zero).toSeq == Seq.fill(256)(0))
  }

  test("codegen hll_rho equals the bin-length SQL formulation") {
    val s = spark
    import s.implicits._
    val hs = Seq(0L, 1L, 255L, 256L, 257L, 1L << 30, HashKernels.PW - 1,
      (1L << 49) * 256, ((1L << 49) - 1) * 256 + 17)
    val df = hs.toDF("h")
    val got = df.select(HllF.hllRho(col("h"))).as[Int].collect().toSeq
    val want = df.selectExpr(
      "CASE WHEN h div 256 = 0 THEN 51" +
        " ELSE 51 - length(bin(h div 256)) END").as[Int].collect().toSeq
    assert(got == want)
    assert(got == hs.map(h => HllSketch.rho(h / 256)))
  }
}
