package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashF, HashKernels, KmvF}

/** Theta-sketch intersection estimation (the sketch_set_overlap query's
  * engine): planted-overlap properties on synthetic key sets. */
class SketchOverlapSpec extends SparkSpec {

  private def hash(c: org.apache.spark.sql.Column) =
    HashF.polyHashWide(concat_ws(":", HashF.polyHashWide(c),
      lit("hll256salt-mixer")))

  /** build (theta, n_sample) from two kmvArray sketches at k */
  private def overlay(k: Int, aKeys: Seq[String], bKeys: Seq[String]) = {
    val s = spark
    import s.implicits._
    val a = aKeys.toDF("k").select(hash(col("k")).as("h"))
      .agg(KmvF.kmvArray(k)(col("h")).as("ska"))
    val b = bKeys.toDF("k").select(hash(col("k")).as("h"))
      .agg(KmvF.kmvArray(k)(col("h")).as("skb"))
    val row = a.crossJoin(b)
      .withColumn("na", size(col("ska"))).withColumn("nb", size(col("skb")))
      .withColumn("theta", least(
        when(col("na") < k, lit(HashKernels.PW))
          .otherwise(element_at(col("ska"), col("na"))),
        when(col("nb") < k, lit(HashKernels.PW))
          .otherwise(element_at(col("skb"), col("nb")))))
      .withColumn("n_sample",
        size(filter(array_intersect(col("ska"), col("skb")),
          x => x < col("theta"))))
      .select("theta", "n_sample").head
    (row.getLong(0), row.getInt(1))
  }

  test("saturated sketches estimate a planted intersection within 3 sigma") {
    val a = (0 until 6000).map(i => s"key$i")
    val b = (3000 until 9000).map(i => s"key$i") // |A∩B| = 3000
    val k = 256
    val (theta, nSample) = overlay(k, a, b)
    assert(theta < HashKernels.PW) // both sides saturated
    val est = nSample * (HashKernels.PW.toDouble / theta)
    // nSample ~ Binomial(3000, theta/PW); sigma/mean ~ 1/sqrt(nSample)
    val sigma = 3000.0 / math.sqrt(math.max(nSample, 1))
    assert(math.abs(est - 3000) < 3 * sigma,
      s"est $est from $nSample sample hits, theta $theta")
  }

  test("unsaturated sketches degrade to the exact intersection") {
    val a = (0 until 100).map(i => s"key$i")
    val b = (60 until 160).map(i => s"key$i") // |A∩B| = 40
    val (theta, nSample) = overlay(256, a, b)
    assert(theta == HashKernels.PW)
    assert(nSample == 40)
  }

  test("disjoint sets estimate zero") {
    val a = (0 until 5000).map(i => s"left$i")
    val b = (0 until 5000).map(i => s"right$i")
    val (_, nSample) = overlay(128, a, b)
    assert(nSample == 0)
  }
}
