package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r18 mad_outliers rewrite: the single-pass sorted-array
  * aggregate must reproduce the original three-pass exact-percentile
  * formulation ROW-FOR-ROW (same interpolation, same 6-dp rounds, same
  * outlier threshold arithmetic) on every SF the driver checks.
  */
class MadOutliersSpec extends SparkSpec {

  /** The pre-r18 three-pass reference, verbatim. */
  private def reference(d: String): DataFrame = {
    val oc = Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_totalprice").as("x"))
    val med = oc.groupBy("segment")
      .agg(round(expr("percentile(x, 0.5)"), 6).as("med"))
    val dev = oc.join(broadcast(med), Seq("segment"))
      .withColumn("ad", abs(col("x") - col("med")))
    val mad = dev.groupBy("segment")
      .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), Seq("segment"))
      .groupBy("segment")
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        count(when(col("ad") > lit(3.0) * lit(1.4826) * col("mad"), 1))
          .as("n_outliers"))
      .orderBy("segment")
  }

  test("single-pass sorted-array MAD == three-pass exact-percentile " +
      "MAD, bit-for-bit, on every driver SF") {
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val got = graft.queries.AnalyticsQueries
        .madOutliers(spark, sf(dir)).collect()
      val want = reference(sf(dir)).collect()
      assert(got === want, s"divergence at $dir")
    }
  }

  test("interpolation edge: odd and even group sizes, ties") {
    // pos lands exactly on an index (odd n) and exactly between two
    // (even n); tied values exercise the lowerKey == higherKey branch
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 10.0),              // odd: med 2
      ("b", 1.0), ("b", 3.0), ("b", 5.0), ("b", 100.0), // even: med 4
      ("c", 7.0), ("c", 7.0), ("c", 7.0), ("c", 7.0))   // all ties
      .toDF("segment", "x")
    def median(seg: String): Double = {
      val r = df.filter(col("segment") === seg)
        .agg(round(expr("percentile(x, 0.5)"), 6)).head().getDouble(0)
      r
    }
    assert(median("a") == 2.0 && median("b") == 4.0 && median("c") == 7.0)
    // and the array form agrees with the aggregate form on this frame
    val viaArray = df.groupBy("segment")
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .withColumn("n", size(col("xs")))
      .select(col("segment"), round(
        when(ceil(lit(0.5) * (col("n") - 1).cast("double")) ===
            floor(lit(0.5) * (col("n") - 1).cast("double")),
          element_at(col("xs"),
            floor(lit(0.5) * (col("n") - 1).cast("double")).cast("int") + 1))
        .otherwise(
          (ceil(lit(0.5) * (col("n") - 1).cast("double")).cast("double") -
            lit(0.5) * (col("n") - 1).cast("double")) *
            element_at(col("xs"),
              floor(lit(0.5) * (col("n") - 1).cast("double")).cast("int") + 1)
          + (lit(0.5) * (col("n") - 1).cast("double") -
            floor(lit(0.5) * (col("n") - 1).cast("double")).cast("double")) *
            element_at(col("xs"),
              ceil(lit(0.5) * (col("n") - 1).cast("double")).cast("int") + 1)),
        6).as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaArray == Map("a" -> 2.0, "b" -> 4.0, "c" -> 7.0))
  }
}
