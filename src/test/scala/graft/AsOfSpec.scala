package graft

import org.apache.spark.sql.functions.col

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  test("as-of join: inclusive, latest-wins, null when nothing precedes") {
    import spark.implicits._
    val left = Seq((1L, 5L, "l1"), (1L, 10L, "l2"), (2L, 3L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 1L, 100L, "a"), (1L, 5L, 101L, "b"),
      (1L, 7L, 102L, "c"))
      .toDF("k", "t", "rid", "rv")
    val out = AsOf.joinAsOf(left, right, key = "k",
        leftTime = "t", rightTime = "t", rightTie = "rid")
      .orderBy("t").collect()
    val byTag = out.map(r => r.getAs[String]("tag") -> r).toMap
    // t=5: right row at t=5 included (inclusive)
    assert(byTag("l1").getAs[org.apache.spark.sql.Row]("asof")
      .getAs[String]("rv") == "b")
    // t=10: latest preceding is t=7
    assert(byTag("l2").getAs[org.apache.spark.sql.Row]("asof")
      .getAs[String]("rv") == "c")
    // key 2 has no right rows → null
    assert(byTag("l3").isNullAt(byTag("l3").fieldIndex("asof")))
  }

  test("as-of join matches a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (1 to 500).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble()))
    val lDf = left.toDF("k", "t", "lid")
    val rDf = right.toDF("k", "t", "rid", "rv")
    val got = AsOf.joinAsOf(lDf, rDf, "k", "t", "t", "rid")
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // brute force: latest right with t <= left.t; ties -> max rid
    val expected = left.map { case (k, t, lid) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) -1L
              else cands.maxBy(r => (r._2, r._3))._3)
    }.toMap
    assert(got == expected)
  }

  test("timestamp time columns keep sub-second precision") {
    import spark.implicits._
    // right at .900 is AFTER left at .100 — a seconds-truncating cast
    // would collapse both to t=0 and wrongly match it (right side sorts
    // before left at equal t)
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.1"), "l"))
      .toDF("k", "t", "tag")
    val right = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 09:59:59.5"), 1L, "before"),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.9"), 2L, "after"))
      .toDF("k", "t", "rid", "rv")
    val out = AsOf.joinAsOf(left, right, "k", "t", "t", "rid").collect()(0)
    assert(out.getAs[org.apache.spark.sql.Row]("asof")
      .getAs[String]("rv") == "before")
  }

  test("right-side ties at equal time resolve to max tie-break") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1L, "first"), (1L, 5L, 9L, "last"))
      .toDF("k", "t", "rid", "rv")
    val out = AsOf.joinAsOf(left, right, "k", "t", "t", "rid").collect()(0)
    assert(out.getAs[org.apache.spark.sql.Row]("asof")
      .getAs[String]("rv") == "last")
  }

  test("TIMESTAMP_NTZ time columns join at micros precision " +
      "(a bare cast-to-long on NTZ is an AnalysisException)") {
    import spark.implicits._
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("t", col("t").cast("timestamp_ntz"))
    val left = ntz(Seq((1L, "2024-01-01 10:00:00.1", "l"))
      .toDF("k", "t", "tag"))
    val right = ntz(Seq(
        (1L, "2024-01-01 09:59:59.5", 1L, "before"),
        (1L, "2024-01-01 10:00:00.9", 2L, "after"))
      .toDF("k", "t", "rid", "rv"))
    assert(left.schema("t").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val out = AsOf.joinAsOf(left, right, "k", "t", "t", "rid").collect()(0)
    // sub-second semantics preserved: .9 is after .1, only .5 precedes
    assert(out.getAs[org.apache.spark.sql.Row]("asof")
      .getAs[String]("rv") == "before")
  }
}
