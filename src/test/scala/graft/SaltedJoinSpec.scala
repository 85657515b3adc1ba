package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SaltedJoinSpec extends SparkSpec {

  test("salted join is row-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key; dim has one row per key
    val fact = (0L until 2000L)
      .map(i => (i, if (i % 10 == 0) i % 7 else 999L, i * 0.5))
      .toDF("id", "k", "v")
    val dim = (0L until 7L).map(k => (k, s"g$k")).toDF("k", "grp")
      .union(Seq((999L, "hot")).toDF("k", "grp"))
    val plain = fact.join(dim, Seq("k"))
      .select("id", "k", "v", "grp")
    val salted = Skew.saltedJoin(fact, dim, "k", "id", 16)
      .select("id", "k", "v", "grp")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt-unsafe join types are rejected (replicated small side " +
      "would emit unmatched rows factor times)") {
    import spark.implicits._
    val fact = Seq((1L, 1L)).toDF("id", "k")
    val dim = Seq((1L, "a"), (2L, "unmatched")).toDF("k", "grp")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(fact, dim, "k", "id", 4, joinType = jt)
      }
      intercept[IllegalArgumentException] {
        Skew.autoSaltedJoin(fact, dim, "k", "id", 4, 8, joinType = jt)
      }
    }
    // the safe types still work, salted and probed
    assert(Skew.saltedJoin(fact, dim, "k", "id", 4, joinType = "left")
      .count() == 1L)
    assert(Skew.saltedJoin(fact, dim, "k", "id", 4, joinType = "left_anti")
      .count() == 0L)
  }

  test("salt spreads the hot key across buckets and fans the dim side") {
    import spark.implicits._
    val fact = (0L until 512L).map(i => (i, 42L)).toDF("id", "k")
    val dim = Seq((42L, "x")).toDF("k", "grp")
    // internal shape: fact salt column takes >1 distinct value for one
    // hot key (the spread), dim is replicated exactly `factor` ways
    val buckets = 8
    val saltVals = fact
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(buckets)))
      .select("_salt").distinct().count()
    assert(saltVals > 1, "hot key's rows must spread over several salts")
    val fanned = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    assert(fanned.count() === dim.count() * buckets)
    // and the join result is still exactly fact-sized (every row matched)
    assert(Skew.saltedJoin(fact, dim, "k", "id", buckets).count() === 512L)
  }

  test("write-side z-order layout: each written file's stats cover a " +
      "compact rectangle, unlike the unsorted write") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select("l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-zw").toString
    graft.operators.Layout
      .zorder(li, col("l_partkey"), col("l_suppkey"), 10, 8)
      .write.mode("overwrite").parquet(dir + "/z")
    li.repartition(8).write.mode("overwrite").parquet(dir + "/plain")
    def meanBoxArea(path: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("dx"),
          (max("l_suppkey") - min("l_suppkey")).as("dy"))
        .selectExpr("avg(dx * dy)").collect()(0).getDouble(0)
      stats
    }
    val zArea = meanBoxArea(dir + "/z")
    val pArea = meanBoxArea(dir + "/plain")
    // content unchanged by the layout pass
    assert(spark.read.parquet(dir + "/z").count() === li.count())
    // z-order files bound BOTH dims: mean bbox area far below the
    // round-robin write, where every file spans ~the whole domain
    assert(zArea < pArea / 3.0,
      s"z-order mean file bbox $zArea not < 1/3 of plain $pArea")
  }

  test("zorder interleave: zkey round-trips to its source bits") {
    import spark.implicits._
    // exhaustive over 5-bit coords: deinterleave(interleave(x,y)) == (x,y);
    // the codegen mask cascade is cross-checked against an independent
    // shift-and-or formulation (the HOF lambda) below
    val xs = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val got = xs.toDF("xb", "yb")
      .withColumn("zkey",
        graft.functions.Morton.interleave(col("xb"), col("yb"), 10))
      .withColumn("zkey_hof", expr(
        """aggregate(sequence(0, 9), 0L, (acc, i) -> acc
          |  + shiftleft(shiftright(xb, i) & 1, 2 * i)
          |  + shiftleft(shiftright(yb, i) & 1, 2 * i + 1))""".stripMargin))
      .withColumn("x2", expr(
        "aggregate(sequence(0, 9), 0L, (acc, i) -> acc + shiftleft(shiftright(zkey, 2 * i) & 1, i))"))
      .withColumn("y2", expr(
        "aggregate(sequence(0, 9), 0L, (acc, i) -> acc + shiftleft(shiftright(zkey, 2 * i + 1) & 1, i))"))
    assert(got.filter(col("zkey") =!= col("zkey_hof")).count() === 0,
      "codegen cascade must agree with the independent HOF formulation")
    assert(got.filter(col("x2") =!= col("xb") || col("y2") =!= col("yb"))
      .count() === 0)
    // distinct inputs → distinct zkeys (bijection on the binned domain)
    assert(got.select("zkey").distinct().count() === 32L * 32L)
  }
}
