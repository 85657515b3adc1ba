package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys
  * (SURVEY "Partitioning & shuffle": salting for skew; AQE's skew-join
  * handles sort-merge spills, but a replicated-broadcast salt is the
  * deterministic fix when one side is small enough to replicate).
  *
  * `saltedJoin(big, small, key, f)`: the big side gets a random-ish but
  * DETERMINISTIC salt in [0, f) derived from a companion column (no
  * rand(): keeps retries/speculative tasks consistent), the small side
  * is exploded f× with every salt value, and the join key becomes
  * (key, salt) — hot keys now spread over f partitions.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: String, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltFrom)), lit(factor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
