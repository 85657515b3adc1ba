package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the fact side, fan out the dimension.
  *
  * A plain `fact ⋈ dim ON key` hash-partitions both sides by `key`; at
  * 100 TB a power-law key (one user with 10⁸ events, one hot product)
  * lands an entire executor's worth of rows on a single shuffle
  * partition and the stage runs at the speed of that one straggler
  * task. Salting rewrites the join PHYSICALLY while preserving its
  * logical result: the fact side gets `salt = pmod(h, buckets)` from a
  * per-row column (so a hot key's rows spread over `buckets`
  * partitions), and the dimension side is replicated `buckets` ways so
  * every (key, salt) pair still finds its match. Cost: dim × buckets
  * rows through the dim-side exchange — the standard trade, cheap
  * whenever dim ≪ fact, which is exactly the skewed-join case.
  *
  * This is the manual form of what AQE's `skewJoin` does adaptively;
  * it exists as an operator because (a) AQE only splits at
  * runtime-detected thresholds and cannot split a single hot KEY's
  * build-side match, and (b) pipelines want the rewrite deterministic
  * and plan-visible (ScaleSpec asserts on it) rather than
  * heuristic.
  */
object SaltedJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, salted `buckets`
    * ways. `saltSource` must be a fact-side column (any type; hashed) —
    * use a unique id so the spread is uniform. Row-for-row identical to
    * `fact.join(dim, key)`. */
  def join(fact: DataFrame, dim: DataFrame, key: String,
           saltSource: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val fanned = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(fanned, Seq(key, "__salt")).drop("__salt")
  }
}
