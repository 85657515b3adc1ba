package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HashF, HllF, HllSketch}

/** Sketch operators beyond KMV/CMS/histogram: HyperLogLog distinct
  * counting and theta-style set-operation estimation. All sketches here
  * are DETERMINISTIC (house polynomial hash, no seed) so the DuckDB
  * oracle pins the sketch state itself, not a tolerance band.
  */
object SketchQueries {

  import graft.functions.HashKernels.PW

  // ------------------------------------------------------ HLL distinct
  /** HyperLogLog daily-active-users sketch: distinct (user, epoch-day)
    * pairs per event type — the canonical HLL workload (DAU/uniques at
    * 100 TB, where exact distinct is a full shuffle of every key and
    * HLL is one 1 KiB register array per group). The `__all__` row is
    * built by MERGING the five per-type register arrays (elementwise
    * max), not by re-scanning events — the mergeability that lets a
    * 1000-executor cluster pre-aggregate per partition and combine.
    *
    * Outputs pin the full register state cross-engine: `v_zero` (empty
    * registers), `k_max` (max rho), `reg_checksum` (position-weighted
    * rho sum — pins WHICH bucket holds which value), `s_num` (the
    * harmonic-sum numerator S = Σ 2^(k_max − rho_j), an exact integer
    * ≤ 256·2^51), and two estimates derived from them: the raw HLL
    * estimate alpha·m²·2^k_max/S (pure IEEE arithmetic, no libm) and
    * the linear-counting estimate m·ln(m/V) that the standard
    * small-range correction would select (−1 when V = 0).
    *
    * HLL needs its hash uniform in every bit, and a single polynomial
    * fold is NOT: a bare "user:day" key peaks near 31^10 ≈ 8e14 « PW
    * (high bits constant — measured k_max collapse), and salting only
    * multiplies the key state by 31^k mod PW, whose lattice structure
    * (three-distance theorem) biases the extreme-value rho statistic
    * at depth (measured −38% at 100k distinct). The fix is DOUBLE
    * hashing through a decimal round-trip — h = ph(str(ph(key)) ‖
    * salt) — which is nonlinear over the field (digit expansion), so
    * the lattice dissolves; measured within 1σ (6.5%) at 1.6k, 10k
    * and 100k distinct. Both engines express it as nested folds. */
  val HllSalt = "hll256salt-mixer"

  /** cross-engine HLL key hash: fold, decimal round-trip, fold again */
  def hllHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    HashF.polyHashWide(concat_ws(":", HashF.polyHashWide(c), lit(HllSalt)))

  def sketchHll(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("event_type"),
        hllHash(concat_ws(":", col("user_id"),
          expr("ts_us div 86400000000"))).as("h"))
    val perType = ev.groupBy("event_type").agg(HllF.hll(col("h")).as("regs"))

    // union sketch from the five per-type sketches: elementwise max,
    // rebuilt into a register array (5×256 rows — driver-scale).
    val unionRegs = perType
      .select(posexplode(col("regs")).as(Seq("pos", "rho")))
      .groupBy("pos").agg(max("rho").as("rho"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("rho")))),
        x => x.getField("rho")).as("regs"))
      .select(lit("__all__").as("event_type"), col("regs"))

    val regRows = perType.unionByName(unionRegs)
      .select(col("event_type"), posexplode(col("regs")).as(Seq("pos", "rho")))

    val base = regRows.groupBy("event_type").agg(
      max(col("rho")).as("k_max"),
      sum(when(col("rho") === 0, 1L).otherwise(0L)).as("v_zero"),
      sum((col("pos") + 1) * col("rho")).as("reg_checksum"))
    val sNum = regRows
      .join(broadcast(base.select(col("event_type"), col("k_max"))),
        Seq("event_type"))
      .groupBy("event_type")
      .agg(sum(expr("shiftleft(1L, cast(k_max - rho as int))")).as("s_num"))

    // "exact" = distinct HASHES, not key strings, so this exchange too
    // carries only longs (collision odds ≈ n²/2^59 — immaterial even
    // at 10^9 keys, and both engines count the identical hash set)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("h")).as("n_exact"))
      .unionByName(ev.agg(countDistinct(col("h")).as("n_exact"))
        .select(lit("__all__").as("event_type"), col("n_exact")))

    base.join(sNum, Seq("event_type")).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        col("v_zero"), col("k_max"), col("reg_checksum"), col("s_num"),
        round(lit(HllSketch.Alpha256) * lit(65536.0) *
          expr("cast(shiftleft(1L, cast(k_max as int)) as double)") /
          col("s_num"), 2).as("hll_estimate"),
        when(col("v_zero") > 0,
          round(lit(256.0) * log(lit(256.0) / col("v_zero")), 2))
          .otherwise(lit(-1.0)).as("lc_estimate"))
      .orderBy("event_type")
  }

  /** house polynomial hash mod PW of SQL expression `v`, DuckDB form */
  private def polyHashSqlW(v: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | [CAST(ascii(substr($v, CAST(i AS INT), 1)) AS BIGINT)
       |  FOR i IN range(1, length($v)+1)]),
       | (a, b) -> (a * 31 + b) % $PW)""".stripMargin

  val sketchHllSql: String = {
    val k = "CAST(user_id AS VARCHAR) || ':' || " +
      "CAST(epoch_us(ts) // 86400000000 AS VARCHAR)"
    s"""
    WITH keys AS (SELECT event_type, $k AS k FROM events
      WHERE user_id IS NOT NULL),
    h1 AS (SELECT event_type,
      CAST(${polyHashSqlW("k")} AS VARCHAR) || ':$HllSalt' AS k2
      FROM keys),
    hashes AS (SELECT DISTINCT event_type, ${polyHashSqlW("k2")} AS h
      FROM h1),
    rhos AS (SELECT event_type, h % 256 AS bucket,
        MAX(CASE WHEN h // 256 = 0 THEN 51
                 ELSE 51 - length(bin(h // 256)) END) AS rho
      FROM hashes GROUP BY 1, 2),
    regall AS (SELECT * FROM rhos
      UNION ALL
      SELECT '__all__', bucket, MAX(rho) FROM rhos GROUP BY 2),
    types AS (SELECT DISTINCT event_type FROM regall),
    regs AS (SELECT t.event_type, g.i AS bucket, COALESCE(r.rho, 0) AS rho
      FROM types t CROSS JOIN (SELECT UNNEST(range(256)) AS i) g
      LEFT JOIN regall r
        ON t.event_type = r.event_type AND g.i = r.bucket),
    km AS (SELECT event_type, MAX(rho) AS k_max,
        CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
        CAST(SUM((bucket + 1) * rho) AS BIGINT) AS reg_checksum
      FROM regs GROUP BY 1),
    sn AS (SELECT r.event_type,
        CAST(SUM(CAST(1 AS BIGINT) << (k_max - rho)) AS BIGINT) AS s_num
      FROM regs r JOIN km USING (event_type) GROUP BY 1),
    exact AS (SELECT event_type, COUNT(DISTINCT h) AS n_exact FROM hashes
        GROUP BY 1
      UNION ALL
      SELECT '__all__', COUNT(DISTINCT h) FROM hashes)
    SELECT km.event_type, n_exact, v_zero, k_max, reg_checksum, s_num,
      ROUND((0.7213/(1+1.079/256.0)) * 65536.0 *
        CAST(CAST(1 AS BIGINT) << k_max AS DOUBLE) / s_num, 2)
        AS hll_estimate,
      CASE WHEN v_zero > 0 THEN ROUND(256.0 * ln(256.0 / v_zero), 2)
           ELSE -1.0 END AS lc_estimate
    FROM km JOIN sn USING (event_type) JOIN exact USING (event_type)
    ORDER BY event_type"""
  }

  // --------------------------------------------- theta-sketch set ops
  /** Theta-style set-operation estimation from KMV sketches (the
    * Datasketches theta-sketch shape): estimate |A ∩ B| and Jaccard
    * between two distinct-key sets — here "user-days with a click" vs
    * "user-days with a view" — WITHOUT ever joining the raw key sets.
    * Each side keeps its k = 128 smallest distinct hashes (the KMV
    * aggregator: constant state, map-side combined); the combined
    * threshold θ = min(θ_A, θ_B) defines a uniform sample of the key
    * universe, inside which retained-hash intersection counts scale by
    * PW/θ to estimate the true intersection. At 100 TB each side's
    * sketch is 1 KiB on the wire where the exact answer is a full
    * key-set shuffle; the exact columns here exist to EXHIBIT the
    * sketch error, and the whole result is deterministic (house
    * double-hash, no seed) so the oracle pins the retained sets
    * bit-for-bit. Unsaturated sides degrade gracefully: θ = PW and the
    * "sample" is the whole set, so the estimate is exact. */
  def sketchSetOverlap(s: SparkSession, d: String): DataFrame = {
    val k = 128
    val keys = Tables.events(s, d)
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("click", "view"))
      .select(col("event_type"),
        concat_ws(":", col("user_id"),
          expr("ts_us div 86400000000")).as("k"))
    val hashes = keys.select(col("event_type"), hllHash(col("k")).as("h"))
    def sketch(t: String, as: String) =
      hashes.filter(col("event_type") === t)
        .agg(graft.functions.KmvF.kmvArray(k)(col("h")).as(as))
    val j = sketch("click", "ska").crossJoin(broadcast(sketch("view", "skb")))
      .withColumn("n_ret_a", size(col("ska")).cast("long"))
      .withColumn("n_ret_b", size(col("skb")).cast("long"))
      .withColumn("theta", least(
        when(col("n_ret_a") < k, lit(PW))
          .otherwise(element_at(col("ska"), col("n_ret_a").cast("int"))),
        when(col("n_ret_b") < k, lit(PW))
          .otherwise(element_at(col("skb"), col("n_ret_b").cast("int")))))
      .withColumn("n_sample",
        size(filter(array_intersect(col("ska"), col("skb")),
          x => x < col("theta"))).cast("long"))
      .withColumn("n_union_sample",
        size(filter(array_distinct(concat(col("ska"), col("skb"))),
          x => x < col("theta"))).cast("long"))
    val da = keys.filter(col("event_type") === "click").select("k").distinct()
    val db = keys.filter(col("event_type") === "view").select("k").distinct()
    val exact = da.agg(count(lit(1)).as("n_a_exact"))
      .crossJoin(broadcast(db.agg(count(lit(1)).as("n_b_exact"))))
      .crossJoin(broadcast(
        da.join(db, "k").agg(count(lit(1)).as("n_inter_exact"))))
    j.crossJoin(broadcast(exact))
      .select(col("n_a_exact"), col("n_b_exact"), col("n_inter_exact"),
        col("n_ret_a"), col("n_ret_b"), col("theta"),
        col("n_sample"), col("n_union_sample"),
        round(col("n_sample") * (lit(PW.toDouble) / col("theta")), 2)
          .as("est_inter"),
        round(col("n_inter_exact").cast("double") /
          (col("n_a_exact") + col("n_b_exact") - col("n_inter_exact")), 6)
          .as("jaccard_exact"),
        round(col("n_sample").cast("double") / col("n_union_sample"), 6)
          .as("jaccard_est"))
  }

  val sketchSetOverlapSql: String = {
    val key = "CAST(user_id AS VARCHAR) || ':' || " +
      "CAST(epoch_us(ts) // 86400000000 AS VARCHAR)"
    s"""
    WITH keys AS (SELECT event_type, $key AS k FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')),
    h1 AS (SELECT event_type,
      CAST(${polyHashSqlW("k")} AS VARCHAR) || ':$HllSalt' AS k2
      FROM keys),
    hashes AS (SELECT DISTINCT event_type, ${polyHashSqlW("k2")} AS h
      FROM h1),
    sa AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM hashes WHERE event_type = 'click') WHERE rn <= 128),
    sb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM hashes WHERE event_type = 'view') WHERE rn <= 128),
    th AS (SELECT LEAST(
        (SELECT CASE WHEN COUNT(*) < 128 THEN $PW ELSE MAX(h) END FROM sa),
        (SELECT CASE WHEN COUNT(*) < 128 THEN $PW ELSE MAX(h) END FROM sb))
        AS theta,
      (SELECT COUNT(*) FROM sa) AS n_ret_a,
      (SELECT COUNT(*) FROM sb) AS n_ret_b),
    samp AS (SELECT
      (SELECT COUNT(*) FROM sa JOIN sb USING (h), th WHERE h < theta)
        AS n_sample,
      (SELECT COUNT(DISTINCT h) FROM
        (SELECT h FROM sa UNION ALL SELECT h FROM sb) u, th
        WHERE h < theta) AS n_union_sample),
    exact AS (SELECT
      (SELECT COUNT(DISTINCT k) FROM keys WHERE event_type = 'click')
        AS n_a_exact,
      (SELECT COUNT(DISTINCT k) FROM keys WHERE event_type = 'view')
        AS n_b_exact,
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT k FROM keys WHERE event_type = 'click') x
        JOIN (SELECT DISTINCT k FROM keys WHERE event_type = 'view') y
        USING (k)) AS n_inter_exact)
    SELECT n_a_exact, n_b_exact, n_inter_exact, n_ret_a, n_ret_b, theta,
      n_sample, n_union_sample,
      ROUND(n_sample * (CAST($PW AS DOUBLE) / theta), 2) AS est_inter,
      ROUND(CAST(n_inter_exact AS DOUBLE) /
        (n_a_exact + n_b_exact - n_inter_exact), 6) AS jaccard_exact,
      ROUND(CAST(n_sample AS DOUBLE) / n_union_sample, 6) AS jaccard_est
    FROM exact CROSS JOIN th CROSS JOIN samp"""
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("sketch_hll_distinct", sketchHll, Some(sketchHllSql)),
    QuerySpec("sketch_set_overlap", sketchSetOverlap,
      Some(sketchSetOverlapSql)))
}
