package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale corpus curation:
  * exact, n-gram Jaccard (set-similarity join), MinHash+LSH, SimHash.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup is one hash-partitioned groupBy — the canonical
  *    map-side-combinable shuffle;
  *  - the Jaccard join is an inverted-index self-join on shingles: cost
  *    is Σ df(s)² over shingle doc-frequencies, so extremely common
  *    shingles dominate; `maxShingleDocFreq` drops those "stop
  *    shingles" (standard prefix-filtering surrogate) before the join;
  *  - MinHash/LSH replaces the quadratic candidate space with
  *    `bands` hash-partitioned equality joins on band keys, then
  *    verifies only candidates exactly — the classic
  *    shingle→minhash→band→bucket-join pipeline, all shuffle-local;
  *  - SimHash reduces each doc to one 32-bit signature; the pair scan
  *    joins on signature bands or (small n) brute-forces bit_count(xor).
  */
object Dedup {

  /** Exact dedup: representative id + multiplicity per distinct key. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-bigram shingle hashes per doc: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(
          TextHash.shingleHashesCol(TextHash.tokenHashesCol(textCol))))
          .as("s"))

  /** All-pairs n-gram Jaccard ≥ threshold via inverted-index self-join.
    * Output: (id_a, id_b, common, jaccard) with id_a < id_b. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double,
                   maxShingleDocFreq: Option[Long] = None): DataFrame = {
    val sh0 = shingles(df, idCol, textCol)
    val sh = maxShingleDocFreq match {
      case Some(limit) =>
        val dfreq = sh0.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= limit)
        sh0.join(dfreq.select("s"), Seq("s"))
      case None => sh0
    }
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("id_a", "s")
    val b = sh.toDF("id_b", "s")
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      .join(counts.toDF("id_a", "n_a"), Seq("id_a"))
      .join(counts.toDF("id_b", "n_b"), Seq("id_b"))
      .withColumn("jaccard", round(
        col("common") / (col("n_a") + col("n_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** MinHash signature columns mh0..mh{k-1} per doc, plus the distinct
    * shingle array for exact verification. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      array_distinct(
        TextHash.shingleHashesCol(TextHash.tokenHashesCol(textCol)))
        .as("sh"))
    (0 until numHashes).foldLeft(withSh) { (d, k) =>
      d.withColumn(s"mh$k", TextHash.minhashCol(col("sh"), k))
    }
  }

  /** MinHash+LSH near-dup pairs: band-bucket candidate join, then exact
    * Jaccard verification of candidates only. rowsPerBand = numHashes /
    * bands. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 16,
                      bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes)
    val bandKey = (b: Int) =>
      (0 until rows).foldLeft(lit(0L)) { (acc, r) =>
        acc * 131L + col(s"mh${b * rows + r}")
      }
    val banded = sigs.select(col("id"), col("sh"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    val cand = banded.select(col("band"), col("key"), col("id").as("id_a"),
        col("sh").as("sh_a"))
      .join(banded.select(col("band"), col("key"), col("id").as("id_b"),
        col("sh").as("sh_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** 32-bit SimHash from per-occurrence token hashes: bit j of the
    * signature is set iff Σ_tokens (±1 by bit j of tokenHash) > 0. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    val th = TextHash.tokenHashesCol(textCol)
    val sig = (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      val bitSum = aggregate(
        transform(th, h =>
          when(shiftright(h, j) % 2 === 1, lit(1)).otherwise(lit(-1))),
        lit(0L), (a, x) => a + x)
      acc + when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    df.select(col(idCol).as("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within a Hamming radius (brute-force pair
    * scan over the signature table — signatures are 8 bytes/doc, so
    * this is for moderate n; banded equality join otherwise). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, bits: Int = 32): DataFrame = {
    val sigs = simhash(df, idCol, textCol, bits)
    sigs.toDF("id_a", "sig_a")
      .crossJoin(sigs.toDF("id_b", "sig_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(expr("sig_a ^ sig_b")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
