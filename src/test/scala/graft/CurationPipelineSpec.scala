package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** The full training-data-curation flow composed end-to-end over the
  * real documents table: quality filter → near-dup detection →
  * clustering → representative selection → fingerprint manifest →
  * curated parquet. Each stage is one of the operators the engine
  * ships; this asserts they compose into the pipeline the engine
  * exists for.
  */
class CurationPipelineSpec extends SparkSpec {

  test("documents → quality filter → dedup → representatives → manifest") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val total = docs.count()

    // 1. quality gate: keep docs with enough substance
    val quality = TextAnalysis.quality(docs, "doc_id", "text")
      .filter(col("n_tokens") >= 20 && col("quality_score") > 0.1)
    val kept = quality.select("doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < total)

    val corpus = docs.join(kept, Seq("doc_id"))

    // 2. near-dup pairs + clusters over the surviving corpus
    val pairs = Dedup.jaccardPairsAuto(corpus, "doc_id", "text", 0.5)
    val clusters = Dedup.clusterPairs(pairs)
    val nClustered = clusters.count()

    // 3. representative = min doc id per cluster; drop other members
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id"))
    val curated = corpus.join(losers, Seq("doc_id"), "left_anti")
    val nCurated = curated.count()
    assert(nCurated == nKept - losers.count())

    // the known sf0.01 near-dup pairs imply at least one drop
    assert(nClustered == 0 || nCurated < nKept)

    // 4. manifest: fingerprints for the curated corpus, written out
    val manifest = TextAnalysis.fingerprint(curated, "doc_id", "text")
      .join(curated.select("doc_id", "lang", "source"), Seq("doc_id"))
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    manifest.write.mode("overwrite").parquet(s"$out/manifest")
    curated.write.mode("overwrite").parquet(s"$out/corpus")
    assert(spark.read.parquet(s"$out/corpus").count() == nCurated)
    assert(spark.read.parquet(s"$out/manifest").count() == nCurated)
  }
}
