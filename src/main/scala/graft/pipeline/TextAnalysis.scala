package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: quality scoring,
  * language identification, token statistics, document fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs), all
  * integer/exact arithmetic where cross-engine determinism matters.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document quality metrics: token counts, average token length,
    * stopword ratio, and a bounded composite score. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTokens = size(toks)
    val stopHits = size(filter(toks, t => t.isInCollection(Stopwords)))
    df.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round((length(col(textCol)) - (nTokens - 1)).cast("double") / nTokens, 6)
        .as("avg_token_len"),
      round(stopHits.cast("double") / nTokens, 6).as("stop_ratio"),
      round(least(lit(1.0), nTokens.cast("double") / 100.0) *
        (lit(1.0) - stopHits.cast("double") / nTokens), 6).as("quality_score"))
  }

  /** Boilerplate stripping for web-scraped text (the step before any
    * quality/dedup pass in a crawl pipeline): removes HTML tags and
    * bare URLs, decodes the common character entities, collapses
    * whitespace. A pure codegen'd regexp/replace chain — the regexes
    * use only the portable subset (character classes, no lookaround),
    * so any engine reproduces the output byte-for-byte. */
  def cleanText(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val noUrls = regexp_replace(noTags, "https?://[^ ]+", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    val decoded = entities.foldLeft(noUrls) { case (acc, (e, ch)) =>
      replace(acc, lit(e), lit(ch))
    }
    // &amp; decodes LAST: "&amp;lt;" is the escaped TEXT "&lt;", not a tag
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** PII scrubbing patterns (the redaction pass every public training
    * corpus runs): emails, North-American-style phone numbers, IPv4
    * addresses. Portable regex subset (no lookaround) — Java regex and
    * RE2 agree byte-for-byte. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+",
      "<EMAIL>"),
    ("phone", "[0-9][0-9][0-9][-. ][0-9][0-9][0-9][-. ][0-9][0-9][0-9][0-9]",
      "<PHONE>"),
    ("ip", "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>"))

  /** Redact PII in place; order matters (emails before IPs — an email
    * host could otherwise half-match) and is identical cross-engine. */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** Count of matches for one PII kind (the audit column a redaction
    * run reports alongside the cleaned text): split on the pattern,
    * matches = parts − 1 — the typed `split` builder takes the regex
    * verbatim, dodging SQL string-literal backslash mangling, and the
    * oracle mirrors it as len(string_split_regex) − 1. */
  def piiCount(c: Column, kind: String): Column = {
    val re = PiiPatterns.find(_._1 == kind).get._2
    (size(split(c, re)) - 1).cast("long")
  }

  /** Marker-word sets per language (over the corpus vocabulary);
    * deterministic argmax with alphabetical tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "batch", "stream"),
    "en" -> Seq("the", "a", "scan", "join", "query"),
    "es" -> Seq("el", "la", "de", "data", "row"),
    "fr" -> Seq("le", "la", "et", "filter", "merge"),
    "zh" -> Seq("shi", "de", "le", "sort", "hash"))

  /** Language-ID heuristic: count marker-word hits per language, pick
    * the max (ties → alphabetically first language). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // struct ordering: (score asc, -rank asc) → max = best score, then
    // alphabetically first language
    val scored = array(LangMarkers.zipWithIndex.map { case ((lang, ws), r) =>
      struct(
        size(filter(toks, t => t.isInCollection(ws))).as("score"),
        lit(-r).as("neg_rank"), lit(lang).as("lang"))
    }: _*)
    df.select(col(idCol),
      array_max(scored).getField("lang").as("pred_lang"),
      array_max(scored).getField("score").cast("long").as("score"))
  }

  /** Global token frequency top-k (ordered by count desc, token asc). */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Rolling-hash document fingerprint: polynomial hash of every 8-char
    * window (fixed 31^k weights, mod [[TextHash.P]]); emits the minimum
    * window hash (winnowing-style representative) and the distinct
    * window count. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // one custom-kernel eval per document (graft.functions.Fingerprint8):
    // a single pass over the text beats any per-window SQL shape —
    // substr(_, i, 1) is O(i) on UTF8 strings and higher-order lambdas
    // are interpreted, so expression-level variants are 10-100× slower
    df.select(col(idCol),
        graft.functions.HashF.fingerprint8(col(textCol)).as("fp"))
      .select(col(idCol), col("fp.fingerprint").as("fingerprint"),
        col("fp.n_distinct_grams").as("n_distinct_grams"))

  def pow31(k: Int): Long = (0 until k).foldLeft(1L)((a, _) => a * 31L)
}
