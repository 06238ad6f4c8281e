package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.pipeline.QualityFilters

/** Training-corpus quality/cleaning gates: Gopher-style quality signals,
  * top-n-gram repetition, PII scrubbing, URL normalization, HTML stripping,
  * C4 line filtering, and corpus-level duplicate-line analysis. PII/URL/
  * HTML/line inputs are synthesized deterministically from document fields
  * on BOTH the Spark and DuckDB sides, so the regex/cleaning logic is
  * exercised on content that actually contains the artifacts. */
object QualityQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** text || ' contact user<id>@mail.example.com or 555-<dddd> from 10.1.<b>.7' */
  private def piiAugmented: org.apache.spark.sql.Column =
    F.concat(F.col("text"),
      F.lit(" contact user"), F.col("doc_id").cast("string"),
      F.lit("@mail.example.com or 555-"),
      F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
      F.lit(" from 10.1."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"))

  /** Multi-line view of the single-line synthetic docs: sentence-break at
    * frequent filler words (same rewrite in the oracle). */
  private def multiLine: org.apache.spark.sql.Column =
    F.regexp_replace(F.col("text"), " (table|value) ", ".\n")

  val queries: Map[String, Q] = Map(
    "q_quality_gopher" -> ((s, dir) => {
      QualityFilters.withGopherSignals(t(s, dir, "documents"), "text",
        keep = Seq("doc_id")).orderBy("doc_id")
    }),
    "q_quality_score" -> ((s, dir) => {
      QualityFilters.withQualityScore(t(s, dir, "documents"), "text",
        keep = Seq("doc_id")).orderBy("doc_id")
    }),
    "q_quality_unigram_lm" -> ((s, dir) => {
      QualityFilters.unigramLogProb(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 2000).orderBy("doc_id")
    }),
    "q_quality_bigram_lm" -> ((s, dir) => {
      QualityFilters.bigramLogProb(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 2000).orderBy("doc_id")
    }),
    "q_quality_kn_lm" -> ((s, dir) => {
      QualityFilters.knBigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    "q_repetition_topgram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(QualityFilters.wordCount(F.col("text")) >= 2)
      QualityFilters.topNgramFraction(docs, "doc_id", "text", n = 2)
        .orderBy("doc_id")
    }),
    "q_pii_scrub" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(F.col("doc_id"), piiAugmented.as("aug"))
      val counts = QualityFilters.piiCounts(F.col("aug"))
      aug.select(
        F.col("doc_id") +:
          QualityFilters.scrubPii(F.col("aug")).as("scrubbed") +:
          counts.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id").limit(2000)
    }),
    "q_url_normalize" -> ((s, dir) => {
      val urls = t(s, dir, "documents").select(F.col("doc_id"),
        F.concat(F.lit("https://WWW.Example.com/Path/"),
          F.col("doc_id").cast("string"),
          F.lit("/?utm_source=x&ref="), F.col("lang"), F.lit("#frag")).as("url"))
      urls.select(F.col("doc_id"), F.col("url"),
        QualityFilters.normalizeUrl(F.col("url")).as("url_norm"),
        QualityFilters.urlDomain(F.col("url")).as("domain"))
        .orderBy("doc_id").limit(2000)
    }),
    "q_html_strip" -> ((s, dir) => {
      val html = t(s, dir, "documents").select(F.col("doc_id"),
        F.concat(F.lit("<html><body><p class=\"intro\">"),
          F.substring(F.col("text"), 1, 80),
          F.lit(" &amp; tail &lt;x&gt;</p><br/></body></html>")).as("html"))
      html.select(F.col("doc_id"),
        QualityFilters.stripHtml(F.col("html")).as("clean"),
        QualityFilters.htmlTagCount(F.col("html")).as("n_tags"))
        .orderBy("doc_id").limit(2000)
    }),
    "q_c4_lines" -> ((s, dir) => {
      val m = t(s, dir, "documents").select(F.col("doc_id"), multiLine.as("multi"))
      val parts = QualityFilters.c4LineFilter(F.col("multi"), minWords = 5)
      m.select(F.col("doc_id") +: parts.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),
    "q_dup_lines" -> ((s, dir) => {
      val m = t(s, dir, "documents").select(F.col("doc_id"), multiLine.as("multi"))
      QualityFilters.duplicateLines(m, "doc_id", "multi")
        .orderBy(F.col("n_occurrences").desc, F.col("line"))
        .limit(5000)
    }),
    "q_dedup_paragraph" -> ((s, dir) => {
      val m = t(s, dir, "documents").select(F.col("doc_id"), multiLine.as("multi"))
      QualityFilters.removeCommonLines(m, "doc_id", "multi", maxDocs = 3)
        .orderBy("doc_id")
    })
  )
}
