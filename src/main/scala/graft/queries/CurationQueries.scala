package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.LongType

import graft.pipeline.Domains

/** Domain-level curation gates: registered-domain extraction, per-domain
  * corpus statistics, per-domain contribution caps, and blocklist
  * filtering — the host-side steps of a C4/RefinedWeb-style web-corpus
  * pipeline. The documents table carries no URL column, so one is
  * synthesized deterministically from `doc_id` on BOTH the Spark and
  * DuckDB sides, mixing subdomain depth, userinfo, ports, query strings,
  * and two-label public-suffix TLDs so the extraction logic is exercised
  * on realistic shapes. */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Deterministic URL synthesized from doc_id (same formula in the
    * oracle SQL): rotates subdomain prefix (incl. a two-level one),
    * site number, TLD (incl. `co.uk`), userinfo, port, and query. */
  private def synthUrl: Column = {
    val id = F.col("doc_id")
    F.concat(F.lit("HTTPS://"),
      F.when(id % 5 === 0, F.lit("u:pw@")).otherwise(F.lit("")),
      F.when(id % 4 === 0, F.lit("www."))
        .when(id % 4 === 1, F.lit("blog."))
        .when(id % 4 === 2, F.lit("a.b."))
        .otherwise(F.lit("")),
      F.lit("site"), (id % 11).cast("string"), F.lit("."),
      F.when(id % 3 === 0, F.lit("co.uk"))
        .when(id % 3 === 1, F.lit("com"))
        .otherwise(F.lit("org")),
      F.when(id % 6 === 0, F.lit(":8443")).otherwise(F.lit("")),
      F.lit("/p/"), id.cast("string"),
      F.when(id % 7 === 0, F.lit("?x=1")).otherwise(F.lit("")))
  }

  private def withUrl(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(F.col("doc_id"), F.col("text"), synthUrl.as("url"))

  val queries: Map[String, Q] = Map(
    "q_domain_stats" -> ((s, dir) => {
      Domains.domainStats(withUrl(s, dir), "url", "text")
        .orderBy("domain")
    }),
    "q_domain_cap" -> ((s, dir) => {
      Domains.capPerDomain(withUrl(s, dir), "url", "doc_id", maxDocs = 5)
        .select(F.col("domain"), F.col("rk").cast(LongType).as("rk"),
          F.col("doc_id"))
        .orderBy("domain", "rk")
    }),
    "q_domain_blocklist" -> ((s, dir) => {
      Domains.filterBlockedDomains(withUrl(s, dir), "url",
          blocked = Seq("site1.com", "site4.co.uk", "site7.org"))
        .select(F.col("doc_id"), F.col("domain"))
        .orderBy("doc_id")
    }),
    "q_corpus_card" -> ((s, dir) => {
      // per-language dataset card: counts, totals, and EXACT p50/p95
      // length order statistics
      graft.pipeline.Report.corpusCard(docs(s, dir), "lang", "text", "doc_id")
        .orderBy("lang")
    }),
    "q_histogram_group" -> ((s, dir) => {
      // per-language length histograms over each language's own range
      graft.pipeline.Report.histogramByGroup(
          docs(s, dir).select("lang", "n_chars"), "lang", "n_chars", bins = 10)
        .orderBy("lang", "bin")
    }),
    "q_histogram" -> ((s, dir) => {
      // exact equi-width length histogram (20 bins): range broadcast,
      // row-local bin function, one keyed count
      graft.pipeline.Report.histogram(
          docs(s, dir).select("n_chars"), "n_chars", bins = 20)
        .orderBy("bin")
    }),
    "q_text_scripts" -> ((s, dir) => {
      // script-mix profiling: per-doc writing-system fractions + dominant
      // script over deterministically mixed-script text (the documents
      // table is ASCII, so non-Latin snippets are appended by doc_id)
      import graft.pipeline.TextAnalysis
      val aug = F.concat(F.col("text"),
        F.when(F.col("doc_id") % 4 === 0, F.lit(" Привет мир 123"))
          .when(F.col("doc_id") % 4 === 1, F.lit(" 你好世界"))
          .when(F.col("doc_id") % 4 === 2, F.lit(" مرحبا بالعالم"))
          .otherwise(F.lit(" αβγ δέλτα")))
      // ONE staged code-point kernel pass (ScriptMixStats) feeds the
      // dominant-script argmax and all six fractions — was 12+ regex
      // scans per doc; values bit-identical, oracle unchanged
      val staged = docs(s, dir).select(F.col("doc_id"),
        TextAnalysis.scriptStats(aug).as("td_ss"))
      staged.select(
          F.col("doc_id") +:
            TextAnalysis.dominantScriptFromStats(F.col("td_ss"))
              .as("script") +:
            TextAnalysis.scriptFractionsFromStats(F.col("td_ss"))
              .map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),
    "q_compression_ratio" -> ((s, dir) => {
      // deflate ratio window filter — no SQL analog (rows-only gate by
      // contract, like q_text_winnow); PipelineSpec pins known orderings
      graft.pipeline.QualityFilters.withCompressionRatio(
          docs(s, dir), "text", "doc_id")
        .orderBy("id")
    }),
    "q_vocab_coverage" -> ((s, dir) => {
      graft.pipeline.Vocab.byCoverage(docs(s, dir), "text", coverage = 0.95)
        .orderBy(F.col("cnt").desc, F.col("token"))
    }),
    "q_heavy_hitters" -> ((s, dir) => {
      graft.pipeline.Vocab.heavyHitters(docs(s, dir), "text", minFrac = 0.001)
        .orderBy(F.col("cnt").desc, F.col("token"))
    }),
    // the Misra-Gries sketch + exact-verify path must emit the IDENTICAL
    // heavy-hitter set — same oracle as q_heavy_hitters
    "q_heavy_hitters_twopass" -> ((s, dir) => {
      graft.pipeline.Vocab.heavyHittersTwoPass(docs(s, dir), "text",
          minFrac = 0.001)
        .orderBy(F.col("cnt").desc, F.col("token"))
    }),
    "q_token_kl" -> ((s, dir) => {
      // corpus-drift card: smoothed KL divergence in both directions over
      // the top-500 combined vocabulary + lumped tail (en vs non-en)
      val d = docs(s, dir)
      graft.pipeline.Vocab.tokenKlDivergence(
        d.where(F.col("lang") === "en"), d.where(F.col("lang") =!= "en"),
        "text", topK = 500)
    }),
    // Zipf rank-frequency fit: least-squares ln(freq) ~ ln(rank) over the
    // top-20 tokens, libm ln + rank-sorted folds — alpha hash-matches the
    // identical arithmetic in SQL.
    "q_vocab_zipf" -> ((s, dir) => {
      graft.pipeline.Vocab.zipfFit(docs(s, dir), "text", topK = 20)
    }))
}
