package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.expressions.WordShingles

/** Training-corpus quality filtering and text-cleaning operators: the
  * document-level signals a 100 TB pretraining pipeline runs before dedup —
  * Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models",
  * §A1.1), C4-style line filtering (Raffel et al. 2020, §2.2), repetition
  * counters, PII scrubbing, URL normalization and HTML stripping.
  *
  * Scale design: every per-document signal is a pure column expression
  * evaluated in the scan's projection (no shuffle, no UDF); the one
  * corpus-level operator (duplicate-line analysis) and the per-document
  * top-n-gram counter are single-shuffle groupBys on bounded keys. Where a
  * signal needs per-token work that HOF lambdas would evaluate interpreted,
  * it is re-expressed over whole-string regex counters (codegen'd) or the
  * native [[WordShingles]] kernel.
  */
object QualityFilters {

  // ---------------------------------------------------------- word signals

  /** Words = maximal non-space runs, the tokenizer all counters share. */
  def wordCount(text: Column): Column = F.regexp_count(text, F.lit("\\S+"))

  /** Mean word length without materializing a token array: non-whitespace
    * chars / words. */
  def meanWordLength(text: Column): Column =
    F.char_length(F.regexp_replace(text, "\\s+", "")).cast("double") /
      F.nullif(wordCount(text), F.lit(0))

  /** Gopher's symbol-to-word ratio: '#' and ellipsis occurrences per word. */
  def symbolWordRatio(text: Column): Column =
    (F.regexp_count(text, F.lit("#")) +
      F.regexp_count(text, F.lit("\\.\\.\\.|…"))).cast("double") /
      F.nullif(wordCount(text), F.lit(0))

  /** Words containing at least one alphabetic character. Counted with a
    * word-boundary regex, not a per-token lambda. */
  def alphaWordCount(text: Column): Column =
    F.regexp_count(text, F.lit("\\S*[A-Za-z]\\S*"))

  /** Distinct stopwords present (Gopher requires >= 2). `array_intersect`
    * is a native collection op — no lambda. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  def stopwordHits(text: Column): Column =
    F.size(F.array_intersect(
      F.array_distinct(F.split(F.lower(text), "\\s+")),
      F.array(Stopwords.map(F.lit): _*)))

  /** Gopher-style document quality flags + pass verdict (thresholds from
    * the paper, word-count bounds relaxed for short synthetic docs).
    * Single-column composable form, built from the regex counters — for
    * whole-frame scoring prefer [[withGopherSignals]], which computes all
    * counters in one pass over the text. */
  def gopherSignals(text: Column): Seq[(String, Column)] = {
    val wc = wordCount(text)
    val mwl = meanWordLength(text)
    val sym = symbolWordRatio(text)
    val alphaFrac = alphaWordCount(text).cast("double") / F.nullif(wc, F.lit(0))
    val stops = stopwordHits(text)
    gopherVerdict(wc, mwl, sym, alphaFrac, stops)
  }

  private def gopherVerdict(wc: Column, mwl: Column, sym: Column,
      alphaFrac: Column, stops: Column): Seq[(String, Column)] = Seq(
    "word_count" -> wc,
    "mean_word_len" -> mwl,
    "symbol_ratio" -> sym,
    "alpha_word_frac" -> alphaFrac,
    "stopword_hits" -> stops,
    "passes_gopher" -> (wc.between(10, 100000) &&
      mwl.between(2.0, 12.0) && (sym < 0.1) &&
      (alphaFrac > 0.8) && (stops >= 2)))

  /** Frame-level Gopher scoring through the single-pass
    * [[graft.expressions.TextQualityStats]] kernel: ~5 regex scans per doc
    * collapse into one character scan. The struct is materialized in its
    * own projection — CollapseProject does not inline a non-cheap alias
    * referenced eight times, so the kernel runs ONCE per row (PlanSpec
    * asserts exactly one occurrence in the plan) and the ratio arithmetic
    * in the outer projection stays codegen'd. Output values are
    * bit-identical to [[gopherSignals]]; the q_quality_gopher oracle is
    * shared. */
  def withGopherSignals(df: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame = {
    val stats = "$td.__tqs"
    val staged = df.select(keep.map(F.col) :+
      graft.expressions.TextQualityStats(F.col(textCol), Stopwords).as(stats): _*)
    val st = F.col(s"`$stats`")
    val wc = st.getField("word_count")
    val wcN = F.nullif(wc, F.lit(0))
    val sig = gopherVerdict(
      wc,
      st.getField("nonws_chars").cast("double") / wcN,
      st.getField("symbol_count").cast("double") / wcN,
      st.getField("alpha_words").cast("double") / wcN,
      st.getField("stopword_hits"))
    staged.select(keep.map(F.col) ++ sig.map { case (n, c) => c.as(n) }: _*)
  }

  // ------------------------------------------------------ quality scoring

  /** Linear quality score in [0, 1] over the Gopher signal family — a
    * fastText-shaped linear scorer with fixed, documented weights instead
    * of learned ones (no model artifact in this environment). Deliberately
    * pure rational arithmetic — no exp/log — so the identical SQL
    * formulation produces bit-equal doubles and the gate hash-matches
    * against the DuckDB oracle.
    *
    * Components (each clamped to [0, 1]):
    *   length    — saturating word count, full credit at 256 words;
    *   word len  — closeness of mean word length to 5 chars (English-ish);
    *   symbols   — 1 − 10× the symbol-to-word ratio, floored at 0;
    *   alpha     — fraction of words containing a letter;
    *   stopwords — distinct stopword hits, full credit at 4.
    * Weights 0.15/0.15/0.2/0.3/0.2. Empty documents (0 words) score an
    * EXPLICIT null: `least` in both Spark and DuckDB ignores nulls rather
    * than propagating them, so without the guard an empty doc would
    * silently collect the alpha term's full credit. */
  def scoreFromSignals(wc: Column, mwl: Column, sym: Column,
      alphaFrac: Column, stops: Column): Column = {
    val lenScore   = F.least(wc, F.lit(256)).cast("double") / F.lit(256.0)
    val mwlScore   = F.lit(1.0) - F.least(F.abs(mwl - F.lit(5.0)), F.lit(5.0)) / F.lit(5.0)
    val symScore   = F.lit(1.0) - F.least(sym * F.lit(10.0), F.lit(1.0))
    val alphaScore = F.least(alphaFrac, F.lit(1.0))
    val stopScore  = F.least(stops, F.lit(4)).cast("double") / F.lit(4.0)
    F.when(wc > 0,
      F.lit(0.15) * lenScore + F.lit(0.15) * mwlScore + F.lit(0.2) * symScore +
        F.lit(0.3) * alphaScore + F.lit(0.2) * stopScore)
      .otherwise(F.lit(null).cast("double"))
  }

  /** Pass threshold for [[scoreFromSignals]]. */
  val ScoreThreshold = 0.6

  /** Frame-level quality scoring through the single-pass
    * [[graft.expressions.TextQualityStats]] kernel (same staging trick as
    * [[withGopherSignals]]: the kernel runs once per row, the score
    * arithmetic stays codegen'd). Appends `quality_score` and
    * `passes_quality`. */
  def withQualityScore(df: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame = {
    val stats = "$td.__tqs"
    val staged = df.select(keep.map(F.col) :+
      graft.expressions.TextQualityStats(F.col(textCol), Stopwords).as(stats): _*)
    val st = F.col(s"`$stats`")
    val wc = st.getField("word_count")
    val wcN = F.nullif(wc, F.lit(0))
    val score = scoreFromSignals(
      wc,
      st.getField("nonws_chars").cast("double") / wcN,
      st.getField("symbol_count").cast("double") / wcN,
      st.getField("alpha_words").cast("double") / wcN,
      st.getField("stopword_hits"))
    staged.select(keep.map(F.col) ++ Seq(
      score.as("quality_score"),
      (score >= ScoreThreshold).as("passes_quality")): _*)
  }

  // ------------------------------------------------ perplexity-proxy LM

  /** CCNet-style perplexity-proxy scoring (Wenzek et al., LREC 2020 —
    * bucket/filter documents by language-model score). The stand-in LM is
    * an add-one-smoothed unigram model estimated from the corpus itself:
    * `score(doc) = mean over tokens of -ln p(tok)` with
    * `p(tok) = (c+1)/(T+V+1)`, `c` the token's corpus count (0 outside the
    * vocabulary), `T` total tokens, `V` retained vocabulary size. Lower =
    * more typical text; token-less documents score null.
    *
    * Scale: the LM estimate is one map-side-combined count aggregation.
    * The vocabulary keeps the `vocabSize` most frequent tokens (ties
    * broken lexicographically), so the per-token probe is a broadcast
    * hash join — no shuffle of the token stream for the lookup; the only
    * token-level exchange is the per-document regroup. The per-document
    * mean folds an `array_sort`ed list sequentially, so the double sum is
    * order-deterministic under any partitioning (the same discipline as
    * the cosine kernel); the fold is one interpreted HOF per document —
    * per-doc cost, not per-token, and only in the final aggregation
    * projection. T and V are O(1) driver scalars (Ivf-centroid class). */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 100000, out: String = "avg_nll"): DataFrame = {
    val tok = "$td.__tok"
    val nll = "$td.__nll"
    val toks = docs.select(F.col(idCol),
        F.explode(F.split(F.lower(F.trim(F.col(textCol))), "\\s+")).as(tok))
      .where(F.col(s"`$tok`") =!= "")
    val counts = toks.groupBy(F.col(s"`$tok`")).agg(F.count(F.lit(1)).as("c"))
    val vocab = counts.orderBy(F.col("c").desc, F.col(s"`$tok`").asc).limit(vocabSize)
    // sum over an empty counts frame is a null cell, not 0
    val totalRow = counts.agg(F.sum("c")).head
    val totalT = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val vSize = vocab.count()
    // libm-consistent ln kernel, not F.log: Spark's log codegens to
    // StrictMath.log, 1 ulp off glibc on some arguments — this gate's
    // arguments happened to agree, but the BM25 gate proved the hazard
    // is real, so every oracle-compared log goes through the kernel
    val scored = toks.join(F.broadcast(vocab), Seq(tok), "left")
      .withColumn(nll, -graft.expressions.MathKernels.ln(
        ((F.coalesce(F.col("c"), F.lit(0L)) + F.lit(1L)).cast("double") /
          F.lit((totalT + vSize + 1).toDouble)).cast("double")))
      .groupBy(F.col(idCol)).agg(
        (F.aggregate(F.array_sort(F.collect_list(F.col(s"`$nll`"))),
          F.lit(0.0), (acc, x) => acc + x) / F.count(F.lit(1))).as(out))
    docs.select(F.col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Interpolated bigram LM scoring — the next rung above
    * [[unigramLogProb]] on the CCNet ladder (Jelinek-Mercer mixture
    * smoothing, Chen & Goodman 1998):
    *
    *   p(w2|w1) = λ·c(w1w2)/c(w1·) + (1-λ)·p_uni(w2)
    *   score(doc) = mean over bigram instances of -ln p
    *
    * with the same add-one-smoothed capped-vocab unigram as the fallback
    * term. Documents with <2 tokens score null. λ defaults to 0.75
    * (exactly representable, so the gate's SQL oracle folds identically).
    *
    * Scale: bigram counts are one map-side-combined aggregation shuffled
    * on (w1,w2); the context totals c(w1·) derive FROM that relation (no
    * second corpus pass); the unigram vocab broadcasts. The probe joins
    * the doc bigram stream to the count relations on their natural keys —
    * Catalyst broadcasts them while they fit and sort-merges beyond.
    * Per-doc means fold sorted, so scores are partition-invariant. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 100000, lambda: Double = 0.75,
      out: String = "avg_nll2"): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    // stage the token array before the bigram lambda: element_at inside a
    // transform re-inlines its producer per element (the DSIR/SQ8 no-CSE
    // trap), which would re-split the document once per bigram
    val toksStaged = F.col("`$td.__btoks`")
    val bigrams = F.when(F.size(toksStaged) >= 2,
      F.transform(F.sequence(F.lit(0), F.size(toksStaged) - 2),
        i => F.struct(F.element_at(toksStaged, i + 1).as("w1"),
          F.element_at(toksStaged, i + 2).as("w2"))))
      .otherwise(F.array())
    val big = docs
      .select(F.col(idCol), F.filter(
        F.split(F.lower(F.trim(F.col(textCol))), "\\s+"), t => t =!= "")
        .as("$td.__btoks"))
      .select(F.col(idCol), F.explode(bigrams).as("bg"))
      .select(F.col(idCol), F.col("bg.w1").as("w1"), F.col("bg.w2").as("w2"))
    val c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(F.sum("c12").as("c1"))
    // unigram fallback: identical estimate to unigramLogProb
    val tok = "$td.__tok"
    val toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(textCol))), "\\s+")).as(tok))
      .where(F.col(s"`$tok`") =!= "")
    val counts = toks.groupBy(F.col(s"`$tok`")).agg(F.count(F.lit(1)).as("cu"))
    val vocab = counts.orderBy(F.col("cu").desc, F.col(s"`$tok`").asc).limit(vocabSize)
    val totalRow = counts.agg(F.sum("cu")).head
    val totalT = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val vSize = vocab.count()
    val pUni = (F.coalesce(F.col("cu"), F.lit(0L)) + F.lit(1L)).cast("double") /
      F.lit((totalT + vSize + 1).toDouble)
    val pMl = F.col("c12").cast("double") / F.col("c1").cast("double")
    val nll = "$td.__nll2"
    val scored = big
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(F.broadcast(vocab.withColumnRenamed(tok, "w2")), Seq("w2"), "left")
      .withColumn(nll, -graft.expressions.MathKernels.ln(
        ((F.lit(lambda) * pMl) + (F.lit(1.0 - lambda) * pUni)).cast("double")))
      .groupBy(F.col(idCol)).agg(
        (F.aggregate(F.array_sort(F.collect_list(F.col(s"`$nll`"))),
          F.lit(0.0), (acc, x) => acc + x) / F.count(F.lit(1))).as(out))
    docs.select(F.col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Interpolated Kneser-Ney bigram scoring — the top rung of the
    * smoothing ladder (Chen & Goodman 1998 §4.1.6; Kneser & Ney 1995):
    *
    *   p(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *              + (D/c(w1·)) · N1+(w1·) · p_cont(w2)
    *   p_cont(w2) = N1+(·w2) / N1+(··)
    *
    * with absolute discount D and the continuation distribution built
    * from bigram TYPE counts (how many distinct contexts a word follows)
    * rather than token counts — the property that makes KN the standard
    * for perplexity-style corpus filtering. Scores are the mean −ln p
    * over a document's bigram instances against the corpus-wide counts
    * (so every probed bigram is observed and the discounted term is
    * strictly positive); documents with <2 tokens score null. D defaults
    * to 0.75 (exactly representable — the oracle's folds match bit for
    * bit).
    *
    * Scale: everything derives from the single (w1,w2) count relation —
    * context totals AND forward type counts in one groupBy(w1), backward
    * type counts in one groupBy(w2), the type total as a 1-row aggregate;
    * no second corpus pass. The probe joins the doc bigram stream on its
    * natural keys; per-doc means fold sorted for partition invariance. */
  def knBigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75, out: String = "avg_nll_kn"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val toksStaged = F.col("`$td.__ktoks`")
    val bigrams = F.when(F.size(toksStaged) >= 2,
      F.transform(F.sequence(F.lit(0), F.size(toksStaged) - 2),
        i => F.struct(F.element_at(toksStaged, i + 1).as("w1"),
          F.element_at(toksStaged, i + 2).as("w2"))))
      .otherwise(F.array())
    val big = docs
      .select(F.col(idCol), F.filter(
        F.split(F.lower(F.trim(F.col(textCol))), "\\s+"), t => t =!= "")
        .as("$td.__ktoks"))
      .select(F.col(idCol), F.explode(bigrams).as("bg"))
      .select(F.col(idCol), F.col("bg.w1").as("w1"), F.col("bg.w2").as("w2"))
    val c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).as("c12"))
    // context totals and forward continuation counts in ONE pass over c12
    val ctx = c12.groupBy("w1").agg(
      F.sum("c12").as("c1"), F.count(F.lit(1)).as("n1f"))
    val n1b = c12.groupBy("w2").agg(F.count(F.lit(1)).as("n1b"))
    val typesRow = c12.agg(F.count(F.lit(1))).head
    val nTypes = typesRow.getLong(0)
    val c1d = F.col("c1").cast("double")
    val p = (F.greatest(F.col("c12").cast("double") - F.lit(discount), F.lit(0.0)) / c1d) +
      (((F.lit(discount) / c1d) * F.col("n1f").cast("double")) *
        (F.col("n1b").cast("double") / F.lit(nTypes.toDouble)))
    val nll = "$td.__nllkn"
    val scored = big
      .join(c12, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(n1b, Seq("w2"))
      .withColumn(nll, -graft.expressions.MathKernels.ln(p.cast("double")))
      .groupBy(F.col(idCol)).agg(
        (F.aggregate(F.array_sort(F.collect_list(F.col(s"`$nll`"))),
          F.lit(0.0), (acc, x) => acc + x) / F.count(F.lit(1))).as(out))
    docs.select(F.col(idCol)).join(scored, Seq(idCol), "left")
  }

  // ----------------------------------------------------------- repetition

  /** Per-document top word-n-gram and the fraction of characters it covers
    * (Gopher's duplicate/top n-gram fraction family). One shuffle on
    * (doc, gram); ties broken by gram lexicographically for determinism.
    *
    * Returns (idCol, top_gram, top_gram_count, top_gram_char_frac). */
  def topNgramFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val toks = F.split(F.lower(F.trim(F.col(textCol))), "\\s+")
    val grams = df
      .select(F.col(idCol), F.char_length(F.col(textCol)).as("n_chars_total"),
        F.explode(WordShingles.all(toks, n)).as("gram"))
    val counts = grams.groupBy(idCol, "n_chars_total", "gram").count()
    val w = Window.partitionBy(idCol)
      .orderBy(F.col("count").desc, F.col("gram").asc)
    counts
      .withColumn("rn", F.row_number().over(w))
      .where(F.col("rn") === 1)
      .select(F.col(idCol), F.col("gram").as("top_gram"),
        F.col("count").as("top_gram_count"),
        (F.char_length(F.col("gram")) * F.col("count")).cast("double")
          ./(F.col("n_chars_total")).as("top_gram_char_frac"))
  }

  // ----------------------------------------------------------- scrubbing

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails/phones/IPv4s with typed placeholders; order matters
    * (emails first so their digits don't half-match the phone pattern). */
  def scrubPii(text: Column): Column = {
    val e = F.regexp_replace(text, EmailRe, "<EMAIL>")
    val p = F.regexp_replace(e, PhoneRe, "<PHONE>")
    F.regexp_replace(p, Ipv4Re, "<IP>")
  }
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> F.regexp_count(text, F.lit(EmailRe)),
    "n_phones" -> F.regexp_count(text, F.lit(PhoneRe)),
    "n_ips" -> F.regexp_count(text, F.lit(Ipv4Re)))

  // ------------------------------------------------------------- URL ops

  /** Canonical URL: lowercase, scheme and www. stripped, query/fragment
    * dropped, trailing slash removed. */
  def normalizeUrl(url: Column): Column = {
    val lower = F.lower(url)
    val noScheme = F.regexp_replace(lower, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = F.regexp_replace(noScheme, "^www\\.", "")
    val noQuery = F.regexp_replace(noWww, "[?#].*$", "")
    F.regexp_replace(noQuery, "/$", "")
  }

  /** Registrable host part of a normalized URL. */
  def urlDomain(url: Column): Column =
    F.regexp_extract(normalizeUrl(url), "^([^/]+)", 1)

  // ------------------------------------------------------------ HTML ops

  /** Strip tags, decode the common entities, collapse whitespace. Pure
    * regexp_replace chain — stays inside codegen. */
  def stripHtml(html: Column): Column = {
    val noTags = F.regexp_replace(html, "<[^>]*>", " ")
    val decoded = Seq(
      "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        F.regexp_replace(c, java.util.regex.Pattern.quote(ent), ch) }
    F.trim(F.regexp_replace(decoded, "\\s+", " "))
  }
  def htmlTagCount(html: Column): Column =
    F.regexp_count(html, F.lit("<[^>]*>"))

  // ------------------------------------------------------- line filtering

  /** C4-style line filter: keep lines with >= minWords words that end in
    * terminal punctuation; returns (kept_text, n_lines_total, n_lines_kept).
    *
    * The per-line predicate runs as an array HOF — acceptable here because
    * it is a single shallow lambda per document (C4's own filter is a
    * per-line Python loop); the heavy per-token work stays in the regex
    * counters above. */
  def c4LineFilter(text: Column, minWords: Int = 5): Seq[(String, Column)] = {
    val lines = F.split(text, "\n")
    val kept = F.filter(lines, l =>
      (F.regexp_count(l, F.lit("\\S+")) >= minWords) &&
        l.rlike("[.!?]\\s*$"))
    Seq(
      "kept_text" -> F.array_join(kept, "\n"),
      "n_lines_total" -> F.size(lines),
      "n_lines_kept" -> F.size(kept))
  }

  // ------------------------------------------- corpus-level line dedup

  /** Global duplicate-line analysis (the line/paragraph analog of exact
    * document dedup): explode lines, one shuffle on the line text, report
    * each duplicated line with its first-owner doc and occurrence count.
    * Keep-first is deterministic on (docId, position). */
  def duplicateLines(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 1): DataFrame = {
    val lines = df.select(F.col(idCol),
      F.posexplode(F.split(F.col(textCol), "\n")).as(Seq("pos", "line")))
      .where(F.char_length(F.trim(F.col("line"))) >= minLen)
    lines.groupBy("line").agg(
      F.count(F.lit(1)).as("n_occurrences"),
      F.min(F.struct(F.col(idCol), F.col("pos"))).as("first"))
      .where(F.col("n_occurrences") > 1)
      .select(F.col("line"), F.col("n_occurrences"),
        F.col(s"first.$idCol").as("first_doc"),
        F.col("first.pos").as("first_pos"))
  }

  /** CCNet-style common-paragraph removal (Wenzek et al. 2020 §4.1; also
    * the Dolma "paragraph dedup" pass): drop every line that occurs in
    * >= `maxDocs` DISTINCT documents corpus-wide, reassemble each
    * document from its surviving lines in original order, and report
    * kept/total line counts. Unlike [[duplicateLines]] (the detection
    * report), this is the transform a pipeline actually applies —
    * boilerplate navigation/footer paragraphs vanish from every page
    * that carries them.
    *
    * Scale shape: lines group on the md5 of the line text, not the text
    * itself — a 32-char shuffle key regardless of paragraph length.
    * Two shuffles total (hash-keyed distinct-doc count, then the doc
    * reassembly groupBy); the count join is hash-keyed equi so the
    * common-line set never needs to fit anywhere whole. Lines shorter
    * than `minLen` after trim pass through uncounted but are preserved
    * in the reassembled text only if `keepShort` (CCNet drops empty
    * lines; keeping them is the lossless default here). */
  def removeCommonLines(df: DataFrame, idCol: String, textCol: String,
      maxDocs: Int = 2, minLen: Int = 1, keepShort: Boolean = true): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = df.select(F.col(idCol),
      F.posexplode(F.split(F.col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("short", F.char_length(F.trim(F.col("line"))) < minLen)
      .withColumn("h", F.md5(F.col("line").cast("binary")))
    val common = lines.where(!F.col("short"))
      .groupBy("h")
      .agg(F.count_distinct(F.col(idCol)).as("n_docs"))
      .where(F.col("n_docs") >= maxDocs)
      .select(F.col("h"), F.lit(true).as("common"))
    lines.join(common, Seq("h"), "left")
      .withColumn("keep",
        F.when(F.col("short"), F.lit(keepShort))
          .otherwise(F.col("common").isNull))
      .groupBy(F.col(idCol))
      .agg(
        F.array_join(
          F.transform(
            F.array_sort(F.collect_list(
              F.when(F.col("keep"), F.struct(F.col("pos"), F.col("line"))))),
            s => s("line")),
          "\n").as("kept_text"),
        F.count(F.lit(1)).as("n_lines_total"),
        F.count(F.when(F.col("keep"), 1)).as("n_lines_kept"))
  }

  /** Deflate compression ratio of the UTF-8 text: compressed bytes /
    * original bytes. The classic machine-generated/boilerplate signal
    * (RefinedWeb/MassiveText-family pipelines drop documents that
    * compress too well — heavy repetition — or too poorly — binary
    * noise). A scalar UDF is justified here the same way as the Bloom
    * probe: there is no codegen'd deflate, and the per-row cost IS the
    * deflate itself, not boxing. Fixed level 6 + raw deflate → a
    * deterministic function of the bytes for a given JDK zlib; the gate
    * is rows-only by contract (not expressible in the DuckDB oracle),
    * with PipelineSpec pinning known-ratio orderings. Empty/null → 1.0. */
  val compressionRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, true)
        try {
          d.setInput(in); d.finish()
          val buf = new Array[Byte](8192)
          var out = 0L
          while (!d.finished()) out += d.deflate(buf)
          out.toDouble / in.length
        } finally d.end()
      }
    }

  /** (id, n_bytes, ratio, passes) compression-window filter: keep
    * documents whose ratio lies in [minRatio, maxRatio]. */
  def withCompressionRatio(df: DataFrame, textCol: String, idCol: String,
      minRatio: Double = 0.15, maxRatio: Double = 0.95): DataFrame =
    df.select(F.col(idCol).as("id"),
        F.octet_length(F.col(textCol)).cast("long").as("n_bytes"),
        compressionRatio(F.col(textCol)).as("ratio"))
      .withColumn("passes",
        F.col("ratio") >= minRatio && F.col("ratio") <= maxRatio)
}
