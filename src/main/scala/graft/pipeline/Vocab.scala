package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}


/** Corpus vocabulary statistics — the token-frequency steps of tokenizer
  * construction and frequency-based filtering (the count table a
  * BPE/WordPiece trainer starts from, and the head/tail cuts corpus
  * curation applies).
  *
  * All exact, all one-shuffle: counts come from one explode → keyed
  * aggregation with map-side combine; the cumulative-coverage ranking
  * reuses the ScalableRank shape (range shuffle + parallel local window
  * sums + a numPartitions-row broadcast offset table) so even a
  * billion-token vocabulary never funnels through a single-reducer
  * global window. Both gates carry full DuckDB value oracles.
  */
object Vocab {

  /** Exact (token, cnt) over whitespace tokens (same tokenizer as the
    * dedup/BM25 family: lower → trim → split \s+, empties dropped). */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(F.explode(Dedup.tokens(F.col(textCol))).as("token"))
      .where(F.length(F.col("token")) > 0)
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))

  /** Counts plus the running total `cum` in (cnt desc, token asc) order,
    * and the corpus token total — [[graft.operators.RunningSum]]'s
    * distributed cumulative sum over the frequency ranking. */
  def withCumulative(counts: DataFrame): (DataFrame, Long) =
    graft.operators.RunningSum.withRunningSum(counts,
      Seq(F.col("cnt").desc, F.col("token").asc), "cnt")

  /** The most frequent tokens whose cumulative frequency reaches
    * `coverage` of all token occurrences: a token is kept while the
    * running total BEFORE it is still under coverage·total (so the
    * result is the minimal head of the frequency ranking that covers
    * the requested mass). Output: (token, cnt, cum). */
  def byCoverage(docs: DataFrame, textCol: String, coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1, s"coverage in (0,1], got $coverage")
    val (c, total) = withCumulative(tokenCounts(docs, textCol))
    c.where((F.col("cum") - F.col("cnt")).cast("double") <
      F.lit(coverage) * total.toDouble)
  }

  /** Exact heavy hitters: tokens appearing in at least `minFrac` of all
    * token occurrences. The total rides the plan as a broadcast 1-row
    * relation derived from the counts themselves — the corpus is read
    * once. */
  def heavyHitters(docs: DataFrame, textCol: String, minFrac: Double): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac in (0,1], got $minFrac")
    val counts = tokenCounts(docs, textCol)
    val total = counts.agg(F.sum("cnt").as("total"))
    counts.crossJoin(F.broadcast(total))
      .where(F.col("cnt").cast("double") >= F.lit(minFrac) * F.col("total").cast("double"))
      .select("token", "cnt")
  }

  /** EXACT heavy hitters WITHOUT a vocabulary-wide shuffle — the scale
    * path when the token space itself is enormous (raw web n-grams,
    * URLs): [[heavyHitters]] shuffles every distinct token once, which is
    * linear but pays a full-vocabulary exchange; this variant never
    * shuffles the vocabulary at all.
    *
    * Pass 1: per-partition Misra-Gries sketches of `sketchK` counters
    * (Misra & Gries 1982) via mapPartitions — O(k) memory, one linear
    * scan. The MG guarantee is that any token with partition frequency
    * > n_p/(k+1) survives its partition's sketch; summed over partitions,
    * every token with GLOBAL frequency > n/(k+1) must exceed that ratio
    * in at least one partition, so with (k+1)·minFrac > 1 the union of
    * survivors (≤ partitions·k tokens, collected as driver metadata) is a
    * superset of every minFrac-heavy token. Pass 2: exact counts of ONLY
    * the candidates (broadcast semi-join, keyed agg over ≤ partitions·k
    * keys) against the 1-row corpus token total; the exact ≥ filter then
    * emits precisely the true heavy hitters — output identical to
    * [[heavyHitters]], proven by the shared oracle and the repartitioning
    * differential in PipelineSpec. The mapPartitions is the justified
    * sketch escape hatch: a counter dictionary has no Catalyst analog. */
  def heavyHittersTwoPass(docs: DataFrame, textCol: String, minFrac: Double,
      sketchK: Int = 0): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac in (0,1], got $minFrac")
    val k = if (sketchK > 0) sketchK else math.ceil(1.0 / minFrac).toInt
    require((k + 1) * minFrac > 1.0,
      s"sketchK=$k cannot guarantee minFrac=$minFrac (need (k+1)*minFrac > 1)")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(F.explode(Dedup.tokens(F.col(textCol))).as("token"))
      .where(F.length(F.col("token")) > 0)
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < k => counters(t) = 1L
          case None =>
            // classic MG step: decrement every counter, evict zeros
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters(key) = c - 1
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.distinct().collect()
    val total = toks.agg(F.count(F.lit(1)).as("total"))
    toks.join(F.broadcast(candidates.toSeq.toDF("token")), Seq("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .crossJoin(F.broadcast(total))
      .where(F.col("cnt").cast("double") >=
        F.lit(minFrac) * F.col("total").cast("double"))
      .select("token", "cnt")
  }

  /** Smoothed token-distribution divergence between two corpora — the
    * dataset-card drift statistic (did the crawl's language shift? does
    * the eval set's vocabulary match training?): KL(A‖B) and KL(B‖A) over
    * the top-`topK` tokens by combined count plus one lumped OTHER tail
    * category, with add-one smoothing over the category set so both
    * directions are finite.
    *
    *   p_side(cat) = (c_side(cat) + 1) / (T_side + nCat)
    *   kl_ab = Σ_cat p_a · ln(p_a / p_b)
    *
    * Exact and engine-portable by the same discipline as the LM gates:
    * every count is a long (deterministic sums), the category set is
    * bounded (≤ topK + 1), the per-category doubles fold in (other,
    * token)-sorted order, and the log goes through the libm kernel.
    * Corpus cost: one token-count aggregation per side (map-side
    * combined), one full outer join of the two count relations, a
    * bounded top-k; everything after is O(topK) riding broadcast 1-row
    * totals. Output 1 row: (kl_ab, kl_ba, n_categories, tokens_a,
    * tokens_b). */
  def tokenKlDivergence(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ca = tokenCounts(a, textCol).withColumnRenamed("cnt", "ca")
    val cb = tokenCounts(b, textCol).withColumnRenamed("cnt", "cb")
    val j = ca.join(cb, Seq("token"), "full_outer")
      .select(F.col("token"),
        F.coalesce(F.col("ca"), F.lit(0L)).as("ca"),
        F.coalesce(F.col("cb"), F.lit(0L)).as("cb"))
    val vocab = j.orderBy((F.col("ca") + F.col("cb")).desc, F.col("token").asc)
      .limit(topK)
    val totals = j.agg(F.sum("ca").as("ta"), F.sum("cb").as("tb"))
    val vocTotals = vocab.agg(F.sum("ca").as("va"), F.sum("cb").as("vb"),
      F.count(F.lit(1)).as("nv"))
    val cats = vocab
      .select(F.lit(false).as("other"), F.col("token"), F.col("ca"), F.col("cb"))
      .unionByName(totals.crossJoin(vocTotals).select(
        F.lit(true).as("other"), F.lit("").as("token"),
        (F.col("ta") - F.col("va")).as("ca"),
        (F.col("tb") - F.col("vb")).as("cb")))
    val pa = (F.col("ca") + F.lit(1L)).cast("double") /
      (F.col("ta") + F.col("nv") + F.lit(1L)).cast("double")
    val pb = (F.col("cb") + F.lit(1L)).cast("double") /
      (F.col("tb") + F.col("nv") + F.lit(1L)).cast("double")
    val ln = graft.expressions.MathKernels.ln _
    val terms = cats
      .crossJoin(F.broadcast(totals)).crossJoin(F.broadcast(vocTotals))
      .select(F.col("other"), F.col("token"),
        (pa * ln((pa / pb).cast("double"))).as("$td.__tab"),
        (pb * ln((pb / pa).cast("double"))).as("$td.__tba"),
        F.col("nv"), F.col("ta"), F.col("tb"))
    def fold(field: String) = F.aggregate(
      F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("other"), F.col("token"),
          F.col(s"`$field`").as("x")))),
        s => s.getField("x")),
      F.lit(0.0), (acc, x) => acc + x)
    terms.groupBy()
      .agg(
        fold("$td.__tab").as("kl_ab"),
        fold("$td.__tba").as("kl_ba"),
        (F.max(F.col("nv")) + F.lit(1L)).cast("int").as("n_categories"),
        F.max(F.col("ta")).as("tokens_a"),
        F.max(F.col("tb")).as("tokens_b"))
  }

  /** Zipf rank-frequency fit over the top-`topK` tokens: least-squares
    * slope of ln(freq) on ln(rank); `alpha` = −slope (≈1 for natural
    * language, far off for templated/degenerate corpora — a dataset-card
    * health statistic). Output 1 row: (alpha, intercept, n_terms).
    *
    * Deterministic to the bit: ranks are (cnt desc, token asc)
    * row_numbers over the LIMITed top-k relation (k is a bounded
    * parameter, so the single-partition window is O(k) — documented,
    * same class as a collected centroid table), logs route through the
    * libm-consistent kernel, and every Σ folds over the rank-sorted list
    * — so the DuckDB oracle states the identical arithmetic. The corpus
    * itself is touched exactly once (the counts aggregation); everything
    * after is O(topK). */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val top = tokenCounts(docs, textCol)
      .orderBy(F.col("cnt").desc, F.col("token").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("cnt").desc, F.col("token").asc)
    val ln = graft.expressions.MathKernels.ln _
    val ranked = top
      .withColumn("$td.__r", F.row_number().over(w))
      .select(
        F.col("`$td.__r`").as("r"),
        ln(F.col("`$td.__r`").cast("double")).as("x"),
        ln(F.col("cnt").cast("double")).as("y"))
    // one rank-sorted list, four folds from it — a single aggregation so
    // the corpus-touching counts relation is computed exactly once
    val lst = F.array_sort(
      F.collect_list(F.struct(F.col("r"), F.col("x"), F.col("y"))))
    def fold(f: Column => Column) = F.aggregate(
      F.transform(F.col("`$td.__l`"), f), F.lit(0.0), (acc, v) => acc + v)
    val slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) /
      (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    ranked.agg(lst.as("$td.__l"), F.count(F.lit(1)).cast("double").as("n"))
      .select(F.col("n"),
        fold(_.getField("x")).as("sx"),
        fold(_.getField("y")).as("sy"),
        fold(s => s.getField("x") * s.getField("y")).as("sxy"),
        fold(s => s.getField("x") * s.getField("x")).as("sxx"))
      .select(
        // a degenerate corpus (fewer than 2 distinct tokens) has a zero
        // slope denominator — report an explicit NULL fit, never NaN
        F.when(F.col("n") >= 2, -slope).as("alpha"),
        F.when(F.col("n") >= 2,
          (F.col("sy") - slope * F.col("sx")) / F.col("n")).as("intercept"),
        F.col("n").cast("int").as("n_terms"))
  }
}
