package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Byte-pair-encoding tokenization as a corpus operator: train merges on
  * the aggregated word-frequency vocabulary, apply them distributed with
  * the ranks broadcast — the token-accounting layer a training-data
  * pipeline needs beyond whitespace counts (sequence packing budgets,
  * per-group token budgets, fertility audits).
  *
  * Public algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): training iterates
  * "count adjacent symbol pairs weighted by word frequency, merge the most
  * frequent" over the WORD VOCABULARY, never the raw corpus — the corpus
  * collapses to (word, freq) in one distributed aggregation and the merge
  * loop runs on that O(distinct words) table. Application is greedy
  * lowest-rank pair merging per word (the GPT-2 bpe() loop shape, public
  * reference implementation).
  *
  * 100 TB posture:
  *   - the corpus-sized work is exactly two shapes: the one `groupBy(word)`
  *     count for training (map-side combined, one shuffle) and the
  *     row-local `applyBpe` projection for encoding (merge ranks broadcast,
  *     zero shuffle);
  *   - the vocabulary table is the O(k) metadata — `minFreq` bounds it the
  *     standard way (rare words contribute nothing to merge counts), and
  *     `maxVocab` fails loudly instead of silently collecting an unbounded
  *     driver table;
  *   - determinism: frequency ties break on the lexicographically smallest
  *     pair, so the merge list (and therefore every token) is independent
  *     of partitioning, run order, and engine.
  */
object Tokenize {

  /** Split to the same whitespace words the rest of the pipeline counts. */
  private def words(text: Column): Column =
    F.filter(F.split(F.trim(text), "\\s+"), w => F.length(w) > 0)

  /** The corpus word-frequency vocabulary: one distributed aggregation. */
  def wordCounts(df: DataFrame, textCol: String, minFreq: Long = 1L): DataFrame =
    df.select(F.explode(words(F.col(textCol))).as("word"))
      .groupBy("word").agg(F.count(F.lit(1)).as("freq"))
      .where(F.col("freq") >= minFreq)

  /** Learn `numMerges` BPE merges from the corpus. The merge loop runs on
    * the collected (word, freq) vocabulary — O(distinct words), the same
    * O(k)-metadata driver step as IVF centroids — with `maxVocab` as the
    * loud guard against an unthresholded collect. Returns merges in rank
    * order (rank = index). */
  def learnBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 1L, maxVocab: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    val vocabDf = wordCounts(df, textCol, minFreq)
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"vocabulary has $n words > maxVocab=$maxVocab; raise minFreq")
    var vocab: Array[(Array[String], Long)] = vocabDf.collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
      .sortBy(_._1.mkString) // deterministic iteration order
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, freq) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + freq
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max frequency, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        vocab = vocab.map { case (syms, freq) =>
          if (syms.length < 2) (syms, freq)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += fused; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), freq)
          }
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Encode one word with greedy lowest-rank merging (the public GPT-2
    * bpe() loop): repeatedly merge every occurrence of the present pair
    * with the smallest rank until no adjacent pair has one. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.split("").filter(_.nonEmpty).toIndexedSeq
    var cont = syms.length >= 2
    while (cont) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) cont = false
      else {
        val (a, b) = { // the pair owning bestRank
          val idx = (0 until syms.length - 1)
            .find(k => ranks.getOrElse((syms(k), syms(k + 1)), Int.MaxValue) == bestRank).get
          (syms(idx), syms(idx + 1))
        }
        val out = IndexedSeq.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += (a + b); k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.result()
        cont = syms.length >= 2
      }
    }
    syms
  }

  /** Append `tokens` (array of BPE tokens over the whole document, words
    * encoded independently in order) and `n_tokens`. The merge ranks ride
    * the closure into every task (Spark broadcasts the serialized literal
    * with the plan) and the operator is a row-local projection — zero
    * shuffle, the scan's partitioning is preserved.
    *
    * The per-word merge loop is data-dependent iteration, which Catalyst
    * cannot express — this is the documented batch-kernel escape hatch
    * (same tier as [[graft.udf.Udf]]), not the default path; everything
    * around it (split, explode-free array transform, counts) stays in
    * codegen. */
  def withBpeTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val enc = F.udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else ws.flatMap(w => encodeWord(w, ranks))
    }
    df.withColumn("tokens", enc(words(F.col(textCol))))
      .withColumn("n_tokens", F.size(F.col("tokens")))
  }

  /** Tokens-per-word fertility audit per group — the standard check that a
    * learned vocabulary serves every corpus slice (a slice with outsized
    * fertility is under-represented in the merges). */
  def fertilityByGroup(df: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)]): DataFrame =
    withBpeTokens(df, textCol, merges)
      .select(F.col(groupCol), F.col("n_tokens"),
        F.size(words(F.col(textCol))).as("n_words"))
      .groupBy(groupCol)
      .agg(F.sum("n_tokens").as("tokens"), F.sum("n_words").as("words"),
        (F.sum("n_tokens").cast("double") /
          F.sum("n_words").cast("double")).as("fertility"))
}
