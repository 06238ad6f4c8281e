package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.DoubleType

/** BM25 term-based retrieval over a document corpus (Robertson & Zaragoza
  * 2009, "The Probabilistic Relevance Framework: BM25 and Beyond" — public
  * methodology; parameters k1=1.2, b=0.75 are the classic defaults).
  *
  * Training-data uses: retrieval-based decontamination (find the corpus
  * documents that match an eval question before n-gram overlap is even
  * computed), targeted quality audits ("show me the docs about X"), and
  * candidate mining for focused dedup sweeps.
  *
  * Shape for 100 TB:
  *   - the postings list (id, term, tf) is the only corpus-sized relation;
  *     build it once per corpus version and persist it partitioned by a
  *     term hash — a query then prunes to its own terms' partitions;
  *   - query terms are a handful of literals: the postings filter is an
  *     `IN` pushed to the scan, document frequencies for those terms are a
  *     k-row aggregate, and the per-doc score is one map-side expression +
  *     one groupBy(id) — no corpus-wide join, no collect;
  *   - corpus statistics (N, avgdl) are two driver-side scalars, computed
  *     once at build from exact integer sums (deterministic regardless of
  *     partition order).
  *
  * Every floating-point reduction uses a FIXED fold order (sorted term
  * scores folded sequentially), so a score is bit-reproducible across
  * engines — the q_bm25 gate hash-matches DuckDB on the identical formula.
  */
object Retrieval {

  /** (id, term, tf): whitespace-token term frequencies per document — the
    * postings relation everything else derives from. Tokenization matches
    * [[Dedup.tokens]] (lower, trim, split on whitespace). */
  def termFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(F.col(idCol).as("id"),
        F.explode(Dedup.tokens(F.col(textCol))).as("term"))
      .where(F.length(F.col("term")) > 0)
      .groupBy("id", "term").agg(F.count(F.lit(1)).as("tf"))

  /** A built BM25 index: the postings relation, per-document lengths, and
    * the two corpus scalars. `postings`/`docLen` are lazy plans — persist
    * them (parquet, partitioned by a term hash) to reuse across query
    * batches without re-tokenizing the corpus. */
  final case class Bm25Index(postings: DataFrame, docLen: DataFrame,
      nDocs: Long, avgDl: Double)

  /** Build the index: one tokenization pass; N and avgdl come from exact
    * long sums (sum of longs is partition-order-invariant), so the derived
    * double is deterministic. */
  def buildBm25(df: DataFrame, textCol: String, idCol: String): Bm25Index = {
    val postings = termFrequencies(df, textCol, idCol)
    val docLen = postings.groupBy("id").agg(F.sum("tf").as("dl"))
    val row = docLen.agg(F.count(F.lit(1)).as("n"), F.sum("dl").as("toks")).head()
    val n = row.getLong(0)
    val avgDl = if (n == 0) 0.0 else row.getLong(1).toDouble / n
    Bm25Index(postings, docLen, n, avgDl)
  }

  /** (id, n_terms, score) for every document matching ≥1 query term.
    *
    * idf   = ln(1 + (N - df + 0.5) / (df + 0.5))   (guarded, never negative)
    * tfc   = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    * score = Σ idf·tfc over matched terms, folded in sorted order so the
    *         double is identical across engines and partitionings.
    */
  def scoreQuery(index: Bm25Index, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val q = terms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    val matched = index.postings.where(F.col("term").isin(q: _*))
    val docFreq = matched.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    // graft.expressions.MathKernels.ln, not F.log: Spark's log codegens to
    // StrictMath.log (fdlibm), 1 ulp off the platform libm on some
    // arguments — which breaks hash parity with engines using libm ln
    val idf = graft.expressions.MathKernels.ln(
      (F.lit(1.0) + (F.lit(index.nDocs.toDouble) - F.col("df") + F.lit(0.5)) /
        (F.col("df") + F.lit(0.5))).cast(DoubleType))
    val tfc = (F.col("tf") * F.lit(k1 + 1.0)) /
      (F.col("tf") + F.lit(k1) *
        (F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.lit(index.avgDl)))
    matched
      .join(F.broadcast(docFreq), Seq("term"))
      .join(index.docLen, Seq("id"))
      .withColumn("ts", (idf * tfc).cast(DoubleType))
      .groupBy("id")
      .agg(F.count(F.lit(1)).as("n_terms"),
        F.aggregate(F.array_sort(F.collect_list(F.col("ts"))),
          F.lit(0.0), (acc, x) => acc + x).as("score"))
  }

  /** Top-k retrieval: highest BM25 score first, id as the tiebreaker.
    * Plans as a distributed top-k (per-partition limit before the merge). */
  def topK(index: Bm25Index, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    scoreQuery(index, terms, k1, b)
      .orderBy(F.col("score").desc, F.col("id").asc).limit(k)
  }
}
