package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

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
    * and the corpus token total — the distributed cumulative sum:
    * range-partition on the order key, window-sum within partitions in
    * parallel, then add each partition's broadcast prefix offset. The
    * per-partition sums are numPartitions rows — the only driver-side
    * data. (localCheckpoint pins partition ids across the two plan
    * branches, same reasoning as ScalableRank.withRank.) */
  def withCumulative(counts: DataFrame): (DataFrame, Long) = {
    val spark = counts.sparkSession
    import spark.implicits._
    val ord = Seq(F.col("cnt").desc, F.col("token").asc)
    val parted = counts
      .repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("$td.__pid", F.spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(F.col("`$td.__pid`")).orderBy(ord: _*)
    val sums = parted.groupBy(F.col("`$td.__pid`")).agg(F.sum("cnt").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = sums.map { case (pid, s) => val o = acc; acc += s; (pid, o) }
    val offDf = offs.toSeq.toDF("$td.__pid", "$td.__off")
    val out = parted
      .withColumn("$td.__lcum", F.sum(F.col("cnt")).over(w))
      .join(F.broadcast(offDf), Seq("$td.__pid"))
      .withColumn("cum", F.col("`$td.__lcum`") + F.col("`$td.__off`"))
      .drop("$td.__pid", "$td.__lcum", "$td.__off")
    (out, acc)
  }

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
}
