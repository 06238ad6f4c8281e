package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}

/** Dataset-card corpus reporting — the per-slice summary table every
  * training-data release publishes (docs, bytes, length distribution per
  * language/source slice). A composition of the exact primitives: keyed
  * aggregation for the counts, [[graft.operators.Quantiles
  * .exactQuantilesByGroup]] for the EXACT median/p95 lengths (order
  * statistics, not percentile_approx estimates). Two shuffles on the
  * group key total; output is #groups rows.
  */
object Report {

  /** Per-`groupCol` corpus card: n_docs, total/mean chars, exact p50 and
    * p95 char lengths. `idCol` pins the quantile tiebreak. */
  def corpusCard(docs: DataFrame, groupCol: String, textCol: String,
      idCol: String): DataFrame = {
    val sized = docs.select(F.col(groupCol), F.col(idCol),
      F.length(F.col(textCol)).cast("long").as("td_len"))
    val stats = sized.groupBy(groupCol).agg(
      F.count(F.lit(1)).as("n_docs"),
      F.sum(F.col("td_len")).as("n_chars"),
      (F.sum(F.col("td_len")).cast("double") / F.count(F.lit(1)))
        .as("mean_chars"))
    val qs = graft.operators.Quantiles.exactQuantilesByGroup(
        sized, groupCol, "td_len", Seq(0.5, 0.95), tiebreakers = Seq(idCol))
      .groupBy(groupCol).pivot("q", Seq(0.5, 0.95)).agg(F.first("value"))
      .withColumnRenamed("0.5", "p50_chars")
      .withColumnRenamed("0.95", "p95_chars")
    stats.join(qs, Seq(groupCol))
  }
}
