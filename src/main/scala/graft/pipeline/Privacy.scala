package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}

/** Privacy risk measurement over quasi-identifier columns — the
  * release-gating checks a training-data pipeline runs before sharing a
  * corpus (Sweeney 2002 k-anonymity; Machanavajjhala et al. 2007
  * l-diversity). Complements the pattern-level PII scan in
  * [[QualityFilters]]: that finds embedded identifiers in TEXT, these
  * measure re-identification risk in the STRUCTURED columns.
  *
  * Both are single groupBy aggregations (map-side combined, one
  * shuffle); the summaries add a second tiny agg over the group
  * relation. Nothing is collected; exact integer counts throughout, so
  * every output is fully oracle-checkable. */
object Privacy {

  /** Per-equivalence-class k-anonymity: group by the quasi-identifiers,
    * count, flag classes smaller than k. NULL is a legitimate QI value
    * (groups like any other). Output: (qi..., n, violates) ascending by
    * the QI columns. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(qiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"))
      .withColumn("violates", F.col("n") < F.lit(k))
      .orderBy(qiCols.map(c => F.col(c).asc_nulls_first): _*)
  }

  /** Corpus-level k-anonymity summary (one row): the effective k (the
    * smallest equivalence class), class count, and how many rows sit in
    * classes below the threshold — the headline risk number. */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    kAnonymity(df, qiCols, k)
      .agg(
        F.min(F.col("n")).as("k_effective"),
        F.count(F.lit(1)).as("n_classes"),
        F.sum(F.when(F.col("violates"), F.col("n")).otherwise(0L))
          .cast("long").as("rows_at_risk"),
        F.sum(F.col("n")).cast("long").as("rows_total"))

  /** Distinct l-diversity: per QI equivalence class, the number of
    * DISTINCT sensitive values — a class whose sensitive attribute is
    * constant leaks it even when k-anonymous. One aggregation (the
    * distinct count rides a two-level agg). Output:
    * (qi..., n, l, violates) ascending. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(qiCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"),
        F.countDistinct(F.col(sensitiveCol)).as("l"))
      .withColumn("violates", F.col("l") < F.lit(l))
      .orderBy(qiCols.map(c => F.col(c).asc_nulls_first): _*)
  }
}
