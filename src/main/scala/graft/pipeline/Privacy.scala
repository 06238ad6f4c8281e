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

  /** t-closeness (Li, Li & Venkatasubramanian 2007) with the
    * equal-distance (total-variation) ground metric — the distribution-
    * level privacy check l-diversity misses: a class can hold l distinct
    * sensitive values yet still leak if its MIX differs sharply from
    * the corpus (99% one disease where the corpus has 10%). Per QI
    * equivalence class, t = TVD(class distribution, corpus distribution)
    * = ½(Σ_{v∈class} |c_v/n − g_v/N| + (1 − Σ_{v∈class} g_v/N)) — the
    * second term is the absent values' mass, folded WITHOUT a dense
    * class×value grid (only observed cells exist, the chiSquared
    * categorical contract). One (qi, s)-keyed count shuffle builds the
    * cells; the per-value corpus marginals broadcast back (bounded
    * sensitive cardinality); per-class sums ride sort_array-pinned
    * ascending folds so every double replays on any engine. Rows with
    * NULL sensitive values are EXCLUDED (the family's NULL rule); NULL
    * QI values group like any other. Output:
    * (qi..., n, n_values, t, violates = t > threshold) ascending by the
    * QI columns. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      threshold: Double): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(threshold > 0.0d && threshold <= 1.0d,
      s"threshold must be in (0,1], got $threshold")
    val s = F.col(sensitiveCol).cast("string")
    // the BOUNDED cell relation feeds THREE consumers (the join, the
    // value marginals, the grand total) — persist+count (the conductance
    // barrier: bounded multi-consumer relations materialize under the
    // adaptive plan) or each consumer re-executes the corpus scan +
    // shuffle: measured 3 scans, zero exchange reuse, before this
    val cells = df.where(s.isNotNull)
      .groupBy(qiCols.map(F.col) :+ s.as("td_s"): _*)
      .agg(F.count(F.lit(1)).as("td_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    cells.count()
    val gl = cells.groupBy(F.col("td_s"))
      .agg(F.sum(F.col("td_c")).cast("long").as("td_g"))
    val tot = gl.agg(F.sum(F.col("td_g")).cast("long").as("td_nn"))
    val joined = cells.join(F.broadcast(gl), Seq("td_s"))
      .crossJoin(F.broadcast(tot))
    val packed = joined.groupBy(qiCols.map(F.col): _*)
      .agg(F.sum(F.col("td_c")).cast("long").as("n"),
        F.count(F.lit(1)).cast("long").as("n_values"),
        F.first(F.col("td_nn")).as("td_nn"),
        F.sort_array(F.collect_list(F.struct(F.col("td_s"), F.col("td_c"),
          F.col("td_g")))).as("td_l"))
    val nD = F.col("n").cast("double")
    val bigN = F.col("td_nn").cast("double")
    val sumAbs = F.aggregate(F.col("td_l"), F.lit(0.0d), (acc, e) =>
      acc + F.abs(e.getField("td_c").cast("double") / nD -
        e.getField("td_g").cast("double") / bigN))
    val sumG = F.aggregate(F.col("td_l"), F.lit(0.0d), (acc, e) =>
      acc + e.getField("td_g").cast("double") / bigN)
    val t = F.lit(0.5d) * (sumAbs + (F.lit(1.0d) - sumG))
    packed.select(qiCols.map(F.col) ++ Seq(F.col("n"), F.col("n_values"),
      t.as("t"), (t > F.lit(threshold)).as("violates")): _*)
      .orderBy(qiCols.map(c => F.col(c).asc_nulls_first): _*)
  }

  /** t-closeness with the ORDERED-DISTANCE (EMD) ground metric — the
    * other half of Li, Li & Venkatasubramanian 2007 (§3, Definition 4):
    * for a NUMERIC sensitive attribute (income, age — the common
    * release-gating case) a class holding {3k, 4k, 5k} is far closer to
    * the corpus than one holding {3k, 3k, 3k}, which the equal-distance
    * TVD of [[tCloseness]] cannot see. Over the corpus's sorted value
    * grid v_1 < … < v_m, t = (1/(m−1)) · Σ_{i=1..m} |r_i| with the
    * cumulative difference r_i = Σ_{j≤i} (p_j − q_j) (p = class mix,
    * q = corpus mix) — the 1-D earth-mover's distance, each unit of
    * probability mass paying for how FAR it must move.
    *
    * Exact integer algebra until one stated division: r_i = (N·C_i −
    * n·G_i)/(n·N) with C/G the cumulative class/corpus COUNTS, so
    * Σ|N·C_i − n·G_i| accumulates in DECIMAL(38,0) and
    * t = Σ/(n·N·(m−1)) is the only double op — bit-replayable on any
    * engine. Same shape as [[tCloseness]]: one (qi, s) count shuffle
    * (the persist+count barrier for its two consumers), the BOUNDED
    * sorted grid broadcast back packed with its cumulative-ready
    * (value, count) structs, the per-class fold a map lookup over it —
    * never a dense class×value grid relation. Rows with NULL sensitive
    * values are EXCLUDED; NULL QI values group like any other; a
    * single-value grid (m = 1) answers t = 0 (no mass can move).
    * Output: (qi..., n, n_values, t, violates = t > threshold)
    * ascending by the QI columns. */
  def tClosenessOrdered(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, threshold: Double): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(threshold > 0.0d && threshold <= 1.0d,
      s"threshold must be in (0,1], got $threshold")
    val s = F.col(sensitiveCol).cast("double")
    val cells = df.where(s.isNotNull)
      .groupBy(qiCols.map(F.col) :+ s.as("td_s"): _*)
      .agg(F.count(F.lit(1)).as("td_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    cells.count()
    val gl = cells.groupBy(F.col("td_s"))
      .agg(F.sum(F.col("td_c")).cast("long").as("td_g"))
    // the WHOLE grid packs into one broadcast row (bounded sensitive
    // cardinality — the same contract the TVD metric's marginals ride)
    val glp = gl.agg(
      F.sum(F.col("td_g")).cast("long").as("td_nn"),
      F.count(F.lit(1)).cast("long").as("td_m"),
      F.sort_array(F.collect_list(F.struct(F.col("td_s"), F.col("td_g"))))
        .as("td_grid"))
    val packed = cells.groupBy(qiCols.map(F.col): _*)
      .agg(F.sum(F.col("td_c")).cast("long").as("n"),
        F.count(F.lit(1)).cast("long").as("n_values"),
        F.map_from_entries(F.collect_list(
          F.struct(F.col("td_s"), F.col("td_c")))).as("td_map"))
    val joined = packed.crossJoin(F.broadcast(glp))
    val nDec = F.col("n").cast("decimal(18,0)")
    val nnDec = F.col("td_nn").cast("decimal(18,0)")
    val zero = F.struct(
      F.lit(0L).as("cc"), F.lit(0L).as("gg"),
      F.lit(0).cast("decimal(38,0)").as("acc"))
    val folded = F.aggregate(F.col("td_grid"), zero,
      (acc, e) => {
        val cc = acc.getField("cc") +
          F.coalesce(F.element_at(F.col("td_map"), e.getField("td_s")),
            F.lit(0L))
        val gg = acc.getField("gg") + e.getField("td_g")
        F.struct(cc.as("cc"), gg.as("gg"),
          (acc.getField("acc") +
            F.abs(nnDec * cc.cast("decimal(18,0)") -
              nDec * gg.cast("decimal(18,0)"))).as("acc"))
      },
      acc => acc.getField("acc"))
    val t = F.when(F.col("td_m") >= 2L,
        folded.cast("double") / (F.col("n").cast("double") *
          F.col("td_nn").cast("double") *
          (F.col("td_m").cast("double") - F.lit(1.0d))))
      .otherwise(F.lit(0.0d))
    joined.select(qiCols.map(F.col) ++ Seq(F.col("n"), F.col("n_values"),
      t.as("t"), (t > F.lit(threshold)).as("violates")): _*)
      .orderBy(qiCols.map(c => F.col(c).asc_nulls_first): _*)
  }
}
