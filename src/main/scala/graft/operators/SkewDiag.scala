package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Key-skew diagnostics — the instrument you run BEFORE choosing a
  * partitioning strategy at 100 TB. One map-side-combined count pass
  * (the only shuffle) answers: which keys are hot ([[skewTopKeys]]),
  * how concentrated is the distribution ([[skewStats]] — max share,
  * top-k share, entropy), and exactly how much salt each hot key needs
  * for a target per-task row budget ([[saltFactors]] — feed the factor
  * into [[SkewJoin.saltedJoin]] or a two-phase salted aggregation).
  *
  * Scale shape: everything downstream of the per-key count is bounded
  * by `topK` (a broadcast-sized relation); nothing collects the key
  * set. Entropy follows the repo's bounded-category convention for
  * corpus-wide double sums (see Vocab.tokenKlDivergence): top-k
  * categories in a deterministic order plus one OTHER tail bucket,
  * folded with the libm ln kernel — engine-portable to the last bit. */
object SkewDiag {

  /** Per-key counts of the `topK` heaviest keys with their row share.
    * NULL keys count as a real category (skew diagnosis must see null
    * floods — they are the classic hot key). Order: cnt desc, key asc.
    * Output: (key: string, cnt, share). */
  def skewTopKeys(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counted = keyCounts(df, keyCol)
    val total = counted.agg(F.sum(F.col("cnt")).as("td_n"))
    counted
      .orderBy(F.col("cnt").desc, F.col("key").asc_nulls_first)
      .limit(topK)
      .crossJoin(F.broadcast(total))
      .select(F.col("key"), F.col("cnt"),
        (F.col("cnt").cast("double") / F.col("td_n").cast("double"))
          .as("share"))
      .orderBy(F.col("cnt").desc, F.col("key").asc_nulls_first)
  }

  /** One-row concentration summary: total rows, distinct keys, the
    * heaviest key's count and share, the top-k share, and the entropy
    * (nats) of the (top-k + OTHER) bucketing — deterministic because
    * the fold runs over AT MOST topK+1 terms in a pinned order (cnt
    * desc, key asc, OTHER last), never over the unbounded key set.
    * Entropy near 0 = one key dominates (salt it); ln(n_keys) = uniform.
    * Output: (n, n_keys, max_cnt, max_share, topk_share, entropy). */
  def skewStats(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counted = keyCounts(df, keyCol)
    val totals = counted.agg(
      F.sum(F.col("cnt")).as("n"),
      F.count(F.lit(1)).as("n_keys"),
      F.max(F.col("cnt")).as("max_cnt"))
    // the bounded top-k list: TakeOrderedAndProject picks the k heaviest
    // (no global sort), then sort_array pins the FOLD order to
    // (cnt asc, key asc nulls-first) — collect_list order after a limit
    // is not a contract, the sorted array is
    val top = counted
      .orderBy(F.col("cnt").desc, F.col("key").asc_nulls_first)
      .limit(topK)
      .agg(F.sort_array(F.collect_list(
        F.struct(F.col("cnt"), F.col("key")))).as("td_top"))
    val nD = F.col("n").cast("double")
    // p ln p terms in list order, then OTHER last; 0 ln 0 = 0
    def plogp(cnt: org.apache.spark.sql.Column) = {
      val p = cnt.cast("double") / nD
      F.when(cnt > 0L, -(p * graft.expressions.MathKernels.ln(p)))
        .otherwise(F.lit(0.0d))
    }
    top.crossJoin(F.broadcast(totals))
      .withColumn("td_topsum",
        F.aggregate(F.col("td_top"), F.lit(0L),
          (acc, e) => acc + e.getField("cnt")))
      .select(
        F.col("n"), F.col("n_keys"), F.col("max_cnt"),
        (F.col("max_cnt").cast("double") / nD).as("max_share"),
        (F.col("td_topsum").cast("double") / nD).as("topk_share"),
        (F.aggregate(F.col("td_top"), F.lit(0.0d),
          (acc, e) => acc + plogp(e.getField("cnt"))) +
          plogp(F.col("n") - F.col("td_topsum"))).as("entropy"))
  }

  /** The salting plan: for every key whose count exceeds
    * `targetPerTask`, the factor ceil(cnt / target) that spreads it to
    * within-budget slices. The output is broadcast-sized by
    * construction (at most n/target keys qualify). Order: cnt desc,
    * key asc. Output: (key: string, cnt, salt_factor). */
  def saltFactors(df: DataFrame, keyCol: String,
      targetPerTask: Long): DataFrame = {
    require(targetPerTask >= 1, s"targetPerTask must be >= 1")
    keyCounts(df, keyCol)
      .where(F.col("cnt") > targetPerTask)
      // exact ceil on longs via (cnt + target − 1) in a double: both
      // terms < 2^53 at any plausible scale, so the floor is exact
      .withColumn("salt_factor",
        F.floor((F.col("cnt") + F.lit(targetPerTask - 1)).cast("double") /
          F.lit(targetPerTask.toDouble)).cast("long"))
      .orderBy(F.col("cnt").desc, F.col("key").asc_nulls_first)
  }

  /** Herfindahl–Hirschman concentration of a CATEGORICAL key:
    * HHI = Σ_k share_k² over ALL keys (the categorical contract — for
    * unbounded keys use [[skewStats]]' top-k view), plus the
    * k-normalized form (HHI − 1/k)/(1 − 1/k) ∈ [0,1]. One count
    * shuffle; the share² sum folds over the bounded sorted key list
    * (the [[skewStats]] entropy convention) so the double is
    * engine-stated. NULL is a key like any other. Output one row:
    * (n, n_groups, hhi, hhi_normalized — NULL for a single group). */
  def hhi(df: DataFrame, keyCol: String): DataFrame = {
    val one = keyCounts(df, keyCol)
      .agg(F.sort_array(F.collect_list(
        F.struct(F.col("cnt"), F.col("key")))).as("td_cells"))
    val nL = F.aggregate(F.col("td_cells"), F.lit(0L),
      (acc, e) => acc + e.getField("cnt"))
    one
      .withColumn("n", nL)
      .withColumn("n_groups", F.size(F.col("td_cells")).cast("long"))
      .withColumn("td_nd", F.col("n").cast("double"))
      .withColumn("hhi", F.aggregate(F.col("td_cells"), F.lit(0.0d),
        (acc, e) => {
          val share = e.getField("cnt").cast("double") / F.col("td_nd")
          acc + (share * share)
        }))
      .select(F.col("n"), F.col("n_groups"), F.col("hhi"),
        F.when(F.col("n_groups") > 1L,
          (F.col("hhi") - F.lit(1.0d) / F.col("n_groups").cast("double")) /
            (F.lit(1.0d) - F.lit(1.0d) / F.col("n_groups").cast("double")))
          .as("hhi_normalized"))
  }

  /** Hill estimator of the power-law TAIL INDEX (Hill 1975) — how heavy
    * is the upper tail of a positive column (doc lengths, domain sizes,
    * degree distributions): α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1)) over
    * the k largest order statistics, with x_(k+1) the threshold. Small
    * α (≈1-2) = very heavy tail (a few giants carry the mass — size
    * your partitioning for them); large α = tame tail.
    *
    * Shape: one [[ScalableRank.withRank]] DESCENDING range-shuffle rank
    * (ties pinned by `tiebreakers`), a filter to the k+1 head rows, and
    * a BOUNDED sorted fold over them (list ordered by rank, libm ln per
    * term, one stated division per term) — the k+1 head is metadata,
    * never collected unsorted. Rows must satisfy x > 0 (ln); NULLs
    * excluded. Requires n ≥ k+2. Output (one row): (n, k, x_threshold,
    * alpha). */
  def tailIndex(df: DataFrame, valueCol: String, k: Int = 100,
      tiebreakers: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val x = F.col(valueCol).cast("double")
    val clean = df.where(x.isNotNull && x > 0.0d)
    val n = clean.count()
    require(n >= k + 2, s"tailIndex needs n >= k+2 rows, got n=$n for k=$k")
    val ranked = ScalableRank.withRank(clean, valueCol, "$td.__rk",
      method = "ordinal", descending = true, tiebreakers = tiebreakers)
    val head = ranked.where(F.col("`$td.__rk`") <= (k + 1).toLong)
      .select(F.col("`$td.__rk`").as("td_rk"), x.as("td_x"))
    val packed = head.agg(F.sort_array(F.collect_list(
      F.struct(F.col("td_rk"), F.col("td_x")))).as("td_l"))
    val l = F.col("td_l")
    val thr = F.element_at(l, k + 1).getField("td_x")
    val sumLn = F.aggregate(F.slice(l, 1, k), F.lit(0.0d),
      (acc, e) => acc + graft.expressions.MathKernels.ln(
        e.getField("td_x") / thr))
    packed.select(F.lit(n).as("n"), F.lit(k.toLong).as("k"),
      thr.as("x_threshold"),
      F.when(sumLn > 0.0d, F.lit(k.toDouble) / sumLn).as("alpha"))
  }

  private def keyCounts(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(F.col(keyCol).cast("string").as("key"))
      .agg(F.count(F.lit(1)).as("cnt"))
}
