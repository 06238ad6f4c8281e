package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Deterministic corpus mixing: downsample each source/domain/language
  * slice to a target weight with a pure row-local decision — the "data
  * mixture" step of a training pipeline (domain reweighting à la
  * Pile/RefinedWeb recipes; public methodology).
  *
  * The keep decision hashes the document id with a Knuth multiplicative
  * hash on a prime-folded id:
  * `((id % 1000003) * 2654435761) % 1_000_000 < weight * 1_000_000`.
  * Properties that matter at 100 TB:
  *   - zero shuffle, zero state: a pure filter inside whole-stage codegen;
  *   - reproducible across runs, engines, and partitionings (no RNG, no
  *     row ordering dependence — the same id always makes the same cut);
  *   - expressible in ANSI SQL, so the mix is auditable outside Spark
  *     (the gate's DuckDB oracle runs the identical arithmetic).
  * The prime fold keeps the product within 2^63 so the arithmetic never
  * overflows in engines that raise on bigint overflow.
  */
object DataMix {
  private val Fold = 1000003L        // prime > the hash bucket count
  private val Mult = 2654435761L     // Knuth's 2^32 golden-ratio multiplier
  private val Buckets = 1000000L

  /** Uniform bucket in [0, 1e6) for a long id — row-local, overflow-safe. */
  def bucket(id: Column): Column =
    F.pmod((F.pmod(id.cast("long"), F.lit(Fold))) * Mult, F.lit(Buckets))

  /** Keep each row of group g with probability ~weights(g) (exact per-id
    * determinism, not sampling). Groups without a weight keep
    * `defaultWeight`.
    *
    * Weight keys match the group column's CANONICAL STRING CAST: the group
    * value is cast to string for the map lookup, so for non-string group
    * columns the keys must be written in Spark's cast form — DoubleType 7
    * is "7.0" (not "7"), dates are "yyyy-MM-dd", timestamps Spark's
    * timestamp rendering. A key in any other spelling silently falls
    * through to `defaultWeight`; [[unreachableWeightKeys]] is the audit
    * for that (one distinct-labels job, opt-in — this operator itself is
    * row-local and stays zero-shuffle). */
  def sampleByWeights(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    val wmap = F.map(weights.toSeq.sortBy(_._1).flatMap { case (k, w) =>
      Seq(F.lit(k), F.lit((w * Buckets).toLong)) }: _*)
    val threshold = F.coalesce(
      F.element_at(wmap, F.col(groupCol).cast("string")),
      F.lit((defaultWeight * Buckets).toLong))
    df.where(bucket(F.col(idCol)) < threshold)
  }

  /** Weight keys that match NO group label under the canonical string
    * cast — the misconfiguration audit for [[sampleByWeights]] (e.g. a
    * DoubleType group keyed as "7" instead of "7.0"). One
    * distinct-cast-labels aggregation over the group column; run it once
    * per weights config, not per sampling call. */
  def unreachableWeightKeys(df: DataFrame, groupCol: String,
      weights: Map[String, Double]): Set[String] = {
    val labels = df.select(F.col(groupCol).cast("string").as("g"))
      .where(F.col("g").isNotNull).distinct()
      .collect().map(_.getString(0)).toSet
    weights.keySet.diff(labels)
  }

  /** Temperature-flattened mixture rates (the multilingual-pretraining
    * recipe — XLM-R's alpha exponent, Conneau et al. 2020 §3.1: sample
    * group g with probability proportional to `(n_g/N)^alpha`, boosting
    * low-resource groups as alpha → 0). With a total budget of
    * `keepFraction * N` rows, group g keeps
    * `min(1, keepFraction * N * p_g / n_g)` of its rows where
    * `p_g = (n_g/N)^alpha / Z`.
    *
    * The k per-group counts are an O(k) driver collect (Ivf-centroid
    * class); Z folds the group-sorted terms sequentially so the double is
    * order-deterministic, and the per-row keep decision reuses the
    * engine-portable Knuth-hash [[bucket]] — zero shuffle on the corpus,
    * auditable in ANSI SQL outside Spark. */
  def temperatureRates(df: DataFrame, groupCol: String,
      alpha: Double, keepFraction: Double): Seq[(String, Double)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    // a null group cannot be a map key (Spark NULL_MAP_KEY) and carries no
    // domain label to weight — null-group rows are excluded from the
    // mixture by contract (same rows sampleByTemperature drops).
    // The group key is cast to string so non-string group columns (int
    // language ids, date partitions) get their canonical string label
    // instead of a ClassCastException; for StringType the cast folds away.
    val counts = df.where(F.col(groupCol).isNotNull)
      .groupBy(F.col(groupCol).cast("string").as("__g")).agg(F.count(F.lit(1)).as("n"))
      .orderBy("__g").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nTotal = counts.map(_._2).sum
    val pg = counts.map { case (g, n) => (g, math.pow(n.toDouble / nTotal, alpha)) }
    val z = pg.foldLeft(0.0) { case (acc, (_, p)) => acc + p } // group-sorted order
    pg.zip(counts).map { case ((g, p), (_, n)) =>
      g -> math.min(1.0, keepFraction * nTotal * (p / z) / n)
    }.toSeq
  }

  /** Filter the corpus to the [[temperatureRates]] mixture — same row-local
    * hash-keep as [[sampleByWeights]] (thresholds floored to the bucket
    * grid, so the SQL oracle's `floor` reproduces them exactly). */
  def sampleByTemperature(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, keepFraction: Double): DataFrame = {
    val rates = temperatureRates(df, groupCol, alpha, keepFraction)
    val wmap = F.map(rates.flatMap { case (g, r) =>
      Seq(F.lit(g), F.lit(math.floor(r * Buckets).toLong)) }: _*)
    // same string canonicalization as temperatureRates' keys
    df.where(F.col(groupCol).isNotNull &&
      bucket(F.col(idCol)) < F.element_at(wmap, F.col(groupCol).cast("string")))
  }

  /** Deterministic train/val/test split on the same Knuth-hash bucket as
    * [[sampleByWeights]] — a row's split never changes with partitioning,
    * run order, or corpus growth (new ids land in splits at the target
    * rates; existing ids never migrate between splits). */
  def split(df: DataFrame, idCol: String,
      valFrac: Double = 0.01, testFrac: Double = 0.01): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      "fractions must be non-negative and sum to <= 1")
    val b = bucket(F.col(idCol))
    val vCut = (valFrac * Buckets).toLong
    val tCut = vCut + (testFrac * Buckets).toLong
    df.withColumn("split",
      F.when(b < vCut, "val").when(b < tCut, "test").otherwise("train"))
  }

  /** Above this `n`, [[sampleExactN]] switches from the top-n plan
    * (TakeOrderedAndProject funnels the n winners through a single merge
    * point) to the bucket-histogram plan, whose single-point term is one
    * boundary bucket (~corpus/1e6 rows), not n. */
  val TopNMaxN: Int = 1 << 20

  /** Deterministic fixed-size sample: the `n` rows with the smallest
    * `(hash-bucket, id)` key. Unlike `df.sample`, the selection is exactly
    * `n` rows (when the corpus has them), stable under partitioning and
    * reruns, and hash-shuffled rather than order-biased — the primitive
    * for carving a fixed-size eval set out of a corpus.
    *
    * Physical strategy switches on `n` (override the cutover with
    * `topNMaxN`):
    *   - small n: distributed top-n (TakeOrderedAndProject) — each
    *     partition keeps its n best, the n winners merge at one point;
    *     exactly right until n itself is too big to funnel;
    *   - large n: one exact histogram over the 1e6 hash buckets picks the
    *     boundary bucket t with its below-t cumulative count; every row
    *     with `bucket < t` is kept by a plain filter (no sort, no limit,
    *     no single point), and only the boundary bucket — ~corpus/1e6
    *     rows, independent of n — runs a top-(n-below) to break id ties.
    *     The histogram is O(#buckets) driver metadata (Ivf-centroid
    *     class), corpus-size-independent. A 100M-row eval carve never
    *     funnels 100M rows anywhere. */
  def sampleExactN(df: DataFrame, idCol: String, n: Int,
      topNMaxN: Int = TopNMaxN): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    if (n <= topNMaxN) df.orderBy(bucket(F.col(idCol)), F.col(idCol)).limit(n)
    else {
      val b = bucket(F.col(idCol))
      val hist = df.groupBy(b.as("__b")).agg(F.count(F.lit(1)).as("__n"))
        .orderBy("__b").collect()
      var cum = 0L; var i = 0; var t = -1L; var below = 0L
      while (i < hist.length && t < 0) {
        val cnt = hist(i).getLong(1)
        if (cum + cnt >= n) { t = hist(i).getLong(0); below = cum }
        cum += cnt; i += 1
      }
      if (t < 0) df // corpus has <= n rows: the sample is the corpus
      else df.where(b < t).unionAll(
        df.where(b === t).orderBy(F.col(idCol)).limit((n - below).toInt))
    }
  }

  /** Per-group [[sampleExactN]]: the `n` hash-smallest rows of EACH group
    * (stratified fixed-size sampling). One shuffle on the group key; the
    * rank is a windowed row_number, map-side-limited by Spark's
    * WindowGroupLimit before the exchange. */
  def sampleExactNPerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(groupCol)).orderBy(bucket(F.col(idCol)), F.col(idCol))
    df.withColumn("$td.__rn", F.row_number().over(rn))
      .where(F.col("`$td.__rn`") <= n).drop("$td.__rn")
  }

  /** Deterministic epoch shuffle: assign every row a (shard, pos)
    * coordinate that is a pure function of (id, seed) — the "global
    * shuffle" step before sharded training-data export. A new seed (e.g.
    * the epoch number) yields a fresh permutation; the same seed is
    * bit-identical across runs, partitionings, and engines, because the
    * ordering key is the md5 hex of "id:seed" (no engine-private RNG, no
    * zipWithIndex order dependence).
    *
    * Scale shape: `shard` is the key's first 4 hex chars mod `numShards`,
    * so rows scatter uniformly and `pos` is a row_number windowed over
    * ONE shard — at 100 TB, numShards is set to O(total cores) and each
    * window sorts ~corpus/numShards rows; there is exactly one shuffle
    * (on shard) and no global single-reducer ordering. Downstream,
    * `repartition(col("shard"))` + `sortWithinPartitions("pos")` (or
    * [[Export.writeSharded]] partitioned by shard) materializes the
    * epoch order without any further wide exchange. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    val key = F.md5(F.concat(F.col(idCol).cast("string"),
      F.lit(":" + seed.toString)).cast("binary"))
    val shard = F.pmod(F.conv(F.substring(key, 1, 4), 16, 10).cast("long"),
      F.lit(numShards.toLong)).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("shard"))
      .orderBy(F.col("`$td.__ekey`"), F.col(idCol))
    df.withColumn("$td.__ekey", key)
      .withColumn("shard", shard)
      .withColumn("pos", F.row_number().over(w) - 1)
      .drop("$td.__ekey")
  }

  /** Weighted sampling WITHOUT replacement of exactly `n` rows
    * (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws a
    * deterministic uniform u from the md5 of "id:salt" (24 hex bits →
    * the exact dyadic rational (b+0.5)/2^24), and the n rows with the
    * LARGEST u^(1/w) win — equivalently the largest ln(u)/w, which is
    * the form computed here because ln routes through the libm-consistent
    * kernel ([[graft.expressions.MathKernels.ln]]) and division is
    * single-rounded, so the key (and therefore the sample) is
    * bit-reproducible across engines, runs, and partitionings.
    *
    * A row's inclusion probability is proportional to its weight in the
    * without-replacement sense — the standard "sample high-quality docs
    * more" step of a curated-corpus carve. Rows with weight <= 0 or null
    * never win. Plans as a distributed top-n (TakeOrderedAndProject):
    * per-partition heads only, no global sort, no shuffle of the corpus. */
  def sampleWeightedN(df: DataFrame, idCol: String, weightCol: String,
      n: Int, salt: String = "es"): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    df.where(F.col(weightCol).isNotNull && F.col(weightCol) > 0)
      .withColumn("$td.__eskey", esKey(idCol, weightCol, salt))
      .orderBy(F.col("`$td.__eskey`").desc, F.col(idCol))
      .limit(n)
      .drop("$td.__eskey")
  }

  /** The A-ES selection key ln(u)/w (see [[sampleWeightedN]]): u is the
    * exact dyadic rational from 24 md5 bits of "id:salt", ln the
    * libm-consistent kernel — bit-reproducible across engines. */
  private def esKey(idCol: String, weightCol: String, salt: String): Column = {
    val b = F.conv(F.substring(
      F.md5(F.concat(F.col(idCol).cast("string"), F.lit(":" + salt))
        .cast("binary")), 1, 6), 16, 10).cast("long")
    val u = (b.cast("double") + F.lit(0.5)) / F.lit((1L << 24).toDouble)
    graft.expressions.MathKernels.ln(u) / F.col(weightCol).cast("double")
  }

  /** STRATIFIED weighted sampling without replacement: the `n` largest
    * A-ES keys per group (fewer when a group is smaller) — "the best n
    * documents per language/source, weight-proportional" in one pass.
    * Same key arithmetic as [[sampleWeightedN]], so the winner set stays
    * bit-reproducible and oracle-checkable; one shuffle on the group key,
    * per-group windows rank in parallel (a pathologically hot group sorts
    * within one partition — cap it upstream or sample it globally). */
  def sampleWeightedNPerGroup(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, n: Int, salt: String = "es"): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(F.col("`$td.__eskey`").desc, F.col(idCol))
    df.where(F.col(weightCol).isNotNull && F.col(weightCol) > 0)
      .withColumn("$td.__eskey", esKey(idCol, weightCol, salt))
      .withColumn("$td.__rn", F.row_number().over(w))
      .where(F.col("`$td.__rn`") <= n)
      .drop("$td.__eskey", "$td.__rn")
  }

  /** Per-group kept/total counts for a candidate mix — the audit table a
    * mixing decision is reviewed on. */
  def mixReport(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val kept = sampleByWeights(df, idCol, groupCol, weights, defaultWeight)
      .groupBy(groupCol).agg(F.count(F.lit(1)).as("n_kept"))
    df.groupBy(groupCol).agg(F.count(F.lit(1)).as("n_total"))
      .join(kept, Seq(groupCol), "left")
      .select(F.col(groupCol),
        F.col("n_total"),
        F.coalesce(F.col("n_kept"), F.lit(0L)).as("n_kept"))
  }

  /** Uniform bucket in [0, 1e6) for a key of ANY type (domain string,
    * near-dup cluster id, url...): the first 8 hex chars of md5 of the
    * canonical string cast, mod 1e6 — the same engine-portable md5-prefix
    * device as [[epochShuffle]] / DSIR, so the assignment is reproducible
    * in ANSI SQL and across engines. Row-local, zero shuffle. */
  def keyBucket(key: Column): Column =
    F.pmod(F.conv(F.substring(
      F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10).cast("long"),
      F.lit(Buckets))

  /** LEAKAGE-SAFE train/val/test split: the split is keyed on `keyCol`
    * (a domain, a source, a near-dup cluster's canonical id) rather than
    * the row id, so every row sharing a key lands in the SAME split —
    * near-duplicates or same-site pages can never straddle the
    * train/eval boundary and leak eval content into training (the
    * standard contamination failure of id-keyed splits; see Lee et al.
    * 2021 §6 on duplicate-driven eval leakage).
    *
    * Same determinism contract as [[split]]: a key's split never changes
    * with partitioning, run order, or corpus growth. Row-local filter,
    * zero shuffle, whole-stage codegen. */
  def splitByKey(df: DataFrame, keyCol: String,
      valFrac: Double = 0.01, testFrac: Double = 0.01): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      "fractions must be non-negative and sum to <= 1")
    val b = keyBucket(F.col(keyCol))
    val vCut = (valFrac * Buckets).toLong
    val tCut = vCut + (testFrac * Buckets).toLong
    df.withColumn("split",
      F.when(b < vCut, "val").when(b < tCut, "test").otherwise("train"))
  }

  /** Downsample the corpus so the surviving group mix MATCHES a target
    * distribution, keeping as much data as feasible (the distribution-
    * matching step of mixture recipes — e.g. rebalance web crawl to a
    * reference language mix).
    *
    * With corpus counts C_g and target fractions t_g, the largest
    * achievable matched corpus is N* = min_g C_g / t_g (the binding
    * group keeps 100%); each group keeps rate_g = t_g * N* / C_g via the
    * same row-local id-hash filter as [[sampleByWeights]]. Groups with no
    * target mass (or absent from `target`) are dropped.
    *
    * One k-row count aggregate (k = #groups) broadcast back over the
    * corpus; the corpus itself never shuffles. Rates are exact-count
    * ratios in IEEE double and the threshold is floor(rate * 1e6) — the
    * identical arithmetic runs in the DuckDB oracle, so the kept set is
    * engine-reproducible. */
  def matchDistribution(df: DataFrame, idCol: String, groupCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty, "target distribution must be non-empty")
    require(target.values.forall(_ >= 0), "target masses must be >= 0")
    val total = target.values.sum
    require(total > 0, "target distribution must have positive mass")
    val tmap = F.map(target.toSeq.sortBy(_._1).flatMap { case (k, t) =>
      Seq(F.lit(k), F.lit(t / total)) }: _*)
    val counts = df.groupBy(F.col(groupCol).cast("string").as("$td.__g"))
      .agg(F.count(F.lit(1)).as("$td.__cg"))
      .withColumn("$td.__tg", F.element_at(tmap, F.col("`$td.__g`")))
      .where(F.col("`$td.__tg`").isNotNull && F.col("`$td.__tg`") > 0)
    // N* = min over groups of C_g / t_g — a 1-row aggregate of a k-row
    // relation, crossed back in via broadcast (never a global window)
    val nStar = counts.agg(F.min(
      F.col("`$td.__cg`").cast("double") / F.col("`$td.__tg`")).as("$td.__nstar"))
    val rates = counts.crossJoin(F.broadcast(nStar))
      .select(F.col("`$td.__g`"),
        F.floor(F.least(F.lit(1.0),
          F.col("`$td.__tg`") * F.col("`$td.__nstar`") /
            F.col("`$td.__cg`").cast("double")) * Buckets)
          .cast("long").as("$td.__thr"))
    df.join(F.broadcast(rates),
        F.col(groupCol).cast("string") === F.col("`$td.__g`"))
      .where(bucket(F.col(idCol)) < F.col("`$td.__thr`"))
      .drop("$td.__g", "$td.__thr")
  }

  /** Deterministic weighted interleave — the training-order schedule for
    * a multi-source mix: source g's i-th example (1-based within-group
    * rank under `tiebreakers`) gets `order_key` = i / w_g, and reading
    * the corpus in (order_key, tiebreaker) order yields the classic
    * stride schedule (a weight-2 source appears twice as often, all
    * sources interleave smoothly from the start instead of concatenating)
    * — deterministic across runs and partitionings, no RNG.
    *
    * Scale shape: within-group ranks come from ONE global
    * [[graft.operators.ScalableRank]] range shuffle on (group,
    * tiebreakers) — groups sort contiguously, never inside one partition
    * — minus a broadcast per-group min-rank offset (k rows). Rows whose
    * group has no weight are dropped (emit an explicit weight for every
    * source you want scheduled). */
  def interleave(df: DataFrame, groupCol: String,
      weights: Map[String, Double], tiebreakers: Seq[String]): DataFrame = {
    require(weights.nonEmpty, "interleave needs at least one weight")
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    require(tiebreakers.nonEmpty,
      "interleave needs tiebreakers for a deterministic within-group order")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = graft.operators.ScalableRank.withRank(
      df, groupCol, "$td.__r", method = "ordinal", tiebreakers = tiebreakers)
    val offsets = ranked.groupBy(F.col(groupCol))
      .agg(F.min(F.col("`$td.__r`")).as("$td.__r0"))
    val w = weights.toSeq.toDF(groupCol, "$td.__w")
    ranked
      .join(F.broadcast(offsets), Seq(groupCol))
      .join(F.broadcast(w), Seq(groupCol))
      .withColumn("order_key",
        (F.col("`$td.__r`") - F.col("`$td.__r0`") + F.lit(1L)).cast("double") /
          F.col("`$td.__w`"))
      .drop("$td.__r", "$td.__r0", "$td.__w")
  }

  /** Curriculum phase assignment: cut the corpus into `phases` difficulty
    * tiers at EXACT score quantiles (the easy→hard ordering of curriculum
    * training recipes — Bengio et al. 2009 — at corpus scale). Appends
    * `phase` in [1, phases]: phase(x) = 1 + |{cutpoints c : c < x}|, so a
    * row scoring exactly a cutpoint lands in the LOWER phase and the
    * assignment depends only on data values — deterministic across
    * engines, runs, and partitionings.
    *
    * Cutpoints come from [[graft.operators.Quantiles.exactQuantiles]]
    * (order statistics via one range shuffle, no single-reducer sort); the
    * (phases-1)-row cut list broadcasts back as one array, and the
    * assignment itself is a row-local projection. */
  def curriculumPhases(df: DataFrame, scoreCol: String, phases: Int,
      tiebreakers: Seq[String] = Nil): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    // a corpus smaller than `phases` would collide quantile ranks and
    // collect duplicate cutpoints (inflating phase numbers vs the
    // distinct-rank oracle) — fail loudly instead; the count feeds
    // exactQuantiles via knownN so the corpus is still counted once
    val n = df.count()
    require(n >= phases,
      s"curriculumPhases needs at least `phases` rows: n=$n, phases=$phases")
    val cuts = graft.operators.Quantiles.exactQuantiles(df, scoreCol,
        (1 until phases).map(_.toDouble / phases), tiebreakers,
        knownN = Some(n))
      .agg(F.sort_array(F.collect_list(F.col("value"))).as("$td.__cuts"))
    df.crossJoin(F.broadcast(cuts))
      .withColumn("phase",
        F.lit(1) + F.size(F.filter(F.col("`$td.__cuts`"), c => c < F.col(scoreCol))))
      .drop("$td.__cuts")
  }
}
