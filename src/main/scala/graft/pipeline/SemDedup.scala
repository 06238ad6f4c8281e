package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.expressions.VectorKernels

/** Semantic deduplication: remove documents whose EMBEDDINGS are
  * near-identical even when their text is not (boilerplate rewrites,
  * templated articles, translations) — the SemDeDup recipe (Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023; public methodology).
  *
  * The quadratic pair search is confined to k-means clusters: an embedding
  * only compares against its own cluster's members, so the cost is
  * Σ|cluster|² instead of N². Cluster granularity is the caller's scale
  * knob exactly like the block column of
  * [[Dedup.embeddingNearDupPairs]] — but here the blocks come from the
  * geometry itself (k-means over the embedding space, reusing [[Ivf]]'s
  * deterministic Lloyd build), so near-dups that share no key still land
  * in the same bucket.
  *
  * Shape for 100 TB: clustering never collects the corpus (centroids are
  * k × dim doubles on the driver); the pair join shuffles both sides on
  * the cluster id once; per-cluster fan-out is bounded by N/k, which the
  * caller sizes via k (SemDeDup used k ≈ 11k clusters for LAION-scale).
  */
object SemDedup {

  /** Sentinel for `k`: derive the cluster count from the corpus size via
    * [[autoK]] instead of a fixed demo-scale constant. */
  val AutoK: Int = -1

  /** Cluster-count heuristic: enough clusters that the expected cluster
    * holds ~`targetClusterSize` vectors, floored at 16. Σ|cluster|² work
    * then stays ~N · targetClusterSize instead of drifting quadratic as
    * the corpus grows under a fixed k — the SemDeDup paper sized k the
    * same way (≈11k clusters against LAION-scale corpora; Abbas et al.
    * 2023 §3). The default target of 4096 is deliberately conservative:
    * per-cluster pair work is bounded by targetClusterSize², the term a
    * caller is actually budgeting. */
  def autoK(n: Long, targetClusterSize: Long = 4096): Int = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    math.min(math.max(16L, (n + targetClusterSize - 1) / targetClusterSize),
      Int.MaxValue.toLong).toInt
  }

  /** (a, b, cos) candidate pairs: same k-means cluster, cosine ≥
    * `threshold`, a < b. Cosine runs in the codegen'd [[VectorKernels]]
    * kernel, not an interpreted HOF lambda.
    *
    * `k` defaults to [[AutoK]]: derive the cluster count from the corpus
    * size, so growing data cannot silently slide a fixed demo-scale k into
    * quadratic per-cluster work. The size comes from `knownN` when the
    * caller already has it (a store version log, a prior job's count —
    * zero extra jobs), else from ONE count job; either way the built index
    * carries it ([[Ivf.Index.nVectors]]), so threshold sweeps over
    * [[pairsWithIndex]] and a [[Ivf.save]] stamp never re-count. Pass an
    * explicit k to pin the geometry (tests, prebuilt-index parity). */
  def pairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int = AutoK, iters: Int = 3, threshold: Double = 0.995,
      knownN: Long = -1L): DataFrame = {
    val n = if (knownN >= 0) knownN else if (k == AutoK) df.count() else -1L
    val kk = if (k == AutoK) autoK(n) else k
    pairsWithIndex(
      Ivf.build(df, idCol, vecCol, kk, iters).copy(nVectors = n), threshold)
  }

  /** [[pairs]] restricted WITHIN a partition column — "semantic near-dups
    * within the same language/license", the curation form [[graft.pipeline
    * .Dedup.minhashLshPairsGrouped]] gives the lexical family. The group
    * key JOINS the cluster key, so two embeddings in different groups can
    * never pair — a pre-filter, not a post-filter: a cross-group cluster
    * collision (translations, templated rewrites landing in one k-means
    * cell) skips cosine evaluation entirely. Clusters stay CORPUS-scoped
    * (one Lloyd build over all groups — geometry is shared; a tiny group
    * still gets sound buckets), so [[autoK]]/[[requireAutoKGeometry]]
    * budgeting is unchanged. Rows with a NULL group are excluded.
    * Output: (group, a, b, cos) with a < b. */
  def pairsGrouped(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, k: Int = AutoK, iters: Int = 3,
      threshold: Double = 0.995, knownN: Long = -1L): DataFrame = {
    val g = F.col(groupCol).cast("string")
    val withG = df.where(g.isNotNull)
    val n = if (knownN >= 0) knownN else if (k == AutoK) withG.count() else -1L
    val kk = if (k == AutoK) autoK(n) else k
    pairsWithIndexGrouped(
      Ivf.build(withG, idCol, vecCol, kk, iters).copy(nVectors = n),
      withG.select(F.col(idCol).as("id"), g.as("td_grp")), threshold)
  }

  /** Grouped pair search over a prebuilt index: `groups` maps each
    * corpus id to its group (id, td_grp). Same reuse contract as
    * [[pairsWithIndex]]; the (cluster, group) join key is what confines
    * the pair fan-out. */
  def pairsWithIndexGrouped(index: Ivf.Index, groups: DataFrame,
      threshold: Double): DataFrame = {
    val assigned = index.assigned.join(groups, Seq("id"))
    val l = assigned.select(F.col("td_grp"), F.col("id").as("a"),
      F.col("v").as("va"), F.col("cluster"))
    val r = assigned.select(F.col("td_grp"), F.col("id").as("b"),
      F.col("v").as("vb"), F.col("cluster"))
    l.join(r, Seq("cluster", "td_grp"))
      .where(F.col("a") < F.col("b"))
      .withColumn("cos", VectorKernels.cosine(F.col("va"), F.col("vb")))
      .where(F.col("cos") >= threshold)
      .select(F.col("td_grp").as("group"), F.col("a"), F.col("b"),
        F.col("cos"))
  }

  /** Pair search over a prebuilt (or [[Ivf.load]]ed) index — the reuse
    * path: cluster once per corpus version, sweep thresholds or re-dedup
    * incrementally without re-running Lloyd. */
  def pairsWithIndex(index: Ivf.Index, threshold: Double): DataFrame = {
    val assigned = index.assigned
    val l = assigned.select(F.col("id").as("a"), F.col("v").as("va"), F.col("cluster"))
    val r = assigned.select(F.col("id").as("b"), F.col("v").as("vb"), F.col("cluster"))
    l.join(r, Seq("cluster"))
      .where(F.col("a") < F.col("b"))
      .withColumn("cos", VectorKernels.cosine(F.col("va"), F.col("vb")))
      .where(F.col("cos") >= threshold)
      .select(F.col("a"), F.col("b"), F.col("cos"))
  }

  /** Validate that a (possibly [[Ivf.load]]ed) index's cluster geometry is
    * the one [[autoK]] would choose for its stamped corpus size — the
    * guard for the reuse path: an index built under AutoK for one corpus
    * version silently re-used against a much larger corpus would degrade
    * toward quadratic per-cluster work; this fails loudly instead.
    * No-ops (returns the index) when the index carries no size stamp or k
    * was pinned explicitly — only stamped AutoK geometry is checkable. */
  def requireAutoKGeometry(index: Ivf.Index,
      targetClusterSize: Long = 4096): Ivf.Index = {
    if (index.nVectors >= 0) {
      val want = autoK(index.nVectors, targetClusterSize)
      if (index.k != want) throw new IllegalStateException(
        s"IVF index k=${index.k} does not match AutoK geometry for its " +
        s"stamped corpus size n=${index.nVectors} (expected k=$want, " +
        s"targetClusterSize=$targetClusterSize) — rebuild the index or pass " +
        "an explicit k to pin the geometry")
    }
    index
  }

  /** (node, component, keep) for every document: semantic duplicate groups
    * via connected components over the pair graph, `keep` marking each
    * group's lowest-id representative (isolated documents keep
    * themselves). */
  def dedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int = AutoK, iters: Int = 3, threshold: Double = 0.995,
      knownN: Long = -1L): DataFrame =
    Clustering.dedupClusters(
      pairs(df, idCol, vecCol, k, iters, threshold, knownN), "a", "b",
      nodes = Some(df.select(idCol)))
}
