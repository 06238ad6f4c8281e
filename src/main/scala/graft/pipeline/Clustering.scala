package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Connected components over near-duplicate pair lists — the step that
  * turns dedup PAIRS (minhash/jaccard/embedding) into dedup CLUSTERS with
  * one representative per group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SOCC'14 — a public
  * algorithm). Each round is two shuffles over the edge set; the edge set
  * contracts toward a star forest whose centers are the component minima in
  * O(log²) rounds (a handful in practice). No driver-side graph, no
  * O(diameter) label propagation — a 100-million-node chain converges in
  * ~7 rounds, not 10⁸.
  *
  * Reference anchor: the reference exposes pairwise dedup only; clustering
  * is the composition its users run downstream (SURVEY §2.10 scale ops).
  */
object Clustering {

  /** (node, component) for every node in `edges` (plus `nodes` if given —
    * isolated nodes map to themselves). Component id = min node id in the
    * component. Node ids must be castable to long. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: Option[DataFrame] = None, maxRounds: Int = 30): DataFrame = {
    val u = F.col("u"); val v = F.col("v")
    // canonical undirected edge set: (min, max), no loops, distinct
    def canon(e: DataFrame): DataFrame =
      e.select(F.least(u, v).as("u"), F.greatest(u, v).as("v"))
        .where(u =!= v).distinct()
    def sym(e: DataFrame): DataFrame =
      e.select(u, v).union(e.select(v.as("u"), u.as("v")))

    // order-independent edge-set signature (count + xxhash64 XOR over the
    // canonical distinct set; XOR cannot overflow under ANSI mode and is
    // partition-order independent), observed DURING the checkpoint job via
    // CollectMetrics instead of a second per-round action — the r18 round
    // halved the per-round job count this way (the old shape paid one
    // extra full pass over the checkpointed edge set per round just to
    // read the signature). A colliding signature on a changed set would
    // stop a round early — astronomically unlikely over distinct 64-bit
    // edge hashes, and the union-find differential spec guards the
    // semantics.
    def checkpointWithSignature(e: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = e.observe(obs, F.count(F.lit(1)).as("n"),
        F.expr("bit_xor(xxhash64(u, v))").as("x")).localCheckpoint()
      val m = obs.get
      val x = m("x")
      (ck, (m("n").asInstanceOf[Long],
        if (x == null) 0L else x.asInstanceOf[Long]))
    }

    // one large-star + small-star pass as a pure plan transform
    def starRound(e0: DataFrame): DataFrame = {
      // large-star: every neighbor larger than u attaches to u's minimum.
      // No distinct here — duplicate edges don't change small-star's min
      // aggregation, and skipping the dedup saves one shuffle per round
      // (the cycle's final canon() dedups once).
      val s1 = sym(e0)
      val m1 = s1.groupBy("u").agg(F.least(F.min(v), u).as("m"))
      val e1 = s1.join(m1, "u").where(v > u)
        .select(F.least(v, F.col("m")).as("u"), F.greatest(v, F.col("m")).as("v"))
        .where(u =!= v)
      // small-star: every neighbor not larger than u attaches to that
      // minimum (each edge considered once, under its larger endpoint)
      val s2 = sym(e1).where(v < u)
      val m2 = s2.groupBy("u").agg(F.min(v).as("m"))
      canon(
        s2.join(m2, "u").select(v.as("u"), F.col("m").as("v"))
          .union(m2.select(u, F.col("m").as("v"))))
    }
    // localCheckpoint truncates lineage per round: plans stay O(1)
    var (e, sig) = checkpointWithSignature(canon(edges.select(
      F.col(srcCol).cast("long").as("u"), F.col(dstCol).cast("long").as("v"))))
    var converged = sig._1 == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      // exactly ONE star round per checkpoint: a star round's intermediate
      // relations each feed several consumers (sym() unions, the min-join),
      // so an un-materialized second round re-executes the first one per
      // consumer — measured 3× slower than paying the checkpoint.
      val (e2, sig2) = checkpointWithSignature(starRound(e))
      converged = sig2 == sig
      sig = sig2
      e = e2
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds")
    // star forest: every edge is (center=min, leaf); centers map to
    // themselves, isolated nodes likewise
    val assign = e.select(v.as("node"), u.as("component"))
      .union(e.select(u.as("node"), u.as("component")).distinct())
    nodes match {
      case None => assign
      case Some(ns) =>
        val all = ns.select(F.col(ns.columns.head).cast("long").as("node"))
        all.join(assign, Seq("node"), "left")
          .select(F.col("node"),
            F.coalesce(F.col("component"), F.col("node")).as("component"))
    }
  }

  /** Dedup clusters straight from near-dup pairs: every document keyed to
    * its cluster representative (min id); `keep = (node == component)`
    * marks the survivor of each cluster. */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String,
      nodes: Option[DataFrame] = None): DataFrame =
    connectedComponents(pairs, aCol, bCol, nodes)
      .withColumn("keep", F.col("node") === F.col("component"))

  /** (anchor, positive) training pairs from duplicate clusters: every
    * non-canonical member pairs with its cluster's canonical (the min-id
    * component representative) — the standard self-supervised positive-
    * pair construction for embedding training (near-duplicates are
    * semantic positives by construction; in-batch items from other
    * clusters serve as negatives). One pair per member, never the
    * quadratic all-pairs within a cluster. */
  def contrastivePairs(pairs: DataFrame, aCol: String, bCol: String,
      nodes: Option[DataFrame] = None): DataFrame =
    connectedComponents(pairs, aCol, bCol, nodes)
      .where(F.col("node") =!= F.col("component"))
      .select(F.col("node").as("anchor"), F.col("component").as("positive"))

  /** Survivorship policy: instead of the min-id representative, keep each
    * cluster's highest-`scoreCol` member (ties → lowest id) — "keep the
    * best copy", the policy real curation pipelines want when duplicates
    * differ in quality. `scores` maps `idCol` → `scoreCol`; one hash
    * aggregation over the assignment (map-side combinable max_by).
    * Members MISSING from `scores` (or with a null score) still count in
    * `cluster_size` and lose survivorship to any scored member — an inner
    * join here would silently erase them from both. */
  def bestPerCluster(assign: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    assign.join(scores.select(F.col(idCol).cast("long").as("node"),
        F.col(scoreCol).as("$td.__score")), Seq("node"), "left")
      .groupBy("component")
      .agg(F.max_by(F.col("node"),
        F.struct(F.col("`$td.__score`").isNotNull.as("scored"),
          F.col("`$td.__score`"), (-F.col("node")).as("nid"))).as("keep_id"),
        F.count(F.lit(1)).as("cluster_size"))
}
