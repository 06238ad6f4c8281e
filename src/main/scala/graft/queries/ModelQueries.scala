package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.pipeline.{GraphRank, Pca, Privacy, QualityModel, TextAnalysis}

/** Gate queries for the round-13 model/analysis operators: PCA power
  * iteration over embeddings, k-fold cross-validation of the logistic
  * quality model, PageRank graph importance, k-anonymity/l-diversity
  * privacy checks, and readability scores. */
object ModelQueries {
  private def d(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // the same engineered quality signals as q_quality_lr (ScaleQueries),
  // restated here with doc_id kept as the fold key for cross-validation
  private def lrFeatures(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "documents")
      .where(F.col("n_chars").isNotNull && F.col("text").isNotNull &&
        F.col("lang").isNotNull)
      .select(F.col("doc_id"),
        (F.col("n_chars").cast("double") / 1000.0d).as("x1"),
        (F.size(F.filter(
          F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
          t => t =!= "")).cast("double") / 100.0d).as("x2"),
        F.when(F.col("lang") === "en", 1.0d).otherwise(0.0d).as("y"))

  // customer→supplier trade edges via orders ⋈ lineitem (distinct pairs)
  private def tradeEdgesOneWay(s: SparkSession, dir: String): DataFrame = {
    val o = d(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = d(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).as("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).as("dst"))
      .distinct()
  }

  // symmetric customer↔supplier trade graph: who transacted with whom —
  // symmetrizing removes dangling nodes, so the simplified PageRank is
  // exactly the stochastic one; `evenOrdersOnly` restricts the order
  // snapshot (the "past" graph of the rank-drift gate)
  private def tradeEdgesSym(s: SparkSession, dir: String,
      evenOrdersOnly: Boolean): DataFrame = {
    val o0 = d(s, dir, "orders").select("o_orderkey", "o_custkey")
    val o = if (evenOrdersOnly) o0.where(F.col("o_orderkey") % 2 === 0) else o0
    val l = d(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).as("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    e0.union(e0.select(F.col("dst").as("src"), F.col("src").as("dst")))
  }

  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    tradeEdgesSym(s, dir, evenOrdersOnly = false)

  // the same graph with edge weight = number of line items transacted
  // between the pair, symmetrized with the weight carried both ways
  private def tradeEdgesWeighted(s: SparkSession, dir: String): DataFrame = {
    val o = d(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = d(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).as("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).as("dst"))
      .agg(F.count(F.lit(1)).cast("double").as("w"))
    e0.union(e0.select(F.col("dst").as("src"), F.col("src").as("dst"),
      F.col("w")))
  }

  private val Dim = 64

  private def tempStore(s: SparkSession): graft.store.TableStore =
    new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-model").toString, s)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca_component" -> ((s, dir) => {
      // top principal component of the embedding table by 3 power-
      // iteration passes — fixed-point gradient-style sums, so the
      // oracle replays every iterate bit-for-bit (see pipeline.Pca)
      import s.implicits._
      val m = Pca.fit(d(s, dir, "embeddings"), "embedding", Dim, iters = 3)
      (1 to Dim).map(i => (i, m.weights(i - 1))).toDF("dim", "weight")
        .orderBy(F.col("dim").asc)
    }),
    "q_pca_scores" -> ((s, dir) => {
      // the fitted component applied corpus-wide: centered projection
      // per vector (row-local pinned-fold arithmetic, zero shuffles)
      val emb = d(s, dir, "embeddings")
      val m = Pca.fit(emb, "embedding", Dim, iters = 3)
      Pca.score(emb, "vec_id", "embedding", m)
        .orderBy(F.col("vec_id").asc)
    }),
    "q_pca_component2" -> ((s, dir) => {
      // the second component by in-expression deflation: power
      // iteration on xc − (xc·w1)·w1, trajectory replayed by the oracle
      import s.implicits._
      val emb = d(s, dir, "embeddings")
      val m1 = Pca.fit(emb, "embedding", Dim, iters = 3)
      val m2 = Pca.fitDeflated(emb, "embedding", Dim, iters = 3, m1)
      (1 to Dim).map(i => (i, m2.weights(i - 1))).toDF("dim", "weight")
        .orderBy(F.col("dim").asc)
    }),
    "q_pca_topk" -> ((s, dir) => {
      // TOP-3 components by iterated deflation (Pca.fitK): component 1
      // = q_pca_component, 2 = q_pca_component2 bit-for-bit; component
      // 3 deflates against both priors left-to-right — the oracle
      // replays all three power-iteration trajectories
      import s.implicits._
      val ms = Pca.fitK(d(s, dir, "embeddings"), "embedding", Dim,
        k = 3, iters = 3)
      ms.zipWithIndex.flatMap { case (m, c) =>
        (1 to Dim).map(i => (c + 1, i, m.weights(i - 1)))
      }.toDF("component", "dim", "weight")
        .orderBy(F.col("component").asc, F.col("dim").asc)
    }),
    "q_pca_whiten" -> ((s, dir) => {
      // PCA WHITENING: per-vector scores on the top-2 components scaled
      // by 1/√λ — unit variance along each principal axis, the
      // SemDedup-style embedding normalization; row-local folds, zero
      // shuffles beyond the fit
      val emb = d(s, dir, "embeddings")
      val ms = Pca.fitK(emb, "embedding", Dim, k = 2, iters = 3)
      Pca.whitenK(emb, "vec_id", "embedding", ms)
        .orderBy(F.col("vec_id").asc)
    }),
    "q_pca_variance" -> ((s, dir) => {
      // eigenvalue vs total variance: how much of the embedding space
      // the first component explains (one extra fixed-point pass)
      val emb = d(s, dir, "embeddings")
      val m = Pca.fit(emb, "embedding", Dim, iters = 3)
      Pca.explainedVariance(emb, "embedding", m)
    }),
    "q_quality_cv" -> ((s, dir) => {
      // 3-fold cross-validation of the trainable quality model:
      // portable md5 folds, per-fold fixed-point GD training + exact
      // held-out AUC — the oracle replays all three trainings AND all
      // three holdout rankings
      QualityModel.crossValidate(lrFeatures(s, dir), Seq("x1", "x2"), "y",
        idCol = "doc_id", k = 3, iters = 3, lr = 1.0)
    }),
    "q_graph_pagerank" -> ((s, dir) => {
      // PageRank over the symmetric customer↔supplier trade graph,
      // 5 damped iterations with fixed-point contribution sums — the
      // oracle replays the trajectory
      GraphRank.pagerank(tradeEdges(s, dir), "src", "dst",
        iters = 5, damping = 0.85)
    }),
    "q_corr_merge" -> ((s, dir) => {
      // three disjoint shards stamped independently, rolled up with
      // zero rescan: decimal sums add exactly, so the merged Pearson is
      // bit-equal to correlating the union — the oracle states the
      // whole-corpus correlation directly
      import graft.pipeline.Report
      val li = d(s, dir, "lineitem")
      val stamps = (0 until 3).map(m =>
        Report.corrStamp(li.where(F.col("l_orderkey") % 3 === m),
          "l_quantity", "l_extendedprice")).reduce(_ unionByName _)
      Report.mergeCorrStamps(stamps)
    }),
    "q_corr_store_rollup" -> ((s, dir) => {
      // the correlation family's STORE face (profile/KMV/Bloom/CMS all
      // have one): three crawl shards published as store versions,
      // stamped per version via @HEAD~n refs, rolled up with zero
      // rescan of history — bit-equal to correlating the union
      import graft.pipeline.Report
      val li = d(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val store = tempStore(s)
      (0 until 3).foreach(m =>
        store.write("g", "crli", li.where(F.col("l_orderkey") % 3 === m)))
      val stamps = Seq("g/crli@HEAD~2", "g/crli@HEAD~1", "g/crli@HEAD")
        .map(r => Report.corrStamp(store.scan(r).get.df,
          "l_quantity", "l_extendedprice"))
        .reduce(_ unionByName _)
      Report.mergeCorrStamps(stamps)
    }),
    "q_stream_corr" -> ((s, dir) => {
      // live feature-coupling monitor: per-hour Pearson of value vs
      // user id through Structured Streaming — the same fixed-point
      // stamp algebra as the batch family, finished in-plan per window
      val (tmp, schema) = graft.streaming.StreamStage.stage(
        s, s"$dir/events", d(s, dir, "events"))
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val wc = graft.streaming.Streams.windowedCorr(stream, "ts",
        "value", "user_id", "1 hour", "1 hour")
      graft.streaming.StreamStage.runToMemory(wc, "q_stream_corr_",
          "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("n"), F.col("corr"))
        .orderBy(F.col("hour_epoch").asc)
    }),
    "q_assoc_rules" -> ((s, dir) => {
      // market-basket rules over per-user event-type sets: support /
      // confidence / lift with exact counts, both rule directions
      graft.operators.Funnel.associationRules(d(s, dir, "events"),
        "user_id", "event_type", minBoth = 5L)
    }),
    "q_rfm" -> ((s, dir) => {
      // RFM user segmentation: recency/frequency/monetary with
      // deterministic equi-depth quintile scores (ordinal ranks via the
      // range shuffle, ties pinned by user id)
      graft.operators.Funnel.rfm(d(s, dir, "events"), "user_id", "ts",
        "value")
    }),
    "q_sessionize_batch" -> ((s, dir) => {
      // gap-based sessionization, batch face (30-minute gap): keyed
      // lag + running session counter, per-session rollup
      graft.operators.Funnel.sessionize(d(s, dir, "events"), "user_id",
        "ts", gapSec = 1800L, tiebreaker = "event_id")
    }),
    "q_model_registry" -> ((s, dir) => {
      // a model REGISTRY on the versioned store: train v1 on half the
      // corpus, publish; retrain v2 on all of it, publish; then load
      // the PREVIOUS version via @HEAD~1 (the rollback read) and score
      // the corpus with it. The store is transport — the oracle replays
      // v1's training trajectory and the scoring arithmetic directly
      import graft.pipeline.QualityModel
      import s.implicits._
      val feats = lrFeatures(s, dir)
      val store = tempStore(s)
      def publish(w: Array[Double]): Unit =
        store.write("m", "quality",
          Seq((Seq("x1", "x2"), w.toSeq, QualityModel.GradScale))
            .toDF("features", "weights", "grad_scale"))
      publish(QualityModel.trainLogistic(
        feats.where(F.col("doc_id") % 2 === 0), Seq("x1", "x2"), "y",
        iters = 3, lr = 1.0))
      publish(QualityModel.trainLogistic(
        feats, Seq("x1", "x2"), "y", iters = 3, lr = 1.0))
      val prev = store.scan("m/quality@HEAD~1").get.df
      val w = prev.select("weights").head().getSeq[Double](0)
      QualityModel.scoreLogistic(feats, Seq("x1", "x2"), w, "score")
        .select(F.col("doc_id"), F.col("score"))
        .orderBy(F.col("score").desc, F.col("doc_id").asc)
        .limit(10)
    }),
    "q_graph_communities" -> ((s, dir) => {
      // deterministic label-propagation communities over the symmetric
      // trade graph (3 synchronous rounds, ties to the smallest label)
      // — which customer/supplier cliques trade among themselves; exact
      // integer/string arithmetic, the oracle replays every round
      GraphRank.labelPropagation(tradeEdges(s, dir), "src", "dst",
        iters = 3)
    }),
    "q_graph_conductance" -> ((s, dir) => {
      // did label propagation find REAL communities: per-community
      // conductance (cut over the smaller side's volume) of the LPA
      // partition — exact integer counts, one stated division; the
      // oracle replays the three LPA rounds and the cut/volume algebra
      val e = tradeEdges(s, dir)
      val labels = GraphRank.labelPropagation(e, "src", "dst", iters = 3)
      GraphRank.communityConductance(e, "src", "dst", labels)
    }),
    "q_graph_modularity" -> ((s, dir) => {
      // community QUALITY as a single score: Newman modularity of the
      // LPA partition — per-community stated contributions dq and the
      // pinned ascending fold Q = Σ(intra/E − (vol/E)²); exact integer
      // (vol, cut, intra) until the stated divisions, so the oracle
      // replays the three LPA rounds and the whole finishing algebra
      val e = tradeEdges(s, dir)
      val labels = GraphRank.labelPropagation(e, "src", "dst", iters = 3)
      GraphRank.modularity(e, "src", "dst", labels)
    }),
    "q_graph_modularity_weighted" -> ((s, dir) => {
      // does the LPA partition hold up when edges carry VOLUME: weighted
      // modularity over the line-item-count trade weights (exact
      // DECIMAL(38,6) sums until the stated divisions) — the same
      // partition can score well on the skeleton and poorly on volume
      val labels = GraphRank.labelPropagation(tradeEdges(s, dir),
        "src", "dst", iters = 3)
      GraphRank.modularityWeighted(tradeEdgesWeighted(s, dir),
        "src", "dst", "w", labels)
    }),
    "q_graph_pagerank_convergence" -> ((s, dir) => {
      // is 5 iterations ENOUGH: per-round exact L1 movement of the
      // PageRank fixed-point trajectory (Σ|fp(r_k) − fp(r_{k-1})| as
      // integers) — the signal a real curation run reads before
      // trusting the ranks; the oracle replays all five deltas
      import s.implicits._
      val (_, deltas) = GraphRank.pagerankConverged(tradeEdges(s, dir),
        "src", "dst", maxIters = 5, earlyStop = false)
      deltas.zipWithIndex
        .map { case (d, i) => ((i + 1).toLong, d) }
        .toDF("round", "delta_fp")
        .orderBy(F.col("round").asc)
    }),
    "q_graph_lpa_convergence" -> ((s, dir) => {
      // did label propagation SETTLE: per-round changed-label counts of
      // the same three deterministic LPA rounds (one agg per cached
      // iterate) — the convergence readout a real curation run checks
      // before trusting the partition; the oracle replays each round
      // and counts l_{k-1} vs l_k disagreements
      import s.implicits._
      val (_, changes) = GraphRank.labelPropagationConverged(
        tradeEdges(s, dir), "src", "dst", maxIters = 3, earlyStop = false)
      changes.zipWithIndex
        .map { case (c, i) => ((i + 1).toLong, c) }
        .toDF("round", "changed")
        .orderBy(F.col("round").asc)
    }),
    "q_graph_hits_convergence" -> ((s, dir) => {
      // did HITS SETTLE: per-round joint L1 movement of the hub AND
      // authority fixed-point images (Σ|fp(h_k)−fp(h_{k−1})| +
      // Σ|fp(a_k)−fp(a_{k−1})|, a_0 = h_0 = the all-ones init) — the
      // same trajectory-replay contract as q_graph_pagerank_convergence;
      // the oracle replays all three pass pairs and both deltas
      import s.implicits._
      val (_, deltas) = GraphRank.hitsConverged(tradeEdgesOneWay(s, dir),
        "src", "dst", maxIters = 3, earlyStop = false)
      deltas.zipWithIndex
        .map { case (dl, i) => ((i + 1).toLong, dl) }
        .toDF("round", "delta_fp")
        .orderBy(F.col("round").asc)
    }),
    "q_ab_mannwhitney_sliced" -> ((s, dir) => {
      // the Simpson's-paradox check: the rank-sum A/B readout PER
      // event-type slice (per-slice midranks through one composite
      // range shuffle) — does A beat B everywhere, or only in aggregate
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("event_type").isNotNull)
        .groupBy(F.col("event_type"), F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("revenue"))
        .select(F.col("event_type"),
          F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
            .as("variant"), F.col("revenue"))
      graft.pipeline.Report.mannWhitneyUByGroup(rev, "event_type",
        "variant", "revenue")
    }),
    "q_ab_kruskal" -> ((s, dir) => {
      // k-variant rank ANOVA: Kruskal-Wallis H over three user cohorts'
      // fixed-point revenue totals — does ANY cohort differ, with the
      // tie-corrected statistic; one ranked pass, bounded group fold
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("revenue"))
        .select(F.when(F.col("user_id") % 3 === 0, "A")
          .when(F.col("user_id") % 3 === 1, "B").otherwise("C")
          .as("variant"), F.col("revenue"))
      graft.pipeline.Report.kruskalWallis(rev, "variant", "revenue")
    }),
    "q_corr_spearman" -> ((s, dir) => {
      // monotone association on skewed pricing columns: Spearman rho =
      // Pearson over exact midranks (two range shuffles + the corr-stamp
      // fixed-point algebra) — the rank-based companion of q_corr_merge
      graft.pipeline.Report.spearmanCorr(
        d(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
    }),
    "q_ewma_daily_grouped" -> ((s, dir) => {
      // per-event-type trend baselines: one EWMA per slice off the
      // bounded slices x days grid — the grouped face of q_ewma_daily
      graft.pipeline.Report.ewmaDailyByGroup(d(s, dir, "events"),
          "event_type", "ts", alpha = 0.3)
        .select(F.col("group"),
          F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("cnt"), F.col("ewma"))
        .orderBy(F.col("group").asc, F.col("day_num").asc)
    }),
    "q_seasonal_daily" -> ((s, dir) => {
      // weekday-aware volume anomalies: each day z-scored against ITS
      // day-of-week mean/std (epoch-days mod 7, calendar-free) — the
      // seasonal face of the EWMA/CUSUM anomaly family
      graft.pipeline.Report.seasonalDaily(d(s, dir, "events"), "ts")
        .select(F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("dow"), F.col("cnt"), F.col("dow_mean"), F.col("dow_std"),
          F.col("z"))
        .orderBy(F.col("day_num").asc)
    }),
    "q_cusum_daily" -> ((s, dir) => {
      // change-point ramps over daily volume: two-sided CUSUM against
      // the grand mean with slack 2 — where did traffic SHIFT, not just
      // spike; bounded-day-grid prefix folds, day as epoch days
      graft.pipeline.Report.cusumDaily(d(s, dir, "events"), "ts",
          slack = 2.0)
        .select(F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("cnt"), F.col("cusum_hi"), F.col("cusum_lo"))
        .orderBy(F.col("day_num").asc)
    }),
    "q_cusum_daily_grouped" -> ((s, dir) => {
      // per-slice change points: each event type's ramps against ITS
      // OWN grand mean — the grouped face completing the anomaly
      // family's third leg (EWMA trend / seasonal pattern / CUSUM shift,
      // each now single + grouped)
      graft.pipeline.Report.cusumDailyByGroup(d(s, dir, "events"),
          "event_type", "ts", slack = 2.0)
        .select(F.col("group"),
          F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("cnt"), F.col("cusum_hi"), F.col("cusum_lo"))
        .orderBy(F.col("group").asc, F.col("day_num").asc)
    }),
    "q_ab_mannwhitney" -> ((s, dir) => {
      // nonparametric A/B test on a SKEWED metric: per-user fixed-point
      // event-value totals, even/odd cohorts, Mann-Whitney U with
      // midranks + tie correction — the rank-based companion of
      // q_ab_ztest (a mean-based z misleads on heavy-tailed revenue)
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("revenue"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("revenue"))
      graft.pipeline.Report.mannWhitneyU(rev, "variant", "revenue")
    }),
    "q_ab_welch" -> ((s, dir) => {
      // parametric A/B on the same cohorts: Welch's unequal-variance t
      // over per-user revenue totals (one keyed moments pass, bounded
      // 2-struct fold, Welch-Satterthwaite dof) — the mean-difference
      // companion of q_ab_mannwhitney's rank test. Revenue re-scales to
      // ORIGINAL units (one stated division) so the moments pass's
      // squared fixed-point image stays inside the family's long domain
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg((F.sum(F.floor(F.col("value").cast("double") *
            F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).cast("double") /
          F.lit(1048576.0d)).as("revenue"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("revenue"))
      graft.pipeline.Report.welchT(rev, "variant", "revenue")
    }),
    "q_ab_cliffs_delta" -> ((s, dir) => {
      // effect SIZE next to the U test's significance: Cliff's delta
      // via the exact rank identity (2U_A − n_A·n_B)/(n_A·n_B) — no
      // quadratic pair enumeration — with the Romano 2006 magnitude band
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("revenue"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("revenue"))
      graft.pipeline.Report.cliffsDelta(rev, "variant", "revenue")
    }),
    "q_ab_ks" -> ((s, dir) => {
      // distribution-SHAPE A/B on the same cohorts: exact two-sample KS
      // D over per-user revenue totals — catches variance/tail changes
      // the U test (dominance) and Welch (means) both miss; cumulative
      // counts ride the two-phase range prefix, never an unpartitioned
      // window
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("revenue"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("revenue"))
      graft.pipeline.Report.ksTwoSample(rev, "variant", "revenue")
    }),
    "q_ab_welch_sliced" -> ((s, dir) => {
      // per-slice parametric A/B with WITHIN-SLICE TIES baked into the
      // fixture (the r16 advice lesson): the metric is each user's
      // event COUNT in the slice — small integers, heavily tied — so
      // the per-slice algebra is exercised on exactly the input that
      // broke the first sliced rank operator
      val eng = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("event_type").isNotNull)
        .groupBy(F.col("event_type"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("double").as("n_events"))
        .select(F.col("event_type"),
          F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
            .as("variant"), F.col("n_events"))
      graft.pipeline.Report.welchTByGroup(eng, "event_type", "variant",
        "n_events")
    }),
    "q_ab_ks_sliced" -> ((s, dir) => {
      // per-slice distribution-shape A/B on the tied event-count
      // metric: exact KS D within each event type through ONE composite
      // range prefix — which segment's metric actually changed shape
      val eng = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("event_type").isNotNull)
        .groupBy(F.col("event_type"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("double").as("n_events"))
        .select(F.col("event_type"),
          F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
            .as("variant"), F.col("n_events"))
      graft.pipeline.Report.ksTwoSampleByGroup(eng, "event_type",
        "variant", "n_events")
    }),
    "q_ab_cliffs_sliced" -> ((s, dir) => {
      // per-slice effect size on the same tied fixture: min-ranks
      // within each slice, the exact rank identity per slice — did A's
      // dominance hold in EVERY event type or only in aggregate
      val eng = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("event_type").isNotNull)
        .groupBy(F.col("event_type"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("double").as("n_events"))
        .select(F.col("event_type"),
          F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
            .as("variant"), F.col("n_events"))
      graft.pipeline.Report.cliffsDeltaByGroup(eng, "event_type",
        "variant", "n_events")
    }),
    "q_seasonal_daily_grouped" -> ((s, dir) => {
      // weekday anomalies PER SLICE: each event type's days z-scored
      // against that type's own weekday moments — the grouped face of
      // q_seasonal_daily, completing the per-slice anomaly family
      graft.pipeline.Report.seasonalDailyByGroup(d(s, dir, "events"),
          "event_type", "ts")
        .select(F.col("group"),
          F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("dow"), F.col("cnt"), F.col("dow_mean"), F.col("dow_std"),
          F.col("z"))
        .orderBy(F.col("group").asc, F.col("day_num").asc)
    }),
    "q_graph_assort_nation" -> ((s, dir) => {
      // the echo-chamber read: does trade stay WITHIN a nation —
      // categorical assortativity over the bounded nation mixing matrix
      // (Newman 2003 eq. 2); exact counts until the stated divisions
      val cust = d(s, dir, "customer").select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).as("node"),
        F.col("c_nationkey").cast("string").as("attr"))
      val supp = d(s, dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).as("node"),
        F.col("s_nationkey").cast("string").as("attr"))
      GraphRank.attributeAssortativity(tradeEdges(s, dir), "src", "dst",
        cust.unionByName(supp))
    }),
    "q_graph_reach" -> ((s, dir) => {
      // 2-hop neighborhood size per node, EXACT (the spam-farm reach
      // anomaly signal): distinct transitive pairs at k=2 — this is the
      // verification twin; the 100 TB path is the HyperBall HLL variant
      // whose per-node state never grows (RecallSpec pins its accuracy)
      GraphRank.kHopReach(tradeEdges(s, dir), "src", "dst", k = 2)
    }),
    "q_graph_kcore" -> ((s, dir) => {
      // dense-core extraction: 3 peeling rounds at k=5 over the trade
      // graph — who keeps >= 5 trading partners after the leaves fall
      // away; exact integer degrees, the oracle replays every round
      GraphRank.kCore(tradeEdges(s, dir), "src", "dst", k = 5, iters = 3)
    }),
    "q_graph_ppr" -> ((s, dir) => {
      // PERSONALIZED PageRank from a curated seed set (nation-0
      // customers): teleport mass restarts only at the seeds, so
      // standing propagates outward from them through the trade graph —
      // the seed-set quality-propagation read; 5 damped iterations,
      // the whole trajectory replayed by the oracle
      val seeds = d(s, dir, "customer").where(F.col("c_nationkey") === 0)
        .select(F.concat(F.lit("c:"), F.col("c_custkey").cast("string"))
          .as("node"))
      GraphRank.pagerankPersonalized(tradeEdges(s, dir), "src", "dst",
        seeds, "node", iters = 5, damping = 0.85)
    }),
    "q_graph_rank_drift" -> ((s, dir) => {
      // importance drift on an EVOLVING graph: PageRank over the
      // half-order "past" snapshot vs the full graph, full-outer on
      // node with the delta — which entities gained standing as the
      // graph grew (nodes absent in the past answer NULL honestly)
      val past = GraphRank.pagerank(
        tradeEdgesSym(s, dir, evenOrdersOnly = true), "src", "dst",
        iters = 5, damping = 0.85)
      val cur = GraphRank.pagerank(
        tradeEdgesSym(s, dir, evenOrdersOnly = false), "src", "dst",
        iters = 5, damping = 0.85)
      past.withColumnRenamed("rank", "rank_past")
        .join(cur.withColumnRenamed("rank", "rank_cur"),
          Seq("node"), "full_outer")
        .select(F.col("node"), F.col("rank_past"), F.col("rank_cur"),
          (F.col("rank_cur") - F.col("rank_past")).as("rank_delta"))
        .orderBy(F.col("node").asc)
    }),
    "q_graph_pagerank_weighted" -> ((s, dir) => {
      // PageRank with transaction-volume edge weights: contribution
      // proportional to the lineitem count between the pair
      GraphRank.pagerankWeighted(tradeEdgesWeighted(s, dir), "src", "dst",
        "w", iters = 5, damping = 0.85)
    }),
    "q_graph_hits" -> ((s, dir) => {
      // HITS on the DIRECTED customer→supplier graph: customers are
      // pure hubs, suppliers pure authorities; 3 iterations, every
      // fixed-point pass and L2 norm replayed by the oracle
      GraphRank.hits(tradeEdgesOneWay(s, dir), "src", "dst", iters = 3)
    }),
    "q_graph_triangles" -> ((s, dir) => {
      // co-purchase triangles: parts appearing in the same order (10%
      // order sample) — exact per-node triangle counts and local
      // clustering coefficients via the oriented three-way join
      val li = d(s, dir, "lineitem")
        .where(F.col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_partkey")
      val e = li.as("x").join(li.as("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").as("src"),
          F.col("y.l_partkey").as("dst"))
      GraphRank.triangles(e, "src", "dst")
    }),
    "q_graph_closeness" -> ((s, dir) => {
      // who sits centrally in the trade graph: exact 2-hop-truncated
      // closeness + harmonic centrality (the honest bounded cut — an
      // unbounded exact answer is a full APSP; HyperBall estimates the
      // same balls past this scale)
      GraphRank.closenessTruncated(tradeEdges(s, dir), "src", "dst",
        maxHops = 2)
    }),
    "q_graph_linkpred" -> ((s, dir) => {
      // who should transact next: common-neighbor / Jaccard /
      // Adamic-Adar scores for the top non-edges of the trade graph —
      // the hub cap (deg ≤ 60) keeps pair generation off the
      // highest-degree intermediates, the same maxDf lesson as minhash
      GraphRank.linkPrediction(tradeEdges(s, dir), "src", "dst",
        k = 100, maxHubDegree = 60L)
    }),
    "q_corr_by_group" -> ((s, dir) => {
      // per-returnflag quantity↔price correlation, fully in-plan (the
      // unbounded-group face of q_corr_matrix)
      graft.pipeline.Report.corrByGroup(d(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_extendedprice")
    }),
    "q_privacy_kanon" -> ((s, dir) => {
      // k-anonymity equivalence classes over (nation, market segment)
      Privacy.kAnonymity(d(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)
    }),
    "q_privacy_kanon_summary" -> ((s, dir) => {
      Privacy.kAnonymitySummary(d(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)
    }),
    "q_privacy_ldiv" -> ((s, dir) => {
      // distinct l-diversity of order status within
      // (priority, order year) classes — old years have no 'O' rows,
      // so real violations appear
      Privacy.lDiversity(
        d(s, dir, "orders").withColumn("o_year", F.year(F.col("o_orderdate"))),
        Seq("o_orderpriority", "o_year"), "o_orderstatus", l = 3L)
    }),
    "q_privacy_tclose" -> ((s, dir) => {
      // t-closeness of order status within (priority, order year)
      // classes: the distribution-level leak l-diversity misses — a
      // class can be 3-diverse yet nearly all-'F' where the corpus is
      // mixed; TVD per class against the corpus mix, absent values'
      // mass folded without a dense grid
      Privacy.tCloseness(
        d(s, dir, "orders").withColumn("o_year", F.year(F.col("o_orderdate"))),
        Seq("o_orderpriority", "o_year"), "o_orderstatus", threshold = 0.2)
    }),
    "q_privacy_tclose_ordered" -> ((s, dir) => {
      // ordered/EMD t-closeness for a NUMERIC sensitive attribute: order
      // YEAR within (priority, status) classes — status encodes order
      // age ('F' classes sit in the early years, 'O' in the late ones),
      // so their year mixes sit FAR from the corpus under the ordered
      // metric while TVD would misprice the distance. Exact integer
      // prefix algebra over the bounded year grid; one stated division.
      // Threshold sits inside the observed t range so the violates
      // column carries a real true/false mix at gate scale
      Privacy.tClosenessOrdered(
        d(s, dir, "orders").withColumn("o_year", F.year(F.col("o_orderdate"))),
        Seq("o_orderpriority", "o_orderstatus"), "o_year", threshold = 0.01)
    }),
    "q_quality_lr_l2" -> ((s, dir) => {
      // ridge-regularized training: the same fixed-point GD trajectory
      // with λ·w shrinkage on the feature weights (intercept
      // unpenalized) — the oracle replays the regularized updates
      import s.implicits._
      val w = QualityModel.trainLogisticL2(lrFeatures(s, dir),
        Seq("x1", "x2"), "y", iters = 3, lr = 1.0, l2 = 0.05)
      Seq((w(0), w(1), w(2))).toDF("w0", "w1", "w2")
    }),
    "q_gini_by_group" -> ((s, dir) => {
      // per-language concentration: one composite-key rank pass for
      // all groups, one keyed aggregation
      graft.operators.Quantiles.giniByGroup(
        d(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", tiebreakers = Seq("doc_id"))
    }),
    "q_gini_drift" -> ((s, dir) => {
      // concentration drift through the versioned store: Gini of
      // document lengths PER STORED VERSION via @HEAD~n refs (version 1
      // = the even-id half, version 2 = the full corpus) with the delta
      // against the previous version — "did the corpus get more
      // head-heavy between releases" as one bounded-output query;
      // completes the concentration family's store face (batch and
      // per-group faces landed in r13). The 2-row delta window is
      // bounded by the version count (the Lorenz convention).
      import graft.operators.Quantiles
      val docs = d(s, dir, "documents").select("doc_id", "n_chars")
      val store = tempStore(s)
      store.write("g", "gdocs", docs.where(F.col("doc_id") % 2 === 0))
      store.write("g", "gdocs", docs)
      def g(ref: String, v: Int) =
        Quantiles.gini(store.scan(ref).get.df, "n_chars",
            tiebreakers = Seq("doc_id"))
          .select(F.lit(v).as("version"), F.col("n"), F.col("total"),
            F.col("gini"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(F.col("version").asc)
      g("g/gdocs@HEAD~1", 1).unionByName(g("g/gdocs@HEAD", 2))
        .withColumn("gini_delta",
          F.col("gini") - F.lag(F.col("gini"), 1).over(w))
        .orderBy(F.col("version").asc)
    }),
    "q_tail_index" -> ((s, dir) => {
      // Hill estimator over the 100 largest document lengths: how heavy
      // is the corpus's upper tail (the partition-sizing read next to
      // q_skew_stats); bounded k+1 head, libm-ln fold
      graft.operators.SkewDiag.tailIndex(
        d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
        k = 100, tiebreakers = Seq("doc_id"))
    }),
    "q_hhi" -> ((s, dir) => {
      // Herfindahl concentration of corpus sources — the market-share
      // read next to Gini (one count shuffle, bounded sorted fold)
      graft.operators.SkewDiag.hhi(d(s, dir, "documents"), "source")
    }),
    "q_gini" -> ((s, dir) => {
      // corpus-composition concentration: Gini of document lengths
      // (rank formula, fixed-point sums, range-shuffle ordinal ranks)
      graft.operators.Quantiles.gini(
        d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
        tiebreakers = Seq("doc_id"))
    }),
    "q_lorenz" -> ((s, dir) => {
      // the matching Lorenz deciles: cumulative token share of the
      // bottom k/10 of documents, DECIMAL-exact cumulative sums
      graft.operators.Quantiles.lorenzCurve(
        d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
        buckets = 10, tiebreakers = Seq("doc_id"))
    }),
    "q_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson over lineitem's pricing columns in ONE
      // fixed-point aggregation pass — the finishing algebra is O(d²)
      // driver metadata, every double op stated once for the oracle
      graft.pipeline.Report.correlationMatrix(d(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),
    "q_pca_recon" -> ((s, dir) => {
      // per-vector squared reconstruction error of the top-2 fit: which
      // embeddings the compressed space represents worst (row-local
      // residual folds; the oracle replays both trajectories + the fold)
      val emb = d(s, dir, "embeddings")
      val ms = Pca.fitK(emb, "embedding", Dim, k = 2, iters = 3)
      Pca.reconstructionError(emb, "vec_id", "embedding", ms)
        .orderBy(F.col("vec_id").asc)
    }),
    "q_ab_ztest" -> ((s, dir) => {
      // A/B readout: even- vs odd-id user cohorts, conversion = at
      // least one purchase event, pooled two-proportion z statistic
      val conv = d(s, dir, "events")
        .where(F.col("user_id").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.max(F.when(F.col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("conv"))
      graft.pipeline.Report.twoProportionZ(conv, "variant", "conv")
    }),
    "q_markov_stationary" -> ((s, dir) => {
      // long-run behavior profile: the stationary distribution of the
      // event-type transition chain — 10 power-iteration passes on the
      // bounded k² transition metadata, the fixed-point companion of
      // q_transition_matrix; the oracle replays all ten iterates
      graft.operators.Funnel.markovStationary(d(s, dir, "events"),
        "user_id", "ts", "event_type", tiebreaker = "event_id", iters = 10)
    }),
    "q_dq_benford" -> ((s, dir) => {
      // first-digit DQ screen on prices: observed digit shares vs
      // Benford's log10(1+1/d) law, libm-pinned digit extraction
      graft.dq.Dq.benford(d(s, dir, "lineitem"), "l_extendedprice")
    }),
    "q_chi_squared" -> ((s, dir) => {
      // does source predict language, as a TEST STATISTIC: Pearson χ²
      // over the bounded (lang, source) grid — absent cells included
      // via the Σe=n identity — plus dof and Cramér's V; the
      // hypothesis-test face of q_mutual_info
      graft.pipeline.Report.chiSquared(
        d(s, dir, "documents"), "lang", "source")
    }),
    "q_graph_assortativity" -> ((s, dir) => {
      // degree assortativity of the trade graph (Newman 2002): Pearson
      // over directed edge endpoints' degrees — negative = hubs attach
      // to leaves (disassortative). One degree count + two joins, then
      // the corr-stamp fixed-point algebra
      val e = tradeEdges(s, dir)
      val deg = e.groupBy(F.col("src"))
        .agg(F.count(F.lit(1)).cast("double").as("du"))
      val dd = e.join(deg, "src")
        .join(deg.select(F.col("src").as("dst"), F.col("du").as("dv")),
          "dst")
      graft.pipeline.Report.mergeCorrStamps(
        graft.pipeline.Report.corrStamp(dd, "du", "dv"))
    }),
    "q_ewma_daily" -> ((s, dir) => {
      // exponentially-weighted daily-volume baseline (α = 0.3): the
      // anomaly monitor's expected-traffic curve, bounded-fold exact
      // (day as epoch days — the hour_epoch comparison convention)
      graft.pipeline.Report.ewmaDaily(d(s, dir, "events"), "ts",
          alpha = 0.3)
        .select(F.unix_date(F.col("day")).cast("long").as("day_num"),
          F.col("cnt"), F.col("ewma"))
        .orderBy(F.col("day_num").asc)
    }),
    "q_mutual_info" -> ((s, dir) => {
      // does source predict language? MI + marginal entropies + NMI
      // over the bounded (lang, source) cell relation — SkewDiag's
      // pinned bounded-fold convention, libm ln
      graft.pipeline.Report.mutualInformation(
        d(s, dir, "documents"), "lang", "source")
    }),
    "q_stream_profile" -> ((s, dir) => {
      // the dataset-card profile LIVE: per-hour mergeable column stamps
      // through Structured Streaming, exploded and rolled up with
      // Report.mergeProfiles — bit-equal to profiling the whole corpus,
      // so the oracle states each column's batch stats directly (the
      // third face of the profile family: batch, store rollup, stream)
      val (tmp, schema) = graft.streaming.StreamStage.stage(
        s, s"$dir/events", d(s, dir, "events"))
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val wp = graft.streaming.Streams.windowedProfile(stream, "ts",
        Seq("event_type", "user_id"), "1 hour", "1 hour")
      val res = graft.streaming.StreamStage.runToMemory(
        wp, "q_stream_profile_", "complete")
      graft.pipeline.Report.mergeProfiles(
        res.select(F.explode(F.col("entries")).as("td_p")).select("td_p.*"))
    }),
    "q_text_keywords" -> ((s, dir) => {
      // top-5 TF-IDF keywords per document: exact tf/df/N, libm ln,
      // ranks through the map-side WindowGroupLimit path
      graft.pipeline.Retrieval.tfidfKeywords(
        d(s, dir, "documents").select("doc_id", "text"), "text", "doc_id", 5)
        .orderBy(F.col("id").asc, F.col("rk").asc)
    }),
    "q_text_collocations" -> ((s, dir) => {
      // top-50 bigram collocations by PMI (min pair count 5): phrase
      // mining with one stated ln of exact integer ratios
      graft.pipeline.Retrieval.pmiCollocations(
        d(s, dir, "documents"), "text", minCount = 5L, topN = 50)
    }),
    "q_dq_referential" -> ((s, dir) => {
      // cross-table DQ: orphaned foreign keys over four relationships
      // (one left join vs distinct parent keys + one agg each)
      import graft.dq.Dq
      val li = d(s, dir, "lineitem"); val o = d(s, dir, "orders")
      val c = d(s, dir, "customer"); val p = d(s, dir, "part")
      val na = d(s, dir, "nation")
      Dq.fkOrphans(li, "l_orderkey", o, "o_orderkey",
          "lineitem.l_orderkey->orders")
        .unionByName(Dq.fkOrphans(o, "o_custkey", c, "c_custkey",
          "orders.o_custkey->customer"))
        .unionByName(Dq.fkOrphans(li, "l_partkey", p, "p_partkey",
          "lineitem.l_partkey->part"))
        .unionByName(Dq.fkOrphans(c, "c_nationkey", na, "n_nationkey",
          "customer.c_nationkey->nation"))
        .orderBy(F.col("fk").asc)
    }),
    "q_text_readability" -> ((s, dir) => {
      // Flesch reading ease + Flesch-Kincaid grade from three regex
      // counters — row-local, engine-portable arithmetic
      TextAnalysis.readability(
        d(s, dir, "documents").select("doc_id", "text"), "doc_id", "text")
        .orderBy(F.col("doc_id").asc)
    }))
}
