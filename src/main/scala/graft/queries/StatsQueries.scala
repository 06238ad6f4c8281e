package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.pipeline.{Report, Survival, Trend}

/** Gate queries for the round-17 statistics layer: k-group ANOVA /
  * Brown–Forsythe, BH multiple-testing correction, Kaplan–Meier +
  * log-rank survival, and the per-series trend family (Mann–Kendall,
  * Theil–Sen, ACF, Holt). All over the events table's user/day grids —
  * the same cohorts as the q_ab_* family so the readouts compose. */
object StatsQueries {
  private def d(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // per-user revenue in ORIGINAL units (the q_ab_welch fixture): exact
  // fixed-point per-user totals, ONE stated division back
  private def revenue3(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "events")
      .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
      .groupBy(F.col("user_id"))
      .agg((F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).cast("double") /
        F.lit(1048576.0d)).as("revenue"))
      .select(F.when(F.col("user_id") % 3 === 0, "A")
        .when(F.col("user_id") % 3 === 1, "B").otherwise("C")
        .as("variant"), F.col("revenue"))

  // per-user survival row: days from first sighting to FIRST PURCHASE
  // (the event), censored at the last sighting for never-purchasers —
  // a varied duration grid, unlike first→last spans which all run the
  // window
  private def perUser(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "events")
      .where(F.col("user_id").isNotNull && F.col("ts").isNotNull)
      .groupBy(F.col("user_id"))
      .agg(
        F.unix_date(F.min(F.to_date(F.col("ts")))).cast("long")
          .as("td_first"),
        F.unix_date(F.max(F.to_date(F.col("ts")))).cast("long")
          .as("td_last"),
        F.min(F.when(F.col("event_type") === "purchase",
          F.unix_date(F.to_date(F.col("ts"))).cast("long")))
          .as("td_purch"))
      .select(F.col("user_id"),
        (F.coalesce(F.col("td_purch"), F.col("td_last")) -
          F.col("td_first")).as("duration"),
        F.col("td_purch").isNotNull.cast("long").as("event"))

  // per-(event_type, day) series: exact fixed-point daily revenue
  private def dailyRev(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "events")
      .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
        F.col("value").isNotNull)
      .groupBy(F.col("event_type").as("etype"),
        F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
      .agg(F.sum(F.floor(F.col("value").cast("double") *
        F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("rev"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ab_anova" -> ((s, dir) => {
      // k-GROUP parametric A/B/C: one-way ANOVA F over per-user revenue
      // across three user-parity cohorts — the mean-difference readout
      // q_ab_kruskal rank-tests, on the identical fixture
      Report.anovaF(revenue3(s, dir), "variant", "revenue")
    }),
    "q_ab_levene" -> ((s, dir) => {
      // variance-homogeneity check for the same cohorts: Brown–Forsythe
      // (ANOVA on |x − median_g|) — trust (or don't) pooled-variance
      // readouts before acting on q_ab_anova
      Report.brownForsythe(revenue3(s, dir), "variant", "revenue")
    }),
    "q_fdr_bh" -> ((s, dir) => {
      // Benjamini–Hochberg over one synthetic p per (event_type, dow)
      // cell — the multiple-testing finisher: which of 35 slice tests
      // survive at FDR 0.2. p is deterministic arithmetic (exact long
      // cell sums), the correction logic is what's under test
      val tests = d(s, dir, "events")
        .where(F.col("ts").isNotNull && F.col("user_id").isNotNull &&
          F.col("event_type").isNotNull)
        .groupBy(F.concat(F.col("event_type"), F.lit("_"),
          (F.unix_date(F.to_date(F.col("ts"))).cast("long") % 7L)
            .cast("string")).as("test_id"))
        .agg((((F.sum(F.col("user_id")) % 9973L) + 1L).cast("double") /
          F.lit(10000.0d)).as("p_value"))
      Report.bhFdr(tests, "test_id", "p_value", alpha = 0.2d)
    }),
    "q_survival_km" -> ((s, dir) => {
      // Kaplan–Meier retention curve: time from first to last sighting,
      // event = the user purchased; censored users leave the risk set
      // without dropping the curve
      Survival.kaplanMeier(perUser(s, dir), "duration", "event")
    }),
    "q_survival_logrank" -> ((s, dir) => {
      // two-cohort log-rank: did even-id users' time-to-purchase curve
      // differ from odd-id users' beyond chance
      val cohorts = perUser(s, dir)
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("cohort"), F.col("duration"), F.col("event"))
      Survival.logRank(cohorts, "duration", "event", "cohort")
    }),
    "q_trend_mannkendall" -> ((s, dir) => {
      // monotone-trend test per event type over daily revenue: exact
      // integer S over the bounded day grid, tie-corrected variance,
      // continuity-corrected z
      Trend.mannKendall(dailyRev(s, dir)
          .withColumn("rev", F.col("rev").cast("double")),
        "etype", "day_num", "rev")
    }),
    "q_trend_theilsen" -> ((s, dir) => {
      // robust slope per event type: median of pairwise daily-revenue
      // slopes + median-residual intercept — the outlier-proof trend
      // magnitude next to q_trend_mannkendall's direction test
      Trend.theilSen(dailyRev(s, dir)
          .withColumn("rev", F.col("rev").cast("double")),
        "etype", "day_num", "rev")
    }),
    "q_trend_acf" -> ((s, dir) => {
      // autocorrelation at lags 1..5 per event type over fixed-point
      // daily revenue — does yesterday predict today. 2^6 scale, NOT
      // the family's 2^20: the cross-moment sums must stay below 2^53
      // so the decimal→double conversion is exact on every engine
      // (DuckDB 1.0's HUGEINT→DOUBLE cast rounds off past 2^53)
      val daily = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
          F.col("value").isNotNull)
        .groupBy(F.col("event_type").as("etype"),
          F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(64.0d) + F.lit(0.5d)).cast("long")).as("rev"))
      Trend.acf(daily, "etype", "day_num", "rev", maxLag = 5)
    }),
    "q_quality_isotonic" -> ((s, dir) => {
      // monotone recalibration of a deliberately-miscalibrated score
      // (deterministic (doc_id % 97)/97 vs the is-English label): PAV
      // pools the bins the raw reliability curve gets backwards
      val src = d(s, dir, "documents")
        .where(F.col("doc_id").isNotNull && F.col("lang").isNotNull)
        .select(((F.col("doc_id") % 97L).cast("double") / F.lit(97.0d))
            .as("score"),
          F.when(F.col("lang") === "en", 1).otherwise(0).as("label"))
      graft.pipeline.QualityModel.isotonicCalibration(
        src, "score", "label", bins = 20)
    }),
    "q_trend_changepoint" -> ((s, dir) => {
      // WHEN did each event type's daily revenue level shift: the
      // binary-segmentation split maximizing between-segment separation
      // over the bounded day grid, exact prefix sums
      Trend.changepoint(dailyRev(s, dir), "etype", "day_num", "rev")
    }),
    "q_trend_rolling_corr" -> ((s, dir) => {
      // did daily volume and revenue decouple: trailing-7-day Pearson
      // per event type from exact windowed integer sums (2^6 revenue
      // scale — the ACF rule: window sums stay under 2^53)
      val daily = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
          F.col("value").isNotNull)
        .groupBy(F.col("event_type").as("etype"),
          F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(64.0d) + F.lit(0.5d)).cast("long")).as("rev"),
          F.count(F.lit(1)).as("cnt"))
      Trend.rollingCorr(daily, "etype", "day_num", "rev", "cnt",
        window = 7)
    }),
    "q_retrieval_ndcg" -> ((s, dir) => {
      // ranking-quality scorecard: per event type, the top-10 users by
      // exact fixed-point revenue form the "retrieved list"; graded
      // relevance is deterministic (user_id % 3). NDCG@10 / RR / AP per
      // query with driver-side literal log2 discounts
      import org.apache.spark.sql.expressions.Window
      val perUser = d(s, dir, "events")
        .where(F.col("event_type").isNotNull &&
          F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("event_type").as("q"), F.col("user_id"))
        .agg(F.sum(F.floor(F.col("value").cast("double") *
          F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).as("rev"))
      val w = Window.partitionBy(F.col("q"))
        .orderBy(F.col("rev").desc, F.col("user_id").asc)
      val top = perUser
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= 10L)
        .select(F.col("q"), F.col("pos"),
          (F.col("user_id") % 3L).as("rel"))
      graft.pipeline.Retrieval.rankEval(top, "q", "pos", "rel", maxK = 10)
    }),
    "q_fuzzy_jaro" -> ((s, dir) => {
      // the Jaro-Winkler kernel across its regimes on one pass: each
      // customer name vs its digit-reversed twin (high similarity,
      // transpositions, the Winkler prefix boost) and vs the market
      // segment (low similarity, the no-boost path / zero-match floor)
      val c = d(s, dir, "customer")
        .where(F.col("c_custkey").isNotNull && F.col("c_name").isNotNull &&
          F.col("c_mktsegment").isNotNull)
      val nm = F.col("c_name")
      val twin = F.concat(F.substring(nm, 1, 9),
        F.reverse(F.substring(nm, 10, 9)))
      c.select(F.col("c_custkey"),
          graft.expressions.StringDistance.jaroWinklerCol(nm, twin)
            .as("jw_twin"),
          graft.expressions.StringDistance.jaroWinklerCol(nm,
            F.col("c_mktsegment")).as("jw_seg"))
        .orderBy(F.col("c_custkey").asc).limit(500)
    }),
    "q_outlier_mahalanobis" -> ((s, dir) => {
      // joint-outlier ranking over the (events, revenue) cloud per
      // user: correlation-aware distance catches users whose count and
      // spend are individually plausible but jointly absurd
      val per = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("double").as("n_events"),
          (F.sum(F.floor(F.col("value").cast("double") *
              F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).cast("double") /
            F.lit(1048576.0d)).as("revenue"))
      Report.mahalanobisOutliers2(per, "user_id", "n_events", "revenue",
        k = 20)
    }),
    "q_trend_holt" -> ((s, dir) => {
      // Holt level+trend state per event type over daily event counts,
      // with the 7-day-ahead linear forecast
      val daily = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull)
        .groupBy(F.col("event_type").as("etype"),
          F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
        .agg(F.count(F.lit(1)).cast("double").as("cnt"))
      Trend.holtLinear(daily, "etype", "day_num", "cnt",
        alpha = 0.4d, beta = 0.2d, horizon = 7)
    }),
    "q_ab_cuped" -> ((s, dir) => {
      // CUPED: per-user ODD-day revenue (the experiment metric)
      // adjusted by EVEN-day revenue (the pre-period covariate) before
      // the Welch readout — the variance-reduction face of q_ab_welch
      // on the same cohorts. Both sides are exact fixed-point per-user
      // totals re-scaled to original units; users active on only one
      // side contribute 0 on the silent side (the COALESCE rule)
      val day = F.unix_date(F.to_date(F.col("ts"))).cast("long")
      val fpv = F.floor(F.col("value").cast("double") *
        F.lit(1048576.0d) + F.lit(0.5d)).cast("long")
      val per = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("ts").isNotNull)
        .groupBy(F.col("user_id"))
        .agg(
          (F.coalesce(F.sum(F.when(day % 2 =!= 0L, fpv)), F.lit(0L))
            .cast("double") / F.lit(1048576.0d)).as("metric"),
          (F.coalesce(F.sum(F.when(day % 2 === 0L, fpv)), F.lit(0L))
            .cast("double") / F.lit(1048576.0d)).as("covariate"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("metric"), F.col("covariate"))
      Report.cupedT(per, "variant", "metric", "covariate")
    }),
    "q_ab_mantel_haenszel" -> ((s, dir) => {
      // stratified conversion test: did even-id users' events clear the
      // value bar more often than odd-id users', CONTROLLING for
      // event_type — the Simpson's-paradox-proof pooled readout next to
      // the per-slice q_ab_welch_sliced family
      val ev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("event_type").isNotNull)
        .select(F.col("event_type").as("stratum"),
          F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
            .as("variant"),
          (F.col("value") > 34.0d).as("converted"))
      Report.mantelHaenszel(ev, "stratum", "variant", "converted")
    }),
    "q_corr_kendall" -> ((s, dir) => {
      // ordinal association: do larger order lines carry larger
      // quantities — Kendall τ-b over the bounded (quantity, line#)
      // cell grid, tie-corrected (both columns are small-ordinal, so
      // Spearman's midranks and χ²'s order-blindness both mislead)
      Report.kendallTauB(d(s, dir, "lineitem"), "l_quantity",
        "l_linenumber")
    }),
    "q_stream_sprt" -> ((s, dir) => {
      // the sequential test as a LIVE monitor: per event type the
      // latched Wald decision through the custom-state escape hatch —
      // in batch mode the fold consumes the whole history in event_id
      // order, so the oracle replays the prefix LLRs exactly
      import s.implicits._
      val ev = d(s, dir, "events")
        .where(F.col("event_type").isNotNull &&
          F.col("event_id").isNotNull && F.col("value").isNotNull)
        .select(F.col("event_type").as("k"),
          F.col("event_id").cast("long").as("seq"),
          (F.col("value") > 34.0d).as("s"))
        .as[(String, Long, Boolean)]
      graft.streaming.Streams.statefulSprt(ev, p0 = 0.45d, p1 = 0.55d,
          alpha = 0.05d, beta = 0.2d)
        .toDF()
        .select(F.col("key"), F.col("trials"), F.col("successes"),
          F.col("llr"), F.col("decision"),
          F.col("decisionSeq").as("decision_seq"))
        .orderBy("key")
    }),
    "q_fdr_by" -> ((s, dir) => {
      // Benjamini–Yekutieli on the identical 35-test fixture: the
      // dependence-proof correction — the harmonic penalty c(m)
      // shrinks the q_fdr_bh reject set when slices share the corpus
      val tests = d(s, dir, "events")
        .where(F.col("ts").isNotNull && F.col("user_id").isNotNull &&
          F.col("event_type").isNotNull)
        .groupBy(F.concat(F.col("event_type"), F.lit("_"),
          (F.unix_date(F.to_date(F.col("ts"))).cast("long") % 7L)
            .cast("string")).as("test_id"))
        .agg((((F.sum(F.col("user_id")) % 9973L) + 1L).cast("double") /
          F.lit(10000.0d)).as("p_value"))
      Report.byFdr(tests, "test_id", "p_value", alpha = 0.2d)
    }),
    "q_trend_holtwinters" -> ((s, dir) => {
      // weekly-seasonal forecast per event type: additive Holt-Winters
      // over daily counts (p=7, the q_seasonal_daily shape forecast
      // THROUGH), 7-day-ahead readout — the dense 30-day grid gives
      // two init periods + 16 recursion steps
      val daily = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull)
        .groupBy(F.col("event_type").as("etype"),
          F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
        .agg(F.count(F.lit(1)).cast("double").as("cnt"))
      Trend.holtWinters(daily, "etype", "day_num", "cnt",
        alpha = 0.4d, beta = 0.2d, gamma = 0.3d, period = 7,
        horizon = 7)
    }),
    "q_ab_sprt" -> ((s, dir) => {
      // sequential testing per event type: on which day could the
      // conversion experiment have stopped — Wald boundaries at
      // α=.05/β=.2 over the daily (trials, conversions) grid, H0
      // p=.45 vs H1 p=.55 around the corpus's ~.5 clear rate
      val ev = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
          F.col("value").isNotNull)
        .select(F.col("event_type").as("etype"),
          F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"),
          (F.col("value") > 34.0d).as("converted"))
      Report.sprtBernoulli(ev, "etype", "day_num", "converted",
        p0 = 0.45d, p1 = 0.55d, alpha = 0.05d, beta = 0.2d)
    }),
    "q_ab_quantile_shift" -> ((s, dir) => {
      // distributional A/B: did the p90 move even if the median
      // didn't — exact per-variant order statistics on the q_ab_welch
      // revenue cohorts, user_id-pinned tiebreak
      val rev = d(s, dir, "events")
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
        .groupBy(F.col("user_id"))
        .agg((F.sum(F.floor(F.col("value").cast("double") *
            F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).cast("double") /
          F.lit(1048576.0d)).as("revenue"))
        .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("revenue"), F.col("user_id"))
      Report.quantileShift(rev, "variant", "revenue",
        qs = Seq(0.25d, 0.5d, 0.75d, 0.9d), tiebreakers = Seq("user_id"))
    }),
    "q_trend_ols" -> ((s, dir) => {
      // parametric trend per event type: OLS slope/R²/t over the exact
      // fixed-point daily revenue series — the least-squares companion
      // of q_trend_theilsen's median-of-slopes on the same grid. Day
      // index is days since the corpus epoch (small t origin: the
      // centered-moment arithmetic is deterministic but feed it small
      // coordinates anyway)
      val daily = d(s, dir, "events")
        .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
          F.col("value").isNotNull)
        .groupBy(F.col("event_type").as("etype"),
          F.datediff(F.to_date(F.col("ts")),
            F.to_date(F.lit("2024-01-01"))).cast("long").as("day_idx"))
        .agg((F.sum(F.floor(F.col("value").cast("double") *
            F.lit(1048576.0d) + F.lit(0.5d)).cast("long")).cast("double") /
          F.lit(1048576.0d)).as("rev"))
      Trend.olsByGroup(daily, "etype", "day_idx", "rev")
    }))
}
