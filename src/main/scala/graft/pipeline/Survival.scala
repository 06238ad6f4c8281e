package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}

/** Survival analysis over (duration, event) rows — retention/churn
  * readouts for the event-log tables this engine curates (how long do
  * users stay active, and did cohort A outlast cohort B). Reference
  * scope: the reference's analytics surface stops at aggregation
  * (tabsdata/expansions/polars docs cover agg/window only); this module
  * is part of the beyond-reference scale-analytics layer, same tier as
  * [[Report]]'s A/B family.
  *
  * Both operators reduce the corpus to the BOUNDED duration grid (one
  * row per distinct duration — days, by construction of the callers) in
  * one keyed count shuffle, then replay the sequential product/sums as
  * PINNED ascending folds over the sorted grid list, the
  * [[Report.chiSquared]] convention: every double op stated once, so
  * the values replay exactly on any engine. The grid must fit one
  * task's memory — the documented contract (durations are calendar
  * days/weeks, not raw timestamps; quantize upstream).
  */
object Survival {

  /** Kaplan–Meier product-limit survival curve. Input: one row per
    * subject with a non-negative integer `durationCol` (time observed,
    * e.g. days) and `eventCol` (nonzero = the event fired at that time;
    * 0 = censored — the subject left observation event-free). Subjects
    * censored at t count in the at-risk set at t (the standard
    * events-before-censoring tie convention). Per distinct time t:
    * n_risk = N − (arrivals before t), factor = (n_risk − d)/n_risk
    * (ONE stated division), S(t) = Π_{u≤t} factor_u as the pinned
    * ascending prefix product (init 1.0). Output:
    * (t, n_risk, d_events, c_censored, survival) ascending by t. */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val t = F.col(durationCol).cast("long")
    val e = F.col(eventCol).cast("long")
    val clean = df.where(t.isNotNull && e.isNotNull)
      .select(t.as("td_t"), (e =!= 0L).cast("long").as("td_e"))
    val grid = clean.groupBy(F.col("td_t"))
      .agg(F.count(F.lit(1)).as("td_a"), F.sum(F.col("td_e")).as("td_d"))
    val packed = grid.agg(
      F.sum(F.col("td_a")).cast("long").as("td_nn"),
      F.sort_array(F.collect_list(F.struct(
        F.col("td_t"), F.col("td_a"), F.col("td_d")))).as("td_l"))
    val l = F.col("td_l"); val nn = F.col("td_nn")
    // factor list first (one division per grid row), THEN the prefix
    // product rides slices of it — n_risk restated as integer arithmetic
    // in the output projection (exact, order-free)
    def cumBefore(i: org.apache.spark.sql.Column) =
      F.aggregate(F.slice(l, F.lit(1), i - 1), F.lit(0L),
        (acc, x) => acc + x.getField("td_a"))
    val fl = F.transform(F.sequence(F.lit(1), F.size(l)), i => {
      val nR = nn - cumBefore(i)
      (nR - F.element_at(l, i).getField("td_d")).cast("double") /
        nR.cast("double")
    })
    packed.where(F.size(l) > 0)
      .withColumn("td_fl", fl)
      .select(nn, l, F.col("td_fl"),
        F.explode(F.sequence(F.lit(1), F.size(l))).as("td_i"))
      .select(
        F.element_at(l, F.col("td_i")).getField("td_t").as("t"),
        (nn - cumBefore(F.col("td_i"))).as("n_risk"),
        F.element_at(l, F.col("td_i")).getField("td_d").as("d_events"),
        (F.element_at(l, F.col("td_i")).getField("td_a") -
          F.element_at(l, F.col("td_i")).getField("td_d"))
          .as("c_censored"),
        F.aggregate(F.slice(F.col("td_fl"), F.lit(1), F.col("td_i")),
          F.lit(1.0d), (acc, x) => acc * x).as("survival"))
      .orderBy(F.col("t").asc)
  }

  /** Two-group log-rank test — did cohort A's survival curve beat B's
    * beyond chance. Exactly two non-null groups required (lexicographic
    * first = A); anything else answers NULL z with the observed group
    * count, the [[Report.welchT]] family's honesty rule. One keyed grid
    * pass builds per-time (arrivals, events, A-arrivals, A-events),
    * then ONE ascending fold carries (cum arrivals, cum A-arrivals,
    * O_A, E_A, V) — at each event time t with d ≥ 1 and n_risk ≥ 2:
    * p_a = nRiskA/nRisk, E += d·p_a,
    * V += d·p_a·(1−p_a)·(nRisk−d)/(nRisk−1) (each double op stated
    * once; O_A is an exact long). z = (O_A − E_A)/√V when V > 0.
    * Output (one row): n_groups, group_a, group_b, n_a, n_b, o_a, e_a,
    * v, z. */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
      groupCol: String): DataFrame = {
    val t = F.col(durationCol).cast("long")
    val e = F.col(eventCol).cast("long")
    val g = F.col(groupCol).cast("string")
    val clean = df.where(t.isNotNull && e.isNotNull && g.isNotNull)
      .select(t.as("td_t"), (e =!= 0L).cast("long").as("td_e"),
        g.as("td_g"))
    // ONE corpus pass: the (time, cohort) cell relation — bounded
    // (grid × cohorts). Group totals AND per-time cohort tallies both
    // reshape from it; the corpus is never scanned twice.
    val cells = clean.groupBy(F.col("td_t"), F.col("td_g"))
      .agg(F.count(F.lit(1)).as("td_ca"), F.sum(F.col("td_e")).as("td_cd"))
      .localCheckpoint()
    val groups = cells.groupBy(F.col("td_g"))
      .agg(F.sum(F.col("td_ca")).cast("long").as("td_n"))
    val gpack = groups.agg(
      F.count(F.lit(1)).cast("long").as("td_nv"),
      F.sort_array(F.collect_list(F.struct(
        F.col("td_g"), F.col("td_n")))).as("td_gl"))
    def gf(i: Int, f: String) =
      F.try_element_at(F.col("td_gl"), F.lit(i)).getField(f)
    val aName = gf(1, "td_g")
    val withA = cells.crossJoin(
      F.broadcast(gpack.select(aName.as("td_ga"))))
    val grid2 = withA.groupBy(F.col("td_t"))
      .agg(F.sum(F.col("td_ca")).cast("long").as("td_a"),
        F.sum(F.col("td_cd")).cast("long").as("td_d"),
        F.sum(F.when(F.col("td_g") === F.col("td_ga"), F.col("td_ca"))
          .otherwise(0L)).cast("long").as("td_aa"),
        F.sum(F.when(F.col("td_g") === F.col("td_ga"), F.col("td_cd"))
          .otherwise(0L)).cast("long").as("td_da"))
    val packed = grid2.agg(
      F.sum(F.col("td_a")).cast("long").as("td_nn"),
      F.sum(F.col("td_aa")).cast("long").as("td_na"),
      F.sort_array(F.collect_list(F.struct(
        F.col("td_t"), F.col("td_a"), F.col("td_d"),
        F.col("td_aa"), F.col("td_da")))).as("td_l"))
      .crossJoin(F.broadcast(gpack))
    val l = F.col("td_l")
    val zero = F.struct(
      F.lit(0L).as("cuma"), F.lit(0L).as("cumaa"),
      F.lit(0L).as("o"), F.lit(0.0d).as("ee"), F.lit(0.0d).as("vv"))
    val folded = F.aggregate(l, zero, (acc, x) => {
      val nR = F.col("td_nn") - acc.getField("cuma")
      val nRa = F.col("td_na") - acc.getField("cumaa")
      val d = x.getField("td_d")
      val cond = d > 0L && nR >= 2L
      val dD = d.cast("double")
      val pa = nRa.cast("double") / nR.cast("double")
      F.struct(
        (acc.getField("cuma") + x.getField("td_a")).as("cuma"),
        (acc.getField("cumaa") + x.getField("td_aa")).as("cumaa"),
        (acc.getField("o") + x.getField("td_da")).as("o"),
        F.when(cond, acc.getField("ee") + dD * pa)
          .otherwise(acc.getField("ee")).as("ee"),
        F.when(cond, acc.getField("vv") +
            dD * pa * (F.lit(1.0d) - pa) *
              ((nR - d).cast("double") / (nR - 1L).cast("double")))
          .otherwise(acc.getField("vv")).as("vv"))
    })
    val ok = F.col("td_nv") === 2L && F.col("td_v") > 0.0d
    packed
      .withColumn("td_f", folded)
      .withColumn("td_v", F.col("td_f").getField("vv"))
      .select(
        F.col("td_nv").as("n_groups"),
        gf(1, "td_g").as("group_a"), gf(2, "td_g").as("group_b"),
        gf(1, "td_n").as("n_a"), gf(2, "td_n").as("n_b"),
        F.col("td_f").getField("o").as("o_a"),
        F.when(F.col("td_nv") === 2L, F.col("td_f").getField("ee"))
          .as("e_a"),
        F.when(F.col("td_nv") === 2L, F.col("td_v")).as("v"),
        F.when(ok,
          (F.col("td_f").getField("o").cast("double") -
            F.col("td_f").getField("ee")) / F.sqrt(F.col("td_v")))
          .as("z"))
  }
}
