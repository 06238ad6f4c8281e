package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Per-series trend diagnostics over keyed time series — the
  * monotone-drift layer of the volume-anomaly family ([[Report
  * .ewmaDaily]] reads level, [[Report.cusumDaily]] sustained shifts,
  * [[Report.seasonalDaily]] weekly shape; this module answers "is the
  * series RISING, how steeply, and does it remember itself").
  * Beyond-reference scale analytics, same tier as [[Report]].
  *
  * Every operator here works per GROUP over a bounded per-group grid
  * (calendar days/weeks — quantize upstream), so quadratic pair
  * enumerations and sequential folds are per-key and the shuffles
  * partition on the group key. Exact-replay discipline throughout:
  * integer/decimal reductions where order can't matter, pinned
  * ascending folds where it can, each double op stated once. */
object Trend {

  private def cleanSeries(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame =
    df.where(F.col(groupCol).isNotNull && F.col(tCol).isNotNull &&
        F.col(xCol).isNotNull)
      .select(F.col(groupCol).cast("string").as("td_g"),
        F.col(tCol).cast("long").as("td_t"),
        F.col(xCol).cast("double").as("td_x"))

  /** Mann–Kendall trend test per group: S = Σ_{i<j} sign(x_j − x_i)
    * (an exact long — comparisons, not arithmetic), tie term
    * Σ_v c_v(c_v−1)(2c_v+5), Var(S) = (n(n−1)(2n+5) − ties)/18, and
    * the continuity-corrected z ((S∓1)/√Var, 0 at S=0). The pair
    * relation is the group-keyed self-join over the bounded grid —
    * quadratic per group by design, partitioned across groups. One
    * (t, x) row per group per instant required (pre-aggregate).
    * Groups with Var ≤ 0 (all-tied or n < 2) answer NULL z. Output:
    * (group, n, s, tie_term, var_s, z) ascending by group. */
  def mannKendall(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val clean = cleanSeries(df, groupCol, tCol, xCol)
    val a = clean.select(F.col("td_g"), F.col("td_t").as("td_ta"),
      F.col("td_x").as("td_xa"))
    val b = clean.select(F.col("td_g"), F.col("td_t").as("td_tb"),
      F.col("td_x").as("td_xb"))
    val s = a.join(b, Seq("td_g"))
      .where(F.col("td_ta") < F.col("td_tb"))
      .groupBy(F.col("td_g"))
      .agg(F.sum(F.when(F.col("td_xb") > F.col("td_xa"), 1L)
        .when(F.col("td_xb") < F.col("td_xa"), -1L)
        .otherwise(0L)).as("td_s"))
    val ties = clean.groupBy(F.col("td_g"), F.col("td_x"))
      .agg(F.count(F.lit(1)).as("td_c"))
      .groupBy(F.col("td_g"))
      .agg(F.sum(F.col("td_c") * (F.col("td_c") - 1L) *
          (F.lit(2L) * F.col("td_c") + 5L)).as("td_tie"),
        F.sum(F.col("td_c")).as("td_n"))
    val nL = F.col("td_n")
    val varNum = (nL * (nL - 1L) * (F.lit(2L) * nL + 5L) -
      F.col("td_tie"))
    val varS = varNum.cast("double") / F.lit(18.0d)
    val sD = F.col("td_s").cast("double")
    ties.join(s, Seq("td_g"), "left")
      .select(F.col("td_g").as("group"), nL.as("n"),
        F.coalesce(F.col("td_s"), F.lit(0L)).as("s"),
        F.col("td_tie").as("tie_term"), varS.as("var_s"),
        F.when(varS > 0.0d,
          F.when(F.col("td_s") > 0L,
              (sD - F.lit(1.0d)) / F.sqrt(varS))
            .when(F.col("td_s") < 0L,
              (sD + F.lit(1.0d)) / F.sqrt(varS))
            .otherwise(F.lit(0.0d))).as("z"))
      .orderBy(F.col("group").asc)
  }

  /** Theil–Sen robust slope per group: the MEDIAN of all pairwise
    * slopes (x_j − x_i)/(t_j − t_i), i < j — a 29%-breakdown trend
    * estimate no single outlier day can bend — plus the median-of-
    * residuals intercept (x − slope·t, slope broadcast back). Same
    * group-keyed quadratic pair relation as [[mannKendall]]; `median`
    * interpolates the even midpoint identically on Spark and ANSI
    * engines (the q_agg_median parity). Output:
    * (group, n, slope, intercept) ascending by group; groups with no
    * pair (n < 2 or a single instant) answer NULL slope. */
  def theilSen(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val clean = cleanSeries(df, groupCol, tCol, xCol)
    val a = clean.select(F.col("td_g"), F.col("td_t").as("td_ta"),
      F.col("td_x").as("td_xa"))
    val b = clean.select(F.col("td_g"), F.col("td_t").as("td_tb"),
      F.col("td_x").as("td_xb"))
    val slopes = a.join(b, Seq("td_g"))
      .where(F.col("td_ta") < F.col("td_tb"))
      .groupBy(F.col("td_g"))
      .agg(F.median((F.col("td_xb") - F.col("td_xa")) /
        (F.col("td_tb") - F.col("td_ta")).cast("double")).as("td_slope"))
    val n = clean.groupBy(F.col("td_g"))
      .agg(F.count(F.lit(1)).as("td_n"))
    val resid = clean.join(F.broadcast(slopes), Seq("td_g"))
      .groupBy(F.col("td_g"))
      .agg(F.median(F.col("td_x") -
        F.col("td_slope") * F.col("td_t").cast("double")).as("td_icpt"))
    n.join(slopes, Seq("td_g"), "left")
      .join(resid, Seq("td_g"), "left")
      .select(F.col("td_g").as("group"), F.col("td_n").as("n"),
        F.col("td_slope").as("slope"), F.col("td_icpt").as("intercept"))
      .orderBy(F.col("group").asc)
  }

  /** Sample autocorrelation per group at row-lags 1..`maxLag` over the
    * t-ordered series — does the series remember itself (inputs for
    * seasonality/AR diagnostics on the daily volume curves). The
    * integer-value contract: `xCol` must be LONG (fixed-point daily
    * totals — the caller's quantization), so every Σ (x·x_lag, heads,
    * tails, squares) reduces EXACTLY in DECIMAL(38,0)/long, and the
    * classic expansion states each double op once from exact sums:
    * r_k = (Σx_t·x_{t−k} − m·Σhead − m·Σtail + n_k·m²) / (Σx² − n·m²)
    * with m the FULL-series mean. One window pass (partitioned by
    * group — never an unpartitioned corpus window), one keyed
    * aggregation, lags exploded from per-k agg columns. Output:
    * (group, lag, n_pairs, r) ascending; den ≤ 0 answers NULL r. */
  def acf(df: DataFrame, groupCol: String, tCol: String, xCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag in [1,64], got $maxLag")
    val clean = df.where(F.col(groupCol).isNotNull &&
        F.col(tCol).isNotNull && F.col(xCol).isNotNull)
      .select(F.col(groupCol).cast("string").as("td_g"),
        F.col(tCol).cast("long").as("td_t"),
        F.col(xCol).cast("long").as("td_x"))
    val w = Window.partitionBy(F.col("td_g")).orderBy(F.col("td_t").asc)
    val dec = F.col("td_x").cast("decimal(19,0)")
    val lagged = (1 to maxLag).foldLeft(clean) { (d, k) =>
      d.withColumn(s"td_l$k", F.lag(F.col("td_x"), k).over(w))
    }
    val baseAggs = Seq(
      F.count(F.lit(1)).as("td_n"),
      F.sum(F.col("td_x")).as("td_sx"),
      F.sum((dec * dec).cast("decimal(38,0)")).as("td_sxx"))
    val lagAggs = (1 to maxLag).flatMap { k =>
      val lk = F.col(s"td_l$k")
      Seq(
        F.count(lk).as(s"td_nk$k"),
        F.sum((dec * lk.cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as(s"td_sxy$k"),
        F.sum(lk).as(s"td_sh$k"),
        F.sum(F.when(lk.isNotNull, F.col("td_x"))).as(s"td_st$k"))
    }
    val agg = lagged.groupBy(F.col("td_g"))
      .agg(baseAggs.head, (baseAggs.tail ++ lagAggs): _*)
    val nD = F.col("td_n").cast("double")
    val m = F.col("td_sx").cast("double") / nD
    val den = F.col("td_sxx").cast("double") - nD * (m * m)
    val perLag = F.array((1 to maxLag).map { k =>
      val nkD = F.col(s"td_nk$k").cast("double")
      val num = F.col(s"td_sxy$k").cast("double") -
        m * F.col(s"td_sh$k").cast("double") -
        m * F.col(s"td_st$k").cast("double") + nkD * (m * m)
      F.struct(F.lit(k).cast("long").as("lag"),
        F.col(s"td_nk$k").as("n_pairs"),
        F.when(den > 0.0d && F.col(s"td_nk$k") > 0L, num / den).as("r"))
    }: _*)
    agg.select(F.col("td_g").as("group"), F.explode(perLag).as("td_e"))
      .select(F.col("group"), F.col("td_e.lag").as("lag"),
        F.col("td_e.n_pairs").as("n_pairs"), F.col("td_e.r").as("r"))
      .orderBy(F.col("group").asc, F.col("lag").asc)
  }

  /** Single change-point detection per group (binary segmentation, one
    * split): the t* maximizing the between-segment separation
    * G_i = (i·(n−i)/n)·(m_L − m_R)² over every prefix/suffix split of
    * the t-ordered series — the "WHEN did the level shift" answer next
    * to [[Report.cusumDaily]]'s "did it shift". Integer-value contract
    * like [[acf]]: `xCol` must be LONG so every prefix sum is exact;
    * the per-split doubles (two means, their difference, the weight)
    * are stated once from exact sums, computed through group-partitioned
    * windows — never an unpartitioned corpus window, never a fold. Ties
    * on G take the smallest t (the KS d_at convention). Groups with
    * n < 2 emit no row (no split exists). Output:
    * (group, n, t_star, gain, mean_left, mean_right) ascending by
    * group. */
  def changepoint(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val clean = df.where(F.col(groupCol).isNotNull &&
        F.col(tCol).isNotNull && F.col(xCol).isNotNull)
      .select(F.col(groupCol).cast("string").as("td_g"),
        F.col(tCol).cast("long").as("td_t"),
        F.col(xCol).cast("long").as("td_x"))
    val w = Window.partitionBy(F.col("td_g")).orderBy(F.col("td_t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(F.col("td_g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = clean
      .withColumn("td_i", F.count(F.lit(1)).over(w))
      .withColumn("td_sl", F.sum(F.col("td_x")).over(w))
      .withColumn("td_n", F.count(F.lit(1)).over(wAll))
      .withColumn("td_s", F.sum(F.col("td_x")).over(wAll))
    val iD = F.col("td_i").cast("double")
    val nD = F.col("td_n").cast("double")
    val mL = F.col("td_sl").cast("double") / iD
    val mR = (F.col("td_s") - F.col("td_sl")).cast("double") /
      (nD - iD)
    val d = mL - mR
    val scored = staged.where(F.col("td_i") < F.col("td_n"))
      .withColumn("td_gain", (iD * (nD - iD) / nD) * (d * d))
      .withColumn("td_ml", mL).withColumn("td_mr", mR)
    val best = scored.groupBy(F.col("td_g"))
      .agg(F.max(F.col("td_gain")).as("td_mx"))
    scored.join(best, Seq("td_g"))
      .where(F.col("td_gain") === F.col("td_mx"))
      .groupBy(F.col("td_g"), F.col("td_n"), F.col("td_mx"))
      .agg(F.min(F.col("td_t")).as("td_tstar"),
        F.min_by(F.struct(F.col("td_ml"), F.col("td_mr")),
          F.col("td_t")).as("td_m"))
      .select(F.col("td_g").as("group"), F.col("td_n").as("n"),
        F.col("td_tstar").as("t_star"), F.col("td_mx").as("gain"),
        F.col("td_m.td_ml").as("mean_left"),
        F.col("td_m.td_mr").as("mean_right"))
      .orderBy(F.col("group").asc)
  }

  /** Rolling correlation between two integer series per group — "did
    * volume and revenue decouple this week": Pearson over the trailing
    * `window`-row frame at every t, from EXACT windowed integer sums
    * (both columns LONG — the [[acf]] contract; counts/Σx/Σy as longs,
    * the three cross-moments in DECIMAL(38,0)), finishing doubles
    * stated once per row (the [[Report.mergeCorrStamps]] algebra).
    * Group-partitioned frames — never an unpartitioned corpus window.
    * Frames with degenerate variance (or fewer than 2 rows) answer
    * NULL. Output: (group, t, n_w, corr) ascending. */
  def rollingCorr(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, yCol: String, window: Int): DataFrame = {
    require(window >= 2 && window <= 100000,
      s"window in [2,100000], got $window")
    val clean = df.where(F.col(groupCol).isNotNull &&
        F.col(tCol).isNotNull && F.col(xCol).isNotNull &&
        F.col(yCol).isNotNull)
      .select(F.col(groupCol).cast("string").as("td_g"),
        F.col(tCol).cast("long").as("td_t"),
        F.col(xCol).cast("long").as("td_x"),
        F.col(yCol).cast("long").as("td_y"))
    val w = Window.partitionBy(F.col("td_g")).orderBy(F.col("td_t").asc)
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    val decX = F.col("td_x").cast("decimal(19,0)")
    val decY = F.col("td_y").cast("decimal(19,0)")
    val staged = clean
      .withColumn("td_nw", F.count(F.lit(1)).over(w))
      .withColumn("td_sx", F.sum(F.col("td_x")).over(w))
      .withColumn("td_sy", F.sum(F.col("td_y")).over(w))
      .withColumn("td_sxx", F.sum((decX * decX).cast("decimal(38,0)")).over(w))
      .withColumn("td_sxy", F.sum((decX * decY).cast("decimal(38,0)")).over(w))
      .withColumn("td_syy", F.sum((decY * decY).cast("decimal(38,0)")).over(w))
    val nD = F.col("td_nw").cast("double")
    val sxD = F.col("td_sx").cast("double")
    val syD = F.col("td_sy").cast("double")
    val num = (nD * F.col("td_sxy").cast("double")) - (sxD * syD)
    val vx = (nD * F.col("td_sxx").cast("double")) - (sxD * sxD)
    val vy = (nD * F.col("td_syy").cast("double")) - (syD * syD)
    staged.select(F.col("td_g").as("group"), F.col("td_t").as("t"),
        F.col("td_nw").as("n_w"),
        F.when(F.col("td_nw") >= 2L && vx > 0.0d && vy > 0.0d,
          num / (F.sqrt(vx) * F.sqrt(vy))).as("corr"))
      .orderBy(F.col("group").asc, F.col("t").asc)
  }

  /** Holt double-exponential smoothing per group — level + TREND state
    * over the t-ordered series (the [[Report.ewmaDailyByGroup]] fold
    * grown a second state variable; EWMA flattens a steady climb into
    * permanent lag, Holt tracks it). Classic init (l₁ = x₁, b₁ = 0),
    * then for each subsequent point: l ← α·x + (1−α)(l + b),
    * b ← β(l − l_prev) + (1−β)b — a PINNED ascending fold over the
    * bounded per-group grid, each double op stated once. Emits the
    * final state plus the h-step linear forecast. Output:
    * (group, n, level, trend, forecast) ascending by group. */
  def holtLinear(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, alpha: Double, beta: Double,
      horizon: Int = 1): DataFrame = {
    require(alpha > 0.0d && alpha <= 1.0d, s"alpha in (0,1], got $alpha")
    require(beta >= 0.0d && beta <= 1.0d, s"beta in [0,1], got $beta")
    require(horizon >= 0, s"horizon >= 0, got $horizon")
    val clean = cleanSeries(df, groupCol, tCol, xCol)
    val packed = clean.groupBy(F.col("td_g"))
      .agg(F.sort_array(F.collect_list(F.struct(
        F.col("td_t"), F.col("td_x")))).as("td_l"))
    val l = F.col("td_l")
    val zero = F.struct(
      F.element_at(l, 1).getField("td_x").as("l"),
      F.lit(0.0d).as("b"))
    val folded = F.aggregate(F.slice(l, F.lit(2), F.size(l) - 1), zero,
      (acc, e) => {
        val nl = F.lit(alpha) * e.getField("td_x") +
          F.lit(1.0d - alpha) * (acc.getField("l") + acc.getField("b"))
        val nb = F.lit(beta) * (nl - acc.getField("l")) +
          F.lit(1.0d - beta) * acc.getField("b")
        F.struct(nl.as("l"), nb.as("b"))
      })
    packed.where(F.size(l) > 0)
      .withColumn("td_f", folded)
      .select(F.col("td_g").as("group"),
        F.size(l).cast("long").as("n"),
        F.col("td_f").getField("l").as("level"),
        F.col("td_f").getField("b").as("trend"),
        (F.col("td_f").getField("l") +
          F.lit(horizon.toDouble) * F.col("td_f").getField("b"))
          .as("forecast"))
      .orderBy(F.col("group").asc)
  }

  /** Per-group additive Holt–Winters (triple exponential smoothing,
    * Winters 1960) — [[holtLinear]] plus a SEASONAL state, the weekly-
    * shape-aware forecaster ([[graft.pipeline.Report.seasonalDaily]]
    * reads the shape, this one forecasts THROUGH it). Init from the
    * first two periods — l₀ = mean(x₁..x_p), b₀ = (Σ₂ − Σ₁)/p²,
    * s_i = x_i − l₀ — then the recursion consumes t = 2p+1..n with the
    * seasonal state as a ROTATING list (head = s_{t−p}, the slot due
    * now; each step drops the head and appends the refreshed slot):
    * l_t = α(x_t − s_{t−p}) + (1−α)(l_{t−1} + b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},
    * s_t = γ(x_t − l_t) + (1−γ)s_{t−p}, complements stated as
    * subtractions, the fold pinned ascending by t (an exact-replay
    * recursion like [[holtLinear]]'s, DuckDB side as a RECURSIVE CTE).
    * The grid must be dense per group (quantize + fill upstream — a
    * gap would rotate seasons out of phase). Groups with n < 2p have
    * no second init period and answer NULL states with their observed
    * n. Forecast h ahead reads l + h·b + the (((h−1) mod p)+1)-th slot
    * of the final rotated list. Output: (group, n, level, trend,
    * season_next, forecast) ascending by group. */
  def holtWinters(df: DataFrame, groupCol: String, tCol: String,
      xCol: String, alpha: Double, beta: Double, gamma: Double,
      period: Int, horizon: Int = 1): DataFrame = {
    require(alpha > 0.0d && alpha <= 1.0d, s"alpha in (0,1], got $alpha")
    require(beta >= 0.0d && beta <= 1.0d, s"beta in [0,1], got $beta")
    require(gamma >= 0.0d && gamma <= 1.0d, s"gamma in [0,1], got $gamma")
    require(period >= 2, s"period >= 2, got $period")
    require(horizon >= 1, s"horizon >= 1, got $horizon")
    val p = period
    val clean = cleanSeries(df, groupCol, tCol, xCol)
    val packed = clean.groupBy(F.col("td_g"))
      .agg(F.sort_array(F.collect_list(F.struct(
        F.col("td_t"), F.col("td_x")))).as("td_l"))
    val l = F.col("td_l")
    val xs = F.transform(l, e => e.getField("td_x"))
    def foldSum(arr: Column) =
      F.aggregate(arr, F.lit(0.0d), (a, x) => a + x)
    val l0 = foldSum(F.slice(xs, 1, p)) / F.lit(p.toDouble)
    val b0 = (foldSum(F.slice(xs, p + 1, p)) - foldSum(F.slice(xs, 1, p))) /
      F.lit(p.toDouble * p.toDouble)
    val s0 = F.transform(F.slice(xs, 1, p), x => x - l0)
    val zero = F.struct(l0.as("l"), b0.as("b"), s0.as("s"))
    val rest = F.slice(xs, F.lit(2 * p + 1),
      F.greatest(F.lit(0), F.size(xs) - F.lit(2 * p)))
    val folded = F.aggregate(rest, zero, (acc, x) => {
      val sh = F.element_at(acc.getField("s"), 1)
      val nl = F.lit(alpha) * (x - sh) +
        F.lit(1.0d - alpha) * (acc.getField("l") + acc.getField("b"))
      val nb = F.lit(beta) * (nl - acc.getField("l")) +
        F.lit(1.0d - beta) * acc.getField("b")
      val ns = F.lit(gamma) * (x - nl) + F.lit(1.0d - gamma) * sh
      F.struct(nl.as("l"), nb.as("b"),
        F.concat(F.slice(acc.getField("s"), 2, p - 1), F.array(ns))
          .as("s"))
    })
    val ok = F.size(l) >= 2 * p
    val fIdx = ((horizon - 1) % p) + 1
    packed.where(F.size(l) > 0)
      .withColumn("td_f", F.when(ok, folded))
      .select(F.col("td_g").as("group"),
        F.size(l).cast("long").as("n"),
        F.col("td_f").getField("l").as("level"),
        F.col("td_f").getField("b").as("trend"),
        F.element_at(F.col("td_f").getField("s"), 1).as("season_next"),
        (F.col("td_f").getField("l") +
          F.lit(horizon.toDouble) * F.col("td_f").getField("b") +
          F.element_at(F.col("td_f").getField("s"), fIdx))
          .as("forecast"))
      .orderBy(F.col("group").asc)
  }

  /** Per-group simple OLS of x on t — the PARAMETRIC trend face next
    * to [[theilSen]]'s robust slope and [[mannKendall]]'s rank test:
    * slope, intercept, R², and the slope's t-statistic in one keyed
    * pass. The corpus reduces to per-group (n, Σfp(t), Σfp(x),
    * Σfp(t²), Σfp(x²), Σfp(tx)) — per-row 2^20 fixed-point images
    * summed in DECIMAL(38,0), so both engines state identical doubles
    * — then the finishing sequence per group, each op stated once:
    * mt = Σt/n, mx = Σx/n, stt = Σt² − n·mt², sxx = Σx² − n·mx²,
    * stx = Σtx − n·mt·mx, slope = stx/stt, intercept = mx − slope·mt,
    * r2 = stx²/(stt·sxx), mse = (sxx − slope·stx)/(n−2),
    * se = √(mse/stt), t_stat = slope/se. Centered-moment cancellation
    * is deterministic (identical doubles both sides) but still real:
    * feed a SMALL t origin (days since the corpus epoch, not raw unix
    * days). Groups with n < 3, zero stt, or mse ≤ 0 answer NULL
    * slope-inference honestly (slope itself needs only stt > 0).
    * Domain: |t|, |x| ≤ 2^21 and |t·x| ≤ 2^42. Output: (group, n,
    * slope, intercept, r2, se_slope, t_stat) ascending by group. */
  def olsByGroup(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val clean = cleanSeries(df, groupCol, tCol, xCol)
    def fp(c: Column) = F.floor(c * F.lit(1048576.0d) + F.lit(0.5d))
      .cast("decimal(38,0)")
    val t = F.col("td_t").cast("double")
    val x = F.col("td_x")
    val agg = clean.groupBy(F.col("td_g"))
      .agg(F.count(F.lit(1)).as("td_n"),
        F.sum(fp(t)).as("td_st"), F.sum(fp(x)).as("td_sx"),
        F.sum(fp(t * t)).as("td_stt"), F.sum(fp(x * x)).as("td_sxx"),
        F.sum(fp(t * x)).as("td_stx"))
    def un(c: Column) = c.cast("double") / F.lit(1048576.0d)
    val nD = F.col("td_n").cast("double")
    val mt = un(F.col("td_st")) / nD
    val mx = un(F.col("td_sx")) / nD
    val stt = un(F.col("td_stt")) - nD * mt * mt
    val sxx = un(F.col("td_sxx")) - nD * mx * mx
    val stx = un(F.col("td_stx")) - nD * mt * mx
    val slope = F.when(stt > 0.0d, stx / stt)
    val mse = F.when(F.col("td_n") >= 3L && stt > 0.0d,
      (sxx - slope * stx) / (nD - F.lit(2.0d)))
    val okInf = F.col("td_n") >= 3L && stt > 0.0d && mse > 0.0d
    agg.select(F.col("td_g").as("group"),
        F.col("td_n").as("n"),
        slope.as("slope"),
        F.when(stt > 0.0d, mx - slope * mt).as("intercept"),
        F.when(stt > 0.0d && sxx > 0.0d,
          (stx * stx) / (stt * sxx)).as("r2"),
        F.when(okInf, F.sqrt(mse / stt)).as("se_slope"),
        F.when(okInf, slope / F.sqrt(mse / stt)).as("t_stat"))
      .orderBy(F.col("group").asc)
  }
}
