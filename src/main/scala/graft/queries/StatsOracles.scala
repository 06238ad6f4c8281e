package graft.queries

/** DuckDB oracles for the round-17 statistics gates. Conventions as
  * [[ModelOracles]]: corpus reductions as exact BIGINT/HUGEINT/
  * DECIMAL(38,0) sums (order-free), bounded double folds as
  * `list(x ORDER BY k)` + `list_reduce(list_prepend(zero, …))`
  * matching the Spark side's pinned ascending association, every
  * double op stated once in the identical order. Smoothing constants
  * are stated as the SUBTRACTION (1.0 − α), never the decimal literal
  * of the difference — 1.0 − 0.4 is not the double 0.6. */
object StatsOracles {

  // q_ab_sprt's four ln constants — THE gate's driver-side doubles
  // (Report.sprtBernoulli computes the identical expressions), embedded
  // as their EXACT decimal expansions: DuckDB's float parser rounds the
  // shortest-roundtrip string of some doubles to the adjacent ulp
  // (measured on ln(0.45/0.55)), but an exactly-representable decimal
  // parses bit-exact on any engine
  private def exactLit(x: Double): String =
    new java.math.BigDecimal(x).toPlainString
  private val sprtC1 = exactLit(math.log(0.55d / 0.45d))
  private val sprtC0 = exactLit(math.log((1.0d - 0.55d) / (1.0d - 0.45d)))
  private val sprtUp = exactLit(math.log((1.0d - 0.2d) / 0.05d))
  private val sprtLo = exactLit(math.log(0.2d / (1.0d - 0.05d)))

  // the q_ab_welch revenue fixture widened to three cohorts
  private val rev3 =
    """u AS (SELECT user_id,
      |    CASE WHEN user_id % 3 = 0 THEN 'A'
      |         WHEN user_id % 3 = 1 THEN 'B' ELSE 'C' END AS variant,
      |    CAST(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
      |      + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0
      |      AS revenue
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |  GROUP BY user_id, 2)""".stripMargin

  /** The [[graft.pipeline.Report.anovaF]] finishing algebra over a
    * (variant, x) relation named `src`: fixed-point moments per group,
    * exact decimal grand sums, the one order-sensitive T fold pinned
    * ascending by group, then SSB/SSW/F stated exactly as the gate. */
  private def anovaSql(src: String): String =
    s"""m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sx,
       |    sum(CAST(floor((x * x) * 1048576.0 + 0.5) AS DECIMAL(38,0)))
       |      AS sxx
       |  FROM $src GROUP BY variant),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(sx) AS DOUBLE) / 1048576.0 AS sxd,
       |    CAST(sum(sxx) AS DOUBLE) / 1048576.0 AS sxxd FROM m),
       |tt AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(((CAST(sx AS DOUBLE) / 1048576.0) *
       |          (CAST(sx AS DOUBLE) / 1048576.0)) / CAST(n AS DOUBLE)
       |      ORDER BY variant)),
       |    (a, b) -> a + b) AS t FROM m),
       |ff AS (SELECT k, nn, CAST(k AS DOUBLE) AS kd,
       |    CAST(nn AS DOUBLE) AS nd, sxd, sxxd, t FROM tot, tt),
       |gg AS (SELECT *, t - (sxd * sxd) / nd AS ssb, sxxd - t AS ssw
       |  FROM ff)
       |SELECT nn AS n, k AS n_groups, sxd / nd AS grand_mean, ssb, ssw,
       |  CASE WHEN k >= 2 AND nn > k AND ssw > 0.0 THEN
       |    (ssb / (kd - 1.0)) / (ssw / (nd - kd)) END AS f
       |FROM gg""".stripMargin

  // per-user survival fixture: duration = days from first sighting to
  // first purchase, censored at the last sighting for never-purchasers
  private val perUser =
    """pu AS (SELECT user_id,
      |    CAST(min(CAST(ts AS DATE)) - DATE '1970-01-01' AS BIGINT)
      |      AS fst,
      |    CAST(max(CAST(ts AS DATE)) - DATE '1970-01-01' AS BIGINT)
      |      AS lst,
      |    min(CASE WHEN event_type = 'purchase' THEN
      |      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) END)
      |      AS prch
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY user_id),
      |per AS (SELECT user_id, COALESCE(prch, lst) - fst AS duration,
      |    CAST(prch IS NOT NULL AS BIGINT) AS event FROM pu)""".stripMargin

  // per-(event_type, day) exact fixed-point daily revenue series
  private val dailyRev =
    """dser AS (SELECT event_type AS g,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
      |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS xi
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL
      |  GROUP BY 1, 2)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ab_anova" ->
      s"""WITH $rev3,
         |src AS (SELECT variant, revenue AS x FROM u),
         |${anovaSql("src")}""".stripMargin,
    "q_ab_levene" ->
      // Brown–Forsythe: median-centered absolute deviations, then the
      // identical ANOVA algebra on z
      s"""WITH $rev3,
         |md AS (SELECT variant, median(revenue) AS med FROM u
         |  GROUP BY variant),
         |src AS (SELECT u.variant, abs(u.revenue - md.med) AS x
         |  FROM u JOIN md USING (variant)),
         |${anovaSql("src")}""".stripMargin,
    "q_fdr_bh" ->
      // ordinal rank by (p, id), suffix running-min of m·p/rank,
      // clip at 1, step-up reject at α = 0.2
      """WITH t AS (SELECT event_type || '_' ||
        |    CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      % 7) AS VARCHAR) AS test_id,
        |    CAST((sum(user_id) % 9973) + 1 AS DOUBLE) / 10000.0
        |      AS p_value
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1),
        |r AS (SELECT test_id, p_value,
        |    CAST(row_number() OVER (ORDER BY p_value ASC, test_id ASC)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM t),
        |a AS (SELECT *, CAST(m AS DOUBLE) * p_value /
        |    CAST(rank AS DOUBLE) AS raw FROM r),
        |s AS (SELECT *, min(raw) OVER (ORDER BY p_value DESC,
        |    test_id DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS sufmin FROM a)
        |SELECT test_id, p_value, rank, least(1.0, sufmin) AS p_adj,
        |  least(1.0, sufmin) <= 0.2 AS reject
        |FROM s ORDER BY rank ASC""".stripMargin,
    "q_survival_km" ->
      // bounded duration grid, at-risk via exact prefix arrivals, the
      // (n−d)/n factor list, pinned ascending prefix products
      s"""WITH $perUser,
         |g AS (SELECT duration AS t, CAST(count(*) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN event <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d
         |  FROM per GROUP BY 1),
         |p AS (SELECT CAST(sum(a) AS BIGINT) AS nn,
         |    list(struct_pack(t := t, a := a, d := d) ORDER BY t) AS l
         |  FROM g),
         |fl AS (SELECT list_transform(range(1, len(l) + 1), j ->
         |    CAST((nn - list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(l[1:j-1], e -> e.a)), (x, y) -> x + y))
         |      - l[j].d AS DOUBLE) /
         |    CAST(nn - list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(l[1:j-1], e -> e.a)), (x, y) -> x + y)
         |      AS DOUBLE)) AS f
         |  FROM p),
         |ix AS (SELECT nn, l, unnest(range(1, len(l) + 1)) AS i FROM p)
         |SELECT l[i].t AS t,
         |  nn - list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(l[1:i-1], e -> e.a)), (x, y) -> x + y)
         |    AS n_risk,
         |  l[i].d AS d_events, l[i].a - l[i].d AS c_censored,
         |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fl.f[1:i]),
         |    (x, y) -> x * y) AS survival
         |FROM ix, fl ORDER BY t ASC""".stripMargin,
    "q_survival_logrank" ->
      // per-time contributions from exact window prefix arrivals, then
      // SCALAR ascending folds for E and V (never a struct accumulator
      // — DuckDB 1.0's list_reduce misbinds acc struct fields). A
      // non-event time contributes +0.0, the exact identity of the
      // gate's skip, so the stated double sums replay the Spark fold.
      s"""WITH $perUser,
         |pc AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
         |    AS cohort, duration, event FROM per),
         |gr AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n FROM pc
         |  GROUP BY 1),
         |gp AS (SELECT CAST(count(*) AS BIGINT) AS nv,
         |    list(struct_pack(g := cohort, n := n) ORDER BY cohort)
         |      AS gl FROM gr),
         |grid AS (SELECT duration AS t, CAST(count(*) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN event <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d,
         |    CAST(sum(CASE WHEN cohort = (SELECT gl[1].g FROM gp)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS aa,
         |    CAST(sum(CASE WHEN cohort = (SELECT gl[1].g FROM gp)
         |      AND event <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS da
         |  FROM pc GROUP BY 1),
         |tot AS (SELECT CAST(sum(a) AS BIGINT) AS nn,
         |    CAST(sum(aa) AS BIGINT) AS na FROM grid),
         |cum AS (SELECT t, a, d, aa, da,
         |    CAST(COALESCE(sum(a) OVER (ORDER BY t ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
         |    CAST(COALESCE(sum(aa) OVER (ORDER BY t ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cba
         |  FROM grid),
         |con AS (SELECT t, da,
         |    CASE WHEN d > 0 AND (nn - cb) >= 2 THEN
         |      CAST(d AS DOUBLE) * (CAST(na - cba AS DOUBLE) /
         |        CAST(nn - cb AS DOUBLE))
         |      ELSE CAST(0.0 AS DOUBLE) END AS ec,
         |    CASE WHEN d > 0 AND (nn - cb) >= 2 THEN
         |      CAST(d AS DOUBLE) * (CAST(na - cba AS DOUBLE) /
         |        CAST(nn - cb AS DOUBLE)) *
         |      (1.0 - (CAST(na - cba AS DOUBLE) /
         |              CAST(nn - cb AS DOUBLE))) *
         |      (CAST((nn - cb) - d AS DOUBLE) /
         |       CAST((nn - cb) - 1 AS DOUBLE))
         |      ELSE CAST(0.0 AS DOUBLE) END AS vc
         |  FROM cum, tot),
         |fold AS (SELECT CAST(sum(da) AS BIGINT) AS o,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(ec ORDER BY t)), (x, y) -> x + y) AS ee,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(vc ORDER BY t)), (x, y) -> x + y) AS vv
         |  FROM con)
         |SELECT gp.nv AS n_groups, gl[1].g AS group_a, gl[2].g AS group_b,
         |  gl[1].n AS n_a, gl[2].n AS n_b, fold.o AS o_a,
         |  CASE WHEN nv = 2 THEN fold.ee END AS e_a,
         |  CASE WHEN nv = 2 THEN fold.vv END AS v,
         |  CASE WHEN nv = 2 AND fold.vv > 0.0 THEN
         |    (CAST(fold.o AS DOUBLE) - fold.ee) / sqrt(fold.vv) END AS z
         |FROM fold, gp""".stripMargin,
    "q_trend_mannkendall" ->
      // exact integer S over the within-group pair relation, exact tie
      // term, continuity-corrected z
      s"""WITH $dailyRev,
         |ds AS (SELECT g, t, CAST(xi AS DOUBLE) AS x FROM dser),
         |s AS (SELECT a.g, CAST(sum(CASE WHEN b.x > a.x THEN 1
         |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM ds a JOIN ds b ON a.g = b.g AND a.t < b.t GROUP BY 1),
         |tie AS (SELECT g,
         |    CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie,
         |    CAST(sum(c) AS BIGINT) AS n
         |  FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM ds
         |    GROUP BY 1, 2) GROUP BY 1),
         |f AS (SELECT tie.g, tie.n, COALESCE(s.s, 0) AS s, tie.tie,
         |    CAST(tie.n * (tie.n - 1) * (2 * tie.n + 5) - tie.tie
         |      AS DOUBLE) / 18.0 AS var_s
         |  FROM tie LEFT JOIN s ON tie.g = s.g)
         |SELECT g AS "group", n, s, tie AS tie_term, var_s,
         |  CASE WHEN var_s > 0.0 THEN
         |    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
         |         WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
         |         ELSE 0.0 END END AS z
         |FROM f ORDER BY "group" ASC""".stripMargin,
    "q_trend_theilsen" ->
      s"""WITH $dailyRev,
         |ds AS (SELECT g, t, CAST(xi AS DOUBLE) AS x FROM dser),
         |sl AS (SELECT a.g, median((b.x - a.x) /
         |    CAST(b.t - a.t AS DOUBLE)) AS slope
         |  FROM ds a JOIN ds b ON a.g = b.g AND a.t < b.t GROUP BY 1),
         |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM ds
         |  GROUP BY 1),
         |ic AS (SELECT ds.g, median(ds.x - sl.slope *
         |    CAST(ds.t AS DOUBLE)) AS icpt
         |  FROM ds JOIN sl ON ds.g = sl.g GROUP BY 1)
         |SELECT n.g AS "group", n.n AS n, sl.slope AS slope,
         |  ic.icpt AS intercept
         |FROM n LEFT JOIN sl ON n.g = sl.g LEFT JOIN ic ON n.g = ic.g
         |ORDER BY "group" ASC""".stripMargin,
    "q_trend_acf" -> {
      // exact HUGEINT cross-moments per lag, the classic expansion from
      // full-series mean, one stated division per lag
      val lagCols = (1 to 5).map(k =>
        s"lag(xi, $k) OVER w AS l$k").mkString(",\n         |    ")
      val aggCols = (1 to 5).map(k =>
        s"""CAST(count(l$k) AS BIGINT) AS nk$k,
           |    CAST(sum(CAST(xi AS HUGEINT) * CAST(l$k AS HUGEINT))
           |      AS HUGEINT) AS sxy$k,
           |    CAST(sum(l$k) AS BIGINT) AS sh$k,
           |    CAST(sum(CASE WHEN l$k IS NOT NULL THEN xi END)
           |      AS BIGINT) AS st$k""".stripMargin)
        .mkString(",\n    ")
      val unnested = (1 to 5).map(k =>
        s"struct_pack(lag := CAST($k AS BIGINT), nk := nk$k, " +
          s"sxy := sxy$k, sh := sh$k, st := st$k)").mkString(", ")
      // 2^6-scale daily revenue (NOT dailyRev's 2^20): cross-moment
      // sums must stay below 2^53 — DuckDB 1.0's HUGEINT→DOUBLE cast
      // is off by an ulp past that
      s"""WITH dser AS (SELECT event_type AS g,
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 64.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS xi
         |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |lg AS (SELECT g, t, xi,
         |    $lagCols
         |  FROM dser WINDOW w AS (PARTITION BY g ORDER BY t ASC)),
         |ag AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(xi) AS BIGINT) AS sx,
         |    CAST(sum(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT))
         |      AS HUGEINT) AS sxx,
         |    $aggCols
         |  FROM lg GROUP BY g),
         |u AS (SELECT g, n, sx, sxx, unnest([$unnested]) AS e FROM ag),
         |fin AS (SELECT g, e.lag AS lag, e.nk AS n_pairs,
         |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         |    CAST(sxx AS DOUBLE) -
         |      CAST(n AS DOUBLE) * ((CAST(sx AS DOUBLE) /
         |        CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) /
         |        CAST(n AS DOUBLE))) AS den,
         |    e.sxy AS sxy, e.sh AS sh, e.st AS st, e.nk AS nk FROM u)
         |SELECT g AS "group", lag, n_pairs,
         |  CASE WHEN den > 0.0 AND nk > 0 THEN
         |    (CAST(sxy AS DOUBLE) - m * CAST(sh AS DOUBLE) -
         |      m * CAST(st AS DOUBLE) + CAST(nk AS DOUBLE) * (m * m))
         |    / den END AS r
         |FROM fin ORDER BY "group" ASC, lag ASC""".stripMargin
    },
    "q_quality_isotonic" ->
      // gridBin CASE stated in full, exact integer prefixes via scalar
      // folds, the minimax nested lists (one division per (j,k) window)
      """WITH src AS (SELECT
        |    CAST(doc_id % 97 AS DOUBLE) / 97.0 AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
        |b AS (SELECT CASE WHEN s < 0.0 THEN CAST(0 AS BIGINT)
        |      WHEN s >= 1.0 THEN CAST(21 AS BIGINT)
        |      ELSE least(CAST(20 AS BIGINT),
        |        CAST(floor((s - 0.0) * 20.0 / 1.0) AS BIGINT) + 1) END
        |      AS bin,
        |    CAST(count(*) AS BIGINT) AS w, CAST(sum(y) AS BIGINT) AS p
        |  FROM src GROUP BY 1),
        |pk AS (SELECT list(struct_pack(bin := bin, w := w, p := p)
        |    ORDER BY bin) AS l FROM b),
        |pre AS (SELECT l,
        |    list_transform(range(0, len(l) + 1), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(l[1:i], e -> e.p)), (a, b) -> a + b))
        |      AS pp,
        |    list_transform(range(0, len(l) + 1), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(l[1:i], e -> e.w)), (a, b) -> a + b))
        |      AS pw
        |  FROM pk),
        |iso AS (SELECT l,
        |    list_transform(range(1, len(l) + 1), i ->
        |      list_max(list_transform(range(1, i + 1), j ->
        |        list_min(list_transform(range(i, len(l) + 1), k ->
        |          CAST(pp[k + 1] - pp[j] AS DOUBLE) /
        |            CAST(pw[k + 1] - pw[j] AS DOUBLE)))))) AS fit
        |  FROM pre),
        |ix AS (SELECT l, fit, unnest(range(1, len(l) + 1)) AS i
        |  FROM iso)
        |SELECT l[i].bin AS bin, l[i].w AS n, l[i].p AS n_pos,
        |  CAST(l[i].p AS DOUBLE) / CAST(l[i].w AS DOUBLE) AS rate_raw,
        |  fit[i] AS rate_iso
        |FROM ix ORDER BY bin ASC""".stripMargin,
    "q_trend_changepoint" ->
      // exact prefix/total sums through group-partitioned windows, the
      // per-split doubles restated identically, ties → smallest t
      s"""WITH $dailyRev,
         |st AS (SELECT g, t, xi,
         |    CAST(count(*) OVER wc AS BIGINT) AS i,
         |    CAST(sum(xi) OVER wc AS BIGINT) AS sl,
         |    CAST(count(*) OVER wa AS BIGINT) AS n,
         |    CAST(sum(xi) OVER wa AS BIGINT) AS s
         |  FROM dser WINDOW wc AS (PARTITION BY g ORDER BY t ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wa AS (PARTITION BY g ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    UNBOUNDED FOLLOWING)),
         |sc AS (SELECT g, t, n,
         |    CAST(sl AS DOUBLE) / CAST(i AS DOUBLE) AS ml,
         |    CAST(s - sl AS DOUBLE) /
         |      (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)) AS mr,
         |    (CAST(i AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))
         |      / CAST(n AS DOUBLE)) *
         |    ((CAST(sl AS DOUBLE) / CAST(i AS DOUBLE) -
         |      CAST(s - sl AS DOUBLE) /
         |        (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) *
         |     (CAST(sl AS DOUBLE) / CAST(i AS DOUBLE) -
         |      CAST(s - sl AS DOUBLE) /
         |        (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)))) AS gain
         |  FROM st WHERE i < n),
         |mx AS (SELECT g, max(gain) AS mx FROM sc GROUP BY g),
         |pick AS (SELECT sc.g, sc.n, sc.t, sc.gain, sc.ml, sc.mr,
         |    row_number() OVER (PARTITION BY sc.g ORDER BY sc.t ASC)
         |      AS rn
         |  FROM sc JOIN mx ON sc.g = mx.g AND sc.gain = mx.mx)
         |SELECT g AS "group", n, t AS t_star, gain, ml AS mean_left,
         |  mr AS mean_right
         |FROM pick WHERE rn = 1 ORDER BY "group" ASC""".stripMargin,
    "q_trend_rolling_corr" ->
      // exact trailing-frame integer sums (HUGEINT cross-moments under
      // 2^53 at the 2^6 revenue scale), the mergeCorrStamps finishing
      """WITH dser2 AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 64.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS xi,
        |    CAST(count(*) AS BIGINT) AS yi
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |st AS (SELECT g, t,
        |    CAST(count(*) OVER w AS BIGINT) AS nw,
        |    CAST(sum(xi) OVER w AS BIGINT) AS sx,
        |    CAST(sum(yi) OVER w AS BIGINT) AS sy,
        |    CAST(sum(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT)) OVER w
        |      AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(xi AS HUGEINT) * CAST(yi AS HUGEINT)) OVER w
        |      AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(yi AS HUGEINT) * CAST(yi AS HUGEINT)) OVER w
        |      AS HUGEINT) AS syy
        |  FROM dser2 WINDOW w AS (PARTITION BY g ORDER BY t ASC
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT g, t, nw,
        |    (CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)) -
        |      (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS num,
        |    (CAST(nw AS DOUBLE) * CAST(sxx AS DOUBLE)) -
        |      (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS vx,
        |    (CAST(nw AS DOUBLE) * CAST(syy AS DOUBLE)) -
        |      (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vy
        |  FROM st)
        |SELECT g AS "group", t, nw AS n_w,
        |  CASE WHEN nw >= 2 AND vx > 0.0 AND vy > 0.0 THEN
        |    num / (sqrt(vx) * sqrt(vy)) END AS corr
        |FROM fin ORDER BY "group" ASC, t ASC""".stripMargin,
    "q_retrieval_ndcg" -> {
      // the SAME driver-side discount doubles as the gate (Double
      // .toString round-trips); gains as power(2, rel) − 1 — powers of
      // two are exact in any libm; per-query pinned ascending-pos folds
      val disc = graft.pipeline.Retrieval.discountSqlList(10)
      s"""WITH r0 AS (SELECT event_type AS q, user_id,
         |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
         |      + 0.5) AS BIGINT)) AS BIGINT) AS rev
         |  FROM events WHERE event_type IS NOT NULL
         |    AND user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2),
         |rk AS (SELECT q, user_id,
         |    CAST(row_number() OVER (PARTITION BY q ORDER BY rev DESC,
         |      user_id ASC) AS BIGINT) AS pos FROM r0),
         |top AS (SELECT q, pos, CAST(user_id % 3 AS BIGINT) AS rel
         |  FROM rk WHERE pos <= 10),
         |mx AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rel,
         |    list(struct_pack(pos := pos, rel := rel) ORDER BY pos) AS l
         |  FROM top GROUP BY q),
         |met AS (SELECT q, n, n_rel, l,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(l, e -> (power(2.0, CAST(e.rel AS DOUBLE))
         |      - 1.0) * ($disc)[e.pos])), (a, b) -> a + b) AS dcg,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(1, len(l) + 1), i ->
         |      (power(2.0, CAST((list_sort(list_transform(l,
         |        e -> e.rel), 'DESC'))[i] AS DOUBLE)) - 1.0)
         |      * ($disc)[i])), (a, b) -> a + b) AS idcg,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(1, len(l) + 1), i ->
         |      CASE WHEN l[i].rel > 0 THEN
         |        CAST(len(list_filter(l[1:i], e -> e.rel > 0)) AS DOUBLE)
         |          / CAST(l[i].pos AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END)), (a, b) -> a + b) AS apsum
         |  FROM mx)
         |SELECT q AS query, n, n_rel, dcg, idcg,
         |  CASE WHEN idcg > 0.0 THEN dcg / idcg END AS ndcg,
         |  COALESCE(1.0 / CAST(list_min(list_transform(list_filter(l,
         |    e -> e.rel > 0), e -> e.pos)) AS DOUBLE), 0.0) AS rr,
         |  CASE WHEN n_rel > 0 THEN apsum / CAST(n_rel AS DOUBLE)
         |    ELSE 0.0 END AS ap
         |FROM met ORDER BY query ASC""".stripMargin
    },
    "q_fuzzy_jaro" ->
      // the kernel's parity target IS DuckDB's jaro_winkler_similarity
      // (verified on 3000 fuzzed pairs while building the expression)
      """SELECT c_custkey,
        |  jaro_winkler_similarity(c_name,
        |    substr(c_name, 1, 9) || reverse(substr(c_name, 10, 9)))
        |    AS jw_twin,
        |  jaro_winkler_similarity(c_name, c_mktsegment) AS jw_seg
        |FROM customer
        |WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        |  AND c_mktsegment IS NOT NULL
        |ORDER BY c_custkey ASC LIMIT 500""".stripMargin,
    "q_outlier_mahalanobis" ->
      // 2^10 fixed-point moments (product sums stay under 2^53), the
      // closed-form 2x2 inverse, the distance stated exactly as the gate
      """WITH per AS (SELECT user_id AS id,
        |    CAST(count(*) AS DOUBLE) AS x,
        |    CAST(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0 AS y
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(x * 1024.0 + 0.5) AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(floor(y * 1024.0 + 0.5) AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(floor((x * x) * 1024.0 + 0.5) AS DECIMAL(38,0)))
        |      AS sxx,
        |    sum(CAST(floor((x * y) * 1024.0 + 0.5) AS DECIMAL(38,0)))
        |      AS sxy,
        |    sum(CAST(floor((y * y) * 1024.0 + 0.5) AS DECIMAL(38,0)))
        |      AS syy
        |  FROM per),
        |fin AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    (CAST(sx AS DOUBLE) / 1024.0) / CAST(n AS DOUBLE) AS mx,
        |    (CAST(sy AS DOUBLE) / 1024.0) / CAST(n AS DOUBLE) AS my,
        |    sxx, sxy, syy FROM st),
        |cv AS (SELECT n, nd, mx, my,
        |    (CAST(sxx AS DOUBLE) / 1024.0 - nd * (mx * mx)) / (nd - 1.0)
        |      AS cxx,
        |    (CAST(sxy AS DOUBLE) / 1024.0 - nd * (mx * my)) / (nd - 1.0)
        |      AS cxy,
        |    (CAST(syy AS DOUBLE) / 1024.0 - nd * (my * my)) / (nd - 1.0)
        |      AS cyy
        |  FROM fin),
        |dd AS (SELECT *, cxx * cyy - cxy * cxy AS det FROM cv)
        |SELECT per.id, per.x, per.y,
        |  CASE WHEN dd.n >= 3 AND dd.det > 0.0 THEN
        |    ((per.x - dd.mx) * (per.x - dd.mx) * dd.cyy
        |      - 2.0 * (per.x - dd.mx) * (per.y - dd.my) * dd.cxy
        |      + (per.y - dd.my) * (per.y - dd.my) * dd.cxx) / dd.det
        |  END AS d2
        |FROM per, dd
        |ORDER BY d2 DESC NULLS LAST, per.id ASC LIMIT 20""".stripMargin,
    "q_trend_holt" ->
      // two-state recursion → RECURSIVE CTE stepping the sorted list
      // index (a struct-accumulator list_reduce would misbind acc
      // fields on DuckDB 1.0), restating exactly the gate's fold:
      // l₁ = x₁, b₁ = 0, then the α/β updates with complements stated
      // as subtractions (1.0 − 0.4 is not the double literal 0.6)
      """WITH RECURSIVE dc AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    list(x ORDER BY t) AS xs
        |  FROM dc GROUP BY g),
        |it AS (
        |  SELECT g, n, xs, CAST(1 AS BIGINT) AS i, xs[1] AS l,
        |    CAST(0.0 AS DOUBLE) AS b
        |  FROM p
        |  UNION ALL
        |  SELECT g, n, xs, i + 1,
        |    CAST(0.4 AS DOUBLE) * xs[i + 1] +
        |      (CAST(1.0 AS DOUBLE) - CAST(0.4 AS DOUBLE)) * (l + b),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.4 AS DOUBLE) * xs[i + 1] +
        |        (CAST(1.0 AS DOUBLE) - CAST(0.4 AS DOUBLE)) * (l + b))
        |      - l) +
        |      (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * b
        |  FROM it WHERE i < n)
        |SELECT g AS "group", n, l AS level, b AS trend,
        |  l + 7.0 * b AS forecast
        |FROM it WHERE i = n ORDER BY "group" ASC""".stripMargin,
    "q_ab_cuped" ->
      // one keyed 6-sum fixed-point pass per variant, pooled θ/ρ² from
      // the exact decimal grand sums, each variant's adjusted moments
      // restated algebraically from the same sums, Welch t +
      // Satterthwaite dof — every double op in the gate's exact order
      """WITH per AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(COALESCE(sum(CASE WHEN (CAST(CAST(ts AS DATE)
        |          - DATE '1970-01-01' AS BIGINT) % 2) <> 0 THEN
        |        CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |          AS BIGINT) END), 0) AS DOUBLE) / 1048576.0 AS y,
        |    CAST(COALESCE(sum(CASE WHEN (CAST(CAST(ts AS DATE)
        |          - DATE '1970-01-01' AS BIGINT) % 2) = 0 THEN
        |        CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |          AS BIGINT) END), 0) AS DOUBLE) / 1048576.0 AS x
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY user_id, 2),
        |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(y * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(floor((y * y) * 1048576.0 + 0.5) AS DECIMAL(38,0)))
        |      AS syy,
        |    sum(CAST(floor((x * x) * 1048576.0 + 0.5) AS DECIMAL(38,0)))
        |      AS sxx,
        |    sum(CAST(floor((x * y) * 1048576.0 + 0.5) AS DECIMAL(38,0)))
        |      AS sxy
        |  FROM per GROUP BY variant),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM m),
        |tp AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(sy) AS DOUBLE) / 1048576.0 AS syd,
        |    CAST(sum(sx) AS DOUBLE) / 1048576.0 AS sxd,
        |    CAST(sum(syy) AS DOUBLE) / 1048576.0 AS syyd,
        |    CAST(sum(sxx) AS DOUBLE) / 1048576.0 AS sxxd,
        |    CAST(sum(sxy) AS DOUBLE) / 1048576.0 AS sxyd
        |  FROM m),
        |po AS (SELECT nt, CAST(nt AS DOUBLE) AS ntd,
        |    sxd / CAST(nt AS DOUBLE) AS mx, syd / CAST(nt AS DOUBLE) AS my,
        |    syyd, sxxd, sxyd FROM tp),
        |ce AS (SELECT *, sxxd - ntd * mx * mx AS sxxc,
        |    syyd - ntd * my * my AS syyc,
        |    sxyd - ntd * mx * my AS sxyc FROM po),
        |th AS (SELECT *, sxyc / sxxc AS theta,
        |    (sxyc * sxyc) / (sxxc * syyc) AS rho2 FROM ce),
        |ga AS (SELECT n AS n_a, CAST(n AS DOUBLE) AS nad,
        |    CAST(sy AS DOUBLE) / 1048576.0 AS sy_a,
        |    CAST(sx AS DOUBLE) / 1048576.0 AS sx_a,
        |    CAST(syy AS DOUBLE) / 1048576.0 AS syy_a,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_a,
        |    CAST(sxy AS DOUBLE) / 1048576.0 AS sxy_a
        |  FROM m WHERE variant = 'A'),
        |gb AS (SELECT n AS n_b, CAST(n AS DOUBLE) AS nbd,
        |    CAST(sy AS DOUBLE) / 1048576.0 AS sy_b,
        |    CAST(sx AS DOUBLE) / 1048576.0 AS sx_b,
        |    CAST(syy AS DOUBLE) / 1048576.0 AS syy_b,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_b,
        |    CAST(sxy AS DOUBLE) / 1048576.0 AS sxy_b
        |  FROM m WHERE variant = 'B'),
        |ad AS (SELECT nv.n_variants, th.theta, th.rho2, th.mx,
        |    ga.n_a, ga.nad, gb.n_b, gb.nbd,
        |    sy_a - th.theta * (sx_a - ga.nad * th.mx) AS sya,
        |    syy_a - 2.0 * th.theta * (sxy_a - th.mx * sy_a) +
        |      th.theta * th.theta * (sxx_a - 2.0 * th.mx * sx_a
        |        + ga.nad * th.mx * th.mx) AS syya,
        |    sy_b - th.theta * (sx_b - gb.nbd * th.mx) AS syb,
        |    syy_b - 2.0 * th.theta * (sxy_b - th.mx * sy_b) +
        |      th.theta * th.theta * (sxx_b - 2.0 * th.mx * sx_b
        |        + gb.nbd * th.mx * th.mx) AS syyb
        |  FROM ga, gb, th, nv),
        |ms AS (SELECT *, sya / nad AS ma, syb / nbd AS mb FROM ad),
        |vs AS (SELECT *, (syya - nad * ma * ma) / (nad - 1.0) AS s2a,
        |    (syyb - nbd * mb * mb) / (nbd - 1.0) AS s2b FROM ms),
        |w AS (SELECT *, s2a / nad AS vna, s2b / nbd AS vnb,
        |    (s2a / nad) + (s2b / nbd) AS se2 FROM vs)
        |SELECT n_variants, 'A' AS variant_a, 'B' AS variant_b, n_a, n_b,
        |  theta, rho2,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN ma END AS mean_adj_a,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN mb END AS mean_adj_b,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN s2a END AS var_adj_a,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN s2b END AS var_adj_b,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN (ma - mb) / sqrt(se2) END AS t,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |    AND se2 > 0.0 THEN (se2 * se2) /
        |    ((vna * vna) / (nad - 1.0) + (vnb * vnb) / (nbd - 1.0))
        |  END AS dof
        |FROM w""".stripMargin,
    "q_ab_mantel_haenszel" ->
      // per-(stratum, variant) integer cells, per-stratum doubles
      // stated once and mapped through the 2^20 fixed-point image,
      // exact BIGINT cross-stratum sums, the two finishing divisions
      """WITH ev AS (SELECT event_type AS stratum,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    (CAST(value AS DOUBLE) > 34.0) AS conv
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL),
        |cells AS (SELECT stratum, variant,
        |    CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS succ,
        |    CAST(sum(CASE WHEN conv THEN 0 ELSE 1 END) AS BIGINT) AS fail
        |  FROM ev GROUP BY 1, 2),
        |allst AS (SELECT CAST(count(DISTINCT stratum) AS BIGINT)
        |    AS tot_strata FROM cells),
        |sa AS (SELECT stratum, succ AS a, fail AS b FROM cells
        |  WHERE variant = 'A'),
        |sb AS (SELECT stratum, succ AS c, fail AS d FROM cells
        |  WHERE variant = 'B'),
        |j AS (SELECT sa.stratum, a, b, c, d, a + b + c + d AS n
        |  FROM sa JOIN sb USING (stratum)),
        |u AS (SELECT *, CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
        |    CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM j WHERE n >= 2),
        |terms AS (SELECT stratum, n, a,
        |    CAST(floor(((ad + bd) * (ad + cd) / nd) * 1048576.0 + 0.5)
        |      AS BIGINT) AS e_fx,
        |    CAST(floor(((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd) /
        |        (nd * nd * (nd - 1.0))) * 1048576.0 + 0.5)
        |      AS BIGINT) AS v_fx,
        |    CAST(floor((ad * dd / nd) * 1048576.0 + 0.5) AS BIGINT)
        |      AS ad_fx,
        |    CAST(floor((bd * cd / nd) * 1048576.0 + 0.5) AS BIGINT)
        |      AS bc_fx
        |  FROM u),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(sum(a) AS BIGINT) AS sum_a,
        |    CAST(sum(e_fx) AS BIGINT) AS se_fx,
        |    CAST(sum(v_fx) AS BIGINT) AS sv_fx,
        |    CAST(sum(ad_fx) AS BIGINT) AS sad_fx,
        |    CAST(sum(bc_fx) AS BIGINT) AS sbc_fx
        |  FROM terms),
        |fin AS (SELECT n_strata, tot_strata - n_strata AS n_skipped,
        |    n_total, sum_a, CAST(sum_a AS DOUBLE) AS sum_ad,
        |    CAST(se_fx AS DOUBLE) / 1048576.0 AS sum_e,
        |    CAST(sv_fx AS DOUBLE) / 1048576.0 AS sum_v,
        |    CAST(sad_fx AS DOUBLE) / 1048576.0 AS sum_adn,
        |    CAST(sbc_fx AS DOUBLE) / 1048576.0 AS sum_bcn
        |  FROM tt, allst)
        |SELECT n_strata, n_skipped, n_total, sum_a,
        |  CASE WHEN n_strata >= 1 THEN sum_e END AS expected_a,
        |  CASE WHEN n_strata >= 1 THEN sum_v END AS variance,
        |  CASE WHEN n_strata >= 1 AND sum_v > 0.0 THEN
        |    (sum_ad - sum_e) * (sum_ad - sum_e) / sum_v END AS chi2,
        |  CASE WHEN n_strata >= 1 AND sum_bcn > 0.0 THEN
        |    sum_adn / sum_bcn END AS or_mh
        |FROM fin""".stripMargin,
    "q_corr_kendall" ->
      // bounded cell grid, marginal tie terms, one cell self-join on
      // x1 < x2, the undivided-pair identity τ = 2(C−D)/√((P−Tx)(P−Ty))
      """WITH src AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_linenumber AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_linenumber IS NOT NULL),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM src GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells FROM cells),
        |mx AS (SELECT CAST(sum(CAST(cx AS DECIMAL(38,0)) *
        |      CAST(cx - 1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tx2
        |  FROM (SELECT CAST(sum(c) AS BIGINT) AS cx FROM cells
        |        GROUP BY x)),
        |my AS (SELECT CAST(sum(CAST(cy AS DECIMAL(38,0)) *
        |      CAST(cy - 1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ty2
        |  FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells
        |        GROUP BY y)),
        |pr AS (SELECT
        |    CAST(sum(CASE WHEN a.y < b.y THEN
        |      CAST(a.c AS DECIMAL(38,0)) * CAST(b.c AS DECIMAL(38,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS conc,
        |    CAST(sum(CASE WHEN a.y > b.y THEN
        |      CAST(a.c AS DECIMAL(38,0)) * CAST(b.c AS DECIMAL(38,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS disc
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |f AS (SELECT n, n_cells, conc, disc, tx2, ty2,
        |    CAST(CAST(n AS DECIMAL(38,0)) *
        |      CAST(n - 1 AS DECIMAL(38,0)) - tx2 AS DOUBLE) AS dx,
        |    CAST(CAST(n AS DECIMAL(38,0)) *
        |      CAST(n - 1 AS DECIMAL(38,0)) - ty2 AS DOUBLE) AS dy,
        |    CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE) AS num
        |  FROM tot, mx, my, pr)
        |SELECT n, n_cells, CAST(conc AS BIGINT) AS concordant,
        |  CAST(disc AS BIGINT) AS discordant,
        |  CAST(tx2 / 2 AS BIGINT) AS ties_x,
        |  CAST(ty2 / 2 AS BIGINT) AS ties_y,
        |  CASE WHEN dx > 0.0 AND dy > 0.0 THEN
        |    CAST(2.0 AS DOUBLE) * num / sqrt(dx * dy) END AS tau_b
        |FROM f""".stripMargin,
    "q_stream_sprt" ->
      // batch-mode statefulSprt: whole-history prefix LLRs per key in
      // event_id order, the gate's exact interpolated ln constants,
      // first-crossing latch, final totals for the emitted llr
      s"""WITH e AS (SELECT event_type AS key,
         |    CAST(event_id AS BIGINT) AS seq,
         |    (CAST(value AS DOUBLE) > 34.0) AS s
         |  FROM events WHERE event_type IS NOT NULL
         |    AND event_id IS NOT NULL AND value IS NOT NULL),
         |cum AS (SELECT key, seq,
         |    CAST(row_number() OVER (PARTITION BY key ORDER BY seq ASC)
         |      AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY key ORDER BY seq ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS k
         |  FROM e),
         |lr AS (SELECT key, seq, n, k,
         |    CAST(k AS DOUBLE) * CAST($sprtC1 AS DOUBLE) +
         |      CAST(n - k AS DOUBLE) * CAST($sprtC0 AS DOUBLE) AS llr
         |  FROM cum),
         |agg AS (SELECT key, CAST(max(n) AS BIGINT) AS trials,
         |    CAST(max(k) AS BIGINT) AS successes,
         |    max_by(llr, seq) AS llr,
         |    min(CASE WHEN llr >= CAST($sprtUp AS DOUBLE) THEN seq END)
         |      AS up_s,
         |    min(CASE WHEN llr <= CAST($sprtLo AS DOUBLE) THEN seq END)
         |      AS lo_s
         |  FROM lr GROUP BY key)
         |SELECT key, trials, successes, llr,
         |  CASE WHEN up_s IS NOT NULL AND (lo_s IS NULL OR up_s <= lo_s)
         |      THEN 'accept_h1'
         |    WHEN lo_s IS NOT NULL THEN 'accept_h0'
         |    ELSE 'continue' END AS decision,
         |  CASE WHEN up_s IS NOT NULL AND (lo_s IS NULL OR up_s <= lo_s)
         |    THEN up_s ELSE lo_s END AS decision_seq
         |FROM agg ORDER BY key ASC""".stripMargin,
    "q_fdr_by" ->
      // the q_fdr_bh machinery with the Benjamini–Yekutieli harmonic
      // penalty c(m) folded ascending over 1..m (pinned association)
      """WITH t AS (SELECT event_type || '_' ||
        |    CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      % 7) AS VARCHAR) AS test_id,
        |    CAST((sum(user_id) % 9973) + 1 AS DOUBLE) / 10000.0
        |      AS p_value
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1),
        |r AS (SELECT test_id, p_value,
        |    CAST(row_number() OVER (ORDER BY p_value ASC, test_id ASC)
        |      AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m FROM t),
        |c AS (SELECT *, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, m + 1),
        |      i -> CAST(1.0 AS DOUBLE) / CAST(i AS DOUBLE))),
        |    (a, b) -> a + b) AS cm FROM r),
        |a AS (SELECT *, cm * CAST(m AS DOUBLE) * p_value /
        |    CAST(rank AS DOUBLE) AS raw FROM c),
        |s AS (SELECT *, min(raw) OVER (ORDER BY p_value DESC,
        |    test_id DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS sufmin FROM a)
        |SELECT test_id, p_value, rank, least(1.0, sufmin) AS p_adj,
        |  least(1.0, sufmin) <= 0.2 AS reject
        |FROM s ORDER BY rank ASC""".stripMargin,
    "q_trend_holtwinters" ->
      // three-state recursion with the ROTATING seasonal list →
      // RECURSIVE CTE stepping the sorted index; nl restated inline
      // where nb/ns need it (deterministic repetition, the holt rule);
      // complements as subtractions; n<2p groups answer NULL states
      """WITH RECURSIVE dc AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    list(x ORDER BY t) AS xs
        |  FROM dc GROUP BY g),
        |init AS (SELECT g, n, xs,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs[1:7]),
        |      (a, b) -> a + b) / 7.0 AS l0,
        |    (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs[8:14]),
        |        (a, b) -> a + b)
        |      - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs[1:7]),
        |        (a, b) -> a + b)) / 49.0 AS b0
        |  FROM p WHERE n >= 14),
        |it AS (
        |  SELECT g, n, xs, CAST(14 AS BIGINT) AS i, l0 AS l,
        |    b0 AS b, list_transform(xs[1:7], x -> x - l0) AS s
        |  FROM init
        |  UNION ALL
        |  SELECT g, n, xs, i + 1,
        |    CAST(0.4 AS DOUBLE) * (xs[i + 1] - s[1]) +
        |      (CAST(1.0 AS DOUBLE) - CAST(0.4 AS DOUBLE)) * (l + b),
        |    CAST(0.2 AS DOUBLE) *
        |      ((CAST(0.4 AS DOUBLE) * (xs[i + 1] - s[1]) +
        |        (CAST(1.0 AS DOUBLE) - CAST(0.4 AS DOUBLE)) * (l + b))
        |       - l) +
        |      (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * b,
        |    list_concat(s[2:7],
        |      [CAST(0.3 AS DOUBLE) * (xs[i + 1] -
        |        (CAST(0.4 AS DOUBLE) * (xs[i + 1] - s[1]) +
        |          (CAST(1.0 AS DOUBLE) - CAST(0.4 AS DOUBLE)) * (l + b)))
        |        + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * s[1]])
        |  FROM it WHERE i < n)
        |SELECT g AS "group", n, l AS level, b AS trend,
        |  s[1] AS season_next, l + 7.0 * b + s[7] AS forecast
        |FROM it WHERE i = n
        |UNION ALL
        |SELECT g AS "group", n, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |FROM p WHERE n < 14
        |ORDER BY "group" ASC""".stripMargin,
    "q_ab_sprt" ->
      // integer prefix sums over the per-group day grid; the four ln
      // constants are the gate's DRIVER-COMPUTED literals interpolated
      // in (JVM Math.log vs DuckDB libm differ in the last ulp, and
      // the cumulative-k multiplier amplifies it); first-crossing
      // selection — the gate's algebra
      s"""WITH grid AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN CAST(value AS DOUBLE) > 34.0 THEN 1
        |      ELSE 0 END) AS BIGINT) AS k
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |cum AS (SELECT g, t,
        |    sum(n) OVER (PARTITION BY g ORDER BY t ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    sum(k) OVER (PARTITION BY g ORDER BY t ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
        |  FROM grid),
        |lr AS (SELECT g, t, cn, ck,
        |    CAST(ck AS DOUBLE) * CAST($sprtC1 AS DOUBLE) +
        |      CAST(cn - ck AS DOUBLE) * CAST($sprtC0 AS DOUBLE) AS llr
        |  FROM cum),
        |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_t,
        |    CAST(max(cn) AS BIGINT) AS trials,
        |    CAST(max(ck) AS BIGINT) AS successes,
        |    max_by(llr, t) AS llr_final,
        |    min(CASE WHEN llr >= CAST($sprtUp AS DOUBLE) THEN t END)
        |      AS up_t,
        |    min(CASE WHEN llr <= CAST($sprtLo AS DOUBLE) THEN t END)
        |      AS lo_t
        |  FROM lr GROUP BY g)
        |SELECT g AS "group", n_t, trials, successes, llr_final,
        |  CASE WHEN up_t IS NOT NULL AND (lo_t IS NULL OR up_t <= lo_t)
        |      THEN 'accept_h1'
        |    WHEN lo_t IS NOT NULL THEN 'accept_h0'
        |    ELSE 'continue' END AS decision,
        |  CASE WHEN up_t IS NOT NULL AND (lo_t IS NULL OR up_t <= lo_t)
        |    THEN up_t ELSE lo_t END AS decision_t
        |FROM agg ORDER BY "group" ASC""".stripMargin,
    "q_ab_quantile_shift" ->
      // exact per-variant order statistics at k = max(1, ceil(q·n))
      // with the user_id tiebreak, A/B pivot, one stated subtraction
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0
        |      AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |s AS (SELECT variant, revenue, user_id,
        |    row_number() OVER (PARTITION BY variant
        |      ORDER BY revenue, user_id) AS rk,
        |    count(*) OVER (PARTITION BY variant) AS n
        |  FROM u),
        |qv AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE)
        |    AS q),
        |hits AS (SELECT variant, q, revenue FROM s JOIN qv
        |  ON s.rk = GREATEST(1, CAST(ceil(q * n) AS BIGINT))),
        |a AS (SELECT q, revenue AS value_a FROM hits
        |  WHERE variant = 'A'),
        |b AS (SELECT q, revenue AS value_b FROM hits
        |  WHERE variant = 'B')
        |SELECT a.q, 'A' AS variant_a, 'B' AS variant_b,
        |  CAST(a.value_a AS DOUBLE) AS value_a,
        |  CAST(b.value_b AS DOUBLE) AS value_b,
        |  CAST(a.value_a AS DOUBLE) - CAST(b.value_b AS DOUBLE) AS shift
        |FROM a JOIN b USING (q) ORDER BY a.q ASC""".stripMargin,
    "q_trend_ols" ->
      // per-group 6-sum fixed-point pass over the exact daily-revenue
      // grid, then the gate's finishing sequence: centered moments,
      // slope/intercept/R², MSE and the slope t — each double op once
      """WITH dser AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS t,
        |    CAST(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0 AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(CAST(t AS DOUBLE) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS s_t,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0)))
        |      AS s_x,
        |    sum(CAST(floor((CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
        |      * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s_tt,
        |    sum(CAST(floor((x * x) * 1048576.0 + 0.5) AS DECIMAL(38,0)))
        |      AS s_xx,
        |    sum(CAST(floor((CAST(t AS DOUBLE) * x) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS s_tx
        |  FROM dser GROUP BY g),
        |f AS (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    (CAST(s_t AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE) AS mt,
        |    (CAST(s_x AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE) AS mx,
        |    CAST(s_tt AS DOUBLE) / 1048576.0 AS std,
        |    CAST(s_xx AS DOUBLE) / 1048576.0 AS sxd,
        |    CAST(s_tx AS DOUBLE) / 1048576.0 AS stxd
        |  FROM m),
        |ce AS (SELECT *, std - nd * mt * mt AS ctt,
        |    sxd - nd * mx * mx AS cxx,
        |    stxd - nd * mt * mx AS ctx FROM f),
        |sl AS (SELECT *, CASE WHEN ctt > 0.0 THEN ctx / ctt END AS slope
        |  FROM ce),
        |ms AS (SELECT *, CASE WHEN n >= 3 AND ctt > 0.0 THEN
        |    (cxx - slope * ctx) / (nd - 2.0) END AS mse FROM sl)
        |SELECT g AS "group", n, slope,
        |  CASE WHEN ctt > 0.0 THEN mx - slope * mt END AS intercept,
        |  CASE WHEN ctt > 0.0 AND cxx > 0.0 THEN
        |    (ctx * ctx) / (ctt * cxx) END AS r2,
        |  CASE WHEN n >= 3 AND ctt > 0.0 AND mse > 0.0 THEN
        |    sqrt(mse / ctt) END AS se_slope,
        |  CASE WHEN n >= 3 AND ctt > 0.0 AND mse > 0.0 THEN
        |    slope / sqrt(mse / ctt) END AS t_stat
        |FROM ms ORDER BY "group" ASC""".stripMargin)
}
