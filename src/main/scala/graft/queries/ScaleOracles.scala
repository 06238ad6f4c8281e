package graft.queries

/** DuckDB oracle SQL for the scale-operator gates. Parity notes: epoch()
  * returns DOUBLE, so the second index is floor(epoch(ts)) cast BIGINT
  * (Spark: timestamp cast to long truncates, equal for positive epochs);
  * integer sums are cast BIGINT (DuckDB HUGEINT → pandas float64
  * otherwise); double sums route through DECIMAL. */
object ScaleOracles {
  private val purchases =
    """SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |       max(value) AS purchase_value
      |FROM events WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin
  private val eventsSec =
    """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |FROM events""".stripMargin

  /** The logistic-training replay shared by q_quality_lr*: engineered
    * features, then three gradient-descent iterations with fixed-point
    * gradient sums — each g(k)/w(k) pair states EXACTLY the arithmetic
    * of QualityModel.trainLogistic's k-th pass (σ through libm exp,
    * pinned ((w0 + w1·x1) + w2·x2) association, floor(t·2^20 + 0.5)
    * gradient terms, w − ((G/2^20)/n) updates). */
  private def lrIter(k: Int, prev: String): String =
    s"""g$k AS (SELECT
       |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * 1.0) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS ga,
       |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gb,
       |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gc
       |  FROM f, $prev),
       |w$k AS (SELECT
       |  wa - ((CAST(ga AS DOUBLE) / 1048576.0) / nn.n) AS wa,
       |  wb - ((CAST(gb AS DOUBLE) / 1048576.0) / nn.n) AS wb,
       |  wc - ((CAST(gc AS DOUBLE) / 1048576.0) / nn.n) AS wc
       |  FROM g$k, $prev, nn),
       |""".stripMargin

  private val lrOraclePrefix: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> t <> '')) AS DOUBLE) / 100.0 AS x2,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      |  FROM documents
      |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
      |w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
      |""".stripMargin +
      (lrIter(1, "w0") + lrIter(2, "w1") + lrIter(3, "w2"))
        .stripSuffix(",\n") + "\n"

  def oracleSql: Map[String, String] = Map(
    "q_join_asof" ->
      s"""WITH p AS ($purchases), e AS ($eventsSec)
         |SELECT e.event_id, p.purchase_value
         |FROM e ASOF LEFT JOIN p
         |  ON e.user_id = p.user_id AND e.sec >= p.sec
         |ORDER BY e.event_id""".stripMargin,
    "q_join_asof_fwd" ->
      s"""WITH p AS ($purchases), e AS ($eventsSec)
         |SELECT e.event_id,
         |  CASE WHEN p.sec - e.sec <= 3600 THEN p.purchase_value END AS purchase_value
         |FROM e ASOF LEFT JOIN p
         |  ON e.user_id = p.user_id AND e.sec <= p.sec
         |ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT c.c_custkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM orders o
        |JOIN (SELECT c_custkey, c_acctbal * 10 AS lo, c_acctbal * 10 + 5000 AS hi
        |      FROM customer WHERE c_custkey <= 50 AND c_acctbal > 0) c
        |  ON o.o_totalprice BETWEEN c.lo AND c.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling" ->
      """SELECT event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_sum
        |FROM (SELECT event_id, user_id, value,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_group_dynamic" ->
      """SELECT event_type,
        |  CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 900) AS BIGINT) * 900 AS bucket_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, 'p_size_d' AS variable, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS variable, p_retailprice AS value
        |FROM part
        |ORDER BY p_partkey, variable""".stripMargin,
    "q_row_index" ->
      """SELECT c_custkey,
        |  CAST(row_number() OVER (ORDER BY c_acctbal ASC, c_custkey ASC) - 1 AS BIGINT) AS idx
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_interpolate" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        |  FROM events),
        |s AS (
        |  SELECT event_id, v,
        |    last_value(v IGNORE NULLS) OVER wb AS prev_v,
        |    last_value(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS) OVER wb AS prev_x,
        |    first_value(v IGNORE NULLS) OVER wf AS next_v,
        |    first_value(CASE WHEN v IS NOT NULL THEN CAST(event_id AS DOUBLE) END IGNORE NULLS) OVER wf AS next_x
        |  FROM e
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY event_id ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY event_id ASC
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE prev_v + (next_v - prev_v) * (CAST(event_id AS DOUBLE) - prev_x) / (next_x - prev_x)
        |  END AS vi
        |FROM s ORDER BY event_id""".stripMargin,
    "q_pivot" ->
      // nullif: Spark's pivot yields NULL for an absent (status, priority)
      // combination where a conditional count would yield 0
      """SELECT o_orderstatus,
        |  nullif(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0)
        |    AS "1-URGENT",
        |  nullif(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0)
        |    AS "2-HIGH",
        |  nullif(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0)
        |    AS "3-MEDIUM",
        |  nullif(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0)
        |    AS "4-NOT SPECIFIED",
        |  nullif(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0)
        |    AS "5-LOW"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_join" ->
      """WITH dim AS (
        |  SELECT o_orderpriority, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, count(*) AS n, max(d.n_orders) AS n_orders
        |FROM orders o JOIN dim d USING (o_orderpriority)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_exact_quantiles" ->
      """WITH s AS (
        |  SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |n AS (SELECT count(*) AS c FROM documents),
        |qk AS (
        |  -- CAST the unnested literals: a DuckDB decimal q would compare
        |  -- as Decimal vs Spark's double and quantize k differently
        |  SELECT CAST(q AS DOUBLE) AS q,
        |    GREATEST(1, CAST(ceil(CAST(q AS DOUBLE) * c) AS BIGINT)) AS k
        |  FROM (SELECT unnest([0.25, 0.5, 0.9, 0.95, 0.99]) AS q), n)
        |SELECT qk.q AS q, s.n_chars AS value
        |FROM qk JOIN s ON s.rk = qk.k ORDER BY q""".stripMargin,
    "q_resample" ->
      """WITH a AS (SELECT event_type,
        |    CAST(floor(epoch(ts)/21600) AS BIGINT)*21600 AS bucket_epoch,
        |    count(*) AS n0, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(bucket_epoch) AS mn, max(bucket_epoch) AS mx FROM a),
        |k AS (SELECT DISTINCT event_type FROM events),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, 21600)) AS bucket_epoch
        |      FROM k, b),
        |j AS (SELECT g.event_type, g.bucket_epoch, coalesce(a.n0, 0) AS n, a.s
        |      FROM g LEFT JOIN a USING (event_type, bucket_epoch))
        |SELECT event_type, bucket_epoch, n,
        |  last_value(s IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY bucket_epoch
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_sum
        |FROM j ORDER BY event_type, bucket_epoch""".stripMargin,
    "q_robust_z" ->
      """WITH s AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk FROM documents),
        |n AS (SELECT count(*) AS c FROM documents),
        |m AS (SELECT n_chars AS median FROM s, n
        |      WHERE rk = GREATEST(1, CAST(ceil(0.5e0 * c) AS BIGINT))),
        |d0 AS (SELECT abs(CAST(n_chars AS DOUBLE) - CAST(median AS DOUBLE)) AS dv,
        |         doc_id
        |       FROM documents, m),
        |s2 AS (SELECT dv, row_number() OVER (ORDER BY dv, doc_id) AS rk FROM d0),
        |md AS (SELECT dv AS mad FROM s2, n
        |       WHERE rk = GREATEST(1, CAST(ceil(0.5e0 * c) AS BIGINT)))
        |SELECT doc_id, n_chars,
        |  CASE WHEN mad <> 0.0 THEN
        |    (CAST(n_chars AS DOUBLE) - CAST(median AS DOUBLE)) / mad END AS robust_z
        |FROM documents, m, md ORDER BY doc_id""".stripMargin,
    "q_transition_matrix" ->
      """WITH t AS (SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cohort_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
        |j AS (SELECT f.user_id, cw, aw FROM f JOIN a USING (user_id)
        |      WHERE aw >= cw)
        |SELECT CAST(epoch(cw) AS BIGINT) AS cohort_epoch,
        |  CAST(date_diff('day', cw, aw) / 7 AS INTEGER) AS week_offset,
        |  count(*) AS users
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts >= s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts >= s2.t GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts >= s3.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'signup' AS event_type, (SELECT count(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
        |ORDER BY step""".stripMargin,
    "q_median_mad" ->
      """WITH s AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk FROM documents),
        |n AS (SELECT count(*) AS c FROM documents),
        |m AS (SELECT n_chars AS median FROM s, n
        |      WHERE rk = GREATEST(1, CAST(ceil(0.5e0 * c) AS BIGINT))),
        |d AS (SELECT abs(CAST(n_chars AS DOUBLE) - CAST(median AS DOUBLE)) AS dv,
        |        doc_id
        |      FROM documents, m),
        |s2 AS (SELECT dv, row_number() OVER (ORDER BY dv, doc_id) AS rk FROM d)
        |SELECT (SELECT median FROM m) AS median,
        |       (SELECT dv FROM s2, n
        |        WHERE rk = GREATEST(1, CAST(ceil(0.5e0 * c) AS BIGINT))) AS mad""".stripMargin,
    "q_winsorize_grouped" ->
      """WITH s AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY lang) AS c
        |  FROM documents WHERE n_chars IS NOT NULL),
        |b AS (SELECT lang,
        |    min(CASE WHEN rk = GREATEST(1, CAST(ceil(0.1e0 * c) AS BIGINT))
        |      THEN n_chars END) AS lo,
        |    min(CASE WHEN rk = GREATEST(1, CAST(ceil(0.9e0 * c) AS BIGINT))
        |      THEN n_chars END) AS hi
        |  FROM s GROUP BY lang)
        |SELECT d.doc_id, d.lang,
        |  CASE WHEN d.n_chars < b.lo THEN b.lo
        |       WHEN d.n_chars > b.hi THEN b.hi
        |       ELSE d.n_chars END AS n_chars
        |FROM documents d LEFT JOIN b ON d.lang IS NOT DISTINCT FROM b.lang
        |ORDER BY d.doc_id""".stripMargin,
    "q_winsorize" ->
      """WITH s AS (
        |  SELECT n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |n AS (SELECT count(*) AS c FROM documents),
        |b AS (SELECT
        |  (SELECT n_chars FROM s, n
        |   WHERE rk = GREATEST(1, CAST(ceil(0.05e0 * c) AS BIGINT))) AS lo,
        |  (SELECT n_chars FROM s, n
        |   WHERE rk = GREATEST(1, CAST(ceil(0.95e0 * c) AS BIGINT))) AS hi)
        |SELECT doc_id, GREATEST(LEAST(n_chars, hi), lo) AS n_chars
        |FROM documents, b ORDER BY doc_id""".stripMargin,
    "q_select_budget" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id ASC)
        |      AS BIGINT) AS cum
        |  FROM documents)
        |SELECT doc_id, n_chars, cum FROM c
        |WHERE cum - n_chars < 100000 ORDER BY cum""".stripMargin,
    "q_select_budget_group" ->
      """WITH c AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents)
        |SELECT lang, doc_id, n_chars, cum FROM c
        |WHERE cum - n_chars < 30000 ORDER BY lang, cum""".stripMargin,
    "q_group_quantiles" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
        |SELECT lang, q, n_chars AS value
        |FROM s JOIN qv ON s.rk = GREATEST(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY lang, q""".stripMargin,
    "q_join_bucketed" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk_group" ->
      """SELECT o_orderstatus, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderstatus
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderstatus, rk""".stripMargin,
    "q_merge_sorted" ->
      """SELECT c_custkey, c_acctbal FROM (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 1)
        |ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC""".stripMargin,
    "q_group_quantiles_hot" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
        |SELECT lang, q, n_chars AS value
        |FROM s JOIN qv ON s.rk = GREATEST(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY lang, q""".stripMargin,
    "q_quantile_sketch" ->
      """WITH b AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT unnest(generate_series(0, 65)) AS bin),
        |d AS (SELECT g.bin, coalesce(c.cnt, 0) AS cnt FROM g LEFT JOIN c USING (bin)),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM d),
        |qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
        |kk AS (SELECT q, GREATEST(1, CAST(ceil(q * n) AS BIGINT)) AS k FROM qv, nn),
        |hit AS (SELECT q, min(bin) AS idx FROM kk JOIN cum ON cum.cum >= kk.k GROUP BY q)
        |SELECT q, CASE WHEN idx <= 0 THEN 0.0 WHEN idx >= 65 THEN 640.0
        |            ELSE 0.0 + CAST(idx - 1 AS DOUBLE) * 10.0 END AS value
        |FROM hit ORDER BY q""".stripMargin,
    "q_log_quantile_sketch" ->
      // identical arithmetic to Report.logQuantileSketch: x <= 0 counts
      // in the underflow tail; otherwise the fixed-grid bin of ln(x)
      // over [ln 1, ln 1024) with the same ((lnx - lo) * bins) / span
      // parenthesization; the quantile decode exponentiates the
      // grid-space lower edge (libm exp on both engines)
      """WITH b AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) <= 0.0 THEN 0
        |              WHEN ln(CAST(n_chars AS DOUBLE)) < 0.0 THEN 0
        |              WHEN ln(CAST(n_chars AS DOUBLE)) >= ln(1024.0) THEN 65
        |              ELSE LEAST(64, CAST(floor(((ln(CAST(n_chars AS DOUBLE)) - 0.0)
        |                * 64.0) / (ln(1024.0) - 0.0)) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT unnest(generate_series(0, 65)) AS bin),
        |d AS (SELECT g.bin, coalesce(c.cnt, 0) AS cnt FROM g LEFT JOIN c USING (bin)),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM d),
        |qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
        |kk AS (SELECT q, GREATEST(1, CAST(ceil(q * n) AS BIGINT)) AS k FROM qv, nn),
        |hit AS (SELECT q, min(bin) AS idx FROM kk JOIN cum ON cum.cum >= kk.k GROUP BY q)
        |SELECT q, CASE WHEN idx <= 0 THEN exp(0.0) WHEN idx >= 65 THEN exp(ln(1024.0))
        |            ELSE exp(0.0 + CAST(idx - 1 AS DOUBLE)
        |              * ((ln(1024.0) - 0.0) / CAST(64 AS DOUBLE))) END AS value
        |FROM hit ORDER BY q""".stripMargin,
    "q_quantile_sketch_grouped" ->
      """WITH b AS (
        |  SELECT lang,
        |         CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT lang, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |nn AS (SELECT lang, count(*) AS n FROM b GROUP BY 1),
        |g AS (SELECT lang, unnest(generate_series(0, 65)) AS bin
        |      FROM (SELECT DISTINCT lang FROM b)),
        |d AS (SELECT g.lang, g.bin, coalesce(c.cnt, 0) AS cnt
        |      FROM g LEFT JOIN c ON g.lang = c.lang AND g.bin = c.bin),
        |cum AS (SELECT lang, bin,
        |          sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
        |        FROM d),
        |qv AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q),
        |kk AS (SELECT lang, q, GREATEST(1, CAST(ceil(q * n) AS BIGINT)) AS k
        |       FROM nn, qv),
        |hit AS (SELECT kk.lang, q, min(bin) AS idx
        |        FROM kk JOIN cum ON cum.lang = kk.lang AND cum.cum >= kk.k
        |        GROUP BY 1, 2)
        |SELECT lang, q, CASE WHEN idx <= 0 THEN 0.0 WHEN idx >= 65 THEN 640.0
        |            ELSE 0.0 + CAST(idx - 1 AS DOUBLE) * 10.0 END AS value
        |FROM hit ORDER BY lang, q""".stripMargin,
    "q_distribution_drift" ->
      // identical arithmetic to Report.sketchDrift: fixed-grid bins over
      // [0, 512) ×64, Jeffreys +0.5/cell smoothing for PSI, raw-proportion
      // ECDF fold for KS, raw-proportion TVD — every fold in bin order
      """WITH ba AS (
        |  SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(value AS DOUBLE) >= 512.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(value AS DOUBLE) - 0.0)
        |                * 64.0) / 512.0) AS BIGINT) + 1) END AS bin
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |bb AS (
        |  SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(value AS DOUBLE) >= 512.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(value AS DOUBLE) - 0.0)
        |                * 64.0) / 512.0) AS BIGINT) + 1) END AS bin
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
        |ca_ AS (SELECT bin, count(*) AS c FROM ba GROUP BY 1),
        |cb_ AS (SELECT bin, count(*) AS c FROM bb GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 65)) AS bin),
        |dd AS (SELECT g.bin, coalesce(ca_.c, 0) AS ca, coalesce(cb_.c, 0) AS cb
        |       FROM g LEFT JOIN ca_ USING (bin) LEFT JOIN cb_ USING (bin)),
        |nn AS (SELECT (SELECT count(*) FROM ba) AS na,
        |              (SELECT count(*) FROM bb) AS nb),
        |terms AS (SELECT bin, ca, cb, na, nb,
        |    (CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5 * 66.0) AS pa,
        |    (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5 * 66.0) AS pb
        |  FROM dd, nn),
        |cum AS (SELECT bin, na, nb,
        |    sum(ca) OVER (ORDER BY bin) AS cca,
        |    sum(cb) OVER (ORDER BY bin) AS ccb FROM terms),
        |ksv AS (SELECT max(abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks FROM cum),
        |agg AS (SELECT
        |    list((pa - pb) * ln(pa / pb) ORDER BY bin) AS psiterms,
        |    list(abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) ORDER BY bin) AS tvdterms,
        |    max(na) AS na, max(nb) AS nb FROM terms)
        |SELECT
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE), psiterms),
        |    (x, y) -> x + y) AS psi,
        |  (SELECT ks FROM ksv) AS ks,
        |  0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE), tvdterms),
        |    (x, y) -> x + y) AS tvd,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM agg""".stripMargin,
    "q_distribution_drift_grouped" ->
      """WITH ba AS (
        |  SELECT lang, CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
        |bb AS (
        |  SELECT lang, CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL),
        |langs AS (SELECT DISTINCT lang FROM ba
        |          INTERSECT SELECT DISTINCT lang FROM bb),
        |ca_ AS (SELECT lang, bin, count(*) AS c FROM ba GROUP BY 1, 2),
        |cb_ AS (SELECT lang, bin, count(*) AS c FROM bb GROUP BY 1, 2),
        |g AS (SELECT lang, unnest(generate_series(0, 65)) AS bin FROM langs),
        |dd AS (SELECT g.lang, g.bin, coalesce(ca_.c, 0) AS ca,
        |         coalesce(cb_.c, 0) AS cb
        |       FROM g LEFT JOIN ca_ USING (lang, bin)
        |              LEFT JOIN cb_ USING (lang, bin)),
        |na_ AS (SELECT lang, count(*) AS na FROM ba GROUP BY 1),
        |nb_ AS (SELECT lang, count(*) AS nb FROM bb GROUP BY 1),
        |terms AS (SELECT dd.lang, bin, ca, cb, na, nb,
        |    (CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5 * 66.0) AS pa,
        |    (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5 * 66.0) AS pb
        |  FROM dd JOIN na_ USING (lang) JOIN nb_ USING (lang)),
        |cum AS (SELECT lang, bin, na, nb,
        |    sum(ca) OVER (PARTITION BY lang ORDER BY bin) AS cca,
        |    sum(cb) OVER (PARTITION BY lang ORDER BY bin) AS ccb FROM terms),
        |ksv AS (SELECT lang, max(abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks
        |  FROM cum GROUP BY 1),
        |agg AS (SELECT lang,
        |    list((pa - pb) * ln(pa / pb) ORDER BY bin) AS psiterms,
        |    list(abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) ORDER BY bin) AS tvdterms,
        |    max(na) AS na, max(nb) AS nb FROM terms GROUP BY 1)
        |SELECT agg.lang,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE), psiterms),
        |    (x, y) -> x + y) AS psi,
        |  ksv.ks AS ks,
        |  0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE), tvdterms),
        |    (x, y) -> x + y) AS tvd,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM agg JOIN ksv ON agg.lang = ksv.lang ORDER BY agg.lang""".stripMargin,
    "q_moment_sketch" ->
      // identical arithmetic to momentSketch + momentStats: fixed-point
      // floor(x·2^20 + 0.5) codes, exact integer sums, (s/n)/2^20 decode
      """WITH fp AS (SELECT event_type,
        |    CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) AS v,
        |    CAST(floor(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
        |      * 1048576.0 + 0.5) AS BIGINT) AS vv
        |  FROM events WHERE value IS NOT NULL),
        |agg AS (SELECT event_type, count(*) AS n, sum(v) AS sx,
        |    sum(vv) AS sxx, min(v) AS mn, max(v) AS mx FROM fp GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0 AS mean,
        |  sqrt(greatest(0.0,
        |    (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0
        |    - ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0)
        |      * ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0)))
        |    AS std,
        |  CAST(mn AS DOUBLE) / 1048576.0 AS "min",
        |  CAST(mx AS DOUBLE) / 1048576.0 AS "max"
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_sketch_jsd" ->
      """WITH ba AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE n_chars IS NOT NULL AND doc_id % 2 = 0),
        |bb AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE n_chars IS NOT NULL AND doc_id % 2 = 1),
        |ca AS (SELECT bin, count(*) AS cnt FROM ba GROUP BY 1),
        |cb AS (SELECT bin, count(*) AS cnt FROM bb GROUP BY 1),
        |na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ba),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bb),
        |g AS (SELECT unnest(generate_series(0, 65)) AS bin),
        |z AS (SELECT g.bin, coalesce(ca.cnt, 0) AS ca, coalesce(cb.cnt, 0) AS cb
        |  FROM g LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
        |t AS (SELECT z.bin,
        |    CAST(z.ca AS DOUBLE) / CAST(na.n AS DOUBLE) AS p,
        |    CAST(z.cb AS DOUBLE) / CAST(nb.n AS DOUBLE) AS q,
        |    z.ca, z.cb
        |  FROM z, na, nb),
        |terms AS (SELECT bin,
        |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
        |     + CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
        |      AS term
        |  FROM t),
        |jj AS (SELECT 0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY bin)), (a, b) -> a + b) AS jsd FROM terms)
        |SELECT
        |  CAST(CAST(floor(jj.jsd * 1048576.0 + 0.5) AS BIGINT) AS DOUBLE)
        |    / 1048576.0 AS jsd,
        |  CAST(CAST(floor((jj.jsd / ln(2.0)) * 1048576.0 + 0.5) AS BIGINT)
        |    AS DOUBLE) / 1048576.0 AS jsd_norm,
        |  na.n AS n_a, nb.n AS n_b
        |FROM jj, na, nb""".stripMargin,
    "q_stream_jsd_monitor" ->
      """WITH e AS (SELECT
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
        |    CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
        |         WHEN CAST(value AS DOUBLE) >= 512.0 THEN 65
        |         ELSE LEAST(64, CAST(floor(((CAST(value AS DOUBLE) - 0.0)
        |           * 64.0) / 512.0) AS BIGINT) + 1) END AS bin
        |  FROM events WHERE value IS NOT NULL),
        |ca AS (SELECT h, bin, count(*) AS cnt FROM e GROUP BY 1, 2),
        |na AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |cb AS (SELECT bin, count(*) AS cnt FROM e GROUP BY 1),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        |g AS (SELECT na.h, gs.bin FROM na,
        |  (SELECT unnest(generate_series(0, 65)) AS bin) gs),
        |z AS (SELECT g.h, g.bin, coalesce(ca.cnt, 0) AS ca,
        |    coalesce(cb.cnt, 0) AS cb
        |  FROM g LEFT JOIN ca ON ca.h = g.h AND ca.bin = g.bin
        |  LEFT JOIN cb ON cb.bin = g.bin),
        |t AS (SELECT z.h, z.bin, z.ca, z.cb,
        |    CAST(z.ca AS DOUBLE) / CAST(na.n AS DOUBLE) AS p,
        |    CAST(z.cb AS DOUBLE) / CAST(nb.n AS DOUBLE) AS q
        |  FROM z JOIN na ON na.h = z.h, nb),
        |terms AS (SELECT h, bin,
        |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
        |     + CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
        |      AS term
        |  FROM t),
        |jj AS (SELECT h, 0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY bin)), (a, b) -> a + b) AS jsd
        |  FROM terms GROUP BY h)
        |SELECT jj.h AS hour_epoch,
        |  CAST(CAST(floor(jj.jsd * 1048576.0 + 0.5) AS BIGINT) AS DOUBLE)
        |    / 1048576.0 AS jsd,
        |  CAST(CAST(floor((jj.jsd / ln(2.0)) * 1048576.0 + 0.5) AS BIGINT)
        |    AS DOUBLE) / 1048576.0 AS jsd_norm,
        |  na.n AS n_a, nb.n AS n_b
        |FROM jj JOIN na ON na.h = jj.h, nb
        |ORDER BY hour_epoch ASC""".stripMargin,
    "q_stream_quantiles" ->
      // the streamed hourly log-sketch cells roll up BIT-EQUAL to the
      // whole-corpus sketch (integer cell counts, elementwise merge), so
      // the oracle is the corpus-wide binning + cumulative walk of
      // q_log_quantile_sketch stated over events.value
      """WITH b AS (
        |  SELECT CASE WHEN CAST(value AS DOUBLE) <= 0.0 THEN 0
        |              WHEN ln(CAST(value AS DOUBLE)) < 0.0 THEN 0
        |              WHEN ln(CAST(value AS DOUBLE)) >= ln(1024.0) THEN 65
        |              ELSE LEAST(64, CAST(floor(((ln(CAST(value AS DOUBLE)) - 0.0)
        |                * 64.0) / (ln(1024.0) - 0.0)) AS BIGINT) + 1) END AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM events WHERE value IS NOT NULL),
        |g AS (SELECT unnest(generate_series(0, 65)) AS bin),
        |d AS (SELECT g.bin, coalesce(c.cnt, 0) AS cnt FROM g LEFT JOIN c USING (bin)),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM d),
        |qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
        |kk AS (SELECT q, GREATEST(1, CAST(ceil(q * n) AS BIGINT)) AS k FROM qv, nn),
        |hit AS (SELECT q, min(bin) AS idx FROM kk JOIN cum ON cum.cum >= kk.k GROUP BY q)
        |SELECT q, CASE WHEN idx <= 0 THEN exp(0.0) WHEN idx >= 65 THEN exp(ln(1024.0))
        |            ELSE exp(0.0 + CAST(idx - 1 AS DOUBLE)
        |              * ((ln(1024.0) - 0.0) / CAST(64 AS DOUBLE))) END AS value
        |FROM hit ORDER BY q""".stripMargin,
    "q_stream_moments" ->
      """WITH fp AS (SELECT
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |    CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) AS v,
        |    CAST(floor(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
        |      * 1048576.0 + 0.5) AS BIGINT) AS vv
        |  FROM events WHERE value IS NOT NULL),
        |agg AS (SELECT hour_epoch, count(*) AS n, sum(v) AS sx,
        |    sum(vv) AS sxx, min(v) AS mn, max(v) AS mx FROM fp GROUP BY 1)
        |SELECT hour_epoch, CAST(n AS BIGINT) AS n,
        |  (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0 AS mean,
        |  sqrt(greatest(0.0,
        |    (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0
        |    - ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0)
        |      * ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 1048576.0)))
        |    AS std,
        |  CAST(mn AS DOUBLE) / 1048576.0 AS "min",
        |  CAST(mx AS DOUBLE) / 1048576.0 AS "max"
        |FROM agg ORDER BY hour_epoch""".stripMargin,
    "q_embedding_drift" ->
      // identical arithmetic to Report.embeddingSketch + embeddingDrift:
      // fixed-point floor(x·2^20 + 0.5) longs, (s/n)/2^20 means,
      // dimension-ordered folds for dot/norm/L2, order-free max
      """WITH sa AS (SELECT i,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings CROSS JOIN
        |    (SELECT unnest(generate_series(1, 64)) AS i) g
        |  WHERE vec_id % 2 = 0 AND embedding IS NOT NULL GROUP BY i),
        |sb AS (SELECT i,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings CROSS JOIN
        |    (SELECT unnest(generate_series(1, 64)) AS i) g
        |  WHERE vec_id % 2 = 1 AND embedding IS NOT NULL GROUP BY i),
        |na AS (SELECT count(*) AS n FROM embeddings
        |       WHERE vec_id % 2 = 0 AND embedding IS NOT NULL),
        |nb AS (SELECT count(*) AS n FROM embeddings
        |       WHERE vec_id % 2 = 1 AND embedding IS NOT NULL),
        |z AS (SELECT sa.i,
        |        (CAST(sa.s AS DOUBLE) / CAST(na.n AS DOUBLE)) / 1048576.0 AS x,
        |        (CAST(sb.s AS DOUBLE) / CAST(nb.n AS DOUBLE)) / 1048576.0 AS y
        |      FROM sa JOIN sb USING (i), na, nb),
        |agg AS (SELECT
        |    list(x * y ORDER BY i) AS dots,
        |    list(x * x ORDER BY i) AS xs,
        |    list(y * y ORDER BY i) AS ys,
        |    list((x - y) * (x - y) ORDER BY i) AS d2s,
        |    max(abs(x - y)) AS maxshift FROM z)
        |SELECT
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE), dots), (p, q) -> p + q)
        |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
        |        (p, q) -> p + q))
        |      * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), ys),
        |        (p, q) -> p + q))) AS cos_means,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), d2s),
        |    (p, q) -> p + q)) AS l2_shift,
        |  maxshift AS max_dim_shift,
        |  (SELECT CAST(n AS BIGINT) FROM na) AS n_a,
        |  (SELECT CAST(n AS BIGINT) FROM nb) AS n_b
        |FROM agg""".stripMargin,
    "q_embedding_drift_grouped" ->
      """WITH sa AS (SELECT label, i,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings CROSS JOIN
        |    (SELECT unnest(generate_series(1, 64)) AS i) g
        |  WHERE vec_id % 2 = 0 AND embedding IS NOT NULL GROUP BY 1, 2),
        |sb AS (SELECT label, i,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings CROSS JOIN
        |    (SELECT unnest(generate_series(1, 64)) AS i) g
        |  WHERE vec_id % 2 = 1 AND embedding IS NOT NULL GROUP BY 1, 2),
        |na AS (SELECT label, count(*) AS n FROM embeddings
        |       WHERE vec_id % 2 = 0 AND embedding IS NOT NULL GROUP BY 1),
        |nb AS (SELECT label, count(*) AS n FROM embeddings
        |       WHERE vec_id % 2 = 1 AND embedding IS NOT NULL GROUP BY 1),
        |z AS (SELECT sa.label, sa.i,
        |        (CAST(sa.s AS DOUBLE) / CAST(na.n AS DOUBLE)) / 1048576.0 AS x,
        |        (CAST(sb.s AS DOUBLE) / CAST(nb.n AS DOUBLE)) / 1048576.0 AS y
        |      FROM sa JOIN sb USING (label, i)
        |        JOIN na USING (label) JOIN nb ON nb.label = sa.label),
        |agg AS (SELECT label,
        |    list(x * y ORDER BY i) AS dots,
        |    list(x * x ORDER BY i) AS xs,
        |    list(y * y ORDER BY i) AS ys,
        |    list((x - y) * (x - y) ORDER BY i) AS d2s,
        |    max(abs(x - y)) AS maxshift FROM z GROUP BY 1)
        |SELECT agg.label,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE), dots), (p, q) -> p + q)
        |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
        |        (p, q) -> p + q))
        |      * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), ys),
        |        (p, q) -> p + q))) AS cos_means,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), d2s),
        |    (p, q) -> p + q)) AS l2_shift,
        |  maxshift AS max_dim_shift,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b
        |FROM agg JOIN na USING (label) JOIN nb USING (label)
        |ORDER BY agg.label""".stripMargin,
    "q_jdbc_partitioned" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE c_custkey <= 1200
        |ORDER BY c_custkey""".stripMargin,
    "q_export_pruned_partitioned" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id BETWEEN 100 AND 299
        |ORDER BY doc_id""".stripMargin,
    // KMV bottom-k sketches: determinism (md5 order) makes
    // merge(a, b) == sketch(a ∪ b) EXACT, so the oracle states the
    // bottom-k + estimator over the whole corpus. The uniform fraction
    // is the repo-wide md5-prefix convention: first 15 hex chars as an
    // integer over 16^15 = 1152921504606846976 (2^60, BIGINT-safe).
    "q_kmv_sketch" ->
      """WITH hs AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL),
        |bk AS (SELECT h FROM hs ORDER BY h LIMIT 256),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
        |        FROM bk)
        |SELECT n_kept,
        |  CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
        |       ELSE (CAST(256 AS DOUBLE) - 1.0) /
        |         (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |           / 1152921504606846976.0) END AS estimate
        |FROM agg""".stripMargin,
    "q_kmv_sketch_grouped" ->
      """WITH hs AS (
        |  SELECT DISTINCT lang, md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL),
        |rk AS (SELECT lang, h,
        |         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |       FROM hs),
        |bk AS (SELECT lang, h FROM rk WHERE rn <= 32),
        |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |          max(h) AS kth
        |        FROM bk GROUP BY lang)
        |SELECT lang, n_kept,
        |  CASE WHEN n_kept < 32 THEN CAST(n_kept AS DOUBLE)
        |       ELSE (CAST(32 AS DOUBLE) - 1.0) /
        |         (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |           / 1152921504606846976.0) END AS estimate
        |FROM agg ORDER BY lang""".stripMargin,
    "q_kmv_jaccard" ->
      """WITH ta AS (
        |  SELECT DISTINCT t AS tok FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents WHERE doc_id % 2 = 0)
        |  WHERE t <> ''),
        |tb AS (
        |  SELECT DISTINCT t AS tok FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents WHERE doc_id % 2 = 1)
        |  WHERE t <> ''),
        |ha AS (SELECT md5(tok) AS h FROM ta ORDER BY h LIMIT 256),
        |hb AS (SELECT md5(tok) AS h FROM tb ORDER BY h LIMIT 256),
        |u AS (SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |        SELECT h, 1 AS in_a, 0 AS in_b FROM ha
        |        UNION ALL SELECT h, 0, 1 FROM hb)
        |      GROUP BY h),
        |m AS (SELECT * FROM u ORDER BY h LIMIT 256)
        |SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
        |  CAST(CAST(sum(in_a * in_b) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS jaccard
        |FROM m""".stripMargin,
    "q_kmv_setops" ->
      // identical bottom-k algebra to q_kmv_jaccard plus the union
      // estimator from the merged bottom-k's k-th hash and each side's
      // own (k−1)/u(h_k); derived estimates state Spark's exact double
      // order: intersect = jaccard * union, diff_ab = a_est − intersect
      """WITH ta AS (
        |  SELECT DISTINCT t AS tok FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents WHERE doc_id % 2 = 0)
        |  WHERE t <> ''),
        |tb AS (
        |  SELECT DISTINCT t AS tok FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents WHERE doc_id % 2 = 1)
        |  WHERE t <> ''),
        |ha AS (SELECT md5(tok) AS h FROM ta ORDER BY h LIMIT 256),
        |hb AS (SELECT md5(tok) AS h FROM tb ORDER BY h LIMIT 256),
        |ea AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS kth FROM ha),
        |eb AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS kth FROM hb),
        |aest AS (SELECT CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE (CAST(256 AS DOUBLE) - 1.0) /
        |      (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |        / 1152921504606846976.0) END AS a_est FROM ea),
        |best AS (SELECT CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE (CAST(256 AS DOUBLE) - 1.0) /
        |      (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |        / 1152921504606846976.0) END AS b_est FROM eb),
        |u AS (SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |        SELECT h, 1 AS in_a, 0 AS in_b FROM ha
        |        UNION ALL SELECT h, 0, 1 FROM hb)
        |      GROUP BY h),
        |m AS (SELECT * FROM u ORDER BY h LIMIT 256),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |          CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
        |          max(h) AS kth FROM m),
        |base AS (SELECT n_kept, n_common,
        |    CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE) AS jaccard,
        |    CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
        |         ELSE (CAST(256 AS DOUBLE) - 1.0) /
        |           (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |             / 1152921504606846976.0) END AS union_est
        |  FROM agg)
        |SELECT n_kept, n_common, jaccard, union_est,
        |  jaccard * union_est AS intersect_est,
        |  a_est - (jaccard * union_est) AS diff_ab_est,
        |  b_est - (jaccard * union_est) AS diff_ba_est,
        |  CASE WHEN a_est > 0.0
        |       THEN (jaccard * union_est) / a_est ELSE 0.0 END
        |    AS containment_ab,
        |  CASE WHEN b_est > 0.0
        |       THEN (jaccard * union_est) / b_est ELSE 0.0 END
        |    AS containment_ba
        |FROM base, aest, best""".stripMargin,
    // Bloom: the dense word array is lossless packaging of the set-bit
    // POSITIONS, so the oracle probes the position set directly —
    // member(p) iff all k of p's md5 positions were set by some inserted
    // key (false positives reproduced exactly)
    "q_bloom_filter" ->
      """WITH ks AS (SELECT DISTINCT text FROM documents
        |            WHERE text IS NOT NULL),
        |hs AS (SELECT unnest(generate_series(0, 2)) AS i),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(i::VARCHAR || ':' || text), 1, 8))::BIGINT
        |      % 4096 AS pos
        |  FROM ks, hs),
        |probes AS (
        |  SELECT DISTINCT text AS probe FROM documents
        |  WHERE doc_id % 5 = 0 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT 'absent:' || CAST(x AS VARCHAR) AS probe
        |  FROM (SELECT unnest(generate_series(0, 199)) AS x)),
        |pp AS (SELECT probe,
        |    ('0x' || substr(md5(i::VARCHAR || ':' || probe), 1, 8))::BIGINT
        |      % 4096 AS pos
        |  FROM probes, hs)
        |SELECT probe, bool_and(bits.pos IS NOT NULL) AS member
        |FROM pp LEFT JOIN bits ON pp.pos = bits.pos
        |GROUP BY probe ORDER BY probe""".stripMargin,
    "q_bloom_estimate" ->
      """WITH ks AS (SELECT DISTINCT text FROM documents
        |            WHERE text IS NOT NULL),
        |hs AS (SELECT unnest(generate_series(0, 2)) AS i),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(i::VARCHAR || ':' || text), 1, 8))::BIGINT
        |      % 4096 AS pos
        |  FROM ks, hs),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits)
        |SELECT bits_set, 4096 AS m, 3 AS k,
        |  (-(CAST(4096 AS DOUBLE) / CAST(3 AS DOUBLE))) *
        |    ln(1.0 - CAST(bits_set AS DOUBLE) / CAST(4096 AS DOUBLE))
        |    AS estimate
        |FROM x""".stripMargin,
    // logistic training replayed iteration for iteration: fixed-point
    // gradient sums (floor(t·2^20 + 0.5) as DECIMAL) commute, σ rides
    // libm exp on both engines, every double op stated in Spark's order
    "q_quality_lr" -> (lrOraclePrefix +
      """SELECT wa AS w0, wb AS w1, wc AS w2 FROM w3""").stripMargin,
    "q_quality_lr_scores" -> (lrOraclePrefix +
      """SELECT doc_id,
        |  (1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) AS score
        |FROM f, w3 ORDER BY score DESC, doc_id ASC LIMIT 10""").stripMargin,
    "q_quality_auc" ->
      """WITH c AS (SELECT CAST(n_chars AS DOUBLE) AS s,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |           FROM documents
        |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT s, y, rank() OVER (ORDER BY s) AS rk FROM c),
        |cc AS (SELECT s, count(*) AS c FROM c GROUP BY s),
        |j AS (SELECT r.y, r.rk, cc.c FROM r JOIN cc USING (s)),
        |a AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos,
        |        CAST(sum(1 - y) AS BIGINT) AS n_neg,
        |        CAST(sum(CASE WHEN y = 1 THEN 2 * rk + c - 1 ELSE 0 END)
        |          AS BIGINT) AS r2
        |      FROM j)
        |SELECT n_pos, n_neg,
        |  ((CAST(r2 AS DOUBLE) / 2.0 -
        |    CAST(n_pos * (n_pos + 1) AS DOUBLE) / 2.0) /
        |   CAST(n_pos * n_neg AS DOUBLE)) AS auc
        |FROM a""".stripMargin,
    "q_quality_auc_grouped" ->
      """WITH c AS (SELECT lang, CAST(n_chars AS DOUBLE) AS s,
        |             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS y
        |           FROM documents
        |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT lang, s, y,
        |        rank() OVER (PARTITION BY lang ORDER BY s) AS rk FROM c),
        |ps AS (SELECT lang, s, CAST(min(rk) AS BIGINT) AS mn,
        |         CAST(count(*) AS BIGINT) AS c,
        |         CAST(sum(y) AS BIGINT) AS pos
        |       FROM r GROUP BY lang, s),
        |a AS (SELECT lang AS "group",
        |        CAST(sum(pos) AS BIGINT) AS n_pos,
        |        CAST(sum(c - pos) AS BIGINT) AS n_neg,
        |        CAST(sum(pos * (2 * mn + c - 1)) AS BIGINT) AS r2
        |      FROM ps GROUP BY lang)
        |SELECT "group", n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    ((CAST(r2 AS DOUBLE) / 2.0 -
        |      CAST(n_pos * (n_pos + 1) AS DOUBLE) / 2.0) /
        |     CAST(n_pos * n_neg AS DOUBLE)) END AS auc
        |FROM a ORDER BY "group" ASC""".stripMargin,
    "q_quality_gains" ->
      """WITH c AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS s,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |           FROM documents
        |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT y, row_number() OVER (ORDER BY s DESC, doc_id ASC)
        |        AS rk FROM c),
        |per AS (SELECT CAST(floor(CAST((rk - 1) * 10 AS DOUBLE)
        |            / CAST(nn.n AS DOUBLE)) AS BIGINT) AS bucket,
        |          CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(y) AS BIGINT) AS n_pos
        |        FROM r, nn GROUP BY 1),
        |cum AS (SELECT bucket, n, n_pos,
        |          CAST(sum(n) OVER (ORDER BY bucket
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
        |          CAST(sum(n_pos) OVER (ORDER BY bucket
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |        FROM per),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |          CAST(sum(n_pos) AS BIGINT) AS tp FROM per)
        |SELECT bucket, n, n_pos, cum_n, cum_pos,
        |  CASE WHEN tp > 0 THEN
        |    CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE) END AS gain,
        |  CASE WHEN tp > 0 THEN
        |    (CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
        |    (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)) END AS lift
        |FROM cum, tot ORDER BY bucket ASC""".stripMargin,
    "q_quality_pr_curve" ->
      """WITH f AS (
        |  SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
        |t AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE)
        |        AS threshold),
        |cm AS (SELECT threshold,
        |    CAST(sum(CASE WHEN s >= threshold THEN 1 ELSE 0 END * y) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN s >= threshold THEN 1 ELSE 0 END * (1 - y)) AS BIGINT) AS fp,
        |    CAST(sum((1 - CASE WHEN s >= threshold THEN 1 ELSE 0 END) * (1 - y)) AS BIGINT) AS tn,
        |    CAST(sum((1 - CASE WHEN s >= threshold THEN 1 ELSE 0 END) * y) AS BIGINT) AS fn
        |  FROM f, t GROUP BY threshold),
        |pr AS (SELECT threshold, tp, fp, tn, fn,
        |    CASE WHEN tp + fp > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |    CASE WHEN tp + fn > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
        |  FROM cm)
        |SELECT threshold, tp, fp, tn, fn, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |        AND precision + recall > 0.0 THEN
        |    ((2.0 * precision) * recall) / (precision + recall) END AS f1
        |FROM pr ORDER BY threshold ASC""".stripMargin,
    "q_quality_brier" -> (lrOraclePrefix +
      """, sc AS (SELECT
        |    (1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) AS s, y
        |  FROM f, w3)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  ((CAST(sum(CAST(floor(((s - y) * (s - y)) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0)
        |    / CAST(count(*) AS DOUBLE)) AS brier
        |FROM sc""").stripMargin,
    "q_quality_calibration" ->
      ("""WITH f AS (
        |  SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
        |sc AS (SELECT x1 AS s, CAST(y AS INTEGER) AS y FROM f),
        |b AS (SELECT
        |    CASE WHEN s < 0.0 THEN 0 WHEN s >= 1.0 THEN 11
        |         ELSE LEAST(10, CAST(floor(((s - 0.0) * 10.0) / 1.0)
        |           AS BIGINT) + 1) END AS bin,
        |    y, CAST(floor(s * 1048576.0 + 0.5) AS BIGINT) AS sq
        |  FROM sc)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(CAST(sum(y) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS frac_pos,
        |  ((CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE) / 1048576.0)
        |    / CAST(count(*) AS DOUBLE)) AS mean_score
        |FROM b GROUP BY bin ORDER BY bin ASC""").stripMargin,
    "q_quality_pr" -> (lrOraclePrefix +
      """, sc AS (SELECT
        |    (1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) AS s,
        |    CAST(y AS INTEGER) AS y
        |  FROM f, w3),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN s >= 0.4 THEN 1 ELSE 0 END * y) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN s >= 0.4 THEN 1 ELSE 0 END * (1 - y)) AS BIGINT) AS fp,
        |    CAST(sum((1 - CASE WHEN s >= 0.4 THEN 1 ELSE 0 END) * (1 - y)) AS BIGINT) AS tn,
        |    CAST(sum((1 - CASE WHEN s >= 0.4 THEN 1 ELSE 0 END) * y) AS BIGINT) AS fn
        |  FROM sc),
        |pr AS (SELECT tp, fp, tn, fn,
        |    CASE WHEN tp + fp > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |    CASE WHEN tp + fn > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
        |  FROM cm)
        |SELECT tp, fp, tn, fn, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |        AND precision + recall > 0.0 THEN
        |    ((2.0 * precision) * recall) / (precision + recall) END AS f1
        |FROM pr""").stripMargin,
    // per-column profile: one UNION ALL branch per column stating the
    // identical aggregates; numeric sums in exact DECIMAL(28,4), mean
    // as one double division, string extrema through the same cast
    "q_profile" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer)
        |SELECT * FROM (
        |  SELECT 'c_acctbal' AS "column", 'double' AS dtype, nn.n AS n_rows,
        |    nn.n - CAST(count(c_acctbal) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_distinct,
        |    CAST(min(c_acctbal) AS DOUBLE) AS min_num,
        |    CAST(max(c_acctbal) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_num,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(c_acctbal) AS DOUBLE) AS mean
        |  FROM customer, nn GROUP BY nn.n
        |  UNION ALL
        |  SELECT 'c_custkey', 'bigint', nn.n,
        |    nn.n - CAST(count(c_custkey) AS BIGINT),
        |    CAST(count(DISTINCT c_custkey) AS BIGINT),
        |    CAST(min(c_custkey) AS DOUBLE), CAST(max(c_custkey) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(c_custkey AS DECIMAL(28,4))) AS DOUBLE),
        |    CAST(sum(CAST(c_custkey AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(c_custkey) AS DOUBLE)
        |  FROM customer, nn GROUP BY nn.n
        |  UNION ALL
        |  SELECT 'c_mktsegment', 'string', nn.n,
        |    nn.n - CAST(count(c_mktsegment) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(CAST(c_mktsegment AS VARCHAR)),
        |    max(CAST(c_mktsegment AS VARCHAR)),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM customer, nn GROUP BY nn.n
        |  UNION ALL
        |  SELECT 'c_name', 'string', nn.n,
        |    nn.n - CAST(count(c_name) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(CAST(c_name AS VARCHAR)), max(CAST(c_name AS VARCHAR)),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM customer, nn GROUP BY nn.n
        |  UNION ALL
        |  SELECT 'c_nationkey', 'int', nn.n,
        |    nn.n - CAST(count(c_nationkey) AS BIGINT),
        |    CAST(count(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(min(c_nationkey) AS DOUBLE), CAST(max(c_nationkey) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(c_nationkey AS DECIMAL(28,4))) AS DOUBLE),
        |    CAST(sum(CAST(c_nationkey AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(c_nationkey) AS DOUBLE)
        |  FROM customer, nn GROUP BY nn.n)
        |ORDER BY "column"""".stripMargin,
    "q_skew_topk" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS key,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents GROUP BY 1),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |t AS (SELECT key, cnt FROM c
        |      ORDER BY cnt DESC, key ASC NULLS FIRST LIMIT 3)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share
        |FROM t, n ORDER BY cnt DESC, key ASC NULLS FIRST""".stripMargin,
    // skew stats: the entropy fold runs over the top-k counts in
    // (cnt asc, key asc) order with a 0.0 seed, then the OTHER bucket
    // last — Spark's exact left-fold order, so the double matches
    "q_skew_stats" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS key,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |          CAST(count(*) AS BIGINT) AS n_keys,
        |          max(cnt) AS max_cnt FROM c),
        |t AS (SELECT key, cnt FROM c
        |      ORDER BY cnt DESC, key ASC NULLS FIRST LIMIT 4),
        |lst AS (SELECT list(cnt ORDER BY cnt ASC, key ASC NULLS FIRST)
        |          AS top FROM t),
        |s AS (SELECT n, n_keys, max_cnt, top,
        |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), top),
        |          (a, b) -> a + b) AS BIGINT) AS topsum
        |      FROM lst, tot)
        |SELECT n, n_keys, max_cnt,
        |  CAST(max_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS max_share,
        |  CAST(topsum AS DOUBLE) / CAST(n AS DOUBLE) AS topk_share,
        |  list_reduce(list_prepend(0.0, list_transform(top, x ->
        |      CASE WHEN x > 0 THEN
        |        -((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) *
        |          ln(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
        |      ELSE 0.0 END)), (a, b) -> a + b) +
        |    (CASE WHEN (n - topsum) > 0 THEN
        |       -((CAST(n - topsum AS DOUBLE) / CAST(n AS DOUBLE)) *
        |         ln(CAST(n - topsum AS DOUBLE) / CAST(n AS DOUBLE)))
        |     ELSE 0.0 END) AS entropy
        |FROM s""".stripMargin,
    "q_salt_factors" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS key,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents GROUP BY 1)
        |SELECT key, cnt,
        |  CAST(floor(CAST(cnt + 59 AS DOUBLE) / 60.0) AS BIGINT)
        |    AS salt_factor
        |FROM c WHERE cnt > 60
        |ORDER BY cnt DESC, key ASC NULLS FIRST""".stripMargin,
    // the salted two-phase aggregation is bit-equal to the direct one
    // because both ride exact DECIMAL algebra — the oracle IS the
    // direct aggregation
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_equidepth_hist" ->
      """WITH nn AS (SELECT n_chars, doc_id FROM documents
        |            WHERE n_chars IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nn),
        |r AS (SELECT n_chars,
        |        row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rn
        |      FROM nn)
        |SELECT CAST(floor(CAST((rn - 1) * 8 AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM r, n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_kmv_sample" ->
      """WITH hs AS (
        |  SELECT DISTINCT lang, md5(text) AS h, text FROM documents
        |  WHERE text IS NOT NULL),
        |rk AS (SELECT lang, h, text,
        |         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |       FROM hs)
        |SELECT lang, h, text AS sample_key FROM rk WHERE rn <= 8
        |ORDER BY lang, h""".stripMargin,
    // count-min: deterministic md5 row-salted buckets, so the oracle
    // reproduces the exact counters — estimate = min over the 4 rows of
    // the bucket counter, always >= exact
    "q_cms_freq" ->
      """WITH toks AS (
        |  SELECT t AS tok FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM toks
        |        GROUP BY tok ORDER BY exact DESC, tok ASC LIMIT 10),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |bkt AS (SELECT r,
        |          ('0x' || substr(md5(r::VARCHAR || ':' || tok), 1, 8))::BIGINT
        |            % 1024 AS b,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM toks CROSS JOIN rs GROUP BY 1, 2)
        |SELECT t.tok, t.exact, min(bk.n) AS estimate
        |FROM top t CROSS JOIN rs r
        |JOIN bkt bk ON bk.r = r.r
        |  AND bk.b = ('0x' || substr(md5(r.r::VARCHAR || ':' || t.tok), 1, 8))::BIGINT
        |    % 1024
        |GROUP BY t.tok, t.exact
        |ORDER BY t.tok""".stripMargin,
    // A-ES weighted sampling in log form: priority = ln(u)/w with the
    // md5-prefix uniform and libm ln on both engines; the k largest
    // priorities per language are the sample — deterministic, so the
    // exact rows (and the priority doubles) are the oracle relation
    "q_weighted_sample" ->
      """WITH c AS (
        |  SELECT lang, doc_id,
        |    ln(CAST(('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 15))::BIGINT
        |        AS DOUBLE) / 1152921504606846976.0)
        |      / CAST(n_chars AS DOUBLE) AS priority
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0),
        |r AS (SELECT lang, doc_id, priority,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY priority DESC, doc_id::VARCHAR ASC) AS rn
        |      FROM c)
        |SELECT lang, doc_id, priority FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin
  )
}
