package graft.queries

/** DuckDB oracles for [[ExtendedQueries]]. `q_stream_window` runs through
  * Structured Streaming on the Spark side but its bounded result equals this
  * plain batch aggregation. */
object ExtendedOracles {
  val oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  CASE WHEN l_extendedprice * (1.0 - l_discount) > 30000.0 THEN 'high' ELSE 'low' END AS price_label
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""".stripMargin,
    "q_dq_checks" ->
      """SELECT c_custkey,
        |  c_acctbal < 0 AS c_acctbal_is_negative_dq,
        |  c_acctbal >= 0.0 AND c_acctbal <= 5000.0 AS c_acctbal_is_between_dq,
        |  c_acctbal IS NOT NULL AS c_acctbal_is_not_null_dq,
        |  c_acctbal IS NOT NULL AND c_custkey > 0 AS dq_valid
        |FROM customer ORDER BY c_custkey LIMIT 400""".stripMargin,
    "q_fill_forward" ->
      """SELECT c_custkey,
        |  last_value(bal IGNORE NULLS) OVER (ORDER BY c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
        |FROM (SELECT c_custkey, CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
        |      FROM customer) t
        |ORDER BY c_custkey LIMIT 400""".stripMargin,
    "q_rank_scalable" ->
      """SELECT o_orderkey, rank() OVER (ORDER BY o_totalprice ASC) AS r
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rank_variants" ->
      """SELECT s_suppkey,
        |  CAST(2 * rank() OVER (ORDER BY s_acctbal ASC)
        |       + count(*) OVER (PARTITION BY s_acctbal) - 1 AS DOUBLE) / 2 AS rank_avg,
        |  rank() OVER (ORDER BY s_acctbal ASC)
        |    + count(*) OVER (PARTITION BY s_acctbal) - 1 AS rank_max
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_concat_relaxed" ->
      """SELECT CAST(n_nationkey AS DOUBLE) AS v FROM nation
        |UNION ALL
        |SELECT c_acctbal AS v FROM customer WHERE c_custkey <= 50
        |ORDER BY v ASC NULLS FIRST""".stripMargin,
    "q_selectors" ->
      """SELECT
        |  CAST(sum(CAST(p_partkey AS DECIMAL(18,2))) AS DOUBLE) AS sum_p_partkey,
        |  CAST(sum(CAST(p_size AS DECIMAL(18,2))) AS DOUBLE) AS sum_p_size,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_p_retailprice
        |FROM part""".stripMargin,
    "q_join_nulls" ->
      """SELECT count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN x.nk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_pairs
        |FROM (SELECT c_custkey, CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk FROM customer) x
        |JOIN (SELECT c_custkey, CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk FROM customer) y
        |  ON x.nk IS NOT DISTINCT FROM y.nk""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unique_last" ->
      """SELECT o_orderkey, o_custkey FROM (
        |  SELECT o_orderkey, o_custkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q_unique_first" ->
      """SELECT o_orderkey, o_custkey FROM (
        |  SELECT o_orderkey, o_custkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q_tail" ->
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 10) t
        |ORDER BY o_orderkey""".stripMargin,
    "q_str_more" ->
      """SELECT p_partkey,
        |  CASE WHEN starts_with(p_type, 'STANDARD ') THEN substring(p_type, 10) ELSE p_type END AS type_stripped,
        |  lpad(p_name, 30, '*') AS name_padded,
        |  CASE WHEN strpos(p_type, 'ED') > 0 THEN CAST(strpos(p_type, 'ED') - 1 AS INTEGER) END AS ed_pos,
        |  reverse(p_brand) AS brand_rev,
        |  CASE WHEN length(p_brand) <= 2 THEN p_brand ELSE right(p_brand, 2) END AS brand_tail,
        |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS BIGINT) AS brand_num,
        |  trim(p_name, 'aeiou ') AS name_stripped
        |FROM part ORDER BY p_partkey LIMIT 400""".stripMargin,
    "q_dt_more" ->
      """SELECT o_orderkey,
        |  CAST(isoyear(o_orderdate) AS INTEGER) AS iso_y,
        |  (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
        |    OR year(o_orderdate) % 400 = 0 AS leap,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  epoch_ms(o_orderdate) AS epoch_ms,
        |  date_trunc('month', o_orderdate) + (o_orderdate - date_trunc('day', o_orderdate)) AS m_start,
        |  CAST(last_day(o_orderdate) AS TIMESTAMP) + (o_orderdate - date_trunc('day', o_orderdate)) AS m_end,
        |  o_orderdate + INTERVAL 2 HOUR AS plus_2h,
        |  CAST(ceil(year(o_orderdate) / 1000.0) AS INTEGER) AS mil,
        |  CAST(ceil(year(o_orderdate) / 100.0) AS INTEGER) AS cen
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_dt_time_parts" ->
      """SELECT event_id,
        |  CAST(hour(ts) AS INTEGER) AS h,
        |  CAST(minute(ts) AS INTEGER) AS mi,
        |  CAST(floor(second(ts)) AS INTEGER) AS sec,
        |  CAST((epoch_us(ts) % 1000000) // 1000 AS INTEGER) AS ms,
        |  CAST(epoch_us(ts) % 1000000 AS INTEGER) AS us,
        |  ((epoch_us(ts) // 1000000) % 86400) * 1000000000
        |    + (epoch_us(ts) % 1000000) * 1000 AS ns_of_day,
        |  epoch_us(ts) AS epoch_us
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "q_dt_replace" ->
      """SELECT event_id,
        |  make_timestamp(2000, month(ts), day(ts), hour(ts), minute(ts),
        |    CAST(floor(second(ts)) AS DOUBLE)) AS y2000,
        |  make_timestamp(year(ts), 1, 15, hour(ts), minute(ts),
        |    CAST(floor(second(ts)) AS DOUBLE)) AS jan15,
        |  date_trunc('day', ts) AS midnight,
        |  date_trunc('milliseconds', ts) AS ms_trunc,
        |  epoch_us(ts) * 1000 AS reint_ms_us,
        |  epoch_us(ts) // 1000 AS reint_ns_us
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "q_math_more" ->
      """SELECT l_orderkey, l_linenumber,
        |  greatest(least(l_quantity, 40.0), 5.0) AS qty_clip,
        |  round(l_extendedprice / power(10, floor(log10(abs(l_extendedprice))) - 2))
        |    * power(10, floor(log10(abs(l_extendedprice))) - 2) AS price_3sf,
        |  round(cbrt(l_quantity), 4) AS qty_cbrt,
        |  round(power(l_discount, 2), 6) AS disc_sq,
        |  round(sin(l_quantity / 7.0), 4) AS qty_sin,
        |  round(cos(l_quantity / 7.0), 4) AS qty_cos,
        |  round(atan(l_quantity / 7.0), 4) AS qty_atan,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
        |  l_linenumber % 3 AS line_mod3
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""".stripMargin,
    "q_stream_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_cusum" ->
      // batch-mode statefulCusum = the seq-ordered fold per key; both
      // ramps are independent clamped folds, replayed with the gate's
      // exact step arithmetic (±1·(v − 50) − 5, clamp at 0, alarm at 100)
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, event_id,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_id IS NOT NULL),
        |l AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |    list(v ORDER BY event_id) AS lv FROM e GROUP BY key),
        |f AS (SELECT key, n,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lv),
        |      (acc, x) -> greatest(CAST(0.0 AS DOUBLE),
        |        acc + ((CAST(1.0 AS DOUBLE) * (x - CAST(50.0 AS DOUBLE)))
        |          - CAST(5.0 AS DOUBLE)))) AS cusum_hi,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lv),
        |      (acc, x) -> greatest(CAST(0.0 AS DOUBLE),
        |        acc + ((CAST(-1.0 AS DOUBLE) * (x - CAST(50.0 AS DOUBLE)))
        |          - CAST(5.0 AS DOUBLE)))) AS cusum_lo
        |  FROM l)
        |SELECT key, n, cusum_hi, cusum_lo,
        |  (cusum_hi > 100.0 OR cusum_lo > 100.0) AS alarm
        |FROM f ORDER BY key ASC""".stripMargin,
    "q_stream_ewma" ->
      // batch-mode statefulEwma = the seq-ordered fold per key with the
      // first value as seed (list_reduce's init IS element 1 — exactly
      // the EWMA_1 = v_1 convention); baseline folds all rows, the
      // deviation is the last value minus the fold over the first n−1
      // (the forecast residual); beta stated as the literal difference
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, event_id,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_id IS NOT NULL),
        |l AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |    list(v ORDER BY event_id) AS lv FROM e GROUP BY key)
        |SELECT key, n, lv[n] AS value,
        |  list_reduce(lv, (acc, x) ->
        |    acc * (CAST(1.0 AS DOUBLE) - CAST(0.25 AS DOUBLE))
        |      + CAST(0.25 AS DOUBLE) * x) AS baseline,
        |  CASE WHEN n = 1 THEN CAST(0.0 AS DOUBLE)
        |       ELSE lv[n] - list_reduce(lv[:n-1], (acc, x) ->
        |         acc * (CAST(1.0 AS DOUBLE) - CAST(0.25 AS DOUBLE))
        |           + CAST(0.25 AS DOUBLE) * x) END AS deviation
        |FROM l ORDER BY key ASC""".stripMargin,
    "q_stream_zscore" ->
      // batch-mode statefulMoments: whole-history exact fixed-point
      // sums per key (integer aggregates), last value by seq, then the
      // gate's stated mean/std/z doubles
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, event_id,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_id IS NOT NULL),
        |l AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(v * 1048576.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sx,
        |    CAST(sum(CAST(floor((v * v) * 1048576.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sxx,
        |    list(v ORDER BY event_id) AS lv
        |  FROM e GROUP BY key),
        |s AS (SELECT key, n, lv[len(lv)] AS value,
        |    (CAST(sx AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(sxx AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE) AS ex2
        |  FROM l),
        |t AS (SELECT key, n, value, mean,
        |    sqrt(greatest(CAST(0.0 AS DOUBLE), ex2 - mean * mean)) AS std
        |  FROM s)
        |SELECT key, n, value, mean, std,
        |  CASE WHEN n >= 2 AND std > 0.0 THEN (value - mean) / std
        |  END AS z
        |FROM t ORDER BY key ASC""".stripMargin,
    "q_stream_distribution" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
        |       WHEN CAST(value AS DOUBLE) >= 512.0 THEN 65
        |       ELSE LEAST(64, CAST(floor(((CAST(value AS DOUBLE) - 0.0)
        |         * 64.0) / 512.0) AS BIGINT) + 1) END AS bin,
        |  count(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_drift" ->
      // per-hour distribution vs the global baseline, the
      // q_distribution_drift arithmetic grouped by hour
      """WITH ba AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |    CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
        |         WHEN CAST(value AS DOUBLE) >= 512.0 THEN 65
        |         ELSE LEAST(64, CAST(floor(((CAST(value AS DOUBLE) - 0.0)
        |           * 64.0) / 512.0) AS BIGINT) + 1) END AS bin
        |  FROM events WHERE value IS NOT NULL),
        |hours AS (SELECT DISTINCT hour_epoch FROM ba),
        |ca_ AS (SELECT hour_epoch, bin, count(*) AS c FROM ba GROUP BY 1, 2),
        |cb_ AS (SELECT bin, count(*) AS c FROM ba GROUP BY 1),
        |g AS (SELECT hour_epoch, unnest(generate_series(0, 65)) AS bin
        |      FROM hours),
        |dd AS (SELECT g.hour_epoch, g.bin, coalesce(ca_.c, 0) AS ca,
        |         coalesce(cb_.c, 0) AS cb
        |       FROM g LEFT JOIN ca_ USING (hour_epoch, bin)
        |              LEFT JOIN cb_ USING (bin)),
        |na_ AS (SELECT hour_epoch, count(*) AS na FROM ba GROUP BY 1),
        |nbv AS (SELECT count(*) AS nb FROM ba),
        |terms AS (SELECT dd.hour_epoch, bin, ca, cb, na, nb,
        |    (CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5 * 66.0) AS pa,
        |    (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5 * 66.0) AS pb
        |  FROM dd JOIN na_ USING (hour_epoch), nbv),
        |cum AS (SELECT hour_epoch, bin, na, nb,
        |    sum(ca) OVER (PARTITION BY hour_epoch ORDER BY bin) AS cca,
        |    sum(cb) OVER (PARTITION BY hour_epoch ORDER BY bin) AS ccb
        |  FROM terms),
        |ksv AS (SELECT hour_epoch,
        |    max(abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks
        |  FROM cum GROUP BY 1),
        |agg AS (SELECT hour_epoch,
        |    list((pa - pb) * ln(pa / pb) ORDER BY bin) AS psiterms,
        |    list(abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) ORDER BY bin)
        |      AS tvdterms,
        |    max(na) AS na, max(nb) AS nb FROM terms GROUP BY 1)
        |SELECT agg.hour_epoch,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE), psiterms),
        |    (x, y) -> x + y) AS psi,
        |  ksv.ks AS ks,
        |  0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE), tvdterms),
        |    (x, y) -> x + y) AS tvd,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM agg JOIN ksv USING (hour_epoch)
        |ORDER BY agg.hour_epoch""".stripMargin,
    "q_stateful_counts" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_interval_join" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 12 HOUR AND v.ts <= c.ts
        |ORDER BY click_id, view_id""".stripMargin,
    "q_stream_interval_join_outer" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND v.ts >= c.ts - INTERVAL 12 HOUR AND v.ts <= c.ts
        |ORDER BY click_id, view_id NULLS FIRST""".stripMargin,
    "q_version_diff" ->
      s"""$VersionDiffSql ORDER BY o_orderkey""",
    "q_version_scan_relaxed" ->
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS buyer,
        |  CAST(NULL AS DOUBLE) AS spend
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS buyer,
        |  CAST(o_totalprice AS DOUBLE) AS spend
        |FROM orders WHERE o_orderkey % 3 = 1
        |ORDER BY o_orderkey""".stripMargin,
    "q_version_diff_summary" ->
      s"""SELECT
         |  count(*) FILTER (WHERE op = 'insert') AS inserted,
         |  count(*) FILTER (WHERE op = 'delete') AS deleted,
         |  count(*) FILTER (WHERE op = 'update') AS updated,
         |  count(*) AS changed
         |FROM ($VersionDiffSql) d""".stripMargin,
    "q_version_drift" ->
      // the q_distribution_drift arithmetic over the two store-version
      // derivations (v1: doc_id % 7 <> 0; v2: doc_id % 5 <> 0 with a
      // third of docs 40 chars longer), grid [0, 640) x 64
      """WITH ba AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM documents WHERE doc_id % 7 <> 0 AND n_chars IS NOT NULL),
        |v2 AS (SELECT CASE WHEN doc_id % 3 = 0 THEN n_chars + 40
        |              ELSE n_chars END AS n_chars
        |       FROM documents WHERE doc_id % 5 <> 0),
        |bb AS (
        |  SELECT CASE WHEN CAST(n_chars AS DOUBLE) < 0.0 THEN 0
        |              WHEN CAST(n_chars AS DOUBLE) >= 640.0 THEN 65
        |              ELSE LEAST(64, CAST(floor(((CAST(n_chars AS DOUBLE) - 0.0)
        |                * 64.0) / 640.0) AS BIGINT) + 1) END AS bin
        |  FROM v2 WHERE n_chars IS NOT NULL),
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
    "q_version_history" -> versionHistorySql,
    "q_store_compact" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // restore is metadata-only: HEAD after restoring @HEAD~2 IS the
    // first publish — the raw table
    "q_store_restore" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // streaming CMS: hourly windows partition events by ts and the merge
    // is integer elementwise addition, so the streamed rollup is
    // bit-equal to the whole-corpus sketch the oracle states — identical
    // md5 row-salted buckets, estimate = min over the 4 rows
    // streaming calibration: hourly windows partition events by ts and
    // the per-(window, bin) algebra is QualityModel.calibration's exactly
    // (gridBin fixed grid, integer counts, fixed-point mean score), so
    // the oracle states each hour's batch calibration over the raw table
    "q_stream_calibration" ->
      """WITH sc AS (SELECT ts,
        |    CAST(value AS DOUBLE) / 512.0 AS s,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |b AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
        |          AS hour_epoch,
        |    CASE WHEN s < 0.0 THEN 0 WHEN s >= 1.0 THEN 11
        |         ELSE LEAST(10, CAST(floor(((s - 0.0) * 10.0) / 1.0)
        |           AS BIGINT) + 1) END AS bin,
        |    y, CAST(floor(s * 1048576.0 + 0.5) AS BIGINT) AS sq
        |  FROM sc)
        |SELECT hour_epoch, bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(CAST(sum(y) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS frac_pos,
        |  ((CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE) / 1048576.0)
        |    / CAST(count(*) AS DOUBLE)) AS mean_score
        |FROM b GROUP BY hour_epoch, bin
        |ORDER BY hour_epoch, bin""".stripMargin,
    // profile drift: HEAD holds shard doc_id%3=2, HEAD~1 shard
    // doc_id%3=1; same stats arithmetic as the rollup oracle per shard,
    // then the same delta algebra (every fraction/delta stated once,
    // range_widened through the identical 3-valued OR + coalesce)
    "q_profile_drift" ->
      """WITH cur AS (
        |  SELECT 'doc_id' AS "column", 'bigint' AS dtype,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
        |    CAST(min(doc_id) AS DOUBLE) AS min_num,
        |    CAST(max(doc_id) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(sum(CAST(doc_id AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(doc_id) AS DOUBLE) AS mean
        |  FROM documents WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT 'lang', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(lang) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(lang), max(lang),
        |    CAST(NULL AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT 'n_chars', 'bigint', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(n_chars) AS BIGINT),
        |    CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(n_chars) AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT 'source', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(source) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(source), max(source),
        |    CAST(NULL AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 2),
        |base AS (
        |  SELECT 'doc_id' AS "column", 'bigint' AS dtype,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
        |    CAST(min(doc_id) AS DOUBLE) AS min_num,
        |    CAST(max(doc_id) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(sum(CAST(doc_id AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(doc_id) AS DOUBLE) AS mean
        |  FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT 'lang', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(lang) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(lang), max(lang),
        |    CAST(NULL AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT 'n_chars', 'bigint', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(n_chars) AS BIGINT),
        |    CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(n_chars) AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT 'source', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(source) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(source), max(source),
        |    CAST(NULL AS DOUBLE)
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT c."column",
        |  (c.dtype IS NULL OR b.dtype IS NULL OR c.dtype <> b.dtype)
        |    AS schema_changed,
        |  c.n_rows AS n_rows_cur, b.n_rows AS n_rows_base,
        |  CASE WHEN c.n_rows > 0 THEN
        |    CAST(c.n_nulls AS DOUBLE) / CAST(c.n_rows AS DOUBLE) END
        |    AS null_frac_cur,
        |  CASE WHEN b.n_rows > 0 THEN
        |    CAST(b.n_nulls AS DOUBLE) / CAST(b.n_rows AS DOUBLE) END
        |    AS null_frac_base,
        |  c.mean AS mean_cur, b.mean AS mean_base,
        |  c.mean - b.mean AS mean_delta,
        |  coalesce(c.min_num < b.min_num OR c.max_num > b.max_num
        |      OR c.min_str < b.min_str OR c.max_str > b.max_str, false)
        |    AS range_widened
        |FROM cur c FULL OUTER JOIN base b ON c."column" = b."column"
        |ORDER BY c."column"""".stripMargin,
    // CMS store rollup: disjoint shards make the union the whole table
    // and elementwise addition makes the rollup bit-equal to the
    // whole-corpus sketch — identical md5 row-salted buckets, estimate =
    // min over the 4 rows, never-crawled probes read empty buckets (0)
    "q_cms_store_rollup" ->
      """WITH src AS (SELECT source FROM documents),
        |probes AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS exact
        |  FROM src GROUP BY source
        |  UNION ALL
        |  SELECT 'uncrawled://' || i::VARCHAR, CAST(0 AS BIGINT)
        |  FROM generate_series(0, 4) AS g(i)),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |bkt AS (SELECT r,
        |          ('0x' || substr(md5(r::VARCHAR || ':' || source), 1, 8))::BIGINT
        |            % 256 AS b,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM src CROSS JOIN rs GROUP BY 1, 2)
        |SELECT p.source, p.exact, min(coalesce(bk.n, 0)) AS estimate
        |FROM probes p CROSS JOIN rs r
        |LEFT JOIN bkt bk ON bk.r = r.r
        |  AND bk.b = ('0x' || substr(md5(r.r::VARCHAR || ':' || p.source), 1, 8))::BIGINT
        |    % 256
        |GROUP BY p.source, p.exact
        |ORDER BY p.source""".stripMargin,
    // profile rollup: disjoint shards make the union the whole table;
    // counts add, min/max fold, DECIMAL sums add exactly — so the
    // per-version stamps roll up bit-equal to these whole-corpus stats
    "q_profile_rollup" ->
      """WITH p1 AS (SELECT 'doc_id' AS "column", 'bigint' AS dtype,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
        |    CAST(min(doc_id) AS DOUBLE) AS min_num,
        |    CAST(max(doc_id) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str,
        |    CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(sum(CAST(doc_id AS DECIMAL(28,4))) AS DOUBLE) AS sum_num,
        |    CAST(sum(CAST(doc_id AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(doc_id) AS DOUBLE) AS mean
        |  FROM documents),
        |p2 AS (SELECT 'lang', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(lang) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(lang), max(lang),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM documents),
        |p3 AS (SELECT 'n_chars', 'bigint', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(n_chars) AS BIGINT),
        |    CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE),
        |    CAST(sum(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(n_chars) AS DOUBLE)
        |  FROM documents),
        |p4 AS (SELECT 'source', 'string', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(source) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(source), max(source),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM documents)
        |SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
        |ORDER BY "column"""".stripMargin,
    "q_stream_confusion" ->
      """WITH sc AS (SELECT ts,
        |    CAST(value AS DOUBLE) / 512.0 AS s,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |cm AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
        |          AS hour_epoch,
        |    CAST(sum(CASE WHEN s >= 0.3 THEN 1 ELSE 0 END * y) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN s >= 0.3 THEN 1 ELSE 0 END * (1 - y)) AS BIGINT) AS fp,
        |    CAST(sum((1 - CASE WHEN s >= 0.3 THEN 1 ELSE 0 END) * (1 - y)) AS BIGINT) AS tn,
        |    CAST(sum((1 - CASE WHEN s >= 0.3 THEN 1 ELSE 0 END) * y) AS BIGINT) AS fn
        |  FROM sc GROUP BY 1),
        |pr AS (SELECT hour_epoch, tp, fp, tn, fn,
        |    CASE WHEN tp + fp > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |    CASE WHEN tp + fn > 0 THEN
        |      CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
        |  FROM cm)
        |SELECT hour_epoch, tp, fp, tn, fn, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |        AND precision + recall > 0.0 THEN
        |    ((2.0 * precision) * recall) / (precision + recall) END AS f1
        |FROM pr ORDER BY hour_epoch""".stripMargin,
    "q_stream_bloom" ->
      // the streamed windows OR to the whole-corpus filter, so the
      // oracle probes the batch position set over the raw table —
      // member(p) iff all 3 md5 positions of p were set by some user_id
      """WITH ks AS (SELECT DISTINCT user_id::VARCHAR AS k FROM events
        |            WHERE user_id IS NOT NULL),
        |hs AS (SELECT unnest(generate_series(0, 2)) AS i),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(i::VARCHAR || ':' || k), 1, 8))::BIGINT
        |      % 2048 AS pos
        |  FROM ks, hs),
        |probes AS (
        |  SELECT k AS probe FROM ks
        |  UNION ALL
        |  SELECT 'ghost:' || CAST(x AS VARCHAR) AS probe
        |  FROM (SELECT unnest(generate_series(0, 49)) AS x)),
        |pp AS (SELECT probe,
        |    ('0x' || substr(md5(i::VARCHAR || ':' || probe), 1, 8))::BIGINT
        |      % 2048 AS pos
        |  FROM probes, hs)
        |SELECT probe, bool_and(bits.pos IS NOT NULL) AS member
        |FROM pp LEFT JOIN bits ON pp.pos = bits.pos
        |GROUP BY probe ORDER BY probe""".stripMargin,
    "q_stream_freq" ->
      """WITH ks AS (SELECT user_id::VARCHAR AS k, user_id FROM events
        |            WHERE user_id IS NOT NULL),
        |top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact FROM ks
        |        GROUP BY user_id ORDER BY exact DESC, user_id ASC LIMIT 10),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |bkt AS (SELECT r,
        |          ('0x' || substr(md5(r::VARCHAR || ':' || k), 1, 8))::BIGINT
        |            % 256 AS b,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM ks CROSS JOIN rs GROUP BY 1, 2)
        |SELECT t.user_id, t.exact, min(bk.n) AS estimate
        |FROM top t CROSS JOIN rs r
        |JOIN bkt bk ON bk.r = r.r
        |  AND bk.b = ('0x' || substr(md5(r.r::VARCHAR || ':' || t.user_id::VARCHAR), 1, 8))::BIGINT
        |    % 256
        |GROUP BY t.user_id, t.exact
        |ORDER BY t.user_id""".stripMargin,
    // per-hour bottom-8: the streamed KmvAgg buffer is deterministic, so
    // the oracle is the identical per-hour md5 rank over the raw table
    "q_stream_kmv" ->
      """WITH hs AS (
        |  SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
        |      AS hour_epoch,
        |    md5(user_id::VARCHAR) AS h, user_id::VARCHAR AS sample_key
        |  FROM events WHERE user_id IS NOT NULL),
        |rk AS (SELECT hour_epoch, h, sample_key,
        |         row_number() OVER (PARTITION BY hour_epoch ORDER BY h)
        |           AS rn
        |       FROM hs)
        |SELECT hour_epoch, h, sample_key FROM rk WHERE rn <= 8
        |ORDER BY hour_epoch, h""".stripMargin,
    // the store rollup merges three disjoint per-version bottom-128
    // sketches; determinism makes that bit-equal to bottom-128 over the
    // whole corpus
    "q_bloom_store_rollup" ->
      """WITH ks AS (SELECT DISTINCT text FROM documents
        |            WHERE text IS NOT NULL),
        |hs AS (SELECT unnest(generate_series(0, 2)) AS i),
        |bits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(i::VARCHAR || ':' || text), 1, 8))::BIGINT
        |      % 4096 AS pos
        |  FROM ks, hs),
        |probes AS (
        |  SELECT DISTINCT text AS probe FROM documents
        |  WHERE doc_id % 7 = 0 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT 'uncrawled:' || CAST(x AS VARCHAR) AS probe
        |  FROM (SELECT unnest(generate_series(0, 99)) AS x)),
        |pp AS (SELECT probe,
        |    ('0x' || substr(md5(i::VARCHAR || ':' || probe), 1, 8))::BIGINT
        |      % 4096 AS pos
        |  FROM probes, hs)
        |SELECT probe, bool_and(bits.pos IS NOT NULL) AS member
        |FROM pp LEFT JOIN bits ON pp.pos = bits.pos
        |GROUP BY probe ORDER BY probe""".stripMargin,
    "q_kmv_store_rollup" ->
      """WITH hs AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL),
        |bk AS (SELECT h FROM hs ORDER BY h LIMIT 128),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
        |        FROM bk)
        |SELECT n_kept,
        |  CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
        |       ELSE (CAST(128 AS DOUBLE) - 1.0) /
        |         (CAST(('0x' || substr(kth, 1, 15))::BIGINT AS DOUBLE)
        |           / 1152921504606846976.0) END AS estimate
        |FROM agg""".stripMargin
  )

  private def versionHistorySql: String =
    """WITH v1 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |            FROM orders WHERE o_orderkey % 7 <> 0),
      |v2 AS (SELECT o_orderkey, o_custkey,
      |         CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |       FROM orders WHERE o_orderkey % 5 <> 0),
      |v3 AS (SELECT o_orderkey, o_custkey,
      |         CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |       FROM orders WHERE o_orderkey % 4 <> 0),
      |u AS (SELECT 1 AS v, * FROM v1 UNION ALL SELECT 2, * FROM v2
      |      UNION ALL SELECT 3, * FROM v3),
      |m AS (SELECT *, CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v - 1
      |        OR lag(ROW(o_custkey, o_orderstatus, o_totalprice)) OVER w
      |           IS DISTINCT FROM ROW(o_custkey, o_orderstatus, o_totalprice)
      |      THEN 1 ELSE 0 END AS chg
      |      FROM u WINDOW w AS (PARTITION BY o_orderkey ORDER BY v)),
      |g AS (SELECT *, sum(chg) OVER (PARTITION BY o_orderkey ORDER BY v) AS run
      |      FROM m)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  CAST(min(v) AS BIGINT) AS valid_from, CAST(max(v) AS BIGINT) AS valid_to,
      |  max(v) = 3 AS is_current
      |FROM g
      |GROUP BY o_orderkey, o_custkey, o_orderstatus, o_totalprice, run
      |ORDER BY o_orderkey, valid_from""".stripMargin

  /** The CDC change set between the two deterministic order "versions"
    * (see ExtendedQueries.versionPair) — stated as the same null-safe
    * FULL OUTER JOIN classification the Spark operator performs. */
  private def VersionDiffSql: String =
    """SELECT o_orderkey, op,
      |  CASE WHEN op = 'update' THEN changed END AS changed_cols
      |FROM (
      |  SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
      |    CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
      |         WHEN v2.o_orderkey IS NULL THEN 'delete'
      |         WHEN concat_ws(',',
      |           CASE WHEN v1.o_custkey IS DISTINCT FROM v2.o_custkey THEN 'o_custkey' END,
      |           CASE WHEN v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus THEN 'o_orderstatus' END,
      |           CASE WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice THEN 'o_totalprice' END) <> ''
      |         THEN 'update' END AS op,
      |    concat_ws(',',
      |      CASE WHEN v1.o_custkey IS DISTINCT FROM v2.o_custkey THEN 'o_custkey' END,
      |      CASE WHEN v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus THEN 'o_orderstatus' END,
      |      CASE WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice THEN 'o_totalprice' END) AS changed
      |  FROM
      |    (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |     FROM orders WHERE o_orderkey % 7 <> 0) v1
      |  FULL OUTER JOIN
      |    (SELECT o_orderkey, o_custkey,
      |       CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      |     FROM orders WHERE o_orderkey % 5 <> 0) v2
      |  ON v1.o_orderkey = v2.o_orderkey) c
      |WHERE op IS NOT NULL""".stripMargin
}
