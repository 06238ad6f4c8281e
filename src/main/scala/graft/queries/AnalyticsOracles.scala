package graft.queries

/** DuckDB oracles for [[AnalyticsQueries]]. Revenue is exact DECIMAL(18,2)
  * arithmetic cast to DOUBLE at the end, so the sum is order-independent
  * and hash-matches Spark bit-for-bit. */
object AnalyticsOracles {
  private val rev =
    """sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
        |           (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
        |    AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST($rev AS DOUBLE) AS rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-06-01'
         |  AND l_shipdate > TIMESTAMP '1995-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY rev DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      s"""SELECT n_name, CAST($rev AS DOUBLE) AS rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY rev DESC, n_name ASC""".stripMargin,
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST($rev AS DOUBLE) AS rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY rev DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_quality" ->
      // copies share text+lang, so any-survivor dedup (rn=1) matches the
      // stream's arrival-order dropDuplicates for this aggregate
      """WITH all_docs AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, text FROM documents WHERE doc_id < 100),
        |uniq AS (
        |  SELECT lang, text,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM all_docs),
        |s AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS word_count,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |      / nullif(len(regexp_extract_all(text, '\S+')), 0) AS mean_word_len,
        |    CAST(len(regexp_extract_all(text, '#'))
        |       + len(regexp_extract_all(text, '\.\.\.|…')) AS DOUBLE)
        |      / nullif(len(regexp_extract_all(text, '\S+')), 0) AS symbol_ratio,
        |    CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS DOUBLE)
        |      / nullif(len(regexp_extract_all(text, '\S+')), 0) AS alpha_word_frac,
        |    CAST(len(list_intersect(
        |      list_distinct(string_split_regex(lower(text), '\s+')),
        |      ['the','be','to','of','and','that','have','with'])) AS INTEGER)
        |      AS stopword_hits
        |  FROM uniq WHERE rn = 1),
        |q AS (
        |  SELECT lang,
        |    CASE WHEN word_count > 0 THEN
        |      0.15e0 * (least(word_count, 256) / 256e0)
        |      + 0.15e0 * (1e0 - least(abs(mean_word_len - 5e0), 5e0) / 5e0)
        |      + 0.2e0 * (1e0 - least(symbol_ratio * 10e0, 1e0))
        |      + 0.3e0 * least(alpha_word_frac, 1e0)
        |      + 0.2e0 * (least(stopword_hits, 4) / 4e0)
        |    END AS quality_score
        |  FROM s)
        |SELECT lang, count(*) AS n_quality_docs
        |FROM q WHERE quality_score >= 0.6e0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_join" ->
      """SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        | AND a.event_id < b.event_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q_stream_dedup" ->
      """SELECT lang, COUNT(DISTINCT md5(text)) AS n_unique_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
