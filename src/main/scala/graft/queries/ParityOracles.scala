package graft.queries

/** DuckDB oracles for [[ParityQueries]]. DuckDB specifics leaned on: NaN
  * compares equal to itself and sorts greatest; median interpolates on
  * numeric inputs; strftime/strptime take chrono formats natively (the Spark
  * side goes through the chrono→Java translator — this is the translator's
  * differential test). */
object ParityOracles {
  private val bizRoll =
    """CASE WHEN isodow(d0) = 6 THEN d0 + 2 WHEN isodow(d0) = 7 THEN d0 + 1 ELSE d0 END"""
  private def bizAdd(n: Int): String = {
    val weeks = n / 5
    val rem = n % 5
    s"""(CASE WHEN (isodow($bizRoll) - 1 + $rem) >= 5
       |  THEN $bizRoll + ${weeks * 7 + rem + 2}
       |  ELSE $bizRoll + ${weeks * 7 + rem} END)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_nan_handling" ->
      """SELECT c_custkey,
        |  isnan(v) AS v_is_nan,
        |  CASE WHEN isnan(v) THEN 0.0 ELSE v END AS v_filled,
        |  NOT isnan(v) AS v_not_nan
        |FROM (SELECT c_custkey,
        |        CASE WHEN c_custkey % 10 = 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END AS v
        |      FROM customer) t
        |ORDER BY c_custkey LIMIT 400""".stripMargin,
    "q_drop_nans" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(CASE WHEN isnan(v) THEN NULL ELSE v END AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        |FROM (SELECT CASE WHEN c_custkey % 10 = 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END AS v
        |      FROM customer) t
        |WHERE NOT isnan(v)""".stripMargin,
    "q_agg_median" ->
      """SELECT o_orderstatus,
        |  median(o_totalprice) AS med_price,
        |  median(CAST(o_custkey AS DOUBLE)) AS med_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_strftime" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS eu_full,
        |  strftime(o_orderdate, '%Y|%j') AS year_doy
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_str_dt_roundtrip" ->
      """SELECT o_orderkey,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts,
        |  CAST(CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS DATE) AS TIMESTAMP) AS parsed_day
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_business_days" ->
      s"""SELECT o_orderkey, CAST(d0 AS TIMESTAMP) AS d0,
         |  CAST(${bizAdd(3)} AS TIMESTAMP) AS d_plus3,
         |  CAST(${bizAdd(10)} AS TIMESTAMP) AS d_plus10
         |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0 FROM orders) t
         |ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_duration_totals" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', date_trunc('year', o_orderdate), o_orderdate) AS BIGINT) AS tot_d,
        |  CAST(date_diff('hour', date_trunc('year', o_orderdate), o_orderdate) AS BIGINT) AS tot_h,
        |  CAST(date_diff('second', date_trunc('year', o_orderdate), o_orderdate) AS BIGINT) AS tot_s
        |FROM orders ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_reinterpret" ->
      """SELECT c_custkey,
        |  CAST(CASE WHEN -c_custkey < 0
        |    THEN CAST(-c_custkey AS DECIMAL(20,0)) + 18446744073709551616
        |    ELSE CAST(-c_custkey AS DECIMAL(20,0)) END AS VARCHAR) AS as_unsigned,
        |  CAST(CAST(c_custkey AS DECIMAL(20,0)) AS VARCHAR) AS pos_unsigned
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin,
    "q_concat_diag_relaxed" ->
      """SELECT k, name, seg FROM (
        |  SELECT CAST(n_nationkey AS DOUBLE) AS k, n_name AS name, CAST(NULL AS VARCHAR) AS seg FROM nation
        |  UNION ALL
        |  SELECT c_acctbal AS k, CAST(NULL AS VARCHAR) AS name, c_mktsegment AS seg
        |  FROM customer WHERE c_custkey <= 20
        |) t ORDER BY k ASC NULLS FIRST, name ASC NULLS FIRST""".stripMargin,
    "q_membership" ->
      """SELECT o_orderkey, o_orderpriority,
        |  o_totalprice >= 50000.0 AND o_totalprice < 100000.0 AS left_open,
        |  o_totalprice > 50000.0 AND o_totalprice <= 100000.0 AS right_open
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey LIMIT 400""".stripMargin,
    "q_unnest" ->
      """SELECT c_custkey, c_name AS cn, c_acctbal * 2 AS bal2
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin,
    "q_clear" ->
      "SELECT n_nationkey, n_name FROM nation WHERE false"
  )
}
