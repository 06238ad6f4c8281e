package graft.queries

/** DuckDB oracle SQL for [[RelationalQueries]] — same column names, same
  * deterministic ordering, types aligned to the Spark results (DuckDB's
  * BIGINT-returning length/rank/year are cast to INTEGER where Spark returns
  * int; HUGEINT sums avoided by going through DECIMAL(18,2) → DOUBLE). */
object RelationalOracles {
  private val decSum = (c: String) => s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSum("l_quantity")} AS sum_qty,
         |  ${decSum("l_extendedprice")} AS sum_price,
         |  ${decSum("l_discount")} / count(*) AS avg_disc,
         |  count(DISTINCT l_orderkey) AS n_orders,
         |  count(*) AS n_rows
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_agg_filtered" ->
      s"""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_returned,
         |  ${decSum("l_quantity")} AS qty_all
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_shortcut_minmax" ->
      """SELECT o_orderstatus, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  count(DISTINCT o_custkey) AS n_cust, count(o_orderkey) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_whole_frame" ->
      s"""SELECT ${decSum("l_extendedprice")} AS total_price,
         |  count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows FROM lineitem""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount BETWEEN 0.02 AND 0.05
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,
    "q_with_columns" ->
      """SELECT p_partkey,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST('1.10' AS DECIMAL(3,2)) AS DOUBLE) AS markup,
        |  upper(p_name) AS name_upper,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin,
    "q_slice" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,
    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
        |  CAST(l_linenumber AS VARCHAR) AS line_str,
        |  CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_dec
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""".stripMargin,
    "q_rename_drop" ->
      "SELECT n_nationkey, n_name AS nation_name FROM nation ORDER BY n_nationkey",
    "q_join_inner" ->
      s"""SELECT c_mktsegment, ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_left" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         |  COALESCE(${decSum("o_totalprice")}, 0.0) AS spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,
    "q_join_full_coalesce" ->
      """SELECT COALESCE(a.nationkey, b.nationkey) AS nationkey,
        |  COALESCE(n_supp, 0) AS n_supp, COALESCE(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) a
        |FULL JOIN (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) b
        |  ON a.nationkey = b.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_join_cross" ->
      """SELECT a.r_name AS r_name, b.r_name AS r_name2
        |FROM region a CROSS JOIN region b ORDER BY 1, 2""".stripMargin,
    "q_join_three_way" ->
      s"""SELECT r_name, ${decSum("c_acctbal")} AS acct_sum, count(*) AS n_cust
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sort_nulls" ->
      """SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer
        |ORDER BY bal DESC NULLS LAST, c_custkey ASC LIMIT 200""".stripMargin,
    "q_unique_any" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_unique_none" ->
      """SELECT o_orderkey, o_custkey FROM (
        |  SELECT o_orderkey, o_custkey, count(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders) t
        |WHERE cnt = 1 ORDER BY o_orderkey""".stripMargin,
    "q_concat_vertical" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 1000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_concat_diagonal" ->
      """SELECT k, name, extra FROM (
        |  SELECT r_regionkey AS k, r_name AS name, CAST(NULL AS INTEGER) AS extra FROM region
        |  UNION ALL
        |  SELECT n_nationkey AS k, CAST(NULL AS VARCHAR) AS name, n_regionkey AS extra FROM nation
        |) t ORDER BY k ASC, name ASC NULLS FIRST""".stripMargin,
    "q_fill_drop_nulls" ->
      """SELECT c_custkey, bal, COALESCE(bal, 0.0) AS bal_filled FROM (
        |  SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer) t
        |WHERE bal IS NOT NULL ORDER BY c_custkey LIMIT 300""".stripMargin,
    "q_rank" ->
      """SELECT s_suppkey,
        |  CAST(rank() OVER (ORDER BY s_acctbal DESC) AS INTEGER) AS rank_min,
        |  CAST(dense_rank() OVER (ORDER BY s_acctbal DESC) AS INTEGER) AS rank_dense
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_diff" ->
      """SELECT o_orderkey,
        |  o_totalprice - lag(o_totalprice) OVER (ORDER BY o_orderkey) AS price_diff
        |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 1000) t
        |ORDER BY o_orderkey""".stripMargin,
    "q_is_unique" ->
      """SELECT c_custkey, cnt = 1 AS uniq_bal FROM (
        |  SELECT c_custkey, count(*) OVER (PARTITION BY c_acctbal) AS cnt FROM customer) t
        |ORDER BY c_custkey LIMIT 500""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount), 2) AS disc_abs,
        |  round(sqrt(l_quantity), 4) AS qty_sqrt,
        |  round(ln(l_extendedprice), 4) AS price_ln,
        |  round(log10(l_extendedprice), 4) AS price_log10,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 400""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_up,
        |  lower(p_brand) AS brand_lo,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_name, 1, 8) AS name_head,
        |  replace(p_brand, '#', '-') AS brand_dash,
        |  contains(p_name, 'green') AS has_green,
        |  starts_with(p_type, 'STANDARD') AS is_standard,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        |FROM part ORDER BY p_partkey LIMIT 400""".stripMargin,
    "q_string_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_first,
        |  CAST(length(regexp_extract_all(p_name, 'a')) AS INTEGER) AS n_a,
        |  regexp_matches(p_type, 'BRUSHED') AS is_brushed
        |FROM part ORDER BY p_partkey LIMIT 400""".stripMargin,
    "q_dt_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "q_dt_trunc_agg" ->
      s"""SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
         |  ${decSum("o_totalprice")} AS rev
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
        |  WHEN o_totalprice < 200000.0 THEN 'mid' ELSE 'high' END AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_safe_eq" ->
      """SELECT c_custkey, nk IS NOT DISTINCT FROM 5 AS eqm_5, nk IS NULL AS eqm_null
        |FROM (SELECT c_custkey, CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
        |      FROM customer) t
        |ORDER BY c_custkey LIMIT 400""".stripMargin,
    "q_grok" ->
      """SELECT o_orderkey, o_orderpriority AS prio, o_orderstatus AS status,
        |  o_orderkey AS okey, o_totalprice AS price
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin
  )
}
