package graft.queries

/** DuckDB oracles for [[TpchQueries]] — the remaining 16 TPC-H silhouettes.
  *
  * Conventions shared with [[AnalyticsOracles]]: all revenue/quantity sums
  * in exact DECIMAL cast to DOUBLE at the end; integer sums cast to BIGINT
  * (DuckDB widens to HUGEINT, Spark to LONG); `year()` cast to INTEGER to
  * match Spark's `F.year`. Threshold comparisons against engine-widened
  * DECIMAL sums are done in DOUBLE with the identical IEEE expression the
  * Spark side uses, so no precision-rule divergence can flip a row.
  */
object TpchOracles {
  private val rev =
    """sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))""".stripMargin
  private val vol =
    """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |euro AS (
        |  SELECT l_partkey, supplycost, s_acctbal, s_name, n_name
        |  FROM ps
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |mc AS (SELECT l_partkey, min(supplycost) AS m FROM euro GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supplycost
        |FROM euro
        |JOIN mc ON euro.l_partkey = mc.l_partkey AND supplycost = m
        |JOIN part ON p_partkey = euro.l_partkey
        |WHERE p_size BETWEEN 10 AND 15 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q7" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(sum(volume) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS INTEGER) AS l_year, $vol AS volume
         |  FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
         |                       AND TIMESTAMP '1997-12-31') shipping
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      s"""SELECT o_year,
         |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, $vol AS volume,
         |    n2.n_name AS nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
         |                        AND TIMESTAMP '1997-12-31') all_nations
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q9" ->
      s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |    $vol
         |    - CAST(l_quantity AS DECIMAL(18,2)) *
         |      CAST(p_retailprice AS DECIMAL(18,2)) *
         |      CAST(0.5 AS DECIMAL(18,2)) AS amount
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%gear%') profit
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey AS p_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_5'
        |  GROUP BY 1),
        |thr AS (SELECT sum(value) AS total FROM val)
        |SELECT p_partkey, CAST(value AS DOUBLE) AS value
        |FROM val, thr
        |WHERE CAST(value AS DOUBLE) > CAST(total AS DOUBLE) / 1000.0
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |       AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q14" ->
      s"""SELECT 100.0 *
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $vol
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST($rev AS DOUBLE) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q_tpch_q15" ->
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, $rev AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q17" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  count(*) AS n_small
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN pp ON pp.l_partkey = lineitem.l_partkey
        |WHERE p_brand = 'Brand#23' AND p_size <= 10
        |  AND CAST(l_quantity AS DOUBLE) * 2.0 * cnt < CAST(sum_qty AS DOUBLE)""".stripMargin,
    "q_tpch_q19" ->
      s"""SELECT CAST($rev AS DOUBLE) AS revenue, count(*) AS n_rows
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q20" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM red)
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, sum(sq) AS tq FROM shipped GROUP BY 1)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey)
        |    WHERE CAST(sq AS DOUBLE) * 10.0 > CAST(tq AS DOUBLE) * 3.0)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q_tpch_q22" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey % 10 AS cntrycode,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_nationkey % 10 IN (1, 3, 4, 7, 8, 9)),
        |thr AS (
        |  SELECT sum(bal) AS tot, count(*) AS cnt FROM pool
        |  WHERE bal > CAST(0 AS DECIMAL(18,2)))
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(bal) AS DOUBLE) AS totacctbal
        |FROM pool, thr
        |WHERE CAST(bal AS DOUBLE) * cnt > CAST(tot AS DOUBLE)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
