package graft.queries

/** DuckDB oracles for the round-13 model/analysis gates. The PCA,
  * cross-validation, and PageRank oracles REPLAY the full iterative
  * trajectory (the [[graft.pipeline.QualityModel]] fixed-point
  * convention: corpus-wide double sums as floor(t·2^20 + 0.5)
  * DECIMAL(38,0); bounded double folds as `list(x ORDER BY i)` +
  * `list_reduce(list_prepend(0.0, …))`, matching the Spark side's
  * pinned ascending-index association). */
object ModelOracles {

  /** Shared PCA replay: means, centered values, and three power-
    * iteration (sᵏ → gᵏ → uᵏ → ‖uᵏ‖ → vᵏ) blocks, each stating exactly
    * the arithmetic of [[graft.pipeline.Pca.fit]]'s k-th pass. The v0
    * start is uniform 1/√64 = 0.125 (exact). Ends after the v3 CTE
    * (no trailing comma — re-add `,` when appending CTEs). */
  /** One power-iteration CTE block (projection fold, fixed-point grad,
    * norm, normalized iterate) over a (vec_id, i, xc) source relation;
    * `pfx` namespaces the chain so the deflated second-component run
    * can follow the first in the same query. */
  private def pcaIter(k: Int, pfx: String, src: String): String =
    s"""${pfx}s$k AS MATERIALIZED (SELECT vec_id,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(xc.xc * vv.v ORDER BY xc.i)), (a, b) -> a + b) AS s
       |  FROM $src xc JOIN ${pfx}v${k - 1} vv USING (i) GROUP BY vec_id),
       |${pfx}g$k AS MATERIALIZED (SELECT xc.i,
       |  sum(CAST(floor((xc.xc * sk.s) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS g
       |  FROM $src xc JOIN ${pfx}s$k sk USING (vec_id) GROUP BY xc.i),
       |${pfx}u$k AS MATERIALIZED (SELECT i, CAST(g AS DOUBLE) / 1048576.0 AS u FROM ${pfx}g$k),
       |${pfx}n$k AS MATERIALIZED (SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(u * u ORDER BY i)), (a, b) -> a + b)) AS nrm FROM ${pfx}u$k),
       |${pfx}v$k AS MATERIALIZED (SELECT i, u / nrm AS v FROM ${pfx}u$k, ${pfx}n$k),
       |""".stripMargin

  private val pcaPrefix: String = {
    val iters = (1 to 3).map(k => pcaIter(k, "", "xc")).mkString
    ("""WITH e AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
       |x AS MATERIALIZED (SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM e, range(1, 65) t(i)),
       |ms AS (SELECT i, sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
       |  FROM x GROUP BY i),
       |m AS MATERIALIZED (SELECT i, (CAST(s AS DOUBLE) / 1048576.0) / nn.n AS m FROM ms, nn),
       |xc AS MATERIALIZED (SELECT vec_id, x.i, x.x - m.m AS xc FROM x JOIN m USING (i)),
       |v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM range(1, 65) t(i)),
       |""".stripMargin + iters).stripSuffix(",\n") + "\n"
  }

  /** One cross-validation fold: train-set count, three GD iterations
    * filtered to the other folds (the q_quality_lr algebra), then the
    * exact midrank AUC of the trained scores on the held-out fold. */
  private def cvFold(f: Int): String = {
    def iter(k: Int): String = {
      val prev = s"w${f}_${k - 1}"
      s"""g${f}_$k AS (SELECT
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * 1.0) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS ga,
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gb,
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gc
         |  FROM f, $prev WHERE f.fold <> $f),
         |w${f}_$k AS (SELECT
         |  wa - ((CAST(ga AS DOUBLE) / 1048576.0) / nt$f.n) AS wa,
         |  wb - ((CAST(gb AS DOUBLE) / 1048576.0) / nt$f.n) AS wb,
         |  wc - ((CAST(gc AS DOUBLE) / 1048576.0) / nt$f.n) AS wc
         |  FROM g${f}_$k, $prev, nt$f),
         |""".stripMargin
    }
    s"""nt$f AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f WHERE fold <> $f),
       |w${f}_0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
       |""".stripMargin + iter(1) + iter(2) + iter(3) +
      s"""h$f AS (SELECT
         |    (1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) AS s, y
         |  FROM f, w${f}_3 WHERE f.fold = $f),
         |r$f AS (SELECT s, y, rank() OVER (ORDER BY s) AS rk FROM h$f),
         |cc$f AS (SELECT s, count(*) AS c FROM h$f GROUP BY s),
         |a$f AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(sum(1 - y) AS BIGINT) AS n_neg,
         |    CAST(sum(CASE WHEN y = 1 THEN 2 * r.rk + cc.c - 1 ELSE 0 END) AS BIGINT) AS r2
         |  FROM r$f r JOIN cc$f cc USING (s)),
         |row$f AS (SELECT $f AS fold, CAST(nt$f.n AS BIGINT) AS n_train,
         |    n_pos, n_neg,
         |    CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |      ((CAST(r2 AS DOUBLE) / 2.0 -
         |        CAST(n_pos * (n_pos + 1) AS DOUBLE) / 2.0) /
         |       CAST(n_pos * n_neg AS DOUBLE)) END AS auc,
         |    wa AS w0, wb AS w1, wc AS w2
         |  FROM a$f, w${f}_3, nt$f),
         |""".stripMargin
  }

  /** PageRank replay chain: symmetric trade graph, degrees, then five
    * damped iterations with fixed-point per-edge contribution sums.
    * `pfx` namespaces the chain (drift oracles run two); `orderWhere`
    * optionally restricts the order snapshot. Ends with a trailing
    * comma. */
  private def prChain(pfx: String, orderWhere: String): String = {
    val iters = (1 to 5).map { k =>
      s"""c$pfx$k AS MATERIALIZED (SELECT ed.v AS node,
         |  sum(CAST(floor((r."rank" / dg.deg) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
         |  FROM ed$pfx ed JOIN dg$pfx dg USING (u)
         |  JOIN r$pfx${k - 1} r ON r.node = ed.u
         |  GROUP BY ed.v),
         |r$pfx$k AS MATERIALIZED (SELECT n.node,
         |  ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn$pfx.n) + 0.85 *
         |    (CAST(coalesce(c.s, CAST(0 AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0) AS "rank"
         |  FROM nodes$pfx n LEFT JOIN c$pfx$k c USING (node), nn$pfx),
         |""".stripMargin
    }.mkString
    s"""ed0$pfx AS (SELECT DISTINCT
       |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
       |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  $orderWhere),
       |ed$pfx AS (SELECT u, v FROM ed0$pfx
       |  UNION ALL SELECT v AS u, u AS v FROM ed0$pfx),
       |nodes$pfx AS MATERIALIZED (SELECT DISTINCT u AS node FROM ed$pfx),
       |nn$pfx AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes$pfx),
       |dg$pfx AS MATERIALIZED (SELECT u, CAST(count(*) AS DOUBLE) AS deg
       |  FROM ed$pfx GROUP BY u),
       |r${pfx}0 AS (SELECT node, 1.0 / nn$pfx.n AS "rank" FROM nodes$pfx, nn$pfx),
       |""".stripMargin + iters
  }

  private val prPrefix: String =
    ("WITH " + prChain("", "")).stripSuffix(",\n") + "\n"

  /** Deflated SECOND-component chain (prior projection p2, residual xd,
    * three namespaced power-iteration blocks ending at dv3) — appended
    * after [[pcaPrefix]]'s stripped chain; ends WITHOUT a trailing
    * comma. States exactly [[graft.pipeline.Pca.fitDeflatedK]]'s
    * one-prior arithmetic. */
  private val pcaChain2: String =
    """p2 AS MATERIALIZED (SELECT xc.vec_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(xc.xc * w.v ORDER BY xc.i)), (a, b) -> a + b) AS p
      |  FROM xc JOIN v3 w USING (i) GROUP BY xc.vec_id),
      |xd AS MATERIALIZED (SELECT xc.vec_id, xc.i, xc.xc - (p2.p * w.v) AS xc
      |  FROM xc JOIN p2 USING (vec_id) JOIN v3 w USING (i)),
      |dv0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM range(1, 65) t(i)),
      |""".stripMargin +
      (1 to 3).map(k => pcaIter(k, "d", "xd")).mkString.stripSuffix(",\n")

  /** THIRD-component chain: both prior projections (p2 from
    * [[pcaChain2]], p3b against dv3), the residual deflated LEFT TO
    * RIGHT — (xc − p1·w1) − p2·w2, the exact double sequence of
    * [[graft.pipeline.Pca.fitDeflatedK]] with two priors — then three
    * more power-iteration blocks ending at ev3. No trailing comma. */
  private val pcaChain3: String =
    """p3b AS MATERIALIZED (SELECT xc.vec_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(xc.xc * w.v ORDER BY xc.i)), (a, b) -> a + b) AS p
      |  FROM xc JOIN dv3 w USING (i) GROUP BY xc.vec_id),
      |xe AS MATERIALIZED (SELECT xc.vec_id, xc.i,
      |  (xc.xc - (p2.p * w1.v)) - (p3b.p * w2.v) AS xc
      |  FROM xc JOIN p2 USING (vec_id) JOIN p3b USING (vec_id)
      |  JOIN v3 w1 USING (i) JOIN dv3 w2 USING (i)),
      |ev0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM range(1, 65) t(i)),
      |""".stripMargin +
      (1 to 3).map(k => pcaIter(k, "e", "xe")).mkString.stripSuffix(",\n")

  /** Personalized-PageRank replay: the symmetric trade graph, the
    * seed flag (nation-0 customers ∩ graph nodes), s = 1/K, and five
    * damped iterations whose teleport term lands only on seeds —
    * states exactly [[graft.pipeline.GraphRank.pagerankPersonalized]]'s
    * arithmetic (base = (1−d)·(1/K) with the literal-difference cast
    * to DOUBLE, contribution sums in fixed point). */
  private val pprOracle: String = {
    val iters = (1 to 5).map { k =>
      s"""c$k AS MATERIALIZED (SELECT ed.v AS node,
         |  sum(CAST(floor((r."rank" / dg.deg) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
         |  FROM ed JOIN dg USING (u)
         |  JOIN r${k - 1} r ON r.node = ed.u
         |  GROUP BY ed.v),
         |r$k AS MATERIALIZED (SELECT n.node,
         |  (CASE WHEN n.seed THEN
         |     ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * (1.0 / kk.k))
         |   ELSE CAST(0.0 AS DOUBLE) END) + 0.85 *
         |    (CAST(coalesce(c.s, CAST(0 AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0) AS "rank"
         |  FROM ns n LEFT JOIN c$k c USING (node), kk),
         |""".stripMargin
    }.mkString
    ("""WITH ed0 AS (SELECT DISTINCT
       |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
       |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ed AS (SELECT u, v FROM ed0
       |  UNION ALL SELECT v AS u, u AS v FROM ed0),
       |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM ed),
       |sd AS (SELECT DISTINCT 'c:' || CAST(c_custkey AS VARCHAR) AS node
       |  FROM customer WHERE c_nationkey = 0),
       |ns AS MATERIALIZED (SELECT n.node, (s.node IS NOT NULL) AS seed
       |  FROM nodes n LEFT JOIN sd s ON s.node = n.node),
       |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM ns WHERE seed),
       |dg AS MATERIALIZED (SELECT u, CAST(count(*) AS DOUBLE) AS deg
       |  FROM ed GROUP BY u),
       |r0 AS (SELECT node,
       |  CASE WHEN seed THEN 1.0 / kk.k ELSE CAST(0.0 AS DOUBLE) END AS "rank"
       |  FROM ns, kk),
       |""".stripMargin + iters).stripSuffix(",\n") + "\n" +
      """SELECT node, "rank" FROM r5 ORDER BY node ASC"""
  }

  /** Label-propagation replay: the symmetric trade graph, l0 = own
    * label, three synchronous rounds (per-round (node,label) counts,
    * the row_number()=1 pick ordered (count desc, label asc) — exactly
    * [[graft.pipeline.GraphRank.labelPropagation]]'s
    * min(struct(−count, label)) argmax), ending at l3. Trailing
    * comma. */
  private val lpaChain: String = {
    val rounds = (1 to 3).map { k =>
      s"""c$k AS MATERIALIZED (SELECT ed.v AS node, l.label,
         |  CAST(count(*) AS BIGINT) AS c
         |  FROM ed JOIN l${k - 1} l ON l.node = ed.u
         |  GROUP BY ed.v, l.label),
         |b$k AS MATERIALIZED (SELECT node, label FROM (
         |  SELECT node, label, row_number() OVER (PARTITION BY node
         |    ORDER BY c DESC, label ASC) AS rk FROM c$k)
         |  WHERE rk = 1),
         |l$k AS MATERIALIZED (SELECT n.node,
         |  coalesce(b.label, p.label) AS label
         |  FROM nodes n LEFT JOIN b$k b ON b.node = n.node
         |  JOIN l${k - 1} p ON p.node = n.node),
         |""".stripMargin
    }.mkString
    """ed0 AS (SELECT DISTINCT
      |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
      |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |ed AS (SELECT u, v FROM ed0
      |  UNION ALL SELECT v AS u, u AS v FROM ed0),
      |nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM ed),
      |l0 AS (SELECT node, node AS label FROM nodes),
      |""".stripMargin + rounds
  }

  /** Model-registry replay: version 1's training (even doc_ids only,
    * three fixed-point GD iterations) and the corpus-wide scoring the
    * gate performs with the @HEAD~1-loaded weights. */
  private val registryOracle: String = {
    def iter(k: Int): String =
      s"""g$k AS (SELECT
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * 1.0) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS ga,
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gb,
         |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gc
         |  FROM f, w${k - 1} WHERE doc_id % 2 = 0),
         |w$k AS (SELECT
         |  wa - ((CAST(ga AS DOUBLE) / 1048576.0) / nn.n) AS wa,
         |  wb - ((CAST(gb AS DOUBLE) / 1048576.0) / nn.n) AS wb,
         |  wc - ((CAST(gc AS DOUBLE) / 1048576.0) / nn.n) AS wc
         |  FROM g$k, w${k - 1}, nn),
         |""".stripMargin
    """WITH f AS (
      |  SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> t <> '')) AS DOUBLE) / 100.0 AS x2,
      |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      |  FROM documents
      |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f WHERE doc_id % 2 = 0),
      |w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
      |""".stripMargin + iter(1) + iter(2) + iter(3).stripSuffix(",\n") + "\n" +
      """SELECT doc_id,
        |  (1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) AS score
        |FROM f, w3
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
  }

  /** Weighted-PageRank replay: per-edge share w/W computed once, then
    * five damped fixed-point iterations. */
  private val prwPrefix: String = {
    val iters = (1 to 5).map { k =>
      s"""c$k AS (SELECT es.v AS node,
         |  sum(CAST(floor((r."rank" * es.share) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
         |  FROM es JOIN r${k - 1} r ON r.node = es.u
         |  GROUP BY es.v),
         |r$k AS (SELECT n.node,
         |  ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n) + 0.85 *
         |    (CAST(coalesce(c.s, CAST(0 AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0) AS "rank"
         |  FROM nodes n LEFT JOIN c$k c USING (node), nn),
         |""".stripMargin
    }.mkString
    ("""WITH e0 AS (SELECT 'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
       |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v,
       |    CAST(count(*) AS DOUBLE) AS w
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1, 2),
       |ed AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
       |nodes AS (SELECT DISTINCT u AS node FROM ed),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |ws AS (SELECT u, CAST(sum(CAST(w AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS wsum
       |  FROM ed GROUP BY u),
       |es AS (SELECT ed.u, ed.v, ed.w / CAST(ws.wsum AS DOUBLE) AS share
       |  FROM ed JOIN ws USING (u)),
       |r0 AS (SELECT node, 1.0 / nn.n AS "rank" FROM nodes, nn),
       |""".stripMargin + iters).stripSuffix(",\n") + "\n"
  }

  /** HITS replay: three (authority, hub) pass pairs, each a fixed-point
    * per-node sum plus a fixed-point L2 normalization. */
  private val hitsPrefix: String = {
    def block(out: String, src: String, joinEdge: String, groupEdge: String) =
      s"""${out}r AS (SELECT ed.$groupEdge AS node,
         |  sum(CAST(floor(p.score * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
         |  FROM ed JOIN $src p ON p.node = ed.$joinEdge
         |  GROUP BY ed.$groupEdge),
         |${out}u AS (SELECT n.node,
         |  CAST(coalesce(r.s, CAST(0 AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0 AS x
         |  FROM nodes n LEFT JOIN ${out}r r USING (node)),
         |${out}n AS (SELECT sqrt(CAST(sum(CAST(floor((x * x) * 1048576.0 + 0.5)
         |    AS DECIMAL(38,0))) AS DOUBLE) / 1048576.0) AS nrm FROM ${out}u),
         |$out AS (SELECT node, x / nrm AS score FROM ${out}u, ${out}n),
         |""".stripMargin
    val iters = (1 to 3).map { k =>
      block(s"a$k", if (k == 1) "h0" else s"h${k - 1}", "u", "v") +
        block(s"h$k", s"a$k", "v", "u")
    }.mkString
    ("""WITH ed AS (SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
       |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |nodes AS (SELECT u AS node FROM ed UNION SELECT v FROM ed),
       |h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nodes),
       |""".stripMargin + iters).stripSuffix(",\n") + "\n"
  }

  /** Shared Pearson finishing over hour-grouped fixed-point sums —
    * states exactly the corrStamp/windowedCorr arithmetic. */
  private def corrSql(src: String, groupCols: String): String = {
    val g = if (groupCols.isEmpty) "" else s"$groupCols, "
    val grp = if (groupCols.isEmpty) "" else s"GROUP BY $groupCols"
    s"""a AS (SELECT ${g}CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sx,
       |    sum(CAST(floor(y * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sy,
       |    sum(CAST(floor((x * x) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sxx,
       |    sum(CAST(floor((x * y) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sxy,
       |    sum(CAST(floor((y * y) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS syy
       |  FROM $src $grp),
       |dd AS (SELECT ${g}n, CAST(n AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) / 1048576.0 AS sx,
       |    CAST(sy AS DOUBLE) / 1048576.0 AS sy,
       |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx,
       |    CAST(sxy AS DOUBLE) / 1048576.0 AS sxy,
       |    CAST(syy AS DOUBLE) / 1048576.0 AS syy
       |  FROM a)
       |SELECT ${g}n,
       |  CASE WHEN ((nd * sxx) - (sx * sx)) > 0.0
       |        AND ((nd * syy) - (sy * sy)) > 0.0 THEN
       |    ((nd * sxy) - (sx * sy)) /
       |      (sqrt((nd * sxx) - (sx * sx)) * sqrt((nd * syy) - (sy * sy)))
       |  END AS corr
       |FROM dd""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_corr_merge" ->
      ("""WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
         |    CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |""".stripMargin + corrSql("c", "")),
    "q_corr_store_rollup" ->
      ("""WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
         |    CAST(l_extendedprice AS DOUBLE) AS y
         |  FROM lineitem WHERE l_quantity IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |""".stripMargin + corrSql("c", "")),
    "q_stream_corr" ->
      ("""WITH c AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
         |      AS hour_epoch,
         |    CAST(value AS DOUBLE) AS x, CAST(user_id AS DOUBLE) AS y
         |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         |""".stripMargin + corrSql("c", "hour_epoch") +
        "\nORDER BY hour_epoch ASC"),
    "q_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id AS b,
        |    CAST(event_type AS VARCHAR) AS i
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nn AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM ut),
        |cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY i),
        |p AS (SELECT x.i AS a, y.i AS bb, CAST(count(*) AS BIGINT) AS cab
        |  FROM ut x JOIN ut y ON x.b = y.b AND x.i < y.i
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |r AS (SELECT a AS antecedent, bb AS consequent, cab FROM p
        |      UNION ALL SELECT bb, a, cab FROM p)
        |SELECT r.antecedent, r.consequent, r.cab AS n_both,
        |  ca.c AS n_ant, cb.c AS n_cons,
        |  CAST(r.cab AS DOUBLE) / nn.n AS support,
        |  CAST(r.cab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence,
        |  (CAST(r.cab AS DOUBLE) * nn.n) /
        |    (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
        |FROM r JOIN cnt ca ON ca.i = r.antecedent
        |JOIN cnt cb ON cb.i = r.consequent, nn
        |ORDER BY antecedent ASC, consequent ASC""".stripMargin,
    "q_rfm" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    value
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |u AS (SELECT user_id, max(sec) AS last,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    coalesce(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 0.0)
        |      AS monetary
        |  FROM e GROUP BY 1),
        |nw AS (SELECT max(sec) AS now FROM e),
        |b AS (SELECT user_id, nw.now - u.last AS recency_sec, frequency,
        |    monetary FROM u, nw),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
        |s1 AS (SELECT user_id, recency_sec, frequency, monetary,
        |    least(5, CAST(floor(((rk - 1) * 5) / nn.n) AS BIGINT) + 1) AS r
        |  FROM (SELECT *, row_number()
        |          OVER (ORDER BY recency_sec DESC, user_id ASC) AS rk
        |        FROM b), nn),
        |s2 AS (SELECT user_id, recency_sec, frequency, monetary, r,
        |    least(5, CAST(floor(((rk - 1) * 5) / nn.n) AS BIGINT) + 1) AS f
        |  FROM (SELECT *, row_number()
        |          OVER (ORDER BY frequency ASC, user_id ASC) AS rk
        |        FROM s1), nn),
        |s3 AS (SELECT user_id, recency_sec, frequency, monetary, r, f,
        |    least(5, CAST(floor(((rk - 1) * 5) / nn.n) AS BIGINT) + 1) AS m
        |  FROM (SELECT *, row_number()
        |          OVER (ORDER BY monetary ASC, user_id ASC) AS rk
        |        FROM s2), nn)
        |SELECT user_id, recency_sec, frequency, monetary, r, f, m,
        |  r * 100 + f * 10 + m AS segment
        |FROM s3 ORDER BY user_id ASC""".stripMargin,
    "q_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT user_id, event_id, sec,
        |    CASE WHEN sec - lag(sec) OVER
        |      (PARTITION BY user_id ORDER BY sec ASC, event_id ASC) > 1800
        |      THEN 1 ELSE 0 END AS nw
        |  FROM e),
        |c AS (SELECT user_id, sec,
        |    CAST(sum(nw) OVER (PARTITION BY user_id
        |      ORDER BY sec ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |  min(sec) AS start_sec, max(sec) AS end_sec,
        |  max(sec) - min(sec) AS duration_sec
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_model_registry" -> registryOracle,
    "q_graph_pagerank_weighted" -> (prwPrefix +
      """SELECT node, "rank" FROM r5 ORDER BY node ASC"""),
    "q_graph_hits" -> (hitsPrefix +
      """SELECT h3.node, h3.score AS hub, a3.score AS authority
        |FROM h3 JOIN a3 USING (node) ORDER BY node ASC""".stripMargin),
    "q_graph_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey % 10 = 0),
        |e0 AS (SELECT CAST(x.l_partkey AS VARCHAR) AS a,
        |    CAST(y.l_partkey AS VARCHAR) AS b
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM e0 WHERE a <> b),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node),
        |tri AS (SELECT e1.a, e1.b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT deg.node, deg.degree,
        |  CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    CAST(2 * coalesce(pn.triangles, 0) AS DOUBLE) /
        |      CAST(deg.degree * (deg.degree - 1) AS DOUBLE) END
        |    AS clustering_coeff
        |FROM deg LEFT JOIN pn USING (node) ORDER BY node ASC""".stripMargin,
    "q_graph_closeness" ->
      // layered BFS unrolled at maxHops=2: hop-1 pairs, hop-2 minus
      // seen, exact long Σd and 2^20 fixed-point Σ1/d per node
      """WITH e0 AS (SELECT DISTINCT
        |    'c:' || CAST(o_custkey AS VARCHAR) AS src,
        |    's:' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src AS u, dst AS v FROM e0
        |  UNION SELECT dst AS u, src AS v FROM e0),
        |d1 AS (SELECT u, v FROM e WHERE u <> v),
        |h2 AS (SELECT DISTINCT d1.u, e.v
        |  FROM d1 JOIN e ON d1.v = e.u WHERE d1.u <> e.v),
        |d2 AS (SELECT u, v FROM h2 WHERE NOT EXISTS
        |  (SELECT 1 FROM d1 WHERE d1.u = h2.u AND d1.v = h2.v)),
        |al AS (SELECT u, v, CAST(1 AS BIGINT) AS d FROM d1
        |  UNION ALL SELECT u, v, CAST(2 AS BIGINT) AS d FROM d2)
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS n_reach,
        |  CAST(sum(d) AS BIGINT) AS sum_dist,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE) AS closeness,
        |  CAST(CAST(sum(CAST(floor((1.0 / CAST(d AS DOUBLE)) * 1048576.0
        |    + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0
        |    AS harmonic
        |FROM al GROUP BY u ORDER BY node ASC""".stripMargin,
    "q_graph_linkpred" ->
      // canonical edges, degrees, hub-capped pair generation through
      // shared neighbors, 2^20 fixed-point AA/RA term sums (exact
      // BIGINT adds, one division back), anti-join on existing edges,
      // the gate's exact (aa DESC, src, dst) top-100
      """WITH e0 AS (SELECT DISTINCT
        |    'c:' || CAST(o_custkey AS VARCHAR) AS src,
        |    's:' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a,
        |    greatest(src, dst) AS b FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node),
        |adj AS (SELECT z, n, degree AS z_deg FROM
        |    (SELECT a AS z, b AS n FROM e
        |     UNION ALL SELECT b AS z, a AS n FROM e)
        |  JOIN deg ON z = deg.node
        |  WHERE degree <= 60),
        |pairs AS (SELECT l.n AS u, r.n AS v,
        |    CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(CAST(floor((1.0 / ln(CAST(l.z_deg AS DOUBLE)))
        |      * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT) AS aa_fx,
        |    CAST(sum(CAST(floor((1.0 / CAST(l.z_deg AS DOUBLE))
        |      * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT) AS ra_fx
        |  FROM adj l JOIN adj r ON l.z = r.z AND l.n < r.n
        |  GROUP BY 1, 2),
        |ne AS (SELECT * FROM pairs p WHERE NOT EXISTS
        |  (SELECT 1 FROM e WHERE e.a = p.u AND e.b = p.v))
        |SELECT ne.u AS src, ne.v AS dst, ne.cn,
        |  du.degree AS deg_src, dv.degree AS deg_dst,
        |  CAST(ne.cn AS DOUBLE) /
        |    CAST(du.degree + dv.degree - ne.cn AS DOUBLE) AS jaccard,
        |  CAST(ne.aa_fx AS DOUBLE) / 1048576.0 AS aa,
        |  CAST(ne.ra_fx AS DOUBLE) / 1048576.0 AS ra
        |FROM ne JOIN deg du ON ne.u = du.node
        |  JOIN deg dv ON ne.v = dv.node
        |ORDER BY aa DESC, src ASC, dst ASC LIMIT 100""".stripMargin,
    "q_corr_by_group" ->
      """WITH c AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
        |    CAST(l_quantity AS DOUBLE) AS x, CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(floor(y * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(floor((x * x) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(floor((x * y) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(floor((y * y) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS syy
        |  FROM c GROUP BY g),
        |d AS (SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / 1048576.0 AS sx,
        |    CAST(sy AS DOUBLE) / 1048576.0 AS sy,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx,
        |    CAST(sxy AS DOUBLE) / 1048576.0 AS sxy,
        |    CAST(syy AS DOUBLE) / 1048576.0 AS syy
        |  FROM a)
        |SELECT g AS "group", n,
        |  CASE WHEN ((nd * sxx) - (sx * sx)) > 0.0
        |        AND ((nd * syy) - (sy * sy)) > 0.0 THEN
        |    ((nd * sxy) - (sx * sy)) /
        |      (sqrt((nd * sxx) - (sx * sx)) * sqrt((nd * syy) - (sy * sy)))
        |  END AS corr
        |FROM d ORDER BY "group" ASC""".stripMargin,
    "q_pca_component" -> (pcaPrefix +
      """SELECT CAST(i AS INT) AS dim, v AS weight FROM v3 ORDER BY dim ASC"""),
    "q_pca_scores" -> (pcaPrefix.stripSuffix("\n") +
      """
        |SELECT xc.vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(xc.xc * vv.v ORDER BY xc.i)), (a, b) -> a + b) AS score
        |FROM xc JOIN v3 vv USING (i)
        |GROUP BY xc.vec_id ORDER BY vec_id ASC""".stripMargin),
    "q_pca_component2" -> (pcaPrefix.stripSuffix("\n") + ",\n" + pcaChain2 +
      "\n" +
      """SELECT CAST(i AS INT) AS dim, v AS weight FROM dv3 ORDER BY dim ASC"""),
    "q_pca_topk" -> (pcaPrefix.stripSuffix("\n") + ",\n" + pcaChain2 + ",\n" +
      pcaChain3 + "\n" +
      """SELECT CAST(1 AS INT) AS component, CAST(i AS INT) AS dim,
        |  v AS weight FROM v3
        |UNION ALL SELECT CAST(2 AS INT), CAST(i AS INT), v FROM dv3
        |UNION ALL SELECT CAST(3 AS INT), CAST(i AS INT), v FROM ev3
        |ORDER BY component ASC, dim ASC""".stripMargin),
    "q_pca_whiten" -> (pcaPrefix.stripSuffix("\n") + ",\n" + pcaChain2 + ",\n" +
      """pw2 AS MATERIALIZED (SELECT xc.vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(xc.xc * w.v ORDER BY xc.i)), (a, b) -> a + b) AS p
        |  FROM xc JOIN dv3 w USING (i) GROUP BY xc.vec_id),
        |lam1 AS (SELECT nrm / (nn.n - 1.0) AS l FROM n3, nn),
        |lam2 AS (SELECT nrm / (nn.n - 1.0) AS l FROM dn3, nn)
        |SELECT p2.vec_id, p2.p / sqrt(lam1.l) AS y1,
        |  pw2.p / sqrt(lam2.l) AS y2
        |FROM p2 JOIN pw2 USING (vec_id), lam1, lam2
        |ORDER BY vec_id ASC""".stripMargin),
    "q_pca_variance" -> (pcaPrefix.stripSuffix("\n") + ",\n" +
      """q AS (SELECT i,
        |    sum(CAST(floor((xc * xc) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS qq
        |  FROM xc GROUP BY i),
        |tv AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((CAST(qq AS DOUBLE) / 1048576.0) / (nn.n - 1.0) ORDER BY i)),
        |    (a, b) -> a + b) AS total_var FROM q, nn),
        |lam AS (SELECT nrm / (nn.n - 1.0) AS eigenvalue FROM n3, nn)
        |SELECT lam.eigenvalue, tv.total_var,
        |  lam.eigenvalue / tv.total_var AS explained_ratio FROM lam, tv""".stripMargin),
    "q_quality_cv" -> {
      ("""WITH f AS (
         |  SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
         |      t -> t <> '')) AS DOUBLE) / 100.0 AS x2,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3 AS fold
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
         |""".stripMargin + cvFold(0) + cvFold(1) + cvFold(2))
        .stripSuffix(",\n") + "\n" +
      """SELECT * FROM row0 UNION ALL SELECT * FROM row1
        |UNION ALL SELECT * FROM row2 ORDER BY fold ASC""".stripMargin
    },
    "q_graph_pagerank" -> (prPrefix +
      """SELECT node, "rank" FROM r5 ORDER BY node ASC"""),
    "q_graph_ppr" -> pprOracle,
    "q_graph_communities" -> (("WITH " + lpaChain).stripSuffix(",\n") + "\n" +
      """SELECT node, label AS community FROM l3 ORDER BY node ASC"""),
    "q_graph_conductance" -> ("WITH " + lpaChain +
      """el AS MATERIALIZED (SELECT ed.u, ed.v, lu.label AS cu, lv.label AS cv
        |  FROM ed JOIN l3 lu ON lu.node = ed.u JOIN l3 lv ON lv.node = ed.v),
        |ee AS (SELECT CAST(count(*) AS BIGINT) AS e FROM el),
        |cn AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM l3 GROUP BY 1),
        |ag AS (SELECT cu AS community, CAST(count(*) AS BIGINT) AS vol,
        |    CAST(sum(CASE WHEN cu <> cv THEN 1 ELSE 0 END) AS BIGINT) AS cut
        |  FROM el GROUP BY 1)
        |SELECT ag.community, cn.n_nodes, ag.vol, ag.cut,
        |  CASE WHEN least(ag.vol, ee.e - ag.vol) > 0 THEN
        |    CAST(ag.cut AS DOUBLE) /
        |      CAST(least(ag.vol, ee.e - ag.vol) AS DOUBLE)
        |  END AS conductance
        |FROM ag JOIN cn USING (community), ee
        |ORDER BY community ASC""".stripMargin),
    "q_graph_assort_nation" ->
      """WITH ed0 AS (SELECT DISTINCT
        |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
        |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |ed AS (SELECT u, v FROM ed0
        |  UNION ALL SELECT v AS u, u AS v FROM ed0),
        |att AS (SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS n,
        |    CAST(c_nationkey AS VARCHAR) AS a FROM customer
        |  UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR),
        |    CAST(s_nationkey AS VARCHAR) FROM supplier),
        |cells AS (SELECT au.a AS ai, av.a AS aj,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM ed JOIN att au ON au.n = ed.u JOIN att av ON av.n = ed.v
        |  GROUP BY 1, 2),
        |mm AS (SELECT CAST(sum(c) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN ai = aj THEN c ELSE 0 END) AS BIGINT) AS diag
        |  FROM cells),
        |oo AS (SELECT ai AS cls, CAST(sum(c) AS BIGINT) AS o
        |  FROM cells GROUP BY 1),
        |ii AS (SELECT aj AS cls, CAST(sum(c) AS BIGINT) AS i
        |  FROM cells GROUP BY 1),
        |cl AS (SELECT coalesce(oo.cls, ii.cls) AS cls,
        |    coalesce(oo.o, 0) AS o, coalesce(ii.i, 0) AS i
        |  FROM oo FULL OUTER JOIN ii ON oo.cls = ii.cls),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((CAST(o AS DOUBLE) / CAST(mm.m AS DOUBLE))
        |        * (CAST(i AS DOUBLE) / CAST(mm.m AS DOUBLE)) ORDER BY cls)),
        |      (x, y) -> x + y) AS agree
        |  FROM cl, mm GROUP BY mm.m)
        |SELECT mm.m AS n_edges, ag.k AS n_classes,
        |  CAST(mm.diag AS DOUBLE) / CAST(mm.m AS DOUBLE) AS trace,
        |  ag.agree AS agreement,
        |  CASE WHEN abs(1.0 - ag.agree) > 1e-12 THEN
        |    ((CAST(mm.diag AS DOUBLE) / CAST(mm.m AS DOUBLE)) - ag.agree)
        |      / (1.0 - ag.agree) END AS r
        |FROM mm, ag""".stripMargin,
    "q_graph_reach" ->
      """WITH ed0 AS (SELECT DISTINCT
        |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
        |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |ed AS (SELECT u, v FROM ed0
        |  UNION ALL SELECT v AS u, u AS v FROM ed0),
        |p1 AS (SELECT DISTINCT u, v FROM ed),
        |p2 AS (SELECT DISTINCT u, v FROM (
        |  SELECT u, v FROM p1
        |  UNION ALL
        |  SELECT p1.u, e.v FROM p1 JOIN p1 e ON e.u = p1.v))
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS reach
        |FROM p2 GROUP BY u ORDER BY node ASC""".stripMargin,
    "q_graph_kcore" -> {
      val rounds = (1 to 3).map { r =>
        s"""k$r AS (SELECT u FROM e${r - 1} GROUP BY u
           |  HAVING count(*) >= 5),
           |e$r AS (SELECT e.u, e.v FROM e${r - 1} e
           |  JOIN k$r a ON a.u = e.u JOIN k$r b ON b.u = e.v),
           |""".stripMargin
      }.mkString
      ("""WITH ed0 AS (SELECT DISTINCT
         |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
         |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e0 AS (SELECT u, v FROM ed0
         |  UNION ALL SELECT v AS u, u AS v FROM ed0),
         |""".stripMargin + rounds).stripSuffix(",\n") + "\n" +
        """SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
          |FROM e3 GROUP BY u ORDER BY node ASC""".stripMargin
    },
    "q_graph_modularity" -> ("WITH " + lpaChain +
      """el AS MATERIALIZED (SELECT ed.u, ed.v, lu.label AS cu, lv.label AS cv
        |  FROM ed JOIN l3 lu ON lu.node = ed.u JOIN l3 lv ON lv.node = ed.v),
        |cn AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM l3 GROUP BY 1),
        |ag AS (SELECT cu AS community, CAST(count(*) AS BIGINT) AS vol,
        |    CAST(sum(CASE WHEN cu <> cv THEN 1 ELSE 0 END) AS BIGINT) AS cut
        |  FROM el GROUP BY 1),
        |base AS (SELECT cn.community, cn.n_nodes,
        |    CAST(coalesce(ag.vol, 0) AS BIGINT) AS vol,
        |    CAST(coalesce(ag.cut, 0) AS BIGINT) AS cut
        |  FROM cn LEFT JOIN ag USING (community)),
        |ee AS (SELECT CAST(sum(vol) AS BIGINT) AS e FROM base),
        |dd AS (SELECT community, n_nodes, vol, cut,
        |    CAST(vol - cut AS BIGINT) AS intra,
        |    CASE WHEN ee.e > 0 THEN
        |      (CAST(vol - cut AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |      - (CAST(vol AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |        * (CAST(vol AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |    ELSE 0.0 END AS dq
        |  FROM base, ee),
        |qq AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(dq ORDER BY community)), (a, b) -> a + b) AS q FROM dd)
        |SELECT dd.community, dd.n_nodes, dd.vol, dd.cut, dd.intra, dd.dq,
        |  qq.q
        |FROM dd, qq ORDER BY community ASC""".stripMargin),
    "q_graph_modularity_weighted" -> ("WITH " + lpaChain +
      """ew0 AS (SELECT 'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
        |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v,
        |    CAST(count(*) AS DOUBLE) AS w
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |ew AS (SELECT u, v, w FROM ew0
        |  UNION ALL SELECT v AS u, u AS v, w FROM ew0),
        |elw AS (SELECT CAST(ew.w AS DECIMAL(20,6)) AS w,
        |    lu.label AS cu, lv.label AS cv
        |  FROM ew JOIN l3 lu ON lu.node = ew.u
        |  JOIN l3 lv ON lv.node = ew.v),
        |cn AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM l3 GROUP BY 1),
        |ag AS (SELECT cu AS community,
        |    CAST(sum(w) AS DECIMAL(38,6)) AS vol,
        |    CAST(sum(CASE WHEN cu <> cv THEN w
        |      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DECIMAL(38,6)) AS cut
        |  FROM elw GROUP BY 1),
        |base AS (SELECT cn.community, cn.n_nodes,
        |    coalesce(ag.vol, CAST(0 AS DECIMAL(38,6))) AS vol,
        |    coalesce(ag.cut, CAST(0 AS DECIMAL(38,6))) AS cut
        |  FROM cn LEFT JOIN ag USING (community)),
        |ee AS (SELECT CAST(sum(vol) AS DECIMAL(38,6)) AS e FROM base),
        |dd AS (SELECT community, n_nodes, vol, cut,
        |    CAST(vol - cut AS DECIMAL(38,6)) AS intra,
        |    CASE WHEN ee.e > CAST(0 AS DECIMAL(38,6)) THEN
        |      (CAST(vol - cut AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |      - (CAST(vol AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |        * (CAST(vol AS DOUBLE) / CAST(ee.e AS DOUBLE))
        |    ELSE 0.0 END AS dq
        |  FROM base, ee),
        |qq AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(dq ORDER BY community)), (a, b) -> a + b) AS q FROM dd)
        |SELECT dd.community, dd.n_nodes, CAST(dd.vol AS DOUBLE) AS vol,
        |  CAST(dd.cut AS DOUBLE) AS cut, CAST(dd.intra AS DOUBLE) AS intra,
        |  dd.dq, qq.q
        |FROM dd, qq ORDER BY community ASC""".stripMargin),
    "q_graph_pagerank_convergence" -> (("WITH " + prChain("", ""))
      .stripSuffix(",\n") + "\n" +
      (1 to 5).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS round,
           |  (SELECT CAST(sum(abs(
           |      CAST(floor(a."rank" * 1048576.0 + 0.5) AS BIGINT) -
           |      CAST(floor(b."rank" * 1048576.0 + 0.5) AS BIGINT)))
           |    AS BIGINT)
           |   FROM r$k a JOIN r${k - 1} b USING (node)) AS delta_fp"""
          .stripMargin)
        .mkString("\nUNION ALL\n") +
      "\nORDER BY round ASC"),
    "q_graph_hits_convergence" -> (hitsPrefix.stripSuffix("\n")
      .stripSuffix(",") + "\n" +
      (1 to 3).map { k =>
        val ao = if (k == 1) "h0" else s"a${k - 1}"
        s"""SELECT CAST($k AS BIGINT) AS round,
           |  (SELECT CAST(sum(
           |      abs(CAST(floor(hn.score * 1048576.0 + 0.5) AS BIGINT) -
           |          CAST(floor(ho.score * 1048576.0 + 0.5) AS BIGINT)) +
           |      abs(CAST(floor(an.score * 1048576.0 + 0.5) AS BIGINT) -
           |          CAST(floor(ao.score * 1048576.0 + 0.5) AS BIGINT)))
           |    AS BIGINT)
           |   FROM h$k hn JOIN h${k - 1} ho ON ho.node = hn.node
           |   JOIN a$k an ON an.node = hn.node
           |   JOIN $ao ao ON ao.node = hn.node) AS delta_fp""".stripMargin
      }.mkString("\nUNION ALL\n") +
      "\nORDER BY round ASC"),
    "q_graph_lpa_convergence" -> ("WITH " + lpaChain.stripSuffix(",\n") +
      "\n" +
      (1 to 3).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS round,
           |  (SELECT CAST(count(*) AS BIGINT) FROM l${k - 1} p
           |   JOIN l$k c ON p.node = c.node
           |   WHERE p.label <> c.label) AS changed""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\nORDER BY round ASC"),
    "q_ab_mannwhitney_sliced" ->
      """WITH u AS (SELECT CAST(event_type AS VARCHAR) AS grp, user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT grp, variant, CAST(revenue AS DOUBLE) AS s FROM u),
        |rk AS (SELECT grp, variant, s,
        |    rank() OVER (PARTITION BY grp ORDER BY s) AS rk FROM r),
        |cc AS (SELECT grp, s, count(*) AS c FROM r GROUP BY grp, s),
        |j AS (SELECT rk.grp, rk.variant, rk.rk, cc.c
        |  FROM rk JOIN cc ON cc.grp = rk.grp AND cc.s = rk.s),
        |g AS (SELECT grp, variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(2 * rk + c - 1) AS BIGINT) AS r2,
        |    CAST(sum(c * c - 1) AS BIGINT) AS t
        |  FROM j GROUP BY grp, variant),
        |nv AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_variants
        |  FROM g GROUP BY grp),
        |ga AS (SELECT grp, n AS n_a, r2 AS r2_a, t AS t_a FROM g
        |  WHERE variant = 'A'),
        |gb AS (SELECT grp, n AS n_b, r2 AS r2_b, t AS t_b FROM g
        |  WHERE variant = 'B'),
        |f AS (SELECT nv.grp, nv.n_variants, n_a, n_b,
        |    CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
        |    CAST(t_a + t_b AS DOUBLE) AS tie,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd
        |  FROM nv JOIN ga USING (grp) JOIN gb USING (grp))
        |SELECT grp AS "group", n_variants, 'A' AS variant_a,
        |  'B' AS variant_b, n_a, n_b,
        |  u_a, (CAST(n_a * n_b AS DOUBLE)) - u_a AS u_b, tie AS tie_term,
        |  CASE WHEN n_variants = 2 AND
        |      sqrt(((nad * nbd) / 12.0) *
        |        ((nd + 1.0) - tie / (nd * (nd - 1.0)))) > 0.0 THEN
        |    (u_a - ((nad * nbd) / 2.0)) /
        |      sqrt(((nad * nbd) / 12.0) *
        |        ((nd + 1.0) - tie / (nd * (nd - 1.0))))
        |  END AS z
        |FROM f ORDER BY "group" ASC""".stripMargin,
    "q_ab_kruskal" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 3 = 0 THEN 'A'
        |         WHEN user_id % 3 = 1 THEN 'B' ELSE 'C' END AS variant,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |r AS (SELECT variant, CAST(revenue AS DOUBLE) AS s FROM u),
        |rk AS (SELECT variant, s, rank() OVER (ORDER BY s) AS rk FROM r),
        |cc AS (SELECT s, count(*) AS c FROM r GROUP BY s),
        |j AS (SELECT rk.variant, rk.rk, cc.c FROM rk JOIN cc USING (s)),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(2 * rk + c - 1) AS BIGINT) AS r2,
        |    CAST(sum(c * c - 1) AS BIGINT) AS t
        |  FROM j GROUP BY variant),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(t) AS DOUBLE) AS tie
        |  FROM g),
        |ss AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(((CAST(r2 AS DOUBLE) / 2.0) * (CAST(r2 AS DOUBLE) / 2.0))
        |        / CAST(n AS DOUBLE) ORDER BY variant)),
        |    (a, b) -> a + b) AS s FROM g),
        |f AS (SELECT tot.k, tot.nn, tot.tie, CAST(tot.nn AS DOUBLE) AS nd,
        |    ss.s FROM tot, ss),
        |hh AS (SELECT k, nn, tie,
        |    (12.0 / (nd * (nd + 1.0))) * s - 3.0 * (nd + 1.0) AS h,
        |    1.0 - tie / ((nd * nd * nd) - nd) AS corr
        |  FROM f)
        |SELECT nn AS n, k AS n_groups, tie AS tie_term,
        |  CASE WHEN k >= 2 THEN h END AS h,
        |  CASE WHEN k >= 2 AND corr > 0.0 THEN h / corr END AS h_corrected
        |FROM hh""".stripMargin,
    "q_corr_spearman" -> {
      """WITH c AS (SELECT CAST(l_quantity AS DOUBLE) AS xv,
        |    CAST(l_extendedprice AS DOUBLE) AS yv
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r1 AS (SELECT xv, yv, rank() OVER (ORDER BY xv) AS rkx,
        |    rank() OVER (ORDER BY yv) AS rky FROM c),
        |cx AS (SELECT xv, count(*) AS cx FROM c GROUP BY xv),
        |cy AS (SELECT yv, count(*) AS cy FROM c GROUP BY yv),
        |m AS (SELECT CAST(2 * rkx + cx - 1 AS DOUBLE) / 2.0 AS x,
        |    CAST(2 * rky + cy - 1 AS DOUBLE) / 2.0 AS y
        |  FROM r1 JOIN cx USING (xv) JOIN cy USING (yv)),
        |""".stripMargin + corrSql("m", "")
    },
    "q_ewma_daily_grouped" ->
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS grp,
        |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |l AS (SELECT grp, list(struct_pack(day := day, cnt := cnt)
        |    ORDER BY day) AS l,
        |  list(CAST(cnt AS DOUBLE) ORDER BY day) AS ld
        |  FROM d GROUP BY grp),
        |ix AS (SELECT grp, l, ld, unnest(range(1, len(l) + 1)) AS i FROM l)
        |SELECT grp AS "group",
        |  CAST(l[i].day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |  l[i].cnt AS cnt,
        |  list_reduce(list_prepend(ld[1], ld[2:i]),
        |    (acc, e) -> acc * (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
        |      + CAST(0.3 AS DOUBLE) * e) AS ewma
        |FROM ix ORDER BY "group" ASC, day_num ASC""".stripMargin,
    "q_seasonal_daily" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |dd AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |    (CAST(day - DATE '1970-01-01' AS BIGINT) % 7) AS dow, cnt
        |  FROM d),
        |st AS (SELECT day_num, dow, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY dow) AS DOUBLE) /
        |      CAST(count(*) OVER (PARTITION BY dow) AS DOUBLE) AS dow_mean,
        |    CAST(sum(cnt * cnt) OVER (PARTITION BY dow) AS DOUBLE) /
        |      CAST(count(*) OVER (PARTITION BY dow) AS DOUBLE) AS ex2
        |  FROM dd),
        |fz AS (SELECT day_num, dow, cnt, dow_mean,
        |    sqrt(greatest(0.0, ex2 - dow_mean * dow_mean)) AS dow_std
        |  FROM st)
        |SELECT day_num, dow, cnt, dow_mean, dow_std,
        |  CASE WHEN dow_std > 0.0 THEN
        |    (CAST(cnt AS DOUBLE) - dow_mean) / dow_std END AS z
        |FROM fz ORDER BY day_num ASC""".stripMargin,
    "q_cusum_daily" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |l AS (SELECT list(struct_pack(day := day, cnt := cnt)
        |    ORDER BY day) AS l,
        |  list(CAST(cnt AS DOUBLE) ORDER BY day) AS ld FROM d),
        |mu AS (SELECT CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mu FROM d),
        |ix AS (SELECT l, ld, unnest(range(1, len(l) + 1)) AS i FROM l)
        |SELECT CAST(l[i].day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |  l[i].cnt AS cnt,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ld[1:i]),
        |    (acc, e) -> greatest(CAST(0.0 AS DOUBLE),
        |      acc + ((CAST(1.0 AS DOUBLE) * (e - mu.mu))
        |        - CAST(2.0 AS DOUBLE)))) AS cusum_hi,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ld[1:i]),
        |    (acc, e) -> greatest(CAST(0.0 AS DOUBLE),
        |      acc + ((CAST(-1.0 AS DOUBLE) * (e - mu.mu))
        |        - CAST(2.0 AS DOUBLE)))) AS cusum_lo
        |FROM ix, mu ORDER BY day_num ASC""".stripMargin,
    "q_cusum_daily_grouped" ->
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS grp,
        |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |l AS (SELECT grp,
        |    list(struct_pack(day := day, cnt := cnt) ORDER BY day) AS l,
        |    list(CAST(cnt AS DOUBLE) ORDER BY day) AS ld,
        |    CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
        |  FROM d GROUP BY grp),
        |ix AS (SELECT grp, l, ld, mu, unnest(range(1, len(l) + 1)) AS i
        |  FROM l)
        |SELECT grp AS "group",
        |  CAST(l[i].day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |  l[i].cnt AS cnt,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ld[1:i]),
        |    (acc, e) -> greatest(CAST(0.0 AS DOUBLE),
        |      acc + ((CAST(1.0 AS DOUBLE) * (e - mu))
        |        - CAST(2.0 AS DOUBLE)))) AS cusum_hi,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ld[1:i]),
        |    (acc, e) -> greatest(CAST(0.0 AS DOUBLE),
        |      acc + ((CAST(-1.0 AS DOUBLE) * (e - mu))
        |        - CAST(2.0 AS DOUBLE)))) AS cusum_lo
        |FROM ix ORDER BY "group" ASC, day_num ASC""".stripMargin,
    "q_ab_mannwhitney" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |r AS (SELECT variant, CAST(revenue AS DOUBLE) AS s FROM u),
        |rk AS (SELECT variant, s, rank() OVER (ORDER BY s) AS rk FROM r),
        |cc AS (SELECT s, count(*) AS c FROM r GROUP BY s),
        |j AS (SELECT rk.variant, rk.rk, cc.c FROM rk JOIN cc USING (s)),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(2 * rk + c - 1) AS BIGINT) AS r2,
        |    CAST(sum(c * c - 1) AS BIGINT) AS t
        |  FROM j GROUP BY variant),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM g),
        |ga AS (SELECT n AS n_a, r2 AS r2_a, t AS t_a FROM g
        |  WHERE variant = 'A'),
        |gb AS (SELECT n AS n_b, r2 AS r2_b, t AS t_b FROM g
        |  WHERE variant = 'B'),
        |f AS (SELECT nv.n_variants, n_a, n_b,
        |    CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
        |    CAST(t_a + t_b AS DOUBLE) AS tie,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd
        |  FROM ga, gb, nv)
        |SELECT n_variants, 'A' AS variant_a, 'B' AS variant_b, n_a, n_b,
        |  u_a, (CAST(n_a * n_b AS DOUBLE)) - u_a AS u_b, tie AS tie_term,
        |  CASE WHEN n_variants = 2 AND
        |      sqrt(((nad * nbd) / 12.0) *
        |        ((nd + 1.0) - tie / (nd * (nd - 1.0)))) > 0.0 THEN
        |    (u_a - ((nad * nbd) / 2.0)) /
        |      sqrt(((nad * nbd) / 12.0) *
        |        ((nd + 1.0) - tie / (nd * (nd - 1.0))))
        |  END AS z
        |FROM f""".stripMargin,
    "q_ab_welch" ->
      // one keyed fixed-point moments pass per variant, then the gate's
      // exact finishing doubles: m = (Σfp/2^20)/n, s² = (Σfp²/2^20 −
      // n·m²)/(n−1), Welch t + Satterthwaite dof, each op stated once
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1048576.0
        |      AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(CAST(revenue AS DOUBLE) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(floor((CAST(revenue AS DOUBLE) * CAST(revenue AS DOUBLE))
        |      * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sxx
        |  FROM u GROUP BY variant),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM m),
        |ga AS (SELECT n AS n_a, CAST(sx AS DOUBLE) / 1048576.0 AS sx_a,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_a FROM m
        |  WHERE variant = 'A'),
        |gb AS (SELECT n AS n_b, CAST(sx AS DOUBLE) / 1048576.0 AS sx_b,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_b FROM m
        |  WHERE variant = 'B'),
        |f AS (SELECT nv.n_variants, n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    sx_a / CAST(n_a AS DOUBLE) AS ma,
        |    sx_b / CAST(n_b AS DOUBLE) AS mb, sxx_a, sxx_b
        |  FROM ga, gb, nv),
        |s AS (SELECT *, (sxx_a - nad * ma * ma) / (nad - 1.0) AS s2a,
        |    (sxx_b - nbd * mb * mb) / (nbd - 1.0) AS s2b FROM f),
        |w AS (SELECT *, s2a / nad AS vna, s2b / nbd AS vnb,
        |    (s2a / nad) + (s2b / nbd) AS se2 FROM s)
        |SELECT n_variants, 'A' AS variant_a, 'B' AS variant_b, n_a, n_b,
        |  ma AS mean_a, mb AS mean_b, s2a AS var_a, s2b AS var_b,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |        AND se2 > 0.0 THEN (ma - mb) / sqrt(se2) END AS t,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |        AND se2 > 0.0 THEN (se2 * se2) /
        |    ((vna * vna) / (nad - 1.0) + (vnb * vnb) / (nbd - 1.0))
        |  END AS dof
        |FROM w""".stripMargin,
    "q_ab_ks" ->
      // exact two-sample KS: per-value variant counts, integer window
      // prefix sums (association-free), the HUGEINT cross-product
      // identity, ONE stated division; d_at = smallest attaining value
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |r AS (SELECT variant, CAST(revenue AS DOUBLE) AS s FROM u),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n FROM r
        |  GROUP BY variant),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM g),
        |ga AS (SELECT n AS n_a FROM g WHERE variant = 'A'),
        |gb AS (SELECT n AS n_b FROM g WHERE variant = 'B'),
        |cells AS (SELECT s,
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM r GROUP BY s),
        |cum AS (SELECT s,
        |    sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb
        |  FROM cells WINDOW w AS (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT s, abs(CAST(gb.n_b AS HUGEINT) * cca
        |    - CAST(ga.n_a AS HUGEINT) * ccb) AS av
        |  FROM cum, ga, gb),
        |m AS (SELECT max(av) AS mx FROM a),
        |loc AS (SELECT min(s) AS d_at FROM a, m WHERE av = mx)
        |SELECT nv.n_variants, 'A' AS variant_a, 'B' AS variant_b,
        |  ga.n_a, gb.n_b,
        |  CASE WHEN nv.n_variants = 2 THEN CAST(m.mx AS DOUBLE) /
        |    (CAST(ga.n_a AS DOUBLE) * CAST(gb.n_b AS DOUBLE)) END AS d,
        |  CASE WHEN nv.n_variants = 2 THEN loc.d_at END AS d_at
        |FROM nv, ga, gb, m, loc""".stripMargin,
    "q_ab_welch_sliced" ->
      // per-slice Welch on the tied event-count metric: one keyed
      // moments pass per (slice, variant), identical finishing doubles
      """WITH u AS (SELECT CAST(event_type AS VARCHAR) AS grp, user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(count(*) AS DOUBLE) AS n_events
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT grp, variant, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(n_events * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(floor((n_events * n_events) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS sxx
        |  FROM u GROUP BY 1, 2),
        |nv AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_variants
        |  FROM m GROUP BY grp),
        |ga AS (SELECT grp, n AS n_a, CAST(sx AS DOUBLE) / 1048576.0 AS sx_a,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_a FROM m
        |  WHERE variant = 'A'),
        |gb AS (SELECT grp, n AS n_b, CAST(sx AS DOUBLE) / 1048576.0 AS sx_b,
        |    CAST(sxx AS DOUBLE) / 1048576.0 AS sxx_b FROM m
        |  WHERE variant = 'B'),
        |f AS (SELECT nv.grp, nv.n_variants, n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    sx_a / CAST(n_a AS DOUBLE) AS ma,
        |    sx_b / CAST(n_b AS DOUBLE) AS mb, sxx_a, sxx_b
        |  FROM nv JOIN ga USING (grp) JOIN gb USING (grp)),
        |s AS (SELECT *, (sxx_a - nad * ma * ma) / (nad - 1.0) AS s2a,
        |    (sxx_b - nbd * mb * mb) / (nbd - 1.0) AS s2b FROM f),
        |w AS (SELECT *, s2a / nad AS vna, s2b / nbd AS vnb,
        |    (s2a / nad) + (s2b / nbd) AS se2 FROM s)
        |SELECT grp AS "group", n_variants, 'A' AS variant_a,
        |  'B' AS variant_b, n_a, n_b,
        |  ma AS mean_a, mb AS mean_b, s2a AS var_a, s2b AS var_b,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |        AND se2 > 0.0 THEN (ma - mb) / sqrt(se2) END AS t,
        |  CASE WHEN n_variants = 2 AND n_a >= 2 AND n_b >= 2
        |        AND se2 > 0.0 THEN (se2 * se2) /
        |    ((vna * vna) / (nad - 1.0) + (vnb * vnb) / (nbd - 1.0))
        |  END AS dof
        |FROM w ORDER BY "group" ASC""".stripMargin,
    "q_ab_ks_sliced" ->
      // per-slice exact KS on the tied event-count metric: integer
      // window prefix sums PER SLICE, the HUGEINT identity, one stated
      // division; d_at = smallest attaining value within the slice
      """WITH u AS (SELECT CAST(event_type AS VARCHAR) AS grp, user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(count(*) AS DOUBLE) AS s
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |g AS (SELECT grp, variant, CAST(count(*) AS BIGINT) AS n FROM u
        |  GROUP BY grp, variant),
        |nv AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_variants
        |  FROM g GROUP BY grp),
        |ga AS (SELECT grp, n AS n_a FROM g WHERE variant = 'A'),
        |gb AS (SELECT grp, n AS n_b FROM g WHERE variant = 'B'),
        |cells AS (SELECT grp, s,
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM u GROUP BY grp, s),
        |cum AS (SELECT grp, s,
        |    sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb
        |  FROM cells WINDOW w AS (PARTITION BY grp ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT cum.grp, cum.s,
        |    abs(CAST(gb.n_b AS HUGEINT) * cca
        |      - CAST(ga.n_a AS HUGEINT) * ccb) AS av
        |  FROM cum JOIN ga USING (grp) JOIN gb USING (grp)),
        |m AS (SELECT grp, max(av) AS mx FROM a GROUP BY grp),
        |loc AS (SELECT a.grp, min(a.s) AS d_at
        |  FROM a JOIN m ON a.grp = m.grp AND a.av = m.mx GROUP BY a.grp)
        |SELECT nv.grp AS "group", nv.n_variants, 'A' AS variant_a,
        |  'B' AS variant_b, ga.n_a, gb.n_b,
        |  CASE WHEN nv.n_variants = 2 THEN CAST(m.mx AS DOUBLE) /
        |    (CAST(ga.n_a AS DOUBLE) * CAST(gb.n_b AS DOUBLE)) END AS d,
        |  CASE WHEN nv.n_variants = 2 THEN loc.d_at END AS d_at
        |FROM nv JOIN ga USING (grp) JOIN gb USING (grp)
        |  JOIN m ON m.grp = nv.grp JOIN loc ON loc.grp = nv.grp
        |ORDER BY "group" ASC""".stripMargin,
    "q_ab_cliffs_sliced" ->
      // per-slice delta via the exact rank identity: min-ranks WITHIN
      // each slice (PARTITION BY grp), per-(slice,value) tie counts
      """WITH u AS (SELECT CAST(event_type AS VARCHAR) AS grp, user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(count(*) AS DOUBLE) AS s
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT grp, variant, s,
        |    rank() OVER (PARTITION BY grp ORDER BY s) AS rk FROM u),
        |cc AS (SELECT grp, s, count(*) AS c FROM u GROUP BY grp, s),
        |j AS (SELECT rk.grp, rk.variant, rk.rk, cc.c
        |  FROM rk JOIN cc ON cc.grp = rk.grp AND cc.s = rk.s),
        |g AS (SELECT grp, variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(2 * rk + c - 1) AS BIGINT) AS r2
        |  FROM j GROUP BY grp, variant),
        |nv AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_variants
        |  FROM g GROUP BY grp),
        |ga AS (SELECT grp, n AS n_a, r2 AS r2_a FROM g WHERE variant = 'A'),
        |gb AS (SELECT grp, n AS n_b FROM g WHERE variant = 'B'),
        |f AS (SELECT nv.grp, nv.n_variants, n_a, n_b,
        |    r2_a - n_a * (n_a + 1) AS u2a, n_a * n_b AS nab
        |  FROM nv JOIN ga USING (grp) JOIN gb USING (grp)),
        |dl AS (SELECT *, CAST(u2a - nab AS DOUBLE) / CAST(nab AS DOUBLE)
        |    AS delta FROM f)
        |SELECT grp AS "group", n_variants, 'A' AS variant_a,
        |  'B' AS variant_b, n_a, n_b,
        |  CASE WHEN n_variants = 2 THEN CAST(u2a AS DOUBLE) / 2.0 END AS u_a,
        |  CASE WHEN n_variants = 2 THEN delta END AS delta,
        |  CASE WHEN n_variants = 2 THEN
        |    CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |         WHEN abs(delta) < 0.33 THEN 'small'
        |         WHEN abs(delta) < 0.474 THEN 'medium'
        |         ELSE 'large' END
        |  END AS magnitude
        |FROM dl ORDER BY "group" ASC""".stripMargin,
    "q_ab_cliffs_delta" ->
      // the U test's ranked pass without the tie term; delta via the
      // exact integer identity (2U_A − n_A·n_B)/(n_A·n_B)
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id, 2),
        |r AS (SELECT variant, CAST(revenue AS DOUBLE) AS s FROM u),
        |rk AS (SELECT variant, s, rank() OVER (ORDER BY s) AS rk FROM r),
        |cc AS (SELECT s, count(*) AS c FROM r GROUP BY s),
        |j AS (SELECT rk.variant, rk.rk, cc.c FROM rk JOIN cc USING (s)),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(2 * rk + c - 1) AS BIGINT) AS r2
        |  FROM j GROUP BY variant),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM g),
        |ga AS (SELECT n AS n_a, r2 AS r2_a FROM g WHERE variant = 'A'),
        |gb AS (SELECT n AS n_b FROM g WHERE variant = 'B'),
        |f AS (SELECT nv.n_variants, n_a, n_b,
        |    r2_a - n_a * (n_a + 1) AS u2a, n_a * n_b AS nab
        |  FROM ga, gb, nv),
        |dl AS (SELECT *, CAST(u2a - nab AS DOUBLE) / CAST(nab AS DOUBLE)
        |    AS delta FROM f)
        |SELECT n_variants, 'A' AS variant_a, 'B' AS variant_b, n_a, n_b,
        |  CAST(u2a AS DOUBLE) / 2.0 AS u_a,
        |  CASE WHEN n_variants = 2 THEN delta END AS delta,
        |  CASE WHEN n_variants = 2 THEN
        |    CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |         WHEN abs(delta) < 0.33 THEN 'small'
        |         WHEN abs(delta) < 0.474 THEN 'medium'
        |         ELSE 'large' END
        |  END AS magnitude
        |FROM dl""".stripMargin,
    "q_seasonal_daily_grouped" ->
      """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS grp,
        |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |dd AS (SELECT grp,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |    (CAST(day - DATE '1970-01-01' AS BIGINT) % 7) AS dow, cnt
        |  FROM d),
        |st AS (SELECT grp, day_num, dow, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY grp, dow) AS DOUBLE) /
        |      CAST(count(*) OVER (PARTITION BY grp, dow) AS DOUBLE)
        |      AS dow_mean,
        |    CAST(sum(cnt * cnt) OVER (PARTITION BY grp, dow) AS DOUBLE) /
        |      CAST(count(*) OVER (PARTITION BY grp, dow) AS DOUBLE) AS ex2
        |  FROM dd),
        |fz AS (SELECT grp, day_num, dow, cnt, dow_mean,
        |    sqrt(greatest(0.0, ex2 - dow_mean * dow_mean)) AS dow_std
        |  FROM st)
        |SELECT grp AS "group", day_num, dow, cnt, dow_mean, dow_std,
        |  CASE WHEN dow_std > 0.0 THEN
        |    (CAST(cnt AS DOUBLE) - dow_mean) / dow_std END AS z
        |FROM fz ORDER BY "group" ASC, day_num ASC""".stripMargin,
    "q_graph_rank_drift" ->
      (("WITH " + prChain("a", "WHERE o.o_orderkey % 2 = 0") +
        prChain("b", "")).stripSuffix(",\n") + "\n" +
        """SELECT node, ra."rank" AS rank_past, rb."rank" AS rank_cur,
          |  rb."rank" - ra."rank" AS rank_delta
          |FROM ra5 ra FULL OUTER JOIN rb5 rb USING (node)
          |ORDER BY node ASC""".stripMargin),
    "q_privacy_kanon" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  (count(*) < 10) AS violates
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_privacy_kanon_summary" ->
      """WITH g AS (SELECT count(*) AS n FROM customer
        |           GROUP BY c_nationkey, c_mktsegment)
        |SELECT CAST(min(n) AS BIGINT) AS k_effective,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |  CAST(sum(n) AS BIGINT) AS rows_total
        |FROM g""".stripMargin,
    "q_privacy_ldiv" ->
      """SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS l,
        |  (count(DISTINCT o_orderstatus) < 3) AS violates
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_privacy_tclose" ->
      // per-class TVD vs the corpus sensitive mix: observed cells only,
      // absent values' mass via 1 − Σ_{v∈class} g/N; pinned folds
      """WITH cells AS (SELECT o_orderpriority AS q1,
        |    CAST(year(o_orderdate) AS INTEGER) AS q2,
        |    CAST(o_orderstatus AS VARCHAR) AS s,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2, 3),
        |gl AS (SELECT s, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY s),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn FROM gl),
        |j AS (SELECT cells.q1, cells.q2, cells.s, cells.c, gl.g
        |  FROM cells JOIN gl USING (s)),
        |cls AS (SELECT q1, q2, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_values FROM j GROUP BY 1, 2),
        |jj AS (SELECT j.q1, j.q2, j.s, j.c, j.g, cls.n
        |  FROM j JOIN cls ON j.q1 IS NOT DISTINCT FROM cls.q1
        |    AND j.q2 IS NOT DISTINCT FROM cls.q2),
        |p AS (SELECT q1, q2, any_value(n) AS n,
        |    list(abs(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(g AS DOUBLE) / CAST(tot.nn AS DOUBLE)) ORDER BY s)
        |      AS la,
        |    list(CAST(g AS DOUBLE) / CAST(tot.nn AS DOUBLE) ORDER BY s)
        |      AS lg
        |  FROM jj, tot GROUP BY q1, q2),
        |f AS (SELECT p.q1, p.q2, p.n, cls.n_values,
        |    0.5 * (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), la),
        |        (a, b) -> a + b)
        |      + (1.0 - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lg),
        |        (a, b) -> a + b))) AS t
        |  FROM p JOIN cls ON p.q1 IS NOT DISTINCT FROM cls.q1
        |    AND p.q2 IS NOT DISTINCT FROM cls.q2)
        |SELECT q1 AS o_orderpriority, q2 AS o_year, n, n_values, t,
        |  (t > 0.2) AS violates
        |FROM f ORDER BY 1, 2""".stripMargin,
    "q_privacy_tclose_ordered" ->
      // ordered/EMD metric: per class the cumulative count differences
      // over the corpus's sorted year grid, Σ|N·C_i − n·G_i| exact in
      // HUGEINT (window prefix sums of integers are association-free),
      // one stated division t = Σ/(n·N·(m−1)); null-safe QI joins
      """WITH cells AS (SELECT o_orderpriority AS q1, o_orderstatus AS q2,
        |    CAST(year(o_orderdate) AS DOUBLE) AS s,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2, 3),
        |gl AS (SELECT s, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY s),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS m FROM gl),
        |cls AS (SELECT q1, q2, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_values FROM cells GROUP BY 1, 2),
        |grid AS (SELECT cls.q1, cls.q2, cls.n, gl.s, gl.g,
        |    COALESCE(cells.c, 0) AS c
        |  FROM cls CROSS JOIN gl
        |  LEFT JOIN cells ON cells.q1 IS NOT DISTINCT FROM cls.q1
        |    AND cells.q2 IS NOT DISTINCT FROM cls.q2 AND cells.s = gl.s),
        |pref AS (SELECT q1, q2, n, s,
        |    CAST(sum(c) OVER w AS HUGEINT) AS ccum,
        |    CAST(sum(g) OVER w AS HUGEINT) AS gcum
        |  FROM grid WINDOW w AS (PARTITION BY q1, q2 ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT pref.q1, pref.q2, any_value(pref.n) AS n,
        |    sum(abs(CAST(tot.nn AS HUGEINT) * ccum
        |      - CAST(pref.n AS HUGEINT) * gcum)) AS sacc
        |  FROM pref, tot GROUP BY 1, 2),
        |r AS (SELECT f.q1, f.q2, f.n, cls.n_values,
        |    CASE WHEN tot.m >= 2 THEN CAST(sacc AS DOUBLE) /
        |      (CAST(f.n AS DOUBLE) * CAST(tot.nn AS DOUBLE)
        |        * (CAST(tot.m AS DOUBLE) - 1.0))
        |    ELSE 0.0 END AS t
        |  FROM f JOIN cls ON f.q1 IS NOT DISTINCT FROM cls.q1
        |    AND f.q2 IS NOT DISTINCT FROM cls.q2, tot)
        |SELECT q1 AS o_orderpriority, q2 AS o_orderstatus, n, n_values, t,
        |  (t > 0.01) AS violates
        |FROM r ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST""".stripMargin,
    "q_quality_lr_l2" -> {
      def iter(k: Int): String =
        s"""g$k AS (SELECT
           |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * 1.0) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS ga,
           |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gb,
           |  sum(CAST(floor((((1.0 / (1.0 + exp(-((wa + (wb * x1)) + (wc * x2))))) - y) * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS gc
           |  FROM f, w${k - 1}),
           |w$k AS (SELECT
           |  wa - ((CAST(ga AS DOUBLE) / 1048576.0) / nn.n) AS wa,
           |  wb - (((CAST(gb AS DOUBLE) / 1048576.0) / nn.n) + (0.05 * wb)) AS wb,
           |  wc - (((CAST(gc AS DOUBLE) / 1048576.0) / nn.n) + (0.05 * wc)) AS wc
           |  FROM g$k, w${k - 1}, nn),
           |""".stripMargin
      ("""WITH f AS (
         |  SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
         |      t -> t <> '')) AS DOUBLE) / 100.0 AS x2,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
         |w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
         |""".stripMargin + iter(1) + iter(2) + iter(3)).stripSuffix(",\n") +
        "\nSELECT wa AS w0, wb AS w1, wc AS w2 FROM w3"
    },
    "q_gini_by_group" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS g, doc_id,
        |    CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND CAST(n_chars AS DOUBLE) >= 0.0 AND lang IS NOT NULL),
        |r AS (SELECT g, x, row_number()
        |    OVER (PARTITION BY g ORDER BY x ASC, doc_id ASC) AS rk FROM c),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(floor((CAST(rk AS DOUBLE) * x) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS s2
        |  FROM r GROUP BY g)
        |SELECT g AS "group", n, CAST(s1 AS DOUBLE) / 1048576.0 AS total,
        |  CASE WHEN n > 0 AND s1 > 0 THEN
        |    ((2.0 * (CAST(s2 AS DOUBLE) / 1048576.0)) /
        |     (CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / 1048576.0)))
        |      - ((CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
        |  END AS gini
        |FROM a ORDER BY "group" ASC""".stripMargin,
    "q_hhi" ->
      """WITH k AS (SELECT CAST(source AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM k),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM k),
        |h AS (SELECT nn.n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
        |         (CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |      ORDER BY c, key)), (a, b) -> a + b) AS hhi
        |  FROM k, nn GROUP BY nn.n)
        |SELECT nn.n, kk.ng AS n_groups, h.hhi,
        |  CASE WHEN kk.ng > 1 THEN
        |    (h.hhi - 1.0 / CAST(kk.ng AS DOUBLE)) /
        |    (1.0 - 1.0 / CAST(kk.ng AS DOUBLE)) END AS hhi_normalized
        |FROM nn, kk, h""".stripMargin,
    "q_gini" ->
      """WITH c AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND CAST(n_chars AS DOUBLE) >= 0.0),
        |r AS (SELECT doc_id, x,
        |    row_number() OVER (ORDER BY x ASC, doc_id ASC) AS rk FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(floor((CAST(rk AS DOUBLE) * x) * 1048576.0 + 0.5)
        |      AS DECIMAL(38,0))) AS s2
        |  FROM r)
        |SELECT n, CAST(s1 AS DOUBLE) / 1048576.0 AS total,
        |  CASE WHEN n > 0 AND s1 > 0 THEN
        |    ((2.0 * (CAST(s2 AS DOUBLE) / 1048576.0)) /
        |     (CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / 1048576.0)))
        |      - ((CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
        |  END AS gini
        |FROM a""".stripMargin,
    "q_tail_index" ->
      """WITH c AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND CAST(n_chars AS DOUBLE) > 0.0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT x, row_number()
        |    OVER (ORDER BY x DESC, doc_id ASC) AS rk FROM c),
        |h AS (SELECT rk, x FROM r WHERE rk <= 101),
        |thr AS (SELECT x AS t FROM h WHERE rk = 101),
        |s AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(ln(x / thr.t) ORDER BY rk)), (a, b) -> a + b) AS sl
        |  FROM h, thr WHERE rk <= 100)
        |SELECT nn.n, CAST(100 AS BIGINT) AS k, thr.t AS x_threshold,
        |  CASE WHEN s.sl > 0.0 THEN 100.0 / s.sl END AS alpha
        |FROM nn, thr, s""".stripMargin,
    "q_gini_drift" -> {
      def giniBlock(tag: Int, where: String): String =
        s"""c$tag AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x
           |  FROM documents WHERE n_chars IS NOT NULL
           |    AND CAST(n_chars AS DOUBLE) >= 0.0$where),
           |r$tag AS (SELECT doc_id, x,
           |    row_number() OVER (ORDER BY x ASC, doc_id ASC) AS rk FROM c$tag),
           |a$tag AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s1,
           |    sum(CAST(floor((CAST(rk AS DOUBLE) * x) * 1048576.0 + 0.5)
           |      AS DECIMAL(38,0))) AS s2
           |  FROM r$tag),
           |f$tag AS (SELECT CAST($tag AS INT) AS version, n,
           |    CAST(s1 AS DOUBLE) / 1048576.0 AS total,
           |    CASE WHEN n > 0 AND s1 > 0 THEN
           |      ((2.0 * (CAST(s2 AS DOUBLE) / 1048576.0)) /
           |       (CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / 1048576.0)))
           |        - ((CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
           |    END AS gini
           |  FROM a$tag),
           |""".stripMargin
      ("WITH " + giniBlock(1, " AND doc_id % 2 = 0") + giniBlock(2, ""))
        .stripSuffix(",\n") + "\n" +
        """, u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2)
          |SELECT version, n, total, gini,
          |  gini - lag(gini) OVER (ORDER BY version) AS gini_delta
          |FROM u ORDER BY version ASC""".stripMargin
    },
    "q_lorenz" ->
      """WITH c AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x
        |  FROM documents WHERE n_chars IS NOT NULL
        |    AND CAST(n_chars AS DOUBLE) >= 0.0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT x,
        |    row_number() OVER (ORDER BY x ASC, doc_id ASC) AS rk FROM c),
        |p AS (SELECT CAST(floor(CAST((rk - 1) * 10 AS DOUBLE)
        |      / CAST(nn.n AS DOUBLE)) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    sum(CAST(floor(x * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s
        |  FROM r, nn GROUP BY 1),
        |w AS (SELECT bucket, cnt, s,
        |    sum(s) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(s) OVER () AS tot
        |  FROM p)
        |SELECT bucket, cnt, CAST(s AS DOUBLE) / 1048576.0 AS value_sum,
        |  CASE WHEN tot > 0 THEN
        |    CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) END AS cum_share
        |FROM w ORDER BY bucket ASC""".stripMargin,
    "q_corr_matrix" ->
      """WITH c AS (SELECT CAST(l_discount AS DOUBLE) AS x0,
        |    CAST(l_extendedprice AS DOUBLE) AS x1,
        |    CAST(l_quantity AS DOUBLE) AS x2
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(floor(x0 * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s0,
        |    sum(CAST(floor(x1 * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(floor(x2 * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s2,
        |    sum(CAST(floor((x0 * x0) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p00,
        |    sum(CAST(floor((x0 * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p01,
        |    sum(CAST(floor((x0 * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p02,
        |    sum(CAST(floor((x1 * x1) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p11,
        |    sum(CAST(floor((x1 * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p12,
        |    sum(CAST(floor((x2 * x2) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS p22
        |  FROM c),
        |d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s0 AS DOUBLE) / 1048576.0 AS s0,
        |    CAST(s1 AS DOUBLE) / 1048576.0 AS s1,
        |    CAST(s2 AS DOUBLE) / 1048576.0 AS s2,
        |    CAST(p00 AS DOUBLE) / 1048576.0 AS p00,
        |    CAST(p01 AS DOUBLE) / 1048576.0 AS p01,
        |    CAST(p02 AS DOUBLE) / 1048576.0 AS p02,
        |    CAST(p11 AS DOUBLE) / 1048576.0 AS p11,
        |    CAST(p12 AS DOUBLE) / 1048576.0 AS p12,
        |    CAST(p22 AS DOUBLE) / 1048576.0 AS p22
        |  FROM agg)
        |SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, n,
        |  ((nd * p01) - (s0 * s1)) /
        |    (sqrt((nd * p00) - (s0 * s0)) * sqrt((nd * p11) - (s1 * s1))) AS corr
        |FROM d
        |UNION ALL
        |SELECT 'l_discount', 'l_quantity', n,
        |  ((nd * p02) - (s0 * s2)) /
        |    (sqrt((nd * p00) - (s0 * s0)) * sqrt((nd * p22) - (s2 * s2)))
        |FROM d
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_quantity', n,
        |  ((nd * p12) - (s1 * s2)) /
        |    (sqrt((nd * p11) - (s1 * s1)) * sqrt((nd * p22) - (s2 * s2)))
        |FROM d
        |ORDER BY col_a, col_b""".stripMargin,
    "q_pca_recon" -> (pcaPrefix.stripSuffix("\n") + ",\n" + pcaChain2 + ",\n" +
      """pw2 AS MATERIALIZED (SELECT xc.vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(xc.xc * w.v ORDER BY xc.i)), (a, b) -> a + b) AS p
        |  FROM xc JOIN dv3 w USING (i) GROUP BY xc.vec_id),
        |xr AS MATERIALIZED (SELECT xc.vec_id, xc.i,
        |  (xc.xc - (p2.p * w1.v)) - (pw2.p * w2.v) AS xd
        |  FROM xc JOIN p2 USING (vec_id) JOIN pw2 USING (vec_id)
        |  JOIN v3 w1 USING (i) JOIN dv3 w2 USING (i))
        |SELECT vec_id, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(xd * xd ORDER BY i)), (a, b) -> a + b) AS err2
        |FROM xr GROUP BY vec_id ORDER BY vec_id ASC""".stripMargin),
    "q_ab_ztest" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id, 2),
        |a AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS c
        |  FROM u GROUP BY 1),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_variants FROM a),
        |aa AS (SELECT variant AS v_a, n AS n_a, c AS c_a FROM a
        |  WHERE variant = 'A'),
        |bb AS (SELECT variant AS v_b, n AS n_b, c AS c_b FROM a
        |  WHERE variant = 'B'),
        |f AS (SELECT nv.n_variants, v_a AS variant_a, v_b AS variant_b,
        |    n_a, n_b, c_a AS conv_a, c_b AS conv_b,
        |    CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        |    CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        |    CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
        |  FROM aa, bb, nv)
        |SELECT n_variants, variant_a, variant_b, n_a, n_b, conv_a, conv_b,
        |  p_a, p_b,
        |  CASE WHEN n_variants = 2 AND pp > 0.0 AND pp < 1.0 THEN
        |    (p_a - p_b) / sqrt((pp * (CAST(1.0 AS DOUBLE) - pp)) *
        |      ((CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)) +
        |       (CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))))
        |  END AS z
        |FROM f""".stripMargin,
    "q_markov_stationary" -> {
      val iters = (1 to 10).map { k =>
        s"""v$k AS MATERIALIZED (SELECT s.state,
           |  coalesce(agg.x, CAST(0.0 AS DOUBLE)) AS prob
           |  FROM states s LEFT JOIN (
           |    SELECT p.j AS state, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(v.prob * p.share ORDER BY p.i)), (a, b) -> a + b) AS x
           |    FROM p JOIN v${k - 1} v ON v.state = p.i GROUP BY p.j) agg
           |  ON agg.state = s.state),
           |""".stripMargin
      }.mkString
      ("""WITH t AS (SELECT event_type AS tt,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS ft
         |  FROM events),
         |cnt AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n FROM t
         |  WHERE ft IS NOT NULL GROUP BY 1, 2),
         |states AS MATERIALIZED (SELECT DISTINCT ft AS state FROM cnt
         |  UNION SELECT DISTINCT tt FROM cnt),
         |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
         |rs AS (SELECT ft, CAST(sum(n) AS BIGINT) AS rn FROM cnt GROUP BY ft),
         |p AS MATERIALIZED (SELECT cnt.ft AS i, cnt.tt AS j,
         |    CAST(cnt.n AS DOUBLE) / CAST(rs.rn AS DOUBLE) AS share
         |  FROM cnt JOIN rs USING (ft)
         |  UNION ALL SELECT s.state, s.state, CAST(1.0 AS DOUBLE)
         |  FROM states s WHERE s.state NOT IN (SELECT ft FROM rs)),
         |v0 AS (SELECT state, 1.0 / kk.k AS prob FROM states, kk),
         |""".stripMargin + iters).stripSuffix(",\n") + "\n" +
        """SELECT state, prob FROM v10 ORDER BY state ASC"""
    },
    "q_dq_benford" ->
      """WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND CAST(l_extendedprice AS DOUBLE) > 0.0),
        |d AS (SELECT least(greatest(
        |    CAST(floor(x / exp(floor(ln(x) / ln(10.0)) * ln(10.0))) AS BIGINT),
        |    1), 9) AS digit FROM x),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
        |g AS (SELECT unnest(range(1, 10)) AS digit)
        |SELECT CAST(g.digit AS BIGINT) AS digit,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        |  CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) AS frac,
        |  ln(1.0 + (1.0 / CAST(g.digit AS DOUBLE))) / ln(10.0) AS expected
        |FROM g LEFT JOIN c ON c.digit = g.digit, tot
        |ORDER BY digit ASC""".stripMargin,
    "q_chi_squared" -> {
      // the expected count e = ca·cb/n, written out at each occurrence
      // (identical double each time)
      val ed = "((CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) / CAST(nn.n AS DOUBLE))"
      s"""WITH j AS (SELECT CAST(lang AS VARCHAR) AS a,
         |    CAST(source AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS c
         |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
         |  GROUP BY 1, 2),
         |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM j GROUP BY a),
         |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM j GROUP BY b),
         |cells AS (SELECT j.a, j.b, j.c, ma.ca, mb.cb
         |  FROM j JOIN ma USING (a) JOIN mb USING (b)),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
         |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells),
         |rr AS (SELECT CAST(count(*) AS BIGINT) AS r FROM ma),
         |cc AS (SELECT CAST(count(*) AS BIGINT) AS c FROM mb),
         |ch AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(((((CAST(c AS DOUBLE) - $ed) * (CAST(c AS DOUBLE) - $ed))
         |        / $ed) - $ed)
         |      ORDER BY a, b)), (x, y) -> x + y)
         |    + CAST(nn.n AS DOUBLE) AS chi2
         |  FROM cells, nn GROUP BY nn.n)
         |SELECT nn.n, cnt.n_cells, rr.r, cc.c,
         |  (rr.r - 1) * (cc.c - 1) AS dof, ch.chi2,
         |  CASE WHEN least(rr.r, cc.c) > 1 THEN
         |    sqrt((ch.chi2 / CAST(nn.n AS DOUBLE)) /
         |      CAST(least(rr.r, cc.c) - 1 AS DOUBLE))
         |  END AS cramers_v
         |FROM nn, cnt, rr, cc, ch""".stripMargin
    },
    "q_graph_assortativity" ->
      ("""WITH ed0 AS (SELECT DISTINCT
         |    'c:' || CAST(o.o_custkey AS VARCHAR) AS u,
         |    's:' || CAST(l.l_suppkey AS VARCHAR) AS v
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |ed AS (SELECT u, v FROM ed0 UNION ALL SELECT v, u FROM ed0),
         |dg AS (SELECT u, CAST(count(*) AS DOUBLE) AS deg
         |  FROM ed GROUP BY u),
         |c AS (SELECT d1.deg AS x, d2.deg AS y
         |  FROM ed JOIN dg d1 ON d1.u = ed.u JOIN dg d2 ON d2.u = ed.v),
         |""".stripMargin + corrSql("c", "")),
    "q_ewma_daily" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |l AS (SELECT list(struct_pack(day := day, cnt := cnt)
        |    ORDER BY day) AS l,
        |  list(CAST(cnt AS DOUBLE) ORDER BY day) AS ld FROM d),
        |ix AS (SELECT l, ld, unnest(range(1, len(l) + 1)) AS i FROM l)
        |SELECT CAST(l[i].day - DATE '1970-01-01' AS BIGINT) AS day_num,
        |  l[i].cnt AS cnt,
        |  list_reduce(list_prepend(ld[1], ld[2:i]),
        |    (acc, e) -> acc * (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
        |      + CAST(0.3 AS DOUBLE) * e) AS ewma
        |FROM ix ORDER BY day_num ASC""".stripMargin,
    "q_mutual_info" ->
      """WITH j AS (SELECT CAST(lang AS VARCHAR) AS a,
        |    CAST(source AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM j GROUP BY a),
        |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM j GROUP BY b),
        |cells AS (SELECT j.a, j.b, j.c, ma.ca, mb.cb
        |  FROM j JOIN ma USING (a) JOIN mb USING (b)),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells),
        |mi AS (SELECT nn.n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
        |      ln((CAST(c AS DOUBLE) * CAST(nn.n AS DOUBLE)) /
        |        (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)))
        |      ORDER BY a, b)), (x, y) -> x + y) AS mi
        |  FROM cells, nn GROUP BY nn.n),
        |ha AS (SELECT nn.n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(-((CAST(ca AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
        |      ln(CAST(ca AS DOUBLE) / CAST(nn.n AS DOUBLE))) ORDER BY a)),
        |    (x, y) -> x + y) AS h_a
        |  FROM ma, nn GROUP BY nn.n),
        |hb AS (SELECT nn.n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(-((CAST(cb AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
        |      ln(CAST(cb AS DOUBLE) / CAST(nn.n AS DOUBLE))) ORDER BY b)),
        |    (x, y) -> x + y) AS h_b
        |  FROM mb, nn GROUP BY nn.n)
        |SELECT nn.n, cnt.n_cells, mi.mi, ha.h_a, hb.h_b,
        |  CASE WHEN ha.h_a > 0.0 AND hb.h_b > 0.0 THEN
        |    mi.mi / sqrt(ha.h_a * hb.h_b) END AS nmi
        |FROM nn, cnt, mi, ha, hb""".stripMargin,
    "q_stream_profile" ->
      """WITH p1 AS (SELECT 'event_type' AS "column", 'string' AS dtype,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(event_type) AS BIGINT) AS n_nulls,
        |    CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
        |    min(event_type) AS min_str, max(event_type) AS max_str,
        |    CAST(NULL AS DOUBLE) AS sum_num, CAST(NULL AS DOUBLE) AS mean
        |  FROM events),
        |p2 AS (SELECT 'user_id', 'bigint', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(user_id) AS BIGINT),
        |    CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(sum(CAST(user_id AS DECIMAL(28,4))) AS DOUBLE),
        |    CAST(sum(CAST(user_id AS DECIMAL(28,4))) AS DOUBLE)
        |      / CAST(count(user_id) AS DOUBLE)
        |  FROM events)
        |SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |ORDER BY "column"""".stripMargin,
    "q_text_keywords" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> t <> '') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
        |tf AS (SELECT doc_id AS id, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(l) AS t FROM tok) GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |  GROUP BY term),
        |sc AS (SELECT tf.id, tf.term, tf.tf,
        |    CAST(tf.tf AS DOUBLE) * ln(nn.n / CAST(dfq.df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN dfq USING (term), nn),
        |r AS (SELECT id, term, tf, tfidf,
        |    row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC)
        |      AS rk
        |  FROM sc)
        |SELECT id, term, tf, tfidf, CAST(rk AS INT) AS rk FROM r
        |WHERE rk <= 5 ORDER BY id ASC, rk ASC""".stripMargin,
    "q_text_collocations" ->
      """WITH tok AS (SELECT
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> t <> '') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(l) AS t FROM tok) GROUP BY t),
        |bi AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cp
        |  FROM (SELECT l[i] AS a, l[i + 1] AS b
        |        FROM (SELECT l, unnest(range(1, len(l))) AS i FROM tok))
        |  GROUP BY a, b),
        |tt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni),
        |bt AS (SELECT CAST(sum(cp) AS DOUBLE) AS b FROM bi)
        |SELECT bi.a || ' ' || bi.b AS bigram, bi.cp AS n_pair,
        |  ua.c AS n_left, ub.c AS n_right,
        |  ln(((CAST(bi.cp AS DOUBLE) * tt.t) * tt.t) /
        |     ((bt.b * CAST(ua.c AS DOUBLE)) * CAST(ub.c AS DOUBLE))) AS pmi
        |FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b, tt, bt
        |WHERE bi.cp >= 5
        |ORDER BY pmi DESC, bigram ASC LIMIT 50""".stripMargin,
    "q_dq_referential" ->
      """SELECT 'customer.c_nationkey->nation' AS fk,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_orphans,
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) END AS orphan_frac
        |FROM (SELECT c_nationkey AS k FROM customer
        |      WHERE c_nationkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation
        |           WHERE n_nationkey IS NOT NULL) p ON c.k = p.k
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) END
        |FROM (SELECT l_orderkey AS k FROM lineitem
        |      WHERE l_orderkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders
        |           WHERE o_orderkey IS NOT NULL) p ON c.k = p.k
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) END
        |FROM (SELECT l_partkey AS k FROM lineitem
        |      WHERE l_partkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part
        |           WHERE p_partkey IS NOT NULL) p ON c.k = p.k
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) END
        |FROM (SELECT o_custkey AS k FROM orders
        |      WHERE o_custkey IS NOT NULL) c
        |LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer
        |           WHERE c_custkey IS NOT NULL) p ON c.k = p.k
        |ORDER BY fk ASC""".stripMargin,
    "q_text_readability" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |  END AS flesch,
        |  CASE WHEN n_words > 0 THEN
        |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |      + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |      - 15.59
        |  END AS fkgl
        |FROM t ORDER BY doc_id ASC""".stripMargin)
}
