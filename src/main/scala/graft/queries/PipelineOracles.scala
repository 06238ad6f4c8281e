package graft.queries

/** DuckDB oracles for the SQL-expressible pipeline queries. Hash-based ops
  * (minhash/simhash/winnow/LSH: engine-specific xxhash64) are intentionally
  * absent → driver records rows-only checks for them. */
object PipelineOracles {
  /** Shared CTE: tokens + distinct 3-gram shingles per document, with the
    * short-doc fallback mirroring Dedup.shingles. */
  private val shinglesCte =
    """WITH w AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS w
      |           FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      |  FROM w WHERE len(w) >= 3
      |  UNION ALL
      |  SELECT doc_id, [array_to_string(w, ' ')] AS s FROM w WHERE len(w) < 3),
      |ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh)""".stripMargin

  /** One text for q_decontaminate AND q_stream_decontaminate: the
    * at-ingestion flags must equal the batch computation bit for bit. */
  private val decontaminateSql: String =
    s"""$shinglesCte,
       |eg AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < 20),
       |hits AS (SELECT DISTINCT ex.doc_id FROM ex JOIN eg USING (shingle))
       |SELECT d.doc_id AS id,
       |  d.doc_id IN (SELECT doc_id FROM hits) AS contaminated
       |FROM documents d ORDER BY id""".stripMargin

  private val cosExpr = (a: String, b: String) =>
    s"""list_reduce(list_transform(generate_series(1,64), i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)), (x,y) -> x+y)
       | / (sqrt(list_reduce(list_transform(generate_series(1,64), i -> CAST($a[i] AS DOUBLE)*CAST($a[i] AS DOUBLE)), (x,y) -> x+y))
       |  * sqrt(list_reduce(list_transform(generate_series(1,64), i -> CAST($b[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)), (x,y) -> x+y)))""".stripMargin

  /** The exact top-k cosine oracle, shared verbatim by q_ann_bruteforce and
    * the two exact-twin gates (IVF nprobe=k, LSH nbits=0) — one text, so
    * the tie-break/query-subset construction cannot silently diverge. */
  private val exactAnnOracle: String =
    s"""SELECT query_id, rank, nbr_id, cos FROM (
       |  SELECT query_id, nbr_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id ASC) AS INTEGER) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |      ${cosExpr("q.embedding", "c.embedding")} AS cos
       |    FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 5) q
       |    WHERE q.vec_id <> c.vec_id) s) r
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** One text for q_ann_sq8 AND q_ann_sq8_persisted: saved-then-loaded
    * ranges must score bit-identically to the ranges they were built
    * from. Asymmetric SQ8: corpus side round-trips through per-dimension
    * 8-bit codes, query side full precision — same arithmetic order as
    * the Spark side, so both gates hash-match. `corpusFilter` narrows
    * the CANDIDATE side only (ranges stay corpus-trained) — the filtered
    * probe's query-time-predicate contract. */
  private def sq8SqlWith(candidateJoin: String): String =
    s"""WITH dims AS (
       |  SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
       |         MAX(CAST(embedding[i] AS DOUBLE)) AS mx
       |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
       |  GROUP BY i),
       |codes AS (
       |  SELECT e.vec_id, d.i,
       |    CASE WHEN d.mx = d.mn THEN 0
       |         ELSE CAST(round((CAST(e.embedding[d.i] AS DOUBLE) - d.mn)
       |                         / (d.mx - d.mn) * 255.0) AS INTEGER) END AS code
       |  FROM embeddings e CROSS JOIN dims d),
       |deq AS (
       |  SELECT c.vec_id, c.i,
       |    d.mn + CAST(c.code AS DOUBLE) * (d.mx - d.mn) / 255.0 AS x
       |  FROM codes c JOIN dims d USING (i)),
       |cvec AS (SELECT vec_id, list(x ORDER BY i) AS v FROM deq GROUP BY vec_id),
       |qs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
       |SELECT query_id, rank, nbr_id, cos FROM (
       |  SELECT query_id, nbr_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id ASC) AS INTEGER) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |      ${cosExpr("q.embedding", "c.v")} AS cos
       |    FROM cvec c $candidateJoin, qs q WHERE q.vec_id <> c.vec_id) s) r
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private val sq8Sql: String = sq8SqlWith("")

  /** Shared filtered exact-scan text: q_ann_ivf_filtered and the
    * degenerate-config filtered quantized twins (IVF-PQ nprobe = k with
    * m = 1/ks = N; pure PQ m = 1/ks = N) all reduce to the exact cosine
    * top-k over the label-filtered corpus. */
  private val filteredExactAnnOracle: String =
    s"""SELECT query_id, rank, nbr_id, cos FROM (
       |  SELECT query_id, nbr_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, nbr_id ASC) AS INTEGER) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
       |      ${cosExpr("q.embedding", "c.embedding")} AS cos
       |    FROM (SELECT * FROM embeddings WHERE label % 3 = 0) c,
       |      (SELECT * FROM embeddings WHERE vec_id < 5) q
       |    WHERE q.vec_id <> c.vec_id) s) r
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** One oracle text for q_bm25, q_bm25_persisted AND q_bm25_incremental:
    * a saved-then-loaded index must score bit-identically to the index it
    * was built from, and a delta-appended index to a from-scratch build on
    * the union corpus — so all three gates share this SQL verbatim. */
  private val bm25Sql: String =
    """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |           FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS term FROM w),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |       WHERE len(term) > 0 GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      |       FROM dl),
      |q AS (SELECT unnest(['spark', 'customer', 'vector']) AS term),
      |dfq AS (SELECT term, count(*) AS df FROM tf JOIN q USING (term) GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    ln(1.0e0 + (CAST(s.n AS DOUBLE) - d.df + 0.5e0) / (d.df + 0.5e0)) *
      |    ((t.tf * 2.5e0) / (t.tf + 1.5e0 * (0.25e0 + (0.75e0 * l.dl) / s.avgdl)))
      |      AS ts
      |  FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), st s)
      |SELECT doc_id, count(*) AS n_terms,
      |  list_reduce(list_prepend(0.0e0, list_sort(list(ts))), (x, y) -> x + y)
      |    AS score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH hist AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 300),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 200
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents
        |  WHERE doc_id BETWEEN 400 AND 449),
        |b AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM batch GROUP BY 1)
        |SELECT keep_id AS id FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.h = b.h)
        |ORDER BY id""".stripMargin,
    "q_dedup_incremental_bloom" ->
      // Identical to q_dedup_incremental's oracle: the Bloom pre-filter is
      // an exactness-preserving optimization, so the same SQL is the truth
      // for both formulations.
      """WITH hist AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 300),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 200
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents
        |  WHERE doc_id BETWEEN 400 AND 449),
        |b AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM batch GROUP BY 1)
        |SELECT keep_id AS id FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.h = b.h)
        |ORDER BY id""".stripMargin,
    "q_dedup_keep_best" ->
      // chain edges within 10-id blocks => component = floor(id/10)*10
      """SELECT (doc_id // 10) * 10 AS component,
        |  (array_agg(doc_id ORDER BY doc_id % 7 DESC, doc_id ASC))[1]
        |    AS keep_id,
        |  count(*) AS cluster_size
        |FROM documents GROUP BY 1 ORDER BY component""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      s"""$shinglesCte,
         |keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) <= 1000),
         |kept AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN keep USING (shingle)),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
         |sided AS (SELECT k.doc_id, s.n_sh, k.shingle FROM kept k JOIN sz s USING (doc_id))
         |SELECT a, b, jaccard FROM (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(count(*) AS DOUBLE) / (any_value(x.n_sh) + any_value(y.n_sh) - count(*)) AS jaccard
         |  FROM sided x JOIN sided y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id) t
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,
    "q_dedup_embedding" ->
      s"""SELECT a, b, cos FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    ${cosExpr("x.embedding", "y.embedding")} AS cos
         |  FROM embeddings x JOIN embeddings y
         |    ON x.label = y.label AND x.vec_id < y.vec_id) t
         |WHERE cos >= 0.35 ORDER BY a, b""".stripMargin,
    "q_ann_bruteforce" -> exactAnnOracle,
    // asymmetric SQ8: corpus side round-trips through per-dimension 8-bit
    // codes (ranges trained on the same corpus), query side full precision
    // — same arithmetic order as the Spark side, so the gate hash-matches
    "q_ann_sq8" -> sq8Sql,
    // saved-then-loaded ranges must score bit-identically: same oracle text
    "q_ann_sq8_persisted" -> sq8Sql,
    // IVF with nprobe = k probes every inverted list → identical to brute
    // force (same ordering, same cosine arithmetic)
    "q_ann_ivf_exact" -> exactAnnOracle,
    // filtered LSH with nbits = 0 (one bucket): same filtered exact scan
    "q_ann_lsh_filtered" ->
      s"""SELECT query_id, rank, nbr_id, cos FROM (
         |  SELECT query_id, nbr_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, nbr_id ASC) AS INTEGER) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         |      ${cosExpr("q.embedding", "c.embedding")} AS cos
         |    FROM (SELECT * FROM embeddings WHERE label % 3 = 0) c,
         |      (SELECT * FROM embeddings WHERE vec_id < 5) q
         |    WHERE q.vec_id <> c.vec_id) s) r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // filtered ANN with nprobe = k: candidates are the label-filtered
    // corpus, ranking identical to brute force over that subset
    "q_ann_ivf_filtered" -> filteredExactAnnOracle,
    // IVF-PQ with nprobe = k AND m = 1, ks = N: both approximations vanish
    // and the ADC arithmetic reduces to the same flat fold → brute force
    "q_ann_ivfpq_exact" -> exactAnnOracle,
    // pure PQ with m = 1, ks = N (iters = 0): every vector is its own
    // single-subspace centroid → zero quantization error → brute force
    "q_ann_pq_exact" -> exactAnnOracle,
    // the filtered quantized probes at their degenerate configs: same
    // filtered exact scan (the allowed-id semi-join lands pre-distance)
    "q_ann_ivfpq_filtered" -> filteredExactAnnOracle,
    "q_ann_pq_filtered" -> filteredExactAnnOracle,
    // filtered SQ8: corpus-trained ranges, candidate side label-filtered
    "q_ann_sq8_filtered" -> sq8SqlWith(
      "JOIN embeddings e ON e.vec_id = c.vec_id AND (e.label % 3 = 0)"),
    // md5-prefix SimHash: per-token-occurrence ±1 votes per bit of the
    // 60-bit portable hash; sign of the accumulated vote → signature bit
    "q_dedup_simhash" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS t FROM w),
        |v AS (SELECT doc_id, g.b,
        |        SUM(CASE WHEN ((('0x' || substr(md5(t), 1, 15))::BIGINT >> g.b) & 1) = 1
        |            THEN 1 ELSE -1 END) AS votes
        |      FROM tok CROSS JOIN generate_series(0, 59) AS g(b)
        |      GROUP BY doc_id, g.b)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // equal-signature buckets over the same portable signature
    "q_dedup_simhash_groups" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS t FROM w),
        |v AS (SELECT doc_id, g.b,
        |        SUM(CASE WHEN ((('0x' || substr(md5(t), 1, 15))::BIGINT >> g.b) & 1) = 1
        |            THEN 1 ELSE -1 END) AS votes
        |      FROM tok CROSS JOIN generate_series(0, 59) AS g(b)
        |      GROUP BY doc_id, g.b),
        |sig AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
        |  FROM v GROUP BY doc_id)
        |SELECT sig, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM sig GROUP BY sig HAVING count(*) > 1 ORDER BY sig""".stripMargin,
    // SemDedup with k = 1 is exact all-pairs cosine
    "q_dedup_semantic_exact" ->
      s"""SELECT a, b, cos FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    ${cosExpr("x.embedding", "y.embedding")} AS cos
         |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id) t
         |WHERE cos >= 0.35 ORDER BY a, b""".stripMargin,
    // grouped SemDedup with k = 1: exact per-label all-pairs cosine —
    // the group key confines pairs exactly like the label-block join
    "q_dedup_semantic_grouped" ->
      s"""SELECT "group", a, b, cos FROM (
         |  SELECT CAST(x.label AS VARCHAR) AS "group", x.vec_id AS a,
         |    y.vec_id AS b,
         |    ${cosExpr("x.embedding", "y.embedding")} AS cos
         |  FROM embeddings x JOIN embeddings y
         |    ON x.label = y.label AND x.vec_id < y.vec_id) t
         |WHERE cos >= 0.35 ORDER BY "group" ASC, a ASC, b ASC""".stripMargin,
    // LSH with nbits = 0 → one bucket → brute force
    "q_ann_lsh_exact" -> exactAnnOracle,
    // duplicated 10-token windows, counted exactly over the constructed
    // corpus (originals + prefixed copies of ids < 30)
    "q_dedup_substring" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, 'syndicated copy follows ' || text
        |  FROM documents WHERE doc_id < 30),
        |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |      FROM corpus),
        |gr AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(w) - 9),
        |           i -> array_to_string(w[i:i+9], ' ')) AS g
        |  FROM w WHERE len(w) >= 10),
        |ex AS (SELECT doc_id, unnest(generate_series(1, len(g))) AS i, g FROM gr),
        |pos AS (SELECT doc_id, i - 1 AS pos, g[i] AS gram FROM ex),
        |hot AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) > 1)
        |SELECT doc_id, count(*) AS n_dup_windows,
        |  CAST(min(pos) AS INTEGER) AS first_dup_pos
        |FROM pos JOIN hot USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_substring_remove" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, 'syndicated copy follows ' || text
        |  FROM documents WHERE doc_id < 30),
        |w0 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |       FROM corpus),
        |g AS (SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+9], ' ') AS gram
        |      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 9)) AS i
        |            FROM w0 WHERE len(w) >= 10)),
        |o AS (SELECT doc_id, pos,
        |        count(*) OVER (PARTITION BY gram) AS occ,
        |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |      FROM g),
        |spans AS (SELECT doc_id, pos AS s, pos + 9 AS e FROM o
        |          WHERE occ > 1 AND rn > 1),
        |tok AS (SELECT doc_id, i - 1 AS tpos, w[i] AS tok
        |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
        |              FROM w0)),
        |kept AS (SELECT t.doc_id, t.tpos, t.tok FROM tok t
        |         WHERE NOT EXISTS (SELECT 1 FROM spans s
        |           WHERE s.doc_id = t.doc_id AND t.tpos BETWEEN s.s AND s.e)),
        |agg AS (SELECT doc_id,
        |          array_to_string(list(tok ORDER BY tpos), ' ') AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id),
        |base AS (SELECT doc_id, len(w) AS n_toks FROM w0)
        |SELECT b.doc_id, COALESCE(a.clean_text, '') AS clean_text,
        |  CAST(b.n_toks - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // bands = k → candidate recall ≈ 1, verification exact → all-pairs
    // Jaccard over the UNFILTERED shingle sets (no maxDf cap here, unlike
    // q_dedup_ngram_jaccard)
    "q_dedup_minhash_exact" ->
      s"""$shinglesCte
         |SELECT a, b, jaccard FROM (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(count(*) AS DOUBLE) / (any_value(x.n_sh) + any_value(y.n_sh) - count(*)) AS jaccard
         |  FROM ex x JOIN ex y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id) t
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,
    // bands = k → candidate recall ≈ 1, verification exact → the gate equals
    // this exact batch × history Jaccard join (same construction as the gate)
    // per-language exact Jaccard pairs: the grouped minhash gate's
    // bands = k config degenerates to this (miss prob ≤ 2e-10)
    "q_dedup_minhash_grouped" ->
      """WITH w AS (SELECT doc_id, CAST(lang AS VARCHAR) AS grp,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE lang IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, grp,
        |    list_distinct(list_transform(generate_series(1, len(w)-2),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM w WHERE len(w) >= 3
        |  UNION ALL
        |  SELECT doc_id, grp, [array_to_string(w, ' ')] AS s
        |  FROM w WHERE len(w) < 3),
        |ex AS (SELECT doc_id, grp, len(s) AS n, unnest(s) AS shingle
        |  FROM sh),
        |j AS (SELECT x.grp, x.doc_id AS a, y.doc_id AS b,
        |    any_value(x.n) AS na, any_value(y.n) AS nb,
        |    count(*) AS common
        |  FROM ex x JOIN ex y ON x.shingle = y.shingle
        |    AND x.grp = y.grp AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT grp AS "group", a, b,
        |  CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
        |FROM j WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5
        |ORDER BY "group", a, b""".stripMargin,
    "q_dedup_incremental_near_exact" ->
      """WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
        |batch AS (
        |  SELECT doc_id + 10000 AS doc_id, text || ' trailing audit note' AS text
        |  FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400),
        |hw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM hist),
        |bw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM batch),
        |hsh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM hw WHERE len(w) >= 3
        |  UNION ALL
        |  SELECT doc_id, [array_to_string(w, ' ')] AS s FROM hw WHERE len(w) < 3),
        |bsh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM bw WHERE len(w) >= 3
        |  UNION ALL
        |  SELECT doc_id, [array_to_string(w, ' ')] AS s FROM bw WHERE len(w) < 3),
        |hex AS (SELECT doc_id AS hist_id, len(s) AS nh, unnest(s) AS shingle FROM hsh),
        |bex AS (SELECT doc_id AS batch_id, len(s) AS nb, unnest(s) AS shingle FROM bsh),
        |j AS (
        |  SELECT batch_id, hist_id, any_value(nb) AS nb, any_value(nh) AS nh,
        |    count(*) AS common
        |  FROM bex JOIN hex USING (shingle)
        |  GROUP BY batch_id, hist_id)
        |SELECT batch_id, hist_id,
        |  CAST(common AS DOUBLE) / (nb + nh - common) AS jaccard
        |FROM j
        |WHERE CAST(common AS DOUBLE) / (nb + nh - common) >= 0.5
        |ORDER BY batch_id, hist_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS INTEGER) AS n_distinct,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(string_split_regex(lower(trim(text)), '\s+'), t -> CAST(length(t) AS BIGINT))),
        |       (x,y) -> x+y) AS DOUBLE)
        |    / len(string_split_regex(lower(trim(text)), '\s+')) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_embed_meanpool" ->
      """WITH e AS (SELECT label, j, CAST(embedding[j + 1] AS DOUBLE) AS x
        |           FROM embeddings CROSS JOIN generate_series(0, 63) AS t(j)),
        |m AS (SELECT label, j,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(x))),
        |                    (a, b) -> a + b) / count(*) AS v
        |      FROM e GROUP BY label, j)
        |SELECT label, CAST(j AS INTEGER) AS j, v
        |FROM m ORDER BY label, j""".stripMargin,
    "q_embed_project" ->
      """SELECT vec_id, CAST(j AS INTEGER) AS j,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(generate_series(1, 64), i ->
        |      CAST(embedding[i] AS DOUBLE) *
        |      (CASE WHEN substr(md5('jl:' || (i-1) || ',' || j), 1, 1) < '8'
        |            THEN 1.0e0 ELSE -1.0e0 END))),
        |    (x, y) -> x + y) * 0.25e0 AS y
        |FROM embeddings CROSS JOIN generate_series(0, 15) AS t(j)
        |ORDER BY vec_id, j""".stripMargin,
    "q_interleave" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        |  FROM documents),
        |w AS (SELECT * FROM (VALUES ('en', 3.0), ('de', 2.0), ('fr', 1.0),
        |                            ('es', 1.0), ('zh', 1.0)) t(lang, wt))
        |SELECT doc_id, lang,
        |  CAST(rk AS DOUBLE) / CAST(wt AS DOUBLE) AS order_key
        |FROM r JOIN w USING (lang)
        |ORDER BY order_key, doc_id""".stripMargin,
    "q_pct_rank" ->
      """WITH n AS (SELECT count(*) AS c FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(rank() OVER (ORDER BY n_chars) - 1 AS DOUBLE)
        |    / CAST(c - 1 AS DOUBLE) AS pct_rank
        |FROM documents, n ORDER BY doc_id""".stripMargin,
    "q_corpus_overlap" ->
      """WITH na AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(regexp_replace(
        |    lower(text), '[0-9]', '0', 'g'), '[\p{P}\p{S}]', '', 'g'),
        |    '\s+', ' ', 'g'))) AS k
        |  FROM documents WHERE lang = 'en'),
        |nb AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(regexp_replace(
        |    lower(text), '[0-9]', '0', 'g'), '[\p{P}\p{S}]', '', 'g'),
        |    '\s+', ' ', 'g'))) AS k
        |  FROM documents WHERE lang <> 'en'),
        |ga AS (SELECT DISTINCT unnest(CASE WHEN len(w) < 3
        |         THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END) AS shingle
        |       FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |             FROM documents WHERE lang = 'en') t),
        |gb AS (SELECT DISTINCT unnest(CASE WHEN len(w) < 3
        |         THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END) AS shingle
        |       FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |             FROM documents WHERE lang <> 'en') t),
        |dk AS (SELECT (SELECT count(*) FROM na) AS docs_a,
        |              (SELECT count(*) FROM nb) AS docs_b,
        |              (SELECT count(*) FROM na JOIN nb USING (k)) AS docs_common),
        |gk AS (SELECT (SELECT count(*) FROM ga) AS ngrams_a,
        |              (SELECT count(*) FROM gb) AS ngrams_b,
        |              (SELECT count(*) FROM ga JOIN gb USING (shingle)) AS ngrams_common)
        |SELECT docs_a, docs_b, docs_common,
        |  CAST(docs_common AS DOUBLE) / docs_a AS docs_contain_a,
        |  CAST(docs_common AS DOUBLE) / docs_b AS docs_contain_b,
        |  CAST(docs_common AS DOUBLE) / (docs_a + docs_b - docs_common) AS docs_jaccard,
        |  ngrams_a, ngrams_b, ngrams_common,
        |  CAST(ngrams_common AS DOUBLE) / ngrams_a AS ngrams_contain_a,
        |  CAST(ngrams_common AS DOUBLE) / ngrams_b AS ngrams_contain_b,
        |  CAST(ngrams_common AS DOUBLE) / (ngrams_a + ngrams_b - ngrams_common) AS ngrams_jaccard
        |FROM dk, gk""".stripMargin,
    "q_ngram_novelty" ->
      s"""$shinglesCte,
         |fr AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY 1)
         |SELECT ex.doc_id, count(*) AS n_ngrams,
         |  count(*) FILTER (WHERE fr.dfc > 1) AS shared,
         |  1.0 - CAST(count(*) FILTER (WHERE fr.dfc > 1) AS DOUBLE)
         |      / count(*) AS novelty
         |FROM ex JOIN fr USING (shingle)
         |GROUP BY ex.doc_id ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('the','a','of','and','to','in','is','that'))) AS s_en,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('el','la','de','que','y','en','un','los'))) AS s_es,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('der','die','das','und','ist','von','ein','zu'))) AS s_de,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('le','la','de','et','est','un','une','dans'))) AS s_fr,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('的','是','在','了','和','有','我','不'))) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
        |       WHEN s_zh > 0 THEN 'zh'
        |       ELSE 'und' END AS lang_pred,
        |  CAST(s_en AS INTEGER) AS score_en
        |FROM sc ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
        |    CAST(length(text) AS DOUBLE) AS n_char,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha_chars,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> t IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE) AS stop_hits,
        |    CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE) AS n_distinct
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    (((CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END
        |      + alpha_chars / n_char)
        |      + least(stop_hits / n_tok * 5.0, 1.0))
        |      + n_distinct / n_tok) / 4.0 AS quality
        |  FROM f)
        |SELECT doc_id, quality, quality >= 0.5 AS keep FROM q ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(string_split_regex(lower(trim(text)), '\s+')[1:8], ' ')) AS prefix_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // md5-prefix winnowing: min over the portable hash of every 4-token
    // window; fewer than 4 tokens hash the whole joined array once
    // (list_slice clamps exactly like the Spark slice)
    "q_text_winnow" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(list_min(list_transform(generate_series(0, greatest(len(toks) - 4, 0)),
        |    i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 4), ' ')), 1, 15))::BIGINT))
        |    AS BIGINT) AS winnow_fp
        |FROM w ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT doc_id, 'wav' AS kind,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |    WHEN 2 THEN 44100 ELSE 48000 END AS INTEGER) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INTEGER)
        |    AS bits_per_sample,
        |  CAST(doc_id % 1000 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_events_json" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // components of the consecutive-id-within-block-of-100 chain graph,
    // via gaps-and-islands (no recursion needed for a path graph)
    "q_dedup_clusters" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    CASE WHEN lag(doc_id) OVER (ORDER BY doc_id) = doc_id - 1
        |              AND doc_id % 100 <> 0 THEN 0 ELSE 1 END AS brk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |        sum(brk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM o)
        |SELECT doc_id AS node,
        |  min(doc_id) OVER (PARTITION BY grp) AS component
        |FROM g ORDER BY node""".stripMargin,
    "q_contrastive_pairs" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    CASE WHEN lag(doc_id) OVER (ORDER BY doc_id) = doc_id - 1
        |              AND doc_id % 100 <> 0 THEN 0 ELSE 1 END AS brk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |        sum(brk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM o),
        |cc AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY grp) AS component
        |       FROM g)
        |SELECT doc_id AS anchor, component AS positive FROM cc
        |WHERE doc_id <> component ORDER BY anchor""".stripMargin,
    // the keep CTE mirrors fuzzyPairs' maxBlock guard (blocks > 1000 drop)
    "q_fuzzy_pairs" ->
      """WITH blk AS (
        |  SELECT c_custkey, c_name,
        |    substr(lower(trim(c_name)), 1, 17) AS blk
        |  FROM customer),
        |keep AS (SELECT blk FROM blk GROUP BY blk HAVING count(*) <= 1000)
        |SELECT a.c_custkey AS a, b.c_custkey AS b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM blk a JOIN keep USING (blk) JOIN blk b USING (blk)
        |WHERE a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a, b""".stripMargin,
    "q_curation_e2e" ->
      // dedup keep-ids + quality CTE (same arithmetic as q_stream_quality)
      // + 3-gram decontamination (shared shingles CTE) + md5 source split
      s"""$shinglesCte,
         |eg AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < 20),
         |hits AS (SELECT DISTINCT ex.doc_id FROM ex JOIN eg USING (shingle)),
         |keepids AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d1 AS (SELECT d.doc_id, d.lang, d.source, d.text
         |       FROM documents d JOIN keepids USING (doc_id)),
         |s AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS word_count,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / nullif(len(regexp_extract_all(text, '\\S+')), 0) AS mean_word_len,
         |    CAST(len(regexp_extract_all(text, '#'))
         |       + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE)
         |      / nullif(len(regexp_extract_all(text, '\\S+')), 0) AS symbol_ratio,
         |    CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS DOUBLE)
         |      / nullif(len(regexp_extract_all(text, '\\S+')), 0) AS alpha_word_frac,
         |    CAST(len(list_intersect(
         |      list_distinct(string_split_regex(lower(text), '\\s+')),
         |      ['the','be','to','of','and','that','have','with'])) AS INTEGER)
         |      AS stopword_hits
         |  FROM d1),
         |q AS (
         |  SELECT doc_id, lang, source,
         |    CASE WHEN word_count > 0 THEN
         |      0.15e0 * (least(word_count, 256) / 256e0)
         |      + 0.15e0 * (1e0 - least(abs(mean_word_len - 5e0), 5e0) / 5e0)
         |      + 0.2e0 * (1e0 - least(symbol_ratio * 10e0, 1e0))
         |      + 0.3e0 * least(alpha_word_frac, 1e0)
         |      + 0.2e0 * (least(stopword_hits, 4) / 4e0)
         |    END AS quality_score
         |  FROM s),
         |clean AS (
         |  SELECT doc_id, lang, source FROM q
         |  WHERE quality_score >= 0.6e0
         |    AND doc_id NOT IN (SELECT doc_id FROM hits)),
         |sp AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 1000000
         |              < 100000 THEN 'val'
         |         WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 1000000
         |              < 200000 THEN 'test' ELSE 'train' END AS split
         |  FROM clean)
         |SELECT split, lang, count(*) AS n_docs, min(doc_id) AS first_id
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_decontaminate" -> decontaminateSql,
    // the streaming gate must reproduce the batch verdicts exactly —
    // one oracle text for both
    "q_stream_decontaminate" -> decontaminateSql,
    // renamed from a duplicate "q_text_normalize" key (the CCNet
    // canonical-key oracle was shadowing this NFC one)
    "q_text_unicode_nfc" ->
      """SELECT doc_id,
        |  nfc_normalize(regexp_replace(text, 'a', 'a' || chr(769), 'g'))
        |    AS norm,
        |  CAST(length(regexp_replace(text, 'a', 'a' || chr(769), 'g'))
        |    AS INTEGER) AS n_decomposed,
        |  CAST(length(nfc_normalize(regexp_replace(text, 'a', 'a' || chr(769), 'g')))
        |    AS INTEGER) AS n_composed
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "q_tokenize_bpe_exact" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INTEGER)
        |    AS n_tokens
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      // CAST the window sum: DuckDB sum(BIGINT) widens to HUGEINT
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    coalesce(CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS cum
        |  FROM documents)
        |SELECT doc_id, n_chars, cum // 4096 AS pack_id, cum % 4096 AS pack_pos
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_chunk_docs" ->
      // step = size - overlap = 64; chunk_idx = (start-1) / step
      """SELECT doc_id,
        |  CAST((start - 1) // 64 AS INTEGER) AS chunk_idx,
        |  substr(text, CAST(start AS INTEGER), 80) AS chunk
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(range(1, length(text) + 1, 64)) AS start
        |  FROM documents WHERE doc_id < 50)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_split_train" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000000 < 100000
        |         THEN 'val'
        |         WHEN ((doc_id % 1000003) * 2654435761) % 1000000 < 200000
        |         THEN 'test' ELSE 'train' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n, min(doc_id) AS first_id
        |FROM b GROUP BY split ORDER BY split""".stripMargin,
    "q_split_leakage_safe" ->
      // keyBucket: first 8 md5 hex chars of the key string, mod 1e6 —
      // identical arithmetic to DataMix.keyBucket
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substr(md5(source), 1, 8))::BIGINT % 1000000 AS bk
        |  FROM documents),
        |s AS (
        |  SELECT source,
        |    CASE WHEN bk < 200000 THEN 'val'
        |         WHEN bk < 400000 THEN 'test' ELSE 'train' END AS split
        |  FROM b)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q_curriculum_phases" ->
      // same order-statistic contract as Quantiles.exactQuantiles:
      // cut_q = value at rank max(1, ceil(q*n)) under (value, id) order;
      // phase = 1 + count(cuts strictly below the score)
      """WITH t AS (SELECT doc_id, n_chars FROM documents),
        |n AS (SELECT count(*) AS n FROM t),
        |r AS (SELECT n_chars,
        |        row_number() OVER (ORDER BY n_chars, doc_id) AS rk FROM t),
        |cuts AS (
        |  SELECT n_chars AS cut FROM r, n
        |  WHERE rk IN (greatest(1, CAST(ceil(0.25 * n) AS BIGINT)),
        |               greatest(1, CAST(ceil(0.5 * n) AS BIGINT)),
        |               greatest(1, CAST(ceil(0.75 * n) AS BIGINT)))),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    1 + CAST((SELECT count(*) FROM cuts WHERE cut < n_chars)
        |             AS INTEGER) AS phase
        |  FROM t)
        |SELECT phase, count(*) AS n_docs, min(n_chars) AS min_score,
        |  max(n_chars) AS max_score
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_match_distribution" ->
      // Mirrors DataMix.matchDistribution step for step: exact counts,
      // N* = min(C_g/t_g) in DOUBLE, thr = floor(least(1, t*N*/C)*1e6),
      // then the same Knuth-hash keep decision per doc id.
      """WITH tgt AS (
        |  SELECT * FROM (VALUES ('en', 0.5e0), ('fr', 0.3e0), ('de', 0.2e0))
        |    AS t(lang, tg)),
        |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cg
        |      FROM documents GROUP BY lang),
        |j AS (SELECT c.lang, cg, tg FROM c JOIN tgt USING (lang) WHERE tg > 0),
        |ns AS (SELECT min(CAST(cg AS DOUBLE) / tg) AS nstar FROM j),
        |th AS (SELECT lang,
        |         CAST(floor(least(1.0e0, tg * nstar / CAST(cg AS DOUBLE))
        |           * 1000000e0) AS BIGINT) AS thr
        |       FROM j, ns)
        |SELECT d.lang, count(*) AS n_kept, min(doc_id) AS first_id
        |FROM documents d JOIN th ON d.lang = th.lang
        |WHERE ((doc_id % 1000003) * 2654435761) % 1000000 < thr
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q_sample_exact_n" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "q_decontaminate_semantic" ->
      s"""WITH p AS (
         |  SELECT c.vec_id AS vec_id, q.vec_id AS eval_id,
         |    ${cosExpr("c.embedding", "q.embedding")} AS cos
         |  FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 5) q
         |  WHERE c.vec_id <> q.vec_id),
         |r AS (SELECT vec_id, eval_id, cos,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, eval_id DESC) AS rn
         |      FROM p)
         |SELECT vec_id, eval_id, cos AS max_cos, (cos >= 0.35) AS contaminated
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_dsir" ->
      """WITH w AS (SELECT doc_id, lang,
        |             string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |big AS (SELECT doc_id, lang,
        |          list_transform(generate_series(1, len(w) - 1),
        |            i -> w[i] || ' ' || w[i+1]) AS g
        |        FROM w WHERE len(w) >= 2),
        |feat AS (SELECT doc_id, lang, substr(md5(unnest(g)), 1, 4) AS bucket
        |         FROM big),
        |tcnt AS (SELECT bucket, count(*) AS ct FROM feat
        |         WHERE lang = 'de' GROUP BY 1),
        |ttot AS (SELECT count(*) AS t FROM feat WHERE lang = 'de'),
        |rcnt AS (SELECT bucket, count(*) AS cr FROM feat GROUP BY 1),
        |rtot AS (SELECT count(*) AS r FROM feat),
        |sc AS (SELECT f.doc_id,
        |    ln((COALESCE(tc.ct + 1, 1) / CAST(tt.t + 65536 AS DOUBLE)) /
        |       (COALESCE(rc.cr + 1, 1) / CAST(rt.r + 65536 AS DOUBLE))) AS lr
        |  FROM feat f LEFT JOIN tcnt tc USING (bucket)
        |  LEFT JOIN rcnt rc USING (bucket), ttot tt, rtot rt)
        |SELECT doc_id, count(*) AS n_features,
        |  list_reduce(list_prepend(0.0e0, list_sort(list(lr))), (x, y) -> x + y)
        |    AS weight
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bm25" -> bm25Sql,
    "q_bm25_persisted" -> bm25Sql,
    "q_bm25_incremental" -> bm25Sql,
    "q_bm25_batch" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE len(term) > 0 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |       FROM dl),
        |qd AS (SELECT 'q1' AS qid, unnest(['spark', 'customer']) AS term
        |       UNION ALL SELECT 'q2', unnest(['vector', 'spark', 'union'])
        |       UNION ALL SELECT 'q3', unnest(['customer'])),
        |dfq AS (SELECT term, count(*) AS df FROM tf
        |        WHERE term IN (SELECT term FROM qd) GROUP BY 1),
        |scored AS (
        |  SELECT q.qid, t.doc_id,
        |    ln(1.0e0 + (CAST(s.n AS DOUBLE) - d.df + 0.5e0) / (d.df + 0.5e0)) *
        |    ((t.tf * 2.5e0) / (t.tf + 1.5e0 * (0.25e0 + (0.75e0 * l.dl) / s.avgdl)))
        |      AS ts
        |  FROM tf t JOIN dfq d USING (term) JOIN qd q USING (term)
        |    JOIN dl l USING (doc_id), st s)
        |SELECT qid, doc_id, count(*) AS n_terms,
        |  list_reduce(list_prepend(0.0e0, list_sort(list(ts))), (x, y) -> x + y)
        |    AS score
        |FROM scored GROUP BY qid, doc_id ORDER BY qid, doc_id""".stripMargin,
    "q_bm25_negatives" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE len(term) > 0 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |       FROM dl),
        |qd AS (SELECT 'q1' AS qid, unnest(['spark', 'customer']) AS term
        |       UNION ALL SELECT 'q2', unnest(['vector', 'spark', 'union'])
        |       UNION ALL SELECT 'q3', unnest(['customer'])),
        |dfq AS (SELECT term, count(*) AS df FROM tf
        |        WHERE term IN (SELECT term FROM qd) GROUP BY 1),
        |scored AS (
        |  SELECT q.qid, t.doc_id,
        |    ln(1.0e0 + (CAST(s.n AS DOUBLE) - d.df + 0.5e0) / (d.df + 0.5e0)) *
        |    ((t.tf * 2.5e0) / (t.tf + 1.5e0 * (0.25e0 + (0.75e0 * l.dl) / s.avgdl)))
        |      AS ts
        |  FROM tf t JOIN dfq d USING (term) JOIN qd q USING (term)
        |    JOIN dl l USING (doc_id), st s),
        |agg AS (
        |  SELECT qid, doc_id,
        |    list_reduce(list_prepend(0.0e0, list_sort(list(ts))), (x, y) -> x + y)
        |      AS score
        |  FROM scored GROUP BY qid, doc_id),
        |pos AS (SELECT 'q1' AS qid, CAST(5 AS BIGINT) AS pos_id
        |        UNION ALL SELECT 'q2', 17 UNION ALL SELECT 'q3', 29),
        |rn AS (
        |  SELECT a.qid, p.pos_id, a.doc_id AS neg_id, a.score,
        |    CAST(row_number() OVER (PARTITION BY a.qid, p.pos_id
        |      ORDER BY a.score DESC, a.doc_id ASC) AS INTEGER) AS rank
        |  FROM agg a JOIN pos p USING (qid) WHERE a.doc_id <> p.pos_id)
        |SELECT qid, pos_id, rank, neg_id, score FROM rn
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q_sample_exact_n_global" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id FROM documents
        |  ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000, doc_id
        |  LIMIT 200)
        |ORDER BY doc_id""".stripMargin,
    "q_data_mix_temperature" ->
      // Mirrors DataMix.temperatureRates step for step: pow in DOUBLE
      // (e-notation literals), Z as a group-sorted sequential fold, rate
      // arithmetic in the Scala expression's association order, thresholds
      // floored to the bucket grid, then the same Knuth-hash keep.
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
        |p AS (SELECT lang, n, pow(CAST(n AS DOUBLE) / nt, 0.5e0) AS pg
        |      FROM c, tot),
        |z AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list(pg ORDER BY lang)), (x, y) -> x + y) AS zv FROM p),
        |th AS (SELECT lang,
        |         CAST(floor(least(1.0e0,
        |           ((0.5e0 * nt) * (pg / zv)) / n) * 1000000e0) AS BIGINT) AS thr
        |       FROM p, z, tot),
        |kept AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        |         FROM documents d JOIN th USING (lang)
        |         WHERE ((doc_id % 1000003) * 2654435761) % 1000000 < thr
        |         GROUP BY d.lang)
        |SELECT c.lang, c.n AS n_total, COALESCE(kept.n_kept, 0) AS n_kept
        |FROM c LEFT JOIN kept USING (lang) ORDER BY c.lang""".stripMargin,
    "q_data_mix" ->
      """WITH b AS (SELECT lang, ((doc_id % 1000003) * 2654435761) % 1000000 AS bk
        |           FROM documents),
        |k AS (SELECT lang, count(*) AS n_kept FROM b
        |      WHERE bk < CASE lang WHEN 'en' THEN 500000
        |                           WHEN 'de' THEN 250000
        |                           ELSE 750000 END
        |      GROUP BY lang)
        |SELECT t.lang, t.n_total, COALESCE(k.n_kept, 0) AS n_kept
        |FROM (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang) t
        |LEFT JOIN k USING (lang) ORDER BY lang""".stripMargin,
    "q_sample_weighted" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(length(text) AS DOUBLE) AS wt,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':es'), 1, 6))::BIGINT AS b
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, wt,
        |    ln((CAST(b AS DOUBLE) + 0.5e0) / 16777216.0e0) / wt AS key
        |  FROM w WHERE wt > 0),
        |top AS (SELECT doc_id, wt FROM k ORDER BY key DESC, doc_id LIMIT 100)
        |SELECT doc_id, wt FROM top ORDER BY doc_id""".stripMargin,
    "q_sample_weighted_group" ->
      """WITH w AS (
        |  SELECT doc_id, lang, CAST(length(text) AS DOUBLE) AS wt,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':es'), 1, 6))::BIGINT AS b
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, lang, wt,
        |    ln((CAST(b AS DOUBLE) + 0.5e0) / 16777216.0e0) / wt AS key
        |  FROM w WHERE wt > 0),
        |r AS (
        |  SELECT doc_id, lang, wt,
        |    row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id)
        |      AS rn
        |  FROM k)
        |SELECT doc_id, lang, wt FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "q_shuffle_epoch" ->
      """WITH k AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || ':7') AS key FROM documents),
        |s AS (
        |  SELECT doc_id, key,
        |    CAST(('0x' || substr(key, 1, 4))::BIGINT % 32 AS INTEGER) AS shard
        |  FROM k)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1
        |    AS INTEGER) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "q_text_normalize" ->
      // the same three regexp_replace passes in the same order; DuckDB
      // needs the explicit 'g' flag where Spark's regexp_replace is
      // always global
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |    '[0-9]', '0', 'g'), '[\p{P}\p{S}]', '', 'g'), '\s+', ' ', 'g'))
        |    AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact_normalized" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |      '[0-9]', '0', 'g'), '[\p{P}\p{S}]', '', 'g'), '\s+', ' ', 'g'))
        |      AS norm
        |  FROM documents)
        |SELECT md5(norm) AS text_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM n GROUP BY norm ORDER BY text_hash""".stripMargin,
    "q_retrieval_rrf" ->
      s"""WITH bm AS ($bm25Sql),
         |lex AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
         |      AS BIGINT) AS rank_0
         |  FROM bm),
         |dn AS (
         |  SELECT c.vec_id AS id,
         |    ${cosExpr("c.embedding", "q.embedding")} AS score
         |  FROM embeddings c,
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE c.vec_id <> 0),
         |dr AS (
         |  SELECT id,
         |    CAST(row_number() OVER (ORDER BY score DESC, id ASC)
         |      AS BIGINT) AS rank_1
         |  FROM dn)
         |SELECT COALESCE(l.id, d.id) AS doc_id, l.rank_0, d.rank_1,
         |  COALESCE(1.0e0 / (60.0e0 + l.rank_0), 0.0e0) +
         |  COALESCE(1.0e0 / (60.0e0 + d.rank_1), 0.0e0) AS rrf
         |FROM lex l FULL OUTER JOIN dr d ON l.id = d.id
         |ORDER BY doc_id""".stripMargin,
    "q_zorder_key" -> {
      // identical quantize-then-interleave arithmetic, generated from the
      // same (bits, dims) loop as ZOrder.zKey
      def quant(col: String, lo: Double, hi: Double) =
        s"CAST(floor((least(greatest(CAST($col AS DOUBLE), $lo), $hi) - $lo)" +
          s" / ${hi - lo} * 255.0) AS BIGINT)"
      val terms = for { b <- 0 until 8; j <- 0 until 2 }
        yield s"(((q$j >> $b) & 1) << ${b * 2 + j})"
      s"""WITH qz AS (
         |  SELECT l_orderkey, l_linenumber,
         |    ${quant("l_extendedprice", 900.0, 105000.0)} AS q0,
         |    ${quant("l_discount", 0.0, 0.11)} AS q1
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  CAST(${terms.mkString(" + ")} AS BIGINT) AS z_key
         |FROM qz ORDER BY l_orderkey, l_linenumber""".stripMargin
    }
  )
}
