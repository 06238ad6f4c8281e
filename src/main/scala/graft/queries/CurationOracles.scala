package graft.queries

/** DuckDB oracle SQL for [[CurationQueries]]. The URL synthesis, host
  * extraction, and registered-domain rule are expressed with the same
  * engine-portable string operations as the Spark side. */
object CurationOracles {

  /** Shared CTE chain: synthesized url → host → registered domain. */
  private val DomainCtes: String =
    """WITH u AS (
      |  SELECT doc_id, text,
      |    'HTTPS://'
      |      || CASE WHEN doc_id % 5 = 0 THEN 'u:pw@' ELSE '' END
      |      || CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
      |           WHEN 2 THEN 'a.b.' ELSE '' END
      |      || 'site' || CAST(doc_id % 11 AS VARCHAR) || '.'
      |      || CASE doc_id % 3 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
      |           ELSE 'org' END
      |      || CASE WHEN doc_id % 6 = 0 THEN ':8443' ELSE '' END
      |      || '/p/' || CAST(doc_id AS VARCHAR)
      |      || CASE WHEN doc_id % 7 = 0 THEN '?x=1' ELSE '' END AS url
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, text,
      |    regexp_extract(regexp_replace(regexp_replace(lower(url),
      |      '^[a-z][a-z0-9+.-]*://', ''), '^[^/@]*@', ''),
      |      '^([^/:?#]+)', 1) AS host
      |  FROM u),
      |p AS (
      |  SELECT doc_id, text, host, string_split(host, '.') AS parts FROM h),
      |r AS (
      |  SELECT doc_id, text, host,
      |    CASE WHEN len(parts) >= 3 AND parts[len(parts)-1] IN
      |           ('ac','co','com','edu','gov','net','org')
      |      THEN array_to_string(parts[len(parts)-2:len(parts)], '.')
      |      WHEN len(parts) >= 2
      |      THEN array_to_string(parts[len(parts)-1:len(parts)], '.')
      |      ELSE host END AS domain
      |  FROM p)""".stripMargin

  // NOTE: DomainCtes contains `||` at line starts, so the final strings are
  // plain-concatenated — re-running stripMargin over the combined text
  // would eat the first `|` of each concatenation operator.
  val oracleSql: Map[String, String] = Map(
    "q_domain_stats" -> (DomainCtes + "\n" +
      """SELECT domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM r GROUP BY domain ORDER BY domain""".stripMargin),
    "q_domain_cap" -> (DomainCtes + ",\n" +
      """rn AS (
        |  SELECT domain, doc_id,
        |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
        |  FROM r)
        |SELECT domain, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM rn WHERE rk <= 5 ORDER BY domain, rk""".stripMargin),
    "q_domain_blocklist" -> (DomainCtes + "\n" +
      """SELECT doc_id, domain FROM r
        |WHERE domain NOT IN ('site1.com', 'site4.co.uk', 'site7.org')
        |ORDER BY doc_id""".stripMargin),
    "q_histogram_group" ->
      """WITH b AS (SELECT lang, CAST(min(n_chars) AS DOUBLE) AS mn,
        |                  CAST(max(n_chars) AS DOUBLE) AS mx
        |           FROM documents GROUP BY lang),
        |m AS (SELECT d.lang,
        |        CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |          ELSE LEAST(CAST(9 AS BIGINT),
        |            CAST(floor((CAST(n_chars AS DOUBLE) - mn) * 10.0e0 / (mx - mn))
        |              AS BIGINT)) END AS bin, mn, mx
        |      FROM documents d JOIN b ON d.lang = b.lang)
        |SELECT lang, bin,
        |  mn + CAST(bin AS DOUBLE) * (mx - mn) / 10.0e0 AS lo,
        |  mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / 10.0e0 AS hi,
        |  count(*) AS n
        |FROM m GROUP BY lang, bin, mn, mx ORDER BY lang, bin""".stripMargin,
    "q_histogram" ->
      """WITH b AS (SELECT CAST(min(n_chars) AS DOUBLE) AS mn,
        |                  CAST(max(n_chars) AS DOUBLE) AS mx FROM documents),
        |m AS (SELECT CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |        ELSE LEAST(CAST(19 AS BIGINT),
        |          CAST(floor((CAST(n_chars AS DOUBLE) - mn) * 20.0e0 / (mx - mn))
        |            AS BIGINT)) END AS bin, mn, mx
        |      FROM documents, b)
        |SELECT bin,
        |  mn + CAST(bin AS DOUBLE) * (mx - mn) / 20.0e0 AS lo,
        |  mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / 20.0e0 AS hi,
        |  count(*) AS n
        |FROM m GROUP BY bin, mn, mx ORDER BY bin""".stripMargin,
    "q_corpus_card" ->
      """WITH s AS (
        |  SELECT lang, doc_id, length(text) AS len,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS sent,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl,
        |    len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]')) AS c_latin,
        |    len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS c_cyrillic,
        |    len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS c_greek,
        |    len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS c_arabic,
        |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]')) AS c_cjk,
        |    len(regexp_extract_all(text, '[0-9]')) AS c_digit,
        |    CAST(GREATEST(length(text), 1) AS DOUBLE) AS total
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT lang, doc_id, len,
        |    CASE WHEN w > 0 THEN
        |      206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
        |        - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
        |    END AS flesch,
        |    CAST(c_latin AS DOUBLE) / total AS f_latin,
        |    CAST(c_cyrillic AS DOUBLE) / total AS f_cyrillic,
        |    CAST(c_greek AS DOUBLE) / total AS f_greek,
        |    CAST(c_arabic AS DOUBLE) / total AS f_arabic,
        |    CAST(c_cjk AS DOUBLE) / total AS f_cjk,
        |    CAST(c_digit AS DOUBLE) / total AS f_digit
        |  FROM s),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY len, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM f),
        |a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len) AS BIGINT) AS n_chars,
        |    CAST(sum(len) AS DOUBLE) / count(*) AS mean_chars,
        |    CAST(max(CASE WHEN rk = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
        |      THEN len END) AS BIGINT) AS p50_chars,
        |    CAST(max(CASE WHEN rk = GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT))
        |      THEN len END) AS BIGINT) AS p95_chars,
        |    sum(CAST(floor(CAST(len AS DOUBLE) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s1,
        |    sum(CAST(floor((CAST(rk AS DOUBLE) * CAST(len AS DOUBLE)) * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS s2,
        |    sum(CAST(floor(flesch * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS fl,
        |    CAST(count(flesch) AS BIGINT) AS fln,
        |    sum(CAST(floor(f_latin * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_latin,
        |    sum(CAST(floor(f_cyrillic * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_cyrillic,
        |    sum(CAST(floor(f_greek * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_greek,
        |    sum(CAST(floor(f_arabic * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_arabic,
        |    sum(CAST(floor(f_cjk * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_cjk,
        |    sum(CAST(floor(f_digit * 1048576.0 + 0.5) AS DECIMAL(38,0))) AS sf_digit
        |  FROM r GROUP BY lang)
        |SELECT lang, n_docs, n_chars, mean_chars, p50_chars, p95_chars,
        |  CASE WHEN n_docs > 0 AND s1 > 0 THEN
        |    ((2.0 * (CAST(s2 AS DOUBLE) / 1048576.0)) /
        |     (CAST(n_docs AS DOUBLE) * (CAST(s1 AS DOUBLE) / 1048576.0)))
        |      - ((CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE))
        |  END AS gini_chars,
        |  CASE WHEN fln > 0 THEN
        |    (CAST(fl AS DOUBLE) / 1048576.0) / CAST(fln AS DOUBLE)
        |  END AS mean_flesch,
        |  (CAST(sf_latin AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_latin,
        |  (CAST(sf_cyrillic AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_cyrillic,
        |  (CAST(sf_greek AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_greek,
        |  (CAST(sf_arabic AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_arabic,
        |  (CAST(sf_cjk AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_cjk,
        |  (CAST(sf_digit AS DOUBLE) / 1048576.0) / CAST(n_docs AS DOUBLE) AS mean_frac_digit
        |FROM a ORDER BY lang""".stripMargin,
    "q_text_scripts" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    text || CASE doc_id % 4
        |      WHEN 0 THEN ' Привет мир 123'
        |      WHEN 1 THEN ' 你好世界'
        |      WHEN 2 THEN ' مرحبا بالعالم'
        |      ELSE ' αβγ δέλτα' END AS aug
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(aug, '[A-Za-z\x{00C0}-\x{024F}]')) AS c_latin,
        |    len(regexp_extract_all(aug, '[\x{0400}-\x{04FF}]')) AS c_cyrillic,
        |    len(regexp_extract_all(aug, '[\x{0370}-\x{03FF}]')) AS c_greek,
        |    len(regexp_extract_all(aug, '[\x{0600}-\x{06FF}]')) AS c_arabic,
        |    len(regexp_extract_all(aug, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]')) AS c_cjk,
        |    len(regexp_extract_all(aug, '[0-9]')) AS c_digit,
        |    CAST(GREATEST(length(aug), 1) AS DOUBLE) AS total
        |  FROM a),
        |g AS (
        |  SELECT doc_id, total, c_latin, c_cyrillic, c_greek, c_arabic,
        |    c_cjk, c_digit,
        |    GREATEST(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_digit)
        |      AS m
        |  FROM c)
        |SELECT doc_id,
        |  CASE WHEN m = 0 THEN 'other'
        |       WHEN c_latin = m THEN 'latin'
        |       WHEN c_cyrillic = m THEN 'cyrillic'
        |       WHEN c_greek = m THEN 'greek'
        |       WHEN c_arabic = m THEN 'arabic'
        |       WHEN c_cjk = m THEN 'cjk'
        |       ELSE 'digit' END AS script,
        |  CAST(c_latin AS DOUBLE) / total AS frac_latin,
        |  CAST(c_cyrillic AS DOUBLE) / total AS frac_cyrillic,
        |  CAST(c_greek AS DOUBLE) / total AS frac_greek,
        |  CAST(c_arabic AS DOUBLE) / total AS frac_arabic,
        |  CAST(c_cjk AS DOUBLE) / total AS frac_cjk,
        |  CAST(c_digit AS DOUBLE) / total AS frac_digit
        |FROM g ORDER BY doc_id""".stripMargin,
    "q_vocab_coverage" ->
      """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT unnest(w) AS token FROM w),
        |tc AS (SELECT token, count(*) AS cnt FROM tok
        |       WHERE length(token) > 0 GROUP BY 1),
        |c AS (SELECT token, cnt,
        |        sum(cnt) OVER (ORDER BY cnt DESC, token) AS cum,
        |        (SELECT sum(cnt) FROM tc) AS total
        |      FROM tc)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(cum AS BIGINT) AS cum
        |FROM c
        |WHERE CAST(cum - cnt AS DOUBLE) < 0.95 * CAST(total AS DOUBLE)
        |ORDER BY cnt DESC, token""".stripMargin,
    "q_heavy_hitters" ->
      """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT unnest(w) AS token FROM w),
        |tc AS (SELECT token, count(*) AS cnt FROM tok
        |       WHERE length(token) > 0 GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM tc)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt
        |FROM tc, t
        |WHERE CAST(cnt AS DOUBLE) >= 0.001 * CAST(total AS DOUBLE)
        |ORDER BY cnt DESC, token""".stripMargin,
    "q_heavy_hitters_twopass" ->
      """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT unnest(w) AS token FROM w),
        |tc AS (SELECT token, count(*) AS cnt FROM tok
        |       WHERE length(token) > 0 GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM tc)
        |SELECT token, CAST(cnt AS BIGINT) AS cnt
        |FROM tc, t
        |WHERE CAST(cnt AS DOUBLE) >= 0.001 * CAST(total AS DOUBLE)
        |ORDER BY cnt DESC, token""".stripMargin,
    "q_token_kl" ->
      """WITH wa AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |            FROM documents WHERE lang = 'en'),
        |wb AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |       FROM documents WHERE lang <> 'en'),
        |ca AS (SELECT token, count(*) AS ca FROM (SELECT unnest(w) AS token FROM wa)
        |       WHERE length(token) > 0 GROUP BY 1),
        |cb AS (SELECT token, count(*) AS cb FROM (SELECT unnest(w) AS token FROM wb)
        |       WHERE length(token) > 0 GROUP BY 1),
        |j AS (SELECT coalesce(ca.token, cb.token) AS token,
        |        coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |      FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        |v AS (SELECT * FROM j ORDER BY (ca + cb) DESC, token ASC LIMIT 500),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb
        |      FROM j),
        |vt AS (SELECT CAST(sum(ca) AS BIGINT) AS va, CAST(sum(cb) AS BIGINT) AS vb,
        |         count(*) AS nv FROM v),
        |cats AS (SELECT false AS other, token, ca, cb FROM v
        |         UNION ALL
        |         SELECT true, '', ta - va, tb - vb FROM t, vt),
        |terms AS (SELECT other, token,
        |    CAST(ca + 1 AS DOUBLE) / CAST(ta + nv + 1 AS DOUBLE) AS pa,
        |    CAST(cb + 1 AS DOUBLE) / CAST(tb + nv + 1 AS DOUBLE) AS pb
        |  FROM cats, t, vt),
        |tt AS (SELECT other, token,
        |         pa * ln(pa / pb) AS tab, pb * ln(pb / pa) AS tba
        |       FROM terms)
        |SELECT
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_sort(list({'o': other, 't': token, 'x': tab})),
        |      s -> s.x)), (x, y) -> x + y) AS kl_ab,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_sort(list({'o': other, 't': token, 'x': tba})),
        |      s -> s.x)), (x, y) -> x + y) AS kl_ba,
        |  CAST((SELECT nv + 1 FROM vt) AS INTEGER) AS n_categories,
        |  (SELECT ta FROM t) AS tokens_a,
        |  (SELECT tb FROM t) AS tokens_b
        |FROM tt""".stripMargin,
    "q_vocab_zipf" ->
      // identical arithmetic to Vocab.zipfFit: top-20 (cnt desc, token)
      // ranks, x = ln(rank), y = ln(cnt), rank-ordered sequential folds,
      // slope = (n·sxy − sx·sy)/(n·sxx − sx²), alpha = −slope
      """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT unnest(w) AS token FROM w),
        |tc AS (SELECT token, count(*) AS cnt FROM tok
        |       WHERE length(token) > 0 GROUP BY 1),
        |top AS (SELECT token, cnt FROM tc ORDER BY cnt DESC, token LIMIT 20),
        |r AS (SELECT row_number() OVER (ORDER BY cnt DESC, token) AS r,
        |        ln(CAST(row_number() OVER (ORDER BY cnt DESC, token) AS DOUBLE)) AS x,
        |        ln(CAST(cnt AS DOUBLE)) AS y
        |      FROM top),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(x ORDER BY r)), (a, b) -> a + b) AS sx,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(y ORDER BY r)), (a, b) -> a + b) AS sy,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(x * y ORDER BY r)), (a, b) -> a + b) AS sxy,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(x * x ORDER BY r)), (a, b) -> a + b) AS sxx
        |      FROM r),
        |f AS (SELECT n, sx, sy,
        |        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |      FROM s)
        |SELECT -slope AS alpha, (sy - slope * sx) / n AS intercept,
        |  CAST(n AS INTEGER) AS n_terms
        |FROM f""".stripMargin)
}
