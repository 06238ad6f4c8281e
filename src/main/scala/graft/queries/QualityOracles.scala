package graft.queries

/** DuckDB oracles for [[QualityQueries]]. RE2 notes: no lookarounds used;
  * regexp_replace needs the explicit 'g' flag to match Spark's
  * replace-all; counts come from len(regexp_extract_all(...)). */
object QualityOracles {
  val oracleSql: Map[String, String] = Map(
    "q_quality_gopher" ->
      """WITH s AS (
        |  SELECT doc_id, text,
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
        |  FROM documents)
        |SELECT doc_id, word_count, mean_word_len, symbol_ratio,
        |  alpha_word_frac, stopword_hits,
        |  (word_count BETWEEN 10 AND 100000 AND mean_word_len BETWEEN 2.0 AND 12.0
        |   AND symbol_ratio < 0.1 AND alpha_word_frac > 0.8
        |   AND stopword_hits >= 2) AS passes_gopher
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      // Same signal CTE as q_quality_gopher; the score arithmetic uses
      // e-notation literals (256e0 …) so DuckDB computes in DOUBLE (its
      // plain decimal literals are DECIMAL-typed, which would diverge from
      // Spark's double arithmetic). Term order mirrors the Scala
      // expression tree exactly — bit-equal doubles, no rounding needed.
      """WITH s AS (
        |  SELECT doc_id,
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
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    CASE WHEN word_count > 0 THEN
        |      0.15e0 * (least(word_count, 256) / 256e0)
        |      + 0.15e0 * (1e0 - least(abs(mean_word_len - 5e0), 5e0) / 5e0)
        |      + 0.2e0 * (1e0 - least(symbol_ratio * 10e0, 1e0))
        |      + 0.3e0 * least(alpha_word_frac, 1e0)
        |      + 0.2e0 * (least(stopword_hits, 4) / 4e0)
        |    END AS quality_score
        |  FROM s)
        |SELECT doc_id, quality_score,
        |  quality_score >= 0.6e0 AS passes_quality
        |FROM q ORDER BY doc_id""".stripMargin,
    "q_quality_unigram_lm" ->
      // Same smoothing arithmetic as the Scala op; the per-document sum
      // folds a sorted list left-to-right on both sides (list_prepend 0 +
      // list_reduce ≡ Spark aggregate(seed 0.0)), so the doubles are
      // bit-equal without rounding. That also leans on JVM log and DuckDB
      // libm ln agreeing bitwise (both 1-ulp-bounded, not guaranteed
      // identical) — verified empirically over every smoothed probability
      // this corpus produces at the gate's SF; if a future SF ever
      // hash-mismatches here, round(x, 6) on BOTH sides is the fallback.
      """WITH toks AS (
        |  SELECT doc_id, t AS tok
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |        FROM documents)
        |  WHERE t <> ''),
        |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_total FROM cnt),
        |vocab AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 2000),
        |vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |nl AS (SELECT t.doc_id,
        |         -ln(CAST(coalesce(vb.c, 0) + 1 AS DOUBLE)
        |             / CAST(t_total + v + 1 AS DOUBLE)) AS nll
        |       FROM toks t LEFT JOIN vocab vb USING (tok), tot, vsz),
        |ag AS (SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(nll))),
        |                     (x, y) -> x + y) / count(*) AS avg_nll
        |       FROM nl GROUP BY doc_id)
        |SELECT d.doc_id, ag.avg_nll
        |FROM documents d LEFT JOIN ag USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_quality_bigram_lm" ->
      // Jelinek-Mercer bigram mixture, same parity discipline as the
      // unigram gate: exact-count divisions, exactly-representable
      // lambda (0.75/0.25), sorted-fold means, libm ln on both sides.
      """WITH w0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(w) - 1),
        |           i -> {'w1': w[i], 'w2': w[i+1]})) AS p
        |       FROM w0 WHERE len(w) >= 2),
        |b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |toks AS (SELECT unnest(w) AS tok FROM w0),
        |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS t_total FROM cnt),
        |vocab AS (SELECT tok, cu FROM cnt ORDER BY cu DESC, tok ASC LIMIT 2000),
        |vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |nl AS (SELECT b.doc_id,
        |         -ln((0.75e0 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))) +
        |             (0.25e0 * (CAST(coalesce(vb.cu, 0) + 1 AS DOUBLE)
        |                        / CAST(t_total + v + 1 AS DOUBLE)))) AS nll
        |       FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |       LEFT JOIN vocab vb ON vb.tok = b.w2, tot, vsz),
        |ag AS (SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(nll))),
        |                     (x, y) -> x + y) / count(*) AS avg_nll2
        |       FROM nl GROUP BY doc_id)
        |SELECT d.doc_id, ag.avg_nll2
        |FROM documents d LEFT JOIN ag USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_quality_kn_lm" ->
      // interpolated Kneser-Ney with D=0.75: discounted ML term plus the
      // type-count continuation distribution, every division and fold
      // parenthesized exactly as the Spark side computes it
      """WITH w0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS w
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(w) - 1),
        |           i -> {'w1': w[i], 'w2': w[i+1]})) AS p
        |       FROM w0 WHERE len(w) >= 2),
        |b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM c12 GROUP BY 1),
        |n1b AS (SELECT w2, count(*) AS n1b FROM c12 GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM c12),
        |nl AS (SELECT b.doc_id,
        |         -ln((greatest(CAST(c12.c12 AS DOUBLE) - 0.75e0, 0.0e0)
        |              / CAST(ctx.c1 AS DOUBLE)) +
        |             (((0.75e0 / CAST(ctx.c1 AS DOUBLE)) * CAST(ctx.n1f AS DOUBLE))
        |              * (CAST(n1b.n1b AS DOUBLE) / CAST(nt.nt AS DOUBLE)))) AS nll
        |       FROM b JOIN c12 USING (w1, w2) JOIN ctx USING (w1)
        |       JOIN n1b USING (w2), nt),
        |ag AS (SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(nll))),
        |                     (x, y) -> x + y) / count(*) AS avg_nll_kn
        |       FROM nl GROUP BY doc_id)
        |SELECT d.doc_id, ag.avg_nll_kn
        |FROM documents d LEFT JOIN ag USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_repetition_topgram" ->
      """WITH toks AS (
        |  SELECT doc_id, length(text) AS n_chars_total,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 2),
        |grams AS (
        |  SELECT doc_id, n_chars_total,
        |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
        |  FROM toks),
        |counts AS (
        |  SELECT doc_id, n_chars_total, gram, COUNT(*) AS c
        |  FROM grams GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY c DESC, gram ASC) AS rn
        |  FROM counts)
        |SELECT doc_id, gram AS top_gram, c AS top_gram_count,
        |  CAST(length(gram) * c AS DOUBLE) / n_chars_total AS top_gram_char_frac
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
        |  CAST(len(regexp_extract_all(aug,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips
        |FROM a ORDER BY doc_id LIMIT 2000""".stripMargin,
    "q_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://WWW.Example.com/Path/' || CAST(doc_id AS VARCHAR)
        |      || '/?utm_source=x&ref=' || lang || '#frag' AS url
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
        |      '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '[?#].*$', ''),
        |      '/$', '') AS url_norm
        |  FROM u)
        |SELECT doc_id, url, url_norm,
        |  regexp_extract(url_norm, '^([^/]+)', 1) AS domain
        |FROM n ORDER BY doc_id LIMIT 2000""".stripMargin,
    "q_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><p class="intro">' || substr(text, 1, 80)
        |      || ' &amp; tail &lt;x&gt;</p><br/></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(html, '<[^>]*>', ' ', 'g'),
        |      '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        |      '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
        |    '\s+', ' ', 'g')) AS clean,
        |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INTEGER) AS n_tags
        |FROM h ORDER BY doc_id LIMIT 2000""".stripMargin,
    "q_c4_lines" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' (table|value) ', '.' || chr(10), 'g') AS multi
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, string_split(multi, chr(10)) AS lines FROM m),
        |k AS (
        |  SELECT doc_id, lines,
        |    list_filter(lines, x ->
        |      len(regexp_extract_all(x, '\S+')) >= 5
        |      AND regexp_matches(x, '[.!?]\s*$')) AS kept
        |  FROM l)
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
        |  CAST(len(lines) AS INTEGER) AS n_lines_total,
        |  CAST(len(kept) AS INTEGER) AS n_lines_kept
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_dup_lines" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' (table|value) ', '.' || chr(10), 'g') AS multi
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    unnest(list_transform(string_split(multi, chr(10)),
        |      (x, i) -> {'line': x, 'pos': i - 1})) AS ent
        |  FROM m),
        |lf AS (
        |  SELECT doc_id, ent.line AS line, CAST(ent.pos AS INTEGER) AS pos
        |  FROM e WHERE length(trim(ent.line)) >= 1)
        |SELECT line, COUNT(*) AS n_occurrences,
        |  (min({'d': doc_id, 'p': pos})).d AS first_doc,
        |  (min({'d': doc_id, 'p': pos})).p AS first_pos
        |FROM lf GROUP BY line HAVING COUNT(*) > 1
        |ORDER BY n_occurrences DESC, line LIMIT 5000""".stripMargin,
    "q_dedup_paragraph" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' (table|value) ', '.' || chr(10), 'g') AS multi
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    unnest(list_transform(string_split(multi, chr(10)),
        |      (x, i) -> {'line': x, 'pos': i - 1})) AS ent
        |  FROM m),
        |l AS (
        |  SELECT doc_id, ent.line AS line, CAST(ent.pos AS INTEGER) AS pos,
        |    length(trim(ent.line)) < 1 AS short
        |  FROM e),
        |c AS (
        |  SELECT md5(line) AS h FROM l WHERE NOT short
        |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
        |f AS (
        |  SELECT l.doc_id, l.line, l.pos,
        |    CASE WHEN l.short THEN TRUE ELSE c.h IS NULL END AS keep
        |  FROM l LEFT JOIN c ON md5(l.line) = c.h)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
        |    ORDER BY pos), '') AS kept_text,
        |  count(*) AS n_lines_total,
        |  count(CASE WHEN keep THEN 1 END) AS n_lines_kept
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
