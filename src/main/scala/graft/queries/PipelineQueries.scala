package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Large-scale training-data pipeline operators as gate queries: dedup
  * (exact / n-gram Jaccard / MinHash+LSH / SimHash / embedding), similarity
  * search (brute-force + LSH ANN), text analysis (tokens, language-ID,
  * quality, fingerprints), multimodal metadata plumbing, JSON/event
  * processing. Probabilistic/hash-specific ops (minhash, simhash, LSH) have
  * no DuckDB-expressible oracle → rows-only checks. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // --- dedup ---
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("keep_id")
    }),
    "q_dedup_incremental" -> ((s, dir) => {
      // The driver's documents have no natural exact dups, so the gate
      // constructs the three paths it must prove: ids 200-299 overlap the
      // history (a re-delivered partition → anti-join rejects), ids
      // 400-449 re-enter the batch under shifted ids (in-batch copies →
      // min-id wins), ids 300-499 are novel (pass). Expected: exactly the
      // 200 novel ids survive. The oracle runs the identical construction.
      val docs = t(s, dir, "documents")
      val history = docs.where(F.col("doc_id") < 300)
      val batch = docs.where(F.col("doc_id") >= 200)
        .select(F.col("doc_id"), F.col("text"))
        .unionAll(docs.where(F.col("doc_id").between(400, 449))
          .select((F.col("doc_id") + 10000).as("doc_id"), F.col("text")))
      Dedup.incrementalNew(history, batch, "text", "doc_id").orderBy("id")
    }),
    "q_dedup_incremental_bloom" -> ((s, dir) => {
      // Same construction as q_dedup_incremental, probed through the
      // build-once Bloom index. The filter can only prune definite
      // non-members, so the result is bit-identical to the exact path —
      // one shared oracle proves both.
      val docs = t(s, dir, "documents")
      val history = docs.where(F.col("doc_id") < 300)
      val batch = docs.where(F.col("doc_id") >= 200)
        .select(F.col("doc_id"), F.col("text"))
        .unionAll(docs.where(F.col("doc_id").between(400, 449))
          .select((F.col("doc_id") + 10000).as("doc_id"), F.col("text")))
      val bf = Dedup.buildBloomIndex(history, "text")
      Dedup.incrementalNewBloom(bf, history, batch, "text", "doc_id").orderBy("id")
    }),
    "q_dedup_incremental_near" -> ((s, dir) => {
      // batch = appended-suffix rewrites of history docs (guaranteed
      // near-dups of their sources) + untouched novel docs; candidates via
      // the persisted-index path. Hash-routed recall → rows-only check;
      // PipelineSpec holds the brute-force differential.
      val docs = t(s, dir, "documents")
      val history = docs.where(F.col("doc_id") < 250)
      val batch = docs.where(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 10000).as("doc_id"),
          F.concat(F.col("text"), F.lit(" trailing audit note")).as("text"))
        .unionAll(docs.where(F.col("doc_id") >= 400).select("doc_id", "text"))
      val index = Dedup.minhashBandIndex(history, "text", "doc_id")
      Dedup.incrementalNearDupPairs(index, history, batch, "text", "doc_id",
          threshold = 0.5)
        .orderBy("batch_id", "hist_id")
    }),
    "q_dedup_substring" -> ((s, dir) => {
      // construct guaranteed repeated spans: ids < 30 re-enter under
      // shifted ids with a prefix, so every window of the original text
      // occurs in (at least) two documents; novel docs flag only where
      // the corpus naturally repeats a 10-token window. Exact counting →
      // full SQL oracle.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.unionAll(
        docs.where(F.col("doc_id") < 30)
          .select((F.col("doc_id") + 10000).as("doc_id"),
            F.concat(F.lit("syndicated copy follows "), F.col("text")).as("text")))
      Dedup.duplicateSpanSummary(corpus, "text", "doc_id", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_dedup_substring_remove" -> ((s, dir) => {
      // the EXCISION step over the q_dedup_substring corpus: prefixed
      // copies of ids < 30 re-enter, so every window of those originals
      // is duplicated; the copy (higher id) loses the covered tokens,
      // the canonical original keeps them. Exact span arithmetic → full
      // SQL oracle (the oracle groups windows by text where the operator
      // uses xxhash64 — identical absent a 64-bit collision).
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.unionAll(
        docs.where(F.col("doc_id") < 30)
          .select((F.col("doc_id") + 10000).as("doc_id"),
            F.concat(F.lit("syndicated copy follows "), F.col("text")).as("text")))
      Dedup.removeDuplicateSpans(corpus, "text", "doc_id", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_dedup_semantic" -> ((s, dir) => {
      // k-means cluster routing is data/init-dependent → rows-only check;
      // PipelineSpec holds the differential against brute-force pairs
      graft.pipeline.SemDedup.dedup(t(s, dir, "embeddings"), "vec_id",
          "embedding", k = 8, iters = 2, threshold = 0.35)
        .orderBy("node")
    }),
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.5)
        .orderBy("a", "b")
    }),
    "q_dedup_minhash" -> ((s, dir) => {
      // LSH recall is hash-dependent → no SQL oracle; rows-only check
      Dedup.minhashLshPairs(t(s, dir, "documents"), "text", "doc_id",
          k = 32, bands = 8, n = 3, threshold = 0.5)
        .orderBy("a", "b")
    }),
    "q_dedup_minhash_grouped" -> ((s, dir) => {
      // near-dups WITHIN each language: the group key joins the
      // band-bucket key, so cross-language candidates never exist.
      // bands = k makes every signature slot its own band — a
      // qualifying pair (j ≥ 0.5) is missed only if all 32 independent
      // slots differ (≤ 2e-10), so the output equals the per-language
      // exact Jaccard join the oracle states (the incremental_near_exact
      // convention); q_dedup_minhash keeps the banded approximate config
      Dedup.minhashLshPairsGrouped(t(s, dir, "documents"),
          "text", "doc_id", "lang", k = 32, bands = 32, n = 3,
          threshold = 0.5)
        .orderBy("group", "a", "b")
    }),
    "q_dedup_simhash" -> ((s, dir) => {
      // md5-prefix-seeded signature (Dedup.simhash60Md5): same ±1-vote
      // algorithm as the xxhash64 kernel, but the portable hash makes the
      // signature itself hash-oracle-checkable; the codegen'd kernel keeps
      // its KernelParitySpec coverage
      val docs = t(s, dir, "documents")
      docs.select(F.col("doc_id"),
          Dedup.simhash60Md5(F.col("text")).as("simhash"))
        .orderBy("doc_id")
    }),
    "q_dedup_simhash_groups" -> ((s, dir) => {
      // the clustering face of the portable signature: equal-signature
      // buckets (hamming 0) with the survivor and the bucket size —
      // fully oracle-checkable because the md5-seeded signature itself is
      val docs = t(s, dir, "documents")
      docs.select(F.col("doc_id"),
          Dedup.simhash60Md5(F.col("text")).as("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").as("keep_id"), F.count(F.lit(1)).as("n"))
        .filter(F.col("n") > 1)
        .orderBy("sig")
    }),
    "q_dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          "label", threshold = 0.35)
        .orderBy("a", "b")
    }),

    // --- similarity search ---
    "q_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10)
        .orderBy("query_id", "rank")
    }),
    "q_embed_project" -> ((s, dir) => {
      // JL sign-matrix projection 64 -> 16, flattened to (vec_id, j, y)
      // rows; the md5-seeded matrix and ascending folds make the oracle
      // state the identical arithmetic (scale 1/sqrt(16) = 0.25, exact)
      Similarity.randomProjection(t(s, dir, "embeddings"), "embedding",
          "proj", inDim = 64, outDim = 16)
        .select(F.col("vec_id"), F.posexplode(F.col("proj")))
        .select(F.col("vec_id"), F.col("pos").cast("int").as("j"),
          F.col("col").as("y"))
        .orderBy("vec_id", "j")
    }),
    "q_embed_meanpool" -> ((s, dir) => {
      // chunk-to-document pooling: element-wise mean per label, flattened
      // to (label, j, v); per-cell sorted folds keep doubles exact
      Similarity.meanPool(t(s, dir, "embeddings"), "label", "embedding")
        .select(F.col("label"), F.posexplode(F.col("vec")))
        .select(F.col("label"), F.col("pos").cast("int").as("j"),
          F.col("col").as("v"))
        .orderBy("label", "j")
    }),
    "q_ann_lsh_filtered" -> ((s, dir) => {
      // metadata-filtered LSH ANN: the predicate semi-joins the
      // bucketed corpus BEFORE ranking; nbits = 0 is the one-bucket
      // degenerate → exact filtered brute force (the oracle twin of
      // the q_ann_ivf_filtered convention)
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKFiltered(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10,
          allowed = emb.filter(F.col("label") % 3 === 0),
          allowedIdCol = "vec_id", nbits = 0)
        .orderBy("query_id", "rank")
    }),
    "q_ann_sq8" -> ((s, dir) => {
      // asymmetric scalar quantization: corpus side 8-bit codes, query
      // full precision — closed-form, so the gate is a FULL value oracle
      val emb = t(s, dir, "embeddings")
      val p = graft.pipeline.Quantize.trainSq8(emb, "embedding")
      graft.pipeline.Quantize.sq8TopK(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10, p)
        .orderBy("query_id", "rank")
    }),
    "q_ann_sq8_persisted" -> ((s, dir) => {
      // ranges saved and loaded back must score bit-identically — the
      // gate shares q_ann_sq8's oracle text (same contract as
      // q_bm25_persisted)
      val emb = t(s, dir, "embeddings")
      val dir0 = graft.streaming.StreamStage.stage(s, s"$dir/sq8_idx_seed",
        emb.limit(0))._1 // stable per-JVM temp root
      val path = dir0 + "/sq8"
      graft.pipeline.Quantize.saveSq8(
        graft.pipeline.Quantize.trainSq8(emb, "embedding"), s, path)
      val p = graft.pipeline.Quantize.loadSq8(s, path)
      graft.pipeline.Quantize.sq8TopK(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10, p)
        .orderBy("query_id", "rank")
    }),
    "q_ann_pq" -> ((s, dir) => {
      // product quantization: Lloyd-trained per-subspace codebooks → codes
      // are init/data-dependent → rows-only check; RecallSpec pins measured
      // recall vs brute force and the ks=N exact degeneracy
      val emb = t(s, dir, "embeddings")
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 16, ks = 128, iters = 2)
      val enc = graft.pipeline.Quantize.encodePq(emb, "vec_id", "embedding", cb)
      graft.pipeline.Quantize.pqTopK(enc, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", k = 10, cb)
        .orderBy("query_id", "rank")
    }),
    "q_ann_pq_exact" -> ((s, dir) => {
      // m = 1 with ks = N (iters = 0: the seed centroids ARE the corpus
      // vectors) makes every vector its own single-subspace centroid —
      // zero quantization error, and the ADC table-lookup machinery
      // reproduces the flat seed-0 left-fold dot product — so pure-PQ
      // search hash-matches the brute-force oracle verbatim; q_ann_pq
      // keeps the approximate m=16/ks=128 configuration under its
      // measured-recall spec
      val emb = t(s, dir, "embeddings")
      val n = emb.count().toInt
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 1, ks = n, iters = 0)
      val enc = graft.pipeline.Quantize.encodePq(emb, "vec_id", "embedding", cb)
      graft.pipeline.Quantize.pqTopK(enc, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", k = 10, cb)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivfpq" -> ((s, dir) => {
      // FAISS-style IVF-PQ composition: centroid routing cuts candidates
      // to nprobe cells, PQ codes cut per-candidate memory — codes are
      // init/data-dependent → rows-only; QuantizeSpec pins recall and the
      // exact twin below pins the machinery
      val emb = t(s, dir, "embeddings")
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 16, ks = 128, iters = 2)
      val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
      graft.pipeline.Quantize.ivfPqTopK(idx, enc,
          emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nprobe = 3, cb)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivfpq_exact" -> ((s, dir) => {
      // BOTH approximations degenerate: nprobe = k probes every cell, and
      // m = 1 with ks = N makes every vector its own (1-subspace) centroid
      // — zero quantization error AND the same flat seed-0 left-fold
      // association as the exact cosine oracle, so the composed ADC +
      // routing machinery hash-matches the brute-force oracle verbatim
      val emb = t(s, dir, "embeddings")
      val n = emb.count().toInt
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      // iters = 0: the seed centroids ARE the corpus vectors (ks = N), so
      // the Lloyd pass would only reproduce them — skip it
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 1, ks = n, iters = 0)
      val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
      graft.pipeline.Quantize.ivfPqTopK(idx, enc,
          emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nprobe = 8, cb)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivfpq_filtered" -> ((s, dir) => {
      // metadata-filtered IVF-PQ: the allowed-id semi-join lands on the
      // probed code lists BEFORE ADC eval, so every k slot matches the
      // predicate. nprobe = k AND m = 1, ks = N degenerate both
      // approximations → the exact filtered brute-force scan the oracle
      // states (the q_ann_ivf_filtered convention); the approximate
      // config's pre-vs-post divergence is pinned by RecallSpec
      val emb = t(s, dir, "embeddings")
      val n = emb.count().toInt
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 1, ks = n, iters = 0)
      val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
      graft.pipeline.Quantize.ivfPqTopKFiltered(idx, enc,
          emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nprobe = 8, cb,
          allowed = emb.filter(F.col("label") % 3 === 0),
          allowedIdCol = "vec_id")
        .orderBy("query_id", "rank")
    }),
    "q_ann_pq_filtered" -> ((s, dir) => {
      // metadata-filtered pure PQ: the semi-join hits the code relation
      // before any ADC table lookup; m = 1, ks = N (iters = 0) is the
      // zero-quantization-error degenerate → filtered brute force
      val emb = t(s, dir, "embeddings")
      val n = emb.count().toInt
      val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
        m = 1, ks = n, iters = 0)
      val enc = graft.pipeline.Quantize.encodePq(emb, "vec_id", "embedding", cb)
      graft.pipeline.Quantize.pqTopKFiltered(enc,
          emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
          k = 10, cb, allowed = emb.filter(F.col("label") % 3 === 0),
          allowedIdCol = "vec_id")
        .orderBy("query_id", "rank")
    }),
    "q_ann_sq8_filtered" -> ((s, dir) => {
      // metadata-filtered SQ8: corpus-trained ranges (the filter is a
      // query-time predicate, not a rebuild), allowed ids semi-joined
      // before dequantization — closed-form, so a FULL value oracle
      val emb = t(s, dir, "embeddings")
      val p = graft.pipeline.Quantize.trainSq8(emb, "embedding")
      graft.pipeline.Quantize.sq8TopKFiltered(emb,
          emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", k = 10, p,
          allowed = emb.filter(F.col("label") % 3 === 0),
          allowedIdCol = "vec_id")
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf" -> ((s, dir) => {
      // centroid routing is data/init-dependent → rows-only check
      val emb = t(s, dir, "embeddings")
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      graft.pipeline.Ivf.topK(idx, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nprobe = 3)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf_exact" -> ((s, dir) => {
      // nprobe = k probes every centroid's inverted list, so IVF degenerates
      // to exact brute force REGARDLESS of how the k-means routing split the
      // corpus — which turns the approximate operator's machinery (probe →
      // broadcast → per-cluster rerank) into a hash-matchable oracle gate;
      // q_ann_ivf keeps the approximate configuration under its recall spec
      val emb = t(s, dir, "embeddings")
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      graft.pipeline.Ivf.topK(idx, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nprobe = 8)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf_filtered" -> ((s, dir) => {
      // metadata-filtered ANN ("neighbors within label % 3 = 0"): the
      // predicate pre-filters the probed inverted lists BEFORE distance
      // ranking, so every result slot holds a matching neighbor; nprobe
      // = k probes every list, so the gate degenerates to the exact
      // filtered brute-force scan the oracle states (the
      // q_ann_ivf_exact convention) — the approximate configuration's
      // recall is pinned by RecallSpec
      val emb = t(s, dir, "embeddings")
      val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
      graft.pipeline.Ivf.topKFiltered(idx, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", k = 10,
          allowed = emb.filter(F.col("label") % 3 === 0), allowedIdCol = "vec_id",
          nprobe = 8)
        .orderBy("query_id", "rank")
    }),
    "q_dedup_semantic_exact" -> ((s, dir) => {
      // k = 1 puts the whole corpus in one cluster: the pair search is exact
      // all-pairs cosine, oracle-checkable as a cross join — the demo-scale
      // escape hatch of the clustered operator (sound only at gate scale;
      // q_dedup_semantic keeps the clustered configuration)
      graft.pipeline.SemDedup.pairs(t(s, dir, "embeddings"), "vec_id",
          "embedding", k = 1, iters = 1, threshold = 0.35)
        .orderBy("a", "b")
    }),
    "q_dedup_semantic_grouped" -> ((s, dir) => {
      // WITHIN-GROUP semantic near-dups ("embedding dups within this
      // label"): the group key joins the cluster key, so cross-group
      // pairs never form. k = 1 puts the whole corpus in one cluster,
      // degenerating the machinery to the exact per-label all-pairs
      // cosine the oracle states (the semantic_exact convention);
      // q_dedup_semantic keeps the clustered config, and PipelineSpec
      // proves the clustered grouped face equals the global face
      // post-filtered to same-group pairs
      graft.pipeline.SemDedup.pairsGrouped(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", k = 1, iters = 1,
          threshold = 0.35)
        .orderBy("group", "a", "b")
    }),
    "q_dedup_incremental_near_exact" -> ((s, dir) => {
      // bands = k makes every signature slot its own band: a qualifying pair
      // (jaccard ≥ 0.5) is missed only if all 32 independent minhash slots
      // differ — probability ≤ (1-0.5)^32 ≈ 2e-10 — so the output equals the
      // exact Jaccard join the SQL oracle computes; precision is exact by
      // construction (candidates are re-verified with true Jaccard)
      val docs = t(s, dir, "documents")
      val history = docs.where(F.col("doc_id") < 250)
      val batch = docs.where(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 10000).as("doc_id"),
          F.concat(F.col("text"), F.lit(" trailing audit note")).as("text"))
        .unionAll(docs.where(F.col("doc_id") >= 400).select("doc_id", "text"))
      val index = Dedup.minhashBandIndex(history, "text", "doc_id",
        k = 32, bands = 32)
      Dedup.incrementalNearDupPairs(index, history, batch, "text", "doc_id",
          k = 32, bands = 32, threshold = 0.5)
        .orderBy("batch_id", "hist_id")
    }),
    "q_ann_lsh" -> ((s, dir) => {
      // bucket membership is hash-dependent → rows-only check
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10, nbits = 4)
        .orderBy("query_id", "rank")
    }),

    "q_ann_lsh_exact" -> ((s, dir) => {
      // nbits = 0 is the documented degenerate mode: one bucket, so the
      // LSH plumbing (bucket join, broadcast queries, per-bucket rerank)
      // runs brute-force-equal and hash-matches the exact oracle;
      // q_ann_lsh keeps the bucketed configuration under its recall spec
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(F.col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", k = 10, nbits = 0)
        .orderBy("query_id", "rank")
    }),
    "q_dedup_minhash_exact" -> ((s, dir) => {
      // bands = k: a pair with jaccard >= 0.5 is missed only if all 32
      // independent minhash slots differ (p <= 2^-32); verification is
      // exact Jaccard, so the output equals the all-pairs shingle join
      // the SQL oracle computes — q_dedup_minhash keeps the banded
      // configuration under its KernelParitySpec/recall bounds
      Dedup.minhashLshPairs(t(s, dir, "documents"), "text", "doc_id",
          k = 32, bands = 32, n = 3, threshold = 0.5)
        .orderBy("a", "b")
    }),

    // --- text analysis ---
    "q_text_stats" -> ((s, dir) => {
      // tokens materialized once — inline split would re-run inside the
      // interpreted aggregate lambda (same trap as shingling)
      val d = t(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"),
          TextAnalysis.tokens(F.col("text")).as("toks"))
      d.select(
        F.col("doc_id"),
        TextAnalysis.tokenCount(F.col("text")).as("n_tokens"),
        F.char_length(F.col("text")).as("n_chars_m"),
        TextAnalysis.distinctTokenCountFromTokens(F.col("toks")).as("n_distinct"),
        TextAnalysis.meanTokenLengthFromTokens(F.col("toks")).as("mean_tok_len"))
        .orderBy("doc_id")
    }),
    "q_interleave" -> ((s, dir) => {
      // deterministic stride schedule across language sources: en appears
      // 3x as often as fr from the very start
      graft.pipeline.DataMix.interleave(
          t(s, dir, "documents").select("doc_id", "lang"), "lang",
          Map("en" -> 3.0, "de" -> 2.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0),
          tiebreakers = Seq("doc_id"))
        .orderBy("order_key", "doc_id")
    }),
    "q_pct_rank" -> ((s, dir) => {
      // percentile-rank score calibration: min-ranks onto [0,1]
      graft.operators.ScalableRank.percentileRank(
          t(s, dir, "documents").select("doc_id", "n_chars"), "n_chars")
        .orderBy("doc_id")
    }),
    "q_corpus_overlap" -> ((s, dir) => {
      // dataset-to-dataset contamination card: EXACT doc-key and shingle
      // containment between the English and non-English slices
      val d = t(s, dir, "documents")
      graft.pipeline.Report.corpusOverlap(
        d.where(F.col("lang") === "en"), d.where(F.col("lang") =!= "en"),
        "text", n = 3)
    }),
    "q_ngram_novelty" -> ((s, dir) => {
      // cross-doc memorization exposure: distinct 3-grams per doc vs the
      // corpus-wide shingle frequency — full oracle states the identical
      // inverted-index join
      TextAnalysis.ngramNovelty(t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),
    "q_text_langid" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(F.col("doc_id"), F.col("lang"),
          TextAnalysis.tokens(F.col("text")).as("toks"))
      d.select(
        F.col("doc_id"), F.col("lang"),
        TextAnalysis.langIdFromTokens(F.col("toks")).as("lang_pred"),
        TextAnalysis.langScoreFromTokens(F.col("toks"), "en").as("score_en"))
        .orderBy("doc_id")
    }),
    "q_text_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"),
          TextAnalysis.tokens(F.col("text")).as("toks"))
        .withColumn("quality",
          TextAnalysis.qualityScoreFromTokens(F.col("text"), F.col("toks")))
      d.select(
        F.col("doc_id"), F.col("quality"),
        (F.col("quality") >= 0.5).as("keep"))
        .orderBy("doc_id")
    }),
    "q_text_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(
        F.col("doc_id"),
        TextAnalysis.prefixFingerprint(F.col("text"), 8).as("prefix_fp"))
        .orderBy("doc_id")
    }),
    "q_text_winnow" -> ((s, dir) => {
      // md5-prefix-seeded winnowing sketch (portable hash → full value
      // oracle); tokens staged as a bound column first — the per-window
      // slice would otherwise re-tokenize per position (HOF-CSE trap).
      // The xxhash64 kernel keeps its KernelParitySpec coverage.
      val d = t(s, dir, "documents")
      d.select(F.col("doc_id"),
          TextAnalysis.tokens(F.col("text")).as("td_toks"))
        .select(F.col("doc_id"),
          TextAnalysis.winnowFingerprintMd5(F.col("td_toks"), 4)
            .as("winnow_fp"))
        .orderBy("doc_id")
    }),

    // --- multimodal plumbing ---
    "q_multimodal_meta" -> ((s, dir) => {
      val d = Multimodal.withBinaryContent(t(s, dir, "documents"), "text")
      Multimodal.decodePartitions(d, "image")
        .select(F.col("doc_id"),
          F.col("media_meta.width").as("width"),
          F.col("media_meta.height").as("height"),
          F.col("media_meta.n_frames").as("n_frames"),
          F.col("media_meta.size_bytes").as("size_bytes"))
        .orderBy("doc_id")
    }),

    "q_multimodal_audio" -> ((s, dir) => {
      // write-then-parse E2E for the AUDIO face: canonical 44-byte
      // RIFF/WAVE headers synthesized per doc (rate/channels/bits/frames
      // stated from doc_id per the RIFF spec), decoded back through the
      // real header walk — the oracle states the synthesis formulas
      import s.implicits._
      val rates = Array(8000, 16000, 44100, 48000)
      val withWav = t(s, dir, "documents").select(F.col("doc_id"))
        .as[Long].map { id =>
          val rate = rates((id % 4).toInt)
          val ch = (id % 2 + 1).toInt
          val bits = if (id % 3 == 0) 8 else 16
          val frames = (id % 1000).toInt
          val dataLen = frames * ch * (bits / 8)
          val bb = java.nio.ByteBuffer.allocate(44)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
          bb.put("WAVE".getBytes("US-ASCII"))
          bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
          bb.putShort(1); bb.putShort(ch.toShort); bb.putInt(rate)
          bb.putInt(rate * ch * (bits / 8))
          bb.putShort((ch * (bits / 8)).toShort); bb.putShort(bits.toShort)
          bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
          (id, bb.array())
        }.toDF("doc_id", "content")
      Multimodal.decodePartitions(withWav, "audio")
        .select(F.col("doc_id"),
          F.col("media_meta.kind").as("kind"),
          F.col("media_meta.sample_rate").as("sample_rate"),
          F.col("media_meta.channels").as("channels"),
          F.col("media_meta.bits_per_sample").as("bits_per_sample"),
          F.col("media_meta.n_frames").as("n_frames"))
        .orderBy("doc_id")
    }),

    // --- dedup clustering / decontamination / mixing ---
    "q_dedup_clusters" -> ((s, dir) => {
      // deterministic multi-hop edge set: consecutive doc ids chain within
      // blocks of 100 → components are 100-node paths, which forces the
      // star algorithm through its O(log) contraction rounds (a star-shaped
      // dup group would converge trivially)
      val d = t(s, dir, "documents").select("doc_id")
      val edges = d.as("a").join(d.as("b"),
          F.col("b.doc_id") === F.col("a.doc_id") + 1 &&
            F.col("a.doc_id") % 100 =!= 99)
        .select(F.col("a.doc_id").as("src"), F.col("b.doc_id").as("dst"))
      graft.pipeline.Clustering
        .connectedComponents(edges, "src", "dst", nodes = Some(d))
        .orderBy("node")
    }),
    "q_contrastive_pairs" -> ((s, dir) => {
      // anchor→positive pairs from the same deterministic cluster chains
      // as q_dedup_clusters: one pair per non-canonical member
      val d = t(s, dir, "documents").select("doc_id")
      val edges = d.as("a").join(d.as("b"),
          F.col("b.doc_id") === F.col("a.doc_id") + 1 &&
            F.col("a.doc_id") % 100 =!= 99)
        .select(F.col("a.doc_id").as("src"), F.col("b.doc_id").as("dst"))
      graft.pipeline.Clustering
        .contrastivePairs(edges, "src", "dst", nodes = Some(d))
        .orderBy("anchor")
    }),
    "q_dedup_keep_best" -> ((s, dir) => {
      // deterministic chain edges within 10-id blocks: components are
      // provably the blocks, so the oracle can name them in SQL; the gate's
      // subject is the survivorship AGGREGATION (highest doc_id % 7, ties
      // to lowest id) — contraction depth is q_dedup_clusters' job, so the
      // chains here are short
      val d = t(s, dir, "documents").select("doc_id")
      val edges = d.as("a").join(d.as("b"),
          F.col("b.doc_id") === F.col("a.doc_id") + 1 &&
            F.col("a.doc_id") % 10 =!= 9)
        .select(F.col("a.doc_id").as("src"), F.col("b.doc_id").as("dst"))
      val assign = graft.pipeline.Clustering
        .connectedComponents(edges, "src", "dst", nodes = Some(d))
      graft.pipeline.Clustering.bestPerCluster(assign,
          t(s, dir, "documents").select(F.col("doc_id"),
            F.pmod(F.col("doc_id"), F.lit(7)).as("score")),
          "doc_id", "score")
        .orderBy("component")
    }),
    "q_fuzzy_pairs" -> ((s, dir) => {
      Dedup.fuzzyPairs(t(s, dir, "customer"), "c_name", "c_custkey",
          blockLen = 17, maxDist = 1)
        .orderBy("a", "b")
    }),
    // End-to-end curation composition — the full pre-training data path in
    // ONE plan: exact dedup (keep min id) -> single-pass quality-kernel
    // filter -> n-gram decontamination against an eval slice ->
    // leakage-safe source-keyed split -> per (split, lang) accounting.
    // Every stage is the already-gated operator; the value here is the
    // COMPOSITION: one DAG, no materialization barriers between stages,
    // fully reproduced by the DuckDB oracle.
    "q_curation_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // Every filter derives from the RAW scan and intersects at the end:
      // chaining them (dedup -> quality -> decontaminate) compounds —
      // each unmaterialized branch re-executes the whole upstream chain,
      // and the composed probe measured 216x cost at 30x data; with all
      // branches rooted at the scan, each recompute is one parquet read.
      // Same result either way: copies share text, so the dedup survivor
      // set and the per-text contamination/quality predicates commute.
      val keepIds = graft.pipeline.Dedup.exact(docs, "text", "doc_id")
        .select(F.col("keep_id").as("doc_id"))
      val contaminated = graft.pipeline.Decontaminate
        .overlapFlags(docs, "text", "doc_id", docs.where(F.col("doc_id") < 20),
          "text", n = 3)
        .where(F.col("contaminated")).select(F.col("id").as("doc_id"))
      val curated = graft.pipeline.QualityFilters.withQualityScore(
          docs.join(keepIds, Seq("doc_id"), "left_semi")
            .join(contaminated, Seq("doc_id"), "left_anti"),
          "text", keep = Seq("doc_id", "lang", "source"))
        .where(F.col("passes_quality"))
      graft.pipeline.DataMix.splitByKey(curated, "source",
          valFrac = 0.1, testFrac = 0.1)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).as("n_docs"), F.min("doc_id").as("first_id"))
        .orderBy("split", "lang")
    }),
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evals = docs.where(F.col("doc_id") < 20)
      graft.pipeline.Decontaminate
        .overlapFlags(docs, "text", "doc_id", evals, "text", n = 3)
        .orderBy("id")
    }),
    // The SAME decontamination verdicts computed AT INGESTION: stateless
    // stream-static overlap flags per arriving document. Shares
    // q_decontaminate's oracle SQL verbatim — streaming and batch must
    // agree bit for bit.
    "q_stream_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evals = docs.where(F.col("doc_id") < 20)
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/documents",
        docs)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val flags = graft.streaming.Streams.decontaminateStream(
        stream, evals, "text", "doc_id", "text", n = 3)
      graft.streaming.StreamStage.runToMemory(flags, "q_stream_decon_", "append")
        .orderBy("id")
    }),
    "q_text_unicode_nfc" -> ((s, dir) => {
      // inject combining accents ('a' -> 'a' + U+0301) so NFC has real
      // composition work; DuckDB's nfc_normalize implements the same
      // UAX#15 form, so the normalized strings hash-match.
      // (Previously keyed "q_text_normalize", a DUPLICATE of the CCNet
      // canonical-key gate below: in a Map literal the last entry wins,
      // so this gate and its oracle were silently dead for rounds.)
      val decomposed = F.regexp_replace(F.col("text"), "a", "a\u0301")
      t(s, dir, "documents").where(F.col("doc_id") < 50)
        .select(F.col("doc_id"),
          graft.expressions.TextKernels.unicodeNormalize(decomposed).as("norm"),
          F.char_length(decomposed).as("n_decomposed"),
          F.char_length(graft.expressions.TextKernels.unicodeNormalize(decomposed))
            .as("n_composed"))
        .orderBy("doc_id")
    }),
    // BPE tokenization: merges learned on the aggregated word-frequency
    // vocabulary (one corpus shuffle), applied row-local with the ranks
    // broadcast. The per-word merge loop is data-dependent iteration — no
    // SQL analog, so this gate is rows-only; PipelineSpec holds the
    // Sennrich-example differential, the round-trip/partition-invariance
    // properties, and q_tokenize_bpe_exact is the zero-merge exact twin.
    "q_tokenize_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // 20 merges against the driver data's 31-word vocabulary: enough to
      // fuse frequent subwords, few enough that tokenization stays partial
      // (fertility strictly between 1 and chars/word)
      val merges = graft.pipeline.Tokenize.learnBpeMerges(docs, "text",
        numMerges = 20, minFreq = 2)
      graft.pipeline.Tokenize.fertilityByGroup(docs, "text", "lang", merges)
        .orderBy("lang")
    }),
    // Zero merges degenerate BPE: every token is one character, so
    // n_tokens is exactly the non-whitespace character count — the
    // SQL-expressible twin pinning the application plumbing.
    "q_tokenize_bpe_exact" -> ((s, dir) => {
      graft.pipeline.Tokenize.withBpeTokens(
          t(s, dir, "documents").where(F.col("doc_id") < 100), "text",
          merges = Seq.empty)
        .select(F.col("doc_id"), F.col("n_tokens"))
        .orderBy("doc_id")
    }),
    "q_pack_sequences" -> ((s, dir) => {
      graft.pipeline.Packing.packByBudget(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", budget = 4096)
        .orderBy("doc_id")
    }),
    "q_chunk_docs" -> ((s, dir) => {
      graft.pipeline.Packing.chunkDocuments(
          t(s, dir, "documents").where(F.col("doc_id") < 50),
          "doc_id", "text", size = 80, overlap = 16)
        .orderBy("doc_id", "chunk_idx")
    }),
    "q_split_train" -> ((s, dir) => {
      graft.pipeline.DataMix.split(t(s, dir, "documents"), "doc_id",
          valFrac = 0.1, testFrac = 0.1)
        .groupBy("split").agg(F.count(F.lit(1)).as("n"),
          F.min("doc_id").as("first_id"))
        .orderBy("split")
    }),
    // Leakage-safe split: keyed on source so same-site documents (and
    // their near-duplicates) can never straddle the train/eval boundary.
    // n_sources per split + the global straddle count (must be 0) are the
    // co-assignment evidence.
    "q_split_leakage_safe" -> ((s, dir) => {
      graft.pipeline.DataMix.splitByKey(t(s, dir, "documents"), "source",
          valFrac = 0.2, testFrac = 0.2)
        .groupBy("split").agg(F.count(F.lit(1)).as("n_docs"),
          F.countDistinct(F.col("source")).as("n_sources"))
        .orderBy("split")
    }),
    // Curriculum phases: quartile tiers of document length via the exact
    // order-statistic cutpoints, boundary rows to the lower phase.
    "q_curriculum_phases" -> ((s, dir) => {
      graft.pipeline.DataMix.curriculumPhases(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "n_chars", phases = 4, tiebreakers = Seq("doc_id"))
        .groupBy("phase")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.min("n_chars").as("min_score"), F.max("n_chars").as("max_score"))
        .orderBy("phase")
    }),
    // Distribution matching: downsample so the surviving lang mix equals
    // the target (en .5 / fr .3 / de .2; zh/es dropped), keeping the
    // binding group at 100%.
    "q_match_distribution" -> ((s, dir) => {
      graft.pipeline.DataMix.matchDistribution(t(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 0.5, "fr" -> 0.3, "de" -> 0.2))
        .groupBy("lang").agg(F.count(F.lit(1)).as("n_kept"),
          F.min("doc_id").as("first_id"))
        .orderBy("lang")
    }),
    "q_data_mix" -> ((s, dir) => {
      graft.pipeline.DataMix.mixReport(t(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), defaultWeight = 0.75)
        .orderBy("lang")
    }),
    "q_sample_exact_n" -> ((s, dir) => {
      // 20 hash-smallest docs per language: a deterministic stratified
      // eval-set carve, reproducible in ANSI SQL
      graft.pipeline.DataMix.sampleExactNPerGroup(
          t(s, dir, "documents").select("doc_id", "lang"), "doc_id", "lang", 20)
        .orderBy("lang", "doc_id")
    }),
    "q_sample_weighted" -> ((s, dir) => {
      // quality-weighted carve (A-ES without replacement): longer docs
      // proportionally likelier. The key ln(u)/w routes ln through the
      // libm kernel and u is an exact dyadic rational, so the winner set
      // is bit-reproducible and fully oracle-checkable
      val docs = t(s, dir, "documents")
        .withColumn("wt", F.char_length(F.col("text")).cast("double"))
      graft.pipeline.DataMix.sampleWeightedN(docs, "doc_id", "wt", 100)
        .select("doc_id", "wt")
        .orderBy("doc_id")
    }),
    // Stratified weighted carve: the 20 highest A-ES keys per language —
    // same bit-reproducible key arithmetic as q_sample_weighted, ranked
    // inside per-group windows.
    "q_sample_weighted_group" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("wt", F.char_length(F.col("text")).cast("double"))
      graft.pipeline.DataMix.sampleWeightedNPerGroup(
          docs, "doc_id", "lang", "wt", n = 20)
        .select("doc_id", "lang", "wt")
        .orderBy("lang", "doc_id")
    }),
    "q_shuffle_epoch" -> ((s, dir) => {
      // deterministic training-epoch shuffle: (shard, pos) is a pure
      // function of (id, seed) — same seed bit-identical across engines,
      // new seed a fresh permutation; windows sort one shard each
      graft.pipeline.DataMix.epochShuffle(
          t(s, dir, "documents").select("doc_id"), "doc_id",
          seed = 7L, numShards = 32)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    }),
    "q_decontaminate_semantic" -> ((s, dir) => {
      // embedding-space decontamination: nearest eval item + threshold
      // flag per corpus vector. Cosine is the codegen kernel whose fold
      // order bit-matches the SQL oracle; max/compare add no arithmetic.
      val emb = t(s, dir, "embeddings")
      graft.pipeline.Decontaminate.semanticOverlapFlags(
          emb, "vec_id", "embedding",
          emb.where(F.col("vec_id") < 5), "vec_id", "embedding",
          threshold = 0.35, excludeSelf = true)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),
    "q_dsir" -> ((s, dir) => {
      // DSIR importance weights of every document against the German
      // slice as the target distribution. Feature hashing is md5-prefix
      // (engine-portable), probabilities are exact-count divisions, ln is
      // the libm kernel, sums fold sorted — hash-matches DuckDB exactly.
      val docs = t(s, dir, "documents")
      graft.pipeline.Dsir.importanceWeights(
          docs, docs.where(F.col("lang") === "de"), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_bm25" -> ((s, dir) => {
      // BM25 scoring over the corpus for a fixed 3-term query. k1=1.5 and
      // b=0.75 are exactly representable doubles, every reduction folds in
      // sorted order, and N/avgdl derive from exact integer sums — so the
      // score hash-matches DuckDB's identical formula bit for bit.
      val idx = graft.pipeline.Retrieval.buildBm25(
        t(s, dir, "documents"), "text", "doc_id")
      graft.pipeline.Retrieval.scoreQuery(
          idx, Seq("spark", "customer", "vector"), k1 = 1.5, b = 0.75)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_bm25_batch" -> ((s, dir) => {
      // thousands-of-queries retrieval shape: one corpus pass scores a
      // whole query batch (broadcast (qid, term) relation into the
      // postings); per-(qid, doc) sorted folds keep it bit-equal to both
      // the per-query path and the DuckDB oracle
      import s.implicits._
      val qs = Seq(
        ("q1", Seq("spark", "customer")),
        ("q2", Seq("vector", "spark", "union")),
        ("q3", Seq("customer"))).toDF("qid", "terms")
      val idx = graft.pipeline.Retrieval.buildBm25(
        t(s, dir, "documents"), "text", "doc_id")
      graft.pipeline.Retrieval.scoreQueryBatch(
          idx, qs, "qid", "terms", k1 = 1.5, b = 0.75)
        .withColumnRenamed("id", "doc_id")
        .orderBy("qid", "doc_id")
    }),
    "q_bm25_negatives" -> ((s, dir) => {
      // hard-negative mining for retrieval training pairs: top-k BM25
      // hits per query excluding the labeled positive — same scoring
      // machinery as q_bm25_batch, so the oracle extends that SQL
      import s.implicits._
      val pairs = Seq(
        ("q1", Seq("spark", "customer"), 5L),
        ("q2", Seq("vector", "spark", "union"), 17L),
        ("q3", Seq("customer"), 29L)).toDF("qid", "terms", "pos_id")
      val idx = graft.pipeline.Retrieval.buildBm25(
        t(s, dir, "documents"), "text", "doc_id")
      graft.pipeline.Retrieval.hardNegatives(
          idx, pairs, "qid", "terms", "pos_id", k = 5, k1 = 1.5, b = 0.75)
        .orderBy("qid", "rank")
    }),
    "q_bm25_incremental" -> ((s, dir) => {
      // incremental index upkeep under the SAME oracle as q_bm25: index
      // the first 250 docs, delta-append the rest (only the delta is
      // tokenized; scalars restamp from exact long sums), load, score —
      // must hash-match a from-scratch build on the whole corpus
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-bm25-inc").toString
      graft.pipeline.Retrieval.saveBm25(
        graft.pipeline.Retrieval.buildBm25(
          docs.where(F.col("doc_id") < 250), "text", "doc_id"),
        tmp, termBuckets = 16)
      graft.pipeline.Retrieval.appendBm25(s, tmp,
        docs.where(F.col("doc_id") >= 250), "text", "doc_id",
        checkDisjoint = true)
      graft.pipeline.Retrieval.scoreQuery(
          graft.pipeline.Retrieval.loadBm25(s, tmp),
          Seq("spark", "customer", "vector"), k1 = 1.5, b = 0.75)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_bm25_persisted" -> ((s, dir) => {
      // the persistence round trip under the SAME oracle as q_bm25: build,
      // save partitioned by term hash, load (scalars from the meta.json
      // stamp, never recomputed), score with partition-pruned postings —
      // the loaded index must hash-match the in-memory one bit for bit
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-bm25-idx").toString
      graft.pipeline.Retrieval.saveBm25(
        graft.pipeline.Retrieval.buildBm25(
          t(s, dir, "documents"), "text", "doc_id"),
        tmp, termBuckets = 16)
      graft.pipeline.Retrieval.scoreQuery(
          graft.pipeline.Retrieval.loadBm25(s, tmp),
          Seq("spark", "customer", "vector"), k1 = 1.5, b = 0.75)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_sample_exact_n_global" -> ((s, dir) => {
      // the large-n bucket-histogram plan (topNMaxN=0 forces it): selection
      // must be row-identical to ORDER BY (bucket, id) LIMIT n — the oracle
      // states exactly that, proving the scale path end-to-end vs DuckDB
      graft.pipeline.DataMix.sampleExactN(
          t(s, dir, "documents").select("doc_id"), "doc_id", 200, topNMaxN = 0)
        .orderBy("doc_id")
    }),
    "q_data_mix_temperature" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val kept = graft.pipeline.DataMix.sampleByTemperature(
          docs, "doc_id", "lang", alpha = 0.5, keepFraction = 0.5)
        .groupBy("lang").agg(F.count(F.lit(1)).as("n_kept"))
      docs.groupBy("lang").agg(F.count(F.lit(1)).as("n_total"))
        .join(kept, Seq("lang"), "left")
        .select(F.col("lang"), F.col("n_total"),
          F.coalesce(F.col("n_kept"), F.lit(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // --- normalization / hybrid retrieval / layout ---
    "q_text_normalize" -> ((s, dir) => {
      // CCNet canonical text key: lower, digits→0, Unicode punct/symbols
      // stripped, whitespace collapsed — restricted to regex classes Java
      // and RE2 interpret identically, so the key hash-matches DuckDB
      t(s, dir, "documents")
        .select(F.col("doc_id"),
          TextAnalysis.normalizeText(F.col("text")).as("norm"))
        .orderBy("doc_id")
    }),
    "q_dedup_exact_normalized" -> ((s, dir) => {
      // exact dedup over the normalized key: case/digit/punct/spacing
      // variants collapse to one group; same map-side-combine shape as
      // q_dedup_exact, the key expression is the only difference
      val norm = t(s, dir, "documents")
        .select(F.col("doc_id"),
          TextAnalysis.normalizeText(F.col("text")).as("norm"))
      Dedup.exact(norm, "norm", "doc_id")
        .orderBy("text_hash")
    }),
    "q_retrieval_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 lexical list fused with a dense cosine list
      // by reciprocal-rank fusion. Ranks are exact ints (distributed rank,
      // id tiebreak), each contribution is one IEEE division, the sum
      // folds in fixed list order → full value-hash oracle.
      val idx = graft.pipeline.Retrieval.buildBm25(
        t(s, dir, "documents"), "text", "doc_id")
      val lexical = graft.pipeline.Retrieval.scoreQuery(
          idx, Seq("spark", "customer", "vector"), k1 = 1.5, b = 0.75)
        .select("id", "score")
      val q0 = t(s, dir, "embeddings").where(F.col("vec_id") === 0)
        .select(F.col("embedding").as("q_emb"))
      val dense = t(s, dir, "embeddings").where(F.col("vec_id") =!= 0)
        .crossJoin(F.broadcast(q0))
        .select(F.col("vec_id").as("id"),
          Similarity.cosine(F.col("embedding"), F.col("q_emb")).as("score"))
      graft.pipeline.Retrieval.rrfFuse(Seq(lexical, dense), "id", "score")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q_zorder_key" -> ((s, dir) => {
      // Morton key over (price, discount): row-local exact arithmetic
      // after one floor-quantization — the layout key behind
      // multi-dimension file skipping, checked bit-for-bit vs DuckDB
      t(s, dir, "lineitem")
        .select(F.col("l_orderkey"), F.col("l_linenumber"),
          graft.operators.ZOrder.zKey(
            Seq(F.col("l_extendedprice"), F.col("l_discount")),
            Seq((900.0, 105000.0), (0.0, 0.11)), bits = 8).as("z_key"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // --- events / JSON ---
    "q_events_json" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast(IntegerType))
        .withColumn("hour_epoch", F.unix_timestamp(F.date_trunc("HOUR", F.col("ts"))))
        .groupBy("hour_epoch", "event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("k").cast(LongType)).as("k_sum"),
          F.sum(F.col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("value_sum"))
        .orderBy("hour_epoch", "event_type")
    })
  )
}
