package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableFrame
import graft.td

/** Automated plan-quality gate: asserts the physical-plan properties the
  * 100 TB design depends on — filter/projection pushdown into the parquet
  * scan, broadcast joins for dimension sides, map-side partial
  * aggregation, whole-stage codegen over the quality-signal projections,
  * and shuffle counts for the hand-built operators. A regression that
  * turns a broadcast into a sort-merge join or un-pushes a filter fails
  * here, not in a profiler three rounds later. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import TestSession.sf

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("filter and projection reach the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(F.col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    // ReadSchema prunes to exactly the two referenced columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_shipdate"))
  }

  test("TPC-H Q5 broadcasts every dimension side, shuffles only facts") {
    val df = graft.queries.AnalyticsQueries.queries("q_tpch_q5")(spark, sf)
    val p = plan(df)
    // supplier, nation(+region), and the explicit-hint sides broadcast
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    // the only sort-merge-eligible joins are fact-to-fact
    assert(count(p, "SortMergeJoin") <= 2, p)
  }

  test("group-by aggregation is partial (map-side combine) then final") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(F.sum("l_quantity"))
    val p = plan(df)
    assert(count(p, "HashAggregate") == 2, p)
    assert(p.contains("partial_sum"), p)
  }

  test("gopher signals: one kernel eval per row, no shuffle") {
    import graft.pipeline.QualityFilters
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = QualityFilters.withGopherSignals(docs, "text", keep = Seq("doc_id"))
    val p = plan(df)
    // the single-pass TextQualityStats kernel is materialized in its own
    // projection and must appear EXACTLY once — a collapsed plan would
    // inline it into all eight consumers and re-scan the text per signal
    assert(count(p, "text_quality_stats") == 1, p)
    // scan -> project -> project, no exchange at all
    assert(count(p, "Exchange") == 0, p)
  }

  test("regex-counter quality signals stay inside whole-stage codegen") {
    import graft.pipeline.QualityFilters
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = QualityFilters.gopherSignals(F.col("text"))
    val df = docs.select(F.col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
    val p = plan(df)
    // "*(1)" prefixes = whole-stage-codegen stage 1; the repeated
    // word-count subterm is CSE'd into a _common_expr projection
    assert(p.contains("*(1) Project"), p)
    assert(count(p, "Exchange") == 0, p)
  }

  test("as-of join plans with zero join nodes (union + keyed window)") {
    import graft.operators.AsofJoin
    val quotes = spark.range(100).select(
      (F.col("id") % 5).as("sym"), F.col("id").as("t"), F.rand(7).as("px"))
    val trades = spark.range(50).select(
      (F.col("id") % 5).as("sym"), (F.col("id") * 2).as("t"))
    val joined = AsofJoin.asofJoin(trades, quotes,
      on = "t", by = Seq("sym"), strategy = "backward")
    val p = plan(joined)
    assert(!p.contains("Join"), p)
  }

  test("exact dedup is a single shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.pipeline.Dedup.exact(docs, "text", "doc_id")
    val p = plan(df)
    assert(count(p, "Exchange") == 1, p)
  }

  test("simhash and LSH-bucket plans contain no interpreted lambdas") {
    // the sketch kernels are single codegen'd expressions — a regression
    // back to aggregate/zip_with/transform HOFs shows up as lambdafunction
    // nodes in the optimized plan (the r2 bench-regression class of defect)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val sim = docs.select(graft.pipeline.Dedup.simhash64(F.col("text")))
    val lsh = emb.select(graft.pipeline.Similarity.lshBucket(F.col("embedding"), 8))
    Seq(sim, lsh).foreach { df =>
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("lambdafunction"), opt)
    }
  }

  test("decontamination: eval grams broadcast; corpus side never shuffles before the match") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val evals = docs.where(F.col("doc_id") < 20)
    val flags = graft.pipeline.Decontaminate.overlapFlags(
      docs, "text", "doc_id", evals, "text", 3)
    val p = plan(flags)
    assert(p.contains("BroadcastHashJoin"), p)
    // the contamination match itself must not shuffle the corpus: the only
    // exchanges are the hit-distinct and the final left join, downstream of
    // the broadcast match
    val beforeJoin = p.substring(0, p.indexOf("BroadcastHashJoin"))
    assert(!beforeJoin.contains("Exchange"), p)
  }

  test("unigram LM: vocab probe is a broadcast join, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = graft.pipeline.QualityFilters.unigramLogProb(
      docs, "doc_id", "text", vocabSize = 2000)
    val p = plan(scored)
    // the token->vocab lookup must broadcast the capped vocabulary, never
    // shuffle the token stream for it, and never degrade to a cartesian
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("data mix: pure filter, zero exchanges, inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mixed = graft.pipeline.DataMix.sampleByWeights(
      docs, "doc_id", "lang", Map("en" -> 0.5), 0.75)
    val p = plan(mixed)
    assert(count(p, "Exchange") == 0, p)
    // "*(1) Filter" is the whole-stage-codegen marker in executedPlan toString
    assert(p.contains("*(1) Filter"), p)
    // the temperature variant plans the same shape: the rate derivation is
    // an O(k) driver step at build time, the corpus path stays a pure filter
    val temp = graft.pipeline.DataMix.sampleByTemperature(
      docs, "doc_id", "lang", alpha = 0.5, keepFraction = 0.5)
    val pt = plan(temp)
    assert(count(pt, "Exchange") == 0, pt)
    assert(pt.contains("*(1) Filter"), pt)
  }

  test("minhash signature stage is a projection — no aggregate, no lambda") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = docs.select(
      graft.pipeline.Dedup.minhashSignature(F.col("text"), 32, 3))
    val opt = sig.queryExecution.optimizedPlan.toString
    assert(!opt.contains("lambdafunction"), opt)
    val p = plan(sig)
    assert(count(p, "Exchange") == 0, p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("exact-twin gates keep the scale plan shape (broadcast probe, no cartesian)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // LSH nbits=0: still the bucket-join plan (queries broadcast), not a
    // cartesian rewrite — the exact mode must exercise the routed machinery
    val lsh = graft.pipeline.Similarity.lshTopK(
      emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", "vec_id",
      k = 10, nbits = 0)
    val pl = plan(lsh)
    assert(pl.contains("BroadcastHashJoin"), pl)
    assert(!pl.contains("CartesianProduct") && !pl.contains("BroadcastNestedLoopJoin"), pl)
    // MinHash bands=k: the signature stage stays a pure projection (no
    // interpreted lambdas, no aggregate) even at 32 bands
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val banded = graft.pipeline.Dedup.minhashBandIndex(docs, "text", "doc_id",
      k = 32, bands = 32)
    val opt = banded.queryExecution.optimizedPlan.toString
    assert(!opt.contains("lambdafunction"), opt)
    assert(count(plan(banded), "Exchange") == 0, plan(banded))
  }

  test("duplicate spans: linear shape — count exchange + hash join, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.Dedup.duplicateSpans(docs, "text", "doc_id", 10))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // partial aggregation combines map-side before the single count shuffle
    assert(p.contains("HashAggregate"), p)
    assert(count(p, "Exchange") <= 3, p) // gh count + join co-partitioning, no more
  }

  test("fuzzy pairs: blocked equi-join — never a cartesian/nested-loop product") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val p = plan(graft.pipeline.Dedup.fuzzyPairs(cust, "c_name", "c_custkey", 16, 1))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the block key is the join key (id inequality and distance are filters)
    assert(p.contains("Join") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("incremental dedup: aggregate's exchange is reused by the anti-join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.pipeline.Dedup.incrementalNew(
      docs.where(F.col("doc_id") < 250), docs.where(F.col("doc_id") >= 250),
      "text", "doc_id")
    val p = plan(df)
    // both sides hash to the md5 key: batch partial-agg exchange + history
    // distinct exchange at most — no third shuffle appears for the
    // anti-join itself (broadcast below the threshold, co-partitioned
    // above it)
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("partial_min") || p.contains("partial_first"), p)
  }

  test("TPC-H Q18: the quantity threshold runs as an aggregated semi-join") {
    val df = graft.queries.AnalyticsQueries.queries("q_tpch_q18")(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftSemi"), p)
    // both aggregations combine map-side
    assert(p.contains("partial_sum"), p)
  }

  test("semantic dedup pairs: cluster-keyed join, never a cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.pipeline.SemDedup.pairs(emb, "vec_id", "embedding",
      k = 4, iters = 1, threshold = 0.35)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // no interpreted lambdas in the cosine
    assert(!df.queryExecution.optimizedPlan.toString.contains("lambdafunction"))
  }

  test("quality score: one kernel eval, zero exchanges, codegen arithmetic") {
    import graft.pipeline.QualityFilters
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = QualityFilters.withQualityScore(docs, "text", keep = Seq("doc_id"))
    val p = plan(df)
    assert(count(p, "text_quality_stats") == 1, p)
    assert(count(p, "Exchange") == 0, p)
    // "*(N)" prefixes mark whole-stage-codegen stages: the score
    // arithmetic projection must be inside one
    assert(p.contains("*(2) Project") || p.contains("*(1) Project"), p)
  }

  test("packing: corpus windows stay per-partition; offsets broadcast back") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars")
    val df = graft.pipeline.Packing.packByBudget(docs, "doc_id", "n_chars", 4096L)
    val p = plan(df)
    // the only global (empty-partitionSpec) window runs over the
    // numPartitions-row offsets relation, which rejoins via broadcast —
    // the corpus itself never funnels through one reducer
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("grouped top-k: map-side WindowGroupLimit before the exchange") {
    // the rank<=k filter must compile to a PARTIAL WindowGroupLimit below
    // the shuffle (each map partition keeps only its own top k) and a
    // Final one above — the difference between shuffling k rows per group
    // per partition and shuffling the whole corpus
    val df = graft.operators.SeriesOps.topKPerGroup(
      spark.read.parquet(s"$sf/orders.parquet"),
      Seq("o_orderstatus"), "o_totalprice", 3,
      descending = true, tiebreakers = Seq("o_orderkey"))
    val p = plan(df)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    assert(p.contains("Final"), p)
  }

  test("exact-n sampling: global plans distributed top-n; per-group map-limits") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "lang")
    // global: TakeOrderedAndProject — per-partition top-n, no full sort
    val g = plan(graft.pipeline.DataMix.sampleExactN(docs, "doc_id", 50))
    assert(g.contains("TakeOrderedAndProject"), g)
    // stratified: the rn<=n filter map-limits below the exchange
    val s = plan(graft.pipeline.DataMix.sampleExactNPerGroup(docs, "doc_id", "lang", 20))
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"), s)
    // above the cutover, no top-n of size n exists anywhere in the plan:
    // the bulk is a plain filter (bucket < boundary), and the only ordered
    // limit is the boundary bucket's top-up, far smaller than n
    val n = 50
    val big = plan(graft.pipeline.DataMix.sampleExactN(docs, "doc_id", n, topNMaxN = 0))
    assert(!big.contains(s"TakeOrderedAndProject(limit=$n"), big)
    assert(big.contains("Union"), big)
  }

  test("weighted sampling: distributed top-n, no global sort, no shuffle of the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("wt", F.char_length(F.col("text")).cast("double"))
    val p = plan(graft.pipeline.DataMix.sampleWeightedN(docs, "doc_id", "wt", 100))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("epoch shuffle: one shard-keyed exchange, no global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val p = plan(graft.pipeline.DataMix.epochShuffle(docs, "doc_id", 7L, 32))
    // the only wide op is the window's hashpartitioning on shard —
    // positions come from per-shard sorts, never a single global ordering
    assert(count(p, "Exchange") == 1, p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("common-line removal: md5-keyed line agg, no text-keyed shuffle, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.QualityFilters.removeCommonLines(
      docs, "doc_id", "text", maxDocs = 3))
    // the distinct-doc count and the count join key on the 32-char md5,
    // not the raw paragraph text; partial aggregation runs map-side
    assert(p.contains("hashpartitioning(h"), p)
    assert(!p.contains("hashpartitioning(line"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("bm25/dsir: dictionary sides broadcast, no cartesian, term filter pushed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // BM25: the query-term filter must prune the postings before any join,
    // and document frequencies join broadcast (a k-row relation)
    val idx = graft.pipeline.Retrieval.buildBm25(docs, "text", "doc_id")
    val scored = plan(graft.pipeline.Retrieval.scoreQuery(
      idx, Seq("spark", "customer"), k1 = 1.5, b = 0.75))
    assert(scored.contains("BroadcastHashJoin"), scored)
    assert(!scored.contains("CartesianProduct"), scored)
    // DSIR: both bucket-distribution relations (bounded <=16^4 rows)
    // broadcast into the corpus-sized feature stream
    val w = plan(graft.pipeline.Dsir.importanceWeights(
      docs, docs.where(F.col("lang") === "de"), "text", "doc_id"))
    assert(count(w, "BroadcastHashJoin") >= 2, w)
    assert(!w.contains("CartesianProduct"), w)
  }

  test("tpch q6: every selective filter reaches the parquet scan") {
    val p = plan(graft.SparkEntry.queries("q_tpch_q6")(spark, sf))
    assert(p.contains("PushedFilters"), p)
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(p.split("PushedFilters").last.contains(c), s"$c not pushed:\n$p")
  }

  test("domain cap: one hash exchange on the domain key, nothing more") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("url", F.concat(F.lit("https://www.site"),
        (F.col("doc_id") % 50).cast("string"), F.lit(".com/p")))
    val p = plan(graft.pipeline.Domains.capPerDomain(docs, "url", "doc_id", 5))
    assert(count(p, "Exchange") == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("vocab coverage: no single-partition global window anywhere") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.Vocab.byCoverage(docs, "text", 0.95))
    // the cumulative sum must ride the range shuffle + per-partition
    // windows + broadcast offsets — a SinglePartition exchange would mean
    // the single-reducer global window snuck back in
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("corpus card: regex counters and ranks run once (checkpointed pass); " +
    "no single-task window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val card = graft.pipeline.Report.corpusCard(docs, "lang", "text", "doc_id")
    val p = plan(card)
    // the staged counters were materialized once at build (the rank
    // pass's localCheckpoint); the card's own plan re-reads the pinned
    // relation — regexes never re-evaluate, rank windows stay keyed by
    // (pid, group) (parallel), and nothing collapses to a single task
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("windowspecdefinition(td_len"), p) // no unkeyed window
    assert(!p.contains("regexp_count"), p)
    // the per-group n relation rides back in as an explicit broadcast
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p)
    // stats + quantile consumers both read the one checkpointed rank pass
    assert(count(p, "Scan ExistingRDD") >= 2, p)
  }

  test("rank-test family: one range shuffle (two for spearman), " +
    "never a cartesian") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
        .as("variant"), F.col("value"))
    // ScalableRank pins its range stage as a pid-keyed ExistingRDD scan;
    // one ranked pass shows exactly TWO pid exchanges (the rank window +
    // the bounded per-pid offsets agg over the same checkpointed
    // relation). The finishing fold is a single-row pack, never a corpus
    // exchange or a product join.
    val mw = plan(graft.pipeline.Report.mannWhitneyU(ev, "variant", "value"))
    assert(count(mw, "hashpartitioning($td.__pid") == 2, mw)
    assert(!mw.contains("CartesianProduct") &&
      !mw.contains("BroadcastNestedLoopJoin"), mw)
    val kw = plan(graft.pipeline.Report.kruskalWallis(ev, "variant", "value"))
    assert(count(kw, "hashpartitioning($td.__pid") == 2, kw)
    assert(!kw.contains("CartesianProduct"), kw)
    // spearman ranks BOTH axes — two ranked passes, bounded pid
    // exchanges only (the exact count varies with checkpoint reuse)
    val sp = plan(graft.pipeline.Report.spearmanCorr(
      spark.read.parquet(s"$sf/events.parquet"), "value", "user_id"))
    val spPid = count(sp, "hashpartitioning($td.__pid")
    assert(spPid >= 2 && spPid <= 4, sp)
    assert(!sp.contains("CartesianProduct"), sp)
  }

  test("filtered ANN: the metadata semi-join sits BELOW the rank window " +
    "(pre-filter), queries broadcast") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding",
      k = 8, iters = 1)
    val p = plan(graft.pipeline.Ivf.topKFiltered(idx,
      emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", k = 10,
      allowed = emb.filter(F.col("label") % 3 === 0),
      allowedIdCol = "vec_id", nprobe = 8))
    // plans print top-down: the window (ranking) node must appear ABOVE
    // the LeftSemi (earlier in the text) — candidates are filtered
    // BEFORE distance ranking, so recall is measured against the
    // filtered corpus, not lost to dead slots
    val winAt = p.indexOf("Window")
    val semiAt = p.indexOf("LeftSemi")
    assert(winAt >= 0 && semiAt >= 0 && winAt < semiAt, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("welch t-test: one corpus scan, map-side-combined moments agg, " +
    "no product join") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
        .as("variant"), F.col("value").cast("double").as("revenue"))
    val p = plan(graft.pipeline.Report.welchT(ev, "variant", "revenue"))
    assert(count(p, "Scan parquet") == 1, p)
    // partial aggregation before the variant exchange (map-side combine)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t-closeness: the bounded cell relation materializes ONCE for its " +
    "three consumers (no re-executed corpus scan)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val df = graft.pipeline.Privacy.tCloseness(
      orders.withColumn("o_year", F.year(F.col("o_orderdate"))),
      Seq("o_orderpriority", "o_year"), "o_orderstatus", 0.2)
    // count LOGICAL nodes, not plan-string occurrences: an
    // InMemoryRelation's description embeds its build plan's text, so
    // string-matching "Scan parquet" overcounts cached plans
    var fileScans = 0; var memScans = 0
    df.queryExecution.optimizedPlan.foreach { n =>
      val c = n.getClass.getSimpleName
      if (c.contains("LogicalRelation")) fileScans += 1
      if (c.contains("InMemoryRelation")) memScans += 1
    }
    // the corpus scan ran once inside the barrier's count; the final
    // plan reads the bounded cells cache three times (join + marginals
    // + grand total) and never touches parquet again
    assert(fileScans == 0, s"corpus re-scan leaked into the final plan")
    assert(memScans == 3, s"expected 3 bounded cache reads, got $memScans")
    assert(!plan(df).contains("CartesianProduct"))
  }

  test("grouped minhash: candidate join carries the group key, no product") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.pipeline.Dedup.minhashLshPairsGrouped(
      docs, "text", "doc_id", "lang", 32, 8, 3, 0.5))
    // the group key rides the band-bucket hash join — cross-group pairs
    // are pruned at the JOIN KEY, not post-filtered
    assert(p.contains("td_grp"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // and the VERIFY stage's inverted-index self-join is group-confined
    // too: its key is (shingle, td_grp), so cross-group doc pairs that
    // share boilerplate shingles are never generated pre-join
    assert("shingle#\\d+, td_grp#".r.findFirstIn(p).isDefined,
      "verify-stage shingle join lost its group key:\n" + p.take(2000))
  }

  test("ks two-sample: every window is PARTITIONED (the two-phase " +
    "prefix), offsets broadcast back — no unpartitioned corpus sort") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
        .as("variant"), F.col("value"))
    val p = plan(graft.pipeline.Report.ksTwoSample(ev, "variant", "value"))
    // an unpartitioned Window prints TWO bracket groups (`], [order]`),
    // a partitioned one THREE (`], [cols], [order]`). The corpus-sized
    // cumsum must ride partitioned (per-pid) windows; the only
    // unpartitioned window allowed is the numPartitions-row OFFSETS
    // relation, recognizable by its pid ordering (the ScalableRank
    // convention)
    def unpartitioned(s: String): Seq[String] = s.linesIterator
      .filter(_.contains("Window ["))
      .filter(l => count(l, "], [") == 1).toSeq
    assert(unpartitioned(p).nonEmpty && unpartitioned(p).forall(
        l => l.contains("[pid#")),
      "a corpus-sized unpartitioned window leaked into the KS plan:\n" +
        unpartitioned(p).mkString("\n"))
    // the per-pid prefix windows exist and are partitioned
    assert(p.linesIterator.exists(l => l.contains("Window [") &&
      l.contains("], [$td.__pid#")), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the sliced face rides the same discipline, per (pid, slice) —
    // and even its offsets window is partitioned (by slice)
    val evS = spark.read.parquet(s"$sf/events.parquet")
      .select(F.col("event_type"),
        F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), F.col("value"))
    val ps = plan(graft.pipeline.Report.ksTwoSampleByGroup(
      evS, "event_type", "variant", "value"))
    assert(unpartitioned(ps).isEmpty,
      "unpartitioned window leaked into the sliced KS plan:\n" +
        unpartitioned(ps).mkString("\n"))
    assert(!ps.contains("CartesianProduct"), ps.take(2000))
  }

  test("filtered quantized ANN: the allowed-id semi-join sits BELOW the " +
    "rank window (pre-distance), never post-filtering ranked output") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 4, iters = 1)
    val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
      m = 2, ks = 8, iters = 1)
    val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
    val p = plan(graft.pipeline.Quantize.ivfPqTopKFiltered(idx, enc,
      emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", k = 5,
      nprobe = 2, cb, allowed = emb.filter(F.col("label") % 3 === 0),
      allowedIdCol = "vec_id"))
    // physical plans print root-first: the top-k Window must appear
    // BEFORE (downstream of) the LeftSemi join in the string — the
    // predicate prunes candidates before any ADC distance is evaluated
    val iWin = p.indexOf("Window")
    val iSemi = p.indexOf("LeftSemi")
    assert(iWin >= 0 && iSemi >= 0 && iWin < iSemi,
      s"semi-join not below the rank window (win=$iWin semi=$iSemi):\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("benford: ONE corpus scan (window total, not a broadcast re-scan)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = plan(graft.dq.Dq.benford(li, "l_extendedprice"))
    // the r14-advice fix: the 1-row total rides an unpartitioned window
    // over the <=9 count rows instead of a second aggregate whose lineage
    // re-executed the whole scan + digit shuffle
    assert(count(p, "Scan parquet") == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("script-mix: ONE kernel eval feeds fractions + dominant script") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val staged = docs.select(F.col("doc_id"),
      graft.pipeline.TextAnalysis.scriptStats(F.col("text")).as("td_ss"))
    val out = staged.select(
      F.col("doc_id") +:
        graft.pipeline.TextAnalysis.dominantScriptFromStats(F.col("td_ss"))
          .as("script") +:
        graft.pipeline.TextAnalysis.scriptFractionsFromStats(F.col("td_ss"))
          .map { case (n, c) => c.as(n) }: _*)
    val p = plan(out)
    assert(count(p, "script_mix_stats") == 1, p)
    assert(!p.contains("regexp_count"), p)
  }

  test("modularity: persisted label relation, broadcast label joins, " +
    "no cartesian") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.col("user_id").cast("string").as("src"),
        F.col("event_type").as("dst"))
    val labels = ev.select(F.col("src").as("node")).distinct()
      .select(F.col("node"), F.substring(F.col("node"), 1, 1).as("community"))
    val p = plan(graft.pipeline.GraphRank.modularity(
      ev, "src", "dst", labels))
    // the node-sized partition materializes once for its three consumers
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    // E rides the bounded per-community window — no second edge scan for
    // a broadcast total
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ivf-pq kernel scoring: row-local ADC (no per-sub explode/groupBy), " +
    "broadcast probe join only, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 4, iters = 1)
    val cb = graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding",
      m = 16, ks = 128, iters = 1) // volume 8192 ≤ AdcJoinThreshold → kernels
    val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
    val p = plan(graft.pipeline.Quantize.ivfPqTopK(idx, enc,
      emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", 5, 2, cb))
    // the probed-query attach is the only join; scoring is the pq_adc_dot
    // kernel, so the plan has no code explode and no (query, id) re-agg
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("pq_adc_dot"), p)
    // no posexplode(codes) blow-up (the one Generate is the query side's
    // nprobe cluster-list explode — bounded by the query count)
    assert(!p.contains("explode(codes"), p)
    assert(!p.contains("CartesianProduct"), p)
    // encode side: assignment is the pq_assign kernel — no codebook join,
    // no argmin aggregate; exactly one aggregate in the whole search plan
    // would even be too strict, so pin the kernel's presence instead
    val pe = plan(enc)
    assert(pe.contains("pq_assign"), pe)
    assert(!pe.contains("HashAggregate"), pe)
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    // the pre-shuffled layout a recurring 100 TB fact-fact join should use:
    // both sides bucketed on the key -> the join consumes the bucket
    // partitioning directly, no runtime shuffle of either side
    val thresh = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thresh)
    spark.conf.set(thresh, "-1") // force the non-broadcast path
    try {
      spark.range(1000).select(F.col("id").as("k"), (F.col("id") * 2).as("x"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("ps_bucketed_a")
      spark.range(1000).select(F.col("id").as("k"), (F.col("id") * 3).as("y"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("ps_bucketed_b")
      val j = spark.table("ps_bucketed_a").join(spark.table("ps_bucketed_b"), "k")
      val p = plan(j)
      assert(count(p, "Exchange hashpartitioning") == 0, p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(count(p, "SelectedBucketsCount") == 2, p)
    } finally {
      spark.conf.set(thresh, old)
      spark.sql("DROP TABLE IF EXISTS ps_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS ps_bucketed_b")
    }
  }

  test("persisted BM25 postings scan prunes to the query terms' partitions") {
    import graft.pipeline.Retrieval
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-plan").toString
    Retrieval.saveBm25(Retrieval.buildBm25(docs, "text", "doc_id"), tmp,
      termBuckets = 16)
    val idx = Retrieval.loadBm25(spark, tmp)
    val scored = Retrieval.scoreQuery(idx, Seq("spark", "customer"))
    val p = plan(scored)
    // the bucket predicate is a PARTITION filter on the postings scan —
    // directories for other buckets are never listed, let alone read
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("term_bucket"), p)
    // and the term predicate pushes into the files that remain
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("term"), p)
    // IO-level proof: the pruned scan touches strictly fewer files than the
    // full postings relation (same xxhash64 bucket expression as saveBm25)
    val buckets = Seq("spark", "customer").map { t =>
      spark.range(1).select(F.pmod(F.xxhash64(F.lit(t)), F.lit(16L)))
        .head().getLong(0)
    }.distinct
    val all = spark.read.parquet(s"$tmp/postings")
    val prunedFiles = all.where(F.col("term_bucket").isin(buckets: _*))
      .select(F.input_file_name()).distinct().count()
    val totalFiles = all.select(F.input_file_name()).distinct().count()
    assert(prunedFiles < totalFiles, s"$prunedFiles vs $totalFiles files")
  }

  test("z-order key: row-local expression, zero exchanges before the re-layout") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val keyed = li.select(F.col("l_orderkey"),
      graft.operators.ZOrder.zKey(
        Seq(F.col("l_extendedprice"), F.col("l_discount")),
        Seq((900.0, 105000.0), (0.0, 0.11)), bits = 8).as("z"))
    val p = plan(keyed)
    // pure projection over the scan: no exchange, no window, stays in one
    // whole-stage-codegen span (the `*(1)` prefix in the executed plan)
    assert(count(p, "Exchange") == 0, p)
    assert(p.contains("*(1) Project"), p)
    // the clustering form adds exactly the one range exchange any
    // re-layout needs
    val clustered = plan(graft.operators.ZOrder.clusterByZOrder(
      li, Seq("l_extendedprice", "l_discount"),
      Seq((900.0, 105000.0), (0.0, 0.11)), bits = 8))
    assert(count(clustered, "Exchange") == 1, clustered)
    assert(clustered.contains("rangepartitioning(z_key"), clustered)
  }

  test("rrf fusion: distributed ranks (range exchange), no single-reducer window") {
    import spark.implicits._
    val a = spark.read.parquet(s"$sf/documents.parquet")
      .select(F.col("doc_id").as("id"),
        F.col("n_chars").cast("double").as("score"))
    val b = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(F.col("vec_id").as("id"),
        F.col("label").cast("double").as("score"))
    val p = plan(graft.pipeline.Retrieval.rrfFuse(Seq(a, b), "id", "score"))
    // each list ranks via ScalableRank, whose range exchange materializes
    // inside a localCheckpoint — what the final plan must show is the
    // WITHIN-PARTITION window (partitioned by the checkpoint-pinned pid),
    // never an unpartitioned row_number over the whole list
    assert(p.contains("windowspecdefinition($td.__pid"), p)
    assert(!p.contains("windowspecdefinition(score"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch full suite: dims broadcast, no cartesian beyond 1-row scalars") {
    // Q9: part (LIKE-filtered), supplier, nation all broadcast; the only
    // sort-merge-eligible join is the orders fact side
    val q9 = plan(graft.SparkEntry.queries("q_tpch_q9")(spark, sf))
    assert(count(q9, "BroadcastHashJoin") >= 3, q9)
    assert(!q9.contains("CartesianProduct"), q9)
    // Q21: the EXISTS/NOT-EXISTS pair rides ONE keyed window over the
    // orders join — a single lineitem scan, no nested-loop, and the
    // window partitions on the join key (no extra exchange beyond it)
    val q21 = plan(graft.SparkEntry.queries("q_tpch_q21")(spark, sf))
    assert(count(q21, "lineitem.parquet") == 1, q21)
    assert(q21.contains("Window"), q21)
    assert(!q21.contains("BroadcastNestedLoopJoin"), q21)
    assert(!q21.contains("CartesianProduct"), q21)
    // Q11: the global-total threshold crosses in as a broadcast 1-row side
    // (BNLJ over a single row is O(n)); the fact side is never replicated
    val q11 = plan(graft.SparkEntry.queries("q_tpch_q11")(spark, sf))
    assert(!q11.contains("CartesianProduct"), q11)
    assert(count(q11, "BroadcastNestedLoopJoin") <= 1, q11)
    // Q2: the correlated per-part min rides a KEYED window over the
    // derived supply relation — lineitem is scanned exactly once (the
    // agg+self-join formulation scanned and re-aggregated it twice)
    val q2 = plan(graft.SparkEntry.queries("q_tpch_q2")(spark, sf))
    assert(count(q2, "BroadcastHashJoin") >= 2, q2)
    assert(!q2.contains("CartesianProduct"), q2)
    assert(count(q2, "lineitem.parquet") == 1, q2)
    assert(q2.contains("Window"), q2)
    // Q20 and Q17 share the shape: one lineitem scan, per-part aggregate
    // via keyed window (Q17's additionally AFTER the broadcast part filter)
    val q20 = plan(graft.SparkEntry.queries("q_tpch_q20")(spark, sf))
    assert(count(q20, "lineitem.parquet") == 1, q20)
    assert(!q20.contains("CartesianProduct"), q20)
    val q17 = plan(graft.SparkEntry.queries("q_tpch_q17")(spark, sf))
    assert(count(q17, "lineitem.parquet") == 1, q17)
    assert(q17.contains("Window"), q17)
  }

  test("version diff: one sort-merge join, no cartesian, no window") {
    // the CDC diff must be exactly the co-partitioning cost of the two
    // snapshots: one equi-join on the key, classification in projection
    val a = spark.range(1000).select(F.col("id"),
      (F.col("id") % 7).as("x"), (F.col("id") % 3).cast("string").as("s"))
    val b = spark.range(900).select(F.col("id"),
      (F.col("id") % 5).as("x"), (F.col("id") % 3).cast("string").as("s"))
    val p = plan(graft.store.VersionDiff.diff(a, b, Seq("id")))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Window"), p)
  }

  test("round-10 ops: broadcast verify, no cartesians, keyed-only windows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // two-pass heavy hitters: the verify pass joins the corpus tokens to
    // the BROADCAST candidate list — never a vocabulary-wide shuffle join
    val hh = plan(graft.pipeline.Vocab.heavyHittersTwoPass(docs, "text", 0.001))
    assert(hh.contains("BroadcastHashJoin"), hh)
    assert(!hh.contains("SortMergeJoin") && !hh.contains("CartesianProduct"), hh)
    // n-gram novelty: inverted-index joins only, no nested loop, no window
    val nv = plan(graft.pipeline.TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3))
    assert(!nv.contains("CartesianProduct") && !nv.contains("BroadcastNestedLoop"), nv)
    assert(!nv.contains("Window"), nv)
    // resample: the only window is keyed (LOCF), the only nested loop is
    // the broadcast 1-row bounds cross
    val ev = graft.queries.Tables.load(spark, sf, "events")
      .withColumn("v", F.floor(F.col("value")).cast("long"))
    val rs = plan(graft.operators.SeriesOps.resample(ev, "ts", "v", 21600L,
      Seq("event_type"), locf = true))
    assert(!rs.contains("CartesianProduct"), rs)
    assert(rs.contains("Window"), rs)
    assert(!rs.contains("Window [") || !rs.contains("windowspecdefinition()"), rs)
    // histogram: bounds agg + one keyed count, no window
    val hg = plan(graft.pipeline.Report.histogram(
      docs.select("n_chars"), "n_chars", 20))
    assert(!hg.contains("Window") && !hg.contains("CartesianProduct"), hg)
    // quantile sketch: keyed aggregations only — no window, no sort-merge
    // join, no cartesian; the dense-array scatter is a row-local transform
    val qs = plan(graft.pipeline.Report.quantileSketch(
      docs, "n_chars", 0.0, 640.0, 64, groupCol = Some("lang")))
    assert(!qs.contains("Window") && !qs.contains("CartesianProduct") &&
      !qs.contains("SortMergeJoin"), qs)
    // sketch merge: posexplode + keyed sums — elementwise addition stays
    // parallel (no window, no single-task collect of all sketches, no
    // join); the grid guard rides the same aggregation
    val sk = graft.pipeline.Report.quantileSketch(
      docs, "n_chars", 0.0, 640.0, 64, groupCol = Some("lang"))
    val mg = plan(graft.pipeline.Report.mergeQuantileSketchesByGroup(sk, "lang"))
    assert(!mg.contains("Window") && !mg.contains("CartesianProduct") &&
      !mg.contains("SortMergeJoin"), mg)
    // sketch drift: O(groups·bins) rows through ONE broadcast hash join —
    // the statistics are array folds in a projection, never a shuffle of
    // the corpus, never a window, never a sort-merge join
    val sk2 = graft.pipeline.Report.quantileSketch(
      docs, "n_chars", 0.0, 640.0, 64, groupCol = Some("lang"))
    val dr = plan(graft.pipeline.Report.sketchDriftByGroup(sk, sk2, "lang"))
    assert(dr.contains("BroadcastHashJoin") && !dr.contains("Window") &&
      !dr.contains("SortMergeJoin") && !dr.contains("CartesianProduct"), dr)
    // embedding sketch: dim map-side partial sums in ONE aggregation —
    // no explode (no per-dimension row blow-up), no window, no join
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val es = plan(graft.pipeline.Report.embeddingSketch(
      emb, "embedding", 64, groupCol = Some("label")))
    assert(!es.contains("Generate") && !es.contains("Window") &&
      !es.contains("Join"), es)
    assert(es.contains("partial_sum") || es.contains("HashAggregate"), es)
    // embedding drift: one broadcast join over (dim+stamp)-sized rows
    val eda = graft.pipeline.Report.embeddingSketch(
      emb, "embedding", 64, groupCol = Some("label"))
    val ed = plan(graft.pipeline.Report.embeddingDriftByGroup(eda, eda, "label"))
    assert(ed.contains("BroadcastHashJoin") && !ed.contains("Window") &&
      !ed.contains("SortMergeJoin") && !ed.contains("CartesianProduct"), ed)
  }

  test("round-12 sketches: partial aggs, bounded windows, broadcast probes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // CMS build: the depth-explode must collapse map-side — partial
    // aggregation BEFORE the (r, bucket) exchange, no window, no join
    val cms = plan(graft.pipeline.Sketches.cmsSketch(docs, "text", 4, 1024))
    assert(cms.contains("partial_count"), cms)
    assert(!cms.contains("Window") && !cms.contains("Join"), cms)
    // CMS point queries: the depth-row sketch BROADCASTS onto the probe
    // relation — never a shuffle of the probes against the sketch
    val sk = graft.pipeline.Sketches.cmsSketch(docs, "text", 4, 1024)
    val probes = docs.select(F.col("text")).limit(50)
    val est = plan(graft.pipeline.Sketches.cmsEstimate(sk, probes, "text"))
    assert(est.contains("BroadcastNestedLoopJoin") ||
      est.contains("BroadcastHashJoin"), est)
    assert(!est.contains("SortMergeJoin"), est)
    // KMV grouped build: ONE keyed window over the distinct set (the
    // top-k filter) with map-side WindowGroupLimit pruning — each
    // partition ships at most k rows per group into the window sort —
    // no join, no cartesian; the array assembly is a bounded keyed
    // collect_list after the <= k filter
    val kmv = plan(graft.pipeline.Sketches.kmvSketch(
      docs, "text", 64, groupCol = Some("lang")))
    assert(count(kmv, "Window [") == 1, kmv)
    assert(kmv.contains("WindowGroupLimit"), kmv)
    assert(!kmv.contains("Join") && !kmv.contains("CartesianProduct"), kmv)
    // weighted sample, grouped: row-local priorities + one keyed window,
    // again WindowGroupLimit-pruned map-side
    val ws = plan(graft.pipeline.Sketches.weightedSample(
      docs.select("doc_id", "lang", "n_chars"), "doc_id", "n_chars", 5,
      groupCol = Some("lang")))
    assert(count(ws, "Window [") == 1 && !ws.contains("Join"), ws)
    assert(ws.contains("WindowGroupLimit"), ws)
    // weighted sample, global: TakeOrderedAndProject, never a global sort
    val wg = plan(graft.pipeline.Sketches.weightedSample(
      docs.select("doc_id", "n_chars"), "doc_id", "n_chars", 5))
    assert(wg.contains("TakeOrderedAndProject"), wg)
    assert(!wg.contains("Window"), wg)
  }

  test("bloom probe: filter broadcasts onto the probes, no shuffle, no sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sk = graft.pipeline.Sketches.bloomSketch(docs, "text", 4096, 3)
    val p = plan(graft.pipeline.Sketches.bloomProbe(
      sk, docs.select(F.col("text").as("probe")), "probe"))
    // the one-row filter rides a broadcast nested-loop (trivial side);
    // the probe corpus is never exchanged or sorted
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly the sketch build's SHUFFLES; the probe side adds only the
    // broadcast of the one-row filter, never a repartition of the probes
    def shuffles(s: String) = count(s, "Exchange") - count(s, "BroadcastExchange")
    assert(shuffles(p) == shuffles(plan(sk)), p)
  }

  test("skew diagnostics: map-side combined count, top slice never a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.operators.SkewDiag.skewTopKeys(docs, "lang", 3))
    assert(p.contains("partial_count") || p.contains("partial count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val ps = plan(graft.operators.SkewDiag.skewStats(docs, "lang", 4))
    assert(ps.contains("TakeOrderedAndProject"), ps)
    assert(!ps.contains("Sort ["), ps) // no global sort anywhere
  }

  test("round-13 ops: map-side keyword ranks, broadcast FK parents, partial corr aggs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // TF-IDF ranks ride the map-side WindowGroupLimit path (k rows per
    // group per partition cross the shuffle, not the postings relation)
    val pk = plan(graft.pipeline.Retrieval.tfidfKeywords(docs, "text", "doc_id", 5))
    assert(pk.contains("WindowGroupLimit") && pk.contains("Partial"), pk)
    // FK orphan check: the DISTINCT parent-key side broadcasts
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ords = spark.read.parquet(s"$sf/orders.parquet")
    val pf = plan(graft.dq.Dq.fkOrphans(li, "l_orderkey", ords,
      "o_orderkey", "t"))
    assert(pf.contains("BroadcastHashJoin"), pf)
    // grouped correlation: ONE aggregation (partial then final), the
    // finishing algebra rides the projection — no second shuffle
    val pc = plan(graft.pipeline.Report.corrByGroup(li, "l_returnflag",
      "l_quantity", "l_extendedprice"))
    assert(pc.contains("partial_"), pc)
    assert(!pc.contains("CartesianProduct"), pc)
  }

  test("store partition pruning: partition filter never reaches row scan") {
    // partitioned write + partition-column filter => PartitionFilters
    // carries the predicate and PushedFilters stays empty
    val dir = java.nio.file.Files.createTempDirectory("graft-planspec").toString
    spark.range(100)
      .select((F.col("id") % 4).as("p"), F.col("id").as("v"))
      .write.partitionBy("p").parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t").where(F.col("p") === 2)
    val p = plan(df)
    assert(p.contains("PartitionFilters: [isnotnull(p"), p)
    assert(p.contains("PushedFilters: []"), p)
  }

  test("trend family: pair joins keyed on the group, every window " +
    "partitioned, no cartesian anywhere") {
    def daily = spark.read.parquet(s"$sf/events.parquet")
      .where(F.col("event_type").isNotNull && F.col("ts").isNotNull &&
        F.col("value").isNotNull)
      .groupBy(F.col("event_type").as("etype"),
        F.to_date(F.col("ts")).cast("string").as("day"))
      .agg(F.sum(F.floor(F.col("value") * 64.0 + 0.5).cast("long"))
        .as("rev"), F.count(F.lit(1)).as("cnt"))
      .withColumn("day_num", F.unix_date(F.col("day").cast("date"))
        .cast("long"))
    // a window is group-partitioned iff its spec leads with the group
    // key (windowspecdefinition(td_g#..., ...)) — the bracket-count
    // detector can't tell an order-only window from a partition-only
    // one (both print two groups)
    def unpartitioned(s: String): Seq[String] = s.linesIterator
      .filter(_.contains("Window ["))
      .filterNot(_.contains("windowspecdefinition(td_g#")).toSeq
    // the quadratic Mann–Kendall pair relation joins ON the group key —
    // partitioned across groups, never a cartesian
    val mk = plan(graft.pipeline.Trend.mannKendall(
      daily.withColumn("rev", F.col("rev").cast("double")),
      "etype", "day_num", "rev"))
    assert(!mk.contains("CartesianProduct"), mk.take(2000))
    assert(mk.contains("td_g"), mk.take(1000))
    // ACF lags / changepoint prefixes / rolling frames ride
    // group-partitioned windows only
    for ((name, p) <- Seq(
        "acf" -> plan(graft.pipeline.Trend.acf(
          daily, "etype", "day_num", "rev", 3)),
        "changepoint" -> plan(graft.pipeline.Trend.changepoint(
          daily, "etype", "day_num", "rev")),
        "rollingCorr" -> plan(graft.pipeline.Trend.rollingCorr(
          daily, "etype", "day_num", "rev", "cnt", 7)))) {
      assert(unpartitioned(p).isEmpty,
        s"$name leaked an unpartitioned window:\n" +
          unpartitioned(p).mkString("\n"))
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(1500)}")
    }
  }

  test("mahalanobis: 1-row stats broadcast back, distributed top-k, " +
    "one moments aggregation") {
    val per = spark.read.parquet(s"$sf/events.parquet")
      .where(F.col("user_id").isNotNull && F.col("value").isNotNull)
      .groupBy(F.col("user_id"))
      .agg(F.count(F.lit(1)).cast("double").as("x"),
        F.sum(F.col("value")).as("y"))
    val p = plan(graft.pipeline.Report.mahalanobisOutliers2(
      per, "user_id", "x", "y", k = 20))
    // the stats side joins as a broadcast (nested-loop on a 1-row
    // relation), and the top-k is TakeOrderedAndProject — k rows per
    // partition then k at the driver, never a global sort
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("GlobalLimit"), p.take(2000))
  }

  test("rankEval fixture: the per-query top-k filter plans as a " +
    "WindowGroupLimit (map-side k-pruning before the shuffle)") {
    import org.apache.spark.sql.expressions.Window
    val perUser = spark.read.parquet(s"$sf/events.parquet")
      .where(F.col("event_type").isNotNull && F.col("user_id").isNotNull)
      .groupBy(F.col("event_type").as("q"), F.col("user_id"))
      .agg(F.count(F.lit(1)).as("rev"))
    val w = Window.partitionBy(F.col("q"))
      .orderBy(F.col("rev").desc, F.col("user_id").asc)
    val top = perUser.withColumn("pos", F.row_number().over(w).cast("long"))
      .where(F.col("pos") <= 10L)
    assert(plan(top).contains("WindowGroupLimit"), plan(top).take(2000))
  }

  test("cuped: ONE corpus scan feeds the 6-sum pass — the adjusted " +
    "moments never re-read the data") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
        .as("variant"), F.col("value").cast("double").as("metric"),
        (F.col("value") * 0.5d).as("covariate"))
    val p = plan(graft.pipeline.Report.cupedT(ev, "variant", "metric",
      "covariate"))
    assert(count(p, "Scan parquet") == 1, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mantel-haenszel: one corpus scan, keyed cell agg, no " +
    "unpartitioned window, no product join") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.col("event_type").as("stratum"),
        F.when(F.col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"), (F.col("value") > 34.0d).as("conv"))
    val p = plan(graft.pipeline.Report.mantelHaenszel(ev, "stratum",
      "variant", "conv"))
    assert(count(p, "Scan parquet") == 1, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("ols trend: one keyed 6-sum pass over the grid, no window at all") {
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(F.col("event_type").as("etype"),
        F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"))
      .agg(F.count(F.lit(1)).cast("double").as("cnt"))
    val p = plan(graft.pipeline.Trend.olsByGroup(daily, "etype",
      "day_num", "cnt"))
    assert(count(p, "Scan parquet") == 1, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sprt: the only windows are group-partitioned prefix sums") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(F.col("event_type").as("etype"),
        F.unix_date(F.to_date(F.col("ts"))).cast("long").as("day_num"),
        (F.col("value") > 34.0d).as("conv"))
    val df = graft.pipeline.Report.sprtBernoulli(ev, "etype", "day_num",
      "conv", p0 = 0.45d, p1 = 0.55d)
    val winSpecs = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec
    }
    assert(winSpecs.nonEmpty && winSpecs.forall(_.nonEmpty),
      s"unpartitioned window in sprt: $winSpecs")
  }

  test("link prediction: pair generation joins on the shared neighbor " +
    "(never a product), existing edges leave via anti-join") {
    val ed = spark.read.parquet(s"$sf/events.parquet")
      .select(F.col("user_id").cast("string").as("src"),
        F.col("event_type").as("dst"))
    val df = graft.pipeline.GraphRank.linkPrediction(ed, "src", "dst",
      k = 10, maxHubDegree = 50L)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p)
  }
}
