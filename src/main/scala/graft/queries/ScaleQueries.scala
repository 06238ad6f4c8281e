package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.{Expr, TableFrame}
import graft.operators.{AsofJoin, RangeJoin, Rolling, SeriesOps}

/** Gate queries for the beyond-surface scale operators (as-of join, range
  * join, rolling/dynamic group-by, unpivot, row index, interpolate,
  * per-group top-k, merge_sorted, approx distinct). */
object ScaleQueries {
  private def t(s: SparkSession, dir: String, name: String): TableFrame =
    Tables.frame(s, dir, name)
  private def d(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // engineered signals for the trainable quality model (q_quality_lr*):
  // scaled length + token count, is-English label — every expression
  // stated identically by the DuckDB oracle
  private def lrFeatures(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "documents")
      .where(F.col("n_chars").isNotNull && F.col("text").isNotNull &&
        F.col("lang").isNotNull)
      .select(F.col("doc_id"),
        (F.col("n_chars").cast("double") / 1000.0d).as("x1"),
        (F.size(F.filter(
          F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
          t => t =!= "")).cast("double") / 100.0d).as("x2"),
        F.when(F.col("lang") === "en", 1.0d).otherwise(0.0d).as("y"))

  // purchases deduped to one row per (user_id, sec) so as-of tie-breaking
  // is well-defined on both engines
  private def purchases(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "events")
      .filter(F.col("event_type") === "purchase")
      .withColumn("sec", F.col("ts").cast(LongType))
      .groupBy("user_id", "sec")
      .agg(F.max("value").as("purchase_value"))

  private def eventsSec(s: SparkSession, dir: String): DataFrame =
    d(s, dir, "events")
      .withColumn("sec", F.col("ts").cast(LongType))
      .select("event_id", "user_id", "sec")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof" -> ((s, dir) => {
      AsofJoin.asofJoin(eventsSec(s, dir), purchases(s, dir),
          on = "sec", by = Seq("user_id"), strategy = "backward")
        .select("event_id", "purchase_value")
        .orderBy("event_id")
    }),
    "q_join_asof_fwd" -> ((s, dir) => {
      AsofJoin.asofJoin(eventsSec(s, dir), purchases(s, dir),
          on = "sec", by = Seq("user_id"), strategy = "forward",
          toleranceMax = Some(3600L))
        .select("event_id", "purchase_value")
        .orderBy("event_id")
    }),
    "q_range_join" -> ((s, dir) => {
      val bands = d(s, dir, "customer")
        .filter(F.col("c_custkey") <= 50 && F.col("c_acctbal") > 0)
        .select(F.col("c_custkey"),
          (F.col("c_acctbal") * 10).as("lo"),
          (F.col("c_acctbal") * 10 + 5000).as("hi"))
      RangeJoin.rangeJoin(d(s, dir, "orders"), "o_totalprice",
          bands, "lo", "hi", bucketWidth = 5000L, by = Nil)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("price_sum"))
        .orderBy("c_custkey")
    }),
    "q_resample" -> ((s, dir) => {
      // gap-filled 6-hour grid per event type with LOCF sums (value
      // floored to long so per-bucket sums are order-exact vs the oracle)
      val ev = d(s, dir, "events")
        .withColumn("v", F.floor(F.col("value")).cast(LongType))
      graft.operators.SeriesOps.resample(ev, "ts", "v",
          stepSeconds = 21600L, keys = Seq("event_type"), locf = true)
        .orderBy("event_type", "bucket_epoch")
    }),
    "q_rolling" -> ((s, dir) => {
      Rolling.rolling(
          d(s, dir, "events").withColumn("sec", F.col("ts").cast(LongType)),
          indexCol = "sec", period = 3600L, by = Seq("user_id"),
          valueCol = "value",
          aggs = Map(
            "n" -> ((_, w) => F.count(F.lit(1)).over(w)),
            "value_sum" -> ((c, w) =>
              F.sum(c.cast(DecimalType(18, 4))).over(w).cast(DoubleType))))
        .select("event_id", "n", "value_sum")
        .orderBy("event_id")
    }),
    "q_group_dynamic" -> ((s, dir) => {
      Rolling.groupByDynamic(
          d(s, dir, "events").withColumn("sec", F.col("ts").cast(LongType)),
          indexCol = "sec", every = 900L, by = Seq("event_type"),
          aggs = Seq(F.count(F.lit(1)).as("n"),
            F.sum(F.col("value").cast(DecimalType(18, 4)))
              .cast(DoubleType).as("value_sum")))
        .orderBy("event_type", "bucket_start")
    }),
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .with_columns("p_size_d" -> Expr(F.col("p_size").cast(DoubleType)))
        .unpivot(ids = Seq("p_partkey"), values = Seq("p_size_d", "p_retailprice"))
        .sort(Seq("p_partkey", "variable")).df
    }),
    "q_row_index" -> ((s, dir) => {
      SeriesOps.withRowIndex(
          d(s, dir, "customer").select("c_custkey", "c_acctbal"),
          orderBy = Seq("c_acctbal", "c_custkey"), as = "idx")
        .select("c_custkey", "idx")
        .orderBy("c_custkey")
    }),
    "q_interpolate" -> ((s, dir) => {
      val e = d(s, dir, "events")
        .withColumn("v",
          F.when(F.col("event_type") === "view", F.lit(null).cast(DoubleType))
            .otherwise(F.col("value")))
      SeriesOps.interpolate(e, "v", "event_id", by = Seq("user_id"), as = Some("vi"))
        .select("event_id", "vi")
        .orderBy("event_id")
    }),
    "q_pivot" -> ((s, dir) => {
      // wide pivot with EXPLICIT values: no value-discovery job, plan and
      // output schema are static — the form that scales (a discovery pivot
      // collects the distinct values to the driver first)
      d(s, dir, "orders").groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderstatus")
    }),
    "q_skew_join" -> ((s, dir) => {
      // salted equi-join on a 5-value hot key: the salt spreads each hot
      // key over `saltFactor` reducers, and because the right side is
      // exploded across every salt, the JOIN RESULT is salt-independent —
      // which is what makes this oracle-checkable against a plain join
      val orders = d(s, dir, "orders")
      val dim = orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("n_orders"))
      graft.operators.SkewJoin.saltedJoin(orders, dim,
          Seq("o_orderpriority"), "inner", saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).as("n"), F.max("n_orders").as("n_orders"))
        .orderBy("o_orderpriority")
    }),
    "q_exact_quantiles" -> ((s, dir) => {
      // EXACT order-statistic quantiles of the document length
      // distribution — one range shuffle, no single-reducer sort, no
      // percentile_approx error; the oracle states the same k = ceil(q·n)
      // definition as an explicit row_number query
      graft.operators.Quantiles.exactQuantiles(
          d(s, dir, "documents"), "n_chars",
          qs = Seq(0.25, 0.5, 0.9, 0.95, 0.99),
          tiebreakers = Seq("doc_id"))
        .orderBy("q")
    }),
    "q_robust_z" -> ((s, dir) => {
      // (x - median)/MAD standardization; zero-MAD guard yields NULL
      graft.operators.Quantiles.robustZ(
          d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
          tiebreakers = Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "q_transition_matrix" -> ((s, dir) => {
      // Markov view of the event stream: consecutive event-type pairs
      graft.operators.Funnel.transitionMatrix(d(s, dir, "events"),
          "user_id", "ts", "event_type", tiebreaker = "event_id")
        .orderBy("from_type", "to_type")
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohort x week-offset retention grid
      graft.operators.Funnel.cohortRetention(d(s, dir, "events"),
          "user_id", "ts")
        .orderBy("cohort_epoch", "week_offset")
    }),
    "q_funnel" -> ((s, dir) => {
      // ordered conversion funnel: signup -> view -> click -> purchase
      graft.operators.Funnel.funnel(d(s, dir, "events"), "user_id", "ts",
          "event_type", Seq("signup", "view", "click", "purchase"))
        .orderBy("step")
    }),
    "q_median_mad" -> ((s, dir) => {
      // robust (location, scale): exact median + exact MAD in one row
      graft.operators.Quantiles.medianMad(
        d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
        tiebreakers = Seq("doc_id"))
    }),
    "q_winsorize" -> ((s, dir) => {
      // clip document lengths into their exact [p05, p95] order-statistic
      // window; bounds broadcast, clip row-local
      graft.operators.Quantiles.winsorize(
          d(s, dir, "documents").select("doc_id", "n_chars"), "n_chars",
          pLo = 0.05, pHi = 0.95, tiebreakers = Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "q_winsorize_grouped" -> ((s, dir) => {
      // per-LANGUAGE clipping: each lang's lengths clip into that lang's
      // own exact [p10, p90] window (a global window would let one
      // verbose language's tail define every other's); per-group bounds
      // broadcast, clip row-local
      graft.operators.Quantiles.winsorizeByGroup(
          d(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "n_chars", pLo = 0.1, pHi = 0.9,
          tiebreakers = Seq("doc_id"))
        .orderBy("doc_id")
    }),
    "q_select_budget" -> ((s, dir) => {
      // token-budget corpus selection: fill a 100k-char training budget
      // from the longest documents down (n_chars doubles as the
      // deterministic quality score here) — the greedy step after any
      // quality scorer; cum is the distributed running total
      graft.operators.RunningSum.selectByBudget(
          d(s, dir, "documents").select("doc_id", "n_chars"),
          order = Seq(F.col("n_chars").desc, F.col("doc_id").asc),
          costCol = "n_chars", budget = 100000L)
        .orderBy(F.col("cum"))
    }),
    "q_select_budget_group" -> ((s, dir) => {
      // per-language token budgets: every lang independently fills 30k
      // chars from its longest documents down — keyed windows, groups
      // fill in parallel
      graft.operators.RunningSum.selectByBudgetPerGroup(
          d(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", order = Seq(F.col("n_chars").desc, F.col("doc_id").asc),
          costCol = "n_chars", budget = 30000L)
        .orderBy("lang", "cum")
    }),
    "q_group_quantiles" -> ((s, dir) => {
      // per-language exact length percentiles (dataset-card stats):
      // keyed windows rank groups in parallel, same order-statistic
      // definition as q_exact_quantiles
      graft.operators.Quantiles.exactQuantilesByGroup(
          d(s, dir, "documents"), "lang", "n_chars",
          qs = Seq(0.5, 0.9, 0.99), tiebreakers = Seq("doc_id"))
        .orderBy("lang", "q")
    }),
    "q_join_bucketed" -> ((s, dir) => {
      // both sides written bucketBy(8, custkey) into the session catalog,
      // then joined WITHOUT any exchange (PlanSpec asserts zero Exchange
      // operators) — pay the shuffle once at write time, never per join.
      // The RESULT is an ordinary equi-join, so the gate hash-matches a
      // plain SQL oracle; value sums in exact integer cents.
      val orders = d(s, dir, "orders")
        .select(F.col("o_custkey"),
          F.floor(F.col("o_totalprice") * 100).cast(LongType).as("cents"))
      val cust = d(s, dir, "customer").select("c_custkey", "c_mktsegment")
      graft.operators.Bucketing.writeBucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "graft_bkt_orders", buckets = 8, keys = Seq("custkey"))
      graft.operators.Bucketing.writeBucketed(
        cust.withColumnRenamed("c_custkey", "custkey"),
        "graft_bkt_customer", buckets = 8, keys = Seq("custkey"))
      graft.operators.Bucketing.bucketedJoin(s,
          "graft_bkt_orders", "graft_bkt_customer", Seq("custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).as("n_orders"), F.sum("cents").as("cents"))
        .orderBy("c_mktsegment")
    }),
    "q_topk_group" -> ((s, dir) => {
      SeriesOps.topKPerGroup(d(s, dir, "orders"),
          by = Seq("o_orderstatus"), orderCol = "o_totalprice", k = 3,
          descending = true, tiebreakers = Seq("o_orderkey"))
        .select(F.col("o_orderstatus"), F.col("rk").cast(LongType).as("rk"),
          F.col("o_orderkey"), F.col("o_totalprice"))
        .orderBy("o_orderstatus", "rk")
    }),
    "q_merge_sorted" -> ((s, dir) => {
      val c = t(s, dir, "customer").selectCols("c_custkey", "c_acctbal")
      val a = c.filter(Expr(F.col("c_custkey") % 2 === 0))
      val b = c.filter(Expr(F.col("c_custkey") % 2 === 1))
      a.merge_sorted(b, "c_acctbal")
        .sort(Seq("c_acctbal", "c_custkey")).df
    }),
    // rows-only gate: the HLL estimate is engine-specific; PipelineSpec
    // bounds its error against the exact count
    "q_approx_nunique" -> ((s, dir) => {
      t(s, dir, "lineitem").approx_n_unique("l_partkey").df
    }),
    "q_group_quantiles_hot" -> ((s, dir) => {
      // the same per-group order statistics as q_group_quantiles, but with
      // hotGroupThreshold forced low so EVERY language routes through the
      // ScalableRank global fallback — the skew path must be bit-identical
      // to the keyed-window plan (and to the SQL definition)
      graft.operators.Quantiles.exactQuantilesByGroup(
          d(s, dir, "documents"), "lang", "n_chars",
          qs = Seq(0.5, 0.9, 0.99), tiebreakers = Seq("doc_id"),
          hotGroupThreshold = 100L)
        .orderBy("lang", "q")
    }),
    "q_quantile_sketch" -> ((s, dir) => {
      // mergeable quantile sketch END TO END: two half-corpus sketches
      // (fixed 64-cell grid over [0, 640), stamped into the rows) merged
      // ELEMENTWISE under the stamp-identity guard, then quantiles
      // answered from the merged counts reading the grid FROM the sketch
      // — the oracle states the same deterministic binning + cumulative
      // walk over the WHOLE corpus, so the gate also proves
      // merge(a, b) == sketch(a ∪ b)
      import graft.pipeline.Report
      val docs = d(s, dir, "documents").select("doc_id", "n_chars")
      val a = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 0), "n_chars", 0.0, 640.0, 64)
      val b = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 1), "n_chars", 0.0, 640.0, 64)
      val merged = Report.mergeQuantileSketches(a.unionByName(b))
      Report.sketchQuantiles(merged, Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }),
    "q_log_quantile_sketch" -> ((s, dir) => {
      // RELATIVE-error mergeable quantiles: the same merge-equals-whole
      // proof as q_quantile_sketch but on the LOG grid — 64 cells
      // equi-width in ln(x) over [1, 1024), so every answer is within a
      // factor 1024^(1/64) ≈ 1.11 of the exact order statistic at ANY
      // magnitude (the right sketch for heavy-tailed lengths, where a
      // linear grid wastes its cells on the bulk). The stamp carries
      // ln-space bounds + scale="log", so the merge guard separates it
      // from linear sketches, and the decode rides the libm-consistent
      // exp kernel — DuckDB states the identical cell edge.
      import graft.pipeline.Report
      val docs = d(s, dir, "documents").select("doc_id", "n_chars")
      val a = Report.logQuantileSketch(
        docs.where(F.col("doc_id") % 2 === 0), "n_chars", 1.0, 1024.0, 64)
      val b = Report.logQuantileSketch(
        docs.where(F.col("doc_id") % 2 === 1), "n_chars", 1.0, 1024.0, 64)
      val merged = Report.mergeQuantileSketches(a.unionByName(b))
      Report.sketchQuantiles(merged, Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }),
    "q_quantile_sketch_grouped" -> ((s, dir) => {
      // the sketch family PER SLICE, end to end: per-language sketches of
      // two corpus halves (same stamped grid), merged elementwise BY GROUP
      // under the per-group stamp guard, then per-language quantiles
      // answered from the merged counts — the dataset-card
      // per-slice-length roll-up across stored versions, zero data rescan
      // at merge time. Oracle: the same binning + per-language cumulative
      // walk over the whole corpus, proving
      // mergeByGroup(a, b) == sketch(a ∪ b) for every group.
      import graft.pipeline.Report
      val docs = d(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val a = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 0), "n_chars", 0.0, 640.0, 64,
        groupCol = Some("lang"))
      val b = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 1), "n_chars", 0.0, 640.0, 64,
        groupCol = Some("lang"))
      val merged = Report.mergeQuantileSketchesByGroup(
        a.unionByName(b), "lang")
      Report.sketchQuantilesByGroup(merged, "lang", Seq(0.5, 0.95))
        .orderBy("lang", "q")
    }),
    "q_distribution_drift" -> ((s, dir) => {
      // distribution drift STRAIGHT FROM STAMPED SKETCHES: PSI + KS + TVD
      // between the purchase-value and click-value distributions, answered
      // from two (bins+2)-cell sketch rows with zero data rescan — the
      // "did the new crawl shift my corpus?" check of every dataset
      // release. The oracle states the identical binning, Jeffreys
      // smoothing, libm ln, and bin-ordered folds over the whole table.
      import graft.pipeline.Report
      val ev = d(s, dir, "events").select("event_type", "value")
      val a = Report.quantileSketch(
        ev.where(F.col("event_type") === "purchase"), "value", 0.0, 512.0, 64)
      val b = Report.quantileSketch(
        ev.where(F.col("event_type") === "click"), "value", 0.0, 512.0, 64)
      Report.sketchDrift(a, b)
    }),
    "q_distribution_drift_grouped" -> ((s, dir) => {
      // per-slice drift: per-language PSI/KS/TVD of document length
      // between the two corpus halves (even vs odd doc_id) — the
      // per-language version-over-version drift row of a dataset card,
      // computed from per-group stamped sketches via one broadcast join.
      import graft.pipeline.Report
      val docs = d(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val a = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 0), "n_chars", 0.0, 640.0, 64,
        groupCol = Some("lang"))
      val b = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 1), "n_chars", 0.0, 640.0, 64,
        groupCol = Some("lang"))
      Report.sketchDriftByGroup(a, b, "lang").orderBy("lang")
    }),
    "q_moment_sketch" -> ((s, dir) => {
      // the mean/std/range dataset-card row THROUGH THE EXACT MERGE:
      // per-event-type moment sketches of two halves (fixed-point Σx/Σx²
      // as DECIMAL(38,0), min/max as codes), merged by group, decoded by
      // momentStats — integer algebra makes merge == whole bit-exact, so
      // the oracle states identical arithmetic over the raw table
      import graft.pipeline.Report
      val ev = d(s, dir, "events").select("event_id", "event_type", "value")
      def half(m: Int) = Report.momentSketch(
        ev.where(F.col("event_id") % 2 === m), "value",
        groupCol = Some("event_type"))
      val merged = Report.mergeMomentSketchesByGroup(
        half(0).unionByName(half(1)), "event_type")
      Report.momentStats(merged, keyCols = Seq("event_type"))
        .orderBy("event_type")
    }),
    "q_sketch_jsd" -> ((s, dir) => {
      // symmetric bounded drift between the corpus halves' length
      // sketches: Jensen-Shannon divergence straight off the persisted
      // cell arrays — no smoothing (0·ln0 = 0), 0 <= jsd <= ln 2, the
      // always-finite companion of q_sketch_drift's PSI
      import graft.pipeline.Report
      val docs = d(s, dir, "documents").select("doc_id", "n_chars")
      val a = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 0), "n_chars", 0.0, 640.0, 64)
      val b = Report.quantileSketch(
        docs.where(F.col("doc_id") % 2 === 1), "n_chars", 0.0, 640.0, 64)
      Report.sketchJsd(a, b)
    }),
    "q_stream_jsd_monitor" -> ((s, dir) => {
      // live distribution monitoring with the BOUNDED statistic: each
      // hourly window's sketch scored against the whole-corpus baseline
      // by Jensen-Shannon divergence (one broadcast baseline row, zero
      // rescans) — "which hours drifted, and by how much, on a 0..ln 2
      // scale"; the oracle replays every hour's cells + the fold
      import graft.pipeline.Report
      val (tmp, schema) = graft.streaming.StreamStage.stage(s,
        s"$dir/events", t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val cells = graft.streaming.Streams.windowedQuantileSketch(
        stream, "ts", "value", "1 hour", "1 hour", 0.0, 512.0, 64)
      val rows = graft.streaming.StreamStage.runToMemory(cells,
          "q_stream_jsdm_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("bin"), F.col("n"))
      val perWindow = Report.binsToSketch(rows, 0.0, 512.0, 64,
        groupCols = Seq("hour_epoch"))
      val baseline = Report.quantileSketch(
        d(s, dir, "events"), "value", 0.0, 512.0, 64)
      Report.sketchJsdVsBaseline(perWindow, baseline, "hour_epoch")
        .orderBy(F.col("hour_epoch").asc)
    }),
    "q_stream_quantiles" -> ((s, dir) => {
      // live percentiles THROUGH Structured Streaming: hourly sparse
      // log-grid sketch cells (the exact batch cell contract), windows
      // assembled into stamped sketches and rolled up through the
      // elementwise merge — integer cells make the union of the windows
      // BIT-EQUAL to the whole-corpus log sketch, so the oracle states
      // one corpus-wide binning + cumulative walk, no windows at all
      import graft.pipeline.Report
      val (tmp, schema) = graft.streaming.StreamStage.stage(s,
        s"$dir/events", t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val cells = graft.streaming.Streams.windowedQuantileSketch(
        stream, "ts", "value", "1 hour", "1 hour", 1.0, 1024.0, 64,
        scale = "log")
      val rows = graft.streaming.StreamStage.runToMemory(cells,
          "q_stream_quantiles_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("bin"), F.col("n"))
      val perWindow = Report.binsToSketch(rows, java.lang.Math.log(1.0),
        java.lang.Math.log(1024.0), 64, groupCols = Seq("hour_epoch"),
        scale = "log")
      val merged = Report.mergeQuantileSketches(perWindow)
      Report.sketchQuantiles(merged, Seq(0.5, 0.9, 0.99))
        .orderBy(F.col("q").asc)
    }),
    "q_stream_moments" -> ((s, dir) => {
      // live mean/std/range monitoring THROUGH Structured Streaming:
      // hourly fixed-point moment sketches (the exact batch encoding, so
      // every window row merges with stored history), decoded per hour
      import graft.pipeline.Report
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val wm = graft.streaming.Streams.windowedMoments(
        stream, "ts", "value", "1 hour", "1 hour")
      val rows = graft.streaming.StreamStage.runToMemory(wm,
          "q_stream_moments_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("n"), F.col("sx"), F.col("sxx"), F.col("mn"), F.col("mx"),
          F.col("scale_bits"))
      Report.momentStats(rows, keyCols = Seq("hour_epoch"))
        .orderBy("hour_epoch")
    }),
    "q_embedding_drift" -> ((s, dir) => {
      // embedding-space drift THROUGH THE EXACT MERGE ALGEBRA: quarter
      // sketches (fixed-point per-dimension sums) merged into halves,
      // then cosine-of-means / L2 / max-dim shift between the halves —
      // integer sums make merge == whole bit-exact, so the oracle can
      // state the identical arithmetic from the raw table
      import graft.pipeline.Report
      val emb = d(s, dir, "embeddings").select("vec_id", "embedding")
      def quarter(m: Int) = Report.embeddingSketch(
        emb.where(F.col("vec_id") % 4 === m), "embedding", 64)
      val a = Report.mergeEmbeddingSketches(quarter(0).unionByName(quarter(2)))
      val b = Report.mergeEmbeddingSketches(quarter(1).unionByName(quarter(3)))
      Report.embeddingDrift(a, b)
    }),
    "q_embedding_drift_grouped" -> ((s, dir) => {
      // per-label centroid drift between the two corpus halves — the
      // per-slice "did my clusters move?" row of an embedding release
      import graft.pipeline.Report
      val emb = d(s, dir, "embeddings")
      def half(m: Int) = Report.embeddingSketch(
        emb.where(F.col("vec_id") % 2 === m), "embedding", 64,
        groupCol = Some("label"))
      Report.embeddingDriftByGroup(half(0), half(1), "label")
        .orderBy("label")
    }),
    "q_jdbc_partitioned" -> ((s, dir) => {
      // the warehouse-ingest fan-out END TO END: seed an embedded Derby
      // database (the same engine the vendor-twin specs ride) from the
      // customer table, then read it back through the PARTITIONED JDBC
      // source — partitionColumn/lowerBound/upperBound/numPartitions
      // stride scans, one cursor per executor slot instead of a single
      // cursor pulling everything (the shape every 100 TB warehouse
      // extract depends on). The result is the plain relational subset
      // the oracle states from parquet.
      val db = java.nio.file.Files
        .createTempDirectory("graft-gate-jdbc").toString + "/db"
      val url = s"jdbc:derby:$db;create=true"
      val cust = d(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .where(F.col("c_custkey") <= 1200)
      graft.sources.JdbcSink(url, "cust", mode = "append").write(cust)
      graft.sources.JdbcSource(url,
          Seq("""SELECT "c_custkey", "c_mktsegment", "c_acctbal" FROM cust"""),
          properties = Map(
            "partitionColumn" -> "c_custkey", "lowerBound" -> "0",
            "upperBound" -> "1201", "numPartitions" -> "4"))
        .load(s, Map.empty).head
        .orderBy("c_custkey")
    }),
    "q_export_pruned_partitioned" -> ((s, dir) => {
      // the round-11 export path END TO END: sharded jsonl export
      // partitioned by lang and range-sorted by doc_id (zone-map
      // manifest + schema stamp), then a manifest-pruned read of one
      // doc_id range — partition columns recovered via basePath, schema
      // pinned from the O(1) stamp (no inference scan). The zone map is
      // shard-granular, so an exact range filter tightens to the oracle's
      // BETWEEN; the result is the plain relational subset.
      val docs = d(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val out = java.nio.file.Files
        .createTempDirectory("graft-gate-export").toString + "/corpus"
      graft.pipeline.Export.writeSharded(docs, out, format = "jsonl",
        maxRecordsPerFile = 100L, partitionBy = Seq("lang"),
        sortBy = Seq("doc_id"))
      graft.pipeline.Export.readPruned(s, out, "jsonl",
          "doc_id", 100L, 299L)
        .where(F.col("doc_id").between(100L, 299L))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),
    "q_kmv_sketch" -> ((s, dir) => {
      // bottom-k distinct sketch END TO END: two half-corpus KMV
      // sketches of the distinct text set (k = 256 md5-smallest hashes,
      // kept with their keys), merged under the k-stamp guard, then the
      // classic (k−1)/u(h_k) estimator — determinism makes
      // merge(a, b) == sketch(a ∪ b) exact, so the oracle states the
      // same bottom-k + estimator over the WHOLE corpus
      import graft.pipeline.Sketches
      val docs = d(s, dir, "documents").select("doc_id", "text")
      def half(m: Int) = Sketches.kmvSketch(
        docs.where(F.col("doc_id") % 2 === m), "text", 256)
      val merged = Sketches.mergeKmvSketches(half(0).unionByName(half(1)))
      Sketches.kmvEstimate(merged)
    }),
    "q_kmv_sketch_grouped" -> ((s, dir) => {
      // the distinct sketch PER SLICE: per-language bottom-32 sketches
      // of the two corpus halves, merged by group, estimated per
      // language — the per-slice distinct-docs row of a dataset card
      // with zero rescan at merge time
      import graft.pipeline.Sketches
      val docs = d(s, dir, "documents").select("doc_id", "lang", "text")
      def half(m: Int) = Sketches.kmvSketch(
        docs.where(F.col("doc_id") % 2 === m), "text", 32,
        groupCol = Some("lang"))
      val merged = Sketches.mergeKmvSketchesByGroup(
        half(0).unionByName(half(1)), "lang")
      Sketches.kmvEstimate(merged, keyCols = Seq("lang")).orderBy("lang")
    }),
    "q_kmv_jaccard" -> ((s, dir) => {
      // set similarity FROM SKETCHES ALONE: vocabulary overlap between
      // the even and odd corpus halves — bottom-256 sketches of each
      // half's distinct token set, then the KMV Jaccard estimator over
      // the union's bottom-k (deterministic, so the estimator itself is
      // the oracle relation, not just its expectation)
      import graft.pipeline.Sketches
      val toks = d(s, dir, "documents").select(F.col("doc_id"),
        F.explode(F.filter(
          F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
          t => t =!= "")).as("tok"))
      def half(m: Int) = Sketches.kmvSketch(
        toks.where(F.col("doc_id") % 2 === m), "tok", 256)
      Sketches.kmvJaccard(half(0), half(1))
    }),
    "q_kmv_setops" -> ((s, dir) => {
      // FULL set algebra from two sketches alone: |A∪B| from the union's
      // bottom-k k-th hash, |A∩B| = jaccard · |A∪B|, |A\B| = |A| − |A∩B|
      // with |A| from a's own sketch — the contamination-triage numbers
      // (how much eval vocabulary is inside train?) without ever joining
      // the corpora. Deterministic md5 order makes the estimATOR the
      // oracle relation, not just its expectation.
      import graft.pipeline.Sketches
      val toks = d(s, dir, "documents").select(F.col("doc_id"),
        F.explode(F.filter(
          F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
          t => t =!= "")).as("tok"))
      def half(m: Int) = Sketches.kmvSketch(
        toks.where(F.col("doc_id") % 2 === m), "tok", 256)
      Sketches.kmvSetOps(half(0), half(1))
    }),
    "q_bloom_filter" -> ((s, dir) => {
      // deterministic Bloom membership END TO END: two half-corpus
      // filters (m = 4096 bits, k = 3 md5 positions), OR-merged under
      // the (m, k) stamp guard, probed with every fifth document's text
      // plus 200 never-inserted keys — no false negatives by
      // construction, and the false-positive PATTERN is deterministic,
      // so the oracle states the identical member bit for every probe
      import graft.pipeline.Sketches
      val docs = d(s, dir, "documents").select("doc_id", "text")
      def half(m: Int) = Sketches.bloomSketch(
        docs.where(F.col("doc_id") % 2 === m), "text", 4096, 3)
      val merged = Sketches.mergeBloomSketches(
        half(0).unionByName(half(1)))
      val present = docs.where(F.col("doc_id") % 5 === 0)
        .where(F.col("text").isNotNull)
        .select(F.col("text").as("probe")).distinct()
      val absent = s.range(200).select(
        F.concat(F.lit("absent:"), F.col("id").cast("string")).as("probe"))
      Sketches.bloomProbe(merged, present.unionByName(absent), "probe")
        .orderBy("probe")
    }),
    "q_bloom_estimate" -> ((s, dir) => {
      // cardinality FROM THE FILTER's fill ratio: X set bits in the
      // merged filter estimate n̂ = −(m/k)·ln(1 − X/m) (Swamidass &
      // Baldi 2007) — the free distinct-count a membership index already
      // paid for; libm ln keeps the double engine-portable
      import graft.pipeline.Sketches
      val docs = d(s, dir, "documents").select("doc_id", "text")
      def half(m: Int) = Sketches.bloomSketch(
        docs.where(F.col("doc_id") % 2 === m), "text", 4096, 3)
      Sketches.bloomEstimate(Sketches.mergeBloomSketches(
        half(0).unionByName(half(1))))
    }),
    "q_quality_lr" -> ((s, dir) => {
      // model-based quality filtering, TRAINED IN-ENGINE: 3 full-batch
      // GD iterations of logistic regression on engineered signals
      // (scaled length, token count) vs an is-English label — gradient
      // sums in fixed point, so the whole trajectory is deterministic
      // and the oracle replays it iteration for iteration in SQL
      import graft.pipeline.QualityModel
      import s.implicits._
      val w = QualityModel.trainLogistic(
        lrFeatures(s, dir), Seq("x1", "x2"), "y", iters = 3, lr = 1.0)
      Seq((w(0), w(1), w(2))).toDF("w0", "w1", "w2")
    }),
    "q_quality_lr_scores" -> ((s, dir) => {
      // the trained model applied corpus-wide (row-local codegen
      // arithmetic, zero shuffles): the ten most English-looking docs
      import graft.pipeline.QualityModel
      val feat = lrFeatures(s, dir)
      val w = QualityModel.trainLogistic(
        feat, Seq("x1", "x2"), "y", iters = 3, lr = 1.0)
      QualityModel.scoreLogistic(feat, Seq("x1", "x2"), w.toSeq)
        .select(F.col("doc_id"), F.col("score"))
        .orderBy(F.col("score").desc, F.col("doc_id").asc)
        .limit(10)
    }),
    "q_quality_auc" -> ((s, dir) => {
      // exact ROC AUC by rank statistics (Mann–Whitney, midrank ties):
      // does raw length predict English? — integer algebra until one
      // final double division, ranks from the range-shuffle rank
      import graft.pipeline.QualityModel
      val docs = d(s, dir, "documents")
        .where(F.col("n_chars").isNotNull && F.col("lang").isNotNull)
        .select(F.col("n_chars").cast("double").as("s"),
          F.when(F.col("lang") === "en", 1).otherwise(0).as("y"))
      QualityModel.aucOf(docs, "s", "y")
    }),
    "q_quality_auc_grouped" -> ((s, dir) => {
      // per-slice model eval (the fairness read): the same midrank
      // algebra per language from ONE composite range shuffle — groups
      // stay comparable because nothing samples
      import graft.pipeline.QualityModel
      val docs = d(s, dir, "documents")
        .where(F.col("n_chars").isNotNull && F.col("lang").isNotNull)
        .select(F.col("lang"),
          F.col("n_chars").cast("double").as("s"),
          F.when(F.col("doc_id") % 2 === 0, 1).otherwise(0).as("y"))
      QualityModel.aucByGroup(docs, "lang", "s", "y")
    }),
    "q_quality_calibration" -> ((s, dir) => {
      // is a heuristic quality score honest? the scaled-length signal
      // bucketed on the fixed grid over [0,1) (lengths past 1000 chars
      // land in the overflow bin): per bin the observed is-English rate
      // next to the fixed-point mean score — exact algebra end to end
      import graft.pipeline.QualityModel
      QualityModel.calibration(
        lrFeatures(s, dir).select(F.col("x1").as("score"), F.col("y")),
        "score", "y", bins = 10)
    }),
    "q_quality_pr" -> ((s, dir) => {
      // the numbers the filter acts on: confusion counts + P/R/F1 at
      // the 0.4 decision threshold over the trained scores
      import graft.pipeline.QualityModel
      val feat = lrFeatures(s, dir)
      val w = QualityModel.trainLogistic(
        feat, Seq("x1", "x2"), "y", iters = 3, lr = 1.0)
      QualityModel.prAtThreshold(
        QualityModel.scoreLogistic(feat, Seq("x1", "x2"), w.toSeq),
        "score", "y", threshold = 0.4)
    }),
    "q_quality_pr_curve" -> ((s, dir) => {
      // the operating-point sweep a filter is tuned on: P/R/F1 at five
      // thresholds from ONE corpus pass (thresholds broadcast onto the
      // rows) over the scaled-length heuristic score
      import graft.pipeline.QualityModel
      QualityModel.prCurve(
        lrFeatures(s, dir).select(F.col("x1").as("score"), F.col("y")),
        "score", "y", Seq(0.1, 0.25, 0.5, 0.75, 0.9))
    }),
    "q_quality_brier" -> ((s, dir) => {
      // probabilistic honesty in one number: fixed-point mean squared
      // error of the trained model's scores against the label
      import graft.pipeline.QualityModel
      val feat = lrFeatures(s, dir)
      val w = QualityModel.trainLogistic(
        feat, Seq("x1", "x2"), "y", iters = 3, lr = 1.0)
      QualityModel.brierScore(
        QualityModel.scoreLogistic(feat, Seq("x1", "x2"), w.toSeq),
        "score", "y")
    }),
    "q_quality_gains" -> ((s, dir) => {
      // the targeting read: rank by the heuristic score descending, ten
      // near-equal slices, positives captured so far and lift over the
      // base rate — rank from the range shuffle, cumulative window over
      // ten metadata rows
      import graft.pipeline.QualityModel
      QualityModel.gainsTable(
        d(s, dir, "documents")
          .where(F.col("n_chars").isNotNull && F.col("lang").isNotNull)
          .select(F.col("doc_id"),
            F.col("n_chars").cast("double").as("score"),
            F.when(F.col("lang") === "en", 1).otherwise(0).as("y")),
        "score", "y", buckets = 10, tiebreakers = Seq("doc_id"))
    }),
    "q_profile" -> ((s, dir) => {
      // the ANALYZE card in ONE aggregation job: per-column rows /
      // nulls / exact distinct / typed extrema / exact-DECIMAL mean —
      // the unpivot explodes the single aggregated row, nothing rescans
      graft.pipeline.Report.profile(d(s, dir, "customer"))
        .orderBy("column")
    }),
    "q_skew_topk" -> ((s, dir) => {
      // the skew instrument, step 1: which keys are hot — one
      // map-side-combined count shuffle, TakeOrderedAndProject for the
      // top slice (no global sort), shares against the broadcast total
      graft.operators.SkewDiag.skewTopKeys(
        d(s, dir, "documents"), "lang", 3)
    }),
    "q_skew_stats" -> ((s, dir) => {
      // step 2: HOW skewed — max/top-k share and the entropy of the
      // (top-k + OTHER) bucketing, folded over a pinned bounded order so
      // the corpus-wide double is engine-portable (the repo's
      // bounded-category convention for unbounded key sets)
      graft.operators.SkewDiag.skewStats(
        d(s, dir, "documents"), "lang", 4)
    }),
    "q_salt_factors" -> ((s, dir) => {
      // step 3: the salting plan — exactly how many slices each
      // over-budget key needs (feed into saltedJoin / a two-phase agg);
      // output is bounded by n/target, broadcast-sized by construction
      graft.operators.SkewDiag.saltFactors(
        d(s, dir, "documents"), "lang", 60L)
    }),
    "q_salted_agg" -> ((s, dir) => {
      // the two-phase salted aggregation the plan feeds: phase 1 spreads
      // each hot group over 8 salt slices (no reducer sees a whole hot
      // key), phase 2 folds the 8 partials — exact DECIMAL algebra makes
      // the result bit-equal to the direct aggregation the oracle states
      d(s, dir, "lineitem")
        .withColumn("td_salt", F.col("l_linenumber") % 8)
        .groupBy(F.col("l_returnflag"), F.col("td_salt"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
          .as("td_part"))
        .groupBy(F.col("l_returnflag"))
        .agg(F.sum(F.col("td_part")).cast("double").as("total_price"))
        .orderBy("l_returnflag")
    }),
    "q_equidepth_hist" -> ((s, dir) => {
      // equi-DEPTH histogram: 8 bins of ~n/8 rows each over the
      // heavy-tailed length column — ScalableRank's range shuffle (no
      // single-task sort), NTILE-style floor((r−1)·B/n) boundaries the
      // oracle states row for row
      graft.operators.Quantiles.equiDepthHistogram(
        d(s, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", 8, tiebreakers = Seq("doc_id"))
    }),
    "q_rollup_pricing" -> ((s, dir) => {
      // multi-level aggregation in ONE pass: (flag, status), per-flag
      // subtotals, and the grand total from the same shuffle — the
      // dataset-card slice table without three separate jobs
      d(s, dir, "lineitem")
        .rollup(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          F.count(F.lit(1)).as("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first,
          F.col("l_linestatus").asc_nulls_first)
    }),
    "q_cube_pricing" -> ((s, dir) => {
      // the full lattice: every (flag, status) grouping-set combination
      // including per-status subtotals — one shuffle, four grouping sets
      d(s, dir, "lineitem")
        .cube(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          F.count(F.lit(1)).as("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first,
          F.col("l_linestatus").asc_nulls_first)
    }),
    "q_kmv_sample" -> ((s, dir) => {
      // the sketch AS a mergeable uniform sample: per-language bottom-8
      // kept keys — md5 order is data-independent, so these 8 texts per
      // language are a uniform without-replacement draw that any engine
      // reproduces exactly
      import graft.pipeline.Sketches
      val docs = d(s, dir, "documents").select("lang", "text")
      val sk = Sketches.kmvSketch(docs, "text", 8, groupCol = Some("lang"))
      Sketches.kmvSample(sk, keyCols = Seq("lang"))
        .withColumnRenamed("key", "sample_key")
        .orderBy("lang", "h")
    }),
    "q_cms_freq" -> ((s, dir) => {
      // count-min frequency sketch END TO END: 4×1024 token-count
      // sketches of the two corpus halves, merged ELEMENTWISE under the
      // (depth, width) stamp guard, then point queries for the ten most
      // frequent tokens next to their exact counts — integer algebra
      // makes merge == whole bit-exact, and the md5 row-salted buckets
      // let the oracle state the identical counters (collisions and all)
      import graft.pipeline.Sketches
      val toks = d(s, dir, "documents").select(F.col("doc_id"),
        F.explode(F.filter(
          F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
          t => t =!= "")).as("tok"))
      def half(m: Int) = Sketches.cmsSketch(
        toks.where(F.col("doc_id") % 2 === m), "tok", depth = 4,
        width = 1024)
      val merged = Sketches.mergeCmsSketches(half(0).unionByName(half(1)))
      val top = toks.groupBy("tok")
        .agg(F.count(F.lit(1)).as("exact"))
        .orderBy(F.col("exact").desc, F.col("tok").asc).limit(10)
      Sketches.cmsEstimate(merged, top, "tok").orderBy("tok")
    }),
    "q_weighted_sample" -> ((s, dir) => {
      // deterministic weighted sampling (A-ES priorities in log form):
      // five docs per language, inclusion probability tracking n_chars —
      // priority = libm ln(md5-prefix uniform)/weight, so the exact
      // sample (not just its distribution) is the oracle relation
      import graft.pipeline.Sketches
      Sketches.weightedSample(
          d(s, dir, "documents").select("lang", "doc_id", "n_chars"),
          keyCol = "doc_id", weightCol = "n_chars", k = 5,
          groupCol = Some("lang"))
        .select("lang", "doc_id", "priority")
        .orderBy("lang", "doc_id")
    })
  )
}
