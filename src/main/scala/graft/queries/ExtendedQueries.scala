package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.core.{Expr, Selectors, TableFrame}
import graft.dq.Dq
import graft.td
import graft.udf.Udf

/** Third coverage batch: UDF surface, DQ namespace, fill strategies, rank
  * variants, relaxed concat, selectors, null-safe joins, keep=first dedup,
  * tail, extended string/datetime/math functions, and a gated streaming
  * window (run through Structured Streaming, checked against a batch SQL
  * oracle). */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): TableFrame =
    Tables.frame(s, dir, name)

  /** Example multi-output scalar UDF (discount math + a label). */
  private class PricingUdf extends Udf(Seq(
      "net_price" -> DoubleType, "price_label" -> StringType)) {
    override def onElement(values: Seq[Any]): Seq[Any] = {
      val price = values(0).asInstanceOf[Double]
      val disc = values(1).asInstanceOf[Double]
      val net = price * (1.0 - disc)
      Seq(net, if (net > 30000.0) "high" else "low")
    }
  }

  val queries: Map[String, Q] = Map(
    "q_udf_scalar" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Udf(li, Seq(F.col("l_extendedprice"), F.col("l_discount")), new PricingUdf)
        .selectCols("l_orderkey", "l_linenumber", "net_price", "price_label")
        .sort(Seq("l_orderkey", "l_linenumber")).limit(400).df
    }),
    "q_dq_checks" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val checked = Dq(c, "c_acctbal",
        Seq(Dq.is_negative, Dq.is_between(0.0, 5000.0), Dq.is_not_null))
      Dq.validate(checked, Seq("c_acctbal" -> Dq.is_not_null, "c_custkey" -> Dq.is_positive))
        .selectCols("c_custkey", "c_acctbal_is_negative_dq",
          "c_acctbal_is_between_dq", "c_acctbal_is_not_null_dq", "dq_valid")
        .sort(Seq("c_custkey")).limit(400).df
    }),
    "q_fill_forward" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("bal" -> Expr(F.when(F.col("c_custkey") % 5 === 0, null)
          .otherwise(F.col("c_acctbal"))))
        .sort(Seq("c_custkey"))
        .fill_null_strategy("bal", "forward")
        .selectCols("c_custkey", "bal")
        .sort(Seq("c_custkey")).limit(400).df
    }),
    "q_rank_scalable" -> ((s, dir) => {
      // distributed rank (no single-reducer window) over all orders —
      // must equal the plain SQL window rank
      graft.operators.ScalableRank.withRank(
          t(s, dir, "orders").df, "o_totalprice", as = "r", method = "min")
        .select(F.col("o_orderkey"), F.col("r"))
        .orderBy("o_orderkey")
    }),
    "q_rank_variants" -> ((s, dir) => {
      t(s, dir, "supplier")
        .with_columns(
          "rank_avg" -> td.col("s_acctbal").rank("average"),
          "rank_max" -> td.col("s_acctbal").rank("max"))
        .selectCols("s_suppkey", "rank_avg", "rank_max")
        .sort(Seq("s_suppkey")).df
    }),
    "q_concat_relaxed" -> ((s, dir) => {
      val a = t(s, dir, "nation").select(td.col("n_nationkey").as("v"))
      val b = t(s, dir, "customer").limit(0)
        .select(td.col("c_acctbal").as("v"))
      val c = t(s, dir, "customer")
        .filter(td.col("c_custkey") <= 50).select(td.col("c_acctbal").as("v"))
      TableFrame.concat(Seq(a, b, c), how = "vertical_relaxed")
        .sort(Seq("v")).df
    }),
    "q_selectors" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val numericNames = p.userSchema.fields.toSeq
        .filter(Selectors.numeric.matches).map(_.name)
      p.agg(numericNames.map(n =>
        Expr(F.sum(F.col(n).cast(DecimalType(18, 2))).cast(DoubleType))
          .as(s"sum_$n")): _*).df
    }),
    "q_join_nulls" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .with_columns("nk" -> Expr(F.when(F.col("c_nationkey") % 7 === 0, null)
          .otherwise(F.col("c_nationkey"))))
        .selectCols("c_custkey", "nk")
      val joined = c.join(c.rename("c_custkey" -> "c_custkey2"),
        on = Seq("nk"), joinNulls = true)
      joined.agg(
        td.lit(1).len.as("n_pairs"),
        Expr(F.sum(F.when(F.col("nk").isNull, 1L).otherwise(0L)).as("n_null_pairs"))).df
    }),
    "q_join_right" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"), how = "right")
        .group_by("c_custkey")
        .agg(Expr(F.count(F.col("o_orderkey")).as("n_orders")))
        .sort(Seq("c_custkey")).df
    }),
    "q_unique_last" -> ((s, dir) => {
      t(s, dir, "orders").sort(Seq("o_orderkey"))
        .unique(Seq("o_custkey"), keep = "last")
        .selectCols("o_orderkey", "o_custkey")
        .sort(Seq("o_orderkey")).df
    }),
    "q_unique_first" -> ((s, dir) => {
      t(s, dir, "orders").sort(Seq("o_orderkey"))
        .unique(Seq("o_custkey"), keep = "first")
        .selectCols("o_orderkey", "o_custkey")
        .sort(Seq("o_orderkey")).df
    }),
    "q_tail" -> ((s, dir) => {
      t(s, dir, "orders").sort(Seq("o_orderkey")).tail(10)
        .selectCols("o_orderkey", "o_totalprice")
        .sort(Seq("o_orderkey")).df
    }),
    "q_str_more" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          td.col("p_partkey"),
          td.col("p_type").str.strip_prefix("STANDARD ").as("type_stripped"),
          td.col("p_name").str.pad_start(30, "*").as("name_padded"),
          td.col("p_type").str.find("ED", literal = true).as("ed_pos"),
          td.col("p_brand").str.reverse.as("brand_rev"),
          td.col("p_brand").str.tail(2).as("brand_tail"),
          td.col("p_brand").str.extract("(\\d+)", 1).str.to_integer().as("brand_num"),
          td.col("p_name").str.strip_chars("aeiou ").as("name_stripped"))
        .sort(Seq("p_partkey")).limit(400).df
    }),
    "q_dt_more" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          td.col("o_orderkey"),
          td.col("o_orderdate").dt.iso_year.as("iso_y"),
          td.col("o_orderdate").dt.is_leap_year.as("leap"),
          td.col("o_orderdate").dt.epoch("s").as("epoch_s"),
          td.col("o_orderdate").dt.epoch("ms").as("epoch_ms"),
          td.col("o_orderdate").dt.month_start.as("m_start"),
          td.col("o_orderdate").dt.month_end.as("m_end"),
          td.col("o_orderdate").dt.offset_by("2h").as("plus_2h"),
          td.col("o_orderdate").dt.millennium.as("mil"),
          td.col("o_orderdate").dt.century.as("cen"))
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_dt_time_parts" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          td.col("event_id"),
          td.col("ts").dt.hour.as("h"),
          td.col("ts").dt.minute.as("mi"),
          td.col("ts").dt.second().as("sec"),
          td.col("ts").dt.millisecond.as("ms"),
          td.col("ts").dt.microsecond.as("us"),
          td.col("ts").dt.time.as("ns_of_day"),
          td.col("ts").dt.epoch("us").as("epoch_us"))
        .sort(Seq("event_id")).limit(500).df
    }),
    "q_dt_replace" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          td.col("event_id"),
          td.col("ts").dt.replace(year = 2000, microsecond = 0).as("y2000"),
          td.col("ts").dt.replace(month = 1, day = 15, microsecond = 0).as("jan15"),
          td.col("ts").dt.replace(hour = 0, minute = 0, second = 0, microsecond = 0)
            .as("midnight"),
          td.col("ts").dt.cast_time_unit("ms").as("ms_trunc"),
          // reinterpreted instants compared as epoch micros: the ms
          // direction lands far outside pandas' ns-timestamp range
          td.col("ts").dt.with_time_unit("ms").dt.epoch("us").as("reint_ms_us"),
          td.col("ts").dt.with_time_unit("ns").dt.epoch("us").as("reint_ns_us"))
        .sort(Seq("event_id")).limit(500).df
    }),
    "q_math_more" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          td.col("l_orderkey"), td.col("l_linenumber"),
          td.col("l_quantity").clip(5.0, 40.0).as("qty_clip"),
          td.col("l_extendedprice").round_sig_figs(3).as("price_3sf"),
          td.col("l_quantity").cbrt.round(4).as("qty_cbrt"),
          td.col("l_discount").pow(2).round(6).as("disc_sq"),
          (td.col("l_quantity") / 7.0).sin.round(4).as("qty_sin"),
          (td.col("l_quantity") / 7.0).cos.round(4).as("qty_cos"),
          (td.col("l_quantity") / 7.0).arctan.round(4).as("qty_atan"),
          td.col("l_quantity").floordiv(7).as("qty_div7"),
          (td.col("l_linenumber") % 3).as("line_mod3"))
        .sort(Seq("l_orderkey", "l_linenumber")).limit(400).df
    }),
    "q_stream_window" -> ((s, dir) => {
      // run the hourly aggregation THROUGH Structured Streaming (complete
      // mode => all windows emitted), then hand back the bounded result
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n"))
      graft.streaming.StreamStage.runToMemory(agg, "q_stream_window_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("event_type"), F.col("n"))
        .orderBy("hour_epoch", "event_type")
    }),
    "q_stream_distribution" -> ((s, dir) => {
      // live distribution monitoring THROUGH Structured Streaming: hourly
      // fixed-grid binned counts of event value (the same deterministic
      // cell function as the mergeable quantile sketch, so each window
      // row-set IS a sketch mergeable with batch history) — the oracle
      // states the identical binning + hourly counts over the whole table
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val dist = graft.streaming.Streams.windowedDistribution(
        stream, "ts", "value", "1 hour", "1 hour", 0.0, 512.0, 64)
      graft.streaming.StreamStage.runToMemory(dist, "q_stream_distribution_",
          "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("bin"), F.col("n"))
        .orderBy("hour_epoch", "bin")
    }),
    "q_stream_distinct" -> ((s, dir) => {
      // per-hour distinct users THROUGH Structured Streaming via
      // mergeable HLL sketches (streaming cannot countDistinct; the HLL
      // buffer bounds state at 2^lgK registers per open window).
      // Rows-only by contract (binary DataSketches estimates have no
      // DuckDB analog); StreamingSpec holds the exact streamed==batch
      // per-hour differential and the windows-union-to-corpus equality.
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val wd = graft.streaming.Streams.windowedDistinct(
        stream, "ts", "user_id", "1 hour", "1 hour")
      graft.streaming.StreamStage.runToMemory(wd, "q_stream_distinct_",
          "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("estimate"))
        .orderBy("hour_epoch")
    }),
    "q_stream_drift" -> ((s, dir) => {
      // LIVE drift monitoring end to end: every streamed hourly window's
      // value distribution, pivoted from windowedDistribution (bin, n)
      // rows into a stamped sketch via binsToSketch, drifted against the
      // whole-corpus batch baseline — one broadcast of the single
      // baseline row, one PSI/KS/TVD row per hour. The oracle states the
      // same hourly binning vs the same global distribution.
      import graft.pipeline.Report
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val dist = graft.streaming.Streams.windowedDistribution(
        stream, "ts", "value", "1 hour", "1 hour", 0.0, 512.0, 64)
      val winBins = graft.streaming.StreamStage.runToMemory(dist,
          "q_stream_drift_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("bin"), F.col("n"))
      val perHour = Report.binsToSketch(winBins, 0.0, 512.0, 64,
        groupCols = Seq("hour_epoch"))
      val baseline = Report.quantileSketch(
        t(s, dir, "events").df.select("value"), "value", 0.0, 512.0, 64)
      Report.sketchDriftVsBaseline(perHour, baseline, "hour_epoch")
        .orderBy("hour_epoch")
    }),
    "q_stream_interval_join" -> ((s, dir) => {
      // stream-stream attribution: clicks joined to same-user views within
      // the preceding 12 hours, THROUGH Structured Streaming (two file
      // streams, watermarked interval join, append mode); the bounded
      // replay with a generous watermark emits every match, so the oracle
      // is the plain batch interval self-join
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      def side(tpe: String, u: String, ts: String, id: String) =
        graft.streaming.Streams.readParquetStream(s, tmp, schema)
          .where(F.col("event_type") === tpe)
          .select(F.col("user_id").as(u), F.col("ts").as(ts),
            F.col("event_id").as(id))
      val j = graft.streaming.Streams.intervalJoin(
        side("click", "c_user", "c_ts", "click_id"),
        side("view", "v_user", "v_ts", "view_id"),
        F.col("c_user") === F.col("v_user"),
        "c_ts", "v_ts", before = "12 HOURS", after = "0 SECONDS",
        watermark = "60 days")
      graft.streaming.StreamStage.runToMemory(
          j.select("click_id", "view_id"), "q_stream_ij_", "append")
        .orderBy("click_id", "view_id")
    }),
    "q_stream_interval_join_outer" -> ((s, dir) => {
      // left_outer attribution THROUGH Structured Streaming: a null match
      // may only emit once the watermark proves no partner can arrive, so
      // a far-future pusher row on each side (its own LATER micro-batch
      // via mtime-ordered staging + maxFilesPerTrigger=1) advances the
      // watermark past every data row. The pushers themselves are not
      // watermark-finalized (nothing outruns them) and are filtered; the
      // emitted rows then equal the plain batch LEFT OUTER interval join.
      import graft.streaming.{StreamStage, Streams}
      val ev = t(s, dir, "events").df
      val maxTs = ev.agg(F.max("ts")).head.getTimestamp(0) // 1-row scalar
      val pushTs = new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
      import s.implicits._
      val (ldir, lsch) = StreamStage.stageOrdered(s, s"$dir/oij_left", Seq(
        () => ev.where(F.col("event_type") === "click")
          .select(F.col("user_id").as("c_user"), F.col("ts").as("c_ts"),
            F.col("event_id").as("click_id")),
        () => Seq((-1L, pushTs, -1L)).toDF("c_user", "c_ts", "click_id")))
      val (rdir, rsch) = StreamStage.stageOrdered(s, s"$dir/oij_right", Seq(
        () => ev.where(F.col("event_type") === "view")
          .select(F.col("user_id").as("v_user"), F.col("ts").as("v_ts"),
            F.col("event_id").as("view_id")),
        () => Seq((-2L, pushTs, -2L)).toDF("v_user", "v_ts", "view_id")))
      val j = Streams.intervalJoin(
        Streams.readParquetStream(s, ldir, lsch, maxFilesPerTrigger = 1),
        Streams.readParquetStream(s, rdir, rsch, maxFilesPerTrigger = 1),
        F.col("c_user") === F.col("v_user"),
        "c_ts", "v_ts", before = "12 HOURS", after = "0 SECONDS",
        watermark = "1 minute", joinType = "left_outer")
      StreamStage.runToMemory(
          j.select("click_id", "view_id"), "q_stream_oij_", "append")
        .where(F.col("click_id") >= 0L)
        .orderBy(F.col("click_id").asc, F.col("view_id").asc_nulls_first)
    }),
    "q_stream_cusum" -> ((s, dir) => {
      // per-entity ONLINE CUSUM through the custom-state escape hatch:
      // each user's clamped two-sided ramps against a stated baseline,
      // rows folded in ascending event_id order — in batch mode the
      // output IS the seq-ordered fold, which the oracle replays per key
      import s.implicits._
      val ev = t(s, dir, "events").df
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("event_id").isNotNull)
        .select(F.col("user_id").cast(StringType).as("k"),
          F.col("event_id").cast("long").as("seq"),
          F.col("value").cast("double").as("v"))
        .as[(String, Long, Double)]
      graft.streaming.Streams.statefulCusum(ev,
          mu = 50.0, slack = 5.0, threshold = 100.0)
        .toDF()
        .select(F.col("key"), F.col("n"),
          F.col("cusumHi").as("cusum_hi"), F.col("cusumLo").as("cusum_lo"),
          F.col("alarm"))
        .orderBy("key")
    }),
    "q_stream_ewma" -> ((s, dir) => {
      // per-entity ONLINE EWMA baseline through the custom-state escape
      // hatch: each user's trend seeds at the first value and folds
      // EWMA←EWMA·0.75 + 0.25·v in ascending event_id order — in batch
      // mode the output IS the seq-ordered fold, which the oracle
      // replays per key with list_reduce (seed = first element)
      import s.implicits._
      val ev = t(s, dir, "events").df
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("event_id").isNotNull)
        .select(F.col("user_id").cast(StringType).as("k"),
          F.col("event_id").cast("long").as("seq"),
          F.col("value").cast("double").as("v"))
        .as[(String, Long, Double)]
      graft.streaming.Streams.statefulEwma(ev, alpha = 0.25)
        .toDF()
        .select(F.col("key"), F.col("n"), F.col("value"),
          F.col("baseline"), F.col("deviation"))
        .orderBy("key")
    }),
    "q_stream_zscore" -> ((s, dir) => {
      // per-entity ONLINE z-score through the custom-state escape
      // hatch: each user's exact fixed-point moment sums (three longs
      // of state) score the newest reading against that user's own
      // history — in batch mode the sums are whole-history exact, so
      // the oracle replays them as integer aggregates + the stated
      // mean/std/z doubles
      import s.implicits._
      val ev = t(s, dir, "events").df
        .where(F.col("user_id").isNotNull && F.col("value").isNotNull &&
          F.col("event_id").isNotNull)
        .select(F.col("user_id").cast(StringType).as("k"),
          F.col("event_id").cast("long").as("seq"),
          F.col("value").cast("double").as("v"))
        .as[(String, Long, Double)]
      graft.streaming.Streams.statefulMoments(ev)
        .toDF()
        .select(F.col("key"), F.col("n"), F.col("value"),
          F.col("mean"), F.col("std"), F.col("z"))
        .orderBy("key")
    }),
    "q_stateful_counts" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").df
        .select(F.col("user_id").cast(StringType).as("k"), F.col("value"))
        .as[(String, Double)]
      graft.streaming.Streams.runningTotals(ev)
        .toDF().select(F.col("key"), F.col("events"))
        .orderBy("key")
    }),
    "q_version_diff" -> ((s, dir) => {
      // CDC between two stored versions, END TO END through the versioned
      // store (write v1, write v2, scan @HEAD~1 vs @HEAD, diff): the two
      // versions derive deterministically from `orders`, so the oracle
      // states the identical FULL OUTER JOIN change set over the same
      // derivations. strict=true also exercises the key-uniqueness guard.
      val (v1, v2) = versionPair(s, dir)
      val store = tempStore(s)
      store.write("g", "orders", v1)
      store.write("g", "orders", v2)
      graft.store.VersionDiff.diffVersions(store,
          "g/orders@HEAD~1", "g/orders@HEAD", Seq("o_orderkey"), strict = true)
        .orderBy("o_orderkey")
    }),
    "q_version_scan_relaxed" -> ((s, dir) => {
      // type-WIDENING schema evolution end to end through the versioned
      // store: v1 publishes buyer as int32, v2 as int64 (+ a new spend
      // column) — the strict range scan refuses, scanRelaxed widens via
      // the Dtypes supertype lattice (the reference's vertical_relaxed
      // rule) and reads v1's missing spend as NULL; the oracle states
      // the identical widened union over the raw table
      val store = tempStore(s)
      val orders = Tables.load(s, dir, "orders")
      store.write("g", "ow", orders.where(F.col("o_orderkey") % 3 === 0)
        .select(F.col("o_orderkey"),
          F.col("o_custkey").cast("int").as("buyer")))
      store.write("g", "ow", orders.where(F.col("o_orderkey") % 3 === 1)
        .select(F.col("o_orderkey"),
          F.col("o_custkey").cast("long").as("buyer"),
          F.col("o_totalprice").cast("double").as("spend")))
      store.scanRelaxed("g/ow@INITIAL..HEAD").get.df
        .select("o_orderkey", "buyer", "spend")
        .orderBy("o_orderkey")
    }),
    "q_version_diff_summary" -> ((s, dir) => {
      val (v1, v2) = versionPair(s, dir)
      graft.store.VersionDiff.summary(v1, v2, Seq("o_orderkey"))
    }),
    "q_store_compact" -> ((s, dir) => {
      // small-file maintenance end to end: publish a 24-file layout,
      // compact to one file, scan the compacted HEAD — rows must be the
      // verbatim source relation
      val store = tempStore(s)
      store.write("g", "docs", Tables.load(s, dir, "documents").repartition(24))
      val compacted = store.compact("g", "docs", targetBytes = 64L << 20)
      require(compacted.isDefined, "compaction should have run on 24 files")
      store.scan("g/docs@HEAD").get.df
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    "q_store_restore" -> ((s, dir) => {
      // the "bad publish" runbook end to end: publish the good corpus,
      // then two deterministic bad publishes (rows dropped / lengths
      // corrupted), RESTORE @HEAD~2 — one metadata line, zero bytes
      // moved — and scan HEAD: the relation must be the original
      // publish, which is exactly what the oracle states
      val store = tempStore(s)
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      store.write("g", "rdocs", docs)
      store.write("g", "rdocs", docs.where(F.col("doc_id") % 5 =!= 0))
      store.write("g", "rdocs",
        docs.withColumn("n_chars", F.col("n_chars") * 2))
      require(store.restore("g", "rdocs", "HEAD~2").isDefined,
        "restore should publish a new HEAD")
      store.scan("g/rdocs@HEAD").get.df
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    "q_version_drift" -> ((s, dir) => {
      // the release drift report END TO END through the versioned store:
      // write corpus v1, write v2 (a deterministic re-crawl derivation:
      // some docs dropped, a third of the rest 40 chars longer), sketch
      // each STORED version via @HEAD~1/@HEAD refs, and answer PSI/KS/TVD
      // from the two stamped sketch rows — the oracle states the same
      // derivations + the same drift arithmetic over the raw table
      import graft.pipeline.Report
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "n_chars")
      val v1 = docs.where(F.col("doc_id") % 7 =!= 0)
      val v2 = docs.where(F.col("doc_id") % 5 =!= 0)
        .withColumn("n_chars",
          F.when(F.col("doc_id") % 3 === 0, F.col("n_chars") + 40)
            .otherwise(F.col("n_chars")))
      val store = tempStore(s)
      store.write("g", "docs", v1)
      store.write("g", "docs", v2)
      val sk = (ref: String) => Report.quantileSketch(
        store.scan(ref).get.df, "n_chars", 0.0, 640.0, 64)
      Report.sketchDrift(sk("g/docs@HEAD~1"), sk("g/docs@HEAD"))
    }),
    "q_stream_freq" -> ((s, dir) => {
      // live frequency monitoring THROUGH Structured Streaming: hourly
      // count-min cells (md5 row-salted buckets, the exact batch
      // encoding), pivoted into per-hour sketch rows, merged ELEMENTWISE
      // across all hours — integer algebra makes the union of the
      // windows bit-equal to the whole-corpus sketch, so point queries
      // for the ten busiest users answer from streamed state alone and
      // the oracle states the identical counters over the raw table
      import graft.pipeline.Sketches
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val cells = graft.streaming.Streams.windowedCms(
        stream, "ts", "user_id", "1 hour", "1 hour", depth = 4, width = 256)
      val winCells = graft.streaming.StreamStage.runToMemory(cells,
          "q_stream_freq_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("r"), F.col("b"), F.col("n"))
      val merged = Sketches.mergeCmsSketches(Sketches.cellsToCms(
        winCells, depth = 4, width = 256, groupCols = Seq("hour_epoch")))
      val top = t(s, dir, "events").df
        .groupBy("user_id").agg(F.count(F.lit(1)).as("exact"))
        .orderBy(F.col("exact").desc, F.col("user_id").asc).limit(10)
      Sketches.cmsEstimate(merged, top, "user_id").orderBy("user_id")
    }),
    "q_stream_kmv" -> ((s, dir) => {
      // live distinct sampling THROUGH Structured Streaming: per-hour
      // bottom-8 KMV sketches via the bounded-state KmvAgg aggregate
      // (state <= k entries per open window, never the user set) —
      // deterministic md5 order makes each streamed window sketch
      // bit-equal to the batch bottom-k of that hour, so the oracle
      // states the identical per-hour rank over the raw table
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val wk = graft.streaming.Streams.windowedKmv(
        stream, "ts", "user_id", "1 hour", "1 hour", k = 8)
      graft.streaming.StreamStage.runToMemory(wk, "q_stream_kmv_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.explode(F.col("entries")).as("e"))
        .select(F.col("hour_epoch"), F.col("e.h").as("h"),
          F.col("e.key").as("sample_key"))
        .orderBy("hour_epoch", "h")
    }),
    "q_stream_bloom" -> ((s, dir) => {
      // live membership THROUGH Structured Streaming: hourly Bloom words
      // (md5 bit positions, the exact batch encoding; state per open
      // window <= ceil(m/32) longs), pivoted into per-hour filters,
      // OR-merged across all hours — bit algebra makes the union of the
      // windows bit-equal to the whole-corpus filter, so membership
      // probes (every seen user + 50 never-seen ids) answer from
      // streamed state alone and the oracle states the identical member
      // bit, false positives included
      import graft.pipeline.Sketches
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val cells = graft.streaming.Streams.windowedBloom(
        stream, "ts", "user_id", "1 hour", "1 hour", 2048, 3)
      val winCells = graft.streaming.StreamStage.runToMemory(cells,
          "q_stream_bloom_", "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("td_w"), F.col("td_bits"))
      val merged = Sketches.mergeBloomSketches(Sketches.cellsToBloom(
        winCells, 2048, 3, groupCols = Seq("hour_epoch")))
      val present = t(s, dir, "events").df
        .where(F.col("user_id").isNotNull)
        .select(F.col("user_id").cast("string").as("probe")).distinct()
      val absent = s.range(50).select(
        F.concat(F.lit("ghost:"), F.col("id").cast("string")).as("probe"))
      Sketches.bloomProbe(merged, present.unionByName(absent), "probe")
        .orderBy("probe")
    }),
    "q_stream_confusion" -> ((s, dir) => {
      // live model monitoring THROUGH Structured Streaming: hourly
      // confusion counts + guarded P/R/F1 of a deployed score (value
      // rescaled to [0,1]) against an arriving label, at the 0.3
      // decision threshold — stateless four-counter windows, and the
      // algebra is prAtThreshold's exactly, so the oracle states each
      // hour's batch answer over the raw table
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
        .withColumn("td_score", F.col("value").cast("double") / 512.0d)
        .withColumn("td_label",
          F.when(F.col("user_id") % 2 === 0, 1).otherwise(0))
      val cm = graft.streaming.Streams.windowedConfusion(
        stream, "ts", "td_score", "td_label", "1 hour", "1 hour", 0.3)
      graft.streaming.StreamStage.runToMemory(cm, "q_stream_confusion_",
          "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn"),
          F.col("precision"), F.col("recall"), F.col("f1"))
        .orderBy("hour_epoch")
    }),
    "q_stream_calibration" -> ((s, dir) => {
      // live calibration monitoring THROUGH Structured Streaming: hourly
      // per-bin (n, n_pos, frac_pos, mean_score) of a deployed score
      // (value rescaled to [0,1]) against an arriving label — the
      // score-calibration sibling of q_stream_drift, and the algebra is
      // QualityModel.calibration's exactly, so the oracle states each
      // hour's batch calibration over the raw table
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        t(s, dir, "events").df)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
        .withColumn("td_score", F.col("value").cast("double") / 512.0d)
        .withColumn("td_label",
          F.when(F.col("user_id") % 2 === 0, 1).otherwise(0))
      val cal = graft.streaming.Streams.windowedCalibration(
        stream, "ts", "td_score", "td_label", "1 hour", "1 hour", bins = 10)
      graft.streaming.StreamStage.runToMemory(cal, "q_stream_calibration_",
          "complete")
        .select(F.unix_timestamp(F.col("window.start")).as("hour_epoch"),
          F.col("bin"), F.col("n"), F.col("n_pos"),
          F.col("frac_pos"), F.col("mean_score"))
        .orderBy("hour_epoch", "bin")
    }),
    "q_profile_rollup" -> ((s, dir) => {
      // the dataset-card column profile END TO END through the versioned
      // store: three disjoint crawl shards published as three versions, a
      // mergeable profile stamp built PER STORED VERSION via @HEAD~n refs,
      // rolled up with zero rescan of history — counts add, min/max fold,
      // decimal sums add exactly, so the rollup is bit-equal to profiling
      // the union and the oracle states each column's stats over the
      // whole corpus (n_distinct is absent by design: exact distincts do
      // not merge — the KMV rollup gate carries that face)
      import graft.pipeline.Report
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      val store = tempStore(s)
      (0 until 3).foreach { m =>
        store.write("g", "prdocs", docs.where(F.col("doc_id") % 3 === m))
      }
      // explicit column list: the stored scan carries $td.* system
      // columns, which are not part of the card
      val st = (ref: String) => Report.profileStamp(
        store.scan(ref).get.df, Seq("doc_id", "lang", "source", "n_chars"))
      Report.mergeProfiles(
        st("g/prdocs@HEAD~2").unionByName(st("g/prdocs@HEAD~1"))
          .unionByName(st("g/prdocs@HEAD")))
    }),
    "q_profile_drift" -> ((s, dir) => {
      // publish review between two stored versions: HEAD (shard 2) vs
      // HEAD~1 (shard 1) profile stamps compared column-by-column —
      // null-rate moves, mean shifts, range widening, schema change —
      // with zero rescan of the base version's data; the oracle states
      // both shards' stats and the same delta arithmetic
      import graft.pipeline.Report
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      val store = tempStore(s)
      (0 until 3).foreach { m =>
        store.write("g", "pddocs", docs.where(F.col("doc_id") % 3 === m))
      }
      val st = (ref: String) => Report.profileStamp(
        store.scan(ref).get.df, Seq("doc_id", "lang", "source", "n_chars"))
      Report.profileDrift(st("g/pddocs@HEAD"), st("g/pddocs@HEAD~1"))
    }),
    "q_cms_store_rollup" -> ((s, dir) => {
      // the incremental frequency sketch END TO END through the
      // versioned store: three disjoint crawl shards published as three
      // versions, a 4×256 count-min sketch of the source column built
      // PER STORED VERSION via @HEAD~n refs, merged ELEMENTWISE with
      // zero rescan of history, then point-queried for every observed
      // source plus never-crawled keys — integer algebra makes the
      // rollup bit-equal to sketching the union, so the oracle states
      // the whole-corpus counters (collisions and all); completes the
      // batch + streaming + store-rollup symmetry for the CMS family
      // (KMV and Bloom already have all three faces)
      import graft.pipeline.Sketches
      val docs = Tables.load(s, dir, "documents").select("doc_id", "source")
      val store = tempStore(s)
      (0 until 3).foreach { m =>
        store.write("g", "cdocs", docs.where(F.col("doc_id") % 3 === m))
      }
      val sk = (ref: String) => Sketches.cmsSketch(
        store.scan(ref).get.df, "source", depth = 4, width = 256)
      val merged = Sketches.mergeCmsSketches(
        sk("g/cdocs@HEAD~2").unionByName(sk("g/cdocs@HEAD~1"))
          .unionByName(sk("g/cdocs@HEAD")))
      val probes = docs.groupBy("source")
        .agg(F.count(F.lit(1)).as("exact"))
        .unionByName(s.range(5).select(
          F.concat(F.lit("uncrawled://"), F.col("id").cast("string"))
            .as("source"),
          F.lit(0L).as("exact")))
      Sketches.cmsEstimate(merged, probes, "source").orderBy("source")
    }),
    "q_kmv_store_rollup" -> ((s, dir) => {
      // the incremental dataset-card distinct count END TO END through
      // the versioned store: three disjoint crawl shards published as
      // three versions, a bottom-128 KMV sketch built PER STORED VERSION
      // via @HEAD~n refs, the three sketch rows merged with zero rescan
      // of history — determinism makes the rollup bit-equal to sketching
      // the union, so the oracle states bottom-k over the whole corpus
      import graft.pipeline.Sketches
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val store = tempStore(s)
      (0 until 3).foreach { m =>
        store.write("g", "docs", docs.where(F.col("doc_id") % 3 === m))
      }
      val sk = (ref: String) => Sketches.kmvSketch(
        store.scan(ref).get.df, "text", 128)
      val merged = Sketches.mergeKmvSketches(
        sk("g/docs@HEAD~2").unionByName(sk("g/docs@HEAD~1"))
          .unionByName(sk("g/docs@HEAD")))
      Sketches.kmvEstimate(merged)
    }),
    "q_bloom_store_rollup" -> ((s, dir) => {
      // the incremental membership index END TO END through the
      // versioned store: three disjoint crawl shards published as three
      // versions, a Bloom filter built PER STORED VERSION via @HEAD~n
      // refs, OR-merged with zero rescan of history, then probed with
      // every 7th document plus never-crawled keys — bit algebra makes
      // the rollup bit-equal to filtering the union, so the oracle
      // states membership over the whole corpus (false positives too)
      import graft.pipeline.Sketches
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val store = tempStore(s)
      (0 until 3).foreach { m =>
        store.write("g", "bdocs", docs.where(F.col("doc_id") % 3 === m))
      }
      val sk = (ref: String) => Sketches.bloomSketch(
        store.scan(ref).get.df, "text", 4096, 3)
      val merged = Sketches.mergeBloomSketches(
        sk("g/bdocs@HEAD~2").unionByName(sk("g/bdocs@HEAD~1"))
          .unionByName(sk("g/bdocs@HEAD")))
      val present = docs.where(F.col("doc_id") % 7 === 0)
        .where(F.col("text").isNotNull)
        .select(F.col("text").as("probe")).distinct()
      val absent = s.range(100).select(
        F.concat(F.lit("uncrawled:"), F.col("id").cast("string")).as("probe"))
      Sketches.bloomProbe(merged, present.unionByName(absent), "probe")
        .orderBy("probe")
    }),
    "q_version_history" -> ((s, dir) => {
      // SCD2 unroll over three stored versions: runs of constant values
      // per key with valid_from/valid_to version ordinals
      val (v1, v2) = versionPair(s, dir)
      val v3 = t(s, dir, "orders")
        .df.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .where(F.col("o_orderkey") % 4 =!= 0)
        .withColumn("o_orderstatus",
          F.when(F.col("o_orderkey") % 11 === 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus")))
        .withColumn("o_totalprice",
          F.when(F.col("o_orderkey") % 3 === 0, F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")))
      val store = tempStore(s)
      Seq(v1, v2, v3).foreach(store.write("g", "orders", _))
      graft.store.VersionDiff.historyOf(store, "g", "orders", Seq("o_orderkey"))
        .orderBy("o_orderkey", "valid_from")
    })
  )

  /** Two deterministic "versions" of orders for the CDC gates: v2 drops a
    * different key subset than v1, doubles some prices, flips some
    * statuses — so the diff exercises insert, delete, update, and
    * multi-column changed_cols in one pass. */
  private def versionPair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = t(s, dir, "orders").df
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val v1 = orders.where(F.col("o_orderkey") % 7 =!= 0)
    val v2 = orders.where(F.col("o_orderkey") % 5 =!= 0)
      .withColumn("o_orderstatus",
        F.when(F.col("o_orderkey") % 11 === 0, F.lit("X"))
          .otherwise(F.col("o_orderstatus")))
      .withColumn("o_totalprice",
        F.when(F.col("o_orderkey") % 3 === 0, F.col("o_totalprice") * 2)
          .otherwise(F.col("o_totalprice")))
    (v1, v2)
  }

  private def tempStore(s: SparkSession): graft.store.TableStore =
    new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-vdiff").toString, s)
}
