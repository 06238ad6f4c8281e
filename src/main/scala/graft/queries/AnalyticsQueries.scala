package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.core.TableFrame
import graft.td

/** Full analytical query shapes (TPC-H Q3/Q5/Q10 silhouettes over the
  * driver's TPC-H-ish tables) plus streaming exact dedup. These exercise
  * multi-way join planning end-to-end: dimension sides are broadcast, the
  * fact-side filters sit in the parquet scan (PlanSpec asserts both), and
  * revenue sums run in exact DECIMAL so the oracle hash-matches.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): TableFrame =
    TableFrame.fromDF(Tables.load(s, dir, name))

  /** extendedprice * (1 - discount) in exact decimal (order-independent sum). */
  private def revenue: org.apache.spark.sql.Column =
    F.col("l_extendedprice").cast(DecimalType(18, 2)) *
      (F.lit(1).cast(DecimalType(18, 2)) -
        F.col("l_discount").cast(DecimalType(18, 2)))

  val queries: Map[String, Q] = Map(
    // Q1 proper: the full pricing-summary report (sum/avg per flag+status
    // over a shipdate horizon) in exact DECIMAL so every aggregate is
    // order-independent and the oracle hash-matches
    "q_tpch_q1" -> ((s, dir) => {
      val dec = DecimalType(18, 2)
      val one = F.lit(1).cast(dec)
      val disc = F.col("l_discount").cast(dec)
      val price = F.col("l_extendedprice").cast(dec)
      val tax = F.col("l_tax").cast(dec)
      t(s, dir, "lineitem").df
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          F.sum(F.col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
          F.sum(price).cast(DoubleType).as("sum_base_price"),
          F.sum(price * (one - disc)).cast(DoubleType).as("sum_disc_price"),
          F.sum(price * (one - disc) * (one + tax)).cast(DoubleType).as("sum_charge"),
          (F.sum(F.col("l_quantity").cast(dec)).cast(DoubleType) /
            F.count(F.lit(1))).as("avg_qty"),
          (F.sum(price).cast(DoubleType) / F.count(F.lit(1))).as("avg_price"),
          (F.sum(disc).cast(DoubleType) / F.count(F.lit(1))).as("avg_disc"),
          F.count(F.lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // Q6 proper: the forecasting-revenue-change filter-and-sum — the
    // selective-scan shape whose filters must ALL reach the parquet scan
    "q_tpch_q6" -> ((s, dir) => {
      val dec = DecimalType(18, 2)
      t(s, dir, "lineitem").df
        .filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast(TimestampType) &&
          F.col("l_shipdate") < F.lit("1997-01-01").cast(TimestampType) &&
          F.col("l_discount").between(0.03, 0.07) &&
          F.col("l_quantity") < 24)
        .agg(F.sum(F.col("l_extendedprice").cast(dec) *
            F.col("l_discount").cast(dec)).cast(DoubleType).as("revenue"),
          F.count(F.lit(1)).as("n_rows"))
    }),
    // Q3 silhouette: segment customers' urgent unshipped orders by revenue
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = F.lit("1995-06-01").cast(TimestampType)
      val cust = t(s, dir, "customer")
        .filter(td.col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(td.col("o_orderdate") < cutoff)
      val li = t(s, dir, "lineitem").filter(td.col("l_shipdate") > cutoff)
      li.join(ord, leftOn = Seq("l_orderkey"), rightOn = Seq("o_orderkey"))
        .join(cust, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
          broadcastRight = true)
        .df
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").as("rev"))
        .orderBy(F.col("rev").desc, F.col("l_orderkey").asc)
        .limit(10)
    }),
    // Q5 silhouette: revenue by nation for one region/year, suppliers local
    // to the customer's nation
    "q_tpch_q5" -> ((s, dir) => {
      // 1996 window: the driver's o_orderdate spans 1995-01..2001-08, so
      // this selects a real slice (the classic 1994 window would be empty
      // here and the gate vacuous).
      val y0 = F.lit("1996-01-01").cast(TimestampType)
      val y1 = F.lit("1997-01-01").cast(TimestampType)
      val region = t(s, dir, "region").filter(td.col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
        .join(region, leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"),
          broadcastRight = true)
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(td.col("o_orderdate") >= y0, td.col("o_orderdate") < y1)
      val supp = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
      li.join(ord, leftOn = Seq("l_orderkey"), rightOn = Seq("o_orderkey"))
        .join(supp, leftOn = Seq("l_suppkey"), rightOn = Seq("s_suppkey"),
          broadcastRight = true)
        .join(cust, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
        .filter(graft.core.Expr(F.col("c_nationkey") === F.col("s_nationkey")))
        .join(nation, leftOn = Seq("s_nationkey"), rightOn = Seq("n_nationkey"),
          broadcastRight = true)
        .df
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").as("rev"))
        .orderBy(F.col("rev").desc, F.col("n_name").asc)
    }),
    // Q10 silhouette: revenue lost to returned items per customer
    "q_tpch_q10" -> ((s, dir) => {
      // In-range quarter (see q_tpch_q5 note on the data's date span).
      val q0 = F.lit("1996-10-01").cast(TimestampType)
      val q1 = F.lit("1997-01-01").cast(TimestampType)
      val ord = t(s, dir, "orders")
        .filter(td.col("o_orderdate") >= q0, td.col("o_orderdate") < q1)
      val li = t(s, dir, "lineitem").filter(td.col("l_returnflag") === "R")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      li.join(ord, leftOn = Seq("l_orderkey"), rightOn = Seq("o_orderkey"))
        .join(cust, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
        .join(nation, leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"),
          broadcastRight = true)
        .df
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").as("rev"))
        .orderBy(F.col("rev").desc, F.col("c_custkey").asc)
        .limit(20)
    }),
    // Q18 silhouette: large-volume customers — orders whose total quantity
    // clears a threshold, via a semi-join against an aggregated subquery
    // (the distinctive Q18 plan shape: agg → semi-join → re-agg). Quantity
    // sums run in exact DECIMAL so the double cast at the end is
    // order-independent; threshold 300 selects ~0.1% of orders in the
    // driver's data (verified non-vacuous at sf0.01 and sf0.1).
    "q_tpch_q18" -> ((s, dir) => {
      val qty = F.sum(F.col("l_quantity").cast(DecimalType(18, 2)))
      val li = t(s, dir, "lineitem")
      val big = TableFrame.fromDF(
        li.df.groupBy("l_orderkey").agg(qty.as("oq"))
          .where(F.col("oq") > 300).select("l_orderkey"))
      li.join(big, leftOn = Seq("l_orderkey"), rightOn = Seq("l_orderkey"),
          how = "semi")
        .join(t(s, dir, "orders"), leftOn = Seq("l_orderkey"),
          rightOn = Seq("o_orderkey"))
        .join(t(s, dir, "customer"), leftOn = Seq("o_custkey"),
          rightOn = Seq("c_custkey"))
        .df
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(qty.cast("double").as("total_qty"))
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
        .limit(100)
    }),
    // Gap-based sessionization via Spark's native session_window: a
    // session extends while consecutive events are < gap apart; the
    // oracle reproduces it with lag + running-sum window SQL. The
    // session_window operator is the batch face of the streaming state
    // machine — same semantics under a watermark in readStream mode.
    "q_sessionize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
        .agg(
          F.count(F.lit(1)).as("n_events"),
          F.max(F.col("ts")).as("last_ts"))
        .select(
          F.col("user_id"),
          F.col("session_window.start").as("session_start"),
          F.col("last_ts"),
          F.col("n_events"))
        .orderBy("user_id", "session_start")
    }),
    // Watermarked stream-stream interval join: each event matched to
    // later events of the same user within 30 minutes, both sides
    // streaming with 1-hour watermarks (the state-cleanup contract a
    // 100 TB stream needs), AvailableNow to bound the run. Inner interval
    // joins emit each pair exactly once, so the post-hoc aggregate is
    // deterministic and oracle-checkable.
    "q_stream_join" -> ((s, dir) => {
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events-ids",
        Tables.load(s, dir, "events").select("event_id", "user_id", "ts"))
      def side(prefix: String) =
        graft.streaming.Streams.readParquetStream(s, tmp, schema)
          .select(
            F.col("event_id").as(s"${prefix}_id"),
            F.col("user_id").as(s"${prefix}_user"),
            F.col("ts").as(s"${prefix}_ts"))
          .withWatermark(s"${prefix}_ts", "1 hour")
      val joined = side("a").join(side("b"),
        F.expr("""a_user = b_user
                 |AND b_ts >= a_ts AND b_ts <= a_ts + interval 30 minutes
                 |AND a_id < b_id""".stripMargin))
        .select(F.col("a_user").as("user_id"))
      graft.streaming.StreamStage.runToMemory(joined, "q_stream_join_", "append")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),
    // Stream-static enrichment join: the streaming side joins a broadcast
    // dimension table (no state, no watermark needed — the static side is
    // re-read per micro-batch). Value sums run in exact integer cents so
    // the aggregate is order-independent and oracle-checkable.
    "q_stream_enrich" -> ((s, dir) => {
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/events",
        Tables.load(s, dir, "events"))
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val cust = Tables.load(s, dir, "customer")
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
      val joined = stream
        .join(F.broadcast(cust), F.col("user_id") === F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).as("n_events"),
          F.sum(F.floor(F.col("value") * 100).cast("long")).as("value_cents"))
      graft.streaming.StreamStage.runToMemory(joined, "q_stream_enrich_", "complete")
        .orderBy("c_mktsegment")
    }),
    // Streaming curation composition: content dedup + the TextQualityStats
    // kernel + linear score filter, all inside one micro-batch plan — the
    // custom Catalyst expression proving itself under Structured Streaming.
    // The staged input re-delivers ids <100 under shifted ids so the
    // streaming dedup has real work; copies share text (and lang), so the
    // per-lang aggregate is invariant to which copy survives and the batch
    // oracle can hash-match.
    "q_stream_quality" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val staged = docs.select("doc_id", "lang", "text")
        .unionAll(docs.where(F.col("doc_id") < 100)
          .select((F.col("doc_id") + 10000).as("doc_id"),
            F.col("lang"), F.col("text")))
      val (tmp, schema) = graft.streaming.StreamStage.stage(s,
        s"$dir/documents-dup", staged)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val curated = graft.pipeline.QualityFilters.withQualityScore(
          stream.withColumn("h", F.md5(F.col("text"))).dropDuplicates("h"),
          "text", keep = Seq("doc_id", "lang"))
        .where(F.col("passes_quality"))
        .groupBy("lang").agg(F.count(F.lit(1)).as("n_quality_docs"))
      graft.streaming.StreamStage.runToMemory(curated, "q_stream_quality_",
        "complete").orderBy("lang")
    }),
    // Streaming exact dedup: the corpus-dedup counter run THROUGH
    // Structured Streaming (AvailableNow over a parquet stream,
    // dropDuplicates on the content hash). Emits a deterministic aggregate
    // so the oracle can hash-match.
    "q_stream_dedup" -> ((s, dir) => {
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/documents",
        Tables.load(s, dir, "documents"))
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val deduped = stream
        .withColumn("h", F.md5(F.col("text")))
        .dropDuplicates("lang", "h") // per-lang content dedup: deterministic
        .groupBy(F.col("lang"))
        .agg(F.count(F.lit(1)).as("n_unique_docs"))
      graft.streaming.StreamStage.runToMemory(deduped, "q_stream_dedup_", "complete")
        .orderBy("lang")
    }),
    // Streaming NEAR-dup at ingestion: stateful LSH buckets flag each
    // arriving rewrite against its bucket's min-id canonical with the
    // Broder slot-match estimate. Estimates are xxhash64-seeded →
    // rows-only check; StreamingSpec holds the batch-band-index
    // differential. Corpus: documents + appended-suffix rewrites of ids
    // < 100 (guaranteed near-dups of their sources).
    "q_stream_neardup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.unionAll(
        docs.where(F.col("doc_id") < 100)
          .select((F.col("doc_id") + 10000).as("doc_id"),
            F.concat(F.col("text"), F.lit(" trailing audit note")).as("text")))
      val (tmp, schema) = graft.streaming.StreamStage.stage(s, s"$dir/documents_ndup",
        corpus)
      val stream = graft.streaming.Streams.readParquetStream(s, tmp, schema)
      val verdicts = graft.streaming.Streams.nearDupVerdicts(
        graft.streaming.Streams.nearDupHits(stream, "text", "doc_id"), minEst = 0.5)
      graft.streaming.StreamStage.runToMemory(verdicts, "q_stream_neardup_", "complete")
        .orderBy("id")
    })
  )
}
