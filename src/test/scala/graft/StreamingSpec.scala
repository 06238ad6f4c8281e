package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import TestSession.sf

  private def eventsBatch = spark.read.parquet(s"$sf/events.parquet")
    .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

  test("windowed streaming agg matches the batch computation") {
    val dir = Files.createTempDirectory("graft-stream-in")
    val batch = eventsBatch
    batch.write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema

    val stream = Streams.readParquetStream(spark, dir.toString, schema)
    val agg = Streams.windowedAgg(stream, "ts", "value",
      "1 hour", "1 hour", "10 minutes", "event_type")
    val q = Streams.runToMemory(agg, "win_counts", outputMode = "append")
    q.stop()

    val got = spark.table("win_counts")
      .select(F.col("window.start").as("ws"), F.col("event_type"), F.col("n"))
    val expected = batch
      .groupBy(F.window(F.col("ts"), "1 hour").as("window"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"))
      .select(F.col("window.start").as("ws"), F.col("event_type"), F.col("n"))
    // watermark may hold back the tail window in append mode; everything
    // emitted must match the batch result exactly
    val gotRows = got.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val expRows = expected.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(gotRows.nonEmpty)
    assert(gotRows.subsetOf(expRows))
  }

  test("streaming sessionization matches the batch session_window computation") {
    val dir = Files.createTempDirectory("graft-stream-sess")
    val batch = eventsBatch.select("user_id", "ts")
    batch.write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema

    val stream = Streams.readParquetStream(spark, dir.toString, schema)
    val sess = Streams.sessionAgg(stream, "ts", "30 minutes", "1 hour", "user_id")
    val q = Streams.runToMemory(sess, "sess_stream", outputMode = "append")
    q.stop()

    val expected = batch
      .groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
      .agg(F.count(F.lit(1)).as("n_events"), F.max("ts").as("last_ts"))
      .select(F.col("user_id"), F.col("session_window.start").as("session_start"),
        F.col("last_ts"), F.col("n_events"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val got = rows(spark.table("sess_stream"))
    val exp = rows(expected)
    // append mode finalizes sessions as the watermark passes; everything
    // emitted must be a batch session, and nearly all sessions must emit
    // (only sessions ending within the final watermark delay are held back)
    assert(got.nonEmpty)
    assert(got.subsetOf(exp))
    assert(got.size >= (exp.size * 9) / 10, s"${got.size} of ${exp.size} emitted")
  }

  test("store table versions stream as micro-batches") {
    val store = new graft.store.TableStore(
      java.nio.file.Files.createTempDirectory("graft-stream-store").toString, spark)
    import spark.implicits._
    store.write("c", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.write("c", "t", Seq((3L, "c")).toDF("id", "v"))
    val stream = Streams.tableStream(store, "c", "t")
      .select("id", "v")
    val q = Streams.runToMemory(stream, "store_stream")
    q.stop()
    // both committed versions' rows arrive through the stream
    assert(spark.table("store_stream").count() == 3)
  }

  test("stateful running totals via mapGroupsWithState") {
    import spark.implicits._
    val ds = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)).toDS()
    val out = Streams.runningTotals(ds).collect().map(s => s.key -> (s.events, s.valueSum)).toMap
    assert(out("a") == (2L, 4.0))
    assert(out("b") == (1L, 2.0))
  }

  test("streaming near-dup: rewrites flagged against the min-id canonical; differential vs batch band index") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sleepy badgers watch from a mossy log near the winding river path today"
    val docs = Seq(
      (0L, base),
      (1L, base + " appended audit note"),        // near-dup of 0
      (2L, "completely different content about tax accounting rules and " +
        "quarterly depreciation schedules for industrial machinery assets"),
      (3L, base)                                   // exact copy of 0
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-stream-ndup")
    docs.write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = Streams.readParquetStream(spark, dir.toString, schema)
    val verdicts = Streams.nearDupVerdicts(
      Streams.nearDupHits(stream, "text", "doc_id"), minEst = 0.5)
    val q = Streams.runToMemory(verdicts, "ndup_verdicts", "complete")
    q.stop()
    val got = spark.table("ndup_verdicts").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // doc 0 is the canonical: clean. Exact copy 3 matches it at est 1.0.
    assert(got(0L) == ((-1L, 0.0, false)))
    assert(got(3L) == ((0L, 1.0, true)))
    // the rewrite shares most signature slots with the canonical
    assert(got(1L)._1 == 0L && got(1L)._2 >= 0.5 && got(1L)._3)
    // unrelated doc lands in fresh buckets
    assert(got(2L) == ((-1L, 0.0, false)))

    // differential vs the batch band index: a doc has a streaming match
    // iff it shares >=1 (band, bh) bucket with a lower-id doc
    val index = graft.pipeline.Dedup.minhashBandIndex(docs, "text", "doc_id")
    val batchCand = index.as("x").join(index.as("y"), Seq("band", "bh"))
      .where(F.col("x.id") < F.col("y.id"))
      .select(F.col("y.id").as("id")).distinct()
      .as[Long].collect().toSet
    val streamCand = got.filter { case (_, (m, _, _)) => m >= 0 }.keySet
    assert(streamCand == batchCand)
  }

  test("pub/sub piping: stream a table dir into a sink dir") {
    val in = Files.createTempDirectory("graft-pipe-in")
    val out = Files.createTempDirectory("graft-pipe-out")
    val ckpt = Files.createTempDirectory("graft-pipe-ckpt")
    eventsBatch.limit(100).write.mode("overwrite").parquet(in.toString)
    val schema = spark.read.parquet(in.toString).schema
    val stream = Streams.readParquetStream(spark, in.toString, schema)
      .filter(F.col("event_type") === "click")
    val q = Streams.pipeToParquet(stream, out.toString, ckpt.toString)
    q.processAllAvailable(); q.stop()
    val expected = spark.read.parquet(in.toString)
      .filter(F.col("event_type") === "click").count()
    assert(spark.read.parquet(out.toString).count() == expected)
  }
}
