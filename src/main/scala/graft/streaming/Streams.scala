package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming layer.
  *
  * The reference's "streaming" is micro-batch pub/sub of table versions plus
  * incremental source offsets (SURVEY §2.9) — no watermarks or event-time
  * state of its own. Here that maps onto Structured Streaming: a table
  * directory is a file-stream source (each committed version directory's
  * files become a micro-batch), transforms are ordinary DataFrame logic, and
  * sinks ride `writeStream`. Beyond parity we expose the event-time
  * machinery a training-data pipeline needs: watermarked windowed
  * aggregation and keyed session state.
  */
object Streams {
  /** Stream a directory of parquet (e.g. a store table's version dirs via
    * glob). Schema must be supplied — streaming sources don't infer. */
  def readParquetStream(spark: SparkSession, pathGlob: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(pathGlob)

  /** Continuous pub/sub source over a versioned store table: every committed
    * version directory's files surface as a micro-batch (the streaming analog
    * of the reference's version-commit triggers). Schema comes from the
    * current HEAD.
    *
    * Visibility: the store stages version data under a dot-prefixed
    * `.staging` dir (hidden from Spark's file listing) and moves it into the
    * table dir only at transaction commit, so this glob sees committed
    * versions exclusively — staged, aborted, or orphaned writes never
    * surface as micro-batches. */
  def tableStream(store: graft.store.TableStore, collection: String,
      table: String, maxFilesPerTrigger: Int = 100): DataFrame = {
    val head = store.scan(s"$collection/$table").getOrElse(
      throw new IllegalArgumentException(s"no committed versions in $collection/$table"))
    val spark = head.df.sparkSession
    // version dirs are UUIDv7 (hex-leading), so this glob structurally
    // excludes the `_log.jsonl` sibling and the `.staging` dir rather than
    // relying on Spark's hidden-file filtering of `_`/`.` prefixes
    spark.readStream.schema(head.df.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"${store.root}/$collection/$table/[0-9a-f]*")
  }

  /** Watermarked sliding-window aggregation: count + sum(valueCol) per
    * (window, keys). Late data beyond the watermark is dropped — state stays
    * bounded no matter how long the stream runs. */
  def windowedAgg(df: DataFrame, tsCol: String, valueCol: String,
      window: String, slide: String, watermark: String, keys: String*): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(F.window(F.col(tsCol), window, slide) +: keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n"), F.sum(F.col(valueCol)).as("value_sum"))

  /** Gap-based streaming sessionization: the streaming face of the batch
    * `session_window` operator (q_sessionize) — a session extends while
    * consecutive events per key arrive < gap apart. Under append mode the
    * watermark both finalizes sessions and bounds state; StreamingSpec
    * proves the emitted sessions equal the batch computation. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: String*): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(F.session_window(F.col(tsCol), gap) +: keys.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_events"), F.max(F.col(tsCol)).as("last_ts"))
      .select(keys.map(F.col) ++ Seq(
        F.col("session_window.start").as("session_start"),
        F.col("last_ts"), F.col("n_events")): _*)

  /** Run a (bounded) streaming query into an in-memory table and block until
    * all available input is processed — the micro-batch harness used by the
    * local tests and the pub/sub continuous mode. */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name").toString)
      .start()
    q.processAllAvailable()
    q
  }

  /** Continuous pub/sub: stream a source table directory into a sink
    * directory as parquet micro-batches. */
  def pipeToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  final case class SessionUpdate(key: String, events: Long, valueSum: Double)

  /** Keyed running state via mapGroupsWithState: per-key event count and
    * value sum, updated each micro-batch (the custom-state escape hatch —
    * KeyValueGroupedDataset.mapGroupsWithState). */
  def runningTotals(ds: Dataset[(String, Double)]): Dataset[SessionUpdate] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[SessionUpdate, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[SessionUpdate]) =>
          val prev = state.getOption.getOrElse(SessionUpdate(key, 0L, 0.0))
          var n = prev.events
          var s = prev.valueSum
          rows.foreach { r => n += 1; s += r._2 }
          val next = SessionUpdate(key, n, s)
          state.update(next)
          next
      }
  }
}
