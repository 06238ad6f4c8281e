package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.core.TableFrame

/** Shared testdata loader for the gate queries. The events table's `ts`
  * is normalized to TIMESTAMP (ltz; session tz is UTC so the instant is
  * unchanged) whatever the parquet delivered:
  *   - ns-precision int64 (legacy nanosAsLong reads): integer division
  *     `ts div 1000` — double division would lose sub-µs precision on
  *     >2^53-ns epoch values;
  *   - µs TIMESTAMP_NTZ (Spark 4 inferTimestampNTZ): plain cast — ltz is
  *     what watermarks (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`) and
  *     epoch-seconds casts downstream require. */
object Tables {
  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", F.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def frame(s: SparkSession, dir: String, name: String): TableFrame =
    TableFrame.fromDF(load(s, dir, name))
}
