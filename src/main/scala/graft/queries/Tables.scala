package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.LongType

import graft.core.TableFrame

/** Shared testdata loader for the gate queries. The events table carries
  * ns-precision parquet timestamps which arrive as Long under
  * `spark.sql.legacy.parquet.nanosAsLong`; conversion uses integer division
  * (`ts div 1000`) — double division would lose sub-µs precision on
  * >2^53-ns epoch values. */
object Tables {
  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else df
  }

  def frame(s: SparkSession, dir: String, name: String): TableFrame =
    TableFrame.fromDF(load(s, dir, name))
}
