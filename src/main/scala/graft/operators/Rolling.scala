package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Time/value-range rolling aggregation and dynamic (tumbling) group-by —
  * the reference's Polars surface has `rolling` and `group_by_dynamic`
  * (excluded from TableFrame); these are the Spark-native equivalents.
  *
  * `rolling`: per key, a right-closed trailing window of `period` index
  * units ending at each row — `RANGE BETWEEN period-1 PRECEDING AND CURRENT
  * ROW` over the index cast to long. Catalyst executes this as one keyed
  * window (hash shuffle by key, sort by index); parallelism = key groups.
  *
  * `groupByDynamic`: tumbling buckets of width `every` starting at
  * `offset` — a plain groupBy on `floor((idx - offset)/every)`, fully
  * map-side combinable; at scale this is just an aggregation, never a
  * window.
  */
object Rolling {
  /** Append rolling aggregates over a trailing range window.
    * `aggs` maps output name → builder over (valueCol, windowSpec); the
    * builder applies `.over(w)` itself so post-window transforms (casts,
    * arithmetic) compose, e.g. `"s" -> ((c, w) => F.sum(c).over(w))`. */
  def rolling(df: DataFrame, indexCol: String, period: Long,
      by: Seq[String], valueCol: String,
      aggs: Map[String, (Column, org.apache.spark.sql.expressions.WindowSpec) => Column])
      : DataFrame = {
    require(period > 0, "period must be positive")
    val idx = F.col(indexCol).cast(LongType)
    val base = if (by.nonEmpty) Window.partitionBy(by.map(F.col): _*)
               else Window.partitionBy()
    val w = base.orderBy(idx).rangeBetween(-(period - 1), Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, agg)) =>
      d.withColumn(name, agg(F.col(valueCol), w))
    }
  }

  /** Tumbling-window aggregation: one output row per (by..., bucket) with
    * the bucket's inclusive start in `bucketStartCol`. */
  def groupByDynamic(df: DataFrame, indexCol: String, every: Long,
      by: Seq[String], aggs: Seq[Column], offset: Long = 0L,
      bucketStartCol: String = "bucket_start"): DataFrame = {
    require(every > 0, "every must be positive")
    val idx = F.col(indexCol).cast(LongType)
    val bucket = F.floor((idx - offset) / every)
    df.withColumn(bucketStartCol, bucket * every + offset)
      .groupBy((by.map(F.col) :+ F.col(bucketStartCol)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
