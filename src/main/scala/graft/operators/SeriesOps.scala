package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Ordered-series operators the reference's Polars surface exposes but
  * excludes from TableFrame (`interpolate`, `with_row_index`, `top_k`,
  * `merge_sorted`) — provided as scale-grade Spark formulations.
  */
object SeriesOps {
  /** Linear interpolation of nulls in `valueCol` along `orderCol`, per
    * `by` group (Polars `interpolate`): a null between two known points
    * gets the linear blend; leading/trailing nulls stay null.
    *
    * Two keyed window scans (prev non-null, next non-null) — one hash
    * shuffle + sort, no joins, no driver data. Empty `by` = global window
    * (single reducer; supply keys at scale). */
  def interpolate(df: DataFrame, valueCol: String, orderCol: String,
      by: Seq[String] = Nil, as: Option[String] = None): DataFrame = {
    val out = as.getOrElse(valueCol)
    val base = if (by.nonEmpty) Window.partitionBy(by.map(F.col): _*)
               else Window.partitionBy()
    val wb = base.orderBy(F.col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.orderBy(F.col(orderCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = F.col(valueCol).cast(DoubleType)
    val x = F.col(orderCol).cast(DoubleType)
    val knownX = F.when(F.col(valueCol).isNotNull, x)
    val prevV = F.last(v, ignoreNulls = true).over(wb)
    val prevX = F.last(knownX, ignoreNulls = true).over(wb)
    val nextV = F.first(v, ignoreNulls = true).over(wf)
    val nextX = F.first(knownX, ignoreNulls = true).over(wf)
    val blended = F.when(F.col(valueCol).isNotNull, v)
      .otherwise(prevV + (nextV - prevV) * (x - prevX) / (nextX - prevX))
    df.withColumn(out, blended)
  }

  /** Contiguous 0-based (or `offset`-based) row index along an explicit
    * order — the deterministic, distributed form of Polars
    * `with_row_index`. Reuses the ScalableRank machinery: range shuffle +
    * parallel local windows + broadcast partition offsets; no
    * single-reducer stage, no driver collect. */
  def withRowIndex(df: DataFrame, orderBy: Seq[String], as: String = "index",
      offset: Long = 0L): DataFrame = {
    require(orderBy.nonEmpty, "withRowIndex needs an explicit order at scale")
    ScalableRank.withRank(df, orderBy.head, as, "ordinal",
        tiebreakers = orderBy.tail)
      .withColumn(as, F.col(as) - 1L + offset)
  }

  /** Per-group top-k by `orderCol` (desc by default): keyed window
    * row_number + filter. Whole-frame top-k is just sort+limit
    * (TakeOrderedAndProject) — use `df.orderBy(...).limit(k)` for that. */
  def topKPerGroup(df: DataFrame, by: Seq[String], orderCol: String, k: Int,
      descending: Boolean = true, as: String = "rk",
      tiebreakers: Seq[String] = Nil): DataFrame = {
    val ord = (if (descending) F.col(orderCol).desc else F.col(orderCol).asc) +:
      tiebreakers.map(F.col(_).asc)
    val w = Window.partitionBy(by.map(F.col): _*).orderBy(ord: _*)
    df.withColumn(as, F.row_number().over(w))
      .filter(F.col(as) <= k)
  }

  /** Union of pre-sorted inputs, re-sorted on the key (Polars
    * `merge_sorted`). Spark's range-partitioned sort is the scalable merge;
    * there is no gain from exploiting pre-sortedness across distributed
    * files. */
  def mergeSorted(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).sort(F.col(key).asc)

  /** Resample an event stream onto a regular time grid: per key, one row
    * per `stepSeconds` bucket from the GLOBAL min bucket to the global
    * max, with `n` events and the `valueCol` sum per bucket — empty
    * buckets carry n = 0 and (with `locf = true`) the last observed sum
    * forward-filled, else NULL. The gap-filling step every dashboard /
    * feature-extraction pipeline needs before windowed math, done without
    * a driver loop:
    *
    *   - bucket = floor(epoch/step)·step in a row-local projection,
    *   - one keyed aggregation for the per-bucket sums,
    *   - the [min, max] bucket range as a broadcast 1-row relation,
    *   - the grid = distinct keys × `sequence(mn, mx, step)` exploded —
    *     per-key work is O(span/step), generated, never shuffled,
    *   - a left join of grid to sums co-partitioned on (key, bucket),
    *   - LOCF as a keyed running `last(ignoreNulls)` window.
    *
    * Output: keys ++ (bucket_epoch, n, value_sum) — the bucket as epoch
    * seconds, which is timezone-proof across engines. */
  def resample(df: DataFrame, tsCol: String, valueCol: String,
      stepSeconds: Long, keys: Seq[String], locf: Boolean = false): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    require(keys.nonEmpty, "resample needs at least one key column")
    val bucket = (F.floor(F.unix_timestamp(F.col(tsCol)) / stepSeconds) *
      stepSeconds).as("bucket_epoch")
    val agg = df.select(keys.map(F.col) :+ bucket :+ F.col(valueCol).as("$td.__v"): _*)
      .groupBy(keys.map(F.col) :+ F.col("bucket_epoch"): _*)
      .agg(F.count(F.lit(1)).as("$td.__n"), F.sum(F.col("`$td.__v`")).as("$td.__s"))
    val bounds = agg.agg(F.min("bucket_epoch").as("$td.__mn"),
      F.max("bucket_epoch").as("$td.__mx"))
    val grid = df.select(keys.map(F.col): _*).distinct()
      .crossJoin(F.broadcast(bounds))
      .select(keys.map(F.col) :+ F.explode(F.sequence(F.col("`$td.__mn`"),
        F.col("`$td.__mx`"), F.lit(stepSeconds))).as("bucket_epoch"): _*)
    val joined = grid.join(agg, keys :+ "bucket_epoch", "left")
      .withColumn("n", F.coalesce(F.col("`$td.__n`"), F.lit(0L)))
    val filled =
      if (!locf) joined.withColumn("value_sum", F.col("`$td.__s`"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(F.col): _*).orderBy(F.col("bucket_epoch"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        joined.withColumn("value_sum",
          F.last(F.col("`$td.__s`"), ignoreNulls = true).over(w))
      }
    filled.select(keys.map(F.col) ++
      Seq(F.col("bucket_epoch"), F.col("n"), F.col("value_sum")): _*)
  }
}
