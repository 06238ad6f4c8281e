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
}
