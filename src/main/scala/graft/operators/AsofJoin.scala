package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** As-of join (the time-series "most recent value at or before t" join the
  * reference's Polars surface exposes as `join_asof`; excluded from the
  * TableFrame API there, provided here as a scale operator).
  *
  * Spark-first formulation: NOT a join at all. Tag both inputs, union them,
  * and run a keyed window pass — `last(value, ignoreNulls)` over
  * (key, time, side) order answers "latest right row at or before this left
  * row" in one hash shuffle by `by` + one sort, with no join, no range
  * multiplication, and map-side-combinable everything. A sort-merge or
  * broadcast range join would touch the same rows more times.
  *
  * Strategies (Polars semantics): backward = last right row with
  * `r.on <= l.on`; forward = first right row with `r.on >= l.on`;
  * nearest = whichever of the two is closer (ties → backward).
  * `toleranceMax` (same units as the cast-to-long `on` column) nulls the
  * match when `|l.on - r.on|` exceeds it.
  *
  * Scale note: with non-empty `by`, parallelism is the number of key groups
  * (each group's window runs on one task — same contract as any keyed
  * window). An empty `by` degenerates to a single-reducer global window;
  * prefer supplying keys at scale.
  */
object AsofJoin {
  def asofJoin(left: DataFrame, right: DataFrame, on: String,
      by: Seq[String] = Nil, strategy: String = "backward",
      toleranceMax: Option[Long] = None, suffix: String = "_right"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(strategy),
      s"asof strategy: $strategy")
    val leftCols = left.columns.toSeq
    val rightVals = right.columns.toSeq.filterNot(c => c == on || by.contains(c))
    // output names for right value columns (suffix on collision with left)
    val outName: Map[String, String] =
      rightVals.map(c => c -> (if (leftCols.contains(c)) c + suffix else c)).toMap

    val ts = "$td.__asof_ts"
    val side = "$td.__asof_side" // 0 = right, 1 = left
    val rts = "$td.__asof_rts"   // right row's own ts (for tolerance/nearest)

    def typedNull(df: DataFrame, c: String): Column =
      F.lit(null).cast(df.schema(c).dataType)
    def bq(n: String): Column = F.col(s"`$n`")

    val lTagged = left
      .withColumn(ts, F.col(on))
      .withColumn(side, F.lit(1))
      .withColumn(rts, F.lit(null).cast(left.schema(on).dataType))
      .select((by.map(F.col) ++ Seq(bq(ts), bq(side), bq(rts)) ++
        leftCols.filterNot(by.contains).map(F.col) ++
        rightVals.map(c => typedNull(right, c).as(outName(c)))): _*)
    val rTagged = right
      .withColumn(ts, F.col(on))
      .withColumn(side, F.lit(0))
      .withColumn(rts, F.col(on))
      .select((by.map(F.col) ++ Seq(bq(ts), bq(side), bq(rts)) ++
        leftCols.filterNot(by.contains).map(c => typedNull(left, c).as(c)) ++
        rightVals.map(c => F.col(c).as(outName(c)))): _*)
    val unioned = lTagged.unionByName(rTagged)

    def keyed: WindowSpec =
      if (by.nonEmpty) Window.partitionBy(by.map(F.col): _*) else Window.partitionBy()

    // backward scan: right rows sort BEFORE left rows at equal ts so an
    // equal-timestamp right row is visible to the left row's frame
    val wBack = keyed.orderBy(bq(ts).asc, bq(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward scan: left rows sort before right rows at equal ts
    val wFwd = keyed.orderBy(bq(ts).asc, bq(side).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def pass(df: DataFrame, w: WindowSpec, pick: Column => Column,
        tag: String): DataFrame = {
      val withTs = df.withColumn(s"$rts$tag", pick(bq(rts)).over(w))
      rightVals.foldLeft(withTs) { (d, c) =>
        d.withColumn(outName(c) + tag, pick(bq(outName(c))).over(w))
      }
    }

    val scanned = strategy match {
      case "backward" => pass(unioned, wBack, c => F.last(c, ignoreNulls = true), "@b")
      case "forward"  => pass(unioned, wFwd, c => F.first(c, ignoreNulls = true), "@f")
      case "nearest" =>
        pass(pass(unioned, wBack, c => F.last(c, ignoreNulls = true), "@b"),
          wFwd, c => F.first(c, ignoreNulls = true), "@f")
    }

    def dist(tag: String): Column =
      F.abs(bq(ts).cast("long") - bq(s"$rts$tag").cast("long"))
    // which side wins per row: for nearest, closer timestamp, ties backward
    val useBack: Column = strategy match {
      case "backward" => F.lit(true)
      case "forward"  => F.lit(false)
      case "nearest" =>
        bq(s"$rts@f").isNull ||
          (bq(s"$rts@b").isNotNull && dist("@b") <= dist("@f"))
    }
    val tag = strategy match { case "forward" => "@f"; case _ => "@b" }
    val within: Column = toleranceMax match {
      case Some(t) =>
        val d = strategy match {
          case "backward" => dist("@b")
          case "forward"  => dist("@f")
          case "nearest"  => F.when(useBack, dist("@b")).otherwise(dist("@f"))
        }
        d.isNotNull && d <= t
      case None => F.lit(true)
    }

    val out = rightVals.foldLeft(scanned) { (d, c) =>
      val matched = if (strategy == "nearest")
        F.when(useBack, bq(outName(c) + "@b")).otherwise(bq(outName(c) + "@f"))
      else bq(outName(c) + tag)
      d.withColumn(outName(c), F.when(within, matched))
    }
    out.filter(bq(side) === 1)
      .select((leftCols.map(F.col) ++ rightVals.map(c => bq(outName(c)))): _*)
  }
}
