package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join: left rows (a point column) against right
  * rows (lo/hi interval columns), `lo <= point <= hi`.
  *
  * Naive Spark plans this as BroadcastNestedLoopJoin (O(|L|·|R|) compares).
  * This formulation buckets the number line with width `bucketWidth`: a
  * point belongs to exactly one bucket; an interval is exploded to every
  * bucket it overlaps (`sequence(floor(lo/w), floor(hi/w))`). The join is
  * then a plain equi-join on (by..., bucket) — hash-shuffled, AQE-skew-
  * splittable, broadcastable — followed by the exact `BETWEEN` filter.
  * Each (point, interval) pair meets in exactly ONE bucket (the point's),
  * so no dedup pass is needed.
  *
  * Pick `bucketWidth` near the typical interval length: replication factor
  * is `len/width + 1` per interval, while bucket selectivity is `width`
  * worth of points — the classic time/space knob. At 100 TB both sides
  * stay fully distributed; nothing is collected or broadcast unless the
  * optimizer chooses to.
  */
object RangeJoin {
  def rangeJoin(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, by: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = "$td.__bucket"
    val l = left.withColumn(b,
      F.floor(F.col(pointCol).cast(LongType) / bucketWidth))
    val r = right.withColumn(b, F.explode(F.sequence(
      F.floor(F.col(loCol).cast(LongType) / bucketWidth),
      F.floor(F.col(hiCol).cast(LongType) / bucketWidth))))
    l.join(r, by :+ b)
      .filter(F.col(pointCol) >= F.col(loCol) && F.col(pointCol) <= F.col(hiCol))
      .drop(b)
  }
}
