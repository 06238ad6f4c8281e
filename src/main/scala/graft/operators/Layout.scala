package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Z-order (Morton) clustering for scan
  * pruning (Morton 1966; the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` — public methodology).
  *
  * Why it matters at 100 TB: parquet readers prune row groups and files by
  * min/max column statistics. A corpus sorted by ONE column prunes only
  * filters on that column; interleaving the bits of k quantized columns
  * into one sort key gives every participating column locality, so a
  * selective filter on ANY of them skips most files. The operator is
  * layout-only — it never changes row contents, so correctness gates
  * compare the key itself.
  *
  * Everything is row-local arithmetic on exact integers after one
  * quantization step (two correctly-rounded IEEE double ops + floor), so
  * the key is bit-reproducible across engines, partitionings, and runs —
  * the q_zorder_key gate is a full value-hash oracle against DuckDB's
  * identical expression.
  */
object ZOrder {

  /** Quantize `x` into `[0, 2^bits)` given closed bounds `[lo, hi]` —
    * values outside the bounds clamp to the edge buckets. Exactly
    * `floor(((clamp(x) - lo) / (hi - lo)) * (2^bits - 1))`: two IEEE
    * divisions/multiplications then an explicit floor, the same sequence
    * the SQL oracle performs (floor-then-cast is exact; a bare BIGINT cast
    * would truncate in Spark but round in DuckDB). */
  def quantize(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits per dimension must be in [1,20], got $bits")
    require(hi > lo, s"bounds must satisfy hi > lo, got [$lo, $hi]")
    val m = (1L << bits) - 1
    val clamped = F.least(F.greatest(x.cast("double"), F.lit(lo)), F.lit(hi))
    F.floor((clamped - F.lit(lo)) / F.lit(hi - lo) * F.lit(m.toDouble))
      .cast(LongType)
  }

  /** The Morton key: bit b of quantized dimension j lands at position
    * `b * n + j` of the key. `bits * cols.size` must fit in a signed long
    * (≤ 62). The expression is a flat sum of `bits × n` shift/mask terms —
    * all codegen'd integer ops, zero shuffle, zero UDF. */
  def zKey(cols: Seq[Column], bounds: Seq[(Double, Double)], bits: Int): Column = {
    require(cols.nonEmpty, "zKey needs at least one column")
    require(cols.size == bounds.size,
      s"got ${cols.size} columns but ${bounds.size} bounds")
    require(bits * cols.size <= 62,
      s"key width ${bits * cols.size} exceeds 62 bits")
    val n = cols.size
    val qs = cols.zip(bounds).map { case (c, (lo, hi)) => quantize(c, lo, hi, bits) }
    val terms = for {
      b <- 0 until bits
      (q, j) <- qs.zipWithIndex
    } yield F.shiftleft(
      F.shiftrightunsigned(q, b).bitwiseAND(F.lit(1L)), b * n + j)
    terms.reduce(_ + _).cast(LongType)
  }

  /** Cluster `df` for multi-dimensional scan pruning: append the Z-key,
    * range-repartition on it (Spark samples split points — the only global
    * movement is the one shuffle any re-layout needs), and sort each
    * partition by the key so a subsequent parquet write produces files
    * whose min/max envelopes are tight in EVERY participating dimension.
    * The key column (`zOrderCol`) is kept so writers can verify layout or
    * partition further; drop it after the write if unwanted. */
  def clusterByZOrder(df: DataFrame, colNames: Seq[String],
      bounds: Seq[(Double, Double)], bits: Int = 8,
      numPartitions: Option[Int] = None,
      zOrderCol: String = "z_key"): DataFrame = {
    val keyed = df.withColumn(zOrderCol,
      zKey(colNames.map(F.col), bounds, bits))
    val parted = numPartitions match {
      case Some(p) => keyed.repartitionByRange(p, F.col(zOrderCol))
      case None    => keyed.repartitionByRange(F.col(zOrderCol))
    }
    parted.sortWithinPartitions(zOrderCol)
  }
}
