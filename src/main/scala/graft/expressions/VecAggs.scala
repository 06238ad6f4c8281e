package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Aggregate kernels for the sketch family's two hot shapes (r17
  * optimization round):
  *
  *   - [[LongVecFoldAgg]] — elementwise fold (exact sum / bitwise OR) of
  *     dense long arrays. Replaces the posexplode → groupBy(position) →
  *     map_from_entries → transform(element_at) rebuild in the sketch
  *     merges, which exploded every width-length array into one row per
  *     cell (the CMS merge at sf0.1: 737k intermediate rows for a
  *     4×256-cell result) and then paid an O(width · entries) linear map
  *     probe per rebuilt array. Addition and OR are commutative-exact, so
  *     any partitioning/merge order gives identical arrays; sum overflow
  *     raises (the ANSI `sum(long)` contract).
  *   - [[ScatterLongAgg]] — dense width-array from sparse (pos, value)
  *     cell rows: out[pos] = value, absent cells = 0. Replaces the
  *     collect_list → map_from_entries → transform(element_at) pivot
  *     (same O(width · entries) probe). Duplicate positions raise, like
  *     map_from_entries under the default EXCEPTION dedup policy; a NULL
  *     value marks the cell seen but leaves 0 — exactly what
  *     coalesce(element_at(map, i), 0) read out of a null map value.
  *
  * Both return array<long> values bit-identical to the formulations they
  * replace (full-oracle gates: q_cms_*, q_stream_freq/bloom/drift, the
  * quantile-sketch roll-ups).
  */
final class LongVecBuf extends Serializable {
  var vals: Array[Long] = Array.emptyLongArray

  @inline def grow(n: Int): Unit =
    if (n > vals.length) vals = java.util.Arrays.copyOf(vals, n)
}

case class LongVecFoldAgg(child: Expression, isOr: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongVecBuf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (isOr) "long_vec_or" else "long_vec_sum"

  override def createAggregationBuffer(): LongVecBuf = new LongVecBuf

  override def update(buf: LongVecBuf, row: InternalRow): LongVecBuf = {
    val v = child.eval(row)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          if (isOr) buf.vals(i) |= a.getLong(i)
          else buf.vals(i) = Math.addExact(buf.vals(i), a.getLong(i))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: LongVecBuf, other: LongVecBuf): LongVecBuf = {
    buf.grow(other.vals.length)
    var i = 0
    while (i < other.vals.length) {
      if (isOr) buf.vals(i) |= other.vals(i)
      else buf.vals(i) = Math.addExact(buf.vals(i), other.vals(i))
      i += 1
    }
    buf
  }

  override def eval(buf: LongVecBuf): Any = new GenericArrayData(buf.vals)

  override def serialize(buf: LongVecBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.vals.length)
    bb.putInt(buf.vals.length)
    buf.vals.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVecBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new LongVecBuf
    b.vals = Array.fill(n)(bb.getLong)
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): LongVecFoldAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): LongVecFoldAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): LongVecFoldAgg = copy(child = c.head)
}

final class ScatterBuf(width: Int) extends Serializable {
  val vals: Array[Long] = new Array[Long](width)
  val seen: java.util.BitSet = new java.util.BitSet(width)
}

case class ScatterLongAgg(posChild: Expression, valChild: Expression,
    width: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ScatterBuf] {
  require(width >= 1, s"scatter width must be >= 1, got $width")

  override def children: Seq[Expression] = posChild :: valChild :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "scatter_long"

  override def createAggregationBuffer(): ScatterBuf = new ScatterBuf(width)

  private def posOf(p: Any): Int = p match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long =>
      // intValue() would wrap mod 2^32: a corrupt upstream bin like 2^32+5
      // must raise (the duplicate-cell loud-failure style), never scatter
      // into cell 5. The documented ignore below stays for in-int-range
      // positions outside [0, width).
      if (l.longValue() < Int.MinValue || l.longValue() > Int.MaxValue)
        throw new RuntimeException(
          s"scatter_long: position $l outside int range (corrupt sketch cell)")
      else l.intValue()
    case s: java.lang.Short => s.intValue()
    case other => throw new IllegalArgumentException(
      s"scatter_long position must be integral, got $other")
  }

  override def update(buf: ScatterBuf, row: InternalRow): ScatterBuf = {
    val p = posChild.eval(row)
    if (p != null) {
      val i = posOf(p)
      if (i >= 0 && i < width) {
        if (buf.seen.get(i)) throw new RuntimeException(
          s"scatter_long: duplicate position $i (duplicate sketch cell)")
        buf.seen.set(i)
        val v = valChild.eval(row)
        if (v != null) buf.vals(i) = v.asInstanceOf[Long]
      }
      // positions outside [0, width) are unreadable by the dense rebuild
      // this replaces (element_at over 0..width-1) — ignored, as before;
      // range guards belong upstream (cellsToCms/cellsToBloom raise there)
    }
    buf
  }

  override def merge(buf: ScatterBuf, other: ScatterBuf): ScatterBuf = {
    var i = other.seen.nextSetBit(0)
    while (i >= 0) {
      if (buf.seen.get(i)) throw new RuntimeException(
        s"scatter_long: duplicate position $i (duplicate sketch cell)")
      buf.seen.set(i)
      buf.vals(i) = other.vals(i)
      i = other.seen.nextSetBit(i + 1)
    }
    buf
  }

  override def eval(buf: ScatterBuf): Any = new GenericArrayData(buf.vals)

  override def serialize(buf: ScatterBuf): Array[Byte] = {
    val bits = buf.seen.toByteArray
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * width + bits.length)
    bb.putInt(width)
    buf.vals.foreach(bb.putLong)
    bb.putInt(bits.length)
    bb.put(bits)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ScatterBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val w = bb.getInt
    val b = new ScatterBuf(w)
    var i = 0
    while (i < w) { b.vals(i) = bb.getLong; i += 1 }
    val len = bb.getInt
    val bits = new Array[Byte](len)
    bb.get(bits)
    java.util.BitSet.valueOf(bits).stream().forEach(j => b.seen.set(j))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): ScatterLongAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ScatterLongAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ScatterLongAgg =
    copy(posChild = c(0), valChild = c(1))
}

object VecAggs {
  def longVecSum(arr: Column): Column =
    Bridge.column(LongVecFoldAgg(Bridge.expression(arr), isOr = false)
      .toAggregateExpression())
  def longVecOr(arr: Column): Column =
    Bridge.column(LongVecFoldAgg(Bridge.expression(arr), isOr = true)
      .toAggregateExpression())
  def scatterLong(pos: Column, value: Column, width: Int): Column =
    Bridge.column(ScatterLongAgg(Bridge.expression(pos),
      Bridge.expression(value), width).toAggregateExpression())
}
