package graft.expressions

import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-id generator: UUIDv7 rendered as a 26-char base32hex string.
  *
  * Mirrors the reference's per-row `$td.id` generator (a Rust Polars plugin,
  * reference: expansions/polars/modules/ty-tableframe/src/tableframe/expressions/
  * identifier/mod.rs:46-82): millisecond timestamp in the top 48 bits (so ids
  * sort roughly by creation time), version/variant bits per RFC 9562, random
  * remainder, then the 128 bits encoded in base32hex (26 chars, sortable).
  *
  * Implemented as a native non-deterministic Catalyst expression so id
  * generation runs distributed inside whole-stage codegen — no UDF overhead,
  * no driver involvement — which is what makes `withRowIds` viable on a
  * 100 TB write path.
  */
case class UuidV7() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def stateful: Boolean = true

  @transient private[this] var rng: ThreadLocalRandom = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    rng = ThreadLocalRandom.current()
  }

  override protected def evalInternal(input: InternalRow): Any =
    UTF8String.fromString(UuidV7.next(rng))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngRef = ctx.addMutableState(
      "java.util.concurrent.ThreadLocalRandom", "graftUuidRng",
      v => s"$v = java.util.concurrent.ThreadLocalRandom.current();",
      forceInline = true)
    ev.copy(
      code = code"""
        final UTF8String ${ev.value} = UTF8String.fromString(
          graft.expressions.UuidV7.next($rngRef));""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "graft_uuidv7"
}

object UuidV7 {
  private val Alphabet = "0123456789abcdefghijklmnopqrstuv".toCharArray

  /** Next id: 48-bit unix millis | 4-bit version(7) | 12-bit rand |
    * 2-bit variant(10) | 62-bit rand, base32hex-encoded into 26 chars. */
  def next(rng: ThreadLocalRandom): String = {
    val millis = System.currentTimeMillis()
    val randA = rng.nextInt() & 0xfff
    val hi = (millis << 16) | 0x7000L | randA.toLong
    val lo = (rng.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    encode(hi, lo)
  }

  /** 128 bits → base32hex, 26 chars (130-bit capacity, 2 top pad bits). */
  private def encode(hi: Long, lo: Long): String = {
    val out = new Array[Char](26)
    var i = 25
    var h = hi
    var l = lo
    while (i >= 0) {
      out(i) = Alphabet((l & 0x1f).toInt)
      // shift 128-bit (h, l) right by 5
      l = (l >>> 5) | (h << 59)
      h = h >>> 5
      i -= 1
    }
    new String(out)
  }

  /** Column-level entry point. */
  def uuidv7(): Column = Bridge.column(UuidV7())
}
