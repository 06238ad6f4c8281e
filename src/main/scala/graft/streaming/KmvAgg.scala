package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One entry of a bottom-k (KMV) sketch: the md5 hash and the key it
  * hashes. Field names match [[graft.pipeline.Sketches.kmvSketch]]'s
  * entries struct, so streamed sketches merge with batch ones. */
case class KmvEntry(h: String, key: String)

/** Typed aggregate building a bottom-k (KMV) sketch incrementally — the
  * streaming face of [[graft.pipeline.Sketches.kmvSketch]]. The buffer
  * is the k md5-smallest DISTINCT (hash, key) pairs seen so far: ≤ k
  * entries of state per group/window regardless of how many rows or
  * distinct keys flow through — the bounded-state property Structured
  * Streaming needs (a raw collect_set would grow with the key set).
  * Deterministic (md5 order is data- and order-blind), so the streamed
  * sketch is BIT-equal to the batch sketch of the same rows, and window
  * sketches merge with batch history via `mergeKmvSketches` — any key
  * in the union's bottom-k ranks within the top-k of its own window, so
  * merge(windows) == sketch(whole) exactly.
  *
  * The md5 here is the JVM MessageDigest over UTF-8 bytes, lowercase
  * hex — byte-identical to Spark's `md5()` and DuckDB's, keeping the
  * full-oracle discipline. */
class KmvAgg(k: Int)
    extends Aggregator[String, List[KmvEntry], Seq[KmvEntry]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def zero: List[KmvEntry] = Nil

  // buffer invariant: sorted ascending by h, distinct h, size <= k
  override def reduce(buf: List[KmvEntry], key: String): List[KmvEntry] = {
    if (key == null) return buf
    val h = md5Hex(key)
    if (buf.lengthCompare(k) >= 0 && h >= buf.last.h) buf
    else insert(buf, KmvEntry(h, key))
  }

  override def merge(a: List[KmvEntry], b: List[KmvEntry]): List[KmvEntry] =
    b.foldLeft(a) { (acc, e) =>
      if (acc.lengthCompare(k) >= 0 && e.h >= acc.last.h) acc
      else insert(acc, e)
    }

  private def insert(buf: List[KmvEntry], e: KmvEntry): List[KmvEntry] = {
    val (lt, ge) = buf.span(_.h < e.h)
    if (ge.headOption.exists(_.h == e.h)) buf // distinct hashes only
    else (lt ::: e :: ge).take(k)
  }

  override def finish(buf: List[KmvEntry]): Seq[KmvEntry] = buf

  override def bufferEncoder: Encoder[List[KmvEntry]] =
    ExpressionEncoder[List[KmvEntry]]()
  override def outputEncoder: Encoder[Seq[KmvEntry]] =
    ExpressionEncoder[Seq[KmvEntry]]()
}
