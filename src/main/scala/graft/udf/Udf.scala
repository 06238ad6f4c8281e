package graft.udf

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

import graft.core.{SystemColumns, TableFrame}

/** User-defined function surface (reference:
  * client/td-sdk/tabsdata/tableframe/udf/function.py:96-260 and the apply
  * path frame.py:1241-1441): the user declares typed output columns and
  * implements exactly one of a per-element or a per-batch kernel; inputs are
  * struct-packed, the kernel applied, outputs unpacked into columns. Output
  * names may not enter the `$td.` namespace.
  */
abstract class Udf(val outputColumns: Seq[(String, DataType)]) extends Serializable {
  outputColumns.foreach { case (n, _) => SystemColumns.validateUserName(n) }

  /** Per-element kernel: one input row (the `on` values) → one output tuple.
    * Default: unimplemented — override this or [[onBatch]]. */
  def onElement(values: Seq[Any]): Seq[Any] =
    throw new NotImplementedError("override onElement or onBatch")

  /** Per-batch kernel: an iterator of input rows → iterator of output
    * tuples, 1:1. Override for amortized setup (models, compiled regexes…).
    * Default delegates to [[onElement]]. */
  def onBatch(rows: Iterator[Seq[Any]]): Iterator[Seq[Any]] =
    rows.map(onElement)
}

object Udf {
  /** Apply a UDF to `on` input columns: struct-pack → mapPartitions (the
    * batch shape, so [[Udf.onBatch]] can amortize per-partition setup) →
    * output columns appended. System columns ride through untouched. */
  def apply(tf: TableFrame, on: Seq[Column], udf: Udf): TableFrame = {
    val df = tf.df
    val inSchema = df.schema
    val packed = df.withColumn("$td.__udf_in", F.struct(on: _*))
    val outFields = udf.outputColumns.map { case (n, t) => StructField(n, t) }
    val outSchema = StructType(inSchema.fields.toSeq ++ outFields)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val inIdx = packed.schema.fieldIndex("$td.__udf_in")
    val width = inSchema.fields.length
    val result = packed.mapPartitions { rows =>
      // duplicate the partition iterator: one side feeds the batch kernel,
      // the other re-pairs kernel outputs with their source rows (1:1)
      val (r1, r2) = rows.duplicate
      val outs = udf.onBatch(r2.map(_.getStruct(inIdx).toSeq))
      r1.zip(outs).map { case (row, out) => Row.fromSeq(row.toSeq.take(width) ++ out) }
    }
    TableFrame(SystemColumns.arrange(result), tf.origin)
  }
}
