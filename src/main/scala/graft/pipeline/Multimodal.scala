package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, and partition-wise decode/feature plumbing.
  *
  * The Spark-side mechanics are real and tested — binary columns, metadata
  * struct schema, `mapPartitions` batch iteration (the Scala analog of
  * `mapInPandas`: one iterator per partition, so a decoder can amortize
  * per-batch setup such as codec contexts) and frame-sampling explosion.
  *
  * Decoding is REAL for PNG/JPEG/GIF/BMP containers (header-level
  * dimension extraction), WAV/RIFF audio (sample rate, channels, bit
  * depth, sample-frame count), MP3 (MPEG frame-header walk) and MP4/
  * ISO-BMFF (mvhd duration, tkhd dims, stts sample count) via
  * [[MediaHeaders]] — pure JVM, headers only, no pixel/codec decode.
  * Bytes that sniff as none of those fall back to the clearly marked
  * [[decodeStub]] deterministic fake.
  */
object Multimodal {
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("size_bytes", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType)))

  /** STUB decode: derives deterministic fake dimensions from the byte
    * length. Used only for bytes that sniff as none of the supported
    * containers (PNG/JPEG/GIF/BMP/WAV/MP3/MP4) — the signature
    * (bytes → meta Row) is the real contract. */
  def decodeStub(kind: String, bytes: Array[Byte]): Row = {
    val len = if (bytes == null) 0L else bytes.length.toLong
    Row(kind, (len % 640 + 16).toInt, (len % 480 + 16).toInt, (len % 30 + 1).toInt,
      len, null, null, null)
  }

  private def clampInt(v: Long): Int = math.min(v, Int.MaxValue.toLong).toInt

  /** Decode media metadata — all real header walks, no codec libraries:
    * images (PNG/JPEG/GIF/BMP/WebP) get true dimensions; WAV/FLAC get
    * sample rate/channels/bit depth with the sample-frame count as
    * `n_frames`; Ogg (Vorbis/Opus identification headers) gets sample
    * rate/channels; MP3 gets sample rate/channels with the MPEG frame
    * count as `n_frames`; MP4 gets tkhd dimensions with the stts sample
    * count as `n_frames`; GIF gets its real frame count from the
    * data-stream block walk (1 for stills). Only unrecognized bytes fall
    * back to the stub. */
  def decode(kind: String, bytes: Array[Byte]): Row = {
    val len = if (bytes == null) 0L else bytes.length.toLong
    MediaHeaders.sniff(bytes).map { d =>
      Row(d.format, d.width, d.height, d.nFrames, len, null, null, null)
    }.orElse(MediaHeaders.sniffWav(bytes).map { a =>
      Row(a.format, null, null, clampInt(a.nSampleFrames), len,
        a.sampleRate, a.channels, a.bitsPerSample)
    }).orElse(MediaHeaders.sniffFlac(bytes).map { a =>
      Row(a.format, null, null, clampInt(a.nSampleFrames), len,
        a.sampleRate, a.channels, a.bitsPerSample)
    }).orElse(MediaHeaders.sniffOgg(bytes).map { a =>
      Row(a.format, null, null, clampInt(a.nSampleFrames), len,
        a.sampleRate, a.channels, null)
    }).orElse(MediaHeaders.sniffMp3(bytes).map { m =>
      Row("mp3", null, null, m.nFrames, len, m.sampleRate, m.channels, null)
    }).orElse(MediaHeaders.sniffMp4(bytes).map { v =>
      Row(v.format,
        if (v.width > 0) v.width else null,
        if (v.height > 0) v.height else null,
        clampInt(v.nSamples), len, null, null, null)
    }).getOrElse(decodeStub(kind, bytes))
  }

  /** Attach a `content: binary` column from any string column (stand-in for
    * reading real media files via `spark.read.format("binaryFile")`). */
  def withBinaryContent(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("content", F.col(srcCol).cast(BinaryType))

  /** Partition-wise decode: iterator-in/iterator-out over each partition —
    * the shape that lets a real decoder reuse native contexts per batch and
    * keeps memory bounded to one row group at a time. */
  def decodePartitions(df: DataFrame, kind: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("media_meta", mediaMetaSchema))
    val contentIdx = inSchema.fieldIndex("content")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      // per-partition setup would open audio/video codec contexts here
      rows.map { r =>
        val meta = decode(kind, r.getAs[Array[Byte]](contentIdx))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Resize stub: records the requested dims in metadata; a real kernel
    * would transform `content`. Pure column work, stays in codegen. */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media_meta", F.struct(
      F.col("media_meta.kind").as("kind"),
      F.lit(w).as("width"),
      F.lit(h).as("height"),
      F.col("media_meta.n_frames").as("n_frames"),
      F.col("media_meta.size_bytes").as("size_bytes"),
      F.col("media_meta.sample_rate").as("sample_rate"),
      F.col("media_meta.channels").as("channels"),
      F.col("media_meta.bits_per_sample").as("bits_per_sample")))

  /** Frame sampling: explode every_nth frame indices from the metadata —
    * (doc, frame_idx) rows ready for a per-frame feature extractor.
    * Zero-frame media (e.g. a WAV with an empty data chunk) yields no
    * rows rather than an illegal sequence(0, -1). */
  def sampleFrames(df: DataFrame, everyNth: Int): DataFrame = {
    val n = F.col("media_meta.n_frames")
    df.withColumn("frame_idx",
      F.explode(F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(everyNth)))
        .otherwise(F.array())))
  }
}
