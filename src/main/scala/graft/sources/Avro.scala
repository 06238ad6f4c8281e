package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the Avro Hadoop
  * formats (`avro-mapred` ships with Spark's jars; the separate
  * `spark-avro` connector module does not, so this provides the same
  * capability from public primitives).
  *
  * Mirrors the reference's Avro ingestion/egress semantics
  * (`client/td-sdk/tabsdata/_io/inputs/file_inputs.py:1277-1332` reads Avro
  * record-by-record into columnar chunks; `_io/outputs/file_outputs.py:
  * 1864-1905` writes container files with a schema derived from the frame) —
  * but distributed: each executor reads/writes its own file splits, so a
  * 100 TB Avro ingest parallelizes like any other file scan instead of
  * passing through one Python process.
  *
  * Type mapping (both directions):
  *   boolean/int/long/float/double/string ↔ the matching Spark atomic;
  *   bytes/fixed ↔ binary; enum → string; record ↔ struct; array ↔ array;
  *   map ↔ map(string, _); union[null, T] ↔ nullable T;
  *   logical date ↔ DateType; timestamp-millis/micros ↔ TimestampType;
  *   decimal(p, s) ↔ DecimalType(p, s).
  */
object AvroFiles {

  // ---------------------------------------------------------------- schema

  /** Avro schema → Spark schema. Returns (type, nullable). */
  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only union[null, T] supported, got $s")
      (toSparkType(nonNull.head)._1, branches.size != nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _                    => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _                       => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (t, n) = toSparkType(f.schema())
        StructField(f.name(), t, nullable = n)
      }
      (StructType(fields.toSeq), false)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  def toSparkSchema(s: Schema): StructType =
    toSparkType(s)._1.asInstanceOf[StructType]

  /** Spark schema → Avro schema (record named `name`). */
  def toAvroSchema(t: DataType, nullable: Boolean, name: String): Schema = {
    val base = t match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case DateType    =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, en) =>
        Schema.createArray(toAvroSchema(et, en, name + "_item"))
      case MapType(StringType, vt, vn) =>
        Schema.createMap(toAvroSchema(vt, vn, name + "_value"))
      case st: StructType =>
        val rec = Schema.createRecord(name, null, "graft.avro", false)
        rec.setFields(st.fields.map { f =>
          new Schema.Field(f.name, toAvroSchema(f.dataType, f.nullable, name + "_" + f.name),
            null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
        }.toList.asJava)
        rec
      case other => throw new IllegalArgumentException(s"unsupported spark type: $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  def toAvroSchema(st: StructType): Schema = toAvroSchema(st, nullable = false, "topLevelRecord")

  // ---------------------------------------------------------------- values

  private def avroToSpark(v: Any, t: DataType, avro: Schema): Any = {
    if (v == null) return null
    val s = nonNull(avro)
    t match {
      case StringType => v.toString
      case BinaryType => v match {
        case b: ByteBuffer   => val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case f: GenericFixed => f.bytes().clone()
        case a: Array[Byte]  => a
      }
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        val micros = s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => v.asInstanceOf[Number].longValue() * 1000L
          case _                               => v.asInstanceOf[Number].longValue()
        }
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case d: DecimalType =>
        val bytes = v match {
          case b: ByteBuffer   => val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: GenericFixed => f.bytes()
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(avroToSpark(_, et, s.getElementType)).toSeq
      case MapType(_, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, x) =>
          k.toString -> avroToSpark(x, vt, s.getValueType)
        }.toMap
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.map(f =>
          avroToSpark(rec.get(f.name), f.dataType, s.getField(f.name).schema())).toSeq)
      case FloatType  => v.asInstanceOf[Number].floatValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case LongType   => v.asInstanceOf[Number].longValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case _ => v
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkToAvro(v: Any, t: DataType, avro: Schema): Any = {
    if (v == null) return null
    val s = nonNull(avro)
    t match {
      case BinaryType    => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType      => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val i = v.asInstanceOf[java.sql.Timestamp].toInstant
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(sparkToAvro(_, et, s.getElementType)).asJava
      case MapType(_, vt, _) =>
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, x) => k -> sparkToAvro(x, vt, s.getValueType) }.asJava
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, sparkToAvro(row.get(i), f.dataType, s.getField(f.name).schema()))
        }
        rec
      case _ => v
    }
  }

  // ------------------------------------------------------------------ I/O

  /** Writer schema of the first file matching `pattern` (driver-side peek,
    * one file header only — the distributed read uses file splits). */
  private def peekSchema(spark: SparkSession, pattern: String): Schema = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(pattern)
    val fs = p.getFileSystem(hconf)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    val files = matches.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && f.getPath.getName.endsWith(".avro"))
      else Seq(st)
    }.filterNot(_.getPath.getName.startsWith("_"))
    require(files.nonEmpty, s"no avro files match $pattern")
    val in = fs.open(files.head.getPath)
    try {
      val reader = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally in.close()
  }

  def read(spark: SparkSession, pattern: String): DataFrame = {
    val avroSchema = peekSchema(spark, pattern)
    val sparkSchema = toSparkSchema(avroSchema)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val rdd = spark.sparkContext.newAPIHadoopFile(
      pattern,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
    // convert in the same stage — record readers reuse buffers, so the
    // GenericRecord must not escape the iterator step
    val rows = rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val st = toSparkSchema(schema)
      it.map { case (k, _) => avroToSpark(k.datum(), st, schema).asInstanceOf[Row] }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Write a DataFrame as Avro container files, one (or more) per
    * partition. `maxRecordsPerFile > 0` rolls to a new container file
    * every that-many rows WITHIN each partition — the Spark-native port of
    * the reference's `AvroFormat(chunk_size)` (_format.py:75): bounded
    * rows per file bounds a downstream reader's batch the same way the
    * reference's write chunking does, with no extra shuffle (rolling is
    * executor-local). */
  def write(df: DataFrame, path: String, mode: String = "overwrite",
      maxRecordsPerFile: Long = 0L): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val out = new Path(path)
    val fs = out.getFileSystem(hconf)
    if (fs.exists(out)) {
      mode match {
        case "overwrite" => fs.delete(out, true)
        case "error" | "errorifexists" =>
          throw new IllegalStateException(s"path exists: $path")
        case other => throw new IllegalArgumentException(s"unsupported avro write mode: $other")
      }
    }
    val avroSchema = toAvroSchema(df.schema)
    val schemaJson = avroSchema.toString
    val sparkSchema = df.schema
    if (maxRecordsPerFile > 0) {
      val pathStr = path
      // ship the driver's session Hadoop conf (spark.hadoop.* credentials,
      // fs.s3a.*, defaultFS) as plain entries — a bare executor-side
      // `new Configuration()` sees only classpath defaults, so writes to any
      // configured remote FS would resolve wrongly; this matches what the
      // saveAsNewAPIHadoopFile path gets via the serialized Job conf
      val confEntries: Array[(String, String)] = {
        val b = Array.newBuilder[(String, String)]
        val it = hconf.iterator()
        while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
        b.result()
      }
      df.rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val schema = new Schema.Parser().parse(schemaJson)
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val dir = new Path(pathStr)
          val dfs = dir.getFileSystem(conf)
          var chunk = -1; var written = 0L
          var w: org.apache.avro.file.DataFileWriter[GenericRecord] = null
          var tmp: Path = null
          var fin: Path = null
          // each chunk writes to a dot-prefixed temp (hidden from Hadoop/
          // Spark listings) and renames on close — a failed attempt leaves
          // no readable partial .avro, the poor man's commit protocol the
          // OutputFormat path gets from its committer. The rename OVERWRITES
          // an existing destination (delete-then-rename): a retried task
          // must be able to replace chunks a failed attempt already
          // committed — HDFS rename returns false onto an existing file,
          // which would otherwise fail every retry permanently. Chunk names
          // are deterministic per (partition, chunk index), so the retry
          // rewrites exactly the same file set.
          def closeCommit(): Unit = if (w != null) {
            w.close(); w = null
            if (dfs.exists(fin) && !dfs.delete(fin, false))
              throw new java.io.IOException(
                s"avro chunk commit failed: cannot replace existing $fin")
            if (!dfs.rename(tmp, fin)) throw new java.io.IOException(
              s"avro chunk commit failed: rename $tmp -> $fin")
          }
          // the temp name carries the task ATTEMPT id: under speculative
          // execution (or a zombie first attempt) two attempts of the same
          // partition run concurrently, and a shared temp path would let one
          // attempt's close-and-rename commit the other's in-progress
          // (truncated) file as the final .avro. Final names stay
          // deterministic per (partition, chunk) so a retry replaces exactly
          // the same file set.
          val attemptId =
            Option(org.apache.spark.TaskContext.get).map(_.taskAttemptId).getOrElse(0L)
          def roll(): Unit = {
            closeCommit()
            chunk += 1; written = 0L
            fin = new Path(dir, f"part-$pid%05d-c$chunk%04d.avro")
            tmp = new Path(dir, f".part-$pid%05d-c$chunk%04d-a$attemptId.avro.tmp")
            w = new org.apache.avro.file.DataFileWriter(
              new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
            w.create(schema, dfs.create(tmp, true))
          }
          try {
            roll()
            it.foreach { row =>
              if (written >= maxRecordsPerFile) roll()
              w.append(sparkToAvro(row, sparkSchema, schema).asInstanceOf[GenericRecord])
              written += 1
            }
            closeCommit()
          } catch { case t: Throwable =>
            if (w != null) { try w.close() catch { case _: Throwable => () } }
            if (tmp != null) { try dfs.delete(tmp, false) catch { case _: Throwable => () } }
            throw t
          }
          Iterator.empty
        }
      }.count() // action: runs the distributed write
    } else {
      val job = Job.getInstance(hconf)
      AvroJob.setOutputKeySchema(job, avroSchema)
      df.rdd.mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          val rec = sparkToAvro(row, sparkSchema, schema).asInstanceOf[GenericRecord]
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }.saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
    }
  }
}
