package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Training-data export: write a curated corpus as size-bounded shards
  * plus a row-accurate manifest — the layout a training dataloader
  * consumes (shard lists with row counts, à la the public WebDataset /
  * HuggingFace datasets conventions).
  *
  * Shape for 100 TB: the shard write is a plain distributed write with
  * `maxRecordsPerFile` bounding each file (Spark rolls files inside each
  * task — no repartition, no skew point); the manifest derives from one
  * aggregation over the written output grouped by file name (row counts
  * are exact, not estimated) joined to the filesystem listing for byte
  * sizes. Nothing corpus-sized touches the driver — the manifest itself
  * is O(#shards).
  */
object Export {

  /** Write `df` under `path` as `format` shards of at most
    * `maxRecordsPerFile` rows, then write `_manifest.jsonl` (one JSON row
    * per shard: shard, rows, bytes) beside them. Returns the manifest as
    * a DataFrame. `partitionBy` threads through to the writer for
    * directory-partitioned exports. */
  def writeSharded(df: DataFrame, path: String, format: String = "jsonl",
      maxRecordsPerFile: Long = 100000, partitionBy: Seq[String] = Nil,
      bloomFilterCols: Seq[String] = Nil, sortBy: Seq[String] = Nil): DataFrame = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    require(bloomFilterCols.isEmpty || format == "parquet",
      "bloomFilterCols requires format=parquet")
    // sortBy: range-partition + sort within, so shards hold DISJOINT key
    // ranges and the manifest's per-shard min/max become a zone map — a
    // reader (or this library) can prune whole shards from the manifest
    // alone, before any file IO. The range exchange is the one extra
    // shuffle a sorted export costs.
    val src = if (sortBy.isEmpty) df
      else df.repartitionByRange(sortBy.map(F.col): _*)
        .sortWithinPartitions(sortBy.map(F.col): _*)
    var w = src.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    // per-column parquet bloom filters: point lookups (id probes, dedup
    // audits, contamination spot checks) prune whole row groups without
    // reading them — the per-file companion of partition pruning at 100 TB
    bloomFilterCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    format match {
      case "jsonl" | "json" | "ndjson" => w.json(path)
      case "parquet"                   => w.parquet(path)
      case "orc"                       => w.orc(path)
      case "csv"                       => w.option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(
        s"unsupported export format: $other")
    }
    // stamp the export's schema beside the manifest (same pattern as the
    // BM25/IVF param stamps): readers of text formats pin their schema
    // from this O(1) file instead of paying a full-export inference scan
    // — on a 100 TB jsonl export that inference pass would cost a corpus
    // read, defeating the zone map it serves
    writeSchemaStamp(df.sparkSession, path, df.schema)
    val manifest = buildManifest(df.sparkSession, path, format,
      statsCols = sortBy)
    manifest.coalesce(1).write.mode("overwrite")
      .json(s"$path/_manifest.jsonl")
    manifest
  }

  private def writeSchemaStamp(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(path, "_schema.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** The schema stamped by [[writeSharded]], if present (exports written
    * before the stamp existed have none — callers fall back to
    * inference). */
  def readSchemaStamp(spark: SparkSession,
      path: String): Option[org.apache.spark.sql.types.StructType] = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(path, "_schema.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString("UTF-8")
      } finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(txt)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** (shard, rows, bytes) for every data file under an export — exact row
    * counts from one scan of the written output, byte sizes from the
    * filesystem listing. Also the validation tool for an existing export:
    * a shard that vanished or was truncated shows up as a count/byte
    * mismatch against a stored manifest.
    *
    * Shard keys are paths RELATIVE TO THE EXPORT ROOT, not basenames:
    * under `partitionBy`, Spark's dynamic-partition writer resets its file
    * counter per partition directory, so identically-named part files
    * exist in every partition dir — basename keys would merge their counts
    * and fan out the byte join, silently corrupting the manifest for any
    * partitioned export. */
  def buildManifest(spark: SparkSession, path: String,
      format: String = "jsonl", statsCols: Seq[String] = Nil): DataFrame = {
    val reader = format match {
      case "jsonl" | "json" | "ndjson" => spark.read.json(path)
      case "parquet"                   => spark.read.parquet(path)
      case "orc"                       => spark.read.orc(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(
        s"unsupported export format: $other")
    }
    // input_file_name() is a full URI whose scheme/authority rendering can
    // differ from the user-supplied `path` string; the URI *path* portion
    // contains the root verbatim, so everything after `<rootPath>/` is the
    // root-relative shard key (partition dirs included)
    val rootPath = new Path(path).toUri.getPath
    // per-shard zone-map stats (min/max of each statsCol) ride the same
    // grouped scan as the row counts — zero extra passes
    val counts = reader
      .groupBy(F.substring_index(F.input_file_name(), rootPath + "/", -1)
        .as("shard"))
      .agg(F.count(F.lit(1)).as("rows"),
        statsCols.flatMap(c => Seq(
          F.min(F.col(c)).as(s"min_$c"), F.max(F.col(c)).as(s"max_$c"))): _*)
    // byte sizes: one driver-side listing, O(#shards) entries
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val rootQual = fs.makeQualified(new Path(path))
    val sizes = collectFiles(fs, rootQual, rootQual.toUri.getPath)
    import spark.implicits._
    counts.join(
      F.broadcast(sizes.toDF("shard", "bytes")), Seq("shard"), "left")
      .select(Seq(F.col("shard"), F.col("rows"),
        F.coalesce(F.col("bytes"), F.lit(0L)).as("bytes")) ++
        statsCols.flatMap(c =>
          Seq(F.col(s"min_$c"), F.col(s"max_$c"))): _*)
      .orderBy("shard")
  }

  /** Read an export back through its zone-map manifest: only shards whose
    * [min_key, max_key] interval intersects [lo, hi] are handed to the
    * reader — whole files skipped from the manifest alone, before any
    * data IO or footer reads (the coarse-grained layer above parquet's
    * own row-group stats; works for jsonl/csv exports that have no
    * stats of their own). The manifest is O(#shards) driver metadata.
    * Requires an export written with `sortBy` including `keyCol`; fails
    * loudly when the manifest carries no stats for it. A range selecting
    * zero shards returns an empty frame with the export's schema. */
  def readPruned(spark: SparkSession, path: String, format: String,
      keyCol: String, lo: Long, hi: Long): DataFrame = {
    val manifest = spark.read.json(s"$path/_manifest.jsonl")
    require(manifest.columns.contains(s"min_$keyCol") &&
      manifest.columns.contains(s"max_$keyCol"),
      s"manifest at $path carries no zone-map stats for '$keyCol' — " +
        "write the export with sortBy including it")
    val shards = manifest
      .where(F.col(s"min_$keyCol") <= hi && F.col(s"max_$keyCol") >= lo)
      .select("shard").collect().map(_.getString(0))
    def reader = format match {
      case "jsonl" | "json" | "ndjson" => spark.read.json(_: String)
      case "parquet"                   => spark.read.parquet(_: String)
      case "orc"                       => spark.read.orc(_: String)
      case "csv" => spark.read.option("header", "true").csv(_: String)
      case other => throw new IllegalArgumentException(
        s"unsupported export format: $other")
    }
    // text formats (jsonl/csv) are not self-describing: without a pinned
    // schema a subset missing a sparse field would silently narrow. The
    // schema comes from the O(1) `_schema.json` stamp writeSharded left
    // beside the manifest — NOT from `reader(path).schema`, whose
    // inference scans the ENTIRE export (a corpus read to serve a pruned
    // query). Inference remains only as a fallback for legacy exports
    // written before the stamp existed.
    lazy val textSchema = readSchemaStamp(spark, path)
      .getOrElse(reader(path).schema)
    if (shards.isEmpty) format match {
      case "parquet" | "orc" => reader(path).limit(0)
      case _ => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], textSchema)
    }
    else {
      val r = spark.read
        .format(format match {
          case "jsonl" | "ndjson" => "json"
          case f => f
        })
        .options(if (format == "csv") Map("header" -> "true")
          else Map.empty[String, String])
        // basePath makes Spark resolve partition directories relative to
        // the export root even though only leaf shard files are listed —
        // without it a partitionBy export's partition columns silently
        // vanish (parquet/orc) or come back all-NULL (text formats)
        .option("basePath", path)
      val pinned = format match {
        case "parquet" | "orc" => r
        case _ => r.schema(textSchema)
      }
      pinned.load(shards.map(s => s"$path/$s"): _*)
    }
  }

  /** Recursive (rootRelativePath, bytes) listing of data files — skips
    * hidden files and the manifest itself. */
  private def collectFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, rootPath: String): Seq[(String, Long)] = {
    val st = fs.listStatus(dir).toSeq
    st.flatMap {
      case d if d.isDirectory =>
        if (d.getPath.getName.startsWith("_") || d.getPath.getName.startsWith("."))
          Nil
        else collectFiles(fs, d.getPath, rootPath)
      case f =>
        val n = f.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else Seq((f.getPath.toUri.getPath.stripPrefix(rootPath + "/"), f.getLen))
    }
  }
}
