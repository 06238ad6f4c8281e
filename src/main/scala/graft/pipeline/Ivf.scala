package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * centroid-routed scale path for similarity search (complementing the
  * hyperplane-LSH variant in [[Similarity]]).
  *
  * Build: k-means with deterministic initialization (the k lowest-id
  * vectors) — each Lloyd iteration is one linear assignment pass over the
  * corpus plus one aggregation (posexplode → groupBy(cluster, dim).avg).
  * Centroids are tiny (k × dim doubles) and live on the driver between
  * passes; the corpus is never collected.
  *
  * Assignment has two physical strategies, auto-selected on k:
  *   - k <= [[JoinThreshold]]: centroids inlined as plan literals, nearest
  *     centroid via `array_min` over k codegen'd distance kernels — zero
  *     extra rows, but plan size grows O(k · dim);
  *   - k > threshold: centroids as a BROADCAST-JOINED table — the corpus
  *     crosses the (k-row) centroid relation, distance per pair, min-by
  *     per id. k × N intermediate rows, but plan size is O(1) in k, so k
  *     can be thousands (the regime a 100 TB corpus needs: N/k vectors
  *     per inverted list).
  * Both produce identical assignments (ties to the lowest cluster id; see
  * PipelineSpec).
  *
  * Search: a query probes only its `nprobe` nearest centroids' inverted
  * lists, so the exact-cosine work drops from O(N) to O(N · nprobe / k)
  * per query at the cost of recall.
  */
object Ivf {
  /** `nVectors` is the corpus size the index was built over when known
    * (stamped by [[save]]/[[load]]; -1 on a fresh in-memory build) — it
    * lets AutoK consumers ([[SemDedup.pairsWithIndex]]) validate the
    * cluster geometry without re-counting the corpus. */
  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame,
      nVectors: Long = -1L) {
    def k: Int = centroids.length
  }

  /** Above this k, assignment/probing switch from plan-literal centroids to
    * the broadcast-join strategy. */
  val JoinThreshold = 128

  private def sqDistTo(vec: Column, centroid: Array[Double]): Column = {
    // native codegen'd kernel; the HOF zip_with formulation evaluates its
    // lambda interpreted once per (row, centroid) — k× per row in assignExpr
    val c = F.array(centroid.map(F.lit): _*)
    graft.expressions.VectorKernels.sqdist(vec, c)
  }

  /** Nearest-centroid id (0-based) for a vector — literal strategy. */
  private def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      F.struct(sqDistTo(vec, c).as("d"), F.lit(i).as("i"))
    }
    // array_min on struct(d, i): lexicographic → min distance, ties to low id
    F.array_min(F.array(dists: _*)).getField("i")
  }

  /** Centroids as a (cluster, cv) relation for the broadcast strategies. */
  private def centroidDf(df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "cv")
  }

  /** Nearest-centroid assignment via broadcast join — plan size O(1) in k. */
  private def assignViaJoin(v: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val pairs = v.crossJoin(F.broadcast(centroidDf(v, centroids)))
      .withColumn("d", graft.expressions.VectorKernels.sqdist(F.col("v"), F.col("cv")))
    pairs.groupBy("id").agg(
      F.min(F.struct(F.col("d"), F.col("cluster"))).as("best"),
      F.first(F.col("v")).as("v")) // v identical across the k rows of a group
      .select(F.col("id"), F.col("v"), F.col("best.cluster").as("cluster"))
  }

  private def assign(v: DataFrame, centroids: Array[Array[Double]],
      viaJoin: Option[Boolean]): DataFrame =
    if (!viaJoin.getOrElse(centroids.length > JoinThreshold))
      v.withColumn("cluster", assignExpr(F.col("v"), centroids))
    else assignViaJoin(v, centroids)

  /** Build the index: deterministic seed centroids, `iters` Lloyd passes.
    * `viaJoin` overrides the k-based strategy auto-selection (tests prove
    * both strategies assign identically). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3, viaJoin: Option[Boolean] = None): Index = {
    val v = corpus.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    // cast first so float32 and float64 embedding columns both collect cleanly
    var centroids: Array[Array[Double]] = v.orderBy("id").limit(k)
      .select(F.col("v").cast(ArrayType(DoubleType))).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = assign(v, centroids, viaJoin)
      val means = assigned
        .select(F.col("cluster"), F.posexplode(F.col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(F.avg(F.col("x").cast(DoubleType)).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { i =>
        byCluster.get(i) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
          case None => centroids(i) // empty cluster keeps its centroid
        }
      }.toArray
    }
    Index(centroids, assign(v, centroids, viaJoin))
  }

  /** Persist an index: centroids as a tiny (cluster, cv) parquet, the
    * assigned inverted lists partitioned BY CLUSTER — so a loaded index
    * serves `topK` with partition pruning on the probed clusters (a query
    * touches nprobe directories, not the corpus). Build once per corpus
    * version, reuse across query batches — at 100 TB the build dominates
    * a single query batch by orders of magnitude.
    *
    * Alongside the data, `meta.json` stamps the index parameters (k, dim,
    * corpus size) — the analog of the band index's sketch-parameter column
    * stamp ([[Dedup.minhashBandIndex]]): a loaded index then *proves* its
    * geometry instead of consumers re-deriving it with extra corpus jobs,
    * and a k that doesn't match the stored centroids fails loudly. The
    * corpus size is counted here (one job at save time, once per corpus
    * version) unless the index already carries it. */
  def save(index: Index, path: String): Unit = {
    val n = if (index.nVectors >= 0) index.nVectors else index.assigned.count()
    val dim = index.centroids.headOption.map(_.length).getOrElse(0)
    centroidDf(index.assigned, index.centroids)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assigned")
    // meta.json goes through the path's Hadoop FS like the data relations —
    // a java.nio write would land the stamp on a bogus LOCAL path for
    // hdfs://-e/s3a://-style index stores, silently disabling the geometry
    // validation it exists to enforce
    val spark = index.assigned.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(path, "meta.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(s"""{"k":${index.k},"dim":$dim,"n_vectors":$n}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted index. The centroid relation is k×dim doubles —
    * driver-side by design, same as after a build. When `meta.json` is
    * present (every index [[save]]d since it was introduced), the stored
    * centroids must match its stamped k/dim — a truncated or hand-edited
    * index fails here, not as silently-wrong cluster routing. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cluster").collect()
      .map(_.getSeq[Double](1).toArray)
    val assigned = spark.read.parquet(s"$path/assigned")
      .select(F.col("id"), F.col("v"), F.col("cluster").cast("int").as("cluster"))
    val metaPath = new org.apache.hadoop.fs.Path(path, "meta.json")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val n = if (fs.exists(metaPath)) {
      val bytes = {
        val in = fs.open(metaPath)
        try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      }
      val meta = graft.store.TableStore.jsonMapper
        .readTree(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      val k = meta.get("k").asInt(); val dim = meta.get("dim").asInt()
      if (k != centroids.length || centroids.exists(_.length != dim))
        throw new IllegalStateException(
          s"IVF index at $path is inconsistent with its meta.json stamp: " +
          s"stamped k=$k dim=$dim, stored ${centroids.length} centroids" +
          centroids.headOption.map(c => s" of dim ${c.length}").getOrElse(""))
      meta.get("n_vectors").asLong(-1L)
    } else -1L
    Index(centroids, assigned, n)
  }

  /** `nprobe` nearest cluster ids for a query vector — literal strategy. */
  private def probeExpr(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      F.struct(sqDistTo(vec, c).as("d"), F.lit(i).as("i"))
    }
    F.slice(F.transform(F.array_sort(F.array(dists: _*)), s => s.getField("i")),
      1, nprobe)
  }

  /** Probed (query_id, qv, cluster) rows, strategy-selected on k. */
  private[pipeline] def probed(queries: DataFrame, queryIdCol: String, vecCol: String,
      centroids: Array[Array[Double]], nprobe: Int,
      viaJoin: Option[Boolean]): DataFrame = {
    val q = queries.select(F.col(queryIdCol).as("query_id"), F.col(vecCol).as("qv"))
    if (!viaJoin.getOrElse(centroids.length > JoinThreshold))
      q.withColumn("cluster", F.explode(probeExpr(F.col("qv"), centroids, nprobe)))
    else {
      val pairs = q.crossJoin(F.broadcast(centroidDf(q, centroids)))
        .withColumn("d", graft.expressions.VectorKernels.sqdist(F.col("qv"), F.col("cv")))
      val w = Window.partitionBy("query_id")
        .orderBy(F.col("d").asc, F.col("cluster").asc)
      pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(F.col("query_id"), F.col("qv"), F.col("cluster"))
    }
  }

  /** Approximate top-k: queries meet only the corpus vectors in their probed
    * clusters; exact cosine re-ranks within.
    *
    * `excludeSelf` drops corpus rows whose id equals the query id — right for
    * self-search over the corpus; set it false when querying with an external
    * set whose id space merely overlaps the corpus ids. */
  def topK(index: Index, queries: DataFrame, queryIdCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, excludeSelf: Boolean = true,
      viaJoin: Option[Boolean] = None): DataFrame =
    topKImpl(index, queries, queryIdCol, vecCol, k, nprobe, excludeSelf,
      viaJoin, identity)

  /** Metadata-filtered [[topK]] — "nearest neighbors WITHIN this
    * language/license/domain", the standard curation probe. The predicate
    * is pushed into the CANDIDATE stage: `allowed` (the caller-filtered
    * id relation, e.g. `corpus.where($"lang" === "en").select("doc_id")`)
    * semi-joins the probed inverted lists BEFORE distance evaluation, so
    * every one of the k result slots holds a matching neighbor and recall
    * at fixed nprobe is measured against the filtered brute-force scan.
    * Post-filtering `topK`'s output instead would rank non-matching
    * vectors into the k slots first and then drop them — on a skewed
    * filter most slots die and recall collapses (RecallSpec demonstrates
    * the divergence). The semi-join runs AFTER cluster routing, so its
    * left side is the probed lists (partition-pruned on a loaded index),
    * never the whole corpus. */
  def topKFiltered(index: Index, queries: DataFrame, queryIdCol: String,
      vecCol: String, k: Int, allowed: DataFrame, allowedIdCol: String,
      nprobe: Int = 4, excludeSelf: Boolean = true,
      viaJoin: Option[Boolean] = None): DataFrame = {
    val ids = allowed.select(F.col(allowedIdCol).as("id")).distinct()
    topKImpl(index, queries, queryIdCol, vecCol, k, nprobe, excludeSelf,
      viaJoin, _.join(ids, Seq("id"), "left_semi"))
  }

  private def topKImpl(index: Index, queries: DataFrame, queryIdCol: String,
      vecCol: String, k: Int, nprobe: Int, excludeSelf: Boolean,
      viaJoin: Option[Boolean],
      restrict: DataFrame => DataFrame): DataFrame = {
    val q = probed(queries, queryIdCol, vecCol, index.centroids, nprobe, viaJoin)
    val joined = restrict(index.assigned.join(F.broadcast(q), Seq("cluster")))
    val scored = (if (excludeSelf) joined.filter(F.col("query_id") =!= F.col("id"))
                  else joined)
      .withColumn("cos", Similarity.cosine(F.col("qv"), F.col("v")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cos").desc, F.col("id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("rank"), F.col("id").as("nbr_id"), F.col("cos"))
  }
}
