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
  * corpus (centroids broadcast as literals, distances evaluated per row)
  * plus one aggregation (posexplode → groupBy(cluster, dim).avg). Centroids
  * are tiny (k × dim doubles) and live on the driver between passes, the
  * corpus is never collected.
  *
  * Search: a query probes only its `nprobe` nearest centroids' inverted
  * lists, so the exact-cosine work drops from O(N) to O(N · nprobe / k)
  * per query at the cost of recall.
  */
object Ivf {
  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  private def sqDistTo(vec: Column, centroid: Array[Double]): Column = {
    // native codegen'd kernel; the HOF zip_with formulation evaluates its
    // lambda interpreted once per (row, centroid) — k× per row in assignExpr
    val c = F.array(centroid.map(F.lit): _*)
    graft.expressions.VectorKernels.sqdist(vec, c)
  }

  /** Nearest-centroid id (0-based) for a vector. */
  private def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      F.struct(sqDistTo(vec, c).as("d"), F.lit(i).as("i"))
    }
    // array_min on struct(d, i): lexicographic → min distance, ties to low id
    F.array_min(F.array(dists: _*)).getField("i")
  }

  /** Build the index: deterministic seed centroids, `iters` Lloyd passes. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3): Index = {
    val spark = corpus.sparkSession
    val v = corpus.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    // cast first so float32 and float64 embedding columns both collect cleanly
    var centroids: Array[Array[Double]] = v.orderBy("id").limit(k)
      .select(F.col("v").cast(ArrayType(DoubleType))).collect()
      .map(_.getSeq[Double](0).toArray)
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = v.withColumn("cluster", assignExpr(F.col("v"), centroids))
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
    Index(centroids, v.withColumn("cluster", assignExpr(F.col("v"), centroids)))
  }

  /** `nprobe` nearest cluster ids for a query vector, as an array column. */
  private def probeExpr(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      F.struct(sqDistTo(vec, c).as("d"), F.lit(i).as("i"))
    }
    F.slice(F.transform(F.array_sort(F.array(dists: _*)), s => s.getField("i")),
      1, nprobe)
  }

  /** Approximate top-k: queries meet only the corpus vectors in their probed
    * clusters; exact cosine re-ranks within.
    *
    * `excludeSelf` drops corpus rows whose id equals the query id — right for
    * self-search over the corpus; set it false when querying with an external
    * set whose id space merely overlaps the corpus ids. */
  def topK(index: Index, queries: DataFrame, queryIdCol: String, vecCol: String,
      k: Int, nprobe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(F.col(queryIdCol).as("query_id"), F.col(vecCol).as("qv"))
      .withColumn("cluster",
        F.explode(probeExpr(F.col("qv"), index.centroids, nprobe)))
    val joined = index.assigned.join(F.broadcast(q), Seq("cluster"))
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
