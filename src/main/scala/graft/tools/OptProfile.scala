package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Local profiling aid for the optimization rounds: times named phases of
  * the expensive gates in isolation (noop-style count actions) so plan
  * changes can be attributed to the right stage. Never part of the driver
  * contract; output is human-oriented.
  */
object OptProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000L).selectExpr("id % 10 as k", "id").groupBy("k").count().count()

    val which = if (args.nonEmpty) args(0) else "ivfpq"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    which match {
      case "ivfpq" =>
        for (rep <- 1 to 2) {
          println(s"--- rep $rep ---")
          val idx = time("ivf.build k=8 iters=2") {
            graft.pipeline.Ivf.build(emb, "vec_id", "embedding", k = 8, iters = 2)
          }
          val cb = time("trainPq m=16 ks=128 iters=2") {
            graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding", m = 16, ks = 128, iters = 2)
          }
          val enc = graft.pipeline.Quantize.encodePqWithCells(idx, cb)
          time("encodePqWithCells count") { enc.count() }
          val res = graft.pipeline.Quantize.ivfPqTopK(idx, enc,
            emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
            k = 10, nprobe = 3, cb).orderBy("query_id", "rank")
          time("ivfPqTopK count") { res.count() }
        }
      case "pq_exact" =>
        for (rep <- 1 to 2) {
          println(s"--- rep $rep ---")
          val n = time("count corpus") { emb.count().toInt }
          val cb = time("trainPq m=1 ks=N iters=0") {
            graft.pipeline.Quantize.trainPq(emb, "vec_id", "embedding", m = 1, ks = n, iters = 0)
          }
          val enc = graft.pipeline.Quantize.encodePq(emb, "vec_id", "embedding", cb)
          time("encodePq count") { enc.count() }
          val res = graft.pipeline.Quantize.pqTopK(enc, emb.filter(F.col("vec_id") < 5),
            "vec_id", "embedding", k = 10, cb).orderBy("query_id", "rank")
          time("pqTopK count") { res.count() }
        }
      case "trainpq" =>
        import org.apache.spark.sql.types._
        val (m, ks, iters) = (16, 128, 2)
        val dim = time("dim head") { emb.select(F.size(F.col("embedding"))).head().getInt(0) }
        val dsub = dim / m
        val seeds = time("seeds collect") {
          emb.orderBy("vec_id").limit(ks)
            .select(F.col("embedding").cast(ArrayType(DoubleType))).collect()
            .map(_.getSeq[Double](0).toArray)
        }
        var centroids: Array[Array[Array[Double]]] =
          Array.tabulate(m, ks)((s, c) => seeds(c).slice(s * dsub, (s + 1) * dsub))
        for (it <- 0 until iters + 2) {
          val means = time(s"means job iter$it") {
            emb
              .select(graft.expressions.PqKernels.assign(
                  F.col("embedding").cast(ArrayType(DoubleType)), centroids).as("codes"),
                F.posexplode(F.col("embedding").cast(ArrayType(DoubleType))).as(Seq("i", "x")))
              .select(
                (F.col("i") / dsub).cast(IntegerType).as("sub"),
                (F.col("i") % dsub).as("dim"),
                F.col("x"), F.col("codes"))
              .withColumn("code", F.element_at(F.col("codes"), F.col("sub") + 1))
              .groupBy("sub", "code", "dim")
              .agg(F.avg("x").as("mean"))
              .collect()
          }
          println(s"[prof] means rows ${means.length}")
        }
        // hypothesis splits
        for (it <- 0 until 2) {
          time(s"explode+avg only iter$it") {
            emb.select(
                F.posexplode(F.col("embedding").cast(ArrayType(DoubleType))).as(Seq("i", "x")))
              .select((F.col("i") / dsub).cast(IntegerType).as("sub"),
                (F.col("i") % dsub).as("dim"), F.col("x"))
              .groupBy("sub", "dim").agg(F.avg("x")).collect()
          }
          time(s"kernel-below-generate iter$it") {
            emb
              .select(graft.expressions.PqKernels.assign(
                  F.col("embedding").cast(ArrayType(DoubleType)), centroids).as("codes"),
                F.col("embedding").cast(ArrayType(DoubleType)).as("v"))
              .select(F.col("codes"), F.posexplode(F.col("v")).as(Seq("i", "x")))
              .select(
                (F.col("i") / dsub).cast(IntegerType).as("sub"),
                (F.col("i") % dsub).as("dim"),
                F.col("x"), F.col("codes"))
              .withColumn("code", F.element_at(F.col("codes"), F.col("sub") + 1))
              .groupBy("sub", "code", "dim")
              .agg(F.avg("x").as("mean"))
              .collect()
          }
          time(s"kernel only count iter$it") {
            emb.select(graft.expressions.PqKernels.assign(
                F.col("embedding").cast(ArrayType(DoubleType)), centroids).as("codes"))
              .selectExpr("sum(size(codes))").collect()
          }
        }
      case "pca" =>
        import org.apache.spark.sql.types._
        val dim = 64
        for (rep <- 1 to 2) {
          println(s"--- rep $rep ---")
          val (n, means) = time("colMeans") {
            graft.pipeline.Pca.colMeans(emb, "embedding", dim)
          }
          val m = time("fit iters=3 (incl colMeans)") {
            graft.pipeline.Pca.fit(emb, "embedding", dim, iters = 3)
          }
          // identical-plan repeat: same literals → codegen cache hit
          time("fit iters=3 again (same literals)") {
            graft.pipeline.Pca.fit(emb, "embedding", dim, iters = 3)
          }
          println(s"[prof] n=$n lambda=${m.lambda}")
        }
      case "gate" =>
        // time any declared gate end to end, 2 reps
        val name = args(1)
        val fn = graft.SparkEntry.queries(name)
        for (rep <- 1 to 2)
          time(s"$name rep$rep") { fn(spark, sfDir).count() }
      case _ => sys.error(s"unknown profile: $which")
    }
    spark.stop()
  }
}
