package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Measured arm for VERDICT r13 #5 (NOT part of the driver contract):
  * times the gate's between-pass-normalized HITS against the fused-norm
  * variant ([[graft.pipeline.GraphRank.hitsFused]] — Kleinberg's
  * end-of-iteration normalization, ONE two-column norm action per
  * iteration instead of two) on the sf0.1 trade graph the q_graph_hits
  * gate uses. Run quiet: `sbt "runMain graft.tools.HitsFusionProbe"`
  * (results → PERF.md). */
object HitsFusionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def edges: DataFrame = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(
          F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).as("src"),
          F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).as("dst"))
        .distinct()
    }

    def time(label: String, f: () => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f()
        val s = (System.nanoTime() - t0) / 1e9
        require(n > 0)
        s
      }
      println(f"PROBE $label: min=${times.min}%.3f median=${times.sorted.apply(1)}%.3f")
    }

    // same shape as the gate: iters = 3, count() as the action
    time("hits_gate_shape", () =>
      graft.pipeline.GraphRank.hits(edges, "src", "dst", iters = 3).count())
    time("hits_fused_norms", () =>
      graft.pipeline.GraphRank.hitsFused(edges, "src", "dst", iters = 3).count())
    time("hits_gate_shape_2nd", () =>
      graft.pipeline.GraphRank.hits(edges, "src", "dst", iters = 3).count())
    spark.stop()
  }
}
