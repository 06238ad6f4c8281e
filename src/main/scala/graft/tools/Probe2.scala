package graft.tools

import org.apache.spark.sql.{functions => F}

/** Scratch profiling main for the jaccard pipeline stages. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.td.session("local[32]", 32)
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import graft.pipeline.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val exploded = Dedup.shingled(df, "text", "doc_id", 3)
    time("explode")(exploded.count())
    time("explode2")(exploded.count())
    val kept = exploded.join(
      exploded.groupBy("shingle").agg(F.count(F.lit(1)).as("df"))
        .filter(F.col("df") <= 1000).select("shingle"), Seq("shingle"))
    time("kept")(kept.count())
    val sizes = kept.groupBy("id").agg(F.count(F.lit(1)).as("n_sh"))
    val sided = kept.join(sizes, Seq("id"))
    time("sided")(sided.count())
    val a = sided.select(F.col("id").as("a"), F.col("n_sh").as("na"), F.col("shingle"))
    val b = sided.select(F.col("id").as("b"), F.col("n_sh").as("nb"), F.col("shingle"))
    val raw = a.join(b, Seq("shingle")).filter(F.col("a") < F.col("b"))
    time("rawpairs")(raw.count())
    val grouped = raw.groupBy("a", "b", "na", "nb").agg(F.count(F.lit(1)).as("common"))
    time("grouped")(grouped.count())
    spark.stop()
  }
}
