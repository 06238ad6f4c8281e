package graft.tools
import org.apache.spark.sql.{functions => F}
object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.td.session("local[32]", 32)
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import graft.pipeline.Dedup
    val exploded = Dedup.shingled(df, "text", "doc_id", 3)
    println(exploded.queryExecution.optimizedPlan.treeString.take(3000))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // raw split only
    val toksOnly = df.select(F.split(F.lower(F.trim(F.col("text"))), "\\s+").as("t"))
    time("split-only")(toksOnly.count())
    val shOnly = df.select(F.col("doc_id").as("id"), Dedup.tokens(F.col("text")).as("toks"))
      .select(Dedup.shinglesFromTokens(F.col("toks"), 3).as("sh"))
    time("shingle-arrays")(shOnly.count())
    time("shingle-arrays2")(shOnly.count())
    time("explode")(exploded.count())
    spark.stop()
  }
}
