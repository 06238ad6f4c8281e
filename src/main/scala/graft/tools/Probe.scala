package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local probe main (not part of the driver contract):
  * `runMain graft.tools.Probe <sfDir> <query...>` times named queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.td.session("local[32]", 32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_minhash")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n rows")
    }
    spark.stop()
  }
}
