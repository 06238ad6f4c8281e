package graft.tools

/** Prints formatted physical plans for judge/plan review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.td.session("local[8]", 8)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_project", "q_join_inner", "q_agg_pricing")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
