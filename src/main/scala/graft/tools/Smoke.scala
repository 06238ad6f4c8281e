package graft.tools
object Smoke {
  def main(args: Array[String]): Unit = {
    // mimic the driver smoke: plain session, entry(), rows>0
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    spark.stop()
  }
}
