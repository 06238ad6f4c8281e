package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Large-scale training-data pipeline operators (dedup, similarity search,
  * text analysis, multimodal) — filled in by graft.pipeline.*. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
}

object PipelineOracles {
  val oracleSql: Map[String, String] = Map()
}
