package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized *partitions*, which covers most
  * cases; salting is the explicit fallback when a handful of hot keys
  * dominate (classic in training-data pipelines: null-ish ids, boilerplate
  * dedup buckets). The left (large, skewed) side gets a random salt in
  * [0, factor); the right side is exploded `factor`× so every salted key
  * finds its match. One shuffle, hot keys spread over `factor` reducers.
  */
object SkewJoin {
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      how: String = "inner", saltFactor: Int = 8): DataFrame = {
    require(Seq("inner", "left").contains(how),
      "salted join supports inner/left (right/full would need right-side salting)")
    val salt = "$td.__salt"
    val salted = left.withColumn(salt,
      (F.rand(42) * saltFactor).cast("int"))
    val exploded = right.withColumn(salt,
      F.explode(F.sequence(F.lit(0), F.lit(saltFactor - 1))))
    salted.join(exploded, keys :+ salt, how).drop(salt)
  }
}
