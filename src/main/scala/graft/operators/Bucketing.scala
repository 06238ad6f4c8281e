package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the shuffle-free join story for tables that
  * are joined on the same key again and again (the fact/dimension pattern
  * every warehouse pipeline hits).
  *
  * Why it matters at 100 TB: a shuffled sort-merge join moves BOTH sides
  * over the network every time the join runs. Writing each side
  * `bucketBy(n, key)` (hash-partitioned into a fixed number of files,
  * optionally sorted within buckets) pins Spark's `HashPartitioning` into
  * the table metadata, so every later equi-join or aggregation on that
  * key reads the buckets co-located and skips the exchange entirely —
  * pay the shuffle once at write time, never again. PlanSpec proves the
  * join of two bucketed tables plans with ZERO Exchange operators and
  * the q_join_bucketed gate pins the result values.
  *
  * Spark requires a catalog table for bucketing metadata (`saveAsTable`;
  * plain parquet paths cannot carry it) — the session catalog here, any
  * metastore in production.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table.
    * Overwrite mode also clears a stale warehouse location left by a
    * previous session whose (in-memory) catalog entry is gone — without
    * this, `saveAsTable` fails LOCATION_ALREADY_EXISTS on the second run
    * of any session-catalog workflow. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite && !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — plans with no
    * Exchange on either side when both were written with the same bucket
    * count over the join keys. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
