package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.DataType

import graft.core.{Dtypes, Expr, TableFrame}

/** User-facing API entry, mirroring `import tabsdata as td` (reference:
  * client/td-sdk/tabsdata/__init__.py surface): `td.col`, `td.lit`,
  * `td.concat`, dtypes, selectors. */
object td {
  def col(name: String): Expr = Expr(F.col(s"`$name`"))
  def cols(names: String*): Seq[Expr] = names.map(col)
  def lit(v: Any): Expr = Expr(F.lit(v))
  def lit(v: Any, dtype: DataType): Expr = Expr(F.lit(v).cast(dtype))

  def concat(items: Seq[TableFrame], how: String = "vertical"): TableFrame =
    TableFrame.concat(items, how)

  val dtypes: Dtypes.type = Dtypes
  val selectors: core.Selectors.type = core.Selectors

  /** Standard session for this engine: AQE on, sensible shuffle parallelism
    * for the local harness, UTC. On a real cluster these come from conf. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing stays parallelism-first (the default): measured on
      // the dedup layer, size-first coalescing (parallelismFirst=false)
      // under-parallelized the CPU-dense shingle/pair shuffles — n-gram
      // Jaccard regressed ~2× at sf0.1 because its shuffled bytes are small
      // relative to its per-row compute. Size-first is a per-cluster
      // utilization knob, not a per-query win.
      // ns-precision parquet timestamps (e.g. the events table) read as Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
