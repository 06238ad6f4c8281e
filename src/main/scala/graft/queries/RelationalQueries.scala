package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.core.{Expr, TableFrame}
import graft.td

/** Correctness-gate queries over the relational operator surface (SURVEY §2.2-
  * 2.7), each paired with an equivalent DuckDB oracle in [[graft.SparkEntry]].
  *
  * Determinism rules used throughout (both sides):
  *  - money/double sums go through DECIMAL(18,2) so the aggregation is exact
  *    and association-order-independent, then cast back to DOUBLE;
  *  - every query ends in a total deterministic ORDER BY;
  *  - null ordering is always explicit (Spark defaults NULLS FIRST on ASC,
  *    DuckDB NULLS LAST).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): TableFrame =
    TableFrame.fromDF(s.read.parquet(s"$dir/$name.parquet"))

  private val dec = DecimalType(18, 2)
  private def dsum(e: Expr): Expr = Expr(F.sum(e.col.cast(dec)).cast(DoubleType))

  val queries: Map[String, Q] = Map(
    // --- aggregation (§2.4) ---
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .group_by("l_returnflag", "l_linestatus")
        .agg(
          dsum(td.col("l_quantity")).as("sum_qty"),
          dsum(td.col("l_extendedprice")).as("sum_price"),
          Expr((F.sum(td.col("l_discount").col.cast(dec)).cast(DoubleType) /
            F.count(F.lit(1))).as("avg_disc")),
          td.col("l_orderkey").n_unique.as("n_orders"),
          td.lit(1).len.as("n_rows"))
        .sort(Seq("l_returnflag", "l_linestatus")).df
    }),
    "q_agg_filtered" -> ((s, dir) => {
      // Expr.filter: conditional aggregation input (expr.py:913)
      t(s, dir, "lineitem")
        .group_by("l_linestatus")
        .agg(
          dsum(td.col("l_quantity").filter(td.col("l_returnflag") === "R")).as("qty_returned"),
          dsum(td.col("l_quantity")).as("qty_all"))
        .sort(Seq("l_linestatus")).df
    }),
    "q_agg_shortcut_minmax" -> ((s, dir) => {
      t(s, dir, "orders")
        .group_by("o_orderstatus")
        .agg(
          td.col("o_totalprice").min.as("min_price"),
          td.col("o_totalprice").max.as("max_price"),
          td.col("o_custkey").n_unique.as("n_cust"),
          td.col("o_orderkey").count.as("n_orders"))
        .sort(Seq("o_orderstatus")).df
    }),
    "q_agg_whole_frame" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        dsum(td.col("l_extendedprice")).as("total_price"),
        td.col("l_orderkey").n_unique.as("n_orders"),
        td.lit(1).len.as("n_rows")).df
    }),

    // --- projection / filter / slicing (§2.2) ---
    "q_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(td.col("l_shipdate") >= java.sql.Timestamp.valueOf("1995-06-01 00:00:00"),
          td.col("l_discount").is_between(0.02, 0.05))
        .select(
          td.col("l_orderkey"), td.col("l_linenumber"),
          // exact decimal arithmetic → double: round() on doubles diverges
          // between engines at .xx5 boundaries (Java shortest-repr HALF_UP)
          (td.col("l_extendedprice").cast(dec, strict = true) *
            (td.lit(1).cast(dec, strict = true) - td.col("l_discount").cast(dec, strict = true)))
            .cast(DoubleType).as("disc_price"))
        .sort(Seq("l_orderkey", "l_linenumber")).limit(500).df
    }),
    "q_with_columns" -> ((s, dir) => {
      t(s, dir, "part")
        .with_columns(
          "markup" -> (td.col("p_retailprice").cast(dec, strict = true) *
            td.lit("1.10").cast(DecimalType(3, 2), strict = true)).cast(DoubleType),
          "name_upper" -> td.col("p_name").str.to_uppercase,
          "size_class" -> Expr(F.when(td.col("p_size").col < 10, "small")
            .when(td.col("p_size").col < 30, "medium").otherwise("large")))
        .selectCols("p_partkey", "markup", "name_upper", "size_class")
        .sort(Seq("p_partkey")).limit(300).df
    }),
    "q_slice" -> ((s, dir) => {
      t(s, dir, "orders").sort(Seq("o_orderkey"))
        .slice(100, 50)
        .selectCols("o_orderkey", "o_custkey", "o_orderstatus").df
    }),
    "q_cast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          td.col("l_orderkey"),
          td.col("l_linenumber"),
          td.col("l_quantity").floor.cast(LongType).as("qty_int"),
          td.col("l_linenumber").cast(StringType).as("line_str"),
          td.col("l_tax").cast(dec).cast(DoubleType).as("tax_dec"))
        .sort(Seq("l_orderkey", "l_linenumber")).limit(400).df
    }),
    "q_rename_drop" -> ((s, dir) => {
      t(s, dir, "nation")
        .rename("n_name" -> "nation_name")
        .drop("n_regionkey")
        .sort(Seq("n_nationkey")).df
    }),

    // --- joins (§2.3) ---
    "q_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"), how = "inner")
        .group_by("c_mktsegment")
        .agg(dsum(td.col("o_totalprice")).as("revenue"),
          td.lit(1).len.as("n_orders"))
        .sort(Seq("c_mktsegment")).df
    }),
    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"), how = "left")
        .group_by("c_custkey")
        .agg(Expr(F.count(F.col("o_orderkey")).as("n_orders")),
          dsum(td.col("o_totalprice")).fill_null(0.0).as("spend"))
        .sort(Seq("c_custkey")).df
    }),
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"), how = "semi")
        .selectCols("c_custkey", "c_name").sort(Seq("c_custkey")).df
    }),
    "q_join_anti" -> ((s, dir) => {
      // Right side restricted to bulk shipments (l_quantity >= 45) so the
      // anti-join selects a real, non-empty proper subset of part — every
      // part appears in unrestricted lineitem, which would make the gate
      // pass vacuously on 0 = 0 rows.
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem").filter(td.col("l_quantity") >= 45)
      p.join(l, leftOn = Seq("p_partkey"), rightOn = Seq("l_partkey"), how = "anti")
        .selectCols("p_partkey", "p_retailprice").sort(Seq("p_partkey")).df
    }),
    "q_join_full_coalesce" -> ((s, dir) => {
      val bySupp = t(s, dir, "supplier").group_by("s_nationkey")
        .agg(td.lit(1).len.as("n_supp")).rename("s_nationkey" -> "nationkey")
      val byCust = t(s, dir, "customer").group_by("c_nationkey")
        .agg(td.lit(1).len.as("n_cust")).rename("c_nationkey" -> "nationkey")
      bySupp.join(byCust, on = Seq("nationkey"), how = "full",
          coalesceKeys = Some(true))
        .with_columns(
          "n_supp" -> td.col("n_supp").fill_null(0L),
          "n_cust" -> td.col("n_cust").fill_null(0L))
        .sort(Seq("nationkey")).df
    }),
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region").selectCols("r_name")
      val r2 = t(s, dir, "region").rename("r_name" -> "r_name2").selectCols("r_name2")
      r.join(r2, how = "cross").sort(Seq("r_name", "r_name2")).df
    }),
    "q_join_three_way" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(n, leftOn = Seq("c_nationkey"), rightOn = Seq("n_nationkey"))
        .join(r, leftOn = Seq("n_regionkey"), rightOn = Seq("r_regionkey"))
        .group_by("r_name")
        .agg(dsum(td.col("c_acctbal")).as("acct_sum"), td.lit(1).len.as("n_cust"))
        .sort(Seq("r_name")).df
    }),

    // --- sort / unique / concat / nulls (§2.6) ---
    "q_sort_nulls" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("bal" -> Expr(F.when(td.col("c_acctbal").col < 0, null)
          .otherwise(td.col("c_acctbal").col)))
        .selectCols("c_custkey", "bal")
        .sort(Seq("bal", "c_custkey"), Seq(true, false), nullsLast = true)
        .limit(200).df
    }),
    "q_unique_any" -> ((s, dir) => {
      t(s, dir, "lineitem").selectCols("l_returnflag", "l_linestatus")
        .unique(Seq("l_returnflag", "l_linestatus"))
        .sort(Seq("l_returnflag", "l_linestatus")).df
    }),
    "q_unique_none" -> ((s, dir) => {
      t(s, dir, "orders")
        .unique(Seq("o_custkey"), keep = "none")
        .selectCols("o_orderkey", "o_custkey")
        .sort(Seq("o_orderkey")).df
    }),
    "q_concat_vertical" -> ((s, dir) => {
      val hi = t(s, dir, "orders").filter(td.col("o_totalprice") > 400000.0)
      val lo = t(s, dir, "orders").filter(td.col("o_totalprice") < 1000.0)
      td.concat(Seq(hi, lo))
        .selectCols("o_orderkey", "o_totalprice")
        .sort(Seq("o_orderkey")).df
    }),
    "q_concat_diagonal" -> ((s, dir) => {
      val a = t(s, dir, "region").select(td.col("r_regionkey").as("k"), td.col("r_name").as("name"))
      val b = t(s, dir, "nation").select(td.col("n_nationkey").as("k"), td.col("n_regionkey").as("extra"))
      td.concat(Seq(a, b), how = "diagonal")
        .sort(Seq("k", "name"), nullsLast = false).df
    }),
    "q_fill_drop_nulls" -> ((s, dir) => {
      val withNulls = t(s, dir, "customer")
        .with_columns("bal" -> Expr(F.when(td.col("c_acctbal").col < 0, null)
          .otherwise(td.col("c_acctbal").col)))
      withNulls
        .with_columns("bal_filled" -> td.col("bal").fill_null(td.lit(0.0)))
        .filter(td.col("bal").is_not_null)
        .selectCols("c_custkey", "bal", "bal_filled")
        .sort(Seq("c_custkey")).limit(300).df
    }),

    // --- window-ish (§2.5) ---
    "q_rank" -> ((s, dir) => {
      t(s, dir, "supplier")
        .with_columns(
          "rank_min" -> td.col("s_acctbal").rank("min", descending = true),
          "rank_dense" -> td.col("s_acctbal").rank("dense", descending = true))
        .selectCols("s_suppkey", "rank_min", "rank_dense")
        .sort(Seq("s_suppkey")).df
    }),
    "q_diff" -> ((s, dir) => {
      t(s, dir, "orders").sort(Seq("o_orderkey")).limit(1000)
        .with_columns("price_diff" ->
          Expr((F.col("o_totalprice") - F.lag("o_totalprice", 1)
            .over(org.apache.spark.sql.expressions.Window.orderBy("o_orderkey"))).as("price_diff")))
        .selectCols("o_orderkey", "price_diff")
        .sort(Seq("o_orderkey")).df
    }),
    "q_is_unique" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("uniq_bal" -> td.col("c_acctbal").is_unique)
        .selectCols("c_custkey", "uniq_bal")
        .sort(Seq("c_custkey")).limit(500).df
    }),

    // --- scalar function coverage (§2.7) ---
    "q_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          td.col("l_orderkey"), td.col("l_linenumber"),
          td.col("l_discount").abs.round(2).as("disc_abs"),
          (td.col("l_quantity").sqrt).round(4).as("qty_sqrt"),
          td.col("l_extendedprice").log(math.E).round(4).as("price_ln"),
          td.col("l_extendedprice").log10.round(4).as("price_log10"),
          td.col("l_quantity").ceil.cast(LongType).as("qty_ceil"),
          td.col("l_quantity").floor.cast(LongType).as("qty_floor"),
          (td.col("l_extendedprice") - 30000.0).sign.as("price_sign"))
        .sort(Seq("l_orderkey", "l_linenumber")).limit(400).df
    }),
    "q_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          td.col("p_partkey"),
          td.col("p_name").str.to_uppercase.as("name_up"),
          td.col("p_brand").str.to_lowercase.as("brand_lo"),
          td.col("p_name").str.len_chars.as("name_len"),
          td.col("p_name").str.slice(0, 8).as("name_head"),
          td.col("p_brand").str.replace_all("#", "-", literal = true).as("brand_dash"),
          td.col("p_name").str.contains("green", literal = true).as("has_green"),
          td.col("p_type").str.starts_with("STANDARD").as("is_standard"),
          td.col("p_partkey").cast(StringType).str.zfill(8).as("key_padded"))
        .sort(Seq("p_partkey")).limit(400).df
    }),
    "q_string_regex" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          td.col("p_partkey"),
          td.col("p_type").str.extract("^(\\w+)", 1).as("type_first"),
          td.col("p_name").str.count_matches("a").as("n_a"),
          td.col("p_type").str.contains("BRUSHED").as("is_brushed"))
        .sort(Seq("p_partkey")).limit(400).df
    }),
    "q_dt_parts" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          td.col("o_orderkey"),
          td.col("o_orderdate").dt.year.as("y"),
          td.col("o_orderdate").dt.quarter.as("q"),
          td.col("o_orderdate").dt.month.as("m"),
          td.col("o_orderdate").dt.day.as("d"),
          td.col("o_orderdate").dt.weekday.as("iso_dow"),
          td.col("o_orderdate").dt.ordinal_day.as("doy"))
        .sort(Seq("o_orderkey")).limit(500).df
    }),
    "q_dt_trunc_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .with_columns("month" -> td.col("o_orderdate").dt.truncate("1mo"))
        .group_by("month")
        .agg(td.lit(1).len.as("n"), dsum(td.col("o_totalprice")).as("rev"))
        .sort(Seq("month")).df
    }),
    "q_case_buckets" -> ((s, dir) => {
      t(s, dir, "orders")
        .with_columns("bucket" -> Expr(
          F.when(F.col("o_totalprice") < 50000.0, "low")
            .when(F.col("o_totalprice") < 200000.0, "mid")
            .otherwise("high")))
        .group_by("bucket")
        .agg(td.lit(1).len.as("n"))
        .sort(Seq("bucket")).df
    }),
    "q_null_safe_eq" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("nk" -> Expr(F.when(F.col("c_nationkey") % 7 === 0, null)
          .otherwise(F.col("c_nationkey"))))
        .with_columns(
          "eqm_5" -> td.col("nk").eq_missing(5),
          "eqm_null" -> td.col("nk").eq_missing(td.lit(null)))
        .selectCols("c_custkey", "eqm_5", "eqm_null")
        .sort(Seq("c_custkey")).limit(400).df
    }),
    "q_grok" -> ((s, dir) => {
      // grok over a log-shaped string assembled from order fields
      t(s, dir, "orders")
        .with_columns("line" -> Expr(F.concat_ws(" ",
          F.col("o_orderpriority"), F.col("o_orderstatus"),
          F.col("o_orderkey"), F.col("o_totalprice"))))
        .grok("line", "%{DATA:prio} %{WORD:status} %{INT:okey:int} %{NUMBER:price:float}$")
        .selectCols("o_orderkey", "prio", "status", "okey", "price")
        .sort(Seq("o_orderkey")).limit(500).df
    })
  )
}
