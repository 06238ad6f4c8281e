package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.core.{Expr, TableFrame}
import graft.td

/** Fourth coverage batch: the Polars-vs-Spark semantic watchlist made into
  * gated queries (SURVEY §7.3a) — NaN handling, median interpolation,
  * datetime format round-trips, business-day arithmetic, duration totals,
  * unsigned reinterpret, remaining concat/membership/clear surface. */
object ParityQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): TableFrame =
    Tables.frame(s, dir, name)

  val queries: Map[String, Q] = Map(
    "q_nan_handling" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .with_columns("v" -> Expr(F.when(F.col("c_custkey") % 10 === 0, Double.NaN)
          .otherwise(F.col("c_acctbal"))))
      c.with_columns(
          "v_is_nan" -> td.col("v").is_nan,
          "v_filled" -> td.col("v").fill_nan(0.0),
          "v_not_nan" -> td.col("v").is_not_nan)
        .selectCols("c_custkey", "v_is_nan", "v_filled", "v_not_nan")
        .sort(Seq("c_custkey")).limit(400).df
    }),
    "q_drop_nans" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("v" -> Expr(F.when(F.col("c_custkey") % 10 === 0, Double.NaN)
          .otherwise(F.col("c_acctbal"))))
        .drop_nans(Seq("v"))
        .agg(td.lit(1).len.as("n_rows"),
          Expr(F.sum(F.col("v").cast(DecimalType(18, 2))).cast(DoubleType).as("v_sum"))).df
    }),
    "q_agg_median" -> ((s, dir) => {
      t(s, dir, "orders")
        .group_by("o_orderstatus")
        .agg(
          td.col("o_totalprice").median.as("med_price"),
          td.col("o_custkey").cast(DoubleType).median.as("med_cust"))
        .sort(Seq("o_orderstatus")).df
    }),
    "q_strftime" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          td.col("o_orderkey"),
          td.col("o_orderdate").dt.strftime("%Y-%m-%d").as("iso_day"),
          td.col("o_orderdate").dt.strftime("%d/%m/%Y %H:%M:%S").as("eu_full"),
          td.col("o_orderdate").dt.strftime("%Y|%j").as("year_doy"))
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_str_dt_roundtrip" -> ((s, dir) => {
      // to_string then str.to_datetime / str.to_date round-trips
      t(s, dir, "orders")
        .with_columns("formatted" -> td.col("o_orderdate").dt.strftime("%Y-%m-%d %H:%M:%S"))
        .select(
          td.col("o_orderkey"),
          td.col("formatted").str.to_datetime("%Y-%m-%d %H:%M:%S").as("parsed_ts"),
          td.col("formatted").str.to_date("%Y-%m-%d %H:%M:%S")
            .cast(TimestampType).as("parsed_day"))
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_business_days" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          td.col("o_orderkey"),
          // dates cast to timestamp: DATE-typed outputs round-trip
          // inconsistently through pandas (date objects vs datetime64)
          td.col("o_orderdate").dt.date.cast(TimestampType).as("d0"),
          td.col("o_orderdate").dt.add_business_days(3).cast(TimestampType).as("d_plus3"),
          td.col("o_orderdate").dt.add_business_days(10).cast(TimestampType).as("d_plus10"))
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_duration_totals" -> ((s, dir) => {
      t(s, dir, "orders")
        .with_columns("dur" -> Expr(
          F.col("o_orderdate") - F.date_trunc("YEAR", F.col("o_orderdate"))))
        .select(
          td.col("o_orderkey"),
          td.col("dur").dt.total_days.as("tot_d"),
          td.col("dur").dt.total_hours.as("tot_h"),
          td.col("dur").dt.total_seconds.as("tot_s"))
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_reinterpret" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("neg" -> (td.lit(0L) - td.col("c_custkey")))
        .select(
          td.col("c_custkey"),
          td.col("neg").reinterpret(signed = false).cast(StringType).as("as_unsigned"),
          td.col("c_custkey").reinterpret(signed = false).cast(StringType).as("pos_unsigned"))
        .sort(Seq("c_custkey")).limit(300).df
    }),
    "q_concat_diag_relaxed" -> ((s, dir) => {
      val a = t(s, dir, "nation").select(td.col("n_nationkey").as("k"), td.col("n_name").as("name"))
      val b = t(s, dir, "customer").filter(td.col("c_custkey") <= 20)
        .select(td.col("c_acctbal").as("k"), td.col("c_mktsegment").as("seg"))
      TableFrame.concat(Seq(a, b), how = "diagonal_relaxed")
        .sort(Seq("k", "name"), nullsLast = false).df
    }),
    "q_membership" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(td.col("o_orderpriority").is_in(Seq("1-URGENT", "2-HIGH")))
        .with_columns(
          "left_open" -> td.col("o_totalprice").is_between(50000.0, 100000.0, "left"),
          "right_open" -> td.col("o_totalprice").is_between(50000.0, 100000.0, "right"))
        .selectCols("o_orderkey", "o_orderpriority", "left_open", "right_open")
        .sort(Seq("o_orderkey")).limit(400).df
    }),
    "q_unnest" -> ((s, dir) => {
      t(s, dir, "customer")
        .with_columns("packed" -> Expr(F.struct(
          F.col("c_name").as("cn"), (F.col("c_acctbal") * 2).as("bal2"))))
        .selectCols("c_custkey", "packed")
        .unnest("packed")
        .sort(Seq("c_custkey")).limit(300).df
    }),
    "q_clear" -> ((s, dir) => {
      t(s, dir, "nation").clear().selectCols("n_nationkey", "n_name").df
    })
  )
}
