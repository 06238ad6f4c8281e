package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** How a frame came to be (reference: frame.py:86-104 `TableFrameOrigin`). */
object Origin extends Enumeration {
  val Import, Build, Init, Transform = Value
}

/** Lazy, schema-carrying table — the engine's core abstraction.
  *
  * Mirrors the reference's `TableFrame` (a wrapper over `pl.LazyFrame`,
  * reference: client/td-sdk/tabsdata/tableframe/lazyframe/frame.py:108-122)
  * re-expressed over Spark's `DataFrame`, which is lazy by construction: every
  * method below only extends the Catalyst logical plan; nothing executes until
  * a sink/collect. System columns (`$td.*`) are maintained at boundaries only
  * (SURVEY §7.1) so Catalyst sees plain projections it can prune and push down.
  */
final case class TableFrame(df: DataFrame, origin: Origin.Value = Origin.Transform) {
  import SystemColumns.{isSystem, validateUserName}

  private def wrap(d: DataFrame): TableFrame = TableFrame(d, origin)
  private def sysCols: Seq[String] = SystemColumns.systemColumns(df)
  private def bq(n: String): Column = F.col(s"`$n`")

  /** Column names by kind (reference: frame.py:405-418). */
  def columns(kind: String = "user"): Seq[String] = kind match {
    case "all"    => df.columns.toSeq
    case "user"   => SystemColumns.userColumns(df)
    case "system" => sysCols
  }
  def schema: StructType = df.schema
  def userSchema: StructType = StructType(df.schema.filterNot(f => isSystem(f.name)))

  // ---- projections (frame.py:2052-2132, SURVEY §2.2) ----

  /** select: projection that silently carries REQUIRED system columns through
    * (reference: frame.py:2101-2121). */
  def select(exprs: Expr*): TableFrame = {
    val keep = sysCols.map(bq)
    wrap(SystemColumns.arrange(df.select(exprs.map(_.col) ++ keep: _*)))
  }
  def selectCols(names: String*): TableFrame = select(names.map(n => Expr(bq(n))): _*)

  /** with_columns: add/replace computed columns (frame.py:1181-1237). */
  def with_columns(named: (String, Expr)*): TableFrame = {
    named.foreach { case (n, _) => validateUserName(n) }
    wrap(SystemColumns.arrange(
      df.withColumns(named.map { case (n, e) => n -> e.col }.toMap)))
  }

  def drop(cols: String*): TableFrame = drop(cols, strict = false)
  def drop(cols: Seq[String], strict: Boolean): TableFrame = {
    if (strict) {
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty, s"drop(strict): missing columns $missing")
    }
    wrap(df.drop(cols.filterNot(isSystem): _*))
  }

  /** rename: strict, name-validated (frame.py:1445-1510). */
  def rename(mapping: (String, String)*): TableFrame = {
    val missing = mapping.map(_._1).filterNot(df.columns.contains)
    require(missing.isEmpty, s"rename: missing columns $missing")
    mapping.foreach { case (_, to) => validateUserName(to) }
    wrap(df.withColumnsRenamed(mapping.toMap))
  }

  /** filter: AND-ed predicates (frame.py:1985-2043). */
  def filter(predicates: Expr*): TableFrame =
    wrap(df.filter(predicates.map(_.col).reduce(_ && _)))

  /** unnest: struct column → one column per field, in place (frame.py:1579-1643). */
  def unnest(cols: String*): TableFrame = {
    val out = df.columns.toSeq.flatMap { n =>
      if (cols.contains(n)) {
        val st = df.schema(n).dataType.asInstanceOf[StructType]
        st.fieldNames.toSeq.map(f => bq(n).getField(f).as(f))
      } else Seq(bq(n))
    }
    wrap(df.select(out: _*))
  }

  // ---- row slicing (frame.py:2195-2576) ----
  def slice(offset: Int, length: Int): TableFrame = wrap(df.offset(offset).limit(length))
  def limit(n: Int): TableFrame = wrap(df.limit(n))
  def head(n: Int = 5): TableFrame = limit(n)
  def tail(n: Int = 5): TableFrame = {
    // distributed tail: total count is one cheap job; avoids driver collect
    val total = df.count()
    val off = math.max(0L, total - n)
    require(off <= Int.MaxValue,
      s"tail: offset $off exceeds Int range; tail of a >2B-row frame needs an explicit sort")
    wrap(df.offset(off.toInt))
  }
  def first(): TableFrame = limit(1)
  def last(): TableFrame = tail(1)
  def first_row(): Option[Row] = df.take(1).headOption
  def last_row(): Option[Row] = tail(1).df.take(1).headOption
  /** 1×1 scalar extract (frame.py:2547-2576). */
  def item(): Any = {
    val rows = df.take(2)
    require(rows.length == 1 && rows.head.length == 1, "item() requires a 1x1 frame")
    rows.head.get(0)
  }
  /** keep schema, drop rows (frame.py:968-1009). */
  def clear(): TableFrame = wrap(df.limit(0))

  /** cast: per-column dtype map (frame.py:896-963). strict=false → null on error. */
  def cast(types: Map[String, DataType], strict: Boolean = false): TableFrame =
    wrap(df.withColumns(types.map { case (n, t) =>
      n -> (if (strict) bq(n).cast(t) else bq(n).try_cast(t))
    }))

  // ---- sort (frame.py:820-891) ----
  /** maintain_order=true appends an input-ordinal tiebreaker because Spark's
    * distributed sort is not stable (SURVEY §4 sort-determinism note). */
  def sort(by: Seq[String], descending: Seq[Boolean] = Nil, nullsLast: Boolean = false,
      maintainOrder: Boolean = false): TableFrame = {
    val desc = if (descending.isEmpty) Seq.fill(by.size)(false) else descending
    val keys = by.zip(desc).map { case (n, d) =>
      (d, nullsLast) match {
        case (false, false) => bq(n).asc_nulls_first
        case (false, true)  => bq(n).asc_nulls_last
        case (true, false)  => bq(n).desc_nulls_first
        case (true, true)   => bq(n).desc_nulls_last
      }
    }
    if (!maintainOrder) wrap(df.sort(keys: _*))
    else {
      val ord = "$td.__ord"
      wrap(df.withColumn(ord, F.monotonically_increasing_id())
        .sort(keys :+ F.col(s"`$ord`").asc: _*)
        .drop(ord))
    }
  }
  def sort(by: String): TableFrame = sort(Seq(by))
  def sort(by: String, descending: Boolean): TableFrame = sort(Seq(by), Seq(descending))

  // ---- joins (frame.py:1017-1173, SURVEY §2.3) ----
  /** Equi-join with the reference's semantics: strategies inner/left/right/
    * full/semi/anti/cross, right-side duplicate columns suffixed, optional
    * null-safe key equality (`join_nulls`), optional key coalescing, and
    * right-side `$td.*` dropped afterwards. Catalyst picks the physical join
    * (broadcast / SMJ / shuffled-hash) and AQE re-plans at runtime. */
  def join(other: TableFrame, on: Seq[String] = Nil, leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil, how: String = "inner", suffix: String = "_right",
      joinNulls: Boolean = false, coalesceKeys: Option[Boolean] = None,
      broadcastRight: Boolean = false): TableFrame = {
    val strategy = how match {
      case "inner" | "left" | "right" | "full" | "outer" | "cross" => how
      case "semi" => "left_semi"
      case "anti" => "left_anti"
    }
    val (lk, rk) =
      if (on.nonEmpty) (on, on)
      else (leftOn, rightOn)
    require(strategy == "cross" || lk.nonEmpty, "join requires keys (or how=cross)")
    require(lk.length == rk.length, "left_on/right_on length mismatch")

    // pre-join rename pass: Spark has no suffix option (SURVEY §2.3).
    // A USING-style join (plain equality keys) needs no rename for the key
    // columns; every other shape (null-safe keys, full joins) compares
    // explicit columns, so same-named right keys must be suffixed first.
    val keepRightKeys = strategy == "full" || strategy == "outer" || on.isEmpty
    val usingJoin = on.nonEmpty && !keepRightKeys && !joinNulls
    val leftUser = df.columns.toSet
    val collide = other.df.columns.filter(n =>
      leftUser.contains(n) && !(on.contains(n) && usingJoin))
    // Spark-first extension: explicit broadcast hint for known-small dims
    // (Catalyst/AQE auto-broadcasts below the threshold; this forces it)
    val renamed0 = collide.foldLeft(other.df)((d, n) => d.withColumnRenamed(n, n + suffix))
    val renamed = if (broadcastRight) F.broadcast(renamed0) else renamed0
    def rname(n: String): String = if (collide.contains(n)) n + suffix else n

    val joined =
      if (strategy == "cross") df.crossJoin(renamed)
      else if (usingJoin) {
        // USING-style join: single key column out, no dup — cheapest plan
        df.join(renamed, on, strategy)
      } else {
        val cond = lk.zip(rk).map { case (l, r) =>
          val (lc, rc) = (bq(l), F.col(s"`${rname(r)}`"))
          if (joinNulls) lc <=> rc else lc === rc
        }.reduce(_ && _)
        df.join(renamed, cond, strategy)
      }

    // merge duplicated key columns back into one (Polars coalesce semantics:
    // default true for `on` joins)
    val doCoalesce = coalesceKeys.getOrElse(on.nonEmpty)
    val out =
      if (!usingJoin && strategy != "cross" && on.nonEmpty && doCoalesce) {
        on.foldLeft(joined) { (d, k) =>
          if (joined.columns.contains(k + suffix))
            d.withColumn(k, F.coalesce(F.col(s"`$k`"), F.col(s"`${k + suffix}`")))
              .drop(k + suffix)
          else d
        }
      } else joined

    wrap(SystemColumns.assembleAfterJoin(out, suffix))
  }

  // ---- group_by (frame.py:2140-2191, SURVEY §2.4) ----
  /** Hash aggregation; Spark plans partial (map-side) + final agg with an
    * exchange on the group keys automatically. System columns are dropped
    * from agg output (OSS metadata declares no system-column aggregation,
    * reference: lazyframe/group_by.py:110-152). */
  def group_by(by: String*): TableFrameGroupBy =
    new TableFrameGroupBy(this, by.map(n => Expr(bq(n))))
  def group_by_exprs(by: Expr*): TableFrameGroupBy = new TableFrameGroupBy(this, by)

  /** Whole-frame aggregation via select-of-aggregates (SURVEY §2.4). */
  def agg(exprs: Expr*): TableFrame =
    TableFrame(df.agg(exprs.head.col, exprs.tail.map(_.col): _*), origin)

  // ---- dedup / set-ish ops (frame.py:1764-1834, SURVEY §2.6) ----
  /** unique with keep=any|first|last|none (reference enum typing.py:53-58).
    * `any` is a plain hash dedup (map-side combine, scales); first/last/none
    * need an input ordinal + window (one shuffle on the subset). */
  def unique(subset: Seq[String] = Nil, keep: String = "any",
      maintainOrder: Boolean = false): TableFrame = {
    val userCols = columns("user")
    val sub = if (subset.isEmpty) userCols else subset
    val ord = "$td.__ord"
    def keptByPosition(takeFirst: Boolean): DataFrame = {
      val w = Window.partitionBy(sub.map(bq): _*)
        .orderBy(if (takeFirst) F.col(s"`$ord`").asc else F.col(s"`$ord`").desc)
      val kept = df.withColumn(ord, F.monotonically_increasing_id())
        .withColumn("$td.__rn", F.row_number().over(w))
        .filter(F.col("`$td.__rn`") === 1)
        .drop("$td.__rn")
      val ordered = if (maintainOrder) kept.sort(F.col(s"`$ord`").asc) else kept
      ordered.drop(ord)
    }
    keep match {
      case "any" =>
        // maintain_order needs a deterministic representative → first-occurrence
        if (maintainOrder) wrap(keptByPosition(takeFirst = true))
        else wrap(df.dropDuplicates(sub))
      case "first" => wrap(keptByPosition(takeFirst = true))
      case "last"  => wrap(keptByPosition(takeFirst = false))
      case "none" =>
        val w = Window.partitionBy(sub.map(bq): _*)
        val base = df.withColumn(ord, F.monotonically_increasing_id())
          .withColumn("$td.__cnt", F.count(F.lit(1)).over(w))
          .filter(F.col("`$td.__cnt`") === 1)
          .drop("$td.__cnt")
        wrap((if (maintainOrder) base.sort(F.col(s"`$ord`").asc) else base).drop(ord))
    }
  }

  // ---- null/nan handling (frame.py:1648-1977) ----
  def drop_nulls(subset: Seq[String] = Nil): TableFrame = {
    val sub = if (subset.isEmpty) columns("user") else subset
    // NOT df.na.drop: Spark's na.drop also removes NaN rows, but the
    // reference's drop_nulls keeps NaN (null and NaN are distinct, §1.3)
    wrap(df.filter(sub.map(n => bq(n).isNotNull).reduce(_ && _)))
  }
  def drop_nans(subset: Seq[String] = Nil): TableFrame = {
    val sub = if (subset.isEmpty) floatCols else subset
    if (sub.isEmpty) this
    else wrap(df.filter(sub.map(n => !F.isnan(bq(n)) || bq(n).isNull).reduce(_ && _)))
  }
  def fill_null(value: Any): TableFrame = {
    val cols = columns("user")
    wrap(df.withColumns(cols.map(n => n -> F.coalesce(bq(n),
      F.lit(value).try_cast(df.schema(n).dataType))).toMap))
  }
  def fill_nan(value: Any): TableFrame = {
    val cols = floatCols
    wrap(df.withColumns(cols.map(n =>
      n -> F.when(F.isnan(bq(n)), F.lit(value).cast(df.schema(n).dataType)).otherwise(bq(n))).toMap))
  }
  /** fill_null(strategy=forward/backward/min/max/mean/zero/one) for one column
    * (reference: expr.py:868, strategies typing.py:77-85). Window-based;
    * forward/backward use an input-ordinal frame order.
    * SCALE NOTE: frame-order fills need a global unpartitioned window (single
    * reducer) — at cluster scale prefer a keyed variant (partitionBy a
    * sessioning key) or a sort-merge formulation; same caveat as rank(). */
  def fill_null_strategy(column: String, strategy: String): TableFrame = strategy match {
    case "zero" => with_columns(column -> Expr(F.coalesce(bq(column), F.lit(0).cast(df.schema(column).dataType))))
    case "one"  => with_columns(column -> Expr(F.coalesce(bq(column), F.lit(1).cast(df.schema(column).dataType))))
    case "min" | "max" | "mean" =>
      val agg = strategy match {
        case "min" => F.min(bq(column)); case "max" => F.max(bq(column)); case _ => F.avg(bq(column))
      }
      val filled = F.coalesce(bq(column), agg.over(Window.partitionBy()).cast(df.schema(column).dataType))
      wrap(df.withColumn(column, filled))
    case "forward" | "backward" =>
      val ord = "$td.__ord"
      val base = Window.orderBy(
        if (strategy == "forward") F.col(s"`$ord`").asc else F.col(s"`$ord`").desc)
      val w = base.rowsBetween(Window.unboundedPreceding, 0)
      wrap(df.withColumn(ord, F.monotonically_increasing_id())
        .withColumn(column, F.last(bq(column), ignoreNulls = true).over(w))
        .drop(ord))
  }

  private def floatCols: Seq[String] =
    df.schema.fields.filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(_.name).toSeq.filterNot(isSystem)

  // ---- grok (frame.py:2679-2782) ----
  /** Apply a grok pattern to a string column; capture fields become columns. */
  def grok(column: String, pattern: String): TableFrame = {
    val extra = graft.functions.GrokFunctions.grokColumns(bq(column), pattern)
    wrap(SystemColumns.arrange(df.select(df.columns.map(bq).toSeq ++ extra: _*)))
  }

  // ---- order-dependent helpers ----
  /** Attach a monotone input ordinal (frame order stand-in for the reference's
    * implicit row order — SURVEY §7.3(b)). Not contiguous across partitions,
    * but monotone in scan order, which is what diff/first/last need. */
  def withOrdinal(name: String = "$td.__ord"): TableFrame =
    wrap(df.withColumn(name, F.monotonically_increasing_id()))

  // ---- schema predicates (frame.py:597-813) ----
  def has_same_schema(other: TableFrame): Boolean =
    userSchema.map(f => (f.name, f.dataType)) ==
      other.userSchema.map(f => (f.name, f.dataType))
  def has_cols(names: Seq[String]): Boolean = names.forall(columns("user").contains)
  def assert_has_cols(names: Seq[String]): Unit = {
    val missing = names.filterNot(columns("user").contains)
    require(missing.isEmpty, s"missing columns: $missing")
  }

  /** shrink_dtype (expr.py:2040): narrow integral columns to the smallest
    * type holding their actual min/max. One aggregate pass (driver-side
    * schema decision, distributed scan), then a cast projection. */
  def shrink_dtype(cols: Seq[String] = Nil): TableFrame = {
    val intTypes: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val target = (if (cols.isEmpty) columns("user") else cols)
      .filter(n => intTypes.contains(df.schema(n).dataType))
    if (target.isEmpty) this
    else {
      val aggs = target.flatMap(n => Seq(F.min(bq(n)).as(s"min_$n"), F.max(bq(n)).as(s"max_$n")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val casts = target.flatMap { n =>
        val (lo, hi) = (Option(row.getAs[Any](s"min_$n")), Option(row.getAs[Any](s"max_$n")))
        (lo, hi) match {
          case (Some(l), Some(h)) =>
            val (lv, hv) = (l.toString.toLong, h.toString.toLong)
            val t =
              if (lv >= Byte.MinValue && hv <= Byte.MaxValue) ByteType
              else if (lv >= Short.MinValue && hv <= Short.MaxValue) ShortType
              else if (lv >= Int.MinValue && hv <= Int.MaxValue) IntegerType
              else LongType
            if (t != df.schema(n).dataType) Some(n -> bq(n).cast(t)) else None
          case _ => None
        }
      }
      if (casts.isEmpty) this else wrap(df.withColumns(casts.toMap))
    }
  }

  // ---- beyond-surface series/scale operators (reference excludes these
  // from TableFrame — UNSUPPORTED_METHODS — but Polars users have them;
  // delegating to graft.operators keeps one scale-grade implementation) ----

  /** As-of join (Polars `join_asof`): latest/nearest `other` row per time
    * key. Delegates to [[graft.operators.AsofJoin]] (union + keyed window,
    * no join node). */
  def join_asof(other: TableFrame, on: String, by: Seq[String] = Nil,
      strategy: String = "backward", toleranceMax: Option[Long] = None): TableFrame =
    wrap(graft.operators.AsofJoin.asofJoin(
      df, other.df.drop(other.sysCols: _*), on, by, strategy, toleranceMax))

  /** Melt/unpivot (Polars `melt`/`unpivot`): wide → long. System columns
    * ride along as ids. */
  def unpivot(ids: Seq[String], values: Seq[String],
      variableName: String = "variable", valueName: String = "value"): TableFrame =
    wrap(df.unpivot((ids ++ sysCols).map(bq).toArray, values.map(bq).toArray,
      variableName, valueName))

  /** Whole-frame top-k by a key: sort+limit, which Catalyst plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def top_k(k: Int, by: String, descending: Boolean = true): TableFrame =
    wrap(df.orderBy(if (descending) bq(by).desc else bq(by).asc).limit(k))
  def bottom_k(k: Int, by: String): TableFrame = top_k(k, by, descending = false)

  /** Contiguous row index along an explicit order (distributed, no
    * single-reducer stage) — see [[graft.operators.SeriesOps.withRowIndex]]. */
  def with_row_index(orderBy: Seq[String], name: String = "index",
      offset: Long = 0L): TableFrame =
    wrap(graft.operators.SeriesOps.withRowIndex(df, orderBy, name, offset))

  /** Linear interpolation of nulls along an order column (Polars
    * `interpolate`). */
  def interpolate(valueCol: String, orderCol: String,
      by: Seq[String] = Nil): TableFrame =
    wrap(graft.operators.SeriesOps.interpolate(df, valueCol, orderCol, by))

  /** merge_sorted: union + re-sort on the key. */
  def merge_sorted(other: TableFrame, key: String): TableFrame =
    wrap(graft.operators.SeriesOps.mergeSorted(df, other.df, key))

  /** approx_n_unique (HyperLogLog++): the sketch-based distinct count the
    * reference exposes on Expr — constant memory per group at any scale. */
  def approx_n_unique(col: String, rsd: Double = 0.05): TableFrame =
    wrap(df.agg(F.approx_count_distinct(bq(col), rsd).as("approx_n_unique")))

  /** Render the optimized plan (frame.py:545-585 explain/show_graph). */
  def explain_plan(mode: String = "formatted"): Unit = df.explain(mode)

  /** User-column dtypes in declaration order (frame.py:422 dtypes). */
  def dtypes: Seq[org.apache.spark.sql.types.DataType] = userSchema.map(_.dataType)

  /** User-column count (frame.py:430 width). */
  def width: Int = userSchema.length

  /** True iff the frame has no rows (frame.py:661 is_empty). */
  def is_empty: Boolean = df.isEmpty

  /** Debug passthrough: print a sample, return the frame unchanged
    * (frame.py:588 inspect — the reference formats through Polars'
    * inspect; here `show` renders the user columns). */
  def inspect(n: Int = 5): TableFrame = {
    df.select(columns("user").map(bq): _*).show(n, truncate = false)
    this
  }

  /** User-facing projection for external sinks: drops `$td.*` system
    * columns (reference subscribers never export them — the destination
    * write path strips system columns, _io/outputs/file_outputs.py). */
  def toExport: DataFrame = df.select(columns("user").map(df.apply): _*)

  // ---- eager escape hatches (frame.py:232-269) ----
  def collectRows(): Seq[Row] = df.collect().toSeq
  def to_dict(): Map[String, Seq[Any]] = {
    val rows = df.collect()
    df.columns.zipWithIndex.map { case (n, i) => n -> rows.map(_.get(i)).toSeq }.toMap
  }
  /** Row-slice extraction (frame.py:2579-2674 extract_as_rows). */
  def extract_rows(offset: Int, len: Int): Seq[Row] = slice(offset, len).collectRows()
  def count(): Long = df.count()
}

object TableFrame {
  /** Constructors (frame.py:126-229 from_dict/from_polars/empty). */
  def fromSeq[A <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, rows: Seq[A]): TableFrame = {
    import spark.implicits._
    fromDF(spark.createDataFrame(rows))
  }
  def fromDict(spark: SparkSession, columns: Seq[(String, Seq[Any])]): TableFrame = {
    require(columns.nonEmpty && columns.map(_._2.size).distinct.size == 1,
      "from_dict: equal-length non-empty columns required")
    val rows = columns.head._2.indices.map(i => Row.fromSeq(columns.map(_._2(i))))
    val fields = columns.map { case (n, vs) =>
      val dt = vs.find(_ != null).map {
        case _: Int => IntegerType
        case _: Long => LongType
        case _: Double => DoubleType
        case _: Boolean => BooleanType
        case _: java.sql.Timestamp => TimestampType
        case _: java.sql.Date => DateType
        case _ => StringType
      }.getOrElse(NullType)
      StructField(n, dt)
    }
    fromDF(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), StructType(fields)))
  }
  def empty(spark: SparkSession, schema: StructType): TableFrame =
    fromDF(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))

  /** Wrap an external/raw frame: validate names, stamp fresh system columns
    * (mode="raw", reference: _common.py:82-147). */
  def fromRaw(df: DataFrame, ctx: SysCtx = SysCtx.fresh()): TableFrame = {
    SystemColumns.userColumns(df).foreach(SystemColumns.validateUserName)
    TableFrame(SystemColumns.addRaw(df, ctx), Origin.Import)
  }
  /** Wrap a stored table scan: fill only missing system columns (mode="tab"). */
  def fromTable(df: DataFrame, ctx: SysCtx = SysCtx.fresh()): TableFrame =
    TableFrame(SystemColumns.addTab(df, ctx), Origin.Build)
  /** Plain wrap without system-column management (interop). */
  def fromDF(df: DataFrame): TableFrame = TableFrame(df, Origin.Transform)

  /** concat (reference: tableframe/functions/eager.py:23-117; modes
    * typing.py:23-28): vertical (exact schemas), vertical_relaxed (common
    * supertypes), diagonal (union of columns), diagonal_relaxed. */
  def concat(items: Seq[TableFrame], how: String = "vertical"): TableFrame = {
    require(items.nonEmpty, "concat of nothing")
    val dfs = items.map(_.df)
    val out = how match {
      case "vertical" =>
        val s0 = dfs.head.schema.map(f => (f.name, f.dataType))
        dfs.tail.foreach { d =>
          require(d.schema.map(f => (f.name, f.dataType)) == s0,
            s"concat(vertical): schema mismatch")
        }
        dfs.reduce(_.union(_))
      case "vertical_relaxed" =>
        val names = dfs.head.columns.toSeq
        val target = names.map { n =>
          n -> dfs.map(_.schema(n).dataType).reduce(Dtypes.superType)
        }
        dfs.map(d => d.select(target.map { case (n, t) =>
          F.col(s"`$n`").cast(t).as(n) }: _*)).reduce(_.union(_))
      case "diagonal" =>
        dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      case "diagonal_relaxed" =>
        val allCols = dfs.flatMap(_.columns).distinct
        val target = allCols.map { n =>
          n -> dfs.flatMap(d => d.columns.find(_ == n).map(_ => d.schema(n).dataType))
            .reduce(Dtypes.superType)
        }
        dfs.map { d =>
          d.select(target.map { case (n, t) =>
            (if (d.columns.contains(n)) F.col(s"`$n`").cast(t) else F.lit(null).cast(t)).as(n)
          }: _*)
        }.reduce(_.union(_))
    }
    TableFrame(SystemColumns.arrange(out), Origin.Transform)
  }
}

/** group_by().agg() surface (reference: tableframe/lazyframe/group_by.py). */
final class TableFrameGroupBy(tf: TableFrame, by: Seq[Expr]) {
  private def grouped = tf.df.groupBy(by.map(_.col): _*)

  def agg(exprs: Expr*): TableFrame =
    TableFrame(grouped.agg(exprs.head.col, exprs.tail.map(_.col): _*), tf.origin)

  // all-column shortcuts (group_by.py:159-584)
  def len(): TableFrame = TableFrame(grouped.agg(F.count(F.lit(1)).as("len")), tf.origin)
  def count(): TableFrame = TableFrame(grouped.agg(F.count(F.lit(1)).as("count")), tf.origin)
  private def perCol(f: Column => Column): TableFrame = {
    val cols = tf.columns("user").filterNot(byNames.contains)
    TableFrame(grouped.agg(f(F.col(s"`${cols.head}`")).as(cols.head),
      cols.tail.map(n => f(F.col(s"`$n`")).as(n)): _*), tf.origin)
  }
  private def byNames: Set[String] =
    by.flatMap(e => tf.df.columns.find(c => e.col == F.col(s"`$c`") || e.col.toString == c)).toSet ++
      by.map(_.col.toString.stripPrefix("`").stripSuffix("`"))
  def max(): TableFrame = perCol(F.max)
  def min(): TableFrame = perCol(F.min)
  def sum(): TableFrame = perCol(F.sum)
  def mean(): TableFrame = perCol(F.avg)
  def median(): TableFrame = perCol(F.median)
  def n_unique(): TableFrame = perCol(c => F.countDistinct(c))
  def first(): TableFrame = perCol(c => F.first(c, ignoreNulls = false))
  def last(): TableFrame = perCol(c => F.last(c, ignoreNulls = false))
}
