package graft.store

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.core.SystemColumns

/** Row-level change set between two versions of a table — the versioned
  * store's CDC surface. The reference keeps every publish as an immutable
  * version addressable by `name@HEAD~n` (version_resolver.rs:29-37); this
  * operator answers the natural follow-up "what changed between two
  * publishes" without any change capture at write time: it is derived
  * purely from the two stored snapshots, so it works retroactively over
  * any version pair (the same snapshot-differencing shape as a
  * table-format changelog scan).
  *
  * Semantics, keyed by a caller-supplied natural key:
  *   - key only in `newer`            → op = "insert"
  *   - key only in `older`            → op = "delete"
  *   - key in both, any non-key user column differing under null-safe
  *     equality                       → op = "update", with `changed_cols`
  *     naming the differing columns in schema order (csv)
  *   - key in both, all equal         → omitted
  *
  * System (`$td.*`) columns never participate: two versions ALWAYS differ
  * on their stamps, so they are neither compared nor keyable.
  *
  * Scale shape: one shuffle per side on the key (a plain sort-merge full
  * outer join); the per-row classification is a codegen'd null-safe
  * comparison chain — no window, no driver materialization, linear in
  * |older| + |newer|. At 100 TB this is the cost of co-partitioning the
  * two snapshots, which is the floor for any exact diff.
  */
object VersionDiff {

  /** Diff two version snapshots. `keys` must identify rows uniquely within
    * each side — duplicate keys would cross-multiply in the join; pass
    * `strict = true` to spend one aggregation job per side asserting
    * uniqueness loudly (recommended for untrusted inputs). Columns present
    * on only one side are treated as differing whenever the present side's
    * value is non-null. Output: keys ++ (op, changed_cols), one row per
    * changed key. */
  def diff(older: DataFrame, newer: DataFrame, keys: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val o = older.select(SystemColumns.userColumns(older).map(c => F.col(s"`$c`")): _*)
    val n = newer.select(SystemColumns.userColumns(newer).map(c => F.col(s"`$c`")): _*)
    keys.foreach { k =>
      require(o.columns.contains(k), s"key '$k' missing from older side")
      require(n.columns.contains(k), s"key '$k' missing from newer side")
    }
    if (strict) Seq(("older", o), ("newer", n)).foreach { case (side, df) =>
      val dup = df.groupBy(keys.map(c => F.col(s"`$c`")): _*)
        .count().where(F.col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"$side side has duplicate keys ${keys.mkString(",")}: ${dup.head}")
    }
    // compared columns in a stable order: older's schema order, then any
    // newer-only columns in newer's schema order
    val oCols = o.columns.filterNot(keys.contains).toSeq
    val nCols = n.columns.filterNot(keys.contains).toSeq
    val compared = oCols ++ nCols.filterNot(oCols.contains)

    val ol = o.select(
      keys.map(c => F.col(s"`$c`")) ++
        compared.map(c => (if (oCols.contains(c)) F.col(s"`$c`")
          else F.lit(null)).as(s"$$td.__o_$c")): _*)
    // newer side's keys are renamed so the join can be stated as an
    // explicit NULL-SAFE condition: a key column can be legitimately null,
    // and a plain equi-join would never match such a row against its
    // counterpart — an unchanged null-keyed row would surface as a
    // spurious delete+insert pair. `<=>` per key keeps the condition an
    // equi-join Catalyst still plans as one sort-merge join.
    val nw = n.select(
      keys.map(c => F.col(s"`$c`").as(s"$$td.__k_$c")) ++
        Seq(F.lit(true).as("$td.__nw")) ++
        compared.map(c => (if (nCols.contains(c)) F.col(s"`$c`")
          else F.lit(null)).as(s"$$td.__n_$c")): _*)
    // the older side carries its own presence marker too (key-nullness
    // cannot signal absence, for the same reason)
    val olM = ol.withColumn("$td.__ol", F.lit(true))

    val joinCond = keys.map(k =>
      F.col(s"`$k`") <=> F.col(s"`$$td.__k_$k`")).reduce(_ && _)
    val joined = olM.join(nw, joinCond, "full_outer")
      .select(
        keys.map(k => F.coalesce(F.col(s"`$k`"), F.col(s"`$$td.__k_$k`"))
          .as(k)) ++
          Seq(F.col("`$td.__ol`"), F.col("`$td.__nw`")) ++
          compared.flatMap(c =>
            Seq(F.col(s"`$$td.__o_$c`"), F.col(s"`$$td.__n_$c`"))): _*)
    val inOld = F.col("`$td.__ol`").isNotNull
    val inNew = F.col("`$td.__nw`").isNotNull
    def differs(c: String): Column =
      !(F.col(s"`$$td.__o_$c`") <=> F.col(s"`$$td.__n_$c`"))
    val changed = F.concat_ws(",",
      compared.map(c => F.when(differs(c), F.lit(c))): _*)
    joined.select(
        keys.map(c => F.col(s"`$c`")) ++ Seq(
          F.when(!inOld, F.lit("insert"))
            .when(!inNew, F.lit("delete"))
            .when(changed =!= F.lit(""), F.lit("update"))
            .as("op"),
          F.when(inOld && inNew && changed =!= F.lit(""), changed)
            .as("changed_cols")): _*)
      .where(F.col("op").isNotNull)
  }

  /** One-row roll-up of a diff: inserted/deleted/updated counts plus the
    * total — the version-to-version health line a publish pipeline logs. */
  def summary(older: DataFrame, newer: DataFrame, keys: Seq[String],
      strict: Boolean = false): DataFrame =
    diff(older, newer, keys, strict)
      .agg(
        F.count(F.when(F.col("op") === "insert", 1)).as("inserted"),
        F.count(F.when(F.col("op") === "delete", 1)).as("deleted"),
        F.count(F.when(F.col("op") === "update", 1)).as("updated"),
        F.count(F.lit(1)).as("changed"))

  /** Diff two stored versions of one table by reference — e.g.
    * `diffVersions(store, "c/orders@HEAD~1", "c/orders@HEAD", Seq("id"))`.
    * Each ref must resolve to a version (loud failure otherwise). */
  def diffVersions(store: TableStore, olderRef: String, newerRef: String,
      keys: Seq[String], strict: Boolean = false): DataFrame = {
    def scanOf(ref: String): DataFrame =
      store.scan(ref).getOrElse(
        throw new IllegalArgumentException(s"unresolvable table ref: $ref")).df
    diff(scanOf(olderRef), scanOf(newerRef), keys, strict)
  }

  /** Per-key change history across an ordered sequence of snapshots — the
    * SCD2 "unroll" of a versioned table: one output row per maximal run
    * of versions in which a key held the same values, with
    * `valid_from`/`valid_to` as 1-based version ordinals and `is_current`
    * marking runs reaching the newest version. A key absent from a
    * version ends its run; reappearing starts a new one.
    *
    * Shape: one union of the snapshots (each stamped with its ordinal),
    * ONE shuffle on the key for the lag/running-sum window pair that
    * marks change points and numbers runs, then a keyed aggregation over
    * (key, run, values) — values are constant within a run, so they ride
    * the grouping key. Linear in Σ|versions|; the window is per-key, never
    * global. */
  def history(snapshots: Seq[DataFrame], keys: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(snapshots.nonEmpty, "history needs at least one snapshot")
    require(keys.nonEmpty, "history needs at least one key column")
    val cleaned = snapshots.map(df =>
      df.select(SystemColumns.userColumns(df).map(c => F.col(s"`$c`")): _*))
    // like diff: keys must identify rows uniquely WITHIN each snapshot —
    // duplicates would interleave arbitrarily in the per-key window
    if (strict) cleaned.zipWithIndex.foreach { case (df, i) =>
      val dup = df.groupBy(keys.map(c => F.col(s"`$c`")): _*)
        .count().where(F.col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"snapshot ${i + 1} has duplicate keys ${keys.mkString(",")}: ${dup.head}")
    }
    // snapshots may EVOLVE their schema across versions (the store's
    // schema hash is change detection, not a constraint): align columns
    // by name in first-seen order, read missing columns as NULL — a
    // column appearing with a non-null value IS a change (diff's rule);
    // keys must exist in every snapshot (a row identity can't evolve away)
    keys.foreach(k => cleaned.zipWithIndex.foreach { case (df, i) =>
      require(df.columns.contains(k),
        s"key '$k' missing from snapshot ${i + 1}")
    })
    val cols = cleaned.foldLeft(Seq.empty[String])((acc, df) =>
      acc ++ df.columns.filterNot(acc.contains))
    val valCols = cols.filterNot(keys.contains)
    val u = cleaned.zipWithIndex
      .map { case (df, i) => df.withColumn("$td.__v", F.lit((i + 1).toLong)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(c => F.col(s"`$c`")): _*).orderBy(F.col("`$td.__v`"))
    val vals = F.struct(valCols.map(c => F.col(s"`$c`")): _*)
    val prevV = F.lag(F.col("`$td.__v`"), 1).over(w)
    val chg = F.when(
      prevV.isNull || (prevV =!= F.col("`$td.__v`") - 1) ||
        !(F.lag(vals, 1).over(w) <=> vals), 1L).otherwise(0L)
    val runs = u.withColumn("$td.__chg", chg)
      .withColumn("$td.__run", F.sum(F.col("`$td.__chg`")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    runs.groupBy((keys ++ valCols).map(c => F.col(s"`$c`")) :+
        F.col("`$td.__run`"): _*)
      .agg(
        F.min(F.col("`$td.__v`")).as("valid_from"),
        F.max(F.col("`$td.__v`")).as("valid_to"))
      .withColumn("is_current", F.col("valid_to") === F.lit(snapshots.size.toLong))
      .drop("$td.__run")
      .select((keys ++ valCols).map(c => F.col(s"`$c`")) ++
        Seq(F.col("valid_from"), F.col("valid_to"), F.col("is_current")): _*)
  }

  final case class SchemaChange(column: String, change: String,
      olderType: Option[String], newerType: Option[String])

  /** Schema drift between two version refs, answered from the VERSION LOG
    * alone — no parquet footer reads, no Spark job (the same
    * metadata-only path as `TableStore.schema`): one [[SchemaChange]] per
    * added / removed / retyped user column, in older-schema order with
    * additions appended. The publish-pipeline guard that runs BEFORE a
    * data diff: a retyped column usually explains every "update" the
    * row diff would report. */
  def schemaDiff(store: TableStore, olderRef: String,
      newerRef: String): Seq[SchemaChange] = {
    def schemaOf(ref: String) = store.schema(ref).getOrElse(
      throw new IllegalArgumentException(s"unresolvable table ref: $ref"))
    def userFields(ref: String) = schemaOf(ref).fields.toSeq
      .filterNot(f => SystemColumns.isSystem(f.name))
      .map(f => f.name -> f.dataType.sql)
    val o = userFields(olderRef)
    val n = userFields(newerRef)
    val om = o.toMap
    val nm = n.toMap
    val fromOld = o.flatMap { case (c, t) =>
      nm.get(c) match {
        case None => Some(SchemaChange(c, "removed", Some(t), None))
        case Some(t2) if t2 != t =>
          Some(SchemaChange(c, "retyped", Some(t), Some(t2)))
        case _ => None
      }
    }
    val added = n.collect { case (c, t) if !om.contains(c) =>
      SchemaChange(c, "added", None, Some(t)) }
    fromOld ++ added
  }

  /** [[history]] over every committed version of a stored table,
    * oldest → newest (resolved via `HEAD~n`, which every version id
    * scheme supports). */
  def historyOf(store: TableStore, coll: String, table: String,
      keys: Seq[String]): DataFrame = {
    val vs = store.versions(coll, table)
    require(vs.nonEmpty, s"no committed versions in $coll/$table")
    history(vs.indices.map { i =>
      val ref = s"$coll/$table@HEAD~${vs.size - 1 - i}"
      store.scan(ref).getOrElse(
        throw new IllegalStateException(s"unscannable version: $ref")).df
    }, keys)
  }
}
