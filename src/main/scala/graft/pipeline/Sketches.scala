package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Deterministic mergeable sketches beyond the distribution family in
  * [[Report]]: bottom-k (KMV) distinct sketches that double as mergeable
  * uniform samples and set-similarity estimators, count-min frequency
  * sketches, and priority-based weighted samples.
  *
  * Shared design rule with [[Report.quantileSketch]]: every sketch here is
  * DETERMINISTIC — hashes are md5 of the key string, so the same rows give
  * the same sketch under any partitioning, merge(a, b) equals the sketch
  * of a ∪ b EXACTLY, and every estimate is oracle-checkable by an external
  * engine stating the identical arithmetic. The uniform-fraction
  * convention is the repo-wide md5-prefix one (see e.g. the JL projection
  * and bucketed splits): the first 15 hex chars of md5, read as an
  * integer, over 16^15 — both a Spark `conv` and a DuckDB
  * `('0x' || substr(..))::BIGINT` state the same value, and 16^15 = 2^60
  * keeps the integer inside BIGINT range.
  */
object Sketches {

  /** 16^15 = 2^60 — denominator of the md5-prefix uniform fraction;
    * exactly representable as a double. */
  val HexDenom: Double = 1152921504606846976.0d

  /** First-15-hex-chars md5 prefix of `s` as a long in [0, 2^60). */
  def hexPrefix(s: Column): Column =
    F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")

  /** The md5-prefix uniform fraction u(s) ∈ [0, 1): hexPrefix / 16^15,
    * stated with this exact parenthesization on every engine. */
  def uniformFrac(s: Column): Column =
    hexPrefix(s).cast("double") / F.lit(HexDenom)

  // ---------------------------------------------------------------------
  // Bottom-k (KMV) sketch
  // ---------------------------------------------------------------------

  /** Bottom-k (KMV) distinct sketch: the `k` lexicographically smallest
    * DISTINCT md5 hashes of `keyCol`, kept WITH their keys — so one
    * sketch answers three dataset-card questions at once:
    *
    *   - distinct count: exact when fewer than k hashes exist, else the
    *     classic KMV estimator (k−1)/u(h_k) ([[kmvEstimate]]; Bar-Yossef
    *     et al. 2002, "Counting distinct elements in a data stream");
    *   - a mergeable UNIFORM SAMPLE of distinct keys ([[kmvSample]]):
    *     md5 order is independent of the data, so the kept keys are a
    *     uniform without-replacement draw that stays uniform under merge;
    *   - set similarity between two corpora ([[kmvJaccard]]) from the
    *     sketches alone.
    *
    * Deterministic: merge(a, b) == sketch(a ∪ b) EXACTLY (the k smallest
    * of a union are a function of the union, not the split). Shape: one
    * distinct shuffle on (group, key), then per-group top-k — a keyed
    * window over the distinct set when grouped, TakeOrderedAndProject
    * when global; the assembled array is ≤ k entries per group, never
    * the corpus. Output: (group?, entries: array<struct<h, key>> sorted
    * ascending by h, k). NULL keys carry no hash (same rule as
    * [[Report.histogram]]). */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int,
      groupCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyCols = groupCol.toSeq.map(F.col)
    val hashed = df
      .select(keyCols :+ F.col(keyCol).cast("string").as("td_key"): _*)
      .where(F.col("td_key").isNotNull)
      .withColumn("td_h", F.md5(F.col("td_key")))
      .distinct()
    val kept = groupCol match {
      case Some(g) =>
        val w = Window.partitionBy(F.col(g)).orderBy(F.col("td_h").asc)
        hashed.withColumn("td_rn", F.row_number().over(w))
          .where(F.col("td_rn") <= k)
      case None =>
        hashed.orderBy(F.col("td_h").asc).limit(k)
    }
    kept
      .groupBy(keyCols: _*)
      .agg(F.sort_array(F.collect_list(
        F.struct(F.col("td_h").as("h"), F.col("td_key").as("key"))))
        .as("entries"))
      .withColumn("k", F.lit(k))
  }

  /** Union previously-built KMV sketches into one: the k smallest
    * distinct hashes of the union of entries — no data rescan, and
    * (determinism) bit-equal to [[kmvSketch]] over the union of the
    * original corpora. All inputs must carry the same `k` stamp; the
    * guard rides the merge aggregation (raise_error at action time, no
    * extra driver job), mirroring [[Report.mergeQuantileSketches]]. */
  def mergeKmvSketches(sketches: DataFrame): DataFrame =
    mergeKmvImpl(sketches, Nil)

  /** Per-group [[mergeKmvSketches]]: each group's sketches union to that
    * group's bottom-k; different groups may carry different k stamps. */
  def mergeKmvSketchesByGroup(sketches: DataFrame,
      groupCol: String): DataFrame =
    mergeKmvImpl(sketches, Seq(groupCol))

  private def mergeKmvImpl(sketches: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(sketches.columns.contains("k"),
      "KMV sketches must carry their k stamp — (re)build with kmvSketch")
    val keyCols = keys.map(F.col)
    val exploded = sketches
      .select(keyCols ++ Seq(F.col("k"),
        F.explode(F.col("entries")).as("e")): _*)
      .select(keyCols ++ Seq(F.col("k"),
        F.col("e.h").as("td_h"), F.col("e.key").as("td_key")): _*)
      .distinct()
    val w = Window.partitionBy(keyCols: _*).orderBy(F.col("td_h").asc)
    val kGuard = F.when(F.countDistinct(F.col("k")) === 1,
        F.first(F.col("k")))
      .otherwise(F.raise_error(F.lit(
        "cannot merge KMV sketches with different k stamps")))
    exploded.withColumn("td_rn", F.row_number().over(w))
      // rn bound uses the row's own k; the merge-wide identity guard
      // fires in the aggregate below if stamps disagree
      .where(F.col("td_rn") <= F.col("k"))
      .groupBy(keyCols: _*)
      .agg(F.sort_array(F.collect_list(
          F.struct(F.col("td_h").as("h"), F.col("td_key").as("key"))))
          .as("entries"),
        kGuard.as("k"))
      .select(keyCols ++ Seq(F.col("entries"), F.col("k")): _*)
  }

  /** Distinct-count answer from a KMV sketch: exact `n_kept` when the
    * corpus had fewer than k distinct keys, else (k−1)/u(h_k) with the
    * md5-prefix uniform fraction — every term stated so an external
    * engine reproduces the double bit-for-bit. Output:
    * (group?, n_kept, estimate). */
  def kmvEstimate(sketch: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val nKept = F.size(F.col("entries")).cast("long")
    val kth = F.element_at(F.col("entries"), F.col("k")).getField("h")
    val est = F.when(nKept < F.col("k").cast("long"), nKept.cast("double"))
      .otherwise(
        (F.col("k").cast("double") - 1.0d) /
          (F.conv(F.substring(kth, 1, 15), 16, 10).cast("long")
            .cast("double") / F.lit(HexDenom)))
    sketch.select(keyCols.map(F.col) ++ Seq(
      nKept.as("n_kept"), est.as("estimate")): _*)
  }

  /** The sketch's kept keys as rows — the mergeable uniform sample.
    * Output: (group?, h, key), one row per kept entry. */
  def kmvSample(sketch: DataFrame, keyCols: Seq[String] = Nil): DataFrame =
    sketch
      .select(keyCols.map(F.col) :+ F.explode(F.col("entries")).as("e"): _*)
      .select(keyCols.map(F.col) ++ Seq(
        F.col("e.h").as("h"), F.col("e.key").as("key")): _*)

  /** KMV set-similarity between two sketched corpora: merge the two
    * hash sets, keep the union's bottom-k M, and estimate
    * Jaccard ≈ |{h ∈ M seen in BOTH}| / |M| (Beyer et al. 2007, "On
    * synopses for distinct-value estimation under multiset operations").
    * Deterministic given the two sketches, so the estimator itself — not
    * just its expectation — is oracle-checkable. Both sketches must
    * carry the same k. Output: one (n_kept, n_common, jaccard) row. */
  def kmvJaccard(a: DataFrame, b: DataFrame): DataFrame =
    kmvJaccardImpl(a, b, Nil)

  /** Per-group [[kmvJaccard]]: groups present in only one side estimate
    * jaccard 0 (nothing in common), keeping the per-slice drift table
    * total. Output: (group, n_kept, n_common, jaccard). */
  def kmvJaccardByGroup(a: DataFrame, b: DataFrame,
      groupCol: String): DataFrame =
    kmvJaccardImpl(a, b, Seq(groupCol))

  private def kmvJaccardImpl(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(F.col)
    def side(df: DataFrame, mark: String) = df
      .select(keyCols ++ Seq(F.col("k"),
        F.explode(F.col("entries")).as("e")): _*)
      .select(keyCols ++ Seq(F.col("k"), F.col("e.h").as("td_h"),
        F.lit(mark).as("td_side")): _*)
    val both = side(a, "a").unionByName(side(b, "b"))
    val perHash = both
      .groupBy(keyCols :+ F.col("td_h"): _*)
      .agg(F.max(F.when(F.col("td_side") === "a", 1).otherwise(0))
          .as("in_a"),
        F.max(F.when(F.col("td_side") === "b", 1).otherwise(0)).as("in_b"),
        F.when(F.countDistinct(F.col("k")) === 1, F.first(F.col("k")))
          .otherwise(F.raise_error(F.lit(
            "cannot compare KMV sketches with different k stamps")))
          .as("k"))
    val w = Window.partitionBy(keyCols: _*).orderBy(F.col("td_h").asc)
    perHash.withColumn("td_rn", F.row_number().over(w))
      .where(F.col("td_rn") <= F.col("k"))
      .groupBy(keyCols: _*)
      .agg(F.count(F.lit(1)).as("n_kept"),
        F.sum(F.col("in_a") * F.col("in_b")).as("n_common"))
      .withColumn("jaccard",
        F.col("n_common").cast("double") / F.col("n_kept").cast("double"))
      .select(keyCols ++ Seq(F.col("n_kept"), F.col("n_common"),
        F.col("jaccard")): _*)
  }

  // ---------------------------------------------------------------------
  // Count-min frequency sketch
  // ---------------------------------------------------------------------

  /** Deterministic count-min sketch (Cormode & Muthukrishnan 2005): a
    * depth × width grid of counters; row r hashes `key` to bucket
    * md5(r ":" key)-prefix mod width, and a point query reads the MIN
    * over rows — an overestimate-only frequency answer in O(depth·width)
    * space regardless of key cardinality. Persisted as `depth` rows of
    * (r, counts: array<long>[width], depth, width, n) — plain parquet,
    * merged by ELEMENTWISE addition ([[mergeCmsSketches]]) with zero
    * rescan, and (integer algebra) merge == whole-corpus bit-exact.
    *
    * The md5 row-salted bucket makes the sketch deterministic AND gives
    * the pairwise-independence-flavored spread the error bound wants;
    * an external engine states the identical bucket, so even the
    * collision pattern is oracle-checkable. Shape: one explode to
    * depth·n (collapsed map-side by partial aggregation to ≤ depth·width
    * per partition), one keyed agg, one dense-array assembly per row —
    * the [[Report.quantileSketch]] scatter pattern. NULL keys carry no
    * counter. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape ($depth x $width)")
    val key = F.col(keyCol).cast("string")
    val rows = df.where(key.isNotNull)
      .select(key.as("td_key"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).as("td_r"))
      .select(F.col("td_r"), cmsBucket(F.col("td_r"), F.col("td_key"), width)
        .as("td_b"))
      .groupBy(F.col("td_r"), F.col("td_b"))
      .agg(F.count(F.lit(1)).as("td_n"))
    val m = F.map_from_entries(F.collect_list(
      F.struct(F.col("td_b"), F.col("td_n"))))
    rows.groupBy(F.col("td_r")).agg(m.as("td_m"))
      .select(F.col("td_r").as("r"),
        F.transform(F.sequence(F.lit(0L), F.lit((width - 1).toLong)),
          i => F.coalesce(F.element_at(F.col("td_m"), i), F.lit(0L)))
          .as("counts"))
      .withColumn("depth", F.lit(depth))
      .withColumn("width", F.lit(width))
      .withColumn("n", F.aggregate(F.col("counts"), F.lit(0L), _ + _))
  }

  /** The CMS bucket of `key` in row `r`: md5-prefix of "r:key" (first 8
    * hex chars as a long) mod width — the repo's portable bucket. */
  def cmsBucket(r: Column, key: Column, width: Int): Column =
    F.conv(F.substring(
        F.md5(F.concat(r.cast("string"), F.lit(":"), key)), 1, 8),
      16, 10).cast("long") % width

  /** Union CMS sketches by elementwise addition per row r — zero data
    * rescan; all inputs must share one (depth, width) stamp (the guard
    * rides the aggregation, as in [[Report.mergeQuantileSketches]]).
    * Output: the merged depth-row sketch. */
  def mergeCmsSketches(sketches: DataFrame): DataFrame = {
    val stampCols = Seq("depth", "width")
    require(stampCols.forall(sketches.columns.contains) &&
        sketches.columns.contains("r"),
      "CMS sketches must carry (r, depth, width) — (re)build with cmsSketch")
    val exploded = sketches.select(F.col("r"), F.col("depth"), F.col("width"),
      F.posexplode(F.col("counts")).as(Seq("td_pos", "td_c")))
    val byPos = exploded.groupBy(F.col("r"), F.col("td_pos")).agg(
      F.sum(F.col("td_c")).as("td_c"),
      F.countDistinct(F.struct(F.col("depth"), F.col("width"))).as("td_g"),
      F.first(F.col("depth")).as("depth"), F.first(F.col("width")).as("width"))
    val m = F.map_from_entries(F.collect_list(
      F.struct(F.col("td_pos"), F.col("td_c"))))
    byPos.groupBy(F.col("r")).agg(
        m.as("td_m"), F.max(F.col("td_g")).as("td_g"),
        F.first(F.col("depth")).as("depth"),
        F.first(F.col("width")).as("width"))
      .select(F.col("r"),
        F.when(F.col("td_g") === 1,
            F.transform(F.sequence(F.lit(0), F.col("width") - 1),
              i => F.coalesce(F.element_at(F.col("td_m"), i), F.lit(0L))))
          .otherwise(F.raise_error(F.lit(
            "cannot merge count-min sketches with different " +
              "(depth, width) stamps")))
          .as("counts"),
        F.col("depth"), F.col("width"))
      .withColumn("n", F.aggregate(F.col("counts"), F.lit(0L), _ + _))
  }

  /** Assemble dense CMS sketch rows from SPARSE (r, b, n) cells — the
    * pivot for [[graft.streaming.Streams.windowedCms]]'s streamed
    * windows (one sketch per `groupCols` value, e.g. per hour), the
    * frequency-family sibling of [[Report.binsToSketch]]. Cells outside
    * the declared grid raise loudly; absent cells are zero. Output:
    * groupCols ++ (r, counts, depth, width, n) — mergeable with batch
    * history via [[mergeCmsSketches]]. */
  def cellsToCms(df: DataFrame, depth: Int, width: Int,
      rCol: String = "r", bCol: String = "b", nCol: String = "n",
      groupCols: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape ($depth x $width)")
    val keys = groupCols.map(F.col)
    val checkedR = F.when(
        F.col(rCol) >= 0 && F.col(rCol) < depth, F.col(rCol).cast("int"))
      .otherwise(F.raise_error(F.concat(
        F.lit(s"CMS row out of range [0, ${depth - 1}]: "),
        F.col(rCol).cast("string"))))
    val checkedB = F.when(
        F.col(bCol) >= 0 && F.col(bCol) < width, F.col(bCol).cast("long"))
      .otherwise(F.raise_error(F.concat(
        F.lit(s"CMS bucket out of range [0, ${width - 1}]: "),
        F.col(bCol).cast("string"))))
    val m = F.map_from_entries(F.collect_list(
      F.struct(checkedB.as("td_b"), F.col(nCol).cast("long").as("td_n"))))
    df.groupBy(keys :+ checkedR.as("r"): _*)
      .agg(m.as("td_m"))
      .select(keys ++ Seq(F.col("r"),
        F.transform(F.sequence(F.lit(0L), F.lit((width - 1).toLong)),
          i => F.coalesce(F.element_at(F.col("td_m"), i), F.lit(0L)))
          .as("counts")): _*)
      .withColumn("depth", F.lit(depth))
      .withColumn("width", F.lit(width))
      .withColumn("n", F.aggregate(F.col("counts"), F.lit(0L), _ + _))
  }

  /** Point-query frequencies from a CMS: for each probe key, min over
    * the sketch's depth rows of the counter at that row's bucket. The
    * sketch is depth rows — broadcast onto the probes, so the probe
    * relation can be arbitrarily large (a full candidate vocabulary)
    * with no shuffle of the sketch. Output: probes ++ (estimate). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      keyCol: String): DataFrame = {
    val rows = sketch.select(F.col("r").as("td_r"),
      F.col("counts").as("td_counts"), F.col("width").as("td_w"))
    probes
      .join(F.broadcast(rows))
      .withColumn("td_b",
        F.conv(F.substring(
            F.md5(F.concat(F.col("td_r").cast("string"), F.lit(":"),
              F.col(keyCol).cast("string"))), 1, 8),
          16, 10).cast("long") % F.col("td_w"))
      .withColumn("td_c",
        F.element_at(F.col("td_counts"), (F.col("td_b") + 1L).cast("int")))
      .groupBy(probes.columns.map(F.col).toSeq: _*)
      .agg(F.min(F.col("td_c")).as("estimate"))
  }

  // ---------------------------------------------------------------------
  // Deterministic weighted sample (priority / A-ES)
  // ---------------------------------------------------------------------

  /** Weighted without-replacement sample of k rows per group
    * (Efraimidis & Spirakis 2006 A-ES, in log form): each row draws
    * u = md5-prefix uniform from `saltPrefix:key`, gets priority
    * ln(u)/w (monotone with the classic u^(1/w)), and the k LARGEST
    * priorities win — deterministic, so re-runs and engines agree on
    * the exact sample, and inclusion probability tracks weight share.
    * ln is the libm kernel ([[graft.expressions.MathKernels.ln]]) for
    * cross-engine parity. Rows with NULL key or non-positive weight are
    * excluded. Shape: a keyed window over (group, priority) when
    * grouped; whole-frame sampling is top-k sort+limit
    * (TakeOrderedAndProject — per-partition heads merged, no global
    * sort). Output: input columns + (priority). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, groupCol: Option[String] = None,
      saltPrefix: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = F.col(weightCol).cast("double")
    val u = uniformFrac(F.concat(F.lit(saltPrefix + ":"),
      F.col(keyCol).cast("string")))
    val pri = graft.expressions.MathKernels.ln(u) / w
    val withPri = df.where(F.col(keyCol).isNotNull && w > 0.0d)
      .withColumn("priority", pri)
    groupCol match {
      case Some(g) =>
        val win = Window.partitionBy(F.col(g))
          .orderBy(F.col("priority").desc, F.col(keyCol).cast("string").asc)
        withPri.withColumn("td_rn", F.row_number().over(win))
          .where(F.col("td_rn") <= k)
          .drop("td_rn")
      case None =>
        withPri.orderBy(F.col("priority").desc,
          F.col(keyCol).cast("string").asc).limit(k)
    }
  }
}
