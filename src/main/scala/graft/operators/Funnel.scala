package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Ordered conversion-funnel analysis over an event stream — how many
  * users reached step k IN ORDER (view → click → purchase), the product
  * analytics staple next to sessionization and windowed aggregation.
  *
  * Semantics: a user reaches step 1 at their EARLIEST step-1 event; step
  * i at their earliest step-i event at-or-after their step-(i−1) reach
  * time (ties allowed — an event at exactly the prior reach time counts,
  * matching the inclusive convention of time-window joins here). The
  * earliest-qualifying-time choice is what makes the result well defined
  * and maximal: any other witness sequence can be shifted earlier
  * step-by-step.
  *
  * Shape: one filtered min-aggregation per step keyed on the user (k
  * keyed shuffles for a k-step funnel, each over only that step's
  * events), joined user-to-user — no windows, no ordering of whole event
  * histories, nothing quadratic. Output: (step, event_type, users),
  * one row per step. */
object Funnel {
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached: DataFrame = null // (userCol, $td.__t) reach times of the previous step
    val counts = steps.zipWithIndex.map { case (s, i) =>
      val ev = df.where(F.col(typeCol) === s)
        .select(F.col(userCol), F.col(tsCol))
      val matched =
        if (i == 0) ev.groupBy(F.col(userCol)).agg(F.min(F.col(tsCol)).as("$td.__t"))
        else ev
          .join(reached.withColumnRenamed("$td.__t", "$td.__prev"), Seq(userCol))
          .where(F.col(tsCol) >= F.col("`$td.__prev`"))
          .groupBy(F.col(userCol)).agg(F.min(F.col(tsCol)).as("$td.__t"))
      reached = matched
      matched.agg(F.count(F.lit(1)).as("users"))
        .select(F.lit(i + 1).as("step"), F.lit(s).as("event_type"),
          F.col("users"))
    }
    counts.reduce(_ unionByName _)
  }

  /** RFM segmentation (recency / frequency / monetary) — the classic
    * user-value read of an event stream. Per user: seconds since their
    * last event relative to the corpus' latest event (broadcast
    * scalar), event count, and the exact-DECIMAL value total; each
    * dimension then scored 1..5 by equi-depth quintile (5 = most
    * recent / most frequent / highest spend) via ONE composite ordinal
    * rank per dimension ([[ScalableRank]] — no single-reducer sort),
    * bucket = floor((rk−1)·5/n)+1 capped at 5, ties pinned by user id
    * so the segmentation is deterministic; an all-NULL-value user's
    * monetary total is 0.0 (not NULL — NULL ordering differs across
    * engines). Output: (userCol, recency_sec,
    * frequency, monetary, r, f, m, segment=r·100+f·10+m) ascending. */
  def rfm(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val sec = F.unix_timestamp(F.col(tsCol))
    val clean = df.where(F.col(userCol).isNotNull && F.col(tsCol).isNotNull)
    val perUser = clean
      .groupBy(F.col(userCol))
      .agg(F.max(sec).as("td_last"),
        F.count(F.lit(1)).as("frequency"),
        F.coalesce(
          F.sum(F.col(valueCol).cast("decimal(18,4)")).cast("double"),
          F.lit(0.0d)).as("monetary"))
    val nowRow = clean.agg(F.max(sec).as("td_now"))
    val base = perUser.crossJoin(F.broadcast(nowRow))
      .select(F.col(userCol),
        (F.col("td_now") - F.col("td_last")).as("recency_sec"),
        F.col("frequency"), F.col("monetary"))
    val n = base.count()
    // score 1..5: rank users by "goodness" ascending (stale→recent,
    // rare→frequent, low→high spend), bucket the ordinal rank
    def score(c: String, descGoodness: Boolean, as: String,
        in: DataFrame): DataFrame = {
      val ranked = graft.operators.ScalableRank.withRank(
        in, c, "td_rk", method = "ordinal", descending = descGoodness,
        tiebreakers = Seq(userCol))
      ranked.withColumn(as,
        F.least(F.lit(5L), F.floor((F.col("td_rk") - 1L) * 5L / F.lit(n)) + 1L))
        .drop("td_rk")
    }
    val scored = score("monetary", descGoodness = false, "m",
      score("frequency", descGoodness = false, "f",
        score("recency_sec", descGoodness = true, "r", base)))
    scored.select(F.col(userCol), F.col("recency_sec"), F.col("frequency"),
        F.col("monetary"), F.col("r"), F.col("f"), F.col("m"),
        (F.col("r") * 100L + F.col("f") * 10L + F.col("m")).as("segment"))
      .orderBy(F.col(userCol).asc)
  }

  /** Gap-based sessionization, batch face (the streaming face is
    * [[graft.streaming.Streams]]' stateful sessionizer): a new session
    * starts when a user's inter-event gap exceeds `gapSec`. One keyed
    * window pass (lag + running sum of session starts — users sort in
    * parallel) and one keyed aggregation; `tiebreaker` pins
    * same-timestamp order. Output per session: (userCol, session_idx,
    * n_events, start_sec, end_sec, duration_sec) ascending. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gapSec: Long, tiebreaker: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(userCol))
      .orderBy(F.col("td_sec").asc, F.col(tiebreaker).asc)
    val wRun = w.rowsBetween(Long.MinValue, 0)
    df.where(F.col(userCol).isNotNull && F.col(tsCol).isNotNull)
      .select(F.col(userCol), F.col(tiebreaker),
        F.unix_timestamp(F.col(tsCol)).as("td_sec"))
      .withColumn("td_new",
        F.when(F.col("td_sec") - F.lag(F.col("td_sec"), 1).over(w)
          > gapSec, 1L).otherwise(0L))
      .withColumn("session_idx", F.sum(F.col("td_new")).over(wRun))
      .groupBy(F.col(userCol), F.col("session_idx"))
      .agg(F.count(F.lit(1)).as("n_events"),
        F.min(F.col("td_sec")).as("start_sec"),
        F.max(F.col("td_sec")).as("end_sec"))
      .withColumn("duration_sec", F.col("end_sec") - F.col("start_sec"))
      .orderBy(F.col(userCol).asc, F.col("session_idx").asc)
  }

  /** Association rules over per-basket item sets (market-basket
    * analysis, Agrawal & Srikant 1994): for every ordered item pair
    * that co-occurs in at least `minBoth` baskets, the support,
    * confidence, and lift — "users who view also purchase?". Baskets
    * are the DISTINCT (basket, item) pairs; the pair search self-joins
    * on the basket key with a<b orientation, so candidates are bounded
    * by per-basket item-set sizes (small by the categorical contract),
    * never the corpus. Exact integer counts; each ratio one stated
    * division, lift = (n_both·N)/(n_ant·n_cons) as
    * ((cab·N) / (ca·cb)) doubles. Both rule directions are emitted.
    * Output: (antecedent, consequent, n_both, n_ant, n_cons, support,
    * confidence, lift) ascending by (antecedent, consequent). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minBoth: Long = 1L): DataFrame = {
    val ut = df
      .where(F.col(basketCol).isNotNull && F.col(itemCol).isNotNull)
      .select(F.col(basketCol).as("td_b"),
        F.col(itemCol).cast("string").as("td_i"))
      .distinct()
    val n = ut.select(F.col("td_b")).distinct().count()
    require(n > 0, "associationRules over an empty relation")
    val cnt = ut.groupBy(F.col("td_i")).agg(F.count(F.lit(1)).as("td_c"))
    val pairs = ut.as("x").join(ut.as("y"), "td_b")
      .where(F.col("x.td_i") < F.col("y.td_i"))
      .groupBy(F.col("x.td_i").as("td_a"), F.col("y.td_i").as("td_bb"))
      .agg(F.count(F.lit(1)).as("td_cab"))
      .where(F.col("td_cab") >= minBoth)
    def rules(antecedent: Column, consequent: Column) = pairs
      .select(antecedent.as("antecedent"), consequent.as("consequent"),
        F.col("td_cab"))
      .join(cnt.select(F.col("td_i").as("antecedent"),
        F.col("td_c").as("n_ant")), "antecedent")
      .join(cnt.select(F.col("td_i").as("consequent"),
        F.col("td_c").as("n_cons")), "consequent")
    val nD = F.lit(n.toDouble)
    rules(F.col("td_a"), F.col("td_bb"))
      .unionByName(rules(F.col("td_bb"), F.col("td_a")))
      .select(F.col("antecedent"), F.col("consequent"),
        F.col("td_cab").as("n_both"), F.col("n_ant"), F.col("n_cons"),
        (F.col("td_cab").cast("double") / nD).as("support"),
        (F.col("td_cab").cast("double") / F.col("n_ant").cast("double"))
          .as("confidence"),
        ((F.col("td_cab").cast("double") * nD) /
          (F.col("n_ant").cast("double") * F.col("n_cons").cast("double")))
          .as("lift"))
      .orderBy(F.col("antecedent").asc, F.col("consequent").asc)
  }

  /** Behavioral transition matrix: counts of consecutive event-type
    * pairs per user in time order — the Markov-chain view of an event
    * stream (which actions follow which). `tiebreaker` pins the order of
    * same-timestamp events so the matrix is deterministic. One keyed
    * window (per-user lag — users sort in parallel, never globally) and
    * one keyed count. Output: (from_type, to_type, n). */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tiebreaker: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(userCol))
      .orderBy(F.col(tsCol).asc, F.col(tiebreaker).asc)
    df.select(F.col(userCol), F.col(typeCol).as("to_type"),
        F.lag(F.col(typeCol), 1).over(w).as("from_type"))
      .where(F.col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Stationary distribution of the per-user event-type Markov chain —
    * where does user behavior SETTLE (the long-run occupancy of each
    * event type), the fixed point π = πP of [[transitionMatrix]]'s
    * row-stochastic normalization. The corpus reduces to the k²-cell
    * transition relation in one pass (k = |event types|, BOUNDED — the
    * categorical contract of [[graft.pipeline.Report.mutualInformation]]),
    * so the power iteration runs on driver METADATA: π0 uniform 1/k,
    * π_j ← Σ_i π_i·p_ij folded over states in ASCENDING order (adding a
    * zero cell is an IEEE no-op, so the sparse SQL replay states the
    * identical doubles); each share p_ij = n_ij/Σn_i is one stated
    * division. States with no outgoing transitions absorb (p_ii = 1).
    * Output: (state, prob) ascending. */
  def markovStationary(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tiebreaker: String, iters: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    // cast the (bounded k²) cells to string on collect — transitionMatrix
    // preserves typeCol's own type, so a non-string column would
    // otherwise ClassCastException here
    val cells = transitionMatrix(df, userCol, tsCol, typeCol, tiebreaker)
      .select(F.col("from_type").cast("string"),
        F.col("to_type").cast("string"), F.col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.nonEmpty, "markovStationary: no transitions observed")
    val states = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val rowCnt = new Array[Long](k)
    cells.foreach { case (f, _, n) => rowCnt(idx(f)) += n }
    val p = Array.ofDim[Double](k, k)
    cells.foreach { case (f, t, n) =>
      p(idx(f))(idx(t)) = n.toDouble / rowCnt(idx(f)).toDouble
    }
    for (i <- 0 until k) if (rowCnt(i) == 0L) p(i)(i) = 1.0d
    var pi = Array.fill(k)(1.0d / k.toDouble)
    for (_ <- 0 until iters) {
      pi = Array.tabulate(k) { j =>
        (0 until k).foldLeft(0.0d)((acc, i) => acc + pi(i) * p(i)(j))
      }
    }
    states.zip(pi).toSeq.toDF("state", "prob")
      .orderBy(F.col("state").asc)
  }

  /** Weekly cohort retention matrix: users grouped by their first-event
    * week (the cohort), counted in every subsequent week they were
    * active — the (cohort, week-offset) grid behind every retention
    * curve. Weeks are `date_trunc("week", …)` (Monday-aligned in both
    * Spark and the oracle engine), the offset is exact (both ends are
    * week-truncated, so the day difference is always a multiple of 7),
    * and cohorts are reported as epoch seconds (timezone-proof).
    *
    * Shape: one keyed min-aggregation for first events, one distinct
    * over (user, week), one user-keyed join, one keyed count — all
    * linear, no windows. Output: (cohort_epoch, week_offset, users). */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = df.groupBy(F.col(userCol))
      .agg(F.date_trunc("week", F.min(F.col(tsCol))).as("$td.__cw"))
    val active = df
      .select(F.col(userCol), F.date_trunc("week", F.col(tsCol)).as("$td.__aw"))
      .distinct()
    first.join(active, Seq(userCol))
      .where(F.col("`$td.__aw`") >= F.col("`$td.__cw`"))
      .select(
        F.unix_timestamp(F.col("`$td.__cw`")).as("cohort_epoch"),
        (F.datediff(F.col("`$td.__aw`"), F.col("`$td.__cw`")) / 7)
          .cast("int").as("week_offset"))
      .groupBy("cohort_epoch", "week_offset")
      .agg(F.count(F.lit(1)).as("users"))
  }
}
