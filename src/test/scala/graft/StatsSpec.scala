package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Report, Survival, Trend}

/** Unit specs for the round-17 statistics layer: ANOVA/Brown–Forsythe,
  * BH-FDR, Kaplan–Meier + log-rank, and the trend family — each checked
  * against driver-side exact arithmetic on small fixtures (the oracle
  * gates cover the corpus scale; these pin the algebra and the
  * degenerate-input honesty rules). */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("anovaF matches the textbook decomposition on a known fixture") {
    import spark.implicits._
    // groups: A = (1,2,3), B = (2,4,6), C = (5,5,8)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0),
      ("B", 4.0), ("B", 6.0), ("C", 5.0), ("C", 5.0), ("C", 8.0))
      .toDF("g", "x")
    val r = Report.anovaF(df, "g", "x").head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    val (ssb, ssw, f) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // driver truth: means 2, 4, 6; grand 4 → SSB = 3·4 + 0 + 3·4 = 24
    // SSW = 2 + 8 + 6 = 16; F = (24/2)/(16/6) = 4.5
    assert(math.abs(ssb - 24.0) < 1e-9, s"ssb=$ssb")
    assert(math.abs(ssw - 16.0) < 1e-9, s"ssw=$ssw")
    assert(math.abs(f - 4.5) < 1e-9, s"f=$f")
  }

  test("anovaF degenerate inputs answer NULL f honestly") {
    import spark.implicits._
    // one group → k < 2
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "x")
    assert(Report.anovaF(one, "g", "x").head().isNullAt(5))
    // two singleton groups → N = k
    val sing = Seq(("A", 1.0), ("B", 2.0)).toDF("g", "x")
    assert(Report.anovaF(sing, "g", "x").head().isNullAt(5))
    // all values identical → SSW = 0
    val flat = Seq(("A", 3.0), ("A", 3.0), ("B", 3.0), ("B", 3.0))
      .toDF("g", "x")
    assert(Report.anovaF(flat, "g", "x").head().isNullAt(5))
  }

  test("brownForsythe is location-invariant and flags spread changes") {
    import spark.implicits._
    val base = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0),
      ("B", 5.0), ("B", 6.0)).toDF("g", "x")
    // shifting B by +100 leaves |x − median_B| unchanged → identical F
    val shifted = base.select(F.col("g"),
      F.when(F.col("g") === "B", F.col("x") + 100.0d)
        .otherwise(F.col("x")).as("x"))
    val f0 = Report.brownForsythe(base, "g", "x").head().getDouble(5)
    val f1 = Report.brownForsythe(shifted, "g", "x").head().getDouble(5)
    assert(f0 == f1, s"$f0 vs $f1")
    // widening B's spread 10× moves the statistic up
    val wide = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", -5.0),
      ("B", 5.0), ("B", 25.0)).toDF("g", "x")
    val f2 = Report.brownForsythe(wide, "g", "x").head().getDouble(5)
    assert(f2 > f0, s"wide=$f2 base=$f0")
  }

  test("bhFdr replays the Benjamini–Hochberg 1995 worked example") {
    import spark.implicits._
    // the 15 ordered p-values from the original paper, α = 0.05:
    // the step-up rule rejects exactly the smallest four
    val ps = Seq(0.0001, 0.0004, 0.0019, 0.0095, 0.0201, 0.0278,
      0.0298, 0.0344, 0.0459, 0.3240, 0.4262, 0.5719, 0.6528, 0.7590,
      1.0000)
    val df = ps.zipWithIndex
      .map { case (p, i) => (f"t$i%02d", p) }.toDF("id", "p")
    val rows = Report.bhFdr(df, "id", "p", alpha = 0.05d)
      .collect()
    assert(rows.length == 15)
    assert(rows.count(_.getBoolean(4)) == 4, rows.mkString("\n"))
    // rejections are a prefix of the p-ordering (step-up monotonicity)
    assert(rows.sortBy(_.getLong(2)).map(_.getBoolean(4)).toSeq ==
      (Seq.fill(4)(true) ++ Seq.fill(11)(false)))
    // adjusted p is monotone nondecreasing in rank and clipped at 1
    val adj = rows.sortBy(_.getLong(2)).map(_.getDouble(3)).toSeq
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b })
    assert(adj.forall(p => p > 0.0 && p <= 1.0))
    // spot value: p_adj(rank 1) = min_j m·p_j/j = 15·0.0001/1 = 0.0015
    assert(math.abs(adj.head - 0.0015) < 1e-12)
  }

  test("kaplanMeier replays a textbook censored fixture exactly") {
    import spark.implicits._
    // durations (†=event, ∘=censored): 1†, 2∘, 3†, 3†, 4∘, 5†
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (4L, 0), (5L, 1))
      .toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", "ev").collect()
    val byT = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // t=1: n=6 d=1 → S = 5/6
    assert(byT(1L) == ((6L, 1L, 0L, 5.0 / 6.0)))
    // t=2: censored only, S unchanged
    assert(byT(2L) == ((5L, 0L, 1L, 5.0 / 6.0 * 1.0)))
    // t=3: n=4 d=2 → S = 5/6 · 2/4
    assert(byT(3L)._4 == 5.0 / 6.0 * 1.0 * (2.0 / 4.0))
    // t=5: n=1 d=1 → S = 0
    assert(byT(5L)._4 == 0.0)
    // at-risk counts never increase
    val nr = rows.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(nr.zip(nr.tail).forall { case (a, b) => a > b })
  }

  test("logRank matches a driver-side replay and NULLs on ≠2 groups") {
    import spark.implicits._
    val data = Seq(("A", 2L, 1), ("A", 3L, 0), ("A", 5L, 1), ("A", 7L, 1),
      ("B", 1L, 1), ("B", 2L, 1), ("B", 4L, 1), ("B", 6L, 0))
    val df = data.toDF("g", "dur", "ev")
    val r = Survival.logRank(df, "dur", "ev", "g").head()
    // driver replay
    val grid = data.groupBy(_._2).map { case (t, rs) =>
      (t, rs.size.toLong, rs.count(_._3 != 0).toLong,
        rs.count(_._1 == "A").toLong,
        rs.count(x => x._1 == "A" && x._3 != 0).toLong)
    }.toSeq.sortBy(_._1)
    val nn = data.size.toLong; val na = data.count(_._1 == "A").toLong
    var (cuma, cumaa, o) = (0L, 0L, 0L); var (ee, vv) = (0.0, 0.0)
    for ((_, a, d, aa, da) <- grid) {
      val nR = nn - cuma; val nRa = na - cumaa
      if (d > 0 && nR >= 2) {
        val pa = nRa.toDouble / nR.toDouble
        ee += d.toDouble * pa
        vv += d.toDouble * pa * (1.0 - pa) *
          ((nR - d).toDouble / (nR - 1).toDouble)
      }
      o += da; cuma += a; cumaa += aa
    }
    assert(r.getLong(0) == 2L && r.getString(1) == "A" &&
      r.getString(2) == "B")
    assert(r.getLong(5) == o && r.getDouble(6) == ee && r.getDouble(7) == vv)
    assert(r.getDouble(8) == (o.toDouble - ee) / math.sqrt(vv))
    // one group → NULL z with the observed count
    val one = df.where(F.col("g") === "A")
    val r1 = Survival.logRank(one, "dur", "ev", "g").head()
    assert(r1.getLong(0) == 1L && r1.isNullAt(8))
  }

  test("mannKendall: exact S/variance on a hand fixture, all-tied NULLs") {
    import spark.implicits._
    // series 1,3,2,4 → pairs: (1,3)+ (1,2)+ (1,4)+ (3,2)− (3,4)+ (2,4)+
    // S = 4; no ties → Var = 4·3·13/18 = 26/3
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 3L, 2.0),
      ("g", 4L, 4.0)).toDF("k", "t", "x")
    val r = Trend.mannKendall(df, "k", "t", "x").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(4) == 26.0 / 3.0)
    assert(r.getDouble(5) == 3.0 / math.sqrt(26.0 / 3.0))
    // all-tied series → S = 0, Var includes the full tie correction → 0
    val flat = Seq(("g", 1L, 7.0), ("g", 2L, 7.0), ("g", 3L, 7.0))
      .toDF("k", "t", "x")
    val rf = Trend.mannKendall(flat, "k", "t", "x").head()
    assert(rf.getLong(2) == 0L && rf.isNullAt(5))
  }

  test("theilSen recovers an exact linear trend through outliers") {
    import spark.implicits._
    // y = 2t + 1 with one wild outlier at t=5
    val pts = (1L to 9L).map(t =>
      ("g", t, if (t == 5) 1000.0 else 2.0 * t + 1.0))
    val r = Trend.theilSen(pts.toDF("k", "t", "x"), "k", "t", "x").head()
    // 28 of 36 pairwise slopes are exactly 2 → median 2; intercept 1
    assert(r.getDouble(2) == 2.0, s"slope=${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"icpt=${r.getDouble(3)}")
  }

  test("acf matches the driver-side expansion on an exact long series") {
    import spark.implicits._
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("k", "t", "x")
    val got = Trend.acf(df, "k", "t", "x", maxLag = 3).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    val n = xs.size; val m = xs.sum.toDouble / n.toDouble
    val den = xs.map(x => x.toDouble).map(x => x * x).sum -
      n.toDouble * (m * m)
    for (k <- 1 to 3) {
      val pairs = xs.drop(k).zip(xs.dropRight(k))
      val sxy = pairs.map { case (a, b) => a * b }.sum.toDouble
      val sh = pairs.map(_._2).sum.toDouble
      val st = pairs.map(_._1).sum.toDouble
      val num = sxy - m * sh - m * st + pairs.size.toDouble * (m * m)
      assert(got(k.toLong)._1 == pairs.size.toLong)
      assert(math.abs(got(k.toLong)._2 - num / den) < 1e-12,
        s"lag $k: ${got(k.toLong)._2} vs ${num / den}")
    }
  }

  test("JaroWinkler: textbook values, boost threshold, empty/null rules") {
    import spark.implicits._
    import graft.expressions.StringDistance.{jaroWinkler => jw}
    def b(s: String) = s.getBytes("UTF-8")
    // classic worked examples (values = DuckDB's jaro_winkler_similarity,
    // verified on 3000 fuzzed pairs while building the kernel)
    assert(jw(b("MARTHA"), b("MARHTA")) == 0.9611111111111111)
    assert(jw(b("DIXON"), b("DICKSONX")) == 0.8133333333333332)
    assert(jw(b("JELLYFISH"), b("SMELLYFISH")) == 0.8962962962962964)
    assert(jw(b("apple"), b("apply")) == 0.92)
    assert(jw(b("CRATE"), b("TRACE")) == 0.7333333333333334)
    assert(jw(b("abcdef"), b("abcdef")) == 1.0)
    // no shared prefix → jaro == jaro-winkler even above the threshold
    assert(jw(b("ABCVWXYZ"), b("CABVWXYZ")) == 0.9583333333333334)
    // zero matches / disjoint alphabets → 0
    assert(jw(b("x"), b("y")) == 0.0)
    assert(jw(b("ab"), b("ba")) == 0.0) // window 0 blocks both
    // the ANSI empty rule: EITHER side empty → 0, including both
    assert(jw(b(""), b("abc")) == 0.0 && jw(b(""), b("")) == 0.0)
    // the Column face propagates nulls
    val df = Seq(("abc", "abd"), ("abc", null), (null, "abc"))
      .toDF("a", "b")
    val got = df.select(graft.expressions.StringDistance
      .jaroWinklerCol(F.col("a"), F.col("b")).as("j")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("rankEval: perfect/reversed/degenerate rankings score correctly") {
    import spark.implicits._
    // perfect: relevance already descending → ndcg 1, rr 1
    val perfect = Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 0L), (5L, 0L))
      .map { case (p, r) => ("q", p, r) }.toDF("q", "pos", "rel")
    val rp = graft.pipeline.Retrieval.rankEval(perfect, "q", "pos", "rel",
      maxK = 10).head()
    assert(rp.getDouble(5) == 1.0 && rp.getDouble(6) == 1.0)
    // reversed: same gains, worse discounts → ndcg < 1; first relevant
    // at pos 3 → rr = 1/3; AP = (1/3 + 2/4 + 3/5)/3
    val rev = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L), (5L, 2L))
      .map { case (p, r) => ("q", p, r) }.toDF("q", "pos", "rel")
    val rr = graft.pipeline.Retrieval.rankEval(rev, "q", "pos", "rel",
      maxK = 10).head()
    assert(rr.getDouble(5) < 1.0 && rr.getDouble(6) == 1.0 / 3.0)
    assert(math.abs(rr.getDouble(7) -
      (1.0 / 3.0 + 2.0 / 4.0 + 3.0 / 5.0) / 3.0) < 1e-12)
    // same multiset of gains → identical idcg across the two orderings
    assert(rp.getDouble(4) == rr.getDouble(4))
    // nothing relevant: ndcg NULL (idcg 0), rr/ap 0.0 by convention
    val none = Seq((1L, 0L), (2L, 0L)).map { case (p, r) => ("q", p, r) }
      .toDF("q", "pos", "rel")
    val rn = graft.pipeline.Retrieval.rankEval(none, "q", "pos", "rel",
      maxK = 10).head()
    assert(rn.isNullAt(5) && rn.getDouble(6) == 0.0 && rn.getDouble(7) == 0.0)
  }

  test("mahalanobisOutliers2 ranks the JOINT outlier above marginal ones") {
    import spark.implicits._
    // x and y strongly correlated; id 99 breaks the correlation while
    // staying inside both marginal ranges — euclidean/robust-z on either
    // axis would rank the extreme-but-on-trend id 10 higher
    val onTrend = (1L to 10L).map(i => (i, i.toDouble, 2.0 * i.toDouble))
    val joint = Seq((99L, 8.0, 4.0)) // x high, y low — off the line
    val df = (onTrend ++ joint).toDF("id", "x", "y")
    val top = Report.mahalanobisOutliers2(df, "id", "x", "y", k = 3)
      .collect()
    assert(top.head.getLong(0) == 99L,
      top.map(r => (r.getLong(0), r.getDouble(3))).mkString(", "))
    assert(top.head.getDouble(3) > top(1).getDouble(3))
    // degenerate: perfectly collinear cloud → det 0 → NULL distances
    val line = (1L to 5L).map(i => (i, i.toDouble, 3.0 * i.toDouble))
      .toDF("id", "x", "y")
    val dl = Report.mahalanobisOutliers2(line, "id", "x", "y", k = 2)
      .collect()
    assert(dl.forall(_.isNullAt(3)))
  }

  test("changepoint finds the level shift at the exact boundary") {
    import spark.implicits._
    // 4 days at 5, then 3 days at 20 → best split after day 4
    val xs = Seq(5L, 5L, 5L, 5L, 20L, 20L, 20L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong + 1L, x) }
      .toDF("k", "t", "x")
    val r = Trend.changepoint(df, "k", "t", "x").head()
    assert(r.getLong(1) == 7L && r.getLong(2) == 4L,
      s"t_star=${r.getLong(2)}")
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 20.0)
    // gain at the true split: (4·3/7)·15² = 2700/7
    assert(r.getDouble(3) == (4.0 * 3.0 / 7.0) * (15.0 * 15.0))
    // a flat series: every split has gain 0 → tie → smallest t
    val flat = Seq(3L, 3L, 3L).zipWithIndex
      .map { case (x, i) => ("g", i.toLong + 1L, x) }.toDF("k", "t", "x")
    assert(Trend.changepoint(flat, "k", "t", "x").head().getLong(2) == 1L)
    // n = 1: no split exists → no row
    val one = Seq(("g", 1L, 9L)).toDF("k", "t", "x")
    assert(Trend.changepoint(one, "k", "t", "x").count() == 0L)
  }

  test("rollingCorr: ±1 on exact linear frames, NULL on flat frames") {
    import spark.implicits._
    // y = 2x exactly → every ≥2-row frame correlates 1 (to the ulp:
    // √v·√v ≠ v exactly, so the quotient can sit one ulp off 1.0)
    val up = (1L to 10L).map(i => ("g", i, i, 2L * i)).toDF("k", "t", "x", "y")
    val ru = Trend.rollingCorr(up, "k", "t", "x", "y", window = 4).collect()
    assert(ru.drop(1).forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-12),
      ru.map(_.toString).mkString(", "))
    // first frame has n_w = 1 → NULL
    assert(ru.head.getLong(2) == 1L && ru.head.isNullAt(3))
    // y = −x + 100 → −1
    val dn = (1L to 6L).map(i => ("g", i, i, 100L - i)).toDF("k", "t", "x", "y")
    assert(Trend.rollingCorr(dn, "k", "t", "x", "y", window = 3)
      .collect().drop(1)
      .forall(r => math.abs(r.getDouble(3) + 1.0) < 1e-12))
    // constant y → zero variance → NULL
    val fl = (1L to 5L).map(i => ("g", i, i, 7L)).toDF("k", "t", "x", "y")
    assert(Trend.rollingCorr(fl, "k", "t", "x", "y", window = 3)
      .collect().forall(_.isNullAt(3)))
  }

  test("isotonicCalibration pools violating bins to exact weighted means") {
    import spark.implicits._
    // scores land in 4 distinct bins with raw rates 0.2, 0.6, 0.4, 0.8:
    // bins 2 and 3 violate → pool to (3+2)/(5+5) = 0.5
    def rows(score: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((score, 1)) ++ Seq.fill(neg)((score, 0))
    val df = (rows(0.05, 1, 4) ++ rows(0.30, 3, 2) ++
      rows(0.55, 2, 3) ++ rows(0.80, 4, 1)).toDF("score", "label")
    val got = graft.pipeline.QualityModel
      .isotonicCalibration(df, "score", "label", bins = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._2).toSeq == Seq(0.2, 0.6, 0.4, 0.8))
    assert(got.map(_._3).toSeq == Seq(0.2, 0.5, 0.5, 0.8), got.mkString(", "))
    // already-monotone input is untouched
    val mono = (rows(0.05, 1, 4) ++ rows(0.55, 3, 2) ++ rows(0.80, 4, 1))
      .toDF("score", "label")
    val gm = graft.pipeline.QualityModel
      .isotonicCalibration(mono, "score", "label", bins = 20).collect()
    assert(gm.forall(r => r.getDouble(3) == r.getDouble(4)))
    // all-violating input collapses to the global rate
    val inv = (rows(0.05, 4, 1) ++ rows(0.55, 2, 3) ++ rows(0.90, 1, 4))
      .toDF("score", "label")
    val gi = graft.pipeline.QualityModel
      .isotonicCalibration(inv, "score", "label", bins = 20).collect()
    assert(gi.forall(r => r.getDouble(4) == 7.0 / 15.0))
  }

  test("holtLinear replays the driver recursion and tracks a ramp") {
    import spark.implicits._
    val xs = Seq(10.0, 12.0, 14.0, 16.0, 18.0, 20.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("k", "t", "x")
    val r = Trend.holtLinear(df, "k", "t", "x", alpha = 0.5d,
      beta = 0.3d, horizon = 2).head()
    var l = xs.head; var b = 0.0
    for (x <- xs.tail) {
      val nl = 0.5 * x + (1.0 - 0.5) * (l + b)
      b = 0.3 * (nl - l) + (1.0 - 0.3) * b
      l = nl
    }
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == l && r.getDouble(3) == b)
    assert(r.getDouble(4) == l + 2.0 * b)
    // a steady +2/day ramp: the trend state converges toward 2
    assert(b > 1.0 && b < 3.0, s"trend=$b")
  }

  test("cupedT recovers the pooled slope and the adjusted Welch t") {
    import spark.implicits._
    // A: y = 2.5(x−1) + 10/3-ish, B: one unit lower — engineered so
    // pooled sxyC/sxxC = 10/4 = 2.5 exactly and both adjusted
    // variances are 1/12 (driver truth below)
    val df = Seq(("A", 1.0, 0.0), ("A", 3.0, 1.0), ("A", 6.0, 2.0),
      ("B", 0.0, 0.0), ("B", 2.0, 1.0), ("B", 5.0, 2.0))
      .toDF("v", "y", "x")
    val r = Report.cupedT(df, "v", "y", "x").head()
    assert(r.getLong(0) == 2L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(math.abs(r.getDouble(5) - 2.5) < 1e-9, s"theta=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - 150.0 / 161.0) < 1e-9)
    // y' = y − 2.5(x−1): A → (3.5, 3, 3.5), B → (2.5, 2, 2.5)
    assert(math.abs(r.getDouble(7) - 10.0 / 3.0) < 1e-9)
    assert(math.abs(r.getDouble(8) - 7.0 / 3.0) < 1e-9)
    assert(math.abs(r.getDouble(9) - 1.0 / 12.0) < 1e-9)
    // t = 1/√(2·(1/12)/3) = √18, Satterthwaite dof = 4 (equal cells)
    assert(math.abs(r.getDouble(11) - math.sqrt(18.0)) < 1e-6)
    assert(math.abs(r.getDouble(12) - 4.0) < 1e-6)
  }

  test("cupedT degenerate inputs answer NULL honestly") {
    import spark.implicits._
    // constant covariate → zero pooled covariate variance → NULL θ/t
    val flat = Seq(("A", 1.0, 5.0), ("A", 2.0, 5.0), ("B", 3.0, 5.0),
      ("B", 4.0, 5.0)).toDF("v", "y", "x")
    val r0 = Report.cupedT(flat, "v", "y", "x").head()
    assert(r0.isNullAt(5) && r0.isNullAt(11))
    // three variants → NULL t with the observed count
    val three = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0), ("B", 1.0, 2.0),
      ("B", 3.0, 4.0), ("C", 2.0, 1.0)).toDF("v", "y", "x")
    val r1 = Report.cupedT(three, "v", "y", "x").head()
    assert(r1.getLong(0) == 3L && r1.isNullAt(11))
  }

  test("mantelHaenszel matches the textbook two-stratum arithmetic") {
    import spark.implicits._
    def rows(st: String, v: String, succ: Int, fail: Int) =
      (0 until succ).map(_ => (st, v, true)) ++
        (0 until fail).map(_ => (st, v, false))
    // s1: A 10/10, B 5/15; s2: A 8/2, B 4/6
    val df = (rows("s1", "A", 10, 10) ++ rows("s1", "B", 5, 15) ++
      rows("s2", "A", 8, 2) ++ rows("s2", "B", 4, 6))
      .toDF("st", "v", "c")
    val r = Report.mantelHaenszel(df, "st", "v", "c").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
    assert(r.getLong(2) == 60L && r.getLong(3) == 18L)
    // driver truth: E = 7.5 + 6, V = 150000/62400 + 9600/7600,
    // OR_MH = (3.75 + 2.4)/(1.25 + 0.4), χ² = (18 − 13.5)²/ΣV
    val vSum = 150000.0 / 62400.0 + 9600.0 / 7600.0
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-5)
    assert(math.abs(r.getDouble(5) - vSum) < 1e-5)
    assert(math.abs(r.getDouble(6) - 4.5 * 4.5 / vSum) < 1e-4)
    assert(math.abs(r.getDouble(7) - 6.15 / 1.65) < 1e-5)
  }

  test("mantelHaenszel skips uninformative strata and counts them") {
    import spark.implicits._
    val df = Seq(
      ("s1", "A", true), ("s1", "A", false), ("s1", "B", true),
      ("s1", "B", false),
      ("s2", "A", true), ("s2", "A", false)) // single variant → skipped
      .toDF("st", "v", "c")
    val r = Report.mantelHaenszel(df, "st", "v", "c").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 4L)
  }

  test("olsByGroup fits the exact line and answers NULL inference on it") {
    import spark.implicits._
    val df = ((0 to 4).map(t => ("exact", t.toLong, 3.0 + 2.0 * t)) ++
      Seq(("noisy", 0L, 1.0), ("noisy", 1L, 2.0), ("noisy", 2L, 2.0),
        ("noisy", 3L, 3.0)) ++
      Seq(("tiny", 0L, 1.0), ("tiny", 1L, 2.0)))
      .toDF("g", "t", "x")
    val rs = Trend.olsByGroup(df, "g", "t", "x").collect()
    val ex = rs.find(_.getString(0) == "exact").get
    assert(math.abs(ex.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(ex.getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(ex.getDouble(4) - 1.0) < 1e-9)
    // a perfect fit has mse = 0: slope inference honestly NULL
    assert(ex.isNullAt(5) && ex.isNullAt(6))
    val no = rs.find(_.getString(0) == "noisy").get
    // driver truth: stt=5, stx=3, sxx=2 → slope .6, int 1.1, r2 .9,
    // mse = (2 − 1.8)/2 = .1, se = √(.1/5), t = .6/se
    assert(math.abs(no.getDouble(2) - 0.6) < 1e-6)
    assert(math.abs(no.getDouble(3) - 1.1) < 1e-6)
    assert(math.abs(no.getDouble(4) - 0.9) < 1e-6)
    assert(math.abs(no.getDouble(5) - math.sqrt(0.02)) < 1e-6)
    assert(math.abs(no.getDouble(6) - 0.6 / math.sqrt(0.02)) < 1e-6)
    // n = 2 → slope exists, inference NULL
    val ti = rs.find(_.getString(0) == "tiny").get
    assert(math.abs(ti.getDouble(2) - 1.0) < 1e-9 && ti.isNullAt(5))
  }

  test("byFdr applies the harmonic penalty over the bhFdr machinery") {
    import spark.implicits._
    val ps = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.04), ("t4", 0.5))
    val df = ps.toDF("id", "p")
    val rs = Report.byFdr(df, "id", "p", alpha = 0.1d).collect()
    // driver replay: c(4) folded ascending, raw = c·m·p/rank,
    // suffix min, clip at 1
    val cm = (1 to 4).foldLeft(0.0d)((a, i) => a + 1.0 / i)
    val raws = ps.zipWithIndex.map { case ((_, p), i) =>
      cm * 4.0 * p / (i + 1).toDouble }
    val adj = raws.indices.map(i =>
      math.min(1.0, raws.drop(i).min))
    for ((r, i) <- rs.zipWithIndex) {
      assert(r.getLong(2) == i + 1)
      assert(r.getDouble(3) == adj(i), s"rank ${i + 1}")
      assert(r.getBoolean(4) == (adj(i) <= 0.1))
    }
    // BY is never more permissive than BH on the same input
    val bh = Report.bhFdr(df, "id", "p", alpha = 0.1d).collect()
    for ((y, h) <- rs.zip(bh))
      assert(y.getDouble(3) >= h.getDouble(3))
  }

  test("holtWinters replays the rotating-seasonal recursion exactly") {
    import spark.implicits._
    // p=2, trend +0.5/step, season ±1: two init periods + 4 steps
    val xs = Seq(1.0, 3.0, 2.0, 4.0, 3.0, 5.0, 4.0, 6.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("k", "t", "x")
    val r = Trend.holtWinters(df, "k", "t", "x", alpha = 0.5d,
      beta = 0.3d, gamma = 0.4d, period = 2, horizon = 2).head()
    // driver truth with the same stated doubles
    val p = 2
    val l0 = (xs(0) + xs(1)) / p.toDouble
    val b0 = ((xs(2) + xs(3)) - (xs(0) + xs(1))) / (p.toDouble * p.toDouble)
    var l = l0; var b = b0
    var s = Array(xs(0) - l0, xs(1) - l0)
    for (x <- xs.drop(2 * p)) {
      val sh = s(0)
      val nl = 0.5 * (x - sh) + (1.0 - 0.5) * (l + b)
      val nb = 0.3 * (nl - l) + (1.0 - 0.3) * b
      val ns = 0.4 * (x - nl) + (1.0 - 0.4) * sh
      s = Array(s(1), ns); l = nl; b = nb
    }
    assert(r.getLong(1) == 8L)
    assert(r.getDouble(2) == l && r.getDouble(3) == b)
    assert(r.getDouble(4) == s(0))
    // horizon 2 reads the second rotated slot
    assert(r.getDouble(5) == l + 2.0 * b + s(1))
    // n < 2p: states answer NULL with the observed n
    val short = xs.take(3).zipWithIndex.map { case (x, i) =>
      ("g", i.toLong, x) }.toDF("k", "t", "x")
    val r2 = Trend.holtWinters(short, "k", "t", "x", alpha = 0.5d,
      beta = 0.3d, gamma = 0.4d, period = 2).head()
    assert(r2.getLong(1) == 3L && r2.isNullAt(2) && r2.isNullAt(5))
  }

  test("kendallTauB: exact concordance counts, ties, and the ±1 poles") {
    import spark.implicits._
    // classic no-tie example: C=5, D=1 → τ = 4/6
    val m = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0))
      .toDF("x", "y")
    val r = Report.kendallTauB(m, "x", "y").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 5L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-12)
    // perfect reversal → −1
    val rev = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(Report.kendallTauB(rev, "x", "y").head().getDouble(6) == -1.0)
    // balanced 2×2 with ties on both margins → τ = 0, halved tie counts
    val t = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0))
      .toDF("x", "y")
    val rt = Report.kendallTauB(t, "x", "y").head()
    assert(rt.getLong(4) == 2L && rt.getLong(5) == 2L)
    assert(rt.getDouble(6) == 0.0)
    // constant column → zero denominator → NULL τ, honestly
    val flat = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    assert(Report.kendallTauB(flat, "x", "y").head().isNullAt(6))
  }

  test("sprtBernoulli crosses Wald boundaries at the first instant") {
    import spark.implicits._
    // p0=.2 vs p1=.8: lnA = ln(.8/.05), lnB = ln(.2/.95)
    val rows =
      // "up": day 1 has 3/3 successes → 3·ln4 ≈ 4.16 ≥ ln16 → h1 at 1
      (1 to 3).map(i => ("up", 1L, true)) ++ Seq(("up", 2L, false)) ++
        // "down": 0/3 on day 1 → 3·ln(.25) ≤ ln(.2/.95) → h0 at 1
        (1 to 3).map(i => ("down", 1L, false)) ++
        // "open": one success then one failure → LLR back to 0, inside
        Seq(("open", 1L, true), ("open", 2L, false))
    val r = Report.sprtBernoulli(rows.toDF("g", "t", "s"), "g", "t", "s",
        p0 = 0.2d, p1 = 0.8d, alpha = 0.05d, beta = 0.2d)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("up").getString(5) == "accept_h1" && r("up").getLong(6) == 1L)
    assert(r("down").getString(5) == "accept_h0" &&
      r("down").getLong(6) == 1L)
    assert(r("open").getString(5) == "continue" && r("open").isNullAt(6))
    // driver replay of the final LLR on the open group: k=1, n=2
    val c1 = math.log(0.8 / 0.2); val c0 = math.log((1.0 - 0.8) / (1.0 - 0.2))
    assert(math.abs(r("open").getDouble(4) - (c1 + c0)) < 1e-12)
    // the up group keeps accumulating rows past the crossing: the
    // readout reports the crossing instant, not the last one
    assert(r("up").getLong(1) == 2L && r("up").getLong(2) == 4L)
  }

  test("quantileShift reads exact order-statistic shifts per quantile") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("A", i.toDouble, i.toLong)) ++
      (1 to 10).map(i => ("B", i.toDouble + 5.0, 100L + i)))
      .toDF("v", "x", "id")
    val rs = Report.quantileShift(df, "v", "x", qs = Seq(0.5d, 0.9d),
      tiebreakers = Seq("id")).collect()
    assert(rs.length == 2)
    // k = ceil(.5·10) = 5 → A=5, B=10; k = ceil(.9·10) = 9 → A=9, B=14
    assert(rs(0).getDouble(0) == 0.5 && rs(0).getDouble(3) == 5.0 &&
      rs(0).getDouble(4) == 10.0 && rs(0).getDouble(5) == -5.0)
    assert(rs(1).getDouble(0) == 0.9 && rs(1).getDouble(3) == 9.0 &&
      rs(1).getDouble(4) == 14.0 && rs(1).getDouble(5) == -5.0)
    // one observed variant: values arrive, shift honestly NULL
    val one = (1 to 4).map(i => ("A", i.toDouble, i.toLong))
      .toDF("v", "x", "id")
    val r1 = Report.quantileShift(one, "v", "x", qs = Seq(0.5d),
      tiebreakers = Seq("id")).head()
    assert(r1.getDouble(3) == 2.0 && r1.isNullAt(4) && r1.isNullAt(5))
  }
}
