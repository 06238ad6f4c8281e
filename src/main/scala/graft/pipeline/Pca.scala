package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Distributed PCA (top principal component) by deterministic power
  * iteration — the embedding-whitening stage a SemDedup-style curation
  * pipeline runs before clustering (Abbas et al. 2023 apply PCA to the
  * embedding space; reference surface: the embedding tables the dedup
  * operators consume).
  *
  * Built like [[QualityModel.trainLogistic]], so the TRAINING ITSELF is
  * oracle-checkable across engines:
  *
  *   - the covariance matrix is never materialized: each power-iteration
  *     step computes u = Xcᵀ(Xc·v) directly from the data — one linear
  *     aggregation pass per iteration (n·d work, d decimal sum columns),
  *     the classic big-data PCA trick that avoids the O(d²) Gram matrix
  *     and any shuffle beyond one map-side-combined agg;
  *   - every corpus-wide double sum is rounded into FIXED POINT
  *     (floor(t·2^20 + 0.5) as DECIMAL(38,0) — the
  *     [[Report.momentSketch]] / [[QualityModel]] trick): integer
  *     addition commutes, so any partitioning and any engine produce the
  *     SAME iterate, and the whole trajectory replays bit-for-bit in SQL;
  *   - all bounded double folds (the per-row projection x·v, the
  *     iterate norm) are stated with PINNED left-to-right ascending-index
  *     association on both engines;
  *   - the start vector is uniform 1/√d (exact when d is a power of
  *     four), so iteration 1 is deterministic.
  *
  * At 100 TB each iteration is one aggregation over the corpus (the same
  * shape as a count); the driver holds only the d-vector between passes
  * (O(d) metadata, never rows). */
object Pca {

  import QualityModel.GradScale

  /** Fitted top component: column means, unit eigenvector, and the
    * eigenvalue estimate λ = ‖Xcᵀ Xc v‖ / (n−1) from the final pass. */
  final case class PcaModel(dim: Int, n: Long, means: Array[Double],
      weights: Array[Double], lambda: Double)

  private def elem(vec: Column, i: Int): Column =
    F.element_at(vec, i).cast("double")

  /** w0 + Σ_i (x_i − m_i)·v_i with pinned left-to-right association —
    * the exact double every engine must state (ascending i, seed 0.0). */
  private def centeredDot(vec: Column, means: Array[Double],
      v: Array[Double]): Column =
    v.indices.foldLeft(F.lit(0.0d).cast("double")) { (acc, i) =>
      acc + (elem(vec, i + 1) - F.lit(means(i))) * F.lit(v(i))
    }

  /** One fixed-point decimal sum column per dimension:
    * Σ_rows floor(((x_i − m_i)·s)·2^20 + 0.5) as DECIMAL(38,0). */
  private def fixedTerm(t: Column): Column =
    F.sum(F.floor(t * F.lit(GradScale) + F.lit(0.5d)).cast("decimal(38,0)"))

  /** Column means in one fixed-point pass: m_i = (Σ floor(x_i·2^20+0.5)
    * / 2^20) / n. Returns (n, means). */
  def colMeans(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double]) = {
    val base = df.where(F.col(vecCol).isNotNull).select(F.col(vecCol).as("td_e"))
    val terms = (1 to dim).map(i => fixedTerm(elem(F.col("td_e"), i)).as(s"s$i"))
    val row = base.agg(F.count(F.lit(1)).as("n"), terms: _*).head()
    val n = row.getLong(0)
    require(n > 0, "Pca over an empty (or all-NULL) relation")
    val m = Array.tabulate(dim) { i =>
      (row.getDecimal(i + 1).doubleValue() / GradScale) / n.toDouble
    }
    (n, m)
  }

  /** Fit the top principal component: `iters` power-iteration passes,
    * each ONE aggregation job. v starts uniform 1/√d; each pass computes
    * u_i = Σ_rows (x_i − m_i)·((x − m)·v) in fixed point, then
    * v ← u/‖u‖ on the driver (d doubles, pinned ascending fold for the
    * norm). */
  def fit(df: DataFrame, vecCol: String, dim: Int, iters: Int = 3): PcaModel = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (n, means) = colMeans(df, vecCol, dim)
    val base = df.where(F.col(vecCol).isNotNull).select(F.col(vecCol).as("td_e"))
    var v = Array.fill(dim)(1.0d / math.sqrt(dim.toDouble))
    var lambda = 0.0d
    for (_ <- 0 until iters) {
      // stage the projection s in its own select: 64 consumers below —
      // inlined it would be recomputed per dimension (see the lambda-CSE
      // note in Dsir.features; same hazard through CollapseProject)
      val staged = base.select(F.col("td_e"),
        centeredDot(F.col("td_e"), means, v).as("td_s"))
      val terms = (1 to dim).map { i =>
        fixedTerm((elem(F.col("td_e"), i) - F.lit(means(i - 1))) *
          F.col("td_s")).as(s"g$i")
      }
      val row = staged.agg(terms.head, terms.tail: _*).head()
      val u = Array.tabulate(dim)(i => row.getDecimal(i).doubleValue() / GradScale)
      // ‖u‖ with the same pinned ascending fold the oracle states
      val nrm = math.sqrt(u.indices.foldLeft(0.0d)((a, i) => a + u(i) * u(i)))
      require(nrm > 0.0d, "power iteration collapsed to the zero vector")
      v = u.map(_ / nrm)
      lambda = nrm / (n.toDouble - 1.0d)
    }
    PcaModel(dim, n, means, v, lambda)
  }

  /** The SECOND principal component by deflation: the same power
    * iteration run on the residual after projecting out `prior` —
    * xd = xc − (xc·w)·w — with the deflation applied IN-EXPRESSION per
    * row (the deflated matrix is never materialized; each pass stays
    * one aggregation of d fixed-point sums, now with two pinned
    * per-row folds: the prior projection p, then the deflated
    * projection s). Same bit-replay contract as [[fit]]. */
  def fitDeflated(df: DataFrame, vecCol: String, dim: Int,
      iters: Int, prior: PcaModel): PcaModel = {
    require(prior.dim == dim, s"prior model has dim ${prior.dim}, not $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val means = prior.means; val w1 = prior.weights
    val base = df.where(F.col(vecCol).isNotNull).select(F.col(vecCol).as("td_e"))
    def xdTerm(i: Int, p: Column): Column =
      (elem(F.col("td_e"), i) - F.lit(means(i - 1))) - (p * F.lit(w1(i - 1)))
    var v = Array.fill(dim)(1.0d / math.sqrt(dim.toDouble))
    var lambda = 0.0d
    for (_ <- 0 until iters) {
      val stage1 = base.select(F.col("td_e"),
        centeredDot(F.col("td_e"), means, w1).as("td_p"))
      val sExpr = (1 to dim).foldLeft(F.lit(0.0d).cast("double")) { (acc, j) =>
        acc + xdTerm(j, F.col("td_p")) * F.lit(v(j - 1))
      }
      val staged = stage1.select(F.col("td_e"), F.col("td_p"),
        sExpr.as("td_s"))
      val terms = (1 to dim).map { i =>
        fixedTerm(xdTerm(i, F.col("td_p")) * F.col("td_s")).as(s"g$i")
      }
      val row = staged.agg(terms.head, terms.tail: _*).head()
      val u = Array.tabulate(dim)(i => row.getDecimal(i).doubleValue() / GradScale)
      val nrm = math.sqrt(u.indices.foldLeft(0.0d)((a, i) => a + u(i) * u(i)))
      require(nrm > 0.0d, "deflated power iteration collapsed to zero")
      v = u.map(_ / nrm)
      lambda = nrm / (prior.n.toDouble - 1.0d)
    }
    PcaModel(dim, prior.n, means, v, lambda)
  }

  /** Project every row onto the component: input columns +
    * (score = (x − m)·w, pinned fold). Row-local codegen arithmetic —
    * zero shuffles. */
  def score(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      as: String = "score"): DataFrame =
    df.where(F.col(vecCol).isNotNull)
      .select(F.col(idCol),
        centeredDot(F.col(vecCol), model.means, model.weights).as(as))

  /** Explained-variance summary (one row): the component eigenvalue, the
    * total variance trace(C) = Σ_i Var(x_i) (fixed-point diagonal sums,
    * pinned ascending fold over dimensions), and their ratio. */
  def explainedVariance(df: DataFrame, vecCol: String,
      model: PcaModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.where(F.col(vecCol).isNotNull).select(F.col(vecCol).as("td_e"))
    val terms = (1 to model.dim).map { i =>
      val xc = elem(F.col("td_e"), i) - F.lit(model.means(i - 1))
      fixedTerm(xc * xc).as(s"q$i")
    }
    val row = base.agg(terms.head, terms.tail: _*).head()
    val nm1 = model.n.toDouble - 1.0d
    val tv = (0 until model.dim).foldLeft(0.0d) { (a, i) =>
      a + (row.getDecimal(i).doubleValue() / GradScale) / nm1
    }
    Seq((model.lambda, tv, model.lambda / tv))
      .toDF("eigenvalue", "total_var", "explained_ratio")
  }
}
