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
      iters: Int, prior: PcaModel): PcaModel =
    fitDeflatedK(df, vecCol, dim, iters, Seq(prior))

  /** Power iteration on the residual after projecting out ALL `priors`
    * (component j of a top-k fit): per row the deflated value is
    * xd_i = ((xc_i − p_1·w_1i) − p_2·w_2i) − … with every prior
    * projection p_l = xc·w_l a pinned ascending fold over the ORIGINAL
    * centered vector, and the subtractions applied LEFT TO RIGHT in
    * prior order — the exact double sequence the oracle restates. The
    * deflated matrix is never materialized: each pass stays ONE
    * aggregation of d fixed-point sums; the per-row stage carries
    * |priors| staged projection columns plus the deflated projection s
    * (all multi-referenced, so CollapseProject keeps each evaluated
    * once — the [[graft.pipeline.Dsir]] lambda-CSE discipline). Same
    * bit-replay contract as [[fit]]; one-prior calls are bit-identical
    * to the r13 [[fitDeflated]]. */
  def fitDeflatedK(df: DataFrame, vecCol: String, dim: Int,
      iters: Int, priors: Seq[PcaModel]): PcaModel = {
    require(priors.nonEmpty, "fitDeflatedK needs at least one prior")
    priors.foreach(p =>
      require(p.dim == dim, s"prior model has dim ${p.dim}, not $dim"))
    // all priors must come from the SAME fit: deflating with models
    // centered on different data silently states wrong residuals
    priors.tail.foreach(p => require(
      p.n == priors.head.n && p.means.sameElements(priors.head.means),
      "fitDeflatedK priors disagree on n/means — fit them on the same data"))
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val means = priors.head.means
    val ws = priors.map(_.weights)
    val n = priors.head.n
    val base = df.where(F.col(vecCol).isNotNull).select(F.col(vecCol).as("td_e"))
    // xd_i from the staged projection columns: left-to-right deflation
    def xdTerm(i: Int): Column =
      ws.zipWithIndex.foldLeft(
        elem(F.col("td_e"), i) - F.lit(means(i - 1))) { case (acc, (w, l)) =>
        acc - (F.col(s"td_p${l + 1}") * F.lit(w(i - 1)))
      }
    var v = Array.fill(dim)(1.0d / math.sqrt(dim.toDouble))
    var lambda = 0.0d
    for (_ <- 0 until iters) {
      val stage1 = base.select(F.col("td_e") +:
        ws.zipWithIndex.map { case (w, l) =>
          centeredDot(F.col("td_e"), means, w).as(s"td_p${l + 1}")
        }: _*)
      // the residual dimensions materialize as NAMED columns (each
      // multi-referenced below, so CollapseProject keeps them evaluated
      // once): the same doubles as inlining xd into every consumer, but
      // each codegen unit stays small — one giant fused expression for
      // component j≥3 was measured to cross the JVM's 64 KB method
      // limit under a many-way-union input and fall back to interpreted
      // eval (r14 probe)
      val stage2 = stage1.select(
        (1 to dim).map(i => xdTerm(i).as(s"td_x$i")): _*)
      val sExpr = (1 to dim).foldLeft(F.lit(0.0d).cast("double")) { (acc, j) =>
        acc + F.col(s"td_x$j") * F.lit(v(j - 1))
      }
      val staged = stage2.select(
        (1 to dim).map(i => F.col(s"td_x$i")) :+ sExpr.as("td_s"): _*)
      val terms = (1 to dim).map { i =>
        fixedTerm(F.col(s"td_x$i") * F.col("td_s")).as(s"g$i")
      }
      val row = staged.agg(terms.head, terms.tail: _*).head()
      val u = Array.tabulate(dim)(i => row.getDecimal(i).doubleValue() / GradScale)
      val nrm = math.sqrt(u.indices.foldLeft(0.0d)((a, i) => a + u(i) * u(i)))
      require(nrm > 0.0d, "deflated power iteration collapsed to zero")
      v = u.map(_ / nrm)
      lambda = nrm / (n.toDouble - 1.0d)
    }
    PcaModel(dim, n, means, v, lambda)
  }

  /** Top-k principal components by ITERATED deflation — the real
    * embedding-whitening fit (SemDedup-style pipelines whiten with the
    * top 8–32 components, not two): component 1 from [[fit]], then each
    * component j from [[fitDeflatedK]] against all j−1 priors. k·iters
    * aggregation passes total, each one corpus scan with a map-side
    * combine; the driver holds k·d doubles. Components 1 and 2 are
    * bit-identical to the r13 [[fit]]/[[fitDeflated]] pair. */
  def fitK(df: DataFrame, vecCol: String, dim: Int, k: Int,
      iters: Int = 3): Seq[PcaModel] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k <= dim, s"k must be <= dim, got k=$k dim=$dim")
    (2 to k).foldLeft(Vector(fit(df, vecCol, dim, iters))) { (acc, _) =>
      acc :+ fitDeflatedK(df, vecCol, dim, iters, acc)
    }
  }

  /** PCA whitening: project every row onto each fitted component and
    * scale by 1/√λ_l — output columns y1..yk with unit variance along
    * each principal axis (the embedding normalization SemDedup-style
    * clustering runs on). Scores are the ORIGINAL centered projections
    * xc·w_l (components are orthogonal, so no re-deflation), each a
    * pinned ascending fold, divided by the driver-computed √λ_l — one
    * stated double op each, row-local codegen arithmetic, zero
    * shuffles. */
  def whitenK(df: DataFrame, idCol: String, vecCol: String,
      models: Seq[PcaModel]): DataFrame = {
    require(models.nonEmpty, "whitenK needs at least one component")
    val means = models.head.means
    val cols = models.zipWithIndex.map { case (m, l) =>
      (centeredDot(F.col(vecCol), means, m.weights) /
        F.lit(math.sqrt(m.lambda))).as(s"y${l + 1}")
    }
    df.where(F.col(vecCol).isNotNull)
      .select(F.col(idCol) +: cols: _*)
  }

  /** Per-vector squared RECONSTRUCTION ERROR of a top-k fit — how much
    * of each embedding the k components fail to carry (the compression-
    * quality read next to [[explainedVariance]]'s corpus ratio; rank
    * outliers by it to find embeddings the whitened space represents
    * poorly). err2 = Σ_i xd_i² where xd is [[fitDeflatedK]]'s residual
    * (projections of the ORIGINAL centered vector, deflations applied
    * left to right in component order, the squared terms folded over
    * ascending i) — every double stated once, row-local codegen
    * arithmetic, zero shuffles. Output: (id, err2). */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String,
      models: Seq[PcaModel]): DataFrame = {
    require(models.nonEmpty, "reconstructionError needs at least one component")
    val means = models.head.means
    val dim = models.head.dim
    val ws = models.map(_.weights)
    val base = df.where(F.col(vecCol).isNotNull)
      .select(F.col(idCol), F.col(vecCol).as("td_e"))
    val staged = base.select(F.col(idCol) +: F.col("td_e") +:
      ws.zipWithIndex.map { case (w, l) =>
        centeredDot(F.col("td_e"), means, w).as(s"td_p${l + 1}")
      }: _*)
    def xdTerm(i: Int): Column =
      ws.zipWithIndex.foldLeft(
        elem(F.col("td_e"), i) - F.lit(means(i - 1))) { case (acc, (w, l)) =>
        acc - (F.col(s"td_p${l + 1}") * F.lit(w(i - 1)))
      }
    // residual dims staged as columns (each referenced twice by the
    // square below — kept evaluated once, codegen units small; the same
    // 64 KB-ceiling discipline as fitDeflatedK)
    val staged2 = staged.select(F.col(idCol) +:
      (1 to dim).map(i => xdTerm(i).as(s"td_x$i")): _*)
    val err = (1 to dim).foldLeft(F.lit(0.0d).cast("double")) { (acc, i) =>
      acc + F.col(s"td_x$i") * F.col(s"td_x$i")
    }
    staged2.select(F.col(idCol), err.as("err2"))
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
