package graft.agg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.lag.Lag
import graft.linalg.LinAlg
import graft.core.Trajectories.FeatCol

/** Koopman reweighting — estimates the ratio of stationary over empirical
  * distribution as a linear function of the basis, for equilibrium
  * covariance estimation from off-equilibrium data (reference
  * covariance/_covariance.py:526-760 `KoopmanWeightingEstimator` /
  * `KoopmanWeightingModel`; Wu et al. JCP 2017 "Variational Koopman
  * models").
  *
  * Distributed shape: ONE covariance pass fits the model; the weight
  * w(x) = x . u + c is a pure codegen column, so reweighted covariances
  * are a second aggregation pass with a weight column — no extra shuffle. */
object KoopmanWeighting {

  case class KoopmanWeightingModel(u: Array[Double], uConst: Double) {
    /** Weight column w(x) = x . u + c. */
    def weightColumn(feat: Column): Column =
      u.indices.map(i => feat.getItem(i) * lit(u(i))).reduce(_ + _) + lit(uConst)

    def transform(traj: DataFrame, featCol: String = FeatCol): DataFrame =
      traj.withColumn("koopman_weight", weightColumn(col(featCol)))
  }

  /** Fit from lagged covariances (fetch_model of the reference): whiten
    * with R = spd_inv_split(C00), build the padded Koopman matrix
    * K = [[R' C0t R, 0], [(mt - m0) R, 1]], take the left eigenvector of K
    * at eigenvalue 1 normalized to last component 1, map back to the input
    * basis. */
  def fromCovariance(cov: CovarianceModel, epsilon: Double = 1e-6): KoopmanWeightingModel = {
    val d = cov.d
    val c00 = LinAlg.fromFlat(cov.cov00, d)
    val c0t = LinAlg.fromFlat(cov.cov0t, d)
    val r = LinAlg.spdInvSplit(c00, epsilon)   // d x M
    val m = r.cols
    val kCore = r.t * c0t * r                  // M x M
    val k = DenseMatrix.zeros[Double](m + 1, m + 1)
    for (i <- 0 until m; j <- 0 until m) k(i, j) = kCore(i, j)
    val meanDiff = DenseVector.tabulate(d)(i => cov.meant(i) - cov.mean0(i))
    val bottom = r.t * meanDiff
    for (j <- 0 until m) k(m, j) = bottom(j)
    k(m, m) = 1.0
    // left eigenvector of K at the eigenvalue closest to 1 (_compute_u)
    val e = breeze.linalg.eig(k.t)
    val best = (0 to m).minBy(i => math.hypot(e.eigenvalues(i) - 1.0, e.eigenvaluesComplex(i)))
    var u = DenseVector.tabulate(m + 1)(i => e.eigenvectors(i, best))
    u = u / u(m)
    val uIn = r * u(0 until m)
    val mean0 = DenseVector(cov.mean0)
    KoopmanWeightingModel(uIn.toArray, u(m) - (mean0 dot uIn))
  }

  def fit(traj: DataFrame, tau: Int, epsilon: Double = 1e-6): KoopmanWeightingModel =
    fromCovariance(Covariance.fit(Lag.pairs(traj, tau)), epsilon)

  /** Equilibrium (Koopman-reweighted) covariances: weights from `fit`,
    * then one weighted covariance pass (the reference's
    * Covariance(..., model=koopman_model) path). */
  def reweightedCovariance(traj: DataFrame, tau: Int, epsilon: Double = 1e-6,
                           bessel: Boolean = true): CovarianceModel = {
    val wm = fit(traj, tau, epsilon)
    val pairs = Lag.pairs(traj, tau).withColumn("w", wm.weightColumn(col("x")))
    Covariance.fit(pairs, weightCol = Some("w"), bessel = bessel)
  }
}
