package graft.decomposition

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.agg.{Covariance, CovarianceModel}
import graft.lag.Lag
import graft.linalg.LinAlg

/** Koopman/TICA/VAMP models (reference decomposition/_koopman.py:131
  * `CovarianceKoopmanModel`): a whitened projection learned from lagged
  * covariances. Model state is tiny (d x k); `transform` broadcasts it into
  * a pure-codegen column expression — no UDF, no shuffle. */
case class KoopmanModel(
    tau: Int,
    mean0: Array[Double], meant: Array[Double],
    singularValues: Array[Double],
    /** projection matrix, d x k, row-major */
    u: Array[Double], d: Int, k: Int) {

  def timescales: Seq[Double] = LinAlg.timescales(singularValues.toSeq, tau.toDouble)

  /** Column expression computing the k-dim projection of a features array:
    * proj_j = sum_i (x_i - mean0_i) * U_ij. Stays inside whole-stage codegen
    * (plain arithmetic on array elements). */
  def projection(feat: Column): Column = {
    val comps = (0 until k).map { j =>
      (0 until d).map { i =>
        (feat.getItem(i) - lit(mean0(i))) * lit(u(i * k + j))
      }.reduce(_ + _)
    }
    array(comps: _*)
  }

  def transform(traj: DataFrame, featCol: String = graft.core.Trajectories.FeatCol): DataFrame =
    traj.withColumn("projection", projection(col(featCol)))

  /** VAMP-1 / VAMP-2 scores from singular values
    * (decomposition/_score.py:13-118): sum sigma^p + 1. */
  def score(method: String = "VAMP2"): Double = method match {
    case "VAMP1" => singularValues.map(math.abs).sum + 1.0
    case "VAMP2" => singularValues.map(s => s * s).sum + 1.0
    case m => throw new IllegalArgumentException(s"unknown score $m")
  }
}

/** TICA (reference decomposition/_tica.py): symmetrized (reversible)
  * estimation, generalized eigenproblem C00 r = lambda C0t r. */
object Tica {
  def fit(traj: DataFrame, tau: Int, epsilon: Double = 1e-10, dim: Int = -1): KoopmanModel = {
    val cov = Covariance.fit(Lag.pairs(traj, tau))
    fitFromCovariance(cov, tau, epsilon, dim)
  }

  def fitFromCovariance(cov: CovarianceModel, tau: Int, epsilon: Double = 1e-10,
                        dim: Int = -1): KoopmanModel = {
    val d = cov.d
    // reversible symmetrization (covariance/_covariance.py reversible path):
    // means and covariances averaged over (x, y)
    val meanSym = Array.tabulate(d)(i => (cov.mean0(i) + cov.meant(i)) / 2.0)
    val c00 = LinAlg.fromFlat(cov.cov00, d)
    val ctt = LinAlg.fromFlat(cov.covtt, d)
    val c0tM = LinAlg.fromFlat(cov.cov0t, d)
    val c0 = (c00 + ctt) / 2.0
    val ct = LinAlg.sym(c0tM)
    val (vals, vecs) = LinAlg.eigCorr(c0, ct, epsilon)
    val k0 = vals.length
    val k = if (dim > 0) math.min(dim, k0) else k0
    val u = DenseMatrix.zeros[Double](d, k)
    (0 until k).foreach(j => u(::, j) := vecs(::, j))
    KoopmanModel(tau, meanSym, meanSym,
      Array.tabulate(k)(vals(_)), LinAlg.toFlat(u), d, k)
  }
}

/** VAMP (reference decomposition/_vamp.py): whiten both ends with
  * spd_inv_split, SVD the whitened cross-covariance. */
object Vamp {
  def fit(traj: DataFrame, tau: Int, epsilon: Double = 1e-10, dim: Int = -1): KoopmanModel = {
    val cov = Covariance.fit(Lag.pairs(traj, tau))
    fitFromCovariance(cov, tau, epsilon, dim)
  }

  def fitFromCovariance(cov: CovarianceModel, tau: Int, epsilon: Double = 1e-10,
                        dim: Int = -1): KoopmanModel = {
    val d = cov.d
    val c00 = LinAlg.fromFlat(cov.cov00, d)
    val ctt = LinAlg.fromFlat(cov.covtt, d)
    val c0t = LinAlg.fromFlat(cov.cov0t, d)
    val l0 = LinAlg.spdInvSplit(c00, epsilon)   // d x k0
    val lt = LinAlg.spdInvSplit(ctt, epsilon)   // d x kt
    val w = l0.t * c0t * lt
    val (uw, s, _) = LinAlg.truncatedSvd(w)
    val kAll = s.length
    val k = if (dim > 0) math.min(dim, kAll) else kAll
    val uFull = l0 * uw(::, 0 until k)          // d x k singular functions
    KoopmanModel(tau, cov.mean0, cov.meant,
      Array.tabulate(k)(s(_)), LinAlg.toFlat(uFull), d, k)
  }
}

/** DMD (reference decomposition/_dmd.py:58-174): modes of the best-fit
  * linear operator Y ~= A X from snapshot pairs; driver SVD on the d x d
  * covariance-derived operator (exact DMD via normal equations — valid at
  * scale because d is feature-count, not row-count). */
object Dmd {
  case class DmdModel(eigenvaluesRe: Array[Double], eigenvaluesIm: Array[Double],
                      operator: Array[Double], d: Int)

  def fit(traj: DataFrame, tau: Int = 1): DmdModel = {
    val cov = Covariance.fit(Lag.pairs(traj, tau), bessel = false)
    val d = cov.d
    // A = C0t^T C00^{-1} (least squares Y = A X with raw second moments:
    // use uncentered moments => add mean outer products back)
    def raw(c: Array[Double], ma: Array[Double], mb: Array[Double]) =
      Array.tabulate(d * d) { idx =>
        val i = idx / d; val j = idx % d
        c(idx) + ma(i) * mb(j)
      }
    val m00 = LinAlg.fromFlat(raw(cov.cov00, cov.mean0, cov.mean0), d)
    val m0t = LinAlg.fromFlat(raw(cov.cov0t, cov.mean0, cov.meant), d)
    val a = m0t.t * LinAlg.matInv(m00)
    val e = breeze.linalg.eig(a)
    DmdModel(e.eigenvalues.toArray, e.eigenvaluesComplex.toArray, LinAlg.toFlat(a), d)
  }
}
