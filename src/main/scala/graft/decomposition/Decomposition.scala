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
    /** instantaneous coefficient matrix U, d x k, row-major */
    u: Array[Double], d: Int, k: Int,
    /** timelagged coefficient matrix V, d x k, row-major (equals U for the
      * symmetric/reversible TICA estimate) */
    vOpt: Option[Array[Double]] = None) {

  /** Timelagged coefficients (falls back to U when symmetric). */
  def v: Array[Double] = vOpt.getOrElse(u)

  def timescales: Seq[Double] = LinAlg.timescales(singularValues.toSeq, tau.toDouble)

  /** Column expression computing the k-dim projection of a features array:
    * proj_j = sum_i (x_i - mean0_i) * U_ij. For narrow models this is plain
    * unrolled arithmetic (whole-stage codegen); above d*k=256 terms the
    * unrolled expression would blow up codegen compile time (embedding-width
    * features), so a captured-array gemv UDF takes over — one JIT-compiled
    * loop per row, no per-plan code growth. */
  def projection(feat: Column): Column =
    if (d * k <= 256) {
      val comps = (0 until k).map { j =>
        (0 until d).map { i =>
          (feat.getItem(i) - lit(mean0(i))) * lit(u(i * k + j))
        }.reduce(_ + _)
      }
      array(comps: _*)
    } else {
      val m = mean0; val uu = u; val dd = d; val kk = k
      val gemv = udf { (x: Seq[Double]) =>
        val out = new Array[Double](kk)
        var i = 0
        while (i < dd) {
          val xi = x(i) - m(i)
          var j = 0
          while (j < kk) { out(j) += xi * uu(i * kk + j); j += 1 }
          i += 1
        }
        out
      }
      gemv(feat.cast("array<double>"))
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

object Dim {
  /** `var_cutoff` dimension selection (reference decomposition/_koopman.py
    * `CovarianceKoopmanModel.effective_output_dimension`): smallest k whose
    * cumulative squared spectrum reaches `cutoff` of the total kinetic
    * variance. */
  def fromVarCutoff(values: Seq[Double], cutoff: Double): Int = {
    require(cutoff > 0 && cutoff <= 1.0, "var_cutoff must be in (0, 1]")
    val sq = values.map(v => v * v)
    val total = sq.sum
    if (total <= 0) return values.length
    var acc = 0.0
    var k = 0
    while (k < sq.length && acc / total < cutoff) { acc += sq(k); k += 1 }
    math.max(k, 1)
  }
}

/** TICA (reference decomposition/_tica.py): symmetrized (reversible)
  * estimation, generalized eigenproblem C00 r = lambda C0t r. */
object Tica {
  def fit(traj: DataFrame, tau: Int, epsilon: Double = 1e-10, dim: Int = -1): KoopmanModel = {
    val cov = Covariance.fit(Lag.pairs(traj, tau))
    fitFromCovariance(cov, tau, epsilon, dim)
  }

  /** Reversible symmetrization (covariance/_covariance.py reversible path,
    * moments_XXXY symmetrized): reconstruct RAW second moments from the
    * per-block covariances (each centered at its own mean), then re-center
    * everything at the joint mean (m0+mt)/2 over the pooled 2w samples.
    * Averaging the separately-centered blocks instead introduces a
    * (m0-mt)(m0-mt)^T/4-scale bias. Exposed for the q29 invariant check:
    * projections r of the generalized eigenproblem satisfy
    * r' C00sym r = I and r' C0tsym r = diag(lambda) EXACTLY on the same
    * data, because projection is affine and these are sample identities. */
  def symmetrized(cov: CovarianceModel, bessel: Boolean = true):
      (DenseMatrix[Double], DenseMatrix[Double], Array[Double]) = {
    val d = cov.d
    val w = cov.weight
    val denom = if (bessel) w - 1.0 else w
    val meanSym = Array.tabulate(d)(i => (cov.mean0(i) + cov.meant(i)) / 2.0)
    def raw(c: Array[Double], ma: Array[Double], mb: Array[Double]) =
      DenseMatrix.tabulate(d, d)((i, j) => c(i * d + j) * denom + w * ma(i) * mb(j))
    val s00 = raw(cov.cov00, cov.mean0, cov.mean0)
    val stt = raw(cov.covtt, cov.meant, cov.meant)
    val s0t = raw(cov.cov0t, cov.mean0, cov.meant)
    val wSym = 2.0 * w
    val denomSym = if (bessel) wSym - 1.0 else wSym
    val mOuter = DenseMatrix.tabulate(d, d)((i, j) => wSym * meanSym(i) * meanSym(j))
    val c0 = (s00 + stt - mOuter) / denomSym
    val ct = (s0t + s0t.t - mOuter) / denomSym
    (c0, ct, meanSym)
  }

  def fitFromCovariance(cov: CovarianceModel, tau: Int, epsilon: Double = 1e-10,
                        dim: Int = -1, bessel: Boolean = true,
                        varCutoff: Double = -1.0,
                        scaling: String = "none"): KoopmanModel = {
    val d = cov.d
    val (c0, ct, meanSym) = symmetrized(cov, bessel)
    val (vals, vecs) = LinAlg.eigCorr(c0, ct, epsilon)
    val k0 = vals.length
    val k = if (dim > 0) math.min(dim, k0)
            else if (varCutoff > 0 && varCutoff < 1.0)
              math.min(Dim.fromVarCutoff(Array.tabulate(k0)(vals(_)).toSeq, varCutoff), k0)
            else k0
    val u = DenseMatrix.zeros[Double](d, k)
    (0 until k).foreach(j => u(::, j) := vecs(::, j))
    // Eigenvector scaling (reference _tica.py:150-158; its TICA DEFAULT is
    // kinetic_map — ours is "none" so the C00-orthonormal sample
    // identities stay the q29 oracle contract; pass explicitly for parity):
    // kinetic_map scales by eigenvalues (kinetic-distance-preserving map,
    // Noe & Clementi 2015), commute_map by sqrt of half the regularized
    // timescales (Noe et al. 2016 section 2.5 damping).
    scaling match {
      case "kinetic_map" | "km" =>
        (0 until k).foreach(j => u(::, j) :*= vals(j))
      case "commute_map" =>
        (0 until k).foreach { j =>
          // NOTE: the reference's literal formula (_tica.py:152) is
          // `1. - lagtime / log|lambda|`, i.e. 1 + the usual implied
          // timescale -tau/log|lambda| — reproduced verbatim here for
          // output parity (bug-compatible by design; the regularizer then
          // dampens sub-lagtime values as in Noe et al. 2016 sec. 2.5).
          val ts = 1.0 - tau / math.log(math.abs(vals(j)))
          val reg = 0.5 * ts * math.max(math.tanh(math.Pi * ((ts - tau) / tau) + 1), 0.0)
          u(::, j) :*= math.sqrt(reg / 2.0)
        }
      case "none" | "" =>
      case other => throw new IllegalArgumentException(s"unknown scaling '$other'")
    }
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
                        dim: Int = -1, varCutoff: Double = -1.0,
                        scaling: String = "none"): KoopmanModel = {
    val d = cov.d
    val c00 = LinAlg.fromFlat(cov.cov00, d)
    val ctt = LinAlg.fromFlat(cov.covtt, d)
    val c0t = LinAlg.fromFlat(cov.cov0t, d)
    val l0 = LinAlg.spdInvSplit(c00, epsilon)   // d x k0
    val lt = LinAlg.spdInvSplit(ctt, epsilon)   // d x kt
    val w = l0.t * c0t * lt
    val (uw, s, vwT) = LinAlg.truncatedSvd(w)
    val kAll = s.length
    val k = if (dim > 0) math.min(dim, kAll)
            else if (varCutoff > 0 && varCutoff < 1.0)
              math.min(Dim.fromVarCutoff(Array.tabulate(kAll)(s(_)).toSeq, varCutoff), kAll)
            else kAll
    val uFull = l0 * uw(::, 0 until k)          // d x k singular functions
    val vFull = lt * vwT(0 until k, ::).t       // d x k timelagged functions
    // kinetic_map scaling (reference _vamp.py:188-190): both singular
    // function sets scaled by the singular values. Default "none" matches
    // the reference VAMP default.
    scaling match {
      case "kinetic_map" | "km" =>
        (0 until k).foreach { j => uFull(::, j) :*= s(j); vFull(::, j) :*= s(j) }
      case "none" | "" =>
      case other => throw new IllegalArgumentException(s"unknown scaling '$other'")
    }
    KoopmanModel(tau, cov.mean0, cov.meant,
      Array.tabulate(k)(s(_)), LinAlg.toFlat(uFull), d, k,
      vOpt = Some(LinAlg.toFlat(vFull)))
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
