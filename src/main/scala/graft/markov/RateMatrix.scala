package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, sum => bsum}
import breeze.optimize.{DiffFunction, LBFGSB}

/** Reversible rate-matrix (continuous-time generator) estimation from a
  * transition-count matrix, matching the estimator family of the reference
  * (markov/tools/estimation/dense/ratematrix.py; api estimation/api.py:1239):
  *
  *  - `pseudo`:        K = (T - I)/dt with T the reversible MLE;
  *  - `truncated_log`: see MsmAnalysis.logGenerator;
  *  - `CVE`  (Crommelin & Vanden-Eijnden, Multiscale Model. Sim. 7(4), 2009):
  *    minimize sum_ij (Uinv K U - L)_ij^2 |lam_i||lam_j| over reversible K,
  *    where (lam, U) is the eigensystem of the MLE transition matrix and
  *    L = diag(log|lam|)/dt;
  *  - `KL` (Kalbfleisch & Lawless, J. Am. Stat. Assoc. 80(392), 1985):
  *    maximize the exact likelihood sum_ij C_ij log (e^{K dt})_ij.
  *
  * All driver-side Breeze on the model-sized (n x n) count matrix — the
  * distributed part of a rate-matrix fit is the count matrix itself
  * (TransitionCounting). The bound-constrained quasi-Newton step uses
  * breeze.optimize.LBFGSB, the analog of the reference's fmin_l_bfgs_b.
  *
  * Reversible parametrization (ratematrix.py `_ReversibleRateMatrixEstimator`):
  * free parameters theta_n = pi_i K_ij over index pairs i<j, so
  * K_ij = theta_n/pi_i, K_ji = theta_n/pi_j (detailed balance is structural),
  * diagonal = -rowsum, and theta >= lower bound >= 0 keeps K a generator.
  */
object RateMatrix {

  /** Eigendecomposition of a pi-reversible matrix M via the symmetrization
    * Msym = diag(sqrt pi) M diag(1/sqrt pi): real eigenvalues, A = right
    * eigenvectors, Ainv = left, M = A diag(lam) Ainv. */
  def eigRev(m: DenseMatrix[Double], pi: DenseVector[Double])
      : (DenseVector[Double], DenseMatrix[Double], DenseMatrix[Double]) = {
    val n = m.rows
    val sq = DenseVector.tabulate(n)(i => math.sqrt(pi(i)))
    val msym = DenseMatrix.tabulate(n, n)((i, j) => sq(i) * m(i, j) / sq(j))
    // enforce exact symmetry against FP asymmetry before eigSym
    val msymS = (msym + msym.t) / 2.0
    val es = eigSym(msymS)
    val lam = es.eigenvalues
    val b = es.eigenvectors
    val a = DenseMatrix.tabulate(n, n)((i, j) => b(i, j) / sq(i))
    val ainv = DenseMatrix.tabulate(n, n)((i, j) => b(j, i) * sq(j))
    (lam, a, ainv)
  }

  /** e^{t M} for a pi-reversible M via the eigendecomposition. */
  def expmRev(m: DenseMatrix[Double], pi: DenseVector[Double], t: Double): DenseMatrix[Double] = {
    val (lam, a, ainv) = eigRev(m, pi)
    val n = m.rows
    val e = DenseVector.tabulate(n)(i => math.exp(t * lam(i)))
    DenseMatrix.tabulate(n, n) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < n) { s += a(i, k) * e(k) * ainv(k, j); k += 1 }
      s
    }
  }

  /** (e^x - 1)/x, continuous at 0. */
  private def exprel(x: Double): Double =
    if (x == 0.0) 1.0 else math.expm1(x) / x

  /** Divided-difference matrix of the exponential (ratematrix.py getV):
    * V_ij = (e^{tau lam_i} - e^{tau lam_j})/(lam_i - lam_j) in exprel form. */
  private def getV(lam: DenseVector[Double], tau: Double): DenseMatrix[Double] = {
    val n = lam.length
    DenseMatrix.tabulate(n, n) { (i, j) =>
      val delta = tau * (lam(j) - lam(i))
      if (delta < 0) tau * math.exp(tau * lam(i)) * exprel(delta)
      else tau * math.exp(tau * lam(j)) * exprel(-delta)
    }
  }

  /** Free-parameter index pairs (i<j) and lower bounds. With a sparsity
    * pattern only pairs with sparsity_ij + sparsity_ji > 0 are free, and
    * their rates are bounded below by 1/(t_agg (1/pi_i + 1/pi_j)) —
    * the reference's minimal-observable-rate prior. */
  private def freePairs(n: Int, sparsity: Option[DenseMatrix[Double]],
                        pi: DenseVector[Double], tAgg: Double)
      : (Array[Int], Array[Int], DenseVector[Double]) = {
    sparsity match {
      case None =>
        val idx = for (i <- 0 until n; j <- i + 1 until n) yield (i, j)
        (idx.map(_._1).toArray, idx.map(_._2).toArray,
          DenseVector.zeros[Double](idx.length))
      case Some(sp) =>
        val idx = for (i <- 0 until n; j <- i + 1 until n
                       if sp(i, j) + sp(j, i) > 0) yield (i, j)
        val lb = DenseVector.tabulate(idx.length) { nn =>
          val (i, j) = idx(nn)
          1.0 / (tAgg * (1.0 / pi(i) + 1.0 / pi(j)))
        }
        (idx.map(_._1).toArray, idx.map(_._2).toArray, lb)
    }
  }

  private def buildK(theta: DenseVector[Double], is: Array[Int], js: Array[Int],
                     pi: DenseVector[Double], n: Int): DenseMatrix[Double] = {
    val k = DenseMatrix.zeros[Double](n, n)
    var m = 0
    while (m < is.length) {
      k(is(m), js(m)) = theta(m) / pi(is(m))
      k(js(m), is(m)) = theta(m) / pi(js(m))
      m += 1
    }
    for (i <- 0 until n) k(i, i) = -bsum(k(i, ::).t) + k(i, i)
    k
  }

  private def minimize(f: DiffFunction[DenseVector[Double]],
                       x0: DenseVector[Double], lb: DenseVector[Double],
                       tol: Double, maxIter: Int): DenseVector[Double] = {
    // finite generous upper bound: LBFGSB probes the bound corner, and an
    // unbounded (MaxValue) theta overflows theta/pi to Inf -> NaN matrices
    val ub = DenseVector.fill(x0.length)(1e12)
    // NaN-iterate guard: a degenerate line-search step must read as
    // "infinitely bad", not poison the eigendecomposition downstream
    val guarded = new DiffFunction[DenseVector[Double]] {
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        if ((0 until x.length).exists(i => x(i).isNaN))
          (Double.PositiveInfinity, DenseVector.zeros[Double](x.length))
        else f.calculate(x)
      }
    }
    // factr-style tol (reference fmin_l_bfgs_b): relative f tolerance,
    // floored — driving breeze's LBFGSB below ~1e-9 relative produces
    // degenerate zoom steps without measurable gain
    val solver = new LBFGSB(lb, ub, maxIter = math.min(maxIter, 10000), m = 10,
      tolerance = math.max(tol * 2.220446049250313e-16, 1e-9))
    solver.minimize(guarded, x0)
  }

  /** CVE: spectral-matching objective on the eigenbasis of the MLE
    * transition matrix `t` (reversible wrt `pi`). */
  def cve(t: DenseMatrix[Double], k0: DenseMatrix[Double], pi: DenseVector[Double],
          dt: Double = 1.0, sparsity: Option[DenseMatrix[Double]] = None,
          tAgg: Double = -1.0, tol: Double = 1e7, maxIter: Int = 100000): DenseMatrix[Double] = {
    val n = t.rows
    val (is, js, lb) = freePairs(n, sparsity, pi, tAgg)
    val (lam, u, uinv) = eigRev(t, pi)
    require((0 until n).forall(i => math.abs(lam(i)) > 0.0),
      "T has exactly-zero eigenvalues; cannot run CVE")
    val c = DenseVector.tabulate(n)(i => math.abs(lam(i)))
    val lDiag = DenseVector.tabulate(n)(i => math.log(math.abs(lam(i))) / dt)

    val obj = new DiffFunction[DenseVector[Double]] {
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val k = buildK(x, is, js, pi, n)
        val delta = (uinv * k * u) - breeze.linalg.diag(lDiag)
        var f = 0.0
        for (i <- 0 until n; j <- 0 until n) f += c(i) * delta(i, j) * delta(i, j) * c(j)
        // d f / d K = Uinv^T X U^T with X_ij = 2 c_i delta_ij c_j
        val xm = DenseMatrix.tabulate(n, n)((i, j) => 2.0 * c(i) * delta(i, j) * c(j))
        val y = (u * xm.t * uinv).t
        val grad = DenseVector.tabulate(x.length) { m =>
          val i = is(m); val j = js(m)
          y(i, j) / pi(i) + y(j, i) / pi(j) - y(i, i) / pi(i) - y(j, j) / pi(j)
        }
        (f, grad)
      }
    }
    val theta0 = DenseVector.tabulate(is.length) { m =>
      math.max(pi(is(m)) * k0(is(m), js(m)), lb(m))
    }
    buildK(minimize(obj, theta0, lb, tol, maxIter), is, js, pi, n)
  }

  /** KL: exact-likelihood estimator sum_ij C_ij log (e^{K dt})_ij. */
  def kl(cMat: DenseMatrix[Double], k0: DenseMatrix[Double], pi: DenseVector[Double],
         dt: Double = 1.0, sparsity: Option[DenseMatrix[Double]] = None,
         tAgg: Double = -1.0, tol: Double = 1e7, maxIter: Int = 100000): DenseMatrix[Double] = {
    val n = cMat.rows
    val (is, js, lb) = freePairs(n, sparsity, pi, tAgg)

    val obj = new DiffFunction[DenseVector[Double]] {
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val k = buildK(x, is, js, pi, n)
        val (lam, a, ainv) = eigRev(k, pi)
        val expl = DenseVector.tabulate(n)(i => math.exp(dt * lam(i)))
        val t = DenseMatrix.tabulate(n, n) { (i, j) =>
          var s = 0.0; var m = 0
          while (m < n) { s += a(i, m) * expl(m) * ainv(m, j); m += 1 }
          s
        }
        // dummy value where C = 0 (those terms don't enter f; avoids /0),
        // floor where C != 0 (connectivity loss during iteration)
        for (i <- 0 until n; j <- 0 until n) {
          if (cMat(i, j) == 0.0) t(i, j) = 1.0
          else if (t(i, j) <= 1e-20) t(i, j) = 1e-20
        }
        var f = 0.0
        for (i <- 0 until n; j <- 0 until n)
          if (cMat(i, j) != 0.0) f += cMat(i, j) * math.log(t(i, j))
        // gradient via the exponential's divided differences:
        // H = A ((Ainv (C^T / T^T) A) o V^T) Ainv; dK entries contract H^T
        val v = getV(lam, dt)
        val ct = DenseMatrix.tabulate(n, n)((i, j) => cMat(j, i) / t(j, i))
        val mMat = (ainv * ct * a) *:* v.t
        val h = a * mMat * ainv
        val grad = DenseVector.tabulate(x.length) { m =>
          val i = is(m); val j = js(m)
          h(j, i) / pi(i) + h(i, j) / pi(j) - h(i, i) / pi(i) - h(j, j) / pi(j)
        }
        (-f, -grad)
      }
    }
    val theta0 = DenseVector.tabulate(is.length) { m =>
      math.max(pi(is(m)) * k0(is(m), js(m)), lb(m))
    }
    buildK(minimize(obj, theta0, lb, tol, maxIter), is, js, pi, n)
  }

  /** Dispatcher mirroring estimation/api.py `rate_matrix`: methods chain
    * pseudo -> CVE -> KL, each initializing the next. `tAgg` defaults to
    * dt * total counts. */
  def estimate(counts: DenseMatrix[Double], dt: Double = 1.0, method: String = "KL",
               sparsity: Option[DenseMatrix[Double]] = None, tAgg: Double = -1.0,
               piOpt: Option[DenseVector[Double]] = None, tol: Double = 1e7,
               k0: Option[DenseMatrix[Double]] = None,
               maxIter: Int = 100000): DenseMatrix[Double] = {
    val n = counts.rows
    val agg = if (tAgg > 0) tAgg else dt * bsum(counts)
    method match {
      case "truncated_log" =>
        val t = TransitionMatrixMle.reversible(counts)
        MsmAnalysis.logGenerator(t, dt)
      case "pseudo" | "CVE" | "KL" =>
        val t = piOpt match {
          case Some(p) => MsmAnalysis.reversibleMleFixedPi(counts, p)
          case None => TransitionMatrixMle.reversible(counts)
        }
        val pi = piOpt.getOrElse(graft.linalg.LinAlg.stationaryDistribution(t))
        val kPseudo = (t - DenseMatrix.eye[Double](n)) / dt
        if (method == "pseudo") kPseudo
        else {
          val kInit = k0.getOrElse(kPseudo)
          if (method == "CVE")
            cve(t, kInit, pi, dt, sparsity, agg, tol, maxIter)
          else {
            val kStart = k0.getOrElse(cve(t, kPseudo, pi, dt, sparsity, agg, tol, maxIter))
            kl(counts, kStart, pi, dt, sparsity, agg, tol, maxIter)
          }
        }
      case other =>
        throw new IllegalArgumentException(
          s"method must be one of KL, CVE, pseudo, truncated_log; got $other")
    }
  }

  /** Generator validity predicate (markov/tools/analysis/_api.py
    * `is_rate_matrix`): nonnegative off-diagonals, rows sum to zero. */
  def isRateMatrix(k: DenseMatrix[Double], tol: Double = 1e-12): Boolean = {
    val n = k.rows
    n == k.cols &&
      (0 until n).forall { i =>
        math.abs(bsum(k(i, ::).t)) <= tol * n &&
          (0 until n).forall(j => i == j || k(i, j) >= -tol)
      }
  }
}
