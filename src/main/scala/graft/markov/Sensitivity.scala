package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.linalg.LinAlg

/** Sensitivity matrices of MSM-derived quantities w.r.t. transition-matrix
  * entries (reference markov/tools/analysis/dense/_sensitivity.py:13-400).
  * Driver-side, n x n. Reversibility is not assumed. */
object Sensitivity {

  /** dS lambda_k / dT: outer(l_k, r_k) from the bi-orthogonal eigenbasis
    * (_sensitivity.py:136). Real spectrum assumed (reversible chains). */
  def eigenvalueSensitivity(t: DenseMatrix[Double], k: Int): DenseMatrix[Double] = {
    val e = breeze.linalg.eig(t)
    val perm = (0 until t.rows).sortBy(i => -e.eigenvalues(i))
    val right = DenseMatrix.zeros[Double](t.rows, t.rows)
    perm.zipWithIndex.foreach { case (src, dst) => right(::, dst) := e.eigenvectors(::, src) }
    val left = breeze.linalg.inv(right)
    DenseMatrix.tabulate(t.rows, t.rows)((i, j) => left(k, i) * right(j, k))
  }

  /** dt_k / dT via the chain rule t_k = -tau / ln lambda_k
    * (_sensitivity.py:165). */
  def timescaleSensitivity(t: DenseMatrix[Double], k: Int, tau: Double = 1.0): DenseMatrix[Double] = {
    val e = breeze.linalg.eig(t)
    val perm = (0 until t.rows).sortBy(i => -e.eigenvalues(i))
    val lam = e.eigenvalues(perm(k))
    val factor = tau / (lam * math.log(lam) * math.log(lam))
    eigenvalueSensitivity(t, k) * factor
  }

  /** d q+_index / dT (_sensitivity.py:13 `forward_committor_sensitivity`). */
  def forwardCommittorSensitivity(t: DenseMatrix[Double], a: Set[Int], b: Set[Int],
                                  index: Int): DenseMatrix[Double] = {
    val n = t.rows
    val notAB = (0 until n).filterNot(s => a.contains(s) || b.contains(s)).toArray
    val m = notAB.length
    val k = t - DenseMatrix.eye[Double](n)
    val u = DenseMatrix.tabulate(m, m)((i, j) => k(notAB(i), notAB(j)))
    val v = DenseVector.tabulate(m)(i => -b.toSeq.map(s => k(notAB(i), s)).sum)
    val qI = u \ v
    val qForward = DenseVector.zeros[Double](n)
    b.foreach(s => qForward(s) = 1.0)
    notAB.zipWithIndex.foreach { case (s, i) => qForward(s) = qI(i) }
    val target = DenseVector.tabulate(m)(i => if (notAB(i) == index) 1.0 else 0.0)
    val uinv = u.t \ target
    val out = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until m; j <- 0 until n) out(notAB(i), j) = -uinv(i) * qForward(j)
    out
  }

  /** d (v_k)_j / dT for the k-th right (or left) eigenvector
    * (_sensitivity.py:212 `eigenvector_sensitivity`): adjoint least-squares
    * solve of (T - lambda_k I)^T phi = e_j with the orthogonality-to-v_k
    * condition appended; sensitivity = -phi v_k^T + (phi.v_k) l_k v_k^T.
    * Normalization contract matches the reference: unit-norm eigenvectors
    * (LAPACK dgeev convention), NOT the rdl scaling — so do not use this
    * for the stationary distribution (use
    * stationaryDistributionSensitivity). Real spectrum assumed. */
  def eigenvectorSensitivity(t0: DenseMatrix[Double], k: Int, j: Int,
                             right: Boolean = true): DenseMatrix[Double] = {
    val n = t0.rows
    val t = if (right) t0 else t0.t
    val e = breeze.linalg.eig(t)
    val perm = (0 until n).sortBy(i => -e.eigenvalues(i))
    val rightM = DenseMatrix.zeros[Double](n, n)
    perm.zipWithIndex.foreach { case (src, dst) => rightM(::, dst) := e.eigenvectors(::, src) }
    val leftM = breeze.linalg.inv(rightM)
    val rEV = rightM(::, k)
    val lEV = leftM(k, ::).t
    val eVal = e.eigenvalues(perm(k))
    // matA = [T - lambda I; rEV'] (n+1 x n); least-squares matA' phi = e_j
    val matA = DenseMatrix.zeros[Double](n + 1, n)
    for (i <- 0 until n; c <- 0 until n)
      matA(i, c) = t(i, c) - (if (i == c) eVal else 0.0)
    for (c <- 0 until n) matA(n, c) = rEV(c)
    val vecA = DenseVector.zeros[Double](n)
    vecA(j) = 1.0
    val phiFull = matA.t \ vecA
    val phi = phiFull(0 until n)
    val dot = phi dot rEV
    val s = DenseMatrix.tabulate(n, n)((i, c) =>
      -phi(i) * rEV(c) + dot * lEV(i) * rEV(c))
    if (right) s else s.t
  }

  /** d pi_j / dT (_sensitivity.py:280): adjoint solve with the
    * normalization row appended. */
  def stationaryDistributionSensitivity(t: DenseMatrix[Double], j: Int): DenseMatrix[Double] = {
    val n = t.rows
    val rEV = LinAlg.stationaryDistribution(t)
    val tT = t.t
    // matA = [T' - I; 1'] (n+1 x n); solve matA' phi' = e_j in least squares
    val matA = DenseMatrix.zeros[Double](n + 1, n)
    for (i <- 0 until n; c <- 0 until n)
      matA(i, c) = tT(i, c) - (if (i == c) 1.0 else 0.0)
    for (c <- 0 until n) matA(n, c) = 1.0
    val vecA = DenseVector.zeros[Double](n)
    vecA(j) = 1.0
    // least squares: matA.t (n x n+1), phi in R^{n+1}
    val phiFull = matA.t \ vecA
    val phi = phiFull(0 until n)
    val dot = phi dot rEV
    DenseMatrix.tabulate(n, n)((i, c) =>
      -rEV(i) * phi(c) + dot * rEV(i))
  }

  /** d mfpt_j / dT (_sensitivity.py:325). */
  def mfptSensitivity(t: DenseMatrix[Double], target: Int, j: Int): DenseMatrix[Double] = {
    val n = t.rows
    val matA = t - DenseMatrix.eye[Double](n)
    for (c <- 0 until n) matA(target, c) = 0.0
    matA(target, target) = 1.0
    val tVec = DenseVector.fill(n)(-1.0)
    tVec(target) = 0.0
    val mfpt = matA \ tVec
    val aVec = DenseVector.zeros[Double](n)
    aVec(j) = 1.0
    val phi = matA.t \ aVec
    val out = DenseMatrix.tabulate(n, n)((i, c) => -phi(i) * mfpt(c))
    for (c <- 0 until n) out(target, c) = 0.0
    out
  }

  /** d E_pi[a] / dT (_sensitivity.py:366). */
  def expectationSensitivity(t: DenseMatrix[Double], a: DenseVector[Double]): DenseMatrix[Double] = {
    val n = t.rows
    var s = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n if a(i) != 0.0)
      s = s + stationaryDistributionSensitivity(t, i) * a(i)
    s
  }
}
