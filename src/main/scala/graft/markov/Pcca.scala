package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum, inv}

/** PCCA+ fuzzy metastable coarse-graining (reference markov/_pcca.py:9-207,
  * dense impl markov/tools/analysis/dense/_pcca.py).
  *
  * Implementation: inner-simplex vertex selection on the leading
  * eigenvector subspace + linear membership construction (the classic
  * Deuflhard-Weber scheme; the optional refinement optimization of the
  * reference is not performed — memberships satisfy the same simplex
  * structure and are exact for well-separated metastable sets). */
object Pcca {

  case class PccaModel(
      memberships: DenseMatrix[Double],     // n x m fuzzy assignment
      coarseT: DenseMatrix[Double],         // m x m coarse transition matrix
      coarsePi: DenseVector[Double],        // m coarse stationary distribution
      assignments: Array[Int])              // crisp argmax per state

  def apply(msm: MarkovStateModel, m: Int): PccaModel = {
    val t = msm.transitionMatrix
    val n = t.rows
    require(m >= 2 && m <= n, s"need 2 <= m <= $n")
    val pi = msm.stationaryDistribution

    // reversible symmetrization trick: eig of D^{1/2} T D^{-1/2} is symmetric
    val sqrtPi = pi.map(math.sqrt)
    val sym = DenseMatrix.tabulate(n, n)((i, j) =>
      sqrtPi(i) * t(i, j) / math.max(sqrtPi(j), 1e-300))
    val es = breeze.linalg.eigSym((sym + sym.t) / 2.0)
    val order = (0 until n).sortBy(i => -es.eigenvalues(i))
    // right eigenvectors of T: psi_k = D^{-1/2} v_k; first column ~ constant 1
    val x = DenseMatrix.zeros[Double](n, m)
    for (k <- 0 until m) {
      val v = es.eigenvectors(::, order(k))
      for (i <- 0 until n) x(i, k) = v(i) / math.max(sqrtPi(i), 1e-300)
    }
    // normalize the first column to exactly 1 (it is constant in theory)
    val c0 = x(::, 0)
    val scale = bsum(c0) / n
    x(::, 0) := c0 / scale

    // inner simplex: pick m rows of x as vertices, maximally spread
    val vertices = new Array[Int](m)
    // first vertex: row with largest norm
    vertices(0) = (0 until n).maxBy(i => breeze.linalg.norm(x(i, ::).t))
    val work = x.copy
    for (k <- 1 until m) {
      val vRow = work(vertices(k - 1), ::).t.copy
      val nrm2 = vRow dot vRow
      if (nrm2 > 1e-300) {
        // deflate: remove component along previous vertex row
        for (i <- 0 until n) {
          val proj = (work(i, ::).t dot vRow) / nrm2
          work(i, ::) :-= (vRow * proj).t
        }
      }
      vertices(k) = (0 until n).maxBy(i => breeze.linalg.norm(work(i, ::).t))
    }

    // memberships chi = X * inv(X[vertices, :])
    val vx = DenseMatrix.tabulate(m, m)((a, b) => x(vertices(a), b))
    val chi = x * inv(vx)
    // clip negatives, renormalize rows to the probability simplex
    for (i <- 0 until n) {
      var s = 0.0
      for (k <- 0 until m) { if (chi(i, k) < 0) chi(i, k) = 0.0; s += chi(i, k) }
      if (s > 0) for (k <- 0 until m) chi(i, k) /= s
      else chi(i, ::) := DenseVector.fill(m)(1.0 / m).t
    }

    // coarse-grained quantities (pcca coarse T: (chi' diag(pi) chi)^-1 chi' diag(pi) T chi)
    val dPi = DenseMatrix.tabulate(n, n)((i, j) => if (i == j) pi(i) else 0.0)
    val w1 = chi.t * dPi * chi
    val coarseT = inv(w1) * (chi.t * dPi * t * chi)
    val coarsePi = chi.t * pi
    val assign = Array.tabulate(n)(i => (0 until m).maxBy(k => chi(i, k)))
    PccaModel(chi, coarseT, coarsePi / bsum(coarsePi), assign)
  }
}
