package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum, inv, norm}

/** PCCA+ fuzzy metastable coarse-graining with the full membership
  * refinement optimization (reference markov/_pcca.py:9-207; dense impl
  * markov/tools/analysis/dense/_pcca.py: `_pcca_connected_isa` inner
  * simplex, `_opt_soft` Roeblitz-Weber objective optimized derivative-free,
  * `_fill_matrix` feasibility reconstruction).
  *
  * Driver-side on the n x n model (n = state count). */
object Pcca {

  case class PccaModel(
      memberships: DenseMatrix[Double],     // n x m fuzzy assignment
      coarseT: DenseMatrix[Double],         // m x m coarse transition matrix
      coarsePi: DenseVector[Double],        // m coarse stationary distribution
      assignments: Array[Int],              // crisp argmax per state
      /** p(state | metastable) by Bayesian inversion of the memberships
        * (reference _pcca.py:54 `B = diag(1/pi_coarse) M' diag(pi)`,
        * row-renormalized; Noe et al. JCP 139, 184114 (2013)): row a is
        * the probability distribution over states given metastable set a
        * — the reference's `metastable_distributions` / HMM output
        * matrix. (m x n, rows sum to 1.) */
      metastableDistributions: DenseMatrix[Double])

  /** Inner-simplex algorithm (_pcca.py:14 `_pcca_connected_isa`): pick m
    * rows of the eigenvector matrix as simplex vertices — most outlying
    * point first, then repeated translate-deflate-argmax — and invert the
    * vertex submatrix. Returns (chi, rotation). */
  private[markov] def innerSimplex(c: DenseMatrix[Double], m: Int): (DenseMatrix[Double], DenseMatrix[Double]) = {
    val n = c.rows
    val ind = new Array[Int](m)
    ind(0) = (0 until n).maxBy(i => norm(c(i, ::).t))
    // translate so the first representative is the origin (reference line
    // `ortho_sys -= c[ind[0], None]`)
    val ortho = c.copy
    for (i <- 0 until n) ortho(i, ::) :-= c(ind(0), ::)
    for (k <- 1 until m) {
      var maxDist = 0.0
      val temp = ortho(ind(k - 1), ::).t.copy
      for (i <- 0 until n) {
        val row = ortho(i, ::).t
        val proj = temp dot row
        ortho(i, ::) :-= (temp * proj).t
        val d = norm(ortho(i, ::).t)
        if (d > maxDist && !ind.take(k).contains(i)) { maxDist = d; ind(k) = i }
      }
      val nk = norm(ortho(ind(k), ::).t)
      if (nk > 1e-300) ortho :/= nk
    }
    val rot = inv(DenseMatrix.tabulate(m, m)((a, b) => c(ind(a), b)))
    (c * rot, rot)
  }

  /** `_fill_matrix`: rebuild a feasible rotation matrix from its cropped
    * (m-1 x m-1) block — first column balances rows, first row makes all
    * memberships nonnegative, total normalized. */
  private[markov] def fillMatrix(crop: DenseMatrix[Double], evecs: DenseMatrix[Double]): DenseMatrix[Double] = {
    val x = crop.rows; val y = crop.cols
    val full = DenseMatrix.zeros[Double](x + 1, y + 1)
    for (i <- 0 until x) {
      val rowSum = bsum(crop(i, ::).t)
      full(i + 1, 0) = -rowSum
      for (j <- 0 until y) full(i + 1, j + 1) = crop(i, j)
    }
    // top row: column maxima of -evecs[:,1:] @ rot_crop_rows
    val n = evecs.rows
    for (j <- 0 to y) {
      var colMax = Double.NegativeInfinity
      for (r <- 0 until n) {
        var acc = 0.0
        for (i <- 0 until x) acc -= evecs(r, i + 1) * full(i + 1, j)
        if (acc > colMax) colMax = acc
      }
      full(0, j) = colMax
    }
    val z = bsum(full(0, ::).t)
    full / z
  }

  /** Roeblitz target: maximize sum_ij rot(j,i)^2 / rot(0,i) (returned
    * negated for minimization). */
  private def objective(cropVec: DenseVector[Double], evecs: DenseMatrix[Double],
                        m: Int): Double = {
    val crop = new DenseMatrix(m - 1, m - 1, cropVec.toArray.clone)
    val rot = fillMatrix(crop.t, evecs) // row-major reshape: transpose of col-major ctor
    var res = 0.0
    for (i <- 0 until m; j <- 0 until m) {
      val denom = rot(0, i)
      if (math.abs(denom) > 1e-300) res += rot(j, i) * rot(j, i) / denom
    }
    -res
  }

  /** Derivative-free Nelder-Mead (the reference optimizes with
    * scipy.optimize.fmin — same simplex method; standard coefficients). */
  private[markov] def nelderMead(f: DenseVector[Double] => Double, x0: DenseVector[Double],
                                 maxIter: Int): DenseVector[Double] = {
    val n = x0.length
    if (n == 0) return x0
    val alpha = 1.0; val gamma = 2.0; val rho = 0.5; val sigma = 0.5
    // initial simplex (scipy style: perturb each coordinate by 5%)
    val simplex = scala.collection.mutable.ArrayBuffer(x0.copy)
    for (i <- 0 until n) {
      val p = x0.copy
      if (p(i) != 0.0) p(i) *= 1.05 else p(i) = 0.00025
      simplex += p
    }
    val fvals = simplex.map(f).toBuffer
    var iter = 0
    while (iter < maxIter) {
      // order
      val order = fvals.indices.sortBy(fvals(_))
      val sorted = order.map(simplex(_)).toBuffer
      val sortedF = order.map(fvals(_)).toBuffer
      simplex.indices.foreach { i => simplex(i) = sorted(i); fvals(i) = sortedF(i) }
      // centroid of best n
      val centroid = DenseVector.zeros[Double](n)
      for (i <- 0 until n) centroid += simplex(i)
      centroid :/= n.toDouble
      val worst = simplex(n)
      val reflected = centroid + (centroid - worst) * alpha
      val fr = f(reflected)
      if (fr < fvals(0)) {
        val expanded = centroid + (centroid - worst) * gamma
        val fe = f(expanded)
        if (fe < fr) { simplex(n) = expanded; fvals(n) = fe }
        else { simplex(n) = reflected; fvals(n) = fr }
      } else if (fr < fvals(n - 1)) {
        simplex(n) = reflected; fvals(n) = fr
      } else {
        val contracted = centroid + (worst - centroid) * rho
        val fc = f(contracted)
        if (fc < fvals(n)) { simplex(n) = contracted; fvals(n) = fc }
        else {
          // shrink toward best
          for (i <- 1 to n) {
            simplex(i) = simplex(0) + (simplex(i) - simplex(0)) * sigma
            fvals(i) = f(simplex(i))
          }
        }
      }
      iter += 1
      // convergence: function spread
      if (math.abs(fvals(n) - fvals(0)) < 1e-10 * (math.abs(fvals(0)) + 1e-10)) iter = maxIter
    }
    simplex(fvals.indices.minBy(fvals(_)))
  }

  /** `_opt_soft`: optimize the cropped rotation block, then refill. */
  private[markov] def optSoft(evecs: DenseMatrix[Double], rot0: DenseMatrix[Double],
                              m: Int): DenseMatrix[Double] = {
    if (m <= 1) return rot0
    val crop = rot0(1 until m, 1 until m).copy
    // row-major flatten to match the objective's reshape
    val x0 = DenseVector(crop.t.toArray.clone)
    val xOpt = nelderMead(objective(_, evecs, m), x0, maxIter = 200 * x0.length)
    val cropOpt = new DenseMatrix(m - 1, m - 1, xOpt.toArray).t
    fillMatrix(cropOpt, evecs)
  }

  def apply(msm: MarkovStateModel, m: Int): PccaModel =
    fromTransitionMatrix(msm.transitionMatrix, msm.stationaryDistribution, m)

  /** Same as `apply` but with an explicitly supplied stationary vector —
    * for disconnected models whose π comes from the count-weighted
    * estimator (`TransitionRepair.stationaryDistributionDisconnected`)
    * rather than the leading eigenvector (reference metastable_from_msm
    * builds `MarkovStateModel(P, stationary_distribution=pi)`). */
  def fromTransitionMatrix(t: DenseMatrix[Double], pi: DenseVector[Double],
                           m: Int): PccaModel = {
    val n = t.rows
    require(m >= 2 && m <= n, s"need 2 <= m <= $n")

    // pi-orthonormal right eigenvectors via the reversible symmetrization
    // (dense/_pcca.py:253-262: evec /= sqrt(<evec*pi, evec>), first positive)
    val sqrtPi = pi.map(v => math.sqrt(math.max(v, 1e-300)))
    val sym = DenseMatrix.tabulate(n, n)((i, j) => sqrtPi(i) * t(i, j) / sqrtPi(j))
    val es = breeze.linalg.eigSym((sym + sym.t) / 2.0)
    val order = (0 until n).sortBy(i => -es.eigenvalues(i))
    val evecs = DenseMatrix.zeros[Double](n, m)
    for (k <- 0 until m) {
      val v = es.eigenvectors(::, order(k))
      for (i <- 0 until n) evecs(i, k) = v(i) / sqrtPi(i)
      // pi-normalize
      val nrm = math.sqrt((0 until n).map(i => evecs(i, k) * evecs(i, k) * pi(i)).sum)
      if (nrm > 1e-300) evecs(::, k) :/= nrm
    }
    // first eigenvector positive (it is pi-constant)
    if (evecs(0, 0) < 0) evecs(::, 0) :*= -1.0
    for (i <- 0 until n) evecs(i, 0) = math.abs(evecs(i, 0))

    fromEigenvectors(pi, evecs, m, chi => t * chi)
  }

  /** PCCA+ core from pi-orthonormalized right eigenvectors (n x m, first
    * column the positive constant) plus a T*chi evaluator: the ISA +
    * opt_soft + coarse-graining never touch T itself, only m
    * matrix-vector products — which lets sparse large-n models
    * coarse-grain without a dense n^2 transition matrix (the dense
    * `apply` above delegates here with `t * chi`). */
  def fromEigenvectors(pi: DenseVector[Double], evecs: DenseMatrix[Double],
                       m: Int,
                       applyT: DenseMatrix[Double] => DenseMatrix[Double]): PccaModel = {
    val n = evecs.rows
    // ISA initial guess + refinement optimization
    val (_, rot0) = innerSimplex(evecs, m)
    val rotOpt = optSoft(evecs, rot0, m)
    val chi = evecs * rotOpt
    // clip to [0,1] and renormalize rows (reference final step)
    for (i <- 0 until n) {
      var s = 0.0
      for (k <- 0 until m) {
        if (chi(i, k) < 0) chi(i, k) = 0.0
        if (chi(i, k) > 1) chi(i, k) = 1.0
        s += chi(i, k)
      }
      if (s > 0) chi(i, ::) :/= s
      else chi(i, ::) := DenseVector.fill(m)(1.0 / m).t
    }

    // coarse-grained quantities: (chi' diag(pi) chi)^-1 chi' diag(pi) T chi
    // — all O(n m^2) given T*chi, no n x n intermediate
    val piChi = DenseMatrix.tabulate(n, m)((i, k) => pi(i) * chi(i, k))
    val w1 = piChi.t * chi
    val tChi = applyT(chi)
    val coarseT = inv(w1) * (piChi.t * tChi)
    val coarsePi = chi.t * pi
    val assign = Array.tabulate(n)(i => (0 until m).maxBy(k => chi(i, k)))
    // Bayesian inversion p(state|metastable): B(a, i) ∝ chi(i, a) pi(i),
    // rows renormalized (_pcca.py:54-56)
    val dists = DenseMatrix.tabulate(m, n)((a, i) => chi(i, a) * pi(i))
    for (a <- 0 until m) {
      val s = bsum(dists(a, ::).t)
      if (s > 0) dists(a, ::) :/= s
    }
    PccaModel(chi, coarseT, coarsePi / bsum(coarsePi), assign, dists)
  }
}
