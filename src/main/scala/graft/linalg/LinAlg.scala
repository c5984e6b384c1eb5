package graft.linalg

import breeze.linalg.{DenseMatrix, DenseVector, eig, eigSym, svd, inv, sum => bsum}

/** Driver-side numerics, parity with reference numeric/_eigen.py.
  * All inputs here are O(n^2) model-sized matrices (n = features/states),
  * never data-sized — the distributed jobs of graft.agg / graft.markov
  * produce them. */
object LinAlg {

  def fromFlat(a: Array[Double], d: Int): DenseMatrix[Double] = {
    // row-major flat -> Breeze (column-major ctor, so fill explicitly)
    val m = DenseMatrix.zeros[Double](d, d)
    var i = 0
    while (i < d) { var j = 0; while (j < d) { m(i, j) = a(i * d + j); j += 1 }; i += 1 }
    m
  }

  def toFlat(m: DenseMatrix[Double]): Array[Double] = {
    val a = new Array[Double](m.rows * m.cols)
    var i = 0
    while (i < m.rows) { var j = 0; while (j < m.cols) { a(i * m.cols + j) = m(i, j); j += 1 } ; i += 1 }
    a
  }

  /** Sort eigenpairs by eigenvalue descending (numeric/_eigen.py:13-38
    * `sort_eigs`; magnitude ordering for possibly-negative spectra). */
  def sortEigs(vals: DenseVector[Double], vecs: DenseMatrix[Double],
               byMagnitude: Boolean = false): (DenseVector[Double], DenseMatrix[Double]) = {
    val idx = (0 until vals.length).sortBy(i =>
      if (byMagnitude) -math.abs(vals(i)) else -vals(i))
    val sv = DenseVector(idx.map(vals(_)).toArray)
    val sm = DenseMatrix.zeros[Double](vecs.rows, vecs.cols)
    idx.zipWithIndex.foreach { case (src, dst) => sm(::, dst) := vecs(::, src) }
    (sv, sm)
  }

  /** Symmetrize (numerical hygiene before eigSym). */
  def sym(m: DenseMatrix[Double]): DenseMatrix[Double] = (m + m.t) / 2.0

  /** Regularized eigendecomposition of an SPD matrix: keep eigenpairs with
    * eigenvalue > epsilon * max (numeric/_eigen.py:39-130 `spd_eig`).
    * Returns (values desc, vectors as columns). */
  def spdEig(m: DenseMatrix[Double], epsilon: Double = 1e-10): (DenseVector[Double], DenseMatrix[Double]) = {
    val es = eigSym(sym(m))
    val (v, u) = sortEigs(es.eigenvalues, es.eigenvectors)
    val cutoff = epsilon * math.max(math.abs(v(0)), math.abs(v(v.length - 1)))
    val k = (0 until v.length).count(i => v(i) > cutoff)
    (v(0 until k).copy, u(::, 0 until k).copy)
  }

  /** spd_inv_sqrt: M^{-1/2} via regularized eig (numeric/_eigen.py:205). */
  def spdInvSqrt(m: DenseMatrix[Double], epsilon: Double = 1e-10): DenseMatrix[Double] = {
    val (v, u) = spdEig(m, epsilon)
    val dinv = DenseMatrix.zeros[Double](v.length, v.length)
    (0 until v.length).foreach(i => dinv(i, i) = 1.0 / math.sqrt(v(i)))
    u * dinv * u.t
  }

  /** spd_inv_split: L with L L^T = M^{-1} (numeric/_eigen.py:240); returns
    * (d x k) with k = retained rank — the whitening factor used by VAMP. */
  def spdInvSplit(m: DenseMatrix[Double], epsilon: Double = 1e-10): DenseMatrix[Double] = {
    val (v, u) = spdEig(m, epsilon)
    val l = DenseMatrix.zeros[Double](m.rows, v.length)
    var j = 0
    while (j < v.length) {
      val s = 1.0 / math.sqrt(v(j))
      var i = 0
      while (i < m.rows) { l(i, j) = u(i, j) * s; i += 1 }
      j += 1
    }
    l
  }

  /** Generalized symmetric eigenproblem C0 v = lambda Ct v via whitening —
    * the TICA core (numeric/_eigen.py:316-391 `eig_corr`).
    * Returns (eigenvalues desc, eigenvectors as columns of the ORIGINAL
    * problem, i.e. R with C0 R Lambda = Ct R). */
  def eigCorr(c0: DenseMatrix[Double], ct: DenseMatrix[Double],
              epsilon: Double = 1e-10): (DenseVector[Double], DenseMatrix[Double]) = {
    val l = spdInvSplit(c0, epsilon)        // d x k
    val mSym = sym(l.t * sym(ct) * l)       // k x k
    val es = eigSym(mSym)
    val (v, w) = sortEigs(es.eigenvalues, es.eigenvectors)
    val r = l * w                           // back-transform
    (v, r)
  }

  /** Truncated SVD with rank cut at epsilon * sigma_max
    * (decomposition/_vamp.py:169-194 behavior). Returns (U, s, Vt) with k
    * retained columns/rows. */
  def truncatedSvd(m: DenseMatrix[Double], epsilon: Double = 1e-12): (DenseMatrix[Double], DenseVector[Double], DenseMatrix[Double]) = {
    val s = svd(m)
    val smax = if (s.singularValues.length > 0) s.singularValues(0) else 0.0
    val k = (0 until s.singularValues.length).count(i => s.singularValues(i) > epsilon * smax)
    (s.leftVectors(::, 0 until k).copy,
      s.singularValues(0 until k).copy,
      s.rightVectors(0 until k, ::).copy)
  }

  /** Left Perron eigenvector (stationary distribution) of a row-stochastic
    * matrix (markov/tools/analysis/_stationary_vector.py). Dense eig on T^t,
    * eigenvalue nearest 1, made positive + normalized. */
  def stationaryDistribution(t: DenseMatrix[Double]): DenseVector[Double] = {
    val e = eig(t.t)
    val n = t.rows
    var best = 0
    var bestDist = Double.MaxValue
    for (i <- 0 until n) {
      val dist = math.hypot(e.eigenvalues(i) - 1.0, e.eigenvaluesComplex(i))
      if (dist < bestDist) { bestDist = dist; best = i }
    }
    var v = e.eigenvectors(::, best).copy
    val s = bsum(v)
    if (s < 0) v = -v
    v := v / bsum(v)
    // clamp tiny negatives from roundoff
    (0 until n).foreach(i => if (v(i) < 0 && v(i) > -1e-12) v(i) = 0.0)
    v / bsum(v)
  }

  /** Implied timescales -tau/ln|lambda_i| with Inf at |lambda| ~ 1
    * (markov/tools/analysis/_decomposition.py:478
    * `timescales_from_eigenvalues`; the reference treats |lambda| within
    * atol=1e-14 of 1 as infinite). */
  def timescales(eigenvalues: Seq[Double], tau: Double): Seq[Double] =
    eigenvalues.map { l =>
      val a = math.abs(l)
      if (a >= 1.0 - 1e-14) Double.PositiveInfinity
      else if (a <= 0.0) 0.0
      else -tau / math.log(a)
    }

  def matInv(m: DenseMatrix[Double]): DenseMatrix[Double] = inv(m)

  /** Schatten p-norm (reference numeric/_utils.py `schatten_norm`):
    * (sum_i sigma_i^p)^(1/p) over the singular values. */
  def schattenNorm(m: DenseMatrix[Double], p: Double): Double = {
    require(p >= 1.0, "schatten norm requires p >= 1")
    val s = breeze.linalg.svd(m).singularValues
    math.pow((0 until s.length).map(i => math.pow(s(i), p)).sum, 1.0 / p)
  }

  /** Matrix predicates (reference numeric/_utils.py is_square_matrix,
    * is_diagonal_matrix, is_sorted). */
  def isSquare(m: DenseMatrix[Double]): Boolean = m.rows == m.cols
  def isDiagonal(m: DenseMatrix[Double], tol: Double = 0.0): Boolean =
    (0 until m.rows).forall(i => (0 until m.cols)
      .forall(j => i == j || math.abs(m(i, j)) <= tol))
  def isSorted(xs: Seq[Double], descending: Boolean = false): Boolean =
    if (descending) xs.zip(xs.drop(1)).forall { case (a, b) => a >= b }
    else xs.zip(xs.drop(1)).forall { case (a, b) => a <= b }

  /** Neumaier-compensated (improved Kahan) sum / dot (reference numeric
    * kahan.h ksum/kdot — the float64 long-sum policy; the distributed
    * moments path has its own in-aggregator compensation, this is the
    * driver-side counterpart). Neumaier keeps the correction when a large
    * term later cancels, which plain Kahan loses. */
  def ksum(xs: Array[Double]): Double = {
    var s = 0.0; var c = 0.0; var i = 0
    while (i < xs.length) {
      val x = xs(i)
      val t = s + x
      c += (if (math.abs(s) >= math.abs(x)) (s - t) + x else (x - t) + s)
      s = t
      i += 1
    }
    s + c
  }
  def kdot(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, "kdot length mismatch")
    var s = 0.0; var c = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i) * b(i)
      val t = s + x
      c += (if (math.abs(s) >= math.abs(x)) (s - t) + x else (x - t) + s)
      s = t
      i += 1
    }
    s + c
  }

  /** Numerically-stable log(exp(a) + exp(b)) and log-sum-exp (reference
    * numeric logsumexp surface; TRAM keeps a private fused copy). */
  def logsumexpPair(a: Double, b: Double): Double = {
    if (a.isNegInfinity) return b
    if (b.isNegInfinity) return a
    val m = math.max(a, b)
    m + math.log1p(math.exp(math.min(a, b) - m))
  }
  def logsumexp(xs: Array[Double]): Double = {
    if (xs.isEmpty) return Double.NegativeInfinity
    val m = xs.max
    if (m.isNegInfinity) return Double.NegativeInfinity
    var s = 0.0; var i = 0
    while (i < xs.length) { s += math.exp(xs(i) - m); i += 1 }
    m + math.log(s)
  }
}
