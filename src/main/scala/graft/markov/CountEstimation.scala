package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum}

/** Count-matrix priors, likelihood, and Dirichlet error propagation.
  *
  * Reference: src/deeptime/markov/tools/estimation/api.py:623
  * (`prior_neighbor`), :669 (`prior_const`), :712 (`prior_rev`),
  * :957 (`log_likelihood`), :1030 (`tmatrix_cov`), :1066
  * (`error_perturbation`); dense/covariance.py (Dirichlet algebra);
  * tests tests/markov/tools/estimation/tests/test_prior.py,
  * test_likelihood.py.
  *
  * Scale note: the count matrix is the DISTRIBUTED artifact
  * (TransitionCounting aggregates it with one shuffle at any corpus
  * size); everything here is model-sized (M x M) driver math over the
  * collected matrix, exactly like the reference's post-estimation api.
  */
object CountEstimation {

  /** Neighbor prior: b_ij = alpha where c_ij + c_ji > 0, else 0. */
  def priorNeighbor(c: DenseMatrix[Double], alpha: Double = 0.001): DenseMatrix[Double] =
    DenseMatrix.tabulate(c.rows, c.cols)((i, j) =>
      if (c(i, j) + c(j, i) > 0.0) alpha else 0.0)

  /** Constant prior: b_ij = alpha everywhere. */
  def priorConst(c: DenseMatrix[Double], alpha: Double = 0.001): DenseMatrix[Double] =
    DenseMatrix.fill(c.rows, c.cols)(alpha)

  /** Reversible-sampling prior: b_ij = alpha on the upper triangle
    * (i <= j), 0 below — the degrees of freedom of a reversible matrix
    * live on the upper triangle. */
  def priorRev(c: DenseMatrix[Double], alpha: Double = -1.0): DenseMatrix[Double] =
    DenseMatrix.tabulate(c.rows, c.cols)((i, j) => if (i <= j) alpha else 0.0)

  /** Log-likelihood of counts under a transition matrix:
    * l(C|T) = sum over t_ij > 0 of c_ij log t_ij. */
  def logLikelihood(c: DenseMatrix[Double], t: DenseMatrix[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.rows) {
      var j = 0
      while (j < c.cols) {
        if (t(i, j) > 0.0) acc += c(i, j) * math.log(t(i, j))
        j += 1
      }
      i += 1
    }
    acc
  }

  /** Covariance matrix of a Dirichlet(alpha) vector:
    * cov_jl = (delta_jl a0 a_j - a_j a_l) / (a0^2 (a0 + 1)). */
  def dirichletCovariance(alpha: DenseVector[Double]): DenseMatrix[Double] = {
    val a0 = sum(alpha)
    val norm = a0 * a0 * (a0 + 1.0)
    DenseMatrix.tabulate(alpha.length, alpha.length)((j, l) =>
      ((if (j == l) a0 * alpha(j) else 0.0) - alpha(j) * alpha(l)) / norm)
  }

  /** Covariance of transition-matrix row `row` under the non-reversible
    * posterior: rows are independent Dirichlet(c_i + 1), so the full
    * (M, M, M) tensor reduces to per-row (M, M) blocks. */
  def tmatrixCovRow(c: DenseMatrix[Double], row: Int): DenseMatrix[Double] =
    dirichletCovariance(c(row, ::).t.map(_ + 1.0))

  /** Error perturbation of a scalar observable with sensitivity S:
    * V(f) = sum_i sum_jl s_ij cov_i(j, l) s_il. */
  def errorPerturbation(c: DenseMatrix[Double], s: DenseMatrix[Double]): Double = {
    var acc = 0.0
    for (i <- 0 until c.rows) {
      val cov = tmatrixCovRow(c, i)
      for (j <- 0 until c.cols; l <- 0 until c.cols)
        acc += s(i, j) * cov(j, l) * s(i, l)
    }
    acc
  }
}
