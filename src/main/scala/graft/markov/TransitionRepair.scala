package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}

/** Disconnected-count-matrix repair machinery (reference
  * markov/_transition_matrix.py + markov/_util.py): transition estimation
  * for GENERAL connectivity structure (`estimate_P` — per connected set,
  * with the partially-reversible block MLE for strongly connected sets
  * that still have outgoing transitions), reversibility enforcement on
  * closed sets (`enforce_reversible_on_closed`), and the count-weighted
  * stationary distribution for disconnected models
  * (`stationary_distribution(P, C)`). The discrete-HMM init heuristic
  * (`Hmm.initialGuessFromCounts`) relies on these exactly where the
  * reference does: poorly-sampled dtrajs whose count graph is not one
  * SCC. Driver-side on model-sized matrices. */
object TransitionRepair {

  /** Connected sets of the thresholded count graph, largest first
    * (_util.py:168 `compute_connected_sets`): entries below
    * `threshold` are dropped, then strong (directed) or weak
    * (undirected) components of the nonzero structure. */
  def connectedSets(c: DenseMatrix[Double], threshold: Double = 0.0,
                    directed: Boolean = true): Seq[Array[Int]] = {
    val n = c.rows
    def keep(v: Double) = v > 0 && v >= threshold
    val adj = DenseMatrix.tabulate(n, n)((i, j) =>
      if (keep(c(i, j)) || (!directed && keep(c(j, i)))) 1.0 else 0.0)
    Connectivity.connectedSets(adj)
  }

  /** Strongly connected sets with zero outgoing mass (_util.py
    * `closed_sets`). */
  def closedSets(p: DenseMatrix[Double], threshold: Double = 0.0): Seq[Array[Int]] = {
    val n = p.rows
    connectedSets(p, threshold, directed = true).filter { s =>
      val in = s.toSet
      s.forall(i => (0 until n).forall(j => in.contains(j) || p(i, j) == 0.0))
    }
  }

  /** Partially-reversible block MLE (_transition_matrix.py:64
    * `transition_matrix_partial_rev`): maximizes the likelihood over rows
    * in `mask` with detailed balance imposed ONLY on the (mask, mask)
    * block; the (mask, ~mask) outflow block is free. Writes the rows
    * `mask` of `p` in place. */
  def transitionMatrixPartialRev(c: DenseMatrix[Double], p: DenseMatrix[Double],
                                 mask: Array[Boolean], maxIter: Int = 1000000,
                                 maxErr: Double = 1e-8): Unit = {
    val n = c.rows
    val s = (0 until n).filter(mask(_)).toArray
    val t = (0 until n).filterNot(mask(_)).toArray
    val k = s.length
    val ata = DenseMatrix.tabulate(k, k)((i, j) => c(s(i), s(j)) + c(s(j), s(i)))
    val b = DenseMatrix.tabulate(k, t.length)((i, j) => c(s(i), t(j)))
    val countSums = DenseVector.tabulate(k)(i => bsum(c(s(i), ::).t))
    var x = ata * 0.5
    var y = b.copy
    var z = bsum(x) + bsum(y)
    x :*= 1.0 / z; y :*= 1.0 / z
    var rowSums = DenseVector.tabulate(k)(i => bsum(x(i, ::).t) + bsum(y(i, ::).t))
    var err = 1.0
    var it = 0
    while (err > maxErr && it < maxIter) {
      val d = DenseVector.tabulate(k)(i => countSums(i) / rowSums(i))
      x = DenseMatrix.tabulate(k, k)((i, j) =>
        if (ata(i, j) > 0) ata(i, j) / (d(i) + d(j)) else 0.0)
      y = DenseMatrix.tabulate(k, t.length)((i, j) => b(i, j) / d(i))
      z = bsum(x) + bsum(y)
      x :*= 1.0 / z; y :*= 1.0 / z
      val rowSumsNew = DenseVector.tabulate(k)(i => bsum(x(i, ::).t) + bsum(y(i, ::).t))
      err = breeze.linalg.max(breeze.numerics.abs(rowSumsNew - rowSums))
      rowSums = rowSumsNew
      it += 1
    }
    for (i <- 0 until k) {
      val rs = bsum(x(i, ::).t) + bsum(y(i, ::).t)
      for (j <- 0 until k) p(s(i), s(j)) = x(i, j) / rs
      for (j <- t.indices) p(s(i), t(j)) = y(i, j) / rs
    }
  }

  /** Full transition matrix for general connectivity structure
    * (_transition_matrix.py:6 `estimate_P`): identity rows for empty
    * states; reversible-to-unknown-π proceeds per STRONG component
    * (partial-rev where the component has outflow, standard reversible MLE
    * on closed components); nonreversible or fixed-π proceeds per WEAK
    * component (row normalization / fixed-π MLE per block). */
  def estimateP(c: DenseMatrix[Double], reversible: Boolean = true,
                fixedStatdist: Option[DenseVector[Double]] = None,
                maxIter: Int = 1000000, maxErr: Double = 1e-8,
                mincountConnectivity: Double = 0.0): DenseMatrix[Double] = {
    val n = c.rows
    val p = DenseMatrix.eye[Double](n)
    if (reversible && fixedStatdist.isEmpty) {
      for (s <- connectedSets(c, mincountConnectivity, directed = true)) {
        val in = s.toSet
        val outflow = s.map(i => (0 until n).filterNot(in.contains)
          .map(j => c(i, j)).sum).sum
        if (outflow > java.lang.Math.ulp(1.0)) {
          val mask = Array.tabulate(n)(in.contains)
          transitionMatrixPartialRev(c, p, mask, maxIter, maxErr)
        } else if (s.length > 1) {
          val sub = TransitionMatrixMle.reversible(Connectivity.submatrix(c, s),
            maxIter = math.min(maxIter, 100000), tol = maxErr)
          for (i <- s.indices; j <- s.indices) p(s(i), s(j)) = sub(i, j)
        } // single closed state keeps its identity row
      }
    } else {
      for (s <- connectedSets(c, mincountConnectivity, directed = false)) {
        val sub = Connectivity.submatrix(c, s)
        val est =
          if (!reversible) {
            for (i <- s.indices if bsum(sub(i, ::).t) == 0.0) sub(i, i) = 1.0
            TransitionMatrixMle.nonReversible(sub)
          } else {
            val mu = fixedStatdist.get
            val muSub = DenseVector(s.map(mu(_)))
            MsmAnalysis.reversibleMleFixedPi(sub, muSub / bsum(muSub),
              maxErr = maxErr, maxIter = maxIter)
          }
        for (i <- s.indices; j <- s.indices) p(s(i), s(j)) = est(i, j)
      }
    }
    p
  }

  /** Enforce reversibility of `p` on each of its closed sets
    * (_transition_matrix.py:132 `enforce_reversible_on_closed`):
    * symmetrize X = diag(π_s)·P_s within the set and row-normalize;
    * rows outside closed sets are untouched. */
  def enforceReversibleOnClosed(p: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = p.copy
    for (s <- closedSets(p)) {
      val k = s.length
      val sub = Connectivity.submatrix(p, s)
      val piS = graft.linalg.LinAlg.stationaryDistribution(sub)
      val x = DenseMatrix.tabulate(k, k)((i, j) =>
        0.5 * (piS(i) * sub(i, j) + piS(j) * sub(j, i)))
      for (i <- 0 until k) {
        val rs = bsum(x(i, ::).t)
        for (j <- 0 until k) out(s(i), s(j)) = if (rs > 0) x(i, j) / rs else (if (i == j) 1.0 else 0.0)
      }
    }
    out
  }

  /** Stationary distribution for possibly-disconnected models
    * (_transition_matrix.py:150 `stationary_distribution(P, C)`): each
    * WEAK connected set of C gets the stationary vector of its P block,
    * weighted by the set's share of total counts. Falls back to the plain
    * eigenvector when C is omitted and P is connected. */
  def stationaryDistributionDisconnected(p: DenseMatrix[Double],
                                         c: Option[DenseMatrix[Double]] = None,
                                         mincountConnectivity: Double = 0.0): DenseVector[Double] = {
    c match {
      case None =>
        require(Connectivity.isConnected(p),
          "computing stationary distribution for a disconnected matrix needs the count matrix")
        graft.linalg.LinAlg.stationaryDistribution(p)
      case Some(cm) =>
        val n = cm.rows
        val ctot = bsum(cm)
        val pi = DenseVector.zeros[Double](n)
        for (s <- connectedSets(cm, mincountConnectivity, directed = false)) {
          val w = s.map(i => bsum(cm(i, ::).t)).sum / ctot
          val piS = graft.linalg.LinAlg.stationaryDistribution(
            Connectivity.submatrix(p, s))
          for (i <- s.indices) pi(s(i)) = w * piS(i)
        }
        pi / bsum(pi)
    }
  }

  /** Neighbor prior (tools/estimation `prior_neighbor`): alpha wherever
    * c_ij + c_ji > 0. Returned as a new matrix to ADD to c. */
  def priorNeighbor(c: DenseMatrix[Double], alpha: Double = 0.001): DenseMatrix[Double] =
    DenseMatrix.tabulate(c.rows, c.cols)((i, j) =>
      if (c(i, j) + c(j, i) > 0) alpha else 0.0)
}
