package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}

/** Transition path theory / reactive flux (reference
  * markov/_reactive_flux.py:19-407, markov/tools/flux/api.py:16-446).
  * Driver-side on the n x n model. */
object Tpt {

  case class ReactiveFlux(
      sourceStates: Set[Int], targetStates: Set[Int],
      grossFlux: DenseMatrix[Double],  // f_ij
      netFlux: DenseMatrix[Double],    // max(f_ij - f_ji, 0)
      totalFlux: Double,
      rate: Double,
      forwardCommittor: DenseVector[Double],
      backwardCommittor: DenseVector[Double]) {

    /** Net flux production per state: rowsum(F) - colsum(F)
      * (flux/api.py:134 `flux_production`). Positive for producers
      * (typically A), negative for consumers (typically B). */
    def fluxProduction: DenseVector[Double] = {
      val n = netFlux.rows
      DenseVector.tabulate(n)(i =>
        bsum(netFlux(i, ::).t) - bsum(netFlux(::, i)))
    }

    /** States producing net flux (flux/api.py:170 `flux_producers`). */
    def fluxProducers(rtol: Double = 1e-5, atol: Double = 1e-12): Seq[Int] = {
      val prod = fluxProduction
      val scale = breeze.linalg.max(breeze.numerics.abs(prod))
      (0 until prod.length).filter(i => prod(i) > atol + rtol * scale)
    }

    /** States consuming net flux (flux/api.py:193 `flux_consumers`). */
    def fluxConsumers(rtol: Double = 1e-5, atol: Double = 1e-12): Seq[Int] = {
      val prod = fluxProduction
      val scale = breeze.linalg.max(breeze.numerics.abs(prod))
      (0 until prod.length).filter(i => prod(i) < -(atol + rtol * scale))
    }

    /** TPT mean first-passage time A->B: 1/rate scaled by tau implicitly
      * 1 here (flux/api.py:359 `mfpt` = 1 / rate). */
    def tptMfpt: Double = 1.0 / rate

    /** Pathway decomposition: repeatedly extract the bottleneck-capacity
      * path A->B from the net flux and remove its flux, until `fraction`
      * of the total flux is explained (flux/pathways.py). Returns
      * (path, flux) ordered by decreasing flux. */
    def pathways(fraction: Double = 1.0, maxCount: Int = 100): Seq[(Seq[Int], Double)] = {
      val n = netFlux.rows
      val f = netFlux.copy

      // widest (max-bottleneck) A->B path on current residual flux, or None
      def widestPath(): Option[(Seq[Int], Double)] = {
        val bottleneck = Array.fill(n)(0.0)
        val prev = Array.fill(n)(-1)
        val visited = Array.fill(n)(false)
        sourceStates.foreach(s => bottleneck(s) = Double.PositiveInfinity)
        var reached = -1
        while (reached == -1) {
          var u = -1; var best = 0.0
          for (i <- 0 until n if !visited(i) && bottleneck(i) > best) {
            best = bottleneck(i); u = i
          }
          if (u == -1) return None
          visited(u) = true
          if (targetStates.contains(u)) reached = u
          else for (v <- 0 until n if !visited(v) && f(u, v) > 0) {
            val cap = math.min(bottleneck(u), f(u, v))
            if (cap > bottleneck(v)) { bottleneck(v) = cap; prev(v) = u }
          }
        }
        val path = scala.collection.mutable.ArrayBuffer(reached)
        while (prev(path.head) != -1) path.prepend(prev(path.head))
        val flux = bottleneck(reached)
        if (flux > 0 && flux.isFinite) Some((path.toSeq, flux)) else None
      }

      val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[Int], Double)]
      var captured = 0.0
      var continue = true
      while (continue && captured < fraction * totalFlux - 1e-15 && out.length < maxCount) {
        widestPath() match {
          case Some((path, flux)) =>
            for (k <- 0 until path.length - 1) f(path(k), path(k + 1)) -= flux
            out += ((path, flux))
            captured += flux
          case None => continue = false
        }
      }
      out.toSeq
    }

    /** Coarse-grain the flux onto a state partition (flux/api.py
      * coarse_grain). Sets are given as disjoint groups covering 0..n-1. */
    def coarseGrain(groups: Seq[Set[Int]]): (DenseMatrix[Double], DenseMatrix[Double]) = {
      val m = groups.length
      val gross = DenseMatrix.zeros[Double](m, m)
      for (a <- 0 until m; b <- 0 until m if a != b;
           i <- groups(a); j <- groups(b)) gross(a, b) += grossFlux(i, j)
      val net = DenseMatrix.tabulate(m, m)((a, b) => math.max(gross(a, b) - gross(b, a), 0.0))
      (gross, net)
    }
  }

  /** Reactive flux A -> B: f_ij = pi_i q-_i T_ij q+_j for i != j
    * (flux/api.py:16 flux_matrix). */
  def reactiveFlux(msm: MarkovStateModel, a: Set[Int], b: Set[Int]): ReactiveFlux = {
    val t = msm.transitionMatrix
    val n = t.rows
    val pi = msm.stationaryDistribution
    val qp = msm.committorForward(a, b)
    // backward committor via the time-reversed chain — exact for
    // NON-reversible chains too (for reversible ones it equals 1 - q+,
    // the shortcut the previous implementation hardcoded)
    val qm = msm.committorBackward(a, b)
    val f = DenseMatrix.tabulate(n, n)((i, j) =>
      if (i == j) 0.0 else pi(i) * qm(i) * t(i, j) * qp(j))
    val net = DenseMatrix.tabulate(n, n)((i, j) => math.max(f(i, j) - f(j, i), 0.0))
    // total flux: out of A (flux/api.py total_flux)
    val total = a.toSeq.map(i => (0 until n).filterNot(a.contains)
      .map(j => f(i, j)).sum).sum
    // rate = totalFlux / (pi . q-)
    val denom = (0 until n).map(i => pi(i) * qm(i)).sum
    val rate = if (denom > 0) total / denom else 0.0
    ReactiveFlux(a, b, f, net, total, rate, qp, qm)
  }
}
