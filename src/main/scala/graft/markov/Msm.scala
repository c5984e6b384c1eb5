package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.linalg.LinAlg

/** Connectivity (reference markov/tools/estimation dense connectivity /
  * _transition_counting.py:364 submodel_largest): Tarjan SCC on the count
  * digraph. n is state-count (small); runs on the driver. */
object Connectivity {

  /** Strongly connected components of the directed graph with an edge
    * i->j whenever counts(i,j) > 0. Returns component id per node. */
  def scc(counts: DenseMatrix[Double]): Array[Int] = {
    val n = counts.rows
    val adj = Array.tabulate(n)(i => (0 until n).filter(j => counts(i, j) > 0).toArray)
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = Array.fill(n)(false)
    val comp = Array.fill(n)(-1)
    var idx = 0
    var nComp = 0
    val stack = scala.collection.mutable.ArrayBuffer.empty[Int]

    // iterative Tarjan to avoid deep recursion
    for (root <- 0 until n if index(root) == -1) {
      val work = scala.collection.mutable.Stack[(Int, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.pop()
        if (pi == 0) {
          index(v) = idx; low(v) = idx; idx += 1
          stack += v; onStack(v) = true
        }
        var recursed = false
        var i = pi
        while (i < adj(v).length && !recursed) {
          val u = adj(v)(i)
          if (index(u) == -1) {
            work.push((v, i + 1)); work.push((u, 0)); recursed = true
          } else if (onStack(u)) {
            low(v) = math.min(low(v), index(u))
          }
          i += 1
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            var u = -1
            while (u != v) {
              u = stack.remove(stack.length - 1)
              onStack(u) = false
              comp(u) = nComp
            }
            nComp += 1
          }
          // propagate lowlink to parent
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    comp
  }

  /** States of the largest SCC (submodel_largest directed=True semantics:
    * reference largest_connected_set = connected_sets(C)[0], which sorts by
    * component SIZE), sorted ascending. */
  def largestConnectedSet(counts: DenseMatrix[Double]): Array[Int] =
    connectedSets(counts).head

  def submatrix(m: DenseMatrix[Double], states: Array[Int]): DenseMatrix[Double] = {
    val k = states.length
    val out = DenseMatrix.zeros[Double](k, k)
    for (i <- 0 until k; j <- 0 until k) out(i, j) = m(states(i), states(j))
    out
  }

  /** Whether the count/transition graph is one strongly connected
    * component (reference tools/analysis `is_connected`, directed). */
  def isConnected(counts: DenseMatrix[Double]): Boolean = {
    val comp = scc(counts)
    comp.isEmpty || comp.forall(_ == comp(0))
  }

  /** All connected sets, largest first (reference `compute_connected_sets`
    * / estimation.api `connected_sets` directed=True semantics): SCCs in
    * DESCENDING order of component size — "largest" means most states, not
    * most counts (_util.py:168 -> estimation/api.py:410). Ties break on the
    * smallest contained state index, which is deterministic where the
    * reference's scipy ordering is incidental. */
  def connectedSets(counts: DenseMatrix[Double]): Seq[Array[Int]] = {
    val comp = scc(counts)
    val n = counts.rows
    comp.distinct.toSeq
      .map(c => (0 until n).filter(comp(_) == c).toArray)
      .sortBy(s => (-s.length, s.min))
  }
}

/** Transition-matrix maximum-likelihood estimation
  * (reference markov/tools/estimation/dense/transition_matrix.py:10 nonrev;
  * dense/mle.py:8 `mle_trev` reversible fixed point). Driver-side on the
  * collected (small) count matrix. */
object TransitionMatrixMle {

  /** Non-reversible MLE: row normalization T_ij = c_ij / c_i. */
  def nonReversible(counts: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = counts.rows
    val t = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      val rs = bsum(counts(i, ::).t)
      if (rs > 0) for (j <- 0 until n) t(i, j) = counts(i, j) / rs
      else t(i, i) = 1.0
    }
    t
  }

  /** Reversible MLE via the standard fixed-point iteration on x_ij
    * (dense/mle.py:8 mle_trev): x_ij <- (c_ij + c_ji) / (c_i/x_i + c_j/x_j),
    * T_ij = x_ij / x_i. Converges to the detailed-balance MLE. */
  def reversible(counts: DenseMatrix[Double], maxIter: Int = 1000,
                 tol: Double = 1e-12): DenseMatrix[Double] = {
    val n = counts.rows
    val cSym = counts + counts.t
    val cRow = DenseVector.tabulate(n)(i => bsum(counts(i, ::).t))
    var x = cSym.copy / bsum(cSym)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta > tol) {
      val xRow = DenseVector.tabulate(n)(i => bsum(x(i, ::).t))
      val xNew = DenseMatrix.zeros[Double](n, n)
      for (i <- 0 until n; j <- 0 until n) {
        if (cSym(i, j) > 0) {
          val denom = cRow(i) / xRow(i) + cRow(j) / xRow(j)
          xNew(i, j) = cSym(i, j) / denom
        }
      }
      val z = bsum(xNew)
      xNew := xNew / z
      delta = breeze.linalg.max(breeze.numerics.abs(xNew - x))
      x = xNew
      iter += 1
    }
    val xRow = DenseVector.tabulate(n)(i => bsum(x(i, ::).t))
    val t = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n; j <- 0 until n)
      if (xRow(i) > 0) t(i, j) = x(i, j) / xRow(i)
    for (i <- 0 until n) if (xRow(i) == 0) t(i, i) = 1.0
    t
  }
}

/** MarkovStateModel analysis suite (reference
  * markov/msm/_markov_state_model.py + markov/tools/analysis/_api.py).
  * All methods are driver-side on the n x n transition matrix. */
case class MarkovStateModel(transitionMatrix: DenseMatrix[Double], tau: Int = 1,
                            states: Array[Int] = Array.empty) {
  val n: Int = transitionMatrix.rows

  lazy val stationaryDistribution: DenseVector[Double] =
    LinAlg.stationaryDistribution(transitionMatrix)

  /** Leading eigenvalues as (re, im) pairs, sorted by magnitude descending
    * — non-reversible matrices may have complex pairs, which the real-only
    * view silently mangled (_api.py:260 returns complex). */
  def eigenvaluesComplex(k: Int = -1): Seq[(Double, Double)] = {
    val e = breeze.linalg.eig(transitionMatrix)
    val pairs = (0 until n).map(i => (e.eigenvalues(i), e.eigenvaluesComplex(i)))
      .sortBy { case (re, im) => -math.hypot(re, im) }
    val kk = if (k > 0) math.min(k, n) else n
    pairs.take(kk)
  }

  /** Real parts of the leading eigenvalues (convenience; use
    * `eigenvaluesComplex` when the chain may be non-reversible). */
  def eigenvalues(k: Int = -1): Seq[Double] = eigenvaluesComplex(k).map(_._1)

  /** Implied timescales from eigenvalue MAGNITUDES |lambda| (matching
    * _api.py:310 — complex pairs contribute hypot(re, im), not |re|),
    * excluding the stationary eigenvalue. */
  def timescales(k: Int = -1): Seq[Double] =
    LinAlg.timescales(
      eigenvaluesComplex(if (k > 0) k + 1 else -1).drop(1)
        .map { case (re, im) => math.hypot(re, im) },
      tau.toDouble)

  def isTransitionMatrix(tol: Double = 1e-10): Boolean =
    (0 until n).forall { i =>
      math.abs(bsum(transitionMatrix(i, ::).t) - 1.0) < tol &&
        (0 until n).forall(j => transitionMatrix(i, j) >= -tol)
    }

  def isReversible(tol: Double = 1e-10): Boolean = {
    val pi = stationaryDistribution
    (0 until n).forall(i => (0 until n).forall { j =>
      math.abs(pi(i) * transitionMatrix(i, j) - pi(j) * transitionMatrix(j, i)) < tol
    })
  }

  /** Mean first-passage time from each state into target set
    * (_api.py:527; linear solve (I - T_restricted) m = 1). */
  def mfpt(target: Set[Int]): DenseVector[Double] = {
    val rest = (0 until n).filterNot(target.contains).toArray
    val k = rest.length
    val a = DenseMatrix.zeros[Double](k, k)
    for (i <- 0 until k; j <- 0 until k) {
      a(i, j) = (if (i == j) 1.0 else 0.0) - transitionMatrix(rest(i), rest(j))
    }
    val b = DenseVector.fill(k)(tau.toDouble)
    val sol = a \ b
    val out = DenseVector.zeros[Double](n)
    rest.zipWithIndex.foreach { case (s, i) => out(s) = sol(i) }
    out
  }

  /** Mean first-passage time FROM a starting set TO a target set
    * (_mean_first_passage_time.py:84 `mfpt_between_sets`): the per-state
    * mfpt vector averaged under the stationary distribution restricted
    * to (and renormalized on) the origin set. */
  def mfptBetweenSets(target: Set[Int], origin: Set[Int]): Double = {
    val tY = mfpt(target)
    val pi = stationaryDistribution
    val orig = origin.toSeq.sorted
    val z = orig.map(pi(_)).sum
    require(z > 0, "origin set has zero stationary mass")
    orig.map(x => pi(x) / z * tY(x)).sum
  }

  /** Forward committor q+ : P(hit B before A) (_api.py:641; boundary-value
    * linear solve). */
  def committorForward(a: Set[Int], b: Set[Int]): DenseVector[Double] = {
    val inter = (0 until n).filterNot(s => a.contains(s) || b.contains(s)).toArray
    val k = inter.length
    val lhs = DenseMatrix.zeros[Double](k, k)
    val rhs = DenseVector.zeros[Double](k)
    for (i <- 0 until k) {
      for (j <- 0 until k)
        lhs(i, j) = (if (i == j) 1.0 else 0.0) - transitionMatrix(inter(i), inter(j))
      rhs(i) = b.toSeq.map(s => transitionMatrix(inter(i), s)).sum
    }
    val sol = lhs \ rhs
    val out = DenseVector.zeros[Double](n)
    b.foreach(s => out(s) = 1.0)
    inter.zipWithIndex.foreach { case (s, i) => out(s) = sol(i) }
    out
  }

  /** Backward committor q- : P(last came from A rather than B), solved as
    * the forward committor of the time-reversed chain
    * T~_ij = pi_j T_ji / pi_i (markov/tools/analysis/_committor.py).
    * Valid for NON-reversible chains; for reversible ones it reduces to
    * 1 - q+. */
  def committorBackward(a: Set[Int], b: Set[Int]): DenseVector[Double] = {
    val pi = stationaryDistribution
    val tRev = DenseMatrix.tabulate(n, n) { (i, j) =>
      if (pi(i) > 0) pi(j) * transitionMatrix(j, i) / pi(i) else 0.0
    }
    // forward committor of the reversed chain with roles swapped: hit A
    // before B going backwards
    val inter = (0 until n).filterNot(s => a.contains(s) || b.contains(s)).toArray
    val k = inter.length
    val lhs = DenseMatrix.zeros[Double](k, k)
    val rhs = DenseVector.zeros[Double](k)
    for (i <- 0 until k) {
      for (j <- 0 until k)
        lhs(i, j) = (if (i == j) 1.0 else 0.0) - tRev(inter(i), inter(j))
      rhs(i) = a.toSeq.map(s => tRev(inter(i), s)).sum
    }
    val sol = if (k > 0) lhs \ rhs else DenseVector.zeros[Double](0)
    val out = DenseVector.zeros[Double](n)
    a.foreach(s => out(s) = 1.0)
    inter.zipWithIndex.foreach { case (s, i) => out(s) = sol(i) }
    out
  }

  /** Restriction to a subset of states with row re-normalization
    * (_markov_state_model.py:278 `submodel`). State labels are remapped
    * through the current `states` array. */
  def submodel(keep: Seq[Int]): MarkovStateModel = {
    require(keep.forall(s => s >= 0 && s < n), "submodel states out of range")
    val idx = keep.toArray
    val sub = DenseMatrix.tabulate(idx.length, idx.length)((a, b) =>
      transitionMatrix(idx(a), idx(b)))
    for (i <- 0 until idx.length) {
      val rs = bsum(sub(i, ::).t)
      if (rs > 0) sub(i, ::) :/= rs else sub(i, i) = 1.0
    }
    val labels = if (states.nonEmpty) idx.map(states(_)) else idx
    MarkovStateModel(sub, tau, labels)
  }

  /** Propagate a distribution k steps (msm `propagate`,
    * _markov_state_model.py:541). */
  def propagate(p0: DenseVector[Double], steps: Int): DenseVector[Double] = {
    var p = p0.copy
    (0 until steps).foreach(_ => p = transitionMatrix.t * p)
    p
  }

  /** Stationary expectation of a state function (_api.py:1058). */
  def expectation(a: DenseVector[Double]): Double = stationaryDistribution dot a
}

/** A collection of MSMs estimated over different connected sets
  * (_markov_state_model.py:1292 `MarkovStateModelCollection`): behaves as
  * the currently selected model; `select(i)` switches. */
case class MarkovStateModelCollection(models: Seq[MarkovStateModel],
                                      current: Int = 0) {
  require(models.nonEmpty, "needs at least one model")
  require(current >= 0 && current < models.length, "selection out of range")
  def nConnectedSets: Int = models.length
  def model: MarkovStateModel = models(current)
  def select(i: Int): MarkovStateModelCollection = copy(current = i)
}

object Msm {

  /** Estimate one MSM per connected component of the count graph, largest
    * first (the `MaximumLikelihoodMSM(... connectivity_threshold)` +
    * collection path). */
  def collectionFromCounts(counts: org.apache.spark.sql.DataFrame, nStates: Int,
                           tau: Int, reversible: Boolean = false): MarkovStateModelCollection = {
    val dense = TransitionCounting.toDense(counts, nStates)
    val comp = Connectivity.scc(dense)
    val groups = (0 until nStates).groupBy(comp(_)).values
      .map(_.toArray.sorted)
      .toSeq.sortBy(g => -g.map(i => bsum(dense(i, ::).t)).sum)
    val models = groups.map { states =>
      val sub = Connectivity.submatrix(dense, states)
      val t = if (reversible) TransitionMatrixMle.reversible(sub)
              else TransitionMatrixMle.nonReversible(sub)
      MarkovStateModel(t, tau, states)
    }
    MarkovStateModelCollection(models)
  }

  /** Full pipeline from a distributed COO count frame: collect, restrict to
    * largest SCC, MLE. Returns model + the retained original state labels. */
  def fromCounts(counts: org.apache.spark.sql.DataFrame, nStates: Int, tau: Int,
                 reversible: Boolean = false): MarkovStateModel =
    fromDense(TransitionCounting.toDense(counts, nStates), tau, reversible)

  /** Same pipeline from an already-collected dense count matrix (callers
    * that fused counting with other work, e.g. the one-scan
    * counts+support pass). */
  def fromDense(dense: DenseMatrix[Double], tau: Int,
                reversible: Boolean = false): MarkovStateModel = {
    val lcs = Connectivity.largestConnectedSet(dense)
    val sub = Connectivity.submatrix(dense, lcs)
    val t = if (reversible) TransitionMatrixMle.reversible(sub)
            else TransitionMatrixMle.nonReversible(sub)
    MarkovStateModel(t, tau, lcs)
  }

  /** Per-frame stationary reweighting (_markov_state_model.py:1097
    * `compute_trajectory_weights`): w_t = pi(s_t) / hist(s_t), normalized
    * to sum 1 over all frames. Fully distributed: pi and the state
    * histogram broadcast as a small map; one pass adds the weight column. */
  def trajectoryWeights(dtraj: org.apache.spark.sql.DataFrame,
                        msm: MarkovStateModel): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val hist = dtraj.where(col("state") >= 0).groupBy("state").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val pi = msm.stationaryDistribution
    val labels = if (msm.states.nonEmpty) msm.states else Array.tabulate(msm.n)(identity)
    val wMap = labels.zipWithIndex.collect {
      case (sym, i) if hist.getOrElse(sym, 0.0) > 0 => sym -> pi(i) / hist(sym)
    }.toMap
    val total = wMap.map { case (sym, w) => w * hist(sym) }.sum
    // broadcast map lookup, constant expression depth at any state count
    // (a nested CASE WHEN chain would blow codegen at n ~ thousands)
    val lookup = typedLit(wMap.map { case (sym, w) => sym -> w / total })
    dtraj.withColumn("weight",
      coalesce(element_at(lookup, col("state")), lit(0.0)))
  }

  /** Indicator-basis covariances of a count matrix: C00 = diag(rowsums),
    * C0t = C, Ctt = diag(colsums), all normalized by the total count. */
  private def countsToCovariance(counts: DenseMatrix[Double]): graft.agg.CovarianceModel = {
    val n = counts.rows
    val total = bsum(counts)
    val c00 = DenseMatrix.zeros[Double](n, n)
    val ctt = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      c00(i, i) = bsum(counts(i, ::).t) / total
      ctt(i, i) = bsum(counts(::, i)) / total
    }
    graft.agg.CovarianceModel(total, total.toLong, n,
      new Array[Double](n), new Array[Double](n),
      graft.linalg.LinAlg.toFlat(c00), graft.linalg.LinAlg.toFlat(counts / total),
      graft.linalg.LinAlg.toFlat(ctt))
  }

  /** The MSM's empirical Koopman model (the `empirical_koopman_model` used
    * by `score`, _markov_state_model.py:1263). */
  def empiricalKoopman(counts: DenseMatrix[Double], tau: Int,
                       epsilon: Double = 1e-10): graft.decomposition.KoopmanModel =
    graft.decomposition.Vamp.fitFromCovariance(countsToCovariance(counts), tau, epsilon)

  /** Discrete VAMP score of an MSM's counts, optionally against test
    * counts (`MarkovStateModel.score`). */
  def score(counts: DenseMatrix[Double], testCounts: Option[DenseMatrix[Double]] = None,
            method: String = "VAMP2", tau: Int = 1): Double = {
    val model = empiricalKoopman(counts, tau)
    val covTest = countsToCovariance(testCounts.getOrElse(counts))
    // indicator features are not mean-removed: subtract the +1 constant
    // correction the mean-removed scorer adds
    graft.decomposition.Scoring.vampScore(model, covTest, method) - 1.0
  }
}
