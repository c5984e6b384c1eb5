package graft.markov

import breeze.linalg.{CSCMatrix, DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame

/** Sparse large-n MSM estimation path.
  *
  * The dense pipeline (`Msm.fromCounts` -> `DenseMatrix`) allocates 8*n^2
  * bytes on the driver — an OOM at n ~ 1e5 states (fine-grained
  * discretizations). The reference keeps count/transition matrices sparse
  * end-to-end (markov/_transition_counting.py:471-473 `sparse_return`;
  * markov/tools/estimation/api.py:768-956 auto dense/sparse dispatch with
  * the `dimension^2 < 3*nnz -> dense` rule) and solves k-eigenpair
  * problems iteratively (numeric/_eigen.py:289 `eigs` -> ARPACK Lanczos).
  *
  * This module mirrors that: COO count rows (a Spark aggregate of at most
  * nnz rows — never collected as n^2) -> Breeze `CSCMatrix`, Tarjan SCC on
  * adjacency lists, the reversible MLE fixed point iterated over the
  * symmetric nonzero pattern only, damped power iteration for the
  * stationary distribution, and Lanczos (reversible, via the
  * pi-symmetrized operator) / Arnoldi (general) for the leading k
  * eigenvalues. Everything is O(nnz) time and memory.
  */
object SparseMsm {

  /** COO triples collected from a distributed count frame (nnz-sized). */
  final case class CooCounts(n: Int, rows: Array[Int], cols: Array[Int],
                             vals: Array[Double]) {
    def nnz: Int = vals.length
    def rowSums: DenseVector[Double] = {
      val rs = DenseVector.zeros[Double](n)
      var k = 0
      while (k < nnz) { rs(rows(k)) += vals(k); k += 1 }
      rs
    }
    def toCsc: CSCMatrix[Double] = {
      val b = new CSCMatrix.Builder[Double](n, n, nnz)
      var k = 0
      while (k < nnz) { b.add(rows(k), cols(k), vals(k)); k += 1 }
      b.result()
    }
    /** Restriction to `states` (sorted ascending), relabeled 0..k-1. */
    def submatrix(states: Array[Int]): CooCounts = {
      val idx = new java.util.HashMap[Int, Int](states.length * 2)
      var i = 0
      while (i < states.length) { idx.put(states(i), i); i += 1 }
      val r = Array.newBuilder[Int]; val c = Array.newBuilder[Int]
      val v = Array.newBuilder[Double]
      var k = 0
      while (k < nnz) {
        if (idx.containsKey(rows(k)) && idx.containsKey(cols(k))) {
          r += idx.get(rows(k)); c += idx.get(cols(k)); v += vals(k)
        }
        k += 1
      }
      CooCounts(states.length, r.result(), c.result(), v.result())
    }
  }

  /** Collect a distributed COO count frame (s0, s1, cnt) into driver COO.
    * Memory is O(nnz); n is the max state label + 1 unless given. */
  def collectCoo(counts: DataFrame, nStates: Int = -1): CooCounts = {
    val rows = counts.select("s0", "s1", "cnt").collect()
    val r = new Array[Int](rows.length)
    val c = new Array[Int](rows.length)
    val v = new Array[Double](rows.length)
    var i = 0
    var maxS = -1
    while (i < rows.length) {
      r(i) = rows(i).getInt(0); c(i) = rows(i).getInt(1)
      v(i) = rows(i).get(2) match {
        case l: java.lang.Long => l.toDouble
        case d: java.lang.Double => d
        case x => x.toString.toDouble
      }
      if (r(i) > maxS) maxS = r(i)
      if (c(i) > maxS) maxS = c(i)
      i += 1
    }
    CooCounts(if (nStates > 0) nStates else maxS + 1, r, c, v)
  }

  /** api.py:846-855 auto rule: dense when dimension^2 < 3*nnz. */
  def denseIsEfficient(n: Int, nnz: Int): Boolean = n.toLong * n < 3L * nnz

  // ---------------------------------------------------------------- graphs

  /** CSR adjacency (pattern only) from COO. */
  private def adjacency(coo: CooCounts, transpose: Boolean): (Array[Int], Array[Int]) = {
    val n = coo.n
    val deg = new Array[Int](n + 1)
    val src = if (transpose) coo.cols else coo.rows
    val dst = if (transpose) coo.rows else coo.cols
    var k = 0
    while (k < coo.nnz) { if (coo.vals(k) > 0) deg(src(k) + 1) += 1; k += 1 }
    var i = 0
    while (i < n) { deg(i + 1) += deg(i); i += 1 }
    val ptr = deg.clone()
    val out = new Array[Int](ptr(n))
    val fill = ptr.clone()
    k = 0
    while (k < coo.nnz) {
      if (coo.vals(k) > 0) { out(fill(src(k))) = dst(k); fill(src(k)) += 1 }
      k += 1
    }
    (ptr, out)
  }

  /** Tarjan SCC over COO adjacency — O(n + nnz), iterative (no recursion
    * depth limit). Same component ordering contract as the dense
    * `Connectivity.connectedSets`: size-descending, ties on smallest
    * contained state. */
  def connectedSets(coo: CooCounts): Seq[Array[Int]] = {
    val n = coo.n
    val (ptr, adj) = adjacency(coo, transpose = false)
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = Array.fill(n)(false)
    val comp = Array.fill(n)(-1)
    var idx = 0
    var nComp = 0
    val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
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
        while (i < ptr(v + 1) - ptr(v) && !recursed) {
          val u = adj(ptr(v) + i)
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
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    val members = Array.fill(nComp)(Array.newBuilder[Int])
    var v = 0
    while (v < n) { members(comp(v)) += v; v += 1 }
    members.toSeq.map(_.result()).sortBy(s => (-s.length, s.min))
  }

  def largestConnectedSet(coo: CooCounts): Array[Int] = {
    require(coo.n > 0, "empty count matrix: no states observed (0 COO rows)")
    connectedSets(coo).head
  }

  /** Forward/backward reachable intersection from `seed` — an independent
    * (BFS-based) computation of the SCC containing `seed`, used as an
    * internal cross-check of the Tarjan result. */
  def sccOfViaBfs(coo: CooCounts, seed: Int): Array[Int] = {
    def reach(transpose: Boolean): Array[Boolean] = {
      val (ptr, adj) = adjacency(coo, transpose)
      val seen = new Array[Boolean](coo.n)
      val queue = new java.util.ArrayDeque[Int]()
      seen(seed) = true; queue.add(seed)
      while (!queue.isEmpty) {
        val v = queue.poll()
        var i = ptr(v)
        while (i < ptr(v + 1)) {
          val u = adj(i)
          if (!seen(u)) { seen(u) = true; queue.add(u) }
          i += 1
        }
      }
      seen
    }
    val fwd = reach(transpose = false)
    val bwd = reach(transpose = true)
    (0 until coo.n).filter(i => fwd(i) && bwd(i)).toArray
  }

  // ------------------------------------------------------------------ MLE

  /** Non-reversible MLE: row-normalize the COO (api.py transition_matrix
    * reversible=False, sparse branch). Empty rows get T_ii = 1. */
  def mleNonReversible(coo: CooCounts): CSCMatrix[Double] = {
    val rs = coo.rowSums
    val b = new CSCMatrix.Builder[Double](coo.n, coo.n, coo.nnz + coo.n)
    var k = 0
    while (k < coo.nnz) {
      if (rs(coo.rows(k)) > 0)
        b.add(coo.rows(k), coo.cols(k), coo.vals(k) / rs(coo.rows(k)))
      k += 1
    }
    var i = 0
    while (i < coo.n) { if (rs(i) == 0) b.add(i, i, 1.0); i += 1 }
    b.result()
  }

  /** Reversible MLE fixed point iterated over the SYMMETRIC nonzero
    * pattern only (sparse twin of `TransitionMatrixMle.reversible`;
    * reference estimation/sparse/mle/mle_trev.pyx): x_ij <- csym_ij /
    * (c_i/x_i + c_j/x_j), T_ij = x_ij / x_i, pi = x rowsums. Convergence
    * is tracked on the relative change of x_i (api.py maxerr contract).
    * Returns (T, pi). */
  def mleReversible(coo: CooCounts, maxIter: Int = 1000,
                    tol: Double = 1e-12): (CSCMatrix[Double], DenseVector[Double]) = {
    val n = coo.n
    // symmetric pattern: merge (i,j) and (j,i) counts; store upper+lower
    val sym = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    var k = 0
    while (k < coo.nnz) {
      val key = (coo.rows(k), coo.cols(k))
      sym(key) = sym.getOrElse(key, 0.0) + coo.vals(k)
      val kt = (coo.cols(k), coo.rows(k))
      sym(kt) = sym.getOrElse(kt, 0.0) + coo.vals(k)
      k += 1
    }
    val m = sym.size
    val si = new Array[Int](m); val sj = new Array[Int](m)
    val csym = new Array[Double](m)
    var p = 0
    sym.foreach { case ((i, j), v) => si(p) = i; sj(p) = j; csym(p) = v; p += 1 }
    val cRow = coo.rowSums
    val total = csym.sum
    val x = csym.map(_ / total)
    val xRow = DenseVector.zeros[Double](n)
    def recomputeXRow(): Unit = {
      var i = 0
      while (i < n) { xRow(i) = 0.0; i += 1 }
      var q = 0
      while (q < m) { xRow(si(q)) += x(q); q += 1 }
    }
    recomputeXRow()
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta > tol) {
      val xRowPrev = xRow.copy
      var q = 0
      while (q < m) {
        val i = si(q); val j = sj(q)
        val denom = cRow(i) / xRow(i) + cRow(j) / xRow(j)
        x(q) = if (denom > 0) csym(q) / denom else 0.0
        q += 1
      }
      recomputeXRow()
      delta = 0.0
      var i = 0
      while (i < n) {
        val s = xRowPrev(i) + xRow(i)
        if (s > 0) {
          val e = math.abs(xRow(i) - xRowPrev(i)) / s
          if (e > delta) delta = e
        }
        i += 1
      }
      iter += 1
    }
    val b = new CSCMatrix.Builder[Double](n, n, m)
    var q = 0
    while (q < m) {
      if (xRow(si(q)) > 0) b.add(si(q), sj(q), x(q) / xRow(si(q)))
      q += 1
    }
    val piSum = breeze.linalg.sum(xRow)
    (b.result(), xRow / piSum)
  }

  // ------------------------------------------------------------- spectral

  /** y = T' x (left matvec) without materializing the transpose. */
  private[graft] def leftMatvec(t: CSCMatrix[Double], x: DenseVector[Double]): DenseVector[Double] = {
    // CSC stores by column: y_j = sum_i x_i T_ij is a per-column dot
    val y = DenseVector.zeros[Double](t.cols)
    var j = 0
    while (j < t.cols) {
      var p = t.colPtrs(j)
      var acc = 0.0
      while (p < t.colPtrs(j + 1)) { acc += x(t.rowIndices(p)) * t.data(p); p += 1 }
      y(j) = acc
      j += 1
    }
    y
  }

  /** y = T x over the CSC nonzeros; `skipCol` masks columns out of the
    * product (used for restricted systems like (I - T_rest) m = tau). */
  private[graft] def rightMatvec(t: CSCMatrix[Double], x: DenseVector[Double],
                                 skipCol: Int => Boolean = _ => false): DenseVector[Double] = {
    val y = DenseVector.zeros[Double](t.rows)
    var j = 0
    while (j < t.cols) {
      val xj = x(j)
      if (xj != 0.0 && !skipCol(j)) {
        var p = t.colPtrs(j)
        while (p < t.colPtrs(j + 1)) { y(t.rowIndices(p)) += t.data(p) * xj; p += 1 }
      }
      j += 1
    }
    y
  }

  /** Relaxation experiment by matrix-free propagation: for each time t,
    * r(t) = p0 . (T^t obs), with obs propagated by repeated sparse
    * matvec between the SORTED time points — never a dense matrix power
    * (reference _fingerprints.py:363 `relaxation_matvec`; sparse-path
    * tests tests/markov/tools/analysis/impl/sparse/fingerprints_test.py). */
  def relaxationMatvec(t: CSCMatrix[Double], p0: DenseVector[Double],
                       obs: DenseVector[Double], times: Seq[Int]): Array[Double] = {
    require(times.forall(_ >= 0), "times must be nonnegative")
    val order = times.zipWithIndex.sortBy(_._1)
    val out = new Array[Double](times.length)
    var cur = obs.copy
    var tNow = 0
    order.foreach { case (tt, idx) =>
      while (tNow < tt) { cur = rightMatvec(t, cur); tNow += 1 }
      out(idx) = p0 dot cur
    }
    out
  }

  /** Equilibrium time-correlation by matrix-free propagation:
    * corr(t) = (pi .* obs1) . (T^t obs2) — the relaxation experiment
    * started from the stationary-weighted observable (reference
    * _fingerprints.py:222 `correlation_matvec`). */
  def correlationMatvec(t: CSCMatrix[Double], pi: DenseVector[Double],
                        obs1: DenseVector[Double], obs2: DenseVector[Double],
                        times: Seq[Int]): Array[Double] =
    relaxationMatvec(t, pi *:* obs1, obs2, times)

  /** Spectral fingerprint amplitudes from k eigenpairs: gamma_i =
    * (p0 . r_i)(l_i . obs) for the relaxation experiment, with
    * p0 = pi .* obs1 giving the correlation fingerprint (reference
    * _fingerprints.py `fingerprint`; amplitudes match the
    * impl/sparse/fingerprints_test.py formula dot(p0, R) * dot(L, obs)). */
  def fingerprintAmplitudes(right: Seq[DenseVector[Double]],
                            left: Seq[DenseVector[Double]],
                            p0: DenseVector[Double],
                            obs: DenseVector[Double]): Array[Double] =
    right.zip(left).map { case (r, l) => (p0 dot r) * (l dot obs) }.toArray

  /** Stationary distribution by DAMPED left power iteration: pi' (I+T)/2
    * has the same fixed point but no period-2 oscillation
    * (tools/analysis `stationary_distribution` sparse backend parity —
    * the reference solves an eigenproblem; the damped iteration is the
    * standard matrix-free equivalent). Assumes T is irreducible (call on
    * the largest SCC). */
  def stationaryDistribution(t: CSCMatrix[Double], maxIter: Int = 100000,
                             tol: Double = 1e-14): DenseVector[Double] = {
    val n = t.rows
    var pi = DenseVector.fill(n)(1.0 / n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta > tol) {
      val nxt = (leftMatvec(t, pi) + pi) * 0.5
      nxt := nxt / breeze.linalg.sum(nxt)
      delta = breeze.linalg.max(breeze.numerics.abs(nxt - pi))
      pi = nxt
      iter += 1
    }
    // fail LOUD on a maxIter bailout: for slowly-mixing chains (spectral
    // gap ~1e-9 at n~5e4) the damped iteration can exit still near its
    // uniform start, and a silently-wrong pi would poison every
    // downstream quantity. Reversible models never hit this (their pi is
    // exact from the MLE fixed point); non-reversible callers must raise
    // maxIter or relax tol deliberately.
    require(delta <= tol,
      s"power iteration did not converge: delta=$delta after $iter iterations " +
        s"(tol=$tol); raise maxIter or loosen tol for slowly-mixing chains")
    pi
  }

  /** Leading k eigenvalues of a REVERSIBLE T by Lanczos on the
    * pi-symmetrized operator S = D^{1/2} T D^{-1/2} (symmetric, same
    * spectrum; numeric/_eigen.py:289 `eigs` n_eigs branch parity).
    *
    * The dominant eigenpair is known analytically — S sqrt(pi) =
    * sqrt(pi) with eigenvalue exactly 1 — so it is DEFLATED: the Krylov
    * space is kept orthogonal to sqrt(pi) and lambda_1 = 1.0 is
    * prepended exactly. This matters for clustered spectra (a 50k-state
    * diffusive chain has lambda_2 - lambda_1 ~ 1e-9, unresolvable by
    * any practical subspace). Full reorthogonalization; subspace size
    * max(4k+20, 60, `subspace`) capped at n. */
  def eigenvaluesReversible(t: CSCMatrix[Double], pi: DenseVector[Double],
                            k: Int, subspace: Int = -1): Array[Double] = {
    if (k <= 0) return Array.empty
    val (qs, es, _) = lanczosDeflated(t, pi, k, subspace)
    val _ = qs // values-only path
    // 'LM' ordering (magnitude-descending real Ritz values), matching the
    // dense model's magnitude convention (Msm.scala timescales + _eigen.py
    // eigs which='LM'); lambda_1 = 1 is exact by deflation
    val rest = es.eigenvalues.toArray.sortBy(v => -math.abs(v)).take(k - 1)
    1.0 +: rest
  }

  /** Deflated Lanczos core on S = D^{1/2} T D^{-1/2}: returns the Krylov
    * basis, the tridiagonal eigendecomposition, and sqrtPi. */
  private def lanczosDeflated(t: CSCMatrix[Double], pi: DenseVector[Double],
                              k: Int, subspace: Int)
      : (Seq[DenseVector[Double]], breeze.linalg.eigSym.DenseEigSym, DenseVector[Double]) = {
    val n = t.rows
    val m = math.min(n, math.max(math.max(4 * k + 20, 60), subspace))
    val sqrtPi = pi.map(v => math.sqrt(math.max(v, 1e-300)))
    val v1 = sqrtPi / breeze.linalg.norm(sqrtPi)
    def matvec(x: DenseVector[Double]): DenseVector[Double] = {
      val scaled = DenseVector.tabulate(n)(i => x(i) / sqrtPi(i))
      val y = rightMatvec(t, scaled)
      DenseVector.tabulate(n)(i => y(i) * sqrtPi(i))
    }
    val qs = scala.collection.mutable.ArrayBuffer.empty[DenseVector[Double]]
    val alpha = new Array[Double](m)
    val beta = new Array[Double](m)
    // deterministic pseudo-random start, deflated against the known
    // dominant eigenvector (and re-deflated every step below)
    val rng = new java.util.SplittableRandom(42L)
    val q = DenseVector.fill(n)(rng.nextDouble() - 0.5)
    q := q - v1 * (q dot v1)
    q := q / breeze.linalg.norm(q)
    qs += q
    var j = 0
    var done = false
    while (j < m && !done) {
      var w = matvec(qs(j))
      alpha(j) = w dot qs(j)
      w = w - qs(j) * alpha(j)
      if (j > 0) w = w - qs(j - 1) * beta(j - 1)
      // full reorthogonalization incl. the deflated eigenvector
      var r = 0
      while (r < 2) {
        w = w - v1 * (w dot v1)
        qs.foreach(qi => w = w - qi * (w dot qi))
        r += 1
      }
      val nrm = breeze.linalg.norm(w)
      if (j < m - 1) {
        if (nrm < 1e-12) done = true // invariant subspace found
        else { beta(j) = nrm; qs += (w / nrm) }
      }
      j += 1
    }
    val steps = j
    val tri = DenseMatrix.zeros[Double](steps, steps)
    var i = 0
    while (i < steps) {
      tri(i, i) = alpha(i)
      if (i + 1 < steps) { tri(i, i + 1) = beta(i); tri(i + 1, i) = beta(i) }
      i += 1
    }
    (qs.toSeq.take(steps), breeze.linalg.eigSym(tri), sqrtPi)
  }

  /** Leading k eigenPAIRS of a reversible T: ALGEBRAIC-descending values
    * (the PCCA convention of dense/_pcca.py:253 — metastable structure
    * lives in the top positive spectrum) with pi-orthonormalized RIGHT
    * eigenvectors; pair 1 is the exact (1, positive-constant) by
    * deflation. Ritz vectors u_r = Q V_r, right eigenvectors
    * r = u / sqrtPi, pi-normalized — O(n * subspace) memory. */
  def eigenpairsReversible(t: CSCMatrix[Double], pi: DenseVector[Double],
                           k: Int, subspace: Int = -1)
      : (Array[Double], DenseMatrix[Double]) = {
    val n = t.rows
    require(k >= 1 && k <= n, s"need 1 <= k <= $n")
    val (qs, es, sqrtPi) = lanczosDeflated(t, pi, k, subspace)
    val steps = qs.length
    val order = (0 until steps).sortBy(i => -es.eigenvalues(i)).take(k - 1)
    val values = new Array[Double](k)
    val vecs = DenseMatrix.zeros[Double](n, k)
    // exact dominant pair: lambda = 1, right eigenvector = positive constant
    values(0) = 1.0
    val piNorm0 = math.sqrt((0 until n).map(i => pi(i)).sum) // ||1||_pi = 1
    for (i <- 0 until n) vecs(i, 0) = 1.0 / piNorm0
    for ((src, dst) <- order.zipWithIndex) {
      values(dst + 1) = es.eigenvalues(src)
      val ritz = DenseVector.zeros[Double](n)
      for (s <- 0 until steps) ritz += qs(s) * es.eigenvectors(s, src)
      // back-transform to a right eigenvector of T and pi-normalize
      val r = DenseVector.tabulate(n)(i => ritz(i) / sqrtPi(i))
      val nrm = math.sqrt((0 until n).map(i => r(i) * r(i) * pi(i)).sum)
      if (nrm > 1e-300) r := r / nrm
      for (i <- 0 until n) vecs(i, dst + 1) = r(i)
    }
    (values, vecs)
  }

  /** Leading k eigenvalues (largest magnitude Ritz values) of a general
    * T by Arnoldi — the non-reversible twin of `eigenvaluesReversible`
    * (scipy.sparse.linalg.eigs parity at _eigen.py:311). Returns real
    * parts of the top-k Ritz values sorted by magnitude. */
  def eigenvaluesArnoldi(t: CSCMatrix[Double], k: Int): Array[Double] = {
    val n = t.rows
    val m = math.min(n, math.max(4 * k + 20, 60))
    val qs = scala.collection.mutable.ArrayBuffer.empty[DenseVector[Double]]
    val h = DenseMatrix.zeros[Double](m + 1, m)
    val rng = new java.util.SplittableRandom(42L)
    val q0 = DenseVector.fill(n)(rng.nextDouble() - 0.5)
    qs += q0 / breeze.linalg.norm(q0)
    var j = 0
    var steps = m
    while (j < m && steps == m) {
      var w = rightMatvec(t, qs(j))
      var i = 0
      while (i <= j) {
        h(i, j) = w dot qs(i)
        w = w - qs(i) * h(i, j)
        i += 1
      }
      val nrm = breeze.linalg.norm(w)
      h(j + 1, j) = nrm
      if (nrm < 1e-12) steps = j + 1
      else if (j + 1 < m) qs += (w / nrm)
      j += 1
    }
    val hm = h(0 until steps, 0 until steps).copy
    val e = breeze.linalg.eig(hm)
    (0 until steps)
      .map(i => (math.hypot(e.eigenvalues(i), e.eigenvaluesComplex(i)), e.eigenvalues(i)))
      .sortBy(-_._1).take(k).map(_._2).toArray
  }

  // ------------------------------------------------- interior linear solves

  /** Interior-restricted matvec y = T_II x (I = states with sub(i) >= 0),
    * matrix-free over the CSC nonzeros. `sub` maps full index -> interior
    * index or -1. */
  private def interiorMatvec(t: CSCMatrix[Double], sub: Array[Int],
                             x: DenseVector[Double]): DenseVector[Double] = {
    val y = DenseVector.zeros[Double](x.length)
    var j = 0
    while (j < t.cols) {
      val ji = sub(j)
      if (ji >= 0) {
        val xj = x(ji)
        if (xj != 0.0) {
          var p = t.colPtrs(j)
          while (p < t.colPtrs(j + 1)) {
            val ii = sub(t.rowIndices(p))
            if (ii >= 0) y(ii) += t.data(p) * xj
            p += 1
          }
        }
      }
      j += 1
    }
    y
  }

  /** Solve (I - T_II) x = rhs for a REVERSIBLE T by preconditioned
    * conjugate gradient on the pi-symmetrized SPD form
    * M = D^{1/2} (I - T_II) D^{-1/2} (D = diag(pi_I)): the sparse twin of
    * the dense `\` solves in `Msm.committorForward` / `Msm.mfpt`
    * (reference tools/analysis sparse backend solves the same interior
    * systems with scipy spsolve — CG is the matrix-free equivalent and
    * needs only O(nnz) per iteration). Jacobi-preconditioned; T_II is
    * strictly substochastic on the interior of an irreducible chain, so
    * M is SPD and CG converges. */
  private[markov] def solveInterior(t: CSCMatrix[Double], pi: DenseVector[Double],
                                    interior: Array[Int], rhs: DenseVector[Double],
                                    maxIter: Int = 200000,
                                    tol: Double = 1e-13): DenseVector[Double] = {
    val k = interior.length
    if (k == 0) return DenseVector.zeros[Double](0)
    val sub = Array.fill(t.rows)(-1)
    var i = 0
    while (i < k) { sub(interior(i)) = i; i += 1 }
    val sqrtPi = DenseVector.tabulate(k)(i => math.sqrt(math.max(pi(interior(i)), 1e-300)))
    // M x = D^{1/2} (I - T_II) D^{-1/2} x
    def matvec(x: DenseVector[Double]): DenseVector[Double] = {
      val scaled = DenseVector.tabulate(k)(i => x(i) / sqrtPi(i))
      val tx = interiorMatvec(t, sub, scaled)
      DenseVector.tabulate(k)(i => (scaled(i) - tx(i)) * sqrtPi(i))
    }
    // Jacobi preconditioner: diag(M)_ii = 1 - T_ii
    val diag = {
      val d = DenseVector.ones[Double](k)
      var j = 0
      while (j < t.cols) {
        val ji = sub(j)
        if (ji >= 0) {
          var p = t.colPtrs(j)
          while (p < t.colPtrs(j + 1)) {
            if (t.rowIndices(p) == j) d(ji) = math.max(1.0 - t.data(p), 1e-12)
            p += 1
          }
        }
        j += 1
      }
      d
    }
    val b = DenseVector.tabulate(k)(i => rhs(i) * sqrtPi(i))
    val bNorm = math.max(breeze.linalg.norm(b), 1e-300)
    var x = DenseVector.zeros[Double](k)
    var r = b - matvec(x)
    var z = DenseVector.tabulate(k)(i => r(i) / diag(i))
    var p = z.copy
    var rz = r dot z
    var iter = 0
    while (iter < maxIter && breeze.linalg.norm(r) / bNorm > tol) {
      val ap = matvec(p)
      val alpha = rz / (p dot ap)
      x = x + p * alpha
      r = r - ap * alpha
      z = DenseVector.tabulate(k)(i => r(i) / diag(i))
      val rzNew = r dot z
      p = z + p * (rzNew / rz)
      rz = rzNew
      iter += 1
    }
    DenseVector.tabulate(k)(i => x(i) / sqrtPi(i))
  }

  // ---------------------------------------------------------------- model

  /** Sparse Markov state model on the largest SCC. */
  final case class SparseMarkovModel(transition: CSCMatrix[Double], tau: Int,
                                     states: Array[Int],
                                     piOpt: Option[DenseVector[Double]],
                                     reversible: Boolean) {
    def n: Int = transition.rows
    lazy val stationaryDistribution: DenseVector[Double] =
      piOpt.getOrElse(SparseMsm.stationaryDistribution(transition))
    /** Leading eigenvalues (incl. lambda_1 = 1). */
    def eigenvaluesK(k: Int): Array[Double] =
      if (reversible) eigenvaluesReversible(transition, stationaryDistribution, k)
      else eigenvaluesArnoldi(transition, k)
    /** Implied timescales from the k leading nontrivial eigenvalue
      * MAGNITUDES (|lambda| like the dense `MarkovStateModel.timescales`
      * / _markov_state_model.py). */
    def timescales(k: Int): Array[Double] =
      graft.linalg.LinAlg.timescales(
        eigenvaluesK(k + 1).drop(1).map(math.abs).toSeq, tau.toDouble).toArray
    /** ||pi' T - pi'||_inf — stationarity residual via sparse matvec. */
    def stationarityResidual: Double = {
      val pi = stationaryDistribution
      breeze.linalg.max(breeze.numerics.abs(leftMatvec(transition, pi) - pi))
    }
    /** max_i |sum_j T_ij - 1| via one pass over the nonzeros. */
    def rowSumResidual: Double = {
      val rs = DenseVector.zeros[Double](n)
      var j = 0
      while (j < transition.cols) {
        var p = transition.colPtrs(j)
        while (p < transition.colPtrs(j + 1)) {
          rs(transition.rowIndices(p)) += transition.data(p); p += 1
        }
        j += 1
      }
      breeze.linalg.max(breeze.numerics.abs(rs - 1.0))
    }
    /** PCCA+ coarse-graining at large n (dense twin: `Pcca(msm, m)`):
      * top-m eigenpairs from deflated Lanczos feed the same ISA +
      * opt_soft + fill_matrix core, and the coarse quantities use m
      * sparse matvecs — no dense n^2 matrix anywhere. Reversible models
      * only. Accuracy note: Ritz vectors require the top-m spectrum to
      * be resolved by the Krylov subspace — exactly the metastable
      * (gapped) regime PCCA targets; raise `subspace` if lambda_m sits
      * in a cluster. */
    def pcca(m: Int, subspace: Int = -1): Pcca.PccaModel = {
      require(reversible, "sparse PCCA needs a reversible model")
      val pi = stationaryDistribution
      val (_, evecs) = SparseMsm.eigenpairsReversible(transition, pi, m, subspace)
      Pcca.fromEigenvectors(pi, evecs, m, chi => {
        val out = DenseMatrix.zeros[Double](n, m)
        for (k <- 0 until m) {
          val col = SparseMsm.rightMatvec(transition, chi(::, k))
          for (i <- 0 until n) out(i, k) = col(i)
        }
        out
      })
    }

    /** Forward committor q+ (P(hit B before A)) by matrix-free CG on the
      * interior system — the sparse twin of `Msm.committorForward`
      * (tools/analysis _api.py:641, sparse backend). Reversible models
      * only (the symmetrization needs pi). */
    def committorForward(a: Set[Int], b: Set[Int]): DenseVector[Double] = {
      require(reversible, "sparse committor needs a reversible model (pi-symmetrized CG)")
      val interior = (0 until n).filterNot(s => a.contains(s) || b.contains(s)).toArray
      val pi = stationaryDistribution
      // rhs_i = sum_{s in B} T_is over the interior rows
      val bArr = b.toArray
      val inB = Array.fill(n)(false)
      bArr.foreach(inB(_) = true)
      val subIdx = Array.fill(n)(-1)
      interior.zipWithIndex.foreach { case (s, i) => subIdx(s) = i }
      val rhs = DenseVector.zeros[Double](interior.length)
      var j = 0
      while (j < transition.cols) {
        if (inB(j)) {
          var p = transition.colPtrs(j)
          while (p < transition.colPtrs(j + 1)) {
            val ii = subIdx(transition.rowIndices(p))
            if (ii >= 0) rhs(ii) += transition.data(p)
            p += 1
          }
        }
        j += 1
      }
      val sol = SparseMsm.solveInterior(transition, pi, interior, rhs)
      val out = DenseVector.zeros[Double](n)
      b.foreach(s => out(s) = 1.0)
      interior.zipWithIndex.foreach { case (s, i) => out(s) = sol(i) }
      out
    }

    /** Mean first-passage time into `target` by matrix-free CG — the
      * sparse twin of `Msm.mfpt` ((I - T_rest) m = tau). */
    def mfpt(target: Set[Int]): DenseVector[Double] = {
      require(reversible, "sparse mfpt needs a reversible model (pi-symmetrized CG)")
      val interior = (0 until n).filterNot(target.contains).toArray
      val pi = stationaryDistribution
      val rhs = DenseVector.fill(interior.length)(tau.toDouble)
      val sol = SparseMsm.solveInterior(transition, pi, interior, rhs)
      val out = DenseVector.zeros[Double](n)
      interior.zipWithIndex.foreach { case (s, i) => out(s) = sol(i) }
      out
    }

    /** Mean first-passage time from `origin` to `target` — the sparse
      * twin of `Msm.mfptBetweenSets` (stationary-weighted average of the
      * CG mfpt vector over the origin set). */
    def mfptBetweenSets(target: Set[Int], origin: Set[Int]): Double = {
      val tY = mfpt(target)
      val pi = stationaryDistribution
      val orig = origin.toSeq.sorted
      val z = orig.map(pi(_)).sum
      require(z > 0, "origin set has zero stationary mass")
      orig.map(x => pi(x) / z * tY(x)).sum
    }

    /** max_(ij) |pi_i T_ij - pi_j T_ji| over the nonzero pattern. */
    def detailedBalanceResidual: Double = {
      val pi = stationaryDistribution
      // flux matrix entries via hash of the pattern
      val flux = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
      var j = 0
      while (j < transition.cols) {
        var p = transition.colPtrs(j)
        while (p < transition.colPtrs(j + 1)) {
          val i = transition.rowIndices(p)
          flux((i, j)) = pi(i) * transition.data(p)
          p += 1
        }
        j += 1
      }
      if (flux.isEmpty) 0.0
      else flux.map { case ((i, j), f) => math.abs(f - flux.getOrElse((j, i), 0.0)) }.max
    }
  }

  /** Fit a sparse MSM from a distributed COO count frame: collect nnz
    * rows, restrict to the largest SCC, sparse MLE. */
  def fromCounts(counts: DataFrame, tau: Int, reversible: Boolean,
                 nStates: Int = -1): SparseMarkovModel =
    fromCoo(collectCoo(counts, nStates), tau, reversible)

  def fromCoo(coo: CooCounts, tau: Int, reversible: Boolean): SparseMarkovModel = {
    val lcc = largestConnectedSet(coo)
    val sub = coo.submatrix(lcc)
    if (reversible) {
      val (t, pi) = mleReversible(sub)
      SparseMarkovModel(t, tau, lcc, Some(pi), reversible = true)
    } else {
      SparseMarkovModel(mleNonReversible(sub), tau, lcc, None, reversible = false)
    }
  }

  /** api.py:768-956 auto dispatch: Left(dense MarkovStateModel) when
    * dimension^2 < 3*nnz, Right(sparse model) otherwise. */
  def fromCountsAuto(counts: DataFrame, tau: Int, reversible: Boolean,
                     nStates: Int = -1): Either[MarkovStateModel, SparseMarkovModel] = {
    val coo = collectCoo(counts, nStates)
    if (denseIsEfficient(coo.n, coo.nnz)) {
      val dense = DenseMatrix.zeros[Double](coo.n, coo.n)
      var k = 0
      while (k < coo.nnz) { dense(coo.rows(k), coo.cols(k)) += coo.vals(k); k += 1 }
      Left(Msm.fromDense(dense, tau, reversible))
    } else Right(fromCoo(coo, tau, reversible))
  }
}
