package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Sparse large-n MSM path (reference _transition_counting.py:471-473
  * sparse_return + estimation/api.py:768-956 auto dispatch +
  * numeric/_eigen.py:289 iterative eigs). */
class SparseMsmSpec extends SparkSpec with Matchers {

  private def maxAbs(xs: Iterable[Double]) =
    if (xs.isEmpty) 0.0 else xs.map(math.abs).max

  test("sparse MSM on a 50k-state chain: no dense n^2 allocation, correct pi") {
    // lazy birth-death chain, 50,000 states: c(i,i+1) = c(i+1,i) = 10
    // plus self-loops c(i,i) = 5 (aperiodic — a pure path graph is
    // bipartite with lambda = -1). Dense would need 8 * 5e4^2 = 20 GB —
    // running at all proves the path is O(nnz). Reversible MLE on
    // symmetric counts converges immediately with pi_i proportional to
    // the symmetrized row sum csym_i: 20+20+10 inside, 20+10 at the ends.
    val n = 50000
    import spark.implicits._
    val counts = spark.range(n - 1).select(
      col("id").cast("int").as("s0"),
      (col("id") + 1).cast("int").as("s1"),
      lit(10L).as("cnt"))
      .unionAll(spark.range(n - 1).select(
        (col("id") + 1).cast("int").as("s0"),
        col("id").cast("int").as("s1"),
        lit(10L).as("cnt")))
      .unionAll(spark.range(n).select(
        col("id").cast("int").as("s0"),
        col("id").cast("int").as("s1"),
        lit(5L).as("cnt")))
    val model = SparseMsm.fromCounts(counts, tau = 1, reversible = true)
    model.n shouldBe n
    model.transition.activeSize should be <= 3 * n

    val pi = model.stationaryDistribution
    math.abs(bsum(pi) - 1.0) should be < 1e-10 // 50k-term summation rounding
    val denom = 50.0 * (n - 2) + 2 * 30.0 // total symmetrized mass
    math.abs(pi(0) - 30.0 / denom) should be < 1e-12
    math.abs(pi(n / 2) - 50.0 / denom) should be < 1e-12

    model.rowSumResidual should be < 1e-12
    model.stationarityResidual should be < 1e-10
    model.detailedBalanceResidual should be < 1e-12

    // diffusive spectrum: lambda_2 = 1 - O(1/n^2), a ~4e-9 gap no Krylov
    // subspace resolves exactly — deflation pins lambda_1 = 1.0 and the
    // remaining Ritz values must sit inside the top cluster, ordered
    val eigs = model.eigenvaluesK(4)
    eigs(0) shouldBe 1.0
    eigs.sliding(2).foreach { case Array(a, b) => a should be >= b - 1e-12 }
    eigs.tail.foreach { l => l should be > 0.9; l should be < 1.0 }

    val ts = model.timescales(2)
    ts.foreach(t => assert(t > 0 && !t.isNaN))
    ts(0) should be >= ts(1)
  }

  test("sparse path matches the dense path on a small random chain") {
    val n = 60
    val rng = new java.util.SplittableRandom(7L)
    // random sparse counts with a guaranteed strongly connected ring
    val entries = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    for (i <- 0 until n) entries((i, (i + 1) % n)) = 1.0 + rng.nextInt(5)
    for (_ <- 0 until 300) {
      val i = rng.nextInt(n); val j = rng.nextInt(n)
      entries((i, j)) = entries.getOrElse((i, j), 0.0) + 1.0 + rng.nextInt(9)
    }
    val dense = DenseMatrix.zeros[Double](n, n)
    entries.foreach { case ((i, j), v) => dense(i, j) = v }
    import spark.implicits._
    val coo = entries.toSeq.map { case ((i, j), v) => (i, j, v.toLong) }
      .toDF("s0", "s1", "cnt")

    // non-reversible: T must equal dense row-normalization entrywise
    val sNon = SparseMsm.fromCounts(coo, tau = 1, reversible = false)
    val dNon = Msm.fromDense(dense, tau = 1, reversible = false)
    sNon.states shouldBe dNon.states
    val tNon = dNon.transitionMatrix
    maxAbs(sNon.transition.activeIterator.map { case ((i, j), v) => v - tNon(i, j) }.toSeq) should be < 1e-12

    // reversible: same fixed point as the dense MLE
    val sRev = SparseMsm.fromCoo(SparseMsm.collectCoo(coo), tau = 1, reversible = true)
    val dRev = Msm.fromDense(dense, tau = 1, reversible = true)
    val tRev = dRev.transitionMatrix
    maxAbs(sRev.transition.activeIterator.map { case ((i, j), v) => v - tRev(i, j) }.toSeq) should be < 1e-7
    // both iterations converge to the same fixed point but track
    // different stopping criteria (absolute vs relative x_i change)
    maxAbs((sRev.stationaryDistribution - dRev.stationaryDistribution).toArray.toSeq) should be < 1e-7

    // iterative eigenvalues vs dense Breeze eig (reversible, top 5 by
    // MAGNITUDE — the 'LM' / dense-model convention)
    val sparseEigs = sRev.eigenvaluesK(5)
    val denseEigs = {
      val e = breeze.linalg.eig(tRev)
      (0 until tRev.rows).map(i => e.eigenvalues(i))
        .sortBy(v => -math.abs(v)).take(5)
    }
    // the two MLE fixed points themselves agree to ~1e-8 (different
    // stopping criteria), which bounds the eigenvalue agreement
    (0 until 5).foreach { i =>
      math.abs(sparseEigs(i) - denseEigs(i)) should be < 1e-7
    }

    // Arnoldi (general path) agrees on the leading eigenvalues too
    val arnoldi = SparseMsm.eigenvaluesArnoldi(sRev.transition, 3)
    (0 until 3).foreach { i =>
      math.abs(arnoldi(i) - denseEigs(i)) should be < 1e-6
    }
  }

  test("sparse CG committor/mfpt match the dense linear solves") {
    val n = 60
    val rng = new java.util.SplittableRandom(7L)
    val entries = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    for (i <- 0 until n) entries((i, (i + 1) % n)) = 1.0 + rng.nextInt(5)
    for (_ <- 0 until 300) {
      val i = rng.nextInt(n); val j = rng.nextInt(n)
      entries((i, j)) = entries.getOrElse((i, j), 0.0) + 1.0 + rng.nextInt(9)
    }
    val dense = DenseMatrix.zeros[Double](n, n)
    entries.foreach { case ((i, j), v) => dense(i, j) = v }
    import spark.implicits._
    val coo = entries.toSeq.map { case ((i, j), v) => (i, j, v.toLong) }
      .toDF("s0", "s1", "cnt")
    val sRev = SparseMsm.fromCoo(SparseMsm.collectCoo(coo), tau = 1, reversible = true)
    val dRev = Msm.fromDense(dense, tau = 1, reversible = true)
    // same count graph -> same model; solves must agree to solver tol
    val a = Set(0, 1); val b = Set(n - 1, n - 2)
    val qs = sRev.committorForward(a, b)
    val qd = dRev.committorForward(a, b)
    maxAbs((qs - qd).toArray.toSeq) should be < 1e-6
    val ms = sRev.mfpt(Set(n - 1))
    val md = dRev.mfpt(Set(n - 1))
    maxAbs((0 until n).map(i => (ms(i) - md(i)) / math.max(1.0, md(i)))) should be < 1e-6

    // set-to-set mfpt (mfpt_between_sets parity, sparse vs dense vs manual)
    val orig = Set(2, 3, 4)
    val sBet = sRev.mfptBetweenSets(Set(n - 1), orig)
    val dBet = dRev.mfptBetweenSets(Set(n - 1), orig)
    math.abs(sBet - dBet) / dBet should be < 1e-6
    val pi = dRev.stationaryDistribution
    val z = orig.toSeq.map(pi(_)).sum
    val manual = orig.toSeq.map(x => pi(x) / z * md(x)).sum
    math.abs(dBet - manual) should be < 1e-10
  }

  test("sparse committor on a 5000-state chain is the analytic linear ramp") {
    // lazy symmetric birth-death chain: the forward committor between the
    // two ends of a symmetric walk is exactly linear in the state index,
    // independent of the laziness
    val n = 5000
    import spark.implicits._
    val counts = spark.range(n - 1).select(
      col("id").cast("int").as("s0"), (col("id") + 1).cast("int").as("s1"),
      lit(10L).as("cnt"))
      .unionAll(spark.range(n - 1).select((col("id") + 1).cast("int").as("s0"),
        col("id").cast("int").as("s1"), lit(10L).as("cnt")))
      .unionAll(spark.range(n).select(col("id").cast("int").as("s0"),
        col("id").cast("int").as("s1"), lit(5L).as("cnt")))
    val model = SparseMsm.fromCounts(counts, tau = 1, reversible = true)
    val q = model.committorForward(Set(0), Set(n - 1))
    q(0) shouldBe 0.0
    q(n - 1) shouldBe 1.0
    maxAbs((0 until n).map(i => q(i) - i.toDouble / (n - 1))) should be < 1e-6

    // mfpt: gate the linear system residual (I - T_rest) m = tau via
    // sparse matvec — analytic values grow O(n^2) and would drown tol
    val m = model.mfpt(Set(n - 1))
    m(n - 1) shouldBe 0.0
    val t = model.transition
    val resid = (0 until n - 1).map { i =>
      var acc = m(i) // (I m)_i
      // subtract (T m)_i over row i of the CSC
      var j = 0
      var dot = 0.0
      while (j < t.cols) {
        var p = t.colPtrs(j)
        while (p < t.colPtrs(j + 1)) {
          if (t.rowIndices(p) == i && j != n - 1) dot += t.data(p) * m(j)
          p += 1
        }
        j += 1
      }
      math.abs(acc - dot - 1.0) / math.max(1.0, m(i))
    }
    maxAbs(resid.take(50)) should be < 1e-7 // spot-check rows (O(n*nnz) full loop)
  }

  test("sparse PCCA recovers metastable blocks and matches dense co-membership") {
    // 3 metastable blocks of 20 states: dense-ish random intra-block
    // counts, weak inter-block links
    val n = 60
    val rng = new java.util.SplittableRandom(3L)
    val entries = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
    def block(i: Int) = i / 20
    for (b <- 0 until 3; _ <- 0 until 400) {
      val i = b * 20 + rng.nextInt(20); val j = b * 20 + rng.nextInt(20)
      entries((i, j)) = entries.getOrElse((i, j), 0.0) + 1.0 + rng.nextInt(4)
    }
    for (b <- 0 until 3) { // weak bridges both ways
      val i = b * 20; val j = ((b + 1) % 3) * 20
      entries((i, j)) = entries.getOrElse((i, j), 0.0) + 1.0
      entries((j, i)) = entries.getOrElse((j, i), 0.0) + 1.0
    }
    val dense = DenseMatrix.zeros[Double](n, n)
    entries.foreach { case ((i, j), v) => dense(i, j) = v }
    import spark.implicits._
    val coo = entries.toSeq.map { case ((i, j), v) => (i, j, v.toLong) }
      .toDF("s0", "s1", "cnt")

    val sModel = SparseMsm.fromCoo(SparseMsm.collectCoo(coo), tau = 1, reversible = true)
    val sPcca = sModel.pcca(3)
    val dPcca = Pcca(Msm.fromDense(dense, tau = 1, reversible = true), 3)

    // crisp assignments must recover the 3 blocks (up to label permutation)
    (0 until n).foreach { i =>
      sPcca.assignments(i) shouldBe sPcca.assignments(block(i) * 20)
    }
    sPcca.assignments.distinct.length shouldBe 3

    // permutation-invariant parity with the dense path: co-membership
    // matrices chi chi' must agree elementwise
    val sCo = sPcca.memberships * sPcca.memberships.t
    val dCo = dPcca.memberships * dPcca.memberships.t
    maxAbs(for (i <- 0 until n; j <- 0 until n) yield sCo(i, j) - dCo(i, j)) should be < 1e-4

    // model contracts: membership rows are distributions, coarse pi sums 1,
    // coarse T rows sum to 1
    (0 until n).foreach { i =>
      math.abs((0 until 3).map(sPcca.memberships(i, _)).sum - 1.0) should be < 1e-12
    }
    math.abs(bsum(sPcca.coarsePi) - 1.0) should be < 1e-12
    (0 until 3).foreach { a =>
      math.abs(bsum(sPcca.coarseT(a, ::).t) - 1.0) should be < 1e-8
    }

    // metastable_distributions (Bayesian inversion, _pcca.py:54): rows are
    // distributions over states, and the unnormalized identity
    // B(a,i) * Z_a = chi(i,a) pi(i) holds with Z_a = sum_i chi(i,a) pi(i)
    val piS = sModel.stationaryDistribution
    (0 until 3).foreach { a =>
      math.abs(bsum(sPcca.metastableDistributions(a, ::).t) - 1.0) should be < 1e-12
      val z = (0 until n).map(i => sPcca.memberships(i, a) * piS(i)).sum
      (0 until n).foreach { i =>
        math.abs(sPcca.metastableDistributions(a, i) * z -
          sPcca.memberships(i, a) * piS(i)) should be < 1e-12
      }
    }
  }

  test("sparse PCCA on a 30k-state metastable graph (no dense allocation)") {
    // two 15k-state FAST-MIXING circulant halves (steps 1/37/1024 — an
    // expander-like intra spectrum with lambda_intra <~ 0.97) joined by
    // one weak bridge, so the crossing mode (~1 - 1e-6) is the isolated
    // lambda_2 PCCA needs. A plain diffusive chain would NOT work here:
    // its intra-half modes cluster against the crossing mode (gaps ~1e-9)
    // and no practical Krylov subspace separates them — PCCA's own
    // applicability condition (a gapped metastable spectrum).
    val n = 30000
    import spark.implicits._
    val half = n / 2
    val steps = Seq(1, 37, 1024)
    def halfCounts(off: Int) = steps.map { c =>
      spark.range(half).select(
        (col("id") + off).cast("int").as("s0"),
        (pmod(col("id") + c, lit(half)) + off).cast("int").as("s1"),
        lit(10L).as("cnt"))
    }.reduce(_ unionAll _)
    def sym(df: org.apache.spark.sql.DataFrame) =
      df.unionAll(df.select(col("s1").as("s0"), col("s0").as("s1"), col("cnt")))
    val counts = sym(halfCounts(0)).unionAll(sym(halfCounts(half)))
      .unionAll(sym(Seq((half - 1, half, 1L)).toDF("s0", "s1", "cnt")))
    val model = SparseMsm.fromCounts(counts, tau = 1, reversible = true)
    val pcca = model.pcca(2)
    // the two halves are the two metastable sets
    pcca.assignments(100) shouldBe pcca.assignments(half - 100)
    pcca.assignments(half + 100) shouldBe pcca.assignments(n - 100)
    pcca.assignments(100) should not be pcca.assignments(half + 100)
    math.abs(bsum(pcca.coarsePi) - 1.0) should be < 1e-10
    // crossing is rare: the coarse matrix must be strongly diagonal
    pcca.coarseT(0, 0) should be > 0.99
    pcca.coarseT(1, 1) should be > 0.99
  }

  test("sparse Tarjan SCC matches dense connectivity and the BFS cross-check") {
    val n = 12
    // two SCCs {0..5} ring and {6..9} ring, plus a one-way bridge 5 -> 6
    // and isolated-ish tail 10 -> 11
    val edges = (0 until 6).map(i => (i, (i + 1) % 6, 3.0)) ++
      (6 until 10).map(i => (i, if (i == 9) 6 else i + 1, 2.0)) ++
      Seq((5, 6, 1.0), (10, 11, 1.0))
    val coo = SparseMsm.CooCounts(n, edges.map(_._1).toArray,
      edges.map(_._2).toArray, edges.map(_._3).toArray)
    val dense = DenseMatrix.zeros[Double](n, n)
    edges.foreach { case (i, j, v) => dense(i, j) = v }

    val sparseSets = SparseMsm.connectedSets(coo).map(_.toSeq)
    val denseSets = Connectivity.connectedSets(dense).map(_.toSeq)
    sparseSets shouldBe denseSets
    sparseSets.head shouldBe (0 until 6)

    val lcc = SparseMsm.largestConnectedSet(coo)
    SparseMsm.sccOfViaBfs(coo, lcc(0)).toSeq shouldBe lcc.toSeq
  }

  test("matvec correlation/relaxation match explicit dense propagation " +
       "(sparse fingerprints path)") {
    // birth-death chain in the reference fingerprints_test.py shape
    val n = 10
    val p = DenseVector.fill(n)(0.5); p(n - 1) = 0.0; p(4) = 0.01
    val q = DenseVector.fill(n)(0.5); q(0) = 0.0; q(6) = 0.1
    val dense = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      if (i < n - 1) dense(i, i + 1) = p(i)
      if (i > 0) dense(i, i - 1) = q(i)
      dense(i, i) = 1.0 - p(i) - q(i)
    }
    val csc = {
      val b = new breeze.linalg.CSCMatrix.Builder[Double](n, n)
      for (i <- 0 until n; j <- 0 until n if dense(i, j) != 0.0)
        b.add(i, j, dense(i, j))
      b.result
    }
    val pi = SparseMsm.stationaryDistribution(csc)
    val obs1 = DenseVector.zeros[Double](n); obs1(0) = 1.0; obs1(1) = 1.0
    val obs2 = DenseVector.zeros[Double](n); obs2(8) = 1.0; obs2(9) = 1.0
    val p0 = DenseVector.zeros[Double](n); (0 until 4).foreach(p0(_) = 0.25)
    val times = Seq(1, 5, 10, 20)

    // dense reference: corr(t) = (pi .* obs1)' T^t obs2 via matrix powers
    def densePow(t: Int): DenseMatrix[Double] =
      (1 until t).foldLeft(DenseMatrix.eye[Double](n) * dense)((m, _) => m * dense)
    val w = pi *:* obs1
    val corrDense = times.map(t => w dot (densePow(t) * obs2))
    val corrSparse = SparseMsm.correlationMatvec(csc, pi, obs1, obs2, times)
    maxAbs(corrSparse.zip(corrDense).map { case (a, b) => a - b }) should be < 1e-13

    val relaxDense = times.map(t => p0 dot (densePow(t) * obs1))
    val relaxSparse = SparseMsm.relaxationMatvec(csc, p0, obs1, times)
    maxAbs(relaxSparse.zip(relaxDense).map { case (a, b) => a - b }) should be < 1e-13

    // unsorted times return in caller order
    val shuffled = SparseMsm.relaxationMatvec(csc, p0, obs1, Seq(20, 1, 10, 5))
    shuffled(0) shouldBe relaxSparse(3)
    shuffled(1) shouldBe relaxSparse(0)

    // fingerprint amplitude of the stationary component (r = 1, l = pi)
    // is E_pi[obs1] * E_pi[obs2]
    val amp0 = SparseMsm.fingerprintAmplitudes(
      Seq(DenseVector.ones[Double](n)), Seq(pi), pi *:* obs1, obs2)(0)
    math.abs(amp0 - (pi dot obs1) * (pi dot obs2)) should be < 1e-14
  }

  test("auto dispatch follows the api.py dimension^2 < 3*nnz rule") {
    import spark.implicits._
    // 3x3 fully dense counts -> dense (9 < 3*9)
    val denseCounts = (for (i <- 0 until 3; j <- 0 until 3) yield (i, j, 5L))
      .toDF("s0", "s1", "cnt")
    SparseMsm.fromCountsAuto(denseCounts, 1, reversible = false).isLeft shouldBe true
    // 100-state ring: nnz=100, 10000 >= 300 -> sparse
    val ringCounts = (0 until 100).map(i => (i, (i + 1) % 100, 5L))
      .toDF("s0", "s1", "cnt")
    SparseMsm.fromCountsAuto(ringCounts, 1, reversible = false).isRight shouldBe true
  }
}
