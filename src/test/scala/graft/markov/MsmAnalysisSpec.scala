package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.scalatest.matchers.should.Matchers

/** MSM analysis long tail (reference tests/markov/tools/analysis:
  * expected_counts doctest, rdl orthonormality, fingerprints on
  * birth-death, hitting probabilities, fixed-pi MLE). */
class MsmAnalysisSpec extends SparkSpec with Matchers {

  val chain = MarkovSim.defaultBirthDeath
  val t: DenseMatrix[Double] = chain.transitionMatrix
  val pi: DenseVector[Double] = chain.stationaryDistribution

  test("rdl reversible: L R = I, L0 = pi, R0 = 1, reconstructs T") {
    val (r, vals, l) = MsmAnalysis.rdlReversible(t)
    val n = t.rows
    val lr = l * r
    breeze.linalg.max(breeze.numerics.abs(lr - DenseMatrix.eye[Double](n))) should be < 1e-8
    (0 until n).foreach { i =>
      l(0, i) shouldBe pi(i) +- 1e-8
      r(i, 0) shouldBe 1.0 +- 1e-8
    }
    // T = R D L
    val recon = DenseMatrix.tabulate(n, n)((i, j) =>
      (0 until n).map(m => r(i, m) * vals(m) * l(m, j)).sum)
    breeze.linalg.max(breeze.numerics.abs(recon - t)) should be < 1e-8
  }

  test("expected_counts matches reference doctest") {
    // _api.py:758 doctest
    val tt = DenseMatrix((0.9, 0.1, 0.0), (0.5, 0.0, 0.5), (0.0, 0.1, 0.9))
    val p0 = DenseVector(1.0, 0.0, 0.0)
    val ec = MsmAnalysis.expectedCounts(tt, p0, 100)
    ec(0, 0) shouldBe 45.44616147 +- 1e-6
    ec(0, 1) shouldBe 5.0495735 +- 1e-6
    ec(1, 0) shouldBe 4.50413223 +- 1e-6
    ec(1, 2) shouldBe 4.50413223 +- 1e-6
    ec(2, 1) shouldBe 4.04960006 +- 1e-6
    ec(2, 2) shouldBe 36.44640052 +- 1e-6
    ec(0, 2) shouldBe 0.0
  }

  test("stationary expected counts = N diag(pi) T") {
    val ec = MsmAnalysis.expectedCountsStationary(t, 50, Some(pi))
    ec(0, 1) shouldBe 50 * pi(0) * t(0, 1) +- 1e-12
  }

  test("correlation: decays from variance to squared mean of observable") {
    val obs = DenseVector.tabulate(chain.n)(i => i.toDouble)
    val corr = MsmAnalysis.correlation(t, obs, obs, Seq(0, 1, 500), Some(pi))
    val mean = pi dot obs
    val second = (0 until chain.n).map(i => pi(i) * obs(i) * obs(i)).sum
    corr(0) shouldBe second +- 1e-9          // E[obs^2] at time 0
    corr(2) shouldBe mean * mean +- 1e-6     // decorrelates to mean^2
    corr(1) should be < corr(0)
    corr(1) should be > corr(2)
  }

  test("relaxation approaches stationary expectation") {
    val obs = DenseVector.tabulate(chain.n)(i => i.toDouble)
    val p0 = DenseVector.zeros[Double](chain.n); p0(0) = 1.0
    val rel = MsmAnalysis.relaxation(t, p0, obs, Seq(0, 1000))
    rel(0) shouldBe 0.0 +- 1e-12
    rel(1) shouldBe (pi dot obs) +- 1e-6
  }

  test("fingerprint correlation: stationary amplitude = mean^2; sum = corr(0)") {
    val obs = DenseVector.tabulate(chain.n)(i => i.toDouble)
    val (ts, amps) = MsmAnalysis.fingerprintCorrelation(t, obs, obs)
    ts.head.isPosInfinity shouldBe true
    val mean = pi dot obs
    amps.head shouldBe mean * mean +- 1e-8
    // sum over all amplitudes = instantaneous autocorrelation E[obs^2]
    val second = (0 until chain.n).map(i => pi(i) * obs(i) * obs(i)).sum
    amps.sum shouldBe second +- 1e-8
  }

  test("hitting probability: all ones for reachable target; zeros on absorbing traps") {
    val h = MsmAnalysis.hittingProbability(t, Set(chain.n - 1))
    (0 until chain.n).foreach(i => h(i) shouldBe 1.0 +- 1e-9) // irreducible chain
    // chain with an absorbing trap at 0
    val tt = DenseMatrix((1.0, 0.0, 0.0), (0.3, 0.4, 0.3), (0.0, 0.2, 0.8))
    val h2 = MsmAnalysis.hittingProbability(tt, Set(2))
    h2(2) shouldBe 1.0
    h2(0) shouldBe 0.0
    h2(1) should be > 0.0
    h2(1) should be < 1.0
    // closed 2-state trap (no single absorbing diagonal): must get 0, not a
    // singular solve
    val t3 = DenseMatrix(
      (0.5, 0.5, 0.0, 0.0),
      (0.5, 0.5, 0.0, 0.0),
      (0.1, 0.1, 0.5, 0.3),
      (0.0, 0.0, 0.0, 1.0))
    val h3 = MsmAnalysis.hittingProbability(t3, Set(3))
    h3(0) shouldBe 0.0
    h3(1) shouldBe 0.0
    h3(2) should be > 0.0
    h3(2) should be < 1.0
    h3(3) shouldBe 1.0
  }

  test("pseudo and log generators: rows sum to zero, expm consistency direction") {
    val k = MsmAnalysis.pseudoGenerator(t, 1.0)
    (0 until chain.n).foreach(i => bsum(k(i, ::).t) shouldBe 0.0 +- 1e-12)
    val kl = MsmAnalysis.logGenerator(t, 1.0)
    (0 until chain.n).foreach(i => bsum(kl(i, ::).t) shouldBe 0.0 +- 1e-9)
    // off-diagonals nonnegative
    for (i <- 0 until chain.n; j <- 0 until chain.n if i != j) {
      k(i, j) should be >= 0.0
      kl(i, j) should be >= -1e-12
    }
  }

  test("fixed-pi reversible MLE: stochastic, detailed balance w.r.t. given pi") {
    val rnd = new scala.util.Random(9)
    val c = DenseMatrix.tabulate(4, 4)((_, _) => rnd.nextInt(80).toDouble + 1.0)
    val mu = DenseVector(0.1, 0.2, 0.3, 0.4)
    val tFix = MsmAnalysis.reversibleMleFixedPi(c, mu)
    (0 until 4).foreach(i => bsum(tFix(i, ::).t) shouldBe 1.0 +- 1e-9)
    for (i <- 0 until 4; j <- 0 until 4)
      mu(i) * tFix(i, j) shouldBe mu(j) * tFix(j, i) +- 1e-9
    // stationary distribution of the result IS mu
    val piEst = graft.linalg.LinAlg.stationaryDistribution(tFix)
    (0 until 4).foreach(i => piEst(i) shouldBe mu(i) +- 1e-8)
  }

  test("sampleByState: bounded, seeded-deterministic, correct states") {
    val dtraj = MarkovSim.simulate(spark, t, 4, 500, seed = 3L).cache()
    val s1 = MsmAnalysis.sampleByState(dtraj, 10, seed = 5L)
    val s2 = MsmAnalysis.sampleByState(dtraj, 10, seed = 5L)
    s1.collect().toSet shouldBe s2.collect().toSet
    val counts = s1.groupBy("state").count().collect()
    counts.foreach(_.getLong(1) should be <= 10L)
    counts.length shouldBe chain.n
    // samples actually come from frames with that state
    import org.apache.spark.sql.functions.col
    val joined = s1.withColumnRenamed("state", "s")
      .join(dtraj, Seq("traj_id", "t"))
    joined.where(col("s") =!= col("state")).count() shouldBe 0L
  }

  test("var_cutoff picks minimal dimension") {
    graft.decomposition.Dim.fromVarCutoff(Seq(0.9, 0.5, 0.1), 0.5) shouldBe 1
    graft.decomposition.Dim.fromVarCutoff(Seq(0.9, 0.5, 0.1), 0.95) shouldBe 2
    graft.decomposition.Dim.fromVarCutoff(Seq(0.9, 0.5, 0.1), 1.0) shouldBe 3
  }

  test("dropNonFinite and selectColumns") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L, Seq(1.0, 2.0)),
      (0L, 1L, Seq(Double.NaN, 2.0)),
      (0L, 2L, Seq(1.0, Double.PositiveInfinity)),
      (0L, 3L, Seq(3.0, 4.0))
    ).toDF("traj_id", "t", "features")
    val clean = graft.core.Trajectories.dropNonFinite(df)
    clean.count() shouldBe 2
    val sel = graft.core.Trajectories.selectColumns(clean, Seq(1))
    sel.select(org.apache.spark.sql.functions.expr("features[0]"))
      .collect().map(_.getDouble(0)).toSet shouldBe Set(2.0, 4.0)
  }

  test("sampleByDistribution: frequencies follow the distributions, deterministic") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val rows = (0L until 4L).flatMap(id => (0L until 500L).map(t =>
      (id, t, rng.nextInt(4))))
    val dtraj = rows.toDF("traj_id", "t", "state")
    val dists = Seq(Array(0.7, 0.3, 0.0, 0.0), Array(0.0, 0.0, 0.5, 0.5))
    val out = MsmAnalysis.sampleByDistribution(dtraj, dists, nSample = 400, seed = 5L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    out.length shouldBe 800
    // every sampled frame really has the sampled state
    val stateOf = rows.map { case (id, t, s) => (id, t) -> s }.toMap
    out.foreach { case (_, _, s, id, t) => stateOf((id, t)) shouldBe s }
    // distribution 0 only samples states {0, 1} with ~70/30 frequency
    val d0 = out.filter(_._1 == 0).map(_._3)
    d0.forall(s => s == 0 || s == 1) shouldBe true
    val frac0 = d0.count(_ == 0).toDouble / d0.length
    frac0 shouldBe 0.7 +- 0.08
    // distribution 1 only samples {2, 3}
    out.filter(_._1 == 1).map(_._3).forall(s => s == 2 || s == 3) shouldBe true
    // deterministic
    val again = MsmAnalysis.sampleByDistribution(dtraj, dists, nSample = 400, seed = 5L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    again.toSet shouldBe out.toSet
  }

  test("cvSplitTrajs: whole trajectories split, disjoint and exhaustive") {
    import spark.implicits._
    val rows = (0L until 20L).flatMap(id => (0L until 10L).map(t =>
      (id, t, Seq(id.toDouble, t.toDouble))))
    val traj = rows.toDF("traj_id", "t", "features")
    val (tr, te) = graft.decomposition.Scoring.cvSplitTrajs(traj, seed = 3L)
    val trIds = tr.select("traj_id").distinct().collect().map(_.getLong(0)).toSet
    val teIds = te.select("traj_id").distinct().collect().map(_.getLong(0)).toSet
    (trIds & teIds) shouldBe empty
    (trIds | teIds) shouldBe (0L until 20L).toSet
    trIds.size should be > 3
    teIds.size should be > 3
    // whole trajectories: every id keeps all 10 frames on its side
    tr.groupBy("traj_id").count().collect().foreach(_.getLong(1) shouldBe 10L)
  }
}
