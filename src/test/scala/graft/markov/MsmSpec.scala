package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** MSM stack: counting vs hand oracle, SCC, MLE, and the analytic
  * birth-death-chain oracle (reference
  * tests/markov/msm/test_msm_basic_properties.py;
  * data/_birth_death_chain.py closed forms). */
class MsmSpec extends SparkSpec with Matchers {

  /** Analytic birth-death chain: p(i) up, q(i) down, stay otherwise.
    * Closed-form stationary distribution pi_i ∝ prod_{k<i} p_k/q_{k+1}. */
  def birthDeath(p: Array[Double], q: Array[Double]): (DenseMatrix[Double], DenseVector[Double]) = {
    val n = p.length
    val t = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      if (i < n - 1) t(i, i + 1) = p(i)
      if (i > 0) t(i, i - 1) = q(i)
      t(i, i) = 1.0 - (if (i < n - 1) p(i) else 0.0) - (if (i > 0) q(i) else 0.0)
    }
    val w = new Array[Double](n)
    w(0) = 1.0
    for (i <- 1 until n) w(i) = w(i - 1) * p(i - 1) / q(i)
    val z = w.sum
    (t, DenseVector(w.map(_ / z)))
  }

  test("two-state doctest counts: [0,0,1,1],[0,0,1] sliding tau=1 -> [[2,2],[0,1]]") {
    // reference markov/_transition_counting.py:617-623 doctest
    import spark.implicits._
    val dtraj = Seq((0L, 0L, 0), (0L, 1L, 0), (0L, 2L, 1), (0L, 3L, 1),
      (1L, 0L, 0), (1L, 1L, 0), (1L, 2L, 1))
      .toDF("traj_id", "t", "state")
    val counts = TransitionCounting.slidingCounts(dtraj, 1)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    counts shouldBe Map((0, 0) -> 2L, (0, 1) -> 2L, (1, 1) -> 1L)
  }

  test("nonreversible MLE row-normalizes") {
    val c = DenseMatrix((2.0, 2.0), (0.0, 1.0))
    val t = TransitionMatrixMle.nonReversible(c)
    t(0, 0) shouldBe 0.5 +- 1e-12
    t(0, 1) shouldBe 0.5 +- 1e-12
    t(1, 1) shouldBe 1.0 +- 1e-12
  }

  test("reversible MLE satisfies detailed balance and stochasticity") {
    val rnd = new scala.util.Random(3)
    val c = DenseMatrix.tabulate(4, 4)((_, _) => rnd.nextInt(50).toDouble + 1.0)
    val t = TransitionMatrixMle.reversible(c)
    val msm = MarkovStateModel(t)
    msm.isTransitionMatrix() shouldBe true
    msm.isReversible(1e-8) shouldBe true
  }

  test("stationary distribution of analytic birth-death chain") {
    val p = Array(0.3, 0.2, 0.4, 0.25, 0.0)
    val q = Array(0.0, 0.1, 0.3, 0.2, 0.5)
    val (t, piExact) = birthDeath(p, q)
    val msm = MarkovStateModel(t)
    msm.isTransitionMatrix() shouldBe true
    (0 until 5).foreach(i => msm.stationaryDistribution(i) shouldBe piExact(i) +- 1e-10)
  }

  test("birth-death committor matches closed form") {
    // For a birth-death chain, forward committor between state 0 and N-1
    // is q+(i) = sum_{k<i} prod(q/p) / sum_{k<N-1} prod(q/p)
    val p = Array(0.3, 0.2, 0.4, 0.25, 0.0)
    val q = Array(0.0, 0.1, 0.3, 0.2, 0.5)
    val (t, _) = birthDeath(p, q)
    val msm = MarkovStateModel(t)
    val qf = msm.committorForward(Set(0), Set(4))
    val ratios = (1 until 4).map(k => q(k) / p(k))
    val terms = 1.0 +: (1 to 3).map(m => ratios.take(m).product)
    val z = terms.sum
    val exact = (0 to 4).map {
      case 0 => 0.0
      case 4 => 1.0
      case i => terms.take(i).sum / z
    }
    (0 until 5).foreach(i => qf(i) shouldBe exact(i) +- 1e-10)
  }

  test("mfpt solves the linear system") {
    val p = Array(0.5, 0.0)
    val q = Array(0.0, 0.5)
    val (t, _) = birthDeath(p, q)  // symmetric 2-state flip with 0.5
    val msm = MarkovStateModel(t)
    val m = msm.mfpt(Set(1))
    m(0) shouldBe 2.0 +- 1e-10   // geometric with success prob 0.5
    m(1) shouldBe 0.0
  }

  test("SCC finds largest connected set") {
    // states 0,1 strongly connected; 2 transient into them; 3 isolated sink
    val c = DenseMatrix(
      (1.0, 2.0, 0.0, 0.0),
      (3.0, 0.0, 0.0, 0.0),
      (1.0, 0.0, 0.0, 0.0),
      (0.0, 0.0, 0.0, 5.0))
    val lcs = Connectivity.largestConnectedSet(c)
    lcs.toSet shouldBe Set(0, 1)
  }

  test("propagate converges to stationary distribution") {
    val rnd = new scala.util.Random(11)
    val c = DenseMatrix.tabulate(3, 3)((_, _) => rnd.nextInt(30).toDouble + 1.0)
    val t = TransitionMatrixMle.reversible(c)
    val msm = MarkovStateModel(t)
    val p = msm.propagate(DenseVector(1.0, 0.0, 0.0), 200)
    (0 until 3).foreach(i => p(i) shouldBe msm.stationaryDistribution(i) +- 1e-8)
  }
  test("girsanov-reweighted counts: unit weights reduce to plain counts; weights apply") {
    import spark.implicits._
    val dtraj = Seq((0L, 0L, 0), (0L, 1L, 1), (0L, 2L, 0), (0L, 3L, 1))
      .toDF("traj_id", "t", "state")
      .withColumn("g", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("logM", org.apache.spark.sql.functions.lit(0.0))
    val rw = TransitionCounting.girsanovReweightedCounts(dtraj, 1)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val plain = TransitionCounting.slidingCounts(dtraj, 1)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2).toDouble)).toMap
    rw shouldBe plain
    // non-trivial weights: g=2, logM=ln 2 per frame at tau=1 => weight = 2 * exp(-ln2) = 1
    val dtraj2 = dtraj
      .withColumn("g", org.apache.spark.sql.functions.lit(2.0))
      .withColumn("logM", org.apache.spark.sql.functions.lit(math.log(2.0)))
    val rw2 = TransitionCounting.girsanovReweightedCounts(dtraj2, 1)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // per-transition weight 2*exp(-ln 2) = 1, so reweighted == plain counts
    rw2.foreach { case (k, v) => v shouldBe plain(k) +- 1e-12 }
  }

  test("msm facade: submodel, trajectory weights, discrete VAMP score") {
    import spark.implicits._
    val chain = graft.data.MarkovSim.defaultBirthDeath
    val dtraj = graft.data.MarkovSim.simulate(spark, chain.transitionMatrix, 4, 2000, seed = 3L).cache()
    val counts = TransitionCounting.toDense(TransitionCounting.slidingCounts(dtraj, 1), chain.n)
    val msm = Msm.fromCounts(TransitionCounting.slidingCounts(dtraj, 1), chain.n, 1, reversible = true)

    // submodel: valid stochastic restriction with remapped labels
    val sub = msm.submodel(Seq(0, 1, 2))
    sub.n shouldBe 3
    sub.isTransitionMatrix(1e-9) shouldBe true
    sub.states.toSeq shouldBe Seq(0, 1, 2).map(msm.states(_))

    // trajectory weights: sum to 1; per-state weight = pi/hist
    val weighted = Msm.trajectoryWeights(dtraj, msm)
    val total = weighted.agg(org.apache.spark.sql.functions.sum("weight"))
      .collect()(0).getDouble(0)
    total shouldBe 1.0 +- 1e-9
    // reweighted expectation of the state index ~ stationary expectation
    val obsMean = weighted
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("weight * state")))
      .collect()(0).getDouble(0)
    val pi = msm.stationaryDistribution
    val expected = (0 until msm.n).map(i => pi(i) * msm.states(i)).sum
    obsMean shouldBe expected +- 1e-9

    // discrete VAMP-2 self-score: in (1, n]; equals sum of squared singular
    // values of the empirical koopman operator
    val s2 = Msm.score(counts, method = "VAMP2")
    s2 should be > 1.0
    s2 should be <= chain.n.toDouble + 1e-9
    val s1 = Msm.score(counts, method = "VAMP1")
    s1 should be >= s2 - 1e-9 // sigma <= 1 => sum sigma >= sum sigma^2
  }

  test("msm collection: one model per connected component, largest first") {
    import spark.implicits._
    // two disconnected blocks: {0,1} (heavy) and {2,3} (light)
    val dtraj = (Seq.fill(50)(Seq(0, 1, 0, 1)).flatten ++ Seq.fill(10)(Seq(2, 3, 2)).flatten)
      .zipWithIndex.map { case (st, i) =>
        ((if (st <= 1) 0L else 1L), i.toLong, st)
      }.toDF("traj_id", "t", "state")
    val counts = TransitionCounting.slidingCounts(dtraj, 1)
    val coll = Msm.collectionFromCounts(counts, 4, tau = 1)
    coll.nConnectedSets shouldBe 2
    coll.model.states.toSeq shouldBe Seq(0, 1)
    val second = coll.select(1)
    second.model.states.toSeq shouldBe Seq(2, 3)
    coll.models.foreach(m => m.isTransitionMatrix(1e-9) shouldBe true)
  }

}
