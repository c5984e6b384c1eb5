package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** TRAM (reference tests/markov/msm/test_tram.py strategy: multi-ensemble
  * data from Metropolis-biased chains; TRAM recovers the unbiased free
  * energies / stationary distribution and per-ensemble transition
  * matrices). */
class TramSpec extends SparkSpec with Matchers {

  /** Metropolis chain on a potential over 1-d states: proposal +-1. */
  def metropolisChain(v: Array[Double]): DenseMatrix[Double] = {
    val n = v.length
    val m = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      var stay = 1.0
      for (j <- Seq(i - 1, i + 1) if j >= 0 && j < n) {
        val p = 0.5 * math.min(1.0, math.exp(-(v(j) - v(i))))
        m(i, j) = p
        stay -= p
      }
      m(i, i) = stay
    }
    m
  }

  test("TRAM recovers unbiased free energies and transition matrices from two ensembles") {
    val n = 5
    // unbiased potential and a linear bias in ensemble 1
    val v0 = Array(0.0, 1.0, 2.0, 1.0, 0.5)
    val bias = Array(2.0, 1.5, 1.0, 0.5, 0.0) // b_1(i); ensemble 0 unbiased
    val p0 = metropolisChain(v0)
    val p1 = metropolisChain(v0.indices.map(i => v0(i) + bias(i)).toArray)

    // simulate both ensembles; attach per-sample bias arrays [b_0=0, b_1]
    val d0 = MarkovSim.simulate(spark, p0, nTraj = 6, length = 4000, seed = 3L)
    val d1 = MarkovSim.simulate(spark, p1, nTraj = 6, length = 4000, seed = 5L)
    val biasArr = bias
    val withBias = (df: org.apache.spark.sql.DataFrame) => df.withColumn("bias",
      array(lit(0.0), element_at(typedLit(biasArr.toSeq), col("state") + 1)))

    val model = Tram.fit(Seq(withBias(d0), withBias(d1)), tau = 1, nMarkov = n,
      maxIter = 400, maxErr = 1e-10)

    // unbiased stationary distribution ~ boltzmann of v0
    val z = v0.map(x => math.exp(-x)).sum
    val piTrue = v0.map(x => math.exp(-x) / z)
    val piEst = model.stationaryDistribution
    (0 until n).foreach { i =>
      piEst(i) shouldBe piTrue(i) +- 0.03
    }
    // free energy differences recovered (up to the common normalization)
    val fRel = (0 until n).map(i => model.markovStateEnergies(i) - model.markovStateEnergies(0))
    (0 until n).foreach { i =>
      fRel(i) shouldBe (v0(i) - v0(0)) +- 0.15
    }
    // per-ensemble transition matrices close to the true generators
    for (k <- 0 until 2) {
      val t = model.transitionMatrices(k)
      (0 until n).foreach(i => bsum(t(i, ::).t) shouldBe 1.0 +- 1e-9)
    }
    for (i <- 0 until n; j <- 0 until n) {
      model.transitionMatrices(0)(i, j) shouldBe p0(i, j) +- 0.05
      model.transitionMatrices(1)(i, j) shouldBe p1(i, j) +- 0.05
    }
    // therm state 1 has higher free energy offset structure than 0:
    // its energies include the bias
    model.iterations should be > 5
    model.finalError should be < 1e-6
  }

  test("single unbiased ensemble reduces to the plain MSM picture") {
    val chain = MarkovSim.defaultBirthDeath
    val d = MarkovSim.simulate(spark, chain.transitionMatrix, 4, 4000, seed = 7L)
      .withColumn("bias", array(lit(0.0)))
    val model = Tram.fit(Seq(d), tau = 1, nMarkov = chain.n, maxIter = 300, maxErr = 1e-10)
    val piTrue = chain.stationaryDistribution
    val piEst = model.stationaryDistribution
    (0 until chain.n).foreach(i => piEst(i) shouldBe piTrue(i) +- 0.03)
    for (i <- 0 until chain.n; j <- 0 until chain.n)
      model.transitionMatrices(0)(i, j) shouldBe chain.transitionMatrix(i, j) +- 0.05
  }
}
