package graft.markov

import graft.SparkSpec
import graft.data.MarkovSim
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The distributed TRAM E-step (fitDistributed: per-iteration
  * treeAggregate over the FULL bias table) against the capped
  * driver-collected path:
  *  - all-samples local == distributed up to float re-association,
  *  - the capped landmark estimate CONVERGES to the distributed
  *    (all-data) answer as maxSamples grows — the r11 fidelity gap this
  *    closes: the engine no longer has to answer with a sample estimate
  *    where the reference uses everything. */
class TramDistributedSpec extends SparkSpec with Matchers {

  private def metropolisChain(v: Array[Double]) = {
    val n = v.length
    val m = breeze.linalg.DenseMatrix.zeros[Double](n, n)
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

  private val n = 5
  private val v0 = Array(0.0, 1.0, 2.0, 1.0, 0.5)
  private val bias = Array(2.0, 1.5, 1.0, 0.5, 0.0)

  private lazy val frames = {
    val p0 = metropolisChain(v0)
    val p1 = metropolisChain(v0.indices.map(i => v0(i) + bias(i)).toArray)
    val d0 = MarkovSim.simulate(spark, p0, nTraj = 6, length = 3000, seed = 3L)
    val d1 = MarkovSim.simulate(spark, p1, nTraj = 6, length = 3000, seed = 5L)
    val withBias = (df: org.apache.spark.sql.DataFrame) => df.withColumn("bias",
      array(lit(0.0), element_at(typedLit(bias.toSeq), col("state") + 1)))
    Seq(withBias(d0), withBias(d1))
  }

  private def linf(a: breeze.linalg.DenseVector[Double],
                   b: breeze.linalg.DenseVector[Double]): Double =
    (0 until a.length).map(i => math.abs(a(i) - b(i))).max

  test("distributed fit equals the all-samples local fit (float re-association only)") {
    val maxIter = 200
    val localAll = Tram.fit(
      Tram.inputFromFrames(frames, tau = 1, nMarkov = n, maxSamples = Int.MaxValue),
      maxIter = maxIter, maxErr = 1e-10)
    val dist = Tram.fitDistributed(frames, tau = 1, nMarkov = n,
      maxIter = maxIter, maxErr = 1e-10)
    linf(dist.markovStateEnergies, localAll.markovStateEnergies) should be < 1e-6
    linf(dist.thermStateEnergies, localAll.thermStateEnergies) should be < 1e-6
    for (k <- 0 until 2; i <- 0 until n; j <- 0 until n)
      dist.transitionMatrices(k)(i, j) shouldBe
        localAll.transitionMatrices(k)(i, j) +- 1e-6
    // physics: recovers the unbiased free-energy differences
    val fRel = (0 until n).map(i =>
      dist.markovStateEnergies(i) - dist.markovStateEnergies(0))
    (0 until n).foreach(i => fRel(i) shouldBe (v0(i) - v0(0)) +- 0.2)
  }

  test("capped landmark estimate tightens toward the distributed answer as maxSamples grows") {
    val maxIter = 200
    val dist = Tram.fitDistributed(frames, tau = 1, nMarkov = n,
      maxIter = maxIter, maxErr = 1e-10)
    def cappedErr(cap: Int): Double = {
      val m = Tram.fit(
        Tram.inputFromFrames(frames, tau = 1, nMarkov = n, maxSamples = cap),
        maxIter = maxIter, maxErr = 1e-10)
      linf(m.markovStateEnergies, dist.markovStateEnergies)
    }
    val eSmall = cappedErr(400)
    val eMid = cappedErr(4000)
    val eAll = cappedErr(Int.MaxValue) // cap above the table: no sampling
    eAll should be < 1e-6 // the uncapped local path IS the distributed sums
    eMid should be < eSmall
    eSmall should be > 1e-4 // the small cap is a real approximation
  }
}
