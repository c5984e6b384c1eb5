package graft.markov.hmm

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** HMM stack (reference tests/markov/hmm/test_mlhmm.py: 2-state recovery
  * with known transition/emission; Viterbi path correctness;
  * test_output_models Gaussian M-step). */
class HmmSpec extends SparkSpec with Matchers {

  /** 2-hidden-state chain with well-separated discrete emissions:
    * hidden 0 emits mostly {0,1}, hidden 1 emits mostly {2,3}. */
  def discreteHmmData(nTraj: Int, length: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val a = Array(Array(0.92, 0.08), Array(0.06, 0.94))
    val b = Array(Array(0.55, 0.40, 0.04, 0.01), Array(0.02, 0.03, 0.45, 0.50))
    val rng = new java.util.SplittableRandom(seed)
    def draw(p: Array[Double]): Int = {
      val u = rng.nextDouble(); var acc = 0.0
      p.indices.foreach { i => acc += p(i); if (u < acc) return i }
      p.length - 1
    }
    (0 until nTraj).flatMap { id =>
      var h = if (rng.nextDouble() < 0.5) 0 else 1
      (0 until length).map { t =>
        val obs = draw(b(h))
        val row = (id.toLong, t.toLong, obs, h)
        h = draw(a(h))
        row
      }
    }.toDF("traj_id", "t", "state", "hidden_true")
  }

  test("discrete HMM EM recovers transition and emission structure") {
    val data = discreteHmmData(6, 1500, seed = 31L).cache()
    val model = Hmm.fit(data.select("traj_id", "t", "state"),
      nHidden = 2, nObs = 4, maxIter = 60)
    model.logLikelihood should be < 0.0
    val a = model.transition
    // label-matching: find which fitted state emits low symbols
    val emitsLow0 = model.emission(0, 0) + model.emission(0, 1)
    val (s0, s1) = if (emitsLow0 > 0.5) (0, 1) else (1, 0)
    a(s0, s0) shouldBe 0.92 +- 0.05
    a(s1, s1) shouldBe 0.94 +- 0.05
    model.emission(s0, 0) + model.emission(s0, 1) should be > 0.9
    model.emission(s1, 2) + model.emission(s1, 3) should be > 0.9
    // rows stochastic
    bsum(a(0, ::).t) shouldBe 1.0 +- 1e-9
    bsum(model.emission(0, ::).t) shouldBe 1.0 +- 1e-9
  }

  test("discrete Viterbi recovers most of the true hidden path") {
    val data = discreteHmmData(4, 800, seed = 37L).cache()
    val model = Hmm.fit(data.select("traj_id", "t", "state"),
      nHidden = 2, nObs = 4, maxIter = 60)
    val decoded = Hmm.viterbi(data.select("traj_id", "t", "state"), model, nObs = 4)
    val joined = decoded.join(data, Seq("traj_id", "t"))
    val agree = joined.where(col("hidden") === col("hidden_true")).count().toDouble /
      joined.count()
    // accept either labeling
    math.max(agree, 1.0 - agree) should be > 0.9
  }

  test("gaussian HMM recovers means, sigmas and transition matrix") {
    val truth = GaussianHmm.GaussianHmmModel(
      DenseMatrix((0.95, 0.05), (0.08, 0.92)),
      means = Array(-1.0, 1.5), sigmas = Array(0.4, 0.5),
      initial = DenseVector(0.5, 0.5), Double.NegativeInfinity, 0)
    val data = GaussianHmm.generate(spark, truth, nTraj = 6, length = 1200, seed = 41L).cache()
    val model = GaussianHmm.fit(data, nHidden = 2, maxIter = 80)
    val order = if (model.means(0) < model.means(1)) Array(0, 1) else Array(1, 0)
    model.means(order(0)) shouldBe -1.0 +- 0.1
    model.means(order(1)) shouldBe 1.5 +- 0.1
    model.sigmas(order(0)) shouldBe 0.4 +- 0.08
    model.sigmas(order(1)) shouldBe 0.5 +- 0.08
    model.transition(order(0), order(0)) shouldBe 0.95 +- 0.04
    model.transition(order(1), order(1)) shouldBe 0.92 +- 0.04
  }

  test("gaussian Viterbi decodes well-separated states") {
    val truth = GaussianHmm.GaussianHmmModel(
      DenseMatrix((0.9, 0.1), (0.1, 0.9)),
      means = Array(-2.0, 2.0), sigmas = Array(0.5, 0.5),
      initial = DenseVector(0.5, 0.5), Double.NegativeInfinity, 0)
    val data = GaussianHmm.generate(spark, truth, nTraj = 3, length = 500, seed = 43L).cache()
    val model = GaussianHmm.fit(data, nHidden = 2, maxIter = 50)
    val decoded = GaussianHmm.viterbi(data, model)
    val joined = decoded.join(data, Seq("traj_id", "t"))
    val agree = joined.where(col("hidden") === col("hidden_true")).count().toDouble /
      joined.count()
    math.max(agree, 1.0 - agree) should be > 0.95
  }

  test("discrete HMM init from MSM+PCCA produces a valid model") {
    val chain = MarkovSim.defaultBirthDeath
    val dtraj = MarkovSim.simulate(spark, chain.transitionMatrix, 4, 800, seed = 47L)
    val init = Hmm.initialGuess(dtraj, nHidden = 2, nObs = chain.n, lagtime = 1)
    init.transition.rows shouldBe 2
    bsum(init.transition(0, ::).t) shouldBe 1.0 +- 1e-9
    bsum(init.emission(0, ::).t) shouldBe 1.0 +- 1e-9
    bsum(init.initial) shouldBe 1.0 +- 1e-9
  }
}
