package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Ellipsoids + drunkard's walk datasets (reference tests/data). */
class ExampleDataSpec extends SparkSpec with Matchers {

  test("ellipsoids: two separated clusters, lazy switching") {
    val df = ExampleData.ellipsoids(spark, laziness = 0.95, nTraj = 4,
      length = 800, seed = 5L).cache()
    df.count() shouldBe 3200
    // cluster means near (0,0) and (0,5)
    val means = df.groupBy("state")
      .agg(avg(expr("features[0]")).as("mx"), avg(expr("features[1]")).as("my"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    means(0)._2 shouldBe 0.0 +- 0.3
    means(1)._2 shouldBe 5.0 +- 0.3
    // laziness: empirical self-transition ~ 0.95
    val counts = graft.markov.TransitionCounting.slidingCounts(df.select("traj_id", "t", "state"), 1)
    val msm = graft.markov.Msm.fromCounts(counts, 2, 1)
    msm.transitionMatrix(0, 0) shouldBe 0.95 +- 0.03
    // kernel sanity: generalized gaussian with distinct bandwidths
    val k = graft.kernels.GeneralizedGaussianKernel(Array(1.0, 2.0))
    k.applyArrays(Array(0.0, 0.0), Array(1.0, 2.0)) shouldBe
      math.exp(-0.5 * (1.0 + 1.0)) +- 1e-12
  }

  test("drunkards walk: absorbing states absorb; walks stay on grid") {
    val dw = ExampleData.DrunkardsWalk(6, 6, barState = 35, homeState = 0)
    val msm = graft.markov.MarkovStateModel(dw.transitionMatrix)
    msm.isTransitionMatrix(1e-12) shouldBe true
    dw.transitionMatrix(0, 0) shouldBe 1.0
    dw.transitionMatrix(35, 35) shouldBe 1.0
    val walks = dw.simulate(spark, 3, 3, nTraj = 16, length = 300, seed = 9L).cache()
    walks.agg(min("state"), max("state")).collect()(0) match {
      case r => r.getInt(0) should be >= 0; r.getInt(1) should be <= 35
    }
    // most walks eventually hit an absorbing state and stay
    val finals = walks.where(col("t") === 299).groupBy("state").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (finals.getOrElse(0, 0L) + finals.getOrElse(35, 0L)).toDouble / 16 should be > 0.7
    // hitting probability of the bar from interior: in (0,1)
    val h = graft.markov.MsmAnalysis.hittingProbability(dw.transitionMatrix, Set(35))
    h(dw.coordToState(3, 3)) should be > 0.0
    h(dw.coordToState(3, 3)) should be < 1.0
  }
  test("swissroll model: 3-d rolled manifold with nearest-neighbor chain") {
    val df = ExampleData.swissrollModel(spark, nTraj = 4, length = 1000, seed = 3L).cache()
    df.count() shouldBe 4000
    // observations live on the roll: x^2 + z^2 = (radius)^2 with radius ~ N(mu_x, 1)
    val radii = df.select(expr("sqrt(features[0]*features[0] + features[2]*features[2])").as("r"),
      col("state")).groupBy("state").agg(avg("r").as("mr")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    radii(0) shouldBe 7.5 +- 0.3
    radii(2) shouldBe 15.0 +- 0.3
    // nearest-neighbor chain: never jumps two states at lag 1
    val counts = graft.markov.TransitionCounting.slidingCounts(
      df.select("traj_id", "t", "state"), 1).collect()
    counts.foreach { r => math.abs(r.getInt(0) - r.getInt(1)) should be <= 1 }
  }

}
