package graft.clustering

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** RegularSpace / MiniBatchKMeans / Metric registry (reference
  * tests/clustering/test_regspace.py dmin invariant,
  * tests/clustering/test_kmeans.py minibatch convergence). */
class ClusteringSpec extends SparkSpec with Matchers {

  def blobs(n: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(seed)
    val centers = Array(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, 5.0))
    (0 until n).map { i =>
      val c = centers(i % 3)
      (i.toLong, 0L, Seq(c(0) + 0.5 * rng.nextGaussian(), c(1) + 0.5 * rng.nextGaussian()))
    }.toDF("traj_id", "t", "features")
  }

  test("regspace: centers pairwise >= dmin apart; every point within 2*dmin") {
    val df = blobs(3000, 5L).cache()
    val dmin = 2.0
    val model = RegularSpace.fit(df, dmin, maxCenters = 100)
    model.k should be >= 3
    // dmin invariant (exact, matches reference postcondition)
    for (i <- 0 until model.k; j <- i + 1 until model.k)
      EuclideanMetric.dist(model.centers(i), model.centers(j)) should be >= dmin
    // coverage: streaming-leader bound 2*dmin
    val assigned = model.transform(df)
    val centersB = model.centers
    import spark.implicits._
    val maxDist = assigned.select(col("features"), col("state"))
      .as[(Seq[Double], Int)]
      .map { case (x, s) => EuclideanMetric.dist(x.toArray, centersB(s)) }
      .reduce(math.max _)
    maxDist should be < 2.0 * dmin
  }

  test("regspace respects maxCenters cap") {
    val df = blobs(500, 7L)
    val model = RegularSpace.fit(df, dmin = 0.01, maxCenters = 10)
    model.k shouldBe 10
  }

  test("minibatch kmeans finds the three blobs") {
    val df = blobs(6000, 11L).cache()
    val model = MiniBatchKMeans.fit(df, k = 3, batchFraction = 0.2, seed = 19L)
    model.k shouldBe 3
    // each true blob center has a fitted center nearby
    val truth = Seq(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, 5.0))
    truth.foreach { t =>
      model.centers.map(c => EuclideanMetric.dist(c, t)).min should be < 0.5
    }
    // assignment splits data roughly in thirds
    val sizes = model.transform(df).groupBy("state").count()
      .collect().map(_.getLong(1))
    sizes.length shouldBe 3
    sizes.foreach(_ should be > 1500L)
  }

  test("metric registry resolves and computes correctly") {
    Metrics.available should contain allOf ("euclidean", "manhattan", "chebyshev")
    val x = Array(1.0, 2.0); val y = Array(4.0, 6.0)
    Metrics("euclidean").dist(x, y) shouldBe 5.0 +- 1e-12
    Metrics("manhattan").dist(x, y) shouldBe 7.0 +- 1e-12
    Metrics("chebyshev").dist(x, y) shouldBe 4.0 +- 1e-12
    an[IllegalArgumentException] should be thrownBy Metrics("nope")
  }

  test("regspace with chebyshev metric honors the metric") {
    val df = blobs(1000, 23L)
    val model = RegularSpace.fit(df, dmin = 3.0, maxCenters = 50, metric = ChebyshevMetric)
    for (i <- 0 until model.k; j <- i + 1 until model.k)
      ChebyshevMetric.dist(model.centers(i), model.centers(j)) should be >= 3.0
  }
}
