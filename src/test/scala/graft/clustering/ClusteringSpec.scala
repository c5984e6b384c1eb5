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

  test("minibatch kmeans: local and distributed transports agree " +
    "(same hash-drawn batches, float merge order only)") {
    val df = blobs(4000, 31L).cache()
    try {
      // forced-local vs forced-distributed (the BayesianHmm q265
      // pattern): identical init (same seeded sample + fit), identical
      // hash-drawn batch membership, so centers differ only in float
      // summation order of the per-batch means
      val local = MiniBatchKMeans.fit(df, k = 3, batchFraction = 0.2,
        seed = 19L, localThreshold = Long.MaxValue)
      val dist = MiniBatchKMeans.fit(df, k = 3, batchFraction = 0.2,
        seed = 19L, localThreshold = 0L)
      local.k shouldBe dist.k
      local.centers.zip(dist.centers).foreach { case (a, b) =>
        a.zip(b).foreach { case (x, y) => x shouldBe y +- 1e-6 }
      }
    } finally { df.unpersist(); () }
  }

  test("randomized stress: minibatch transport parity across shapes " +
    "(forced-local == forced-distributed to float merge order)") {
    import spark.implicits._
    val master = new scala.util.Random(53)
    for (round <- 0 until 6) {
      val n = 800 + master.nextInt(2500)
      val k = 2 + master.nextInt(3)
      val d = 2 + master.nextInt(3)
      val frac = Seq(0.1, 0.25, 0.5)(master.nextInt(3))
      val centersTrue = Array.fill(k, d)(master.nextInt(9) * 4.0 - 16.0)
      val rng = new java.util.SplittableRandom(round * 97L + 11L)
      val pts = (0 until n).map { i =>
        val c = centersTrue(i % k)
        c.map(_ + rng.nextGaussian() * 0.5).toSeq
      }
      val df = pts.toDF("features").repartition(1 + master.nextInt(6)).cache()
      try {
        val seed = 7L + round
        val local = MiniBatchKMeans.fit(df, k, batchFraction = frac,
          maxEpochs = 2, seed = seed, localThreshold = Long.MaxValue)
        val dist = MiniBatchKMeans.fit(df, k, batchFraction = frac,
          maxEpochs = 2, seed = seed, localThreshold = 0L)
        withClue(s"round=$round n=$n k=$k d=$d frac=$frac: ") {
          local.k shouldBe dist.k
          local.centers.zip(dist.centers).foreach { case (a, b) =>
            a.zip(b).foreach { case (x, y) => x shouldBe y +- 1e-6 }
          }
        }
      } finally { df.unpersist(); () }
    }
  }

  test("randomized stress: Lloyd transport parity across shapes and metrics " +
    "(forced-local == forced-distributed to float merge order)") {
    import spark.implicits._
    val master = new scala.util.Random(71)
    for (round <- 0 until 4) {
      val n = 600 + master.nextInt(2000)
      val k = 2 + master.nextInt(3)
      val d = 2 + master.nextInt(3)
      val metric = Seq(EuclideanMetric, ManhattanMetric, ChebyshevMetric)(round % 3)
      val centersTrue = Array.fill(k, d)(master.nextInt(9) * 4.0 - 16.0)
      val rng = new java.util.SplittableRandom(round * 131L + 5L)
      val pts = (0 until n).map { i =>
        val c = centersTrue(i % k)
        c.map(_ + rng.nextGaussian() * 0.5).toSeq
      }
      val df = pts.toDF("features").repartition(1 + master.nextInt(6)).cache()
      try {
        val seed = 3L + round
        val local = LloydKMeans.fit(df, k, metric = metric, maxIter = 6,
          seed = seed, localThreshold = Long.MaxValue)
        val dist = LloydKMeans.fit(df, k, metric = metric, maxIter = 6,
          seed = seed, localThreshold = 0L)
        withClue(s"round=$round n=$n k=$k d=$d metric=$metric: ") {
          local.k shouldBe dist.k
          local.centers.zip(dist.centers).foreach { case (a, b) =>
            a.zip(b).foreach { case (x, y) => x shouldBe y +- 1e-6 }
          }
        }
      } finally { df.unpersist(); () }
    }
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

  test("custom-metric Lloyd recovers the three blobs with manhattan distance") {
    val df = blobs(3000, 31L).cache()
    val model = LloydKMeans.fit(df, k = 3, metric = ManhattanMetric,
      maxIter = 25, tol = 1e-6, seed = 3L)
    model.k shouldBe 3
    val truth = Seq(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, 5.0))
    truth.foreach { t =>
      model.centers.map(c => ManhattanMetric.dist(c, t)).min should be < 0.5
    }
    // metric-aware assignment agrees with a driver-side argmin replay
    import spark.implicits._
    val centersB = model.centers
    val mism = model.transformMetric(df, ManhattanMetric)
      .select(col("features"), col("state")).as[(Seq[Double], Int)]
      .map { case (x, s) =>
        val d = centersB.map(c => ManhattanMetric.dist(x.toArray, c))
        if (d(s) <= d.min + 1e-12) 0 else 1
      }.reduce(_ + _)
    mism shouldBe 0
  }

  test("custom-metric Lloyd with chebyshev metric assigns by that metric") {
    // a point set where chebyshev and euclidean argmin disagree: centers
    // fixed, check transformMetric uses the requested metric's argmin
    import spark.implicits._
    val model = ClusterModel(Array(Array(0.0, 0.0), Array(6.0, 3.0)))
    // point (4.0, 3.1): euclid d0=sqrt(16+9.61)=5.06 < d1=sqrt(4+0.01)... no
    // chebyshev: d0 = 4.0, d1 = max(2.0, 0.1) = 2.0 -> center 1
    // manhattan: d0 = 7.1, d1 = 2.1 -> center 1; euclid d0 5.06 > d1 2.00
    // use (3.0, 0.4): cheby d0=3.0, d1=max(3.0,2.6)=3.0 tie -> argmin=0;
    //                euclid d0=3.03, d1=sqrt(9+6.76)=3.97 -> 0
    // and (3.9, 3.9): cheby d0=3.9, d1=max(2.1,0.9)=2.1 -> 1;
    //                 manhattan d0=7.8, d1=3.0 -> 1; euclid d0=5.52, d1=2.29 -> 1
    // disagreeing point: (2.6, -2.9): cheby d0=2.9, d1=max(3.4,5.9)=5.9 -> 0
    val df = Seq((0L, 0L, Seq(4.0, 3.1)), (1L, 0L, Seq(2.6, -2.9)))
      .toDF("traj_id", "t", "features")
    val got = model.transformMetric(df, ChebyshevMetric)
      .select("traj_id", "state").as[(Long, Int)].collect().toMap
    got(0L) shouldBe 1
    got(1L) shouldBe 0
  }
}
