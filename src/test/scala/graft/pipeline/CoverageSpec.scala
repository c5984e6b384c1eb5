package graft.pipeline

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Coverage for previously query-only/untested public surfaces: TPT
  * coarse-graining, kernel pairwise tables, window gathers, stats
  * utilities, streaming end-to-end covariance. */
class CoverageSpec extends SparkSpec with Matchers {

  test("tpt coarse-grain: flux between groups conserves the total A->B flux") {
    val chain = MarkovSim.defaultBirthDeath
    val msm = graft.markov.MarkovStateModel(chain.transitionMatrix)
    val flux = graft.markov.Tpt.reactiveFlux(msm, Set(0), Set(chain.n - 1))
    val groups = Seq(Set(0, 1), Set(2), Set(3, 4))
    val (gross, net) = flux.coarseGrain(groups)
    gross.rows shouldBe 3
    // net flux out of the source group equals the total A->B flux
    val outOfSource = (0 until 3).filterNot(_ == 0).map(j => net(0, j)).sum
    outOfSource shouldBe flux.totalFlux +- 1e-12
    // pathway decomposition explains the full flux
    val paths = flux.pathways(1.0)
    paths.map(_._2).sum shouldBe flux.totalFlux +- 1e-9
    paths.head._1.head shouldBe 0
    paths.head._1.last shouldBe chain.n - 1
  }

  test("kernel pairwise table matches driver-side gram") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(3L)
    val vecs = Array.fill(20)(Array(rng.nextGaussian(), rng.nextGaussian()))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("id", "features")
    val k = graft.kernels.GaussianKernel(1.5)
    val table = graft.kernels.Kernels.pairwise(k, df, df, "id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gram = graft.kernels.Kernels.gram(k, vecs)
    for (i <- 0 until 20; j <- 0 until 20)
      table((i.toLong, j.toLong)) shouldBe gram(i, j) +- 1e-12
  }

  test("radius window and tumbling blocks") {
    import spark.implicits._
    val traj = (0L until 10L).map(t => (0L, t, t.toDouble)).toDF("traj_id", "t", "value")
    val rw = graft.lag.Lag.radiusWindow(traj, "value", 1)
      .where(col("t") === 5).select("window").collect()(0).getSeq[Double](0)
    rw shouldBe Seq(4.0, 5.0, 6.0)
    val blocks = graft.lag.Lag.blocks(traj, 4)
      .groupBy("block").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    blocks shouldBe Map(0L -> 4L, 1L -> 4L, 2L -> 2L)
  }

  test("histogram1d, statistical inefficiency, confidence interval") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (0L, i.toLong, (i % 10).toDouble))
      .toDF("traj_id", "t", "value")
    val hist = graft.util.Stats.histogram1d(df, "value", None, 0.0, 10.0, 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until 10).foreach(b => hist(b) shouldBe 100.0 +- 1e-9)
    // iid-ish cyclic data: inefficiency near 1 is not expected (period-10
    // correlation), but the estimator must return a positive bounded value
    val ineff = graft.util.Stats.statisticalInefficiency(df, "value", 20)
    ineff should be > 0.0
    val (lo, hi) = graft.util.Stats.confidenceInterval(Seq(1.0, 2.0, 3.0, 4.0, 5.0), 0.8)
    lo shouldBe 1.4 +- 1e-9
    hi shouldBe 4.6 +- 1e-9
  }

  test("streamingLaggedCovariance end-to-end equals batch covariance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (0L until 4L).flatMap { id =>
      val rng = new java.util.SplittableRandom(id)
      (0L until 100L).map(t => (id, t, Seq(rng.nextGaussian(), rng.nextGaussian())))
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Seq[Double])]
    val stream = mem.toDF().toDF("traj_id", "t", "features")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (query, rc) = graft.streaming.Streaming.streamingLaggedCovariance(
      stream, tau = 1, checkpointDir = ckpt)
    mem.addData(data.filter(_._2 < 50): _*)
    query.processAllAvailable()
    mem.addData(data.filter(_._2 >= 50): _*)
    query.processAllAvailable()
    query.stop()
    val batch = graft.agg.Covariance.fit(
      graft.lag.Lag.pairs(data.toDF("traj_id", "t", "features"), 1))
    val streamed = rc.model
    streamed.count shouldBe batch.count
    streamed.cov0t.zip(batch.cov0t).foreach { case (a, b) => a shouldBe b +- 1e-9 }
  }
}
