package graft.markov

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** Spark-side TRAM dataset pieces: the distributed post_hoc_RE overlap
  * statistic must agree with the driver-side pairwise kernel, and the
  * dataset -> restrict -> fit workflow must produce a valid model. */
class TramDatasetSparkSpec extends SparkSpec with Matchers {

  test("distributed postHocOverlap matches the driver pairwise kernel") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(19L)
    val k = 3
    // samples: (markov_state, therm, bias vector of length K)
    val rows = (0 until 120).map { _ =>
      val st = rng.nextInt(4)
      val th = rng.nextInt(k)
      (st, th, Array.fill(k)(math.rint(rng.nextDouble() * 100) / 50.0))
    }
    val df = rows.toDF("markov_state", "therm", "bias")
    val got = TramDataset.postHocOverlap(df)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    for (i <- 0 until 4; kk <- 0 until k; ll <- 0 until k if kk != ll) {
      val atK = rows.filter(r => r._1 == i && r._2 == kk)
        .map(r => (r._3(kk), r._3(ll))).toArray
      val atL = rows.filter(r => r._1 == i && r._2 == ll)
        .map(r => (r._3(kk), r._3(ll))).toArray
      if (atK.nonEmpty && atL.nonEmpty) {
        var nSum = 0.0
        atK.foreach { case (ak, al) => atL.foreach { case (bk, bl) =>
          nSum += math.min(math.exp(ak + bl - al - bk), 1.0) } }
        val (nPairs, gotSum, gotAvg) = got((i, kk, ll))
        nPairs shouldBe atK.length.toLong * atL.length
        gotSum shouldBe r6(nSum) +- 2e-6
        gotAvg shouldBe r6(nSum / (atK.length * atL.length)) +- 2e-6
      } else got.contains((i, kk, ll)) shouldBe false
    }
  }

  test("dataset -> restrict -> fit yields a valid TRAM model") {
    // two ensembles over a shared 3-state space plus a disconnected
    // 4th state only ensemble 1 visits in an isolated block
    val rng = new java.util.SplittableRandom(7L)
    def walk(states: Array[Int], n: Int): Array[Int] =
      Array.fill(n)(states(rng.nextInt(states.length)))
    val d0 = walk(Array(0, 1, 2), 400)
    val d1 = walk(Array(0, 1, 2), 400) ++ Array.fill(50)(3)
    val bias = Array(d0, d1).zipWithIndex.map { case (t, i) =>
      t.map(s => Array(0.0, 0.5 * s + 0.1 * i))
    }
    val ds = new TramDataset(Array(d0, d1), bias, nMarkovStatesOpt = Some(4))
    ds.restrictToLargestConnectedSet("summed_count_matrix")
    // the isolated trailing-3 block must be dropped
    ds.dtrajs(1).takeRight(49).forall(_ == -1) shouldBe true
    val model = Tram.fit(ds, maxIter = 200, maxErr = 1e-8)
    val pi = model.stationaryDistribution
    val piSum = (0 until pi.length).map(pi(_)).sum
    piSum shouldBe 1.0 +- 1e-9
    (0 until 3).foreach { i =>
      model.markovStateEnergies(i).isNaN shouldBe false
      model.markovStateEnergies(i).isInfinite shouldBe false
    }
  }

  test("sample weights, observable, PMF and likelihood over a fitted model") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new java.util.SplittableRandom(11L)
    def walk(n: Int): Array[Int] = Array.fill(n)(rng.nextInt(3))
    val d = Array(walk(600), walk(600))
    val bias = d.zipWithIndex.map { case (t, k) =>
      t.map(s => Array(0.0, 0.4 * s + 0.2 * k))
    }
    val ds = new TramDataset(d, bias)
    val model = Tram.fit(ds, maxIter = 300, maxErr = 1e-10)
    assert(model.modifiedStateCountsLog != null)

    val samples = d.indices.flatMap(j => d(j).zip(bias(j)))
      .toDF("state", "bias")
    // normalized weights sum to one — unbiased and per-ensemble
    for (therm <- Seq(-1, 0, 1)) {
      val w = Tram.sampleWeightsLog(samples, model, therm)
      val s1 = w.agg(sum(exp(col("log_weight")))).collect()(0).getDouble(0)
      s1 shouldBe 1.0 +- 1e-9
    }
    // observable of the constant 1 is exactly the weight total
    Tram.computeObservable(samples.withColumn("one", lit(1.0)), model,
      "one") shouldBe 1.0 +- 1e-9
    // PMF over the state binning: all 3 states occupied -> finite,
    // exp(-PMF) sums to 1; a 4th empty bin is +inf
    val pmf = Tram.computePmf(samples.withColumn("bin", col("state")),
      model, "bin", 4)
    pmf.take(3).foreach(v => v.isInfinite shouldBe false)
    pmf(3).isInfinite shouldBe true
    pmf.take(3).map(v => math.exp(-v)).sum shouldBe 1.0 +- 1e-9
    // likelihood: finite, and not worse after convergence than early on
    val input = Tram.TramInput(ds.nThermStates, ds.nMarkovStates,
      ds.transitionCounts.map(graft.linalg.LinAlg.toFlat),
      ds.stateCounts.map(_.map(_.toDouble)),
      d.indices.toArray.flatMap(j => d(j).zip(bias(j))))
    val early = Tram.fit(input, maxIter = 1, maxErr = 0.0)
    val llEarly = Tram.logLikelihood(early, input)
    val llConv = Tram.logLikelihood(model, input)
    llConv.isNaN shouldBe false
    llConv should be >= llEarly - 1e-6
  }

  test("sampleWeightsLog: a state with no modified counts in ANY " +
    "ensemble gets weight zero, not NaN (tram.h o-loop -inf filter)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import breeze.linalg.{DenseMatrix, DenseVector}
    val ninf = Double.NegativeInfinity
    // 3 Markov states, 2 ensembles; state 2 has log R = -inf everywhere
    def model(kT: Int) = Tram.TramModel(
      biasedConfEnergies = DenseMatrix.zeros[Double](kT, 3),
      markovStateEnergies = DenseVector.zeros[Double](3),
      thermStateEnergies = DenseVector.zeros[Double](kT),
      transitionMatrices = Array.fill(kT)(DenseMatrix.eye[Double](3)),
      iterations = 0, finalError = 0.0,
      modifiedStateCountsLog = DenseMatrix.tabulate(kT, 3)((k, i) =>
        if (i == 2) ninf else 0.1 * (k + 1) + 0.2 * i))
    for (kT <- Seq(2, 1)) { // kT == 1 exercises the no-greatest short path
      val samples = Seq(
        (0, Array.fill(kT)(0.3)), (1, Array.fill(kT)(0.1)),
        (2, Array.fill(kT)(0.2)), // the dead state
        (-1, Array.fill(kT)(0.0))).toDF("state", "bias")
      val w = Tram.sampleWeightsLog(samples, model(kT)).collect()
        .map(r => (r.getInt(0), r.getDouble(r.length - 1)))
      w.foreach { case (_, lw) => lw.isNaN shouldBe false }
      w.filter(r => r._1 == 2 || r._1 == -1)
        .foreach(_._2 shouldBe ninf)
      w.map(r => math.exp(r._2)).sum shouldBe 1.0 +- 1e-9
    }
  }

  test("sampleWeightsLog: an ALL-dead frame (every sample out-of-set " +
    "or weight-zero) yields -inf weights, never NaN from a -inf - -inf " +
    "normalizer") {
    import spark.implicits._
    import breeze.linalg.{DenseMatrix, DenseVector}
    val ninf = Double.NegativeInfinity
    val model = Tram.TramModel(
      biasedConfEnergies = DenseMatrix.zeros[Double](2, 2),
      markovStateEnergies = DenseVector.zeros[Double](2),
      thermStateEnergies = DenseVector.zeros[Double](2),
      transitionMatrices = Array.fill(2)(DenseMatrix.eye[Double](2)),
      iterations = 0, finalError = 0.0,
      modifiedStateCountsLog = DenseMatrix.fill(2, 2)(ninf)) // all dead
    val samples = Seq((0, Array(0.1, 0.2)), (1, Array(0.3, 0.1)),
      (-1, Array(0.0, 0.0))).toDF("state", "bias")
    val w = Tram.sampleWeightsLog(samples, model).collect()
      .map(_.getDouble(2))
    w should have length 3
    w.foreach { lw => lw.isNaN shouldBe false; lw shouldBe ninf }
  }

  test("postHocOverlap maxSamplesPerCell: deterministic per-cell cap " +
    "matches the driver kernel on the capped subset") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(23L)
    val k = 2
    val rows = (0 until 200).map { idx =>
      (idx, idx % 3, rng.nextInt(k),
        Array.fill(k)(math.rint(rng.nextDouble() * 100) / 50.0))
    }
    val df = rows.toDF("sid", "markov_state", "therm", "bias")
    val cap = 5
    val got = TramDataset.postHocOverlap(df, maxSamplesPerCell = cap,
        orderCols = Seq("sid")).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getDouble(4), r.getLong(6), r.getLong(7))))
      .toMap
    // driver replay: first `cap` rows per (state, therm) by sid order
    val capped = rows.groupBy(r => (r._2, r._3)).values
      .flatMap(_.sortBy(_._1).take(cap)).toSeq
    for (i <- 0 until 3; kk <- 0 until k; ll <- 0 until k if kk != ll) {
      val atK = capped.filter(r => r._2 == i && r._3 == kk).map(_._4)
      val atL = capped.filter(r => r._2 == i && r._3 == ll).map(_._4)
      if (atK.nonEmpty && atL.nonEmpty) {
        var nSum = 0.0
        atK.foreach(a => atL.foreach(b =>
          nSum += math.min(math.exp(a(kk) + b(ll) - a(ll) - b(kk)), 1.0)))
        val (nPairs, gotSum, nK, mL) = got((i, kk, ll))
        nK shouldBe atK.length.toLong
        mL shouldBe atL.length.toLong
        nK should be <= cap.toLong
        nPairs shouldBe atK.length.toLong * atL.length
        gotSum shouldBe nSum +- 2e-6
      } else got.contains((i, kk, ll)) shouldBe false
    }
    // uncapped call without orderCols still works (no cap applied)
    TramDataset.postHocOverlap(df).count() should be > 0L
    an[IllegalArgumentException] should be thrownBy
      TramDataset.postHocOverlap(df, maxSamplesPerCell = 3)
  }

  test("zero-edge overlap graph: restriction keeps Markov state 0 " +
    "(reference submodel_largest over the full K*M node set)") {
    // each ensemble lives in its own single state: no cross-ensemble
    // overlap pairs and no within-ensemble chains -> zero edges
    val d0 = Array.fill(50)(0)
    val d1 = Array.fill(50)(1)
    val bias = Array(d0, d1).map(_.map(_ => Array(0.0, 0.0)))
    val ds = new TramDataset(Array(d0, d1), bias)
    ds.largestConnectedSet("post_hoc_RE") shouldBe Array(0)
    ds.restrictToLargestConnectedSet("post_hoc_RE")
    ds.dtrajs(0).forall(_ == 0) shouldBe true  // survives
    ds.dtrajs(1).forall(_ == -1) shouldBe true // dropped, but not ALL data
  }
}
