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
}
