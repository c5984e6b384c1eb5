package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** QuantityStatistics.gather facade (reference util/stats.py:197-290). */
class QuantityStatisticsSpec extends AnyFunSuite with Matchers {

  test("mean-anchored CI on a hand-computed fixture (stats.py:40 algorithm)") {
    // xs = [1..5], conf=0.8: mean 3, sorted index of mean im=2,
    // pm = 1 + (3-2)/(3-2) = 2, pl = 2 - .8*2 = 0.4 -> 1 + .4*(2-1) = 1.4,
    // pr = 2 + .8*(5-2) = 4.4 -> clamped boundary x[4] = 5.0
    val (lo, hi) = QuantityStatistics.confidenceInterval1d(
      Array(1.0, 2.0, 3.0, 4.0, 5.0), 0.8)
    lo shouldBe 1.4 +- 1e-12
    hi shouldBe 5.0 +- 1e-12
  }

  test("conf=1 returns element-wise min/max; constant samples collapse") {
    val (lo, hi) = QuantityStatistics.confidenceInterval1d(
      Array(3.0, -1.0, 7.0, 2.0), 1.0)
    (lo, hi) shouldBe ((-1.0, 7.0))
    val (cl, ch) = QuantityStatistics.confidenceInterval1d(
      Array(2.5, 2.5, 2.5), 0.95)
    (cl, ch) shouldBe ((2.5, 2.5))
  }

  test("NaN poisons the interval (remove_nans=False reference default)") {
    val (lo, hi) = QuantityStatistics.confidenceInterval1d(
      Array(1.0, Double.NaN, 3.0), 0.95)
    assert(lo.isNaN && hi.isNaN)
  }

  test("gather: element-wise mean/std(ddof=0)/CI over vector quantities") {
    case class Model(v: Array[Double])
    val rng = new java.util.SplittableRandom(5L)
    val samples = Seq.fill(200)(Model(Array.fill(3)(rng.nextDouble() * 10)))
    val gs = QuantityStatistics.gather[Model](samples, _.v, "v")
    gs.dim shouldBe 3
    (0 until 3).foreach { i =>
      val vals = samples.map(_.v(i))
      val mu = vals.sum / vals.size
      gs.mean(i) shouldBe mu +- 1e-12
      gs.std(i) shouldBe math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / vals.size) +- 1e-12
      gs.lower(i) should be <= gs.mean(i)
      gs.upper(i) should be >= gs.mean(i)
      gs.lower(i) should be >= vals.min
      gs.upper(i) should be <= vals.max
    }
    // conf=1 brackets exactly
    val g1 = QuantityStatistics.gather[Model](samples, _.v, confidence = 1.0)
    (0 until 3).foreach { i =>
      g1.lower(i) shouldBe samples.map(_.v(i)).min
      g1.upper(i) shouldBe samples.map(_.v(i)).max
    }
  }

  test("gatherScalar equals 1-element gather") {
    val xs = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0)
    val a = QuantityStatistics.gatherScalar[Double](xs, identity)
    val b = QuantityStatistics.gather[Double](xs, x => Array(x))
    a.mean.toSeq shouldBe b.mean.toSeq
    a.std.toSeq shouldBe b.std.toSeq
    a.lower.toSeq shouldBe b.lower.toSeq
    a.upper.toSeq shouldBe b.upper.toSeq
  }
}
