package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Orthogonal Procrustes: exact recovery of a planted rotation,
  * orthogonality of the estimate. */
class ProcrustesSpec extends SparkSpec with Matchers {

  test("recovers a planted orthogonal transform to machine precision") {
    import spark.implicits._
    val d = 8
    val rng = new java.util.SplittableRandom(3L)
    // planted orthogonal Q: permutation + signs
    val perm = Array(3, 1, 7, 0, 5, 2, 6, 4)
    val sign = Array(1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0)
    val rows = (0 until 300).map { i =>
      val a = Array.fill(d)(rng.nextGaussian())
      val b = Array.tabulate(d)(j => sign(j) * a(perm(j)))
      (i.toLong, a.toSeq, b.toSeq)
    }
    val df = rows.toDF("id", "va", "vb")
    val r = Procrustes.align(df, "va", "vb", d)
    // R orthogonal
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      dot shouldBe (if (i == j) 1.0 else 0.0) +- 1e-10
    }
    // a R == b for every planted pair
    rows.take(20).foreach { case (_, a, b) =>
      (0 until d).foreach { j =>
        val p = (0 until d).map(i => a(i) * r(i)(j)).sum
        p shouldBe b(j) +- 1e-10
      }
    }
  }

  test("cross-gram matches the driver-side computation") {
    import spark.implicits._
    val d = 3
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(-1.0, 0.5, 2.0), Seq(1.0, -2.0, 0.0)))
    val df = rows.toDF("va", "vb")
    val m = Procrustes.crossGram(df, "va", "vb", d)
    for (i <- 0 until d; j <- 0 until d) {
      val want = rows.map { case (a, b) => a(i) * b(j) }.sum
      m(i, j) shouldBe want +- 1e-12
    }
  }
}
