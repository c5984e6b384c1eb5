package graft.data

import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** PBF physics sanity (reference behavior contract, not bit parity with
  * the C++ engine): particles settle under gravity, stay in the box,
  * density equilibrates near rho0, and the run is deterministic. */
class PbfSpec extends SparkSpec with Matchers {

  private def smallInit: Array[Double] = {
    // 6x5 = 30 particles near the top of a small box
    val out = new Array[Double](2 * 30)
    var k = 0
    for (y <- 0 until 5; x <- 0 until 6) {
      out(2 * k) = -3.0 + x * 1.2
      out(2 * k + 1) = 1.0 + y * 1.2
      k += 1
    }
    out
  }

  test("particles fall under gravity, stay inside the box, and settle") {
    val sim = new PbfSimulator(16.0, 10.0, 1.5, smallInit)
    val before = sim.positions
    val meanY0 = (0 until sim.n).map(i => before(2 * i + 1)).sum / sim.n
    sim.run(300, 0.0)
    val after = sim.positions
    val meanY1 = (0 until sim.n).map(i => after(2 * i + 1)).sum / sim.n
    meanY1 should be < meanY0 - 1.0 // fell
    (0 until sim.n).foreach { i =>
      after(2 * i) should (be >= -8.0 and be <= 8.0)
      after(2 * i + 1) should (be >= -5.0 and be <= 5.0)
    }
    // settled: velocity between consecutive frames is small
    val f1 = sim.positions
    sim.step(0.0)
    val f2 = sim.positions
    val maxMove = (0 until 2 * sim.n).map(i => math.abs(f2(i) - f1(i))).max
    maxMove should be < 0.5
  }

  test("drift pushes the settled fluid sideways") {
    val simL = new PbfSimulator(16.0, 10.0, 1.5, smallInit)
    simL.run(200, 0.0)
    val settledX = { val p = simL.positions; (0 until simL.n).map(i => p(2 * i)).sum / simL.n }
    simL.run(150, 1.0) // drift accelerates along -x (reference sign)
    val driftedX = { val p = simL.positions; (0 until simL.n).map(i => p(2 * i)).sum / simL.n }
    driftedX should be < settledX - 0.5
  }

  test("deterministic across runs") {
    val a = new PbfSimulator(16.0, 10.0, 1.5, smallInit).run(50, 0.0).last
    val b = new PbfSimulator(16.0, 10.0, 1.5, smallInit).run(50, 0.0).last
    a.toSeq shouldBe b.toSeq
  }

  test("reference default grid yields 972 particles") {
    Pbf.defaultInitialPositions().length shouldBe 2 * 972
  }

  test("distributed surface: one trajectory per drift, canonical schema") {
    val df = Pbf.trajectories(spark, drifts = Seq(0.0, 0.5), steps = 5,
      nBurnIn = 5, initialPositions = Some(smallInit))
    df.count() shouldBe 10
    df.columns.toSeq shouldBe Seq("traj_id", "t", "features")
    import org.apache.spark.sql.functions.{col, expr, max => smax}
    df.select(smax(expr("size(features)"))).collect().head.getInt(0) shouldBe 60
  }
}
