package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver PageRank (q157): closed forms on symmetric graphs, mass
  * conservation, damping floor. */
class PageRankSpec extends AnyFunSuite with Matchers {

  test("star graph matches the 2x2 closed form") {
    // center 0, leaves 1..4 (k=4, n=5). Symmetry: all leaves equal.
    // c = (1-b)/n + b*k*l_inflow where each leaf sends rank_l (deg 1);
    // l = (1-b)/n + b*c/k
    val k = 4
    val n = k + 1
    val b = 0.85
    val (pr, resid, _) = Dedup.pageRank((1 to k).map(i => (0L, i.toLong)))
    resid should be <= 1e-9
    val c = pr(0L)
    val l = pr(1L)
    // closed form of { c = (1-b)/n + b*k*l ; l = (1-b)/n + b*c/k }:
    // c = (1+b*k)/(n*(1+b))
    val cClosed = (1 + b * k) / (n * (1 + b))
    val lClosed = (1 - b) / n + b * cClosed / k
    c shouldBe cClosed +- 1e-8
    l shouldBe lClosed +- 1e-8
    (2 to k).foreach(i => pr(i.toLong) shouldBe l +- 1e-12)
    pr.values.sum shouldBe 1.0 +- 1e-10
  }

  test("regular graphs are uniform (cycle)") {
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6))
    val (pr, _, _) = Dedup.pageRank(edges)
    pr.values.foreach(_ shouldBe (1.0 / 6) +- 1e-9)
  }

  test("disconnected components both get teleport mass; floor holds") {
    val (pr, _, _) = Dedup.pageRank(Seq((0L, 1L), (10L, 11L), (10L, 12L)))
    pr.size shouldBe 5
    pr.values.sum shouldBe 1.0 +- 1e-10
    val floor = 0.15 / 5
    pr.values.foreach(v => assert(v >= floor - 1e-12))
    // the pair component holds less mass than the triangle-ish one
    (pr(0L) + pr(1L)) should be < (pr(10L) + pr(11L) + pr(12L))
  }

  test("empty edge list yields the empty model") {
    Dedup.pageRank(Nil) shouldBe ((Map.empty[Long, Double], 0.0, 0))
  }
}

/** Distributed PageRank (q259, graph100): the beyond-1M-edge path must
  * be indistinguishable from the driver power iteration. */
class PageRankDistributedSpec extends graft.SparkSpec with Matchers {

  private def parity(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val (distDf, resid, iters) = Dedup.pageRankDistributed(df)
    val (drv, residDrv, itersDrv) = Dedup.pageRank(edges)
    val dist = distDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    dist.keySet shouldBe drv.keySet
    // both paths stop at L-inf residual <= 1e-9, each leaving up to
    // ~tol/(1-beta) of distance to the true fixpoint — parity bound 5e-8
    dist.foreach { case (id, rk) => rk shouldBe drv(id) +- 5e-8 }
    resid should be <= 1e-9
    // iteration COUNTS are not comparable across the two stopping rules
    // (the 4-step round diff can cancel on bipartite-ish graphs where
    // the transient eigenvalue is negative) — the contract is rank
    // parity + convergence, asserted above; both must just terminate
    // well before the cap
    iters should be <= 200
    itersDrv should be <= 200
    residDrv should be <= 1e-9
  }

  test("star + cycle + disconnected fixtures: rank-for-rank driver parity") {
    parity((1 to 4).map(i => (0L, i.toLong)))
    parity((0L until 6L).map(i => (i, (i + 1) % 6)))
    parity(Seq((0L, 1L), (10L, 11L), (10L, 12L)))
  }

  test("random near-dup-shaped graph (stars + chains + cliques): parity") {
    // deterministic construction, no RNG: 30 star hubs of width 5,
    // 20 chains of length 6, 5 cliques of size 5 — the shapes dup
    // graphs actually take
    val stars = (0 until 30).flatMap(h =>
      (1 to 5).map(i => (h * 100L, h * 100L + i)))
    val chains = (0 until 20).flatMap(c =>
      (0 until 5).map(i => (10000L + c * 10 + i, 10000L + c * 10 + i + 1)))
    val cliques = (0 until 5).flatMap(q => for {
      i <- 0 until 5; j <- (i + 1) until 5
    } yield (20000L + q * 10 + i, 20000L + q * 10 + j))
    parity(stars ++ chains ++ cliques)
  }

  test("empty edge frame yields the empty model") {
    import spark.implicits._
    val (df, resid, iters) =
      Dedup.pageRankDistributed(Seq.empty[(Long, Long)].toDF("a", "b"))
    df.count() shouldBe 0L
    resid shouldBe 0.0
    iters shouldBe 0
  }

  test("pageRankAuto dispatches by edge count, both sides parity-equal") {
    import spark.implicits._
    val edges = (1 to 4).map(i => (0L, i.toLong))
    val df = edges.toDF("a", "b")
    val (lo, _, _) = Dedup.pageRankAuto(df, driverEdgeThreshold = 1000L)
    val (hi, _, _) = Dedup.pageRankAuto(df, driverEdgeThreshold = 0L)
    val l = lo.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val h = hi.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    l.keySet shouldBe h.keySet
    l.foreach { case (id, rk) => rk shouldBe h(id) +- 5e-8 }
  }
}
