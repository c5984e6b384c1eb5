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
