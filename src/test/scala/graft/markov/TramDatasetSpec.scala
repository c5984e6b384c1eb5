package graft.markov

import org.scalatest.funsuite.AnyFunSuite

/** TRAMDataset connectivity restriction vs the reference's own test
  * fixtures (tests/markov/msm/test_tram_datatset.py) — the parametrized
  * expected connected sets are ported verbatim. Bias matrices are all-ones
  * exactly like `get_connected_set_from_dtrajs_input`. */
class TramDatasetSpec extends AnyFunSuite {

  private def dataset(dtrajs: Seq[Seq[Int]], withTtrajs: Boolean): TramDataset = {
    val d = dtrajs.map(_.toArray).toArray
    val k = d.length
    val bias = d.map(t => Array.fill(t.length)(Array.fill(k)(1.0)))
    val tt = if (withTtrajs)
      Some(d.zipWithIndex.map { case (t, i) => Array.fill(t.length)(i) })
    else None
    new TramDataset(d, bias, tt, lagtime = 1, countMode = "sliding")
  }

  private def lcs(dtrajs: Seq[Seq[Int]], mode: String, factor: Double = 1.0,
                  withTtrajs: Boolean = true): Seq[Int] =
    dataset(dtrajs, withTtrajs).largestConnectedSet(mode, factor).toSeq

  // --- summed_count_matrix (test_connected_set_summed_count_matrix) -------
  val summedCases: Seq[(Seq[Seq[Int]], Seq[Int])] = Seq(
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 5, 6, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3), Seq(3, 4, 5), Seq(5, 3, 2)) -> Seq(2, 3, 4, 5),
    Seq(Seq(1, 2, 3, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 2, 1)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 4, 3, 4)) -> Seq(2, 3, 4),
    Seq(Seq(1, 2, 1, 3, 2, 7, 7, 7, 6), Seq(3, 4, 3, 3, 4, 5, 6, 6, 5, 4)) ->
      Seq(1, 2, 3, 4, 5, 6, 7))

  for (((in, expected), idx) <- summedCases.zipWithIndex;
       tt <- Seq(true, false)) {
    test(s"summed_count_matrix case $idx ttrajs=$tt") {
      assert(lcs(in, "summed_count_matrix", withTtrajs = tt) == expected)
    }
  }

  // --- post_hoc_RE, factor 1 (test_connected_set_post_hoc_re) -------------
  val postHocCases: Seq[(Seq[Seq[Int]], Seq[Int])] = Seq(
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 5, 6, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 4, 5, 4, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 3, 4, 5, 4)) -> Seq(1, 2, 3, 4, 5),
    Seq(Seq(1, 2, 3), Seq(3, 4, 5), Seq(5, 3, 2)) -> Seq(3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 1, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 1, 3, 2, 7, 7, 6), Seq(3, 4, 3, 3, 4, 5, 6, 5, 4)) ->
      Seq(1, 2, 3, 4, 5, 6),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 5, 6, 5, 3), Seq(3, 5, 6, 5, 3)) ->
      Seq(1, 2, 3, 5, 6))

  for (((in, expected), idx) <- postHocCases.zipWithIndex) {
    test(s"post_hoc_RE case $idx") {
      assert(lcs(in, "post_hoc_RE") == expected)
    }
  }

  // --- post_hoc_RE, factor 0 (no thermodynamic overlap allowed) ------------
  val postHocNoConn: Seq[(Seq[Seq[Int]], Seq[Int])] = Seq(
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 5, 6, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 3, 4, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 1, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 1, 3, 2, 7, 7, 6), Seq(3, 4, 3, 3, 4, 5, 6, 5, 4)) ->
      Seq(3, 4, 5, 6),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 5, 6, 5, 3), Seq(3, 5, 6, 5, 3)) ->
      Seq(1, 2, 3))

  for (((in, expected), idx) <- postHocNoConn.zipWithIndex;
       tt <- Seq(true, false)) {
    test(s"post_hoc_RE factor=0 case $idx ttrajs=$tt") {
      assert(lcs(in, "post_hoc_RE", factor = 0.0, withTtrajs = tt) == expected)
    }
  }

  // --- BAR_variance, factor 1 (test_connected_set_bar_variance) -----------
  val barCases: Seq[(Seq[Seq[Int]], Seq[Int])] = Seq(
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 5, 6, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 4, 5, 4, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 3, 4, 5, 4)) -> Seq(1, 2, 3, 4, 5),
    Seq(Seq(1, 2, 3), Seq(3, 4, 5), Seq(5, 3, 2)) -> Seq(3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 1, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 1, 3, 2, 7, 7, 6), Seq(3, 4, 3, 3, 4, 5, 6, 5, 4)) ->
      Seq(3, 4, 5, 6),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 5, 6, 5, 3), Seq(3, 5, 6, 5, 3)) ->
      Seq(1, 2, 3, 5, 6))

  for (((in, expected), idx) <- barCases.zipWithIndex;
       tt <- Seq(true, false)) {
    test(s"BAR_variance case $idx ttrajs=$tt") {
      assert(lcs(in, "BAR_variance", withTtrajs = tt) == expected)
    }
  }

  // --- BAR_variance, factor 0 ----------------------------------------------
  val barNoConn: Seq[(Seq[Seq[Int]], Seq[Int])] = Seq(
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 5, 6, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2, 1), Seq(4, 3, 4, 5, 4)) -> Seq(1, 2, 3),
    Seq(Seq(1, 2, 3, 2), Seq(3, 1, 2)) -> Seq(2, 3),
    Seq(Seq(1, 2, 1, 3, 2, 7, 7, 6), Seq(3, 4, 3, 3, 4, 5, 6, 5, 4)) ->
      Seq(3, 4, 5, 6),
    Seq(Seq(1, 2, 3, 2, 1), Seq(3, 5, 6, 5, 3), Seq(3, 5, 6, 5, 3)) ->
      Seq(1, 2, 3))

  for (((in, expected), idx) <- barNoConn.zipWithIndex;
       tt <- Seq(true, false)) {
    test(s"BAR_variance factor=0 case $idx ttrajs=$tt") {
      assert(lcs(in, "BAR_variance", factor = 0.0, withTtrajs = tt) == expected)
    }
  }

  // --- restrict_to_submodel (test_restrict_to_submodel_with_indices_input) -
  test("restrict_to_submodel maps out-of-set samples to -1") {
    val ds = dataset(Seq(Seq(0, 1, 2, 3, 4, 5, 1), Seq(2, 4, 2, 1, 3, 1, 4)),
      withTtrajs = false)
    ds.restrictToSubmodel(Array(1, 2, 3))
    assert(ds.dtrajs(0).toSeq == Seq(-1, 1, 2, 3, -1, -1, 1))
    assert(ds.dtrajs(1).toSeq == Seq(2, -1, 2, 1, 3, 1, -1))
  }

  // --- restriction over replica-exchange data (3 trajs, 2 therm states) ---
  test("restrict_to_submodel restricts ALL trajectories, not nThermStates") {
    val d = Array(Array(0, 1, 2, 3, 1), Array(2, 3, 2, 1, 0), Array(1, 2, 3, 0, 1))
    val tt = Array(Array(0, 0, 1, 1, 0), Array(1, 1, 0, 0, 1), Array(0, 1, 1, 0, 0))
    val bias = d.map(t => Array.fill(t.length)(Array.fill(2)(1.0)))
    val ds = new TramDataset(d, bias, Some(tt))
    assert(ds.nThermStates == 2)
    assert(ds.dtrajs.length == 3)
    ds.restrictToSubmodel(Array(1, 2, 3))
    ds.dtrajs.foreach { t =>
      assert(!t.contains(0))
      assert(t.contains(-1))
    }
  }

  // --- count models over RE fragments (test_make_count_models) -------------
  for (lag <- Seq(1, 3)) {
    test(s"count models per therm state, fragment split at swaps, lag=$lag") {
      val d = Array(Array(1, 1, 2, 3, 1, 1, 1, 2, 0, 0, 1, 3, 1, 4, 2, 2, 2, 2))
      val tt = Array(Array(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2))
      val bias = d.map(t => Array.fill(t.length)(Array.fill(3)(1.0)))
      val ds = new TramDataset(d, bias, Some(tt), lagtime = lag)
      assert(ds.countModels.length == ds.nThermStates)
      assert(ds.stateCounts.length == ds.nThermStates)
      assert(ds.stateCounts.head.length == ds.nMarkovStates)
      // reference asserts symbols [0..3], [0..4], [0..2] per therm state
      assert(ds.countModels(0).histogram.length == 4)
      assert(ds.countModels(1).histogram.length == 5)
      assert(ds.countModels(2).histogram.length == 3)
      val frags = ds.trajectoryFragments
      for (k <- 0 until ds.nThermStates) {
        assert(ds.transitionCounts(k).toArray.sum.toLong ==
          frags(k).head.length - lag)
        assert(ds.stateCounts(k).sum == frags(k).head.length)
      }
    }
  }

  // --- full restriction pipeline (test_transposed_count_matrices_bug) ------
  test("restrict_to_largest_connected_set summed mode end-to-end") {
    val d = Array(
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 1, 0, 1, 1, 1, 1, 1),
      Array(1, 0, 0, 1, 1, 1, 1, 1, 1, 0),
      Array(1, 0, 1, 1, 1, 1, 1, 1, 1, 1))
    val bias = d.map(t => Array.fill(t.length)(Array.fill(5)(1.0)))
    val ds = new TramDataset(d, bias)
    ds.restrictToLargestConnectedSet("summed_count_matrix")
    assert(ds.stateCounts.map(_.toSeq).toSeq == Seq(
      Seq(10L, 0L), Seq(9L, 1L), Seq(4L, 6L), Seq(3L, 7L), Seq(1L, 9L)))
    val tc = ds.transitionCounts.map(m =>
      Seq(Seq(m(0, 0), m(0, 1)), Seq(m(1, 0), m(1, 1))))
    assert(tc.toSeq == Seq(
      Seq(Seq(9.0, 0.0), Seq(0.0, 0.0)),
      Seq(Seq(7.0, 1.0), Seq(1.0, 0.0)),
      Seq(Seq(2.0, 2.0), Seq(1.0, 4.0)),
      Seq(Seq(1.0, 1.0), Seq(2.0, 5.0)),
      Seq(Seq(0.0, 1.0), Seq(1.0, 7.0))))
  }

  // --- fragment mapping quirks (trajectory_mapping.h) ----------------------
  test("swap point folds into the FRONT of the following fragment") {
    // [0,0,0,1,0,0,0]: fragments (0,0,3) and (0,3,7), both therm 0
    val d = Array(Array(1, 2, 3, 4, 5, 6, 7))
    val tt = Array(Array(0, 0, 0, 1, 0, 0, 0))
    val bias = d.map(t => Array.fill(t.length)(Array.fill(2)(1.0)))
    val ds = new TramDataset(d, bias, Some(tt))
    val frags = ds.fragmentIndices
    assert(frags(0) == Vector((0, 0, 3), (0, 3, 7)))
    assert(frags(1).isEmpty)
  }

  test("negative samples split fragments (no glued transitions)") {
    // dtraj [0,0,2,-1,2,1,0] with one therm state: fragments [0,0,2],[2,1,0]
    // at lag 1 -> no 2->2 transition
    val d = Array(Array(0, 0, 2, -1, 2, 1, 0))
    val tt = Array(Array(0, 0, 0, 0, 0, 0, 0))
    val bias = d.map(t => Array.fill(t.length)(Array.fill(1)(1.0)))
    val ds = new TramDataset(d, bias, Some(tt), nMarkovStatesOpt = Some(3))
    val c = ds.transitionCounts(0)
    assert(c(2, 2) == 0.0)
    assert(c(0, 0) == 1.0 && c(0, 2) == 1.0 && c(2, 1) == 1.0 && c(1, 0) == 1.0)
  }
}
