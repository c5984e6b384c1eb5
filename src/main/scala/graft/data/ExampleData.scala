package graft.data

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Example/benchmark datasets (reference data/_ellipsoids.py:8 `Ellipsoids`,
  * data/_drunkards_walk_simulator.py:11 `DrunkardsWalk`). Both reduce to a
  * discrete chain + an observation map, so simulation reuses the
  * distributed `MarkovSim.simulate`. */
object ExampleData {

  /** Two-state lazy chain observed as two parallel 2-d gaussian ellipsoids
    * (Ellipsoids): state 0 at (0,0), state 1 at (0,5), covariance
    * diag-ish with correlation. Returns (traj_id, t, state, features). */
  def ellipsoids(spark: SparkSession, laziness: Double = 0.97, nTraj: Int = 4,
                 length: Int = 1000, seed: Long = 42L): DataFrame = {
    require(laziness > 0.5 && laziness <= 1.0, "laziness must be in (0.5, 1]")
    import spark.implicits._
    val p = DenseMatrix((laziness, 1.0 - laziness), (1.0 - laziness, laziness))
    val dtraj = MarkovSim.simulate(spark, p, nTraj, length, seed)
    // observation: correlated 2-d gaussian around the state mean
    // (cholesky of [[.7,.3],[.3,.4]]-ish shape, matching the flattened
    // ellipsoid look of the reference)
    dtraj.as[(Long, Long, Int)].map { case (id, t, s) =>
      val rng = new java.util.SplittableRandom(
        seed ^ (id * 0x9E3779B97F4A7C15L) ^ (t * 0xBF58476D1CE4E5B9L))
      val z0 = rng.nextGaussian(); val z1 = rng.nextGaussian()
      val x = 0.8366 * z0
      val y = 0.3586 * z0 + 0.5244 * z1 + (if (s == 1) 5.0 else 0.0)
      (id, t, s, Seq(x, y))
    }.toDF("traj_id", "t", "state", "features")
  }

  /** sqrt model (data/_datasets.py:349 `sqrt_model`): 2-state lazy chain
    * (P = [[.95,.05],[.05,.95]]) observed through gaussians at (0, +-1) with
    * cov diag(30, 0.015) and the nonlinear mask (x, y) -> (x, y + sqrt|x|),
    * making the metastable states not linearly separable. */
  def sqrtModel(spark: SparkSession, nTraj: Int, length: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val p = DenseMatrix((0.95, 0.05), (0.05, 0.95))
    MarkovSim.simulate(spark, p, nTraj, length, seed)
      .as[(Long, Long, Int)].map { case (id, t, s) =>
        val rng = new java.util.SplittableRandom(
          seed ^ (id * 0x9E3779B97F4A7C15L) ^ (t * 0xBF58476D1CE4E5B9L) ^ 0x5851F42D4C957F2DL)
        val x = math.sqrt(30.0) * rng.nextGaussian()
        val y = (if (s == 0) 1.0 else -1.0) + math.sqrt(0.015) * rng.nextGaussian()
        (id, t, s, Seq(x, y + math.sqrt(math.abs(x))))
      }.toDF("traj_id", "t", "state", "features")
  }

  /** Swiss-roll model (data/_datasets.py:406 `swissroll_model`): 4-state
    * nearest-neighbor chain observed as unit gaussians at the corners of a
    * square, rolled into 3-d via (x, y) -> (x cos x, y, x sin x). */
  def swissrollModel(spark: SparkSession, nTraj: Int, length: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val p = DenseMatrix(
      (0.95, 0.05, 0.00, 0.00),
      (0.05, 0.90, 0.05, 0.00),
      (0.00, 0.05, 0.90, 0.05),
      (0.00, 0.00, 0.05, 0.95))
    val means = Array(Array(7.5, 7.5), Array(7.5, 15.0), Array(15.0, 15.0), Array(15.0, 7.5))
    MarkovSim.simulate(spark, p, nTraj, length, seed)
      .as[(Long, Long, Int)].map { case (id, t, s) =>
        val rng = new java.util.SplittableRandom(
          seed ^ (id * 0x9E3779B97F4A7C15L) ^ (t * 0xBF58476D1CE4E5B9L) ^ 0x94D049BB133111EBL)
        val x = means(s)(0) + rng.nextGaussian()
        val y = means(s)(1) + rng.nextGaussian()
        (id, t, s, Seq(x * math.cos(x), y, x * math.sin(x)))
      }.toDF("traj_id", "t", "state", "features")
  }

  /** Drunkard's-walk grid chain (DrunkardsWalk): uniform 3x3-stencil moves
    * on an n x m grid with absorbing bar/home states; (i, j) -> i + n*j. */
  case class DrunkardsWalk(gridWidth: Int, gridHeight: Int,
                           barState: Int, homeState: Int,
                           barriers: Set[Int] = Set.empty) {
    val nStates: Int = gridWidth * gridHeight

    def coordToState(x: Int, y: Int): Int = x + gridWidth * y
    def stateToCoord(s: Int): (Int, Int) = (s % gridWidth, s / gridWidth)

    lazy val transitionMatrix: DenseMatrix[Double] = {
      val m = DenseMatrix.zeros[Double](nStates, nStates)
      for (s <- 0 until nStates) {
        if (s == barState || s == homeState) m(s, s) = 1.0
        else {
          val (x, y) = stateToCoord(s)
          val moves = for {
            dx <- -1 to 1; dy <- -1 to 1
            if !(dx == 0 && dy == 0)
            nx = x + dx; ny = y + dy
            if nx >= 0 && nx < gridWidth && ny >= 0 && ny < gridHeight
            t = coordToState(nx, ny)
            if !barriers.contains(t)
          } yield t
          if (moves.isEmpty) m(s, s) = 1.0
          else moves.foreach(t => m(s, t) += 1.0 / moves.length)
        }
      }
      m
    }

    /** Distributed walks from a start coordinate. */
    def simulate(spark: SparkSession, startX: Int, startY: Int, nTraj: Int,
                 length: Int, seed: Long = 42L): DataFrame = {
      val start = coordToState(startX, startY)
      val dist = Array.fill(nStates)(0.0)
      dist(start) = 1.0
      MarkovSim.simulate(spark, transitionMatrix, nTraj, length, seed, Some(dist))
    }
  }
}
