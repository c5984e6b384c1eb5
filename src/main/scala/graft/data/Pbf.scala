package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Position-based fluids simulator (Macklin & Mueller 2013, "Position
  * Based Fluids"; reference data/_datasets.py:69 `position_based_fluids`,
  * C++ engine src/include/deeptime/data/pbf.h). 2-D SPH-style particle
  * system: predict under gravity/drift, then a few constraint-projection
  * solver sweeps enforcing constant density via per-particle Lagrange
  * multipliers (lambdas), with an anti-clustering tensile-instability
  * correction; velocities recovered from the position update.
  *
  * Deterministic up to floating point. A cell-grid neighbor list keeps
  * each step O(N): kernels vanish beyond the interaction radius h, so
  * only the 3x3 adjacent cells are visited.
  *
  * Scale shape: one SIMULATION is a coupled N-body system and runs as a
  * sequential local loop (exactly like the reference); the distributed
  * surface runs MANY simulations (drift/initial-condition grid), one per
  * Spark task — the generators' fan-out contract. */
class PbfSimulator(
    val domainW: Double, val domainH: Double,
    val h: Double, // interaction radius
    initialPositions: Array[Double], // flattened (x, y) pairs
    val gravity: Double = 10.0,
    val dt: Double = 0.016,
    val rho0: Double = 1.0,
    val epsilon: Double = 5.0,
    val nSolverIterations: Int = 5,
    val tensileK: Double = 0.1,
    tensileDq: Double = 0.2) {

  val n: Int = initialPositions.length / 2
  private val pos = initialPositions.clone()
  private val prevPos = initialPositions.clone()
  private val vel = new Array[Double](2 * n)
  private val lambdas = new Array[Double](n)

  // SPH kernels (pbf.h util::Wpoly6 / Wspiky / gradWspiky; 2-D constants)
  private def wpoly6(r: Double): Double =
    if (r > h) 0.0 else {
      val t = h * h - r * r
      1.56668147106 * t * t * t / math.pow(h, 9)
    }
  private val tensileScale = 1.0 / wpoly6(tensileDq)

  // ---- cell-grid neighbor list -------------------------------------------
  private val cellsX = math.max(1, (domainW / h).toInt)
  private val cellsY = math.max(1, (domainH / h).toInt)
  private val cellHead = new Array[Int](cellsX * cellsY)
  private val cellNext = new Array[Int](n)

  private def cellOf(x: Double, y: Double): Int = {
    val cx = math.min(cellsX - 1, math.max(0, ((x + 0.5 * domainW) / h).toInt))
    val cy = math.min(cellsY - 1, math.max(0, ((y + 0.5 * domainH) / h).toInt))
    cy * cellsX + cx
  }

  private def rebuildCells(): Unit = {
    java.util.Arrays.fill(cellHead, -1)
    var i = 0
    while (i < n) {
      val c = cellOf(pos(2 * i), pos(2 * i + 1))
      cellNext(i) = cellHead(c)
      cellHead(c) = i
      i += 1
    }
  }

  /** Visit all particles in the 3x3 cells around particle `id`
    * (including itself, as the reference neighborhood does). */
  private def forEachNeighbor(id: Int)(f: Int => Unit): Unit = {
    val x = pos(2 * id); val y = pos(2 * id + 1)
    val cx = math.min(cellsX - 1, math.max(0, ((x + 0.5 * domainW) / h).toInt))
    val cy = math.min(cellsY - 1, math.max(0, ((y + 0.5 * domainH) / h).toInt))
    var dy = -1
    while (dy <= 1) {
      var dx = -1
      while (dx <= 1) {
        val nx = cx + dx; val ny = cy + dy
        if (nx >= 0 && nx < cellsX && ny >= 0 && ny < cellsY) {
          var j = cellHead(ny * cellsX + nx)
          while (j >= 0) { f(j); j = cellNext(j) }
        }
        dx += 1
      }
      dy += 1
    }
  }

  // ---- one PBF step ------------------------------------------------------
  def step(drift: Double): Unit = {
    // predict: gravity down, drift along -x (pbf.h predictPositions)
    var i = 0
    while (i < n) {
      vel(2 * i + 1) -= gravity * dt
      vel(2 * i) -= drift * gravity * dt
      pos(2 * i) += dt * vel(2 * i)
      pos(2 * i + 1) += dt * vel(2 * i + 1)
      i += 1
    }
    rebuildCells()
    var sweep = 0
    while (sweep < nSolverIterations) {
      // lambdas (pbf.h calculateLambdas; Macklin-Mueller eqs 1, 8-9, 11)
      i = 0
      while (i < n) {
        var rho = 0.0
        var sumK = 0.0
        var gx = 0.0; var gy = 0.0
        val xi = pos(2 * i); val yi = pos(2 * i + 1)
        forEachNeighbor(i) { j =>
          val dx = xi - pos(2 * j); val dy = yi - pos(2 * j + 1)
          val r = math.sqrt(dx * dx + dy * dy)
          rho += wpoly6(r)
          if (r > 0 && r <= h) {
            val t = h - r
            val scale = (-3.0 * 4.774648292756860 * t * t) / (r * math.pow(h, 6)) / rho0
            val kx = scale * dx; val ky = scale * dy
            sumK += kx * kx + ky * ky
            gx += kx; gy += ky
          }
        }
        sumK += gx * gx + gy * gy
        val ci = rho / rho0 - 1.0
        lambdas(i) = -ci / (sumK + epsilon)
        i += 1
      }
      // position deltas + box clamp (pbf.h updatePositions)
      i = 0
      while (i < n) {
        var dxAcc = 0.0; var dyAcc = 0.0
        val xi = pos(2 * i); val yi = pos(2 * i + 1)
        val li = lambdas(i)
        forEachNeighbor(i) { j =>
          val dx = xi - pos(2 * j); val dy = yi - pos(2 * j + 1)
          val r = math.sqrt(dx * dx + dy * dy)
          if (r > 0 && r <= h) {
            val w = tensileScale * wpoly6(r)
            val corr = -tensileK * w * w * w * w
            val t = h - r
            val scale = (-3.0 * 4.774648292756860 * t * t) / (r * math.pow(h, 6))
            dxAcc += (li + lambdas(j) + corr) * scale * dx
            dyAcc += (li + lambdas(j) + corr) * scale * dy
          }
        }
        pos(2 * i) = clamp(xi + dxAcc / rho0, -0.5 * domainW, 0.5 * domainW)
        pos(2 * i + 1) = clamp(yi + dyAcc / rho0, -0.5 * domainH, 0.5 * domainH)
        i += 1
      }
      sweep += 1
    }
    // velocity from realized displacement (pbf.h update)
    i = 0
    while (i < 2 * n) {
      vel(i) = (pos(i) - prevPos(i)) / dt
      prevPos(i) = pos(i)
      i += 1
    }
  }

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    if (v < lo) lo else if (v > hi) hi else v

  /** Run `steps` steps, returning one flattened position frame per step. */
  def run(steps: Int, drift: Double = 0.0): Array[Array[Double]] =
    Array.fill(steps) { step(drift); pos.clone() }

  def positions: Array[Double] = pos.clone()
}

object Pbf {

  /** The reference's fixed initial grid: 972 particles near the top of the
    * [-40, 40] x [-25, 25] box (data/_datasets.py:118-121). */
  def defaultInitialPositions(h: Double = 1.5): Array[Double] = {
    val xs = Iterator.iterate(-24.0)(_ + h * 0.9).takeWhile(_ < 24.0).toArray
    val ys = Iterator.iterate(-12.0)(_ + h * 0.9).takeWhile(_ < 24.0).toArray
    val out = new Array[Double](2 * xs.length * ys.length)
    var k = 0
    for (y <- ys; x <- xs) { out(2 * k) = x; out(2 * k + 1) = y; k += 1 }
    out
  }

  def simulator(nBurnIn: Int = 5000, initialPositions: Option[Array[Double]] = None): PbfSimulator = {
    val sim = new PbfSimulator(80.0, 50.0, 1.5,
      initialPositions.getOrElse(defaultInitialPositions()))
    var i = 0
    while (i < nBurnIn) { sim.step(0.0); i += 1 }
    sim
  }

  /** Distributed surface: one simulation per drift value, one Spark task
    * each, frames as the canonical trajectory schema (features = flattened
    * particle positions). */
  def trajectories(spark: SparkSession, drifts: Seq[Double], steps: Int,
                   nBurnIn: Int = 500,
                   initialPositions: Option[Array[Double]] = None): DataFrame = {
    import spark.implicits._
    val init = initialPositions.getOrElse(defaultInitialPositions())
    spark.createDataset(drifts.zipWithIndex)
      .repartition(math.min(drifts.length, spark.sparkContext.defaultParallelism))
      .flatMap { case (drift, id) =>
        val sim = new PbfSimulator(80.0, 50.0, 1.5, init.clone())
        var i = 0
        while (i < nBurnIn) { sim.step(0.0); i += 1 }
        sim.run(steps, drift).iterator.zipWithIndex.map { case (frame, t) =>
          (id.toLong, t.toLong, frame.toSeq)
        }
      }
      .toDF("traj_id", "t", "features")
  }
}
