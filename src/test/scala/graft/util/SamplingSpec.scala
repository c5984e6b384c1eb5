package graft.util

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** The shared 65536-row landmark sampling rule (Sampling.rowCap) — the
  * one definition behind KMeansPlusPlus seeding, q141's roundtrip
  * training cap, and cluster100's capped fit. Pins the three contract
  * points the call sites rely on: pass-through below the cap (q141's
  * oracle depends on the sub-cap frame being THE input frame, not a
  * fraction-1.0 sample of it), a bounded expected size above the cap,
  * and seed determinism (the transport-parity discipline: same seed ⇒
  * same training rows ⇒ same model). */
class SamplingSpec extends SparkSpec with Matchers {

  test("rowCap is identity (the same plan, not a sample) at or below the cap") {
    import spark.implicits._
    val df = (0 until 100).map(_.toLong).toDF("id")
    val capped = Sampling.rowCap(df, maxRows = 100L)
    assert(capped eq df, "sub-cap input must pass through untouched")
  }

  test("rowCap above the cap: expected-size sample, deterministic by seed") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toLong).toDF("id").repartition(8)
    val a = Sampling.rowCap(df, maxRows = 5000L, seed = 7L).collect().map(_.getLong(0))
    val b = Sampling.rowCap(df, maxRows = 5000L, seed = 7L).collect().map(_.getLong(0))
    val c = Sampling.rowCap(df, maxRows = 5000L, seed = 8L).collect().map(_.getLong(0))
    a should contain theSameElementsAs b
    assert(c.toSet != a.toSet, "different seeds must draw different rows")
    // Bernoulli with fraction cap/n: expected 5000, loose 4-sigma band
    a.length.toLong should (be > 4000L and be < 6000L)
  }

  test("rowCap honors knownCount without rescanning and guards count=0") {
    import spark.implicits._
    val df = (0 until 1000).map(_.toLong).toDF("id")
    // knownCount below cap: identity even though the real count exceeds it
    assert(Sampling.rowCap(df, maxRows = 10L, knownCount = Some(5L)) eq df)
    // degenerate knownCount clamps to 1, which routes to the identity
    // branch (1 <= maxRows) — the clamp's job is to keep a zero count
    // from ever reaching the fraction computation, not to cap a fraction
    val s = Sampling.rowCap(df.limit(0), maxRows = 10L, knownCount = Some(0L))
    s.count() shouldBe 0L
  }
}
