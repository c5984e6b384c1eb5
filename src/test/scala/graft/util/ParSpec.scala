package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Par.mapOrdered is the primitive the size-dispatched LOCAL transports
  * parallelize with; its whole contract is ORDER PRESERVATION — callers
  * keep their sequential in-order reduction, so results stay bit-identical
  * to the single-threaded loop they replaced (the property the transport
  * parity gates q263/q265-q268 and the pinned oracle hashes rely on). */
class ParSpec extends AnyFunSuite {

  test("mapOrdered preserves element order: out(i) == f(xs(i))") {
    val xs = (0 until 10007).toIndexedSeq
    val out = Par.mapOrdered(xs)(i => i * 31 + 7)
    assert(out == xs.map(i => i * 31 + 7))
  }

  test("ordered map + sequential fold is bit-identical to the sequential loop") {
    // skewed float payloads in a fixed order: any reassociation of the
    // fold would flip low bits of the running sum
    val rng = new java.util.SplittableRandom(42L)
    val xs = IndexedSeq.fill(5000)(math.exp(rng.nextDouble() * 30 - 15))
    def f(x: Double): Double = math.log1p(x * 1.0000001)
    val seqResult = xs.iterator.map(f).reduce((a, b) => a + b * 1.0000000001)
    val parResult = Par.mapOrdered(xs)(f).reduce((a, b) => a + b * 1.0000000001)
    assert(java.lang.Double.doubleToRawLongBits(seqResult) ==
      java.lang.Double.doubleToRawLongBits(parResult))
  }

  test("empty and single-element inputs") {
    assert(Par.mapOrdered(IndexedSeq.empty[Int])(_ * 2) == Vector.empty)
    assert(Par.mapOrdered(IndexedSeq(21))(_ * 2) == IndexedSeq(42))
  }

  test("an exception in f propagates to the caller") {
    val ex = intercept[IllegalStateException] {
      Par.mapOrdered((0 until 100).toIndexedSeq) { i =>
        if (i == 37) throw new IllegalStateException("boom") else i
      }
    }
    assert(ex.getMessage == "boom")
  }
}
