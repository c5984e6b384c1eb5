package graft.util

import org.scalatest.funsuite.AnyFunSuite

class FftSpec extends AnyFunSuite {

  test("impulse transforms to a flat unit spectrum") {
    val re = Array.tabulate(16)(i => if (i == 0) 1.0 else 0.0)
    val im = new Array[Double](16)
    Fft.fft(re, im)
    for (k <- 0 until 16) {
      assert(math.abs(re(k) - 1.0) < 1e-12)
      assert(math.abs(im(k)) < 1e-12)
    }
  }

  test("bin-centered sine: dominant bin k, peak magnitude N/2 * amp") {
    val n = 256
    val k = 19
    val amp = 3.5
    val x = Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * k * i / n))
    val mags = Fft.spectrum(x)
    val kBest = (1 until mags.length).maxBy(mags(_))
    assert(kBest === k)
    assert(math.abs(mags(k) - n / 2.0 * amp) < 1e-8)
    // all other non-DC bins are numerically zero (no leakage at bin center)
    for (j <- 1 until mags.length if j != k) assert(mags(j) < 1e-8)
  }

  test("Parseval: sum |x|^2 == sum |X|^2 / N") {
    val n = 128
    val x = Array.tabulate(n)(i => math.sin(0.7 * i) + 0.3 * math.cos(2.1 * i))
    val re = x.clone(); val im = new Array[Double](n)
    Fft.fft(re, im)
    val t = x.map(v => v * v).sum
    val f = re.indices.map(j => re(j) * re(j) + im(j) * im(j)).sum / n
    assert(math.abs(t - f) / t < 1e-12)
  }

  test("rejects non-power-of-two input") {
    intercept[IllegalArgumentException] {
      Fft.fft(new Array[Double](12), new Array[Double](12))
    }
  }
}
