package graft.util

/** Iterative radix-2 Cooley–Tukey FFT (in-place, double precision).
  *
  * The audio-feature rung (q203) runs one 256-point transform per clip
  * inside a map-side expression — O(n log n) per row, no shuffle, the
  * classic spectrogram building block. Pure JVM, no dependency.
  */
object Fft {

  /** In-place FFT of (re, im); length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"length $n not a power of 2")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k
          val b = blk + k + len / 2
          val xr = re(b) * cwr - im(b) * cwi
          val xi = re(b) * cwi + im(b) * cwr
          re(b) = re(a) - xr
          im(b) = im(a) - xi
          re(a) += xr
          im(a) += xi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Magnitudes |X_k| for k in [0, n/2]: the one-sided spectrum. */
  def spectrum(samples: Array[Double]): Array[Double] = {
    val re = samples.clone()
    val im = new Array[Double](samples.length)
    fft(re, im)
    Array.tabulate(samples.length / 2 + 1)(k => math.hypot(re(k), im(k)))
  }
}
