package graft.util

import org.apache.spark.sql.DataFrame

/** The row-capped landmark sampling rule shared by the driver-local
  * training paths (KMeansPlusPlus seeding, q141's roundtrip model,
  * cluster100's capped fit): model QUALITY needs a representative
  * sample, not the corpus, so anything that ultimately collects rows to
  * the driver trains on at most `maxRows` Bernoulli-sampled rows — the
  * 100 TB contract is a bounded driver footprint regardless of input
  * size. One definition so the cap, the no-replacement choice, and the
  * degenerate-count guard cannot drift between call sites.
  */
object Sampling {
  val LandmarkRows: Long = 65536L

  /** `df` if it has at most `maxRows` rows, else a seeded Bernoulli
    * sample with EXPECTED size `maxRows` — not a hard bound: the
    * collected sample exceeds the cap about half the time, by
    * ~sqrt(maxRows) rows (a few hundred at 65536), which is well inside
    * the driver-footprint budget the cap protects. Pass `knownCount`
    * when the caller already counted (avoids a second scan). */
  def rowCap(df: DataFrame, maxRows: Long = LandmarkRows, seed: Long = 42L,
             knownCount: Option[Long] = None): DataFrame = {
    val n = math.max(1L, knownCount.getOrElse(df.count()))
    if (n <= maxRows) df
    else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
  }
}
