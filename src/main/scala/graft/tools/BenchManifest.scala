package graft.tools

/** Writes tools/bench_names.json — the rank->name manifest that decodes
  * Bench's compact "queries_ms" array (integer milliseconds ordered by
  * ascending query number). Re-run after adding queries:
  *   sbt "runMain graft.tools.BenchManifest"
  * BenchManifestSpec pins the committed file to the live registry so a
  * stale manifest fails the build instead of silently mis-labeling
  * timings in tools/bench_compare.py.
  */
object BenchManifest {
  def qnum(n: String): Int = n.takeWhile(_ != '_').drop(1).toInt

  /** Box-drift canary trio (BASELINE.md drift protocol): three stable,
    * rarely-touched queries whose in-record ratios track the VM's
    * multi-hour slowdown waves. Baselines are PINNED here so Bench can
    * stamp the drift coefficient into the emitted record itself
    * (VERDICT r15 task 3 — the 2x screen applies normalized without
    * consulting BASELINE.md prose); BenchManifestSpec asserts these
    * equal tools/baselines.json, so the stamp and bench_compare.py's
    * own median can never silently disagree. */
  val canaryBaselines: Seq[(String, Double)] = Seq(
    "q153" -> 4.224, "q163" -> 4.906, "q91" -> 0.85)

  /** Registry keys ordered exactly like Bench's queries_ms array. */
  def orderedNames: Seq[String] =
    graft.SparkEntry.queries.keys.toSeq.sortBy(qnum)

  def json: String =
    orderedNames.map("\"" + _ + "\"").mkString("[\n  ", ",\n  ", "\n]\n")

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("tools/bench_names.json")
    java.nio.file.Files.write(path, json.getBytes("UTF-8"))
    println(s"wrote ${orderedNames.size} names to $path")
  }
}
