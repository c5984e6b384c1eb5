package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins tools/bench_names.json (the decoder manifest for Bench's compact
  * queries_ms array) to the live query registry. If this fails, re-run
  * `sbt "runMain graft.tools.BenchManifest"` and commit the result. */
class BenchManifestSpec extends AnyFunSuite {

  test("bench_names.json matches the registry, ordered by query number") {
    val path = java.nio.file.Paths.get("tools/bench_names.json")
    assert(java.nio.file.Files.exists(path), s"$path missing — run graft.tools.BenchManifest")
    val onDisk = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    assert(onDisk == graft.tools.BenchManifest.json,
      "tools/bench_names.json is stale — re-run graft.tools.BenchManifest")
  }

  test("query numbers are unique and parse (rank array is unambiguous)") {
    val nums = SparkEntry.queries.keys.toSeq.map(graft.tools.BenchManifest.qnum)
    assert(nums.distinct.size == nums.size, "duplicate qNN prefixes")
  }

  test("bench_compare.py BASELINES covers exactly the registry " +
    "(manifest, baseline table and registry are one surface)") {
    // the three places that must agree: SparkEntry.queries (the code),
    // tools/bench_names.json (the decoder — pinned above), and
    // tools/bench_compare.py's BASELINES dict (the cap ledger). A stale
    // ledger silently shrinks regression coverage; a leftover entry
    // means a query was dropped without its baseline.
    val py = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_compare.py")), "UTF-8")
    val block = py.substring(py.indexOf("BASELINES = {"))
    val baselineKeys = "\"(q\\d+)\"\\s*:".r.findAllMatchIn(block)
      .map(_.group(1)).toSet
    val registryKeys = SparkEntry.queries.keys
      .map(_.split("_")(0)).toSet
    val missing = registryKeys -- baselineKeys
    val stale = baselineKeys -- registryKeys
    assert(missing.isEmpty && stale.isEmpty,
      s"bench_compare.py BASELINES drift — missing: ${missing.toSeq.sorted
        .mkString(",")}; stale: ${stale.toSeq.sorted.mkString(",")} " +
        "(add first-appearance baselines per BASELINE.md protocol)")
  }
}
