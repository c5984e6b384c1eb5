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
}
