package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-invariants (no Spark session needed). */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle twin (no rows-only fallbacks)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries missing an oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"orphan oracles: ${o.diff(q).toSeq.sorted}")
  }

  test("query keys carry the unique qNN bench prefix") {
    val prefixes = SparkEntry.queries.keySet.toSeq.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      "duplicate qNN prefixes would collide in the bench JSON line")
    assert(prefixes.forall(p => p.matches("q\\d+")))
  }
}
