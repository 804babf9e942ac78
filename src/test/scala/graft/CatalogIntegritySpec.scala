package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog ↔ oracle completeness: every registered query MUST carry a
  * DuckDB twin (the driver silently downgrades an oracle-less query
  * to a weaker rows-only check — this gate makes that a build
  * failure instead), and no twin may dangle without a query. Also
  * pins that every headline bench name resolves to a registered
  * query, so a catalog rename can't silently drop a perf gate.
  */
class CatalogIntegritySpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle twin (rows-only downgrade): ${q -- o}")
    assert((o -- q).isEmpty, s"dangling oracle twins: ${o -- q}")
  }

  test("every headline bench entry names a registered query") {
    val q = SparkEntry.queries.keySet
    val missing = Bench.headline.filterNot(q)
    assert(missing.isEmpty, s"headline names without a query: $missing")
  }

  test("no oracle twin is empty or whitespace") {
    val bad = SparkEntry.oracleSql.filter(_._2.trim.length < 20)
    assert(bad.isEmpty, s"suspiciously short oracles: ${bad.keySet}")
  }
}
