package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle must point at a registered
  * query (a typo'd oracle key would silently never be checked), and the
  * rows-only set must be exactly the operators whose semantics cannot be
  * replayed in DuckDB SQL. */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are exactly the documented hash-free set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q_approx_distinct")  // different HLL sketch in DuckDB
    assert(rowsOnly === expected,
      s"unexpected rows-only set: ${rowsOnly -- expected} / missing: ${expected -- rowsOnly}")
  }
}
