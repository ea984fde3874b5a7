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

  test("every registered query is oracle-checked (no rows-only entries)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without an oracle (weaker rows-only check): $rowsOnly")
  }
}
