package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate hash-compares every `SparkEntry.queries`
  * entry against its `oracleSql` — a query without an oracle silently
  * degrades to a weaker rows-only check, and an oracle without a query is
  * dead SQL. Keep the two registries exactly in sync.
  */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missingOracle = queries -- oracles
    val deadOracle = oracles -- queries
    assert(missingOracle.isEmpty, s"queries without oracle SQL: $missingOracle")
    assert(deadOracle.isEmpty, s"oracle SQL without a query: $deadOracle")
  }

  test("query keys follow the family naming scheme") {
    val pat = "^[egmqt]\\d{2,3}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(k => pat.matches(k))
    assert(bad.isEmpty, s"unconventional query keys: $bad")
  }

  test("entry flagship returns rows (the driver's smoke check)") {
    val out = SparkEntry.entry(graft.sql.TestSpark.spark)
    assert(out.count() > 0)
  }
}
