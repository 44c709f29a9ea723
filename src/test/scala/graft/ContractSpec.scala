package graft

/** Driver-contract invariants (the builder brief's SparkEntry spec): these
  * are what the external harness depends on, so breaking any of them zeroes
  * the round regardless of how good the queries are. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query implementation") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("only the documented sketch query is rows-only (no oracle)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q26_approx_agg"),
      s"undocumented rows-only queries: ${rowsOnly - "q26_approx_agg"}")
  }

  test("query names are filesystem-safe for Verify's output dirs") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("^[a-z0-9_]+$"))
    assert(bad.isEmpty, s"unsafe names: $bad")
  }

  test("flagship entry returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    // (q07 anti-joins a date-filtered order subset precisely so it is
    // non-empty at every SF — no exemptions needed.)
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, dir).limit(1).count() == 0
    }
    assert(empty.isEmpty, s"queries with no rows at sf0.001: ${empty.map(_._1)}")
  }
}
