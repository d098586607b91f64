package graft

/** Driver-contract self-checks: these failing means the t1/t2 gates fail
  * regardless of engine correctness. */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows at sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query (t2 gate consistency)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable and well-formed") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q_[a-z0-9_]+"), s"bad query name: $k")
    }
    assert(SparkEntry.queries.size >= 62)
    assert(SparkEntry.oracleSql.size >= 50)
  }
}
