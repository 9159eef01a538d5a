package graft

/** The driver's t1 smoke contract: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracleSql key exists in queries (driver contract)") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size == 97 && SparkEntry.oracleSql.size == 84)
  }
}
