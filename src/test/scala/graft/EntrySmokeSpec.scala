package graft

/** The driver's t1 smoke contract: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracleSql key exists in queries (driver contract)") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    // Expected sizes live in ONE place: the pin constants next to the
    // registry in SparkEntry itself. Registering a query bumps the pin
    // in the same file — this spec can never go stale on its own.
    assert(qs.size == SparkEntry.RegisteredQueryCount,
      s"registry has ${qs.size} queries; bump SparkEntry.RegisteredQueryCount")
    assert(SparkEntry.oracleSql.size == SparkEntry.OracledQueryCount,
      s"registry has ${SparkEntry.oracleSql.size} oracles; bump SparkEntry.OracledQueryCount")
    // serving-only faces shadow REGISTRY names (Bench reports them as
    // the same rung's serving cost) — an unknown name would silently
    // time an orphan
    assert(SparkEntry.servingQueries.keySet.subsetOf(qs),
      s"serving names must be registry names: ${SparkEntry.servingQueries.keySet -- qs}")
  }
}
