package graft

/** Guards the driver contract: no silent key collisions when the query
  * maps merge, every oracle refers to a real query, every bench name
  * resolves, and query names stay unique and well-formed.
  */
class ContractSpec extends SparkSpec {
  import graft.operators._

  test("query maps merge without key collisions") {
    val parts = Seq(
      RelationalQueries.queries, ScalarQueries.queries,
      MlQueries.queries, LlmQueries.queries, TimeSeriesQueries.queries)
    assert(parts.map(_.size).sum == SparkEntry.queries.size,
           "duplicate query name across operator modules")
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every benchQueries name resolves and is duplicate-free") {
    val missing = SparkEntry.benchQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"bench names missing from queries: $missing")
    assert(SparkEntry.benchQueries.distinct.size ==
      SparkEntry.benchQueries.size)
  }

  test("query names follow the qNN_snake_case convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("entry() smoke: flagship query yields rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
