package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The d-family persists shared intermediates (shingle index, SimHash
  * signature, near-dup pair set) so d2/d3 and d5/d7/d8/t5 hash the corpus
  * once per (session, dir). That sharing needs an explicit lifecycle:
  * Bench runs the full battery repeatedly in ONE session, so without a
  * release hook the entries accumulate executor memory for the session's
  * life. `unpersistShared()` must drop every registered entry, and the
  * queries must transparently re-persist on next use.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("unpersistShared drops every d-family cache entry") {
    spark.sharedState.cacheManager.clearCache() // isolate from earlier suites
    DedupQueries.d3MinhashLsh(spark, sfDir).count()
    DedupQueries.d5SimhashPairs(spark, sfDir).count()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "expected cached intermediates after d3/d5")
    DedupQueries.unpersistShared()
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached intermediates leaked after unpersistShared()")
  }

  test("queries re-persist and stay correct after a release") {
    val before = DedupQueries.d5SimhashPairs(spark, sfDir).count()
    DedupQueries.unpersistShared()
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(DedupQueries.d5SimhashPairs(spark, sfDir).count() == before)
    DedupQueries.unpersistShared()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
