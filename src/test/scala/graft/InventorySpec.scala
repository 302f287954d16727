package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wiring guard on the driver contract ([[SparkEntry]]): the per-family
  * query modules merge into one Map, so a NAME COLLISION between modules
  * would silently shadow a query out of the correctness gate — the gate
  * would still report all-green while an operator went unchecked. This
  * spec makes that (and a query losing its oracle) a loud failure.
  */
class InventorySpec extends AnyFunSuite {

  /** Queries without a DuckDB oracle BY DESIGN. Empty since the sketch
    * queries (v4/v5/x5) gained hash-gated error-contract oracles — the
    * oracle computes the exact value in SQL and the Spark side emits the
    * sketch estimate CHECKED against its published bound, so the hash
    * compares the contract, not the engine-specific sketch internals.
    * Adding a name here must be a deliberate act, not a typo's side effect.
    */
  private val RowsOnlyByDesign = Set.empty[String]

  test("no query name collides across modules (a collision would shadow a gate entry)") {
    val all = SparkEntry.modules.flatMap(_._1.keys)
    val collisions = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(collisions.isEmpty, s"module name collisions: ${collisions.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle pairs a wired query; every unpaired query is a documented rows-only sketch") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(q -- o == RowsOnlyByDesign,
      s"queries without an oracle beyond the documented sketch set: ${(q -- o -- RowsOnlyByDesign).toSeq.sorted.mkString(", ")}")
  }

  test("every query family letter in the README inventory is actually wired") {
    val families = SparkEntry.queries.keySet.map(_.head)
    val expected = "adefgjmnqrstuvwxy".toSet
    assert(families == expected,
      s"family letters drifted: wired=${families.toSeq.sorted.mkString} expected=${expected.toSeq.sorted.mkString}")
  }
}
