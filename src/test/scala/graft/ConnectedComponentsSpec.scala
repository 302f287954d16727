package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** ConnectedComponents: min-label propagation over the dup-pair graph. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain requires multiple propagation rounds and still converges") {
    // path 1-2-3-4-5-6: min label must walk the whole chain
    val got = components(Seq((5L, 6L), (1L, 2L), (3L, 4L), (2L, 3L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("disjoint clusters keep distinct components") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicate edges, reversed edges, and self-loops are harmless") {
    val got = components(Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
