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

  test("alternating stars handles a long chain in O(log n) rounds") {
    import spark.implicits._
    // path 0-1-2-...-31: min-propagation needs ~31 rounds, stars ~5
    val chain = (0L until 31L).map(i => (i, i + 1))
    val got = ConnectedComponents.alternatingStars(chain.toDF("a", "b"), maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 31L).map(_ -> 0L).toMap)
  }

  test("alternating stars keeps self-loop-only nodes as singletons") {
    import spark.implicits._
    val got = ConnectedComponents.alternatingStars(
        Seq((5L, 5L), (1L, 2L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("incremental delta fold == full recompute on every delta shape") {
    import spark.implicits._
    def run(baseEdges: Seq[(Long, Long)], delta: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
      val base = ConnectedComponents.alternatingStars(baseEdges.toDF("a", "b"))
      val inc = ConnectedComponents.incremental(base, delta.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = ConnectedComponents.alternatingStars((baseEdges ++ delta).toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (inc, full)
    }
    // base: {1,2,3} and {10,11}; delta exercises every shape at once:
    //  - bridge two standing components (3-10) -> merged under min 1
    //  - edge internal to a standing component (1-3) -> no-op
    //  - chain of brand-new nodes (20-21-22) -> new component
    //  - new node attached to an old component (11-30)
    val (inc, full) = run(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      Seq((3L, 10L), (1L, 3L), (20L, 21L), (21L, 22L), (11L, 30L)))
    assert(inc == full)
    assert(inc(10L) == 1L && inc(30L) == 1L, "bridged + attached both under global min")
    assert(inc(22L) == 20L, "new-node chain labels by its own min")

    // delta-only intra-component edge: labels must be byte-identical to base
    val (inc2, full2) = run(Seq((1L, 2L), (2L, 3L)), Seq((1L, 2L)))
    assert(inc2 == full2 && inc2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // empty delta: pass-through
    val (inc3, full3) = run(Seq((4L, 5L)), Seq.empty)
    assert(inc3 == full3 && inc3 == Map(4L -> 4L, 5L -> 4L))
  }
}
