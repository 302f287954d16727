package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalJoin

/** IVM join-view maintenance: the three-term delta identity must equal a
  * from-scratch join of the surviving multisets on every changelog shape —
  * fan-out cascade on a left-side retraction, multi-copy multiplicities
  * (products, not flags), Δ⋈Δ matches, and cancellation to zero.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertSame(x: DataFrame, y: DataFrame): Unit =
    assert(sortedRows(x) == sortedRows(y))

  test("refresh == full(base ⊎ Δ): inserts both sides, Δ⋈Δ match, left retraction cascades") {
    val a = Seq((1L, "s1"), (2L, "s2"), (3L, "s3")).toDF("k", "seg").withColumn("w", lit(1L))
    val b = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "oid").withColumn("w", lit(1L))
    val s0 = IncrementalJoin.full(a, b, Seq("k"))
    // retract customer 1 (cascades oid 10 and 11 out), insert order for 3,
    // and a Δ⋈Δ pair: new customer 4 + new order for 4
    val dA = Seq((1L, "s1", -1L), (4L, "s4", 1L)).toDF("k", "seg", "w")
    val dB = Seq((3L, 30L, 1L), (4L, 40L, 1L)).toDF("k", "oid", "w")
    val got = IncrementalJoin.refresh(s0, dA, dB, Seq("k"))
    val want = IncrementalJoin.full(a.unionByName(dA), b.unionByName(dB), Seq("k"))
    assertSame(got.view, want.view)
    assertSame(got.aIdx, want.aIdx)
    assertSame(got.bIdx, want.bIdx)
    assert(got.view.where($"k" === 1L).isEmpty) // the cascade
    assert(got.view.where($"k" === 4L).count() == 1L) // the Δ⋈Δ term
  }

  test("multiplicities multiply: duplicate tuples and partial retraction") {
    // two identical b-rows for k=1 → view multiplicity 2
    val a = Seq((1L, "x")).toDF("k", "p").withColumn("w", lit(1L))
    val b = Seq((1L, 5L), (1L, 5L)).toDF("k", "v").withColumn("w", lit(1L))
    val s0 = IncrementalJoin.full(a, b, Seq("k"))
    assert(s0.view.select("m").as[Long].head() == 2L)
    // retract ONE copy: multiplicity drops to 1, row survives
    val dB = Seq((1L, 5L, -1L)).toDF("k", "v", "w")
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "p", "w")
    val got = IncrementalJoin.refresh(s0, empty, dB, Seq("k"))
    assert(got.view.select("m").as[Long].head() == 1L)
    // retract the second copy too: the view row disappears
    val got2 = IncrementalJoin.refresh(got, empty, dB, Seq("k"))
    assert(got2.view.isEmpty && got2.bIdx.isEmpty)
  }

  test("NULL payload values: retraction of a NULL-bearing tuple cancels (null-safe merge)") {
    // payload `seg` is NULL — plain-equality merging would leave the −1 row
    // unmatched and the retraction would silently vanish at the m>0 filter
    val a = Seq((1L, Option.empty[String]), (2L, Some("s2")))
      .toDF("k", "seg").withColumn("w", lit(1L))
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "oid").withColumn("w", lit(1L))
    val s0 = IncrementalJoin.full(a, b, Seq("k"))
    assert(s0.view.where($"k" === 1L).count() == 1L)
    val dA = Seq((1L, Option.empty[String], -1L)).toDF("k", "seg", "w")
    val dB = Seq.empty[(Long, Long, Long)].toDF("k", "oid", "w")
    val got = IncrementalJoin.refresh(s0, dA, dB, Seq("k"))
    val want = IncrementalJoin.full(a.unionByName(dA), b.unionByName(dB), Seq("k"))
    assertSame(got.view, want.view)
    assertSame(got.aIdx, want.aIdx)
    assert(got.view.where($"k" === 1L).isEmpty) // the NULL-tuple retraction lands
  }

  test("stepwise refreshes ≡ one from-scratch over everything") {
    val a = Seq((1L, "p"), (2L, "q")).toDF("k", "seg").withColumn("w", lit(1L))
    val b = Seq((1L, 100L), (2L, 200L)).toDF("k", "oid").withColumn("w", lit(1L))
    val d1a = Seq((3L, "r", 1L)).toDF("k", "seg", "w")
    val d1b = Seq((3L, 300L, 1L), (1L, 100L, -1L)).toDF("k", "oid", "w")
    val d2a = Seq((2L, "q", -1L)).toDF("k", "seg", "w")
    val d2b = Seq((1L, 101L, 1L)).toDF("k", "oid", "w")
    val step = IncrementalJoin.refresh(
      IncrementalJoin.refresh(IncrementalJoin.full(a, b, Seq("k")), d1a, d1b, Seq("k")),
      d2a, d2b, Seq("k"))
    val want = IncrementalJoin.full(
      a.unionByName(d1a).unionByName(d2a),
      b.unionByName(d1b).unionByName(d2b), Seq("k"))
    assertSame(step.view, want.view)
  }
}
