package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.{ExtremaSpec, SumSpec}

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sums = Seq(SumSpec("total", col("v")))

  test("refresh(state, delta) == full(base union delta) including retractions") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 5L)).toDF("k", "v")
      .withColumn("w", lit(1L))
    val delta = Seq(("a", 4L, 1L), ("d", 7L, 1L), ("c", 5L, -1L)).toDF("k", "v", "w")
    val state = IncrementalAgg.full(base, Seq("k"), col("w"), sums)
    val got = IncrementalAgg.refresh(state, delta, Seq("k"), col("w"), sums)
    val want = IncrementalAgg.full(base.unionByName(delta), Seq("k"), col("w"), sums)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // c was fully retracted: the group disappears from the refreshed state
    assert(got.where($"k" === "c").isEmpty)
    assert(got.where($"k" === "d").select("cnt", "total").head() ==
      org.apache.spark.sql.Row(1L, 7L))
  }

  test("empty delta is a no-op; repeated refresh accumulates") {
    val base = Seq(("x", 3L), ("y", 4L)).toDF("k", "v").withColumn("w", lit(1L))
    val state = IncrementalAgg.full(base, Seq("k"), col("w"), sums)
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "v", "w")
    val same = IncrementalAgg.refresh(state, empty, Seq("k"), col("w"), sums)
    assert(same.exceptAll(state).isEmpty && state.exceptAll(same).isEmpty)

    val d1 = Seq(("x", 1L, 1L)).toDF("k", "v", "w")
    val twice = IncrementalAgg.refresh(
      IncrementalAgg.refresh(state, d1, Seq("k"), col("w"), sums),
      d1, Seq("k"), col("w"), sums)
    assert(twice.where($"k" === "x").select("cnt", "total").head() ==
      org.apache.spark.sql.Row(3L, 5L))
  }

  test("full retraction of a group's non-NULL rows publishes NULL, not 0 (nn masking)") {
    // group "a": one non-NULL row + one NULL-measure row in base; the delta
    // retracts the non-NULL row — surviving multiset is {NULL}, so the
    // from-scratch sum is NULL, and refresh must agree (not 5 + (-5) = 0)
    val base = Seq(("a", Some(5L), 1L), ("a", None, 1L), ("b", Some(2L), 1L))
      .toDF("k", "v", "w")
    val delta = Seq(("a", Some(5L), -1L)).toDF("k", "v", "w")
    val state = IncrementalAgg.full(base, Seq("k"), col("w"), sums)
    val got = IncrementalAgg.refresh(state, delta, Seq("k"), col("w"), sums)
    val want = IncrementalAgg.full(base.unionByName(delta), Seq("k"), col("w"), sums)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val a = got.where($"k" === "a").select("cnt", "total").head()
    assert(a.getLong(0) == 1L && a.isNullAt(1), s"expected (1, NULL), got $a")

    // an all-NULL group stays NULL through refresh too
    val nullBase = Seq(("z", Option.empty[Long], 1L)).toDF("k", "v", "w")
    val st2 = IncrementalAgg.full(nullBase, Seq("k"), col("w"), sums)
    val more = Seq(("z", Option.empty[Long], 1L)).toDF("k", "v", "w")
    val r2 = IncrementalAgg.refresh(st2, more, Seq("k"), col("w"), sums)
      .where($"k" === "z").select("cnt", "total").head()
    assert(r2.getLong(0) == 2L && r2.isNullAt(1))
  }

  private val ext = Seq(ExtremaSpec("v", col("v")))

  private def wantWithExt(rows: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.fullWithExtrema(rows, Seq("k"), col("w"), sums, ext)

  test("extrema: retracting the current minimum surfaces the next one (base repair)") {
    val base = Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 10L)).toDF("k", "v")
      .withColumn("w", lit(1L))
    val delta = Seq(("a", 1L, -1L)).toDF("k", "v", "w")
    val state = wantWithExt(base)
    val got = IncrementalAgg.refreshWithExtrema(state, delta, base, Seq("k"), col("w"), sums, ext)
    val want = wantWithExt(base.unionByName(delta))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.where($"k" === "a").select("min_v", "max_v").head() ==
      org.apache.spark.sql.Row(5L, 9L)) // NOT the stale 1
    // b untouched by retraction: carried through the merge path
    assert(got.where($"k" === "b").select("min_v", "max_v").head() ==
      org.apache.spark.sql.Row(10L, 10L))
  }

  test("extrema: insert-only keys merge without base access; new keys appear") {
    val base = Seq(("a", 5L)).toDF("k", "v").withColumn("w", lit(1L))
    val delta = Seq(("a", 2L, 1L), ("a", 8L, 1L), ("n", 3L, 1L)).toDF("k", "v", "w")
    val state = wantWithExt(base)
    // base deliberately WRONG here (empty) to prove inserts never reread it
    val emptyBase = Seq.empty[(String, Long, Long)].toDF("k", "v", "w").drop("w")
      .withColumn("w", lit(1L))
    val got = IncrementalAgg.refreshWithExtrema(
      state, delta, emptyBase, Seq("k"), col("w"), sums, ext)
    assert(got.where($"k" === "a").select("min_v", "max_v").head() ==
      org.apache.spark.sql.Row(2L, 8L))
    assert(got.where($"k" === "n").select("cnt", "min_v", "max_v").head() ==
      org.apache.spark.sql.Row(1L, 3L, 3L))
  }

  test("extrema: retracting every non-NULL value publishes NULL min/max") {
    val base = Seq(("a", Some(4L), 1L), ("a", None, 1L)).toDF("k", "v", "w")
    val delta = Seq(("a", Some(4L), -1L)).toDF("k", "v", "w")
    val state = IncrementalAgg.fullWithExtrema(base, Seq("k"), col("w"), sums, ext)
    val got = IncrementalAgg.refreshWithExtrema(state, delta, base, Seq("k"), col("w"), sums, ext)
    val a = got.where($"k" === "a").select("cnt", "min_v", "max_v").head()
    assert(a.getLong(0) == 1L && a.isNullAt(1) && a.isNullAt(2), s"expected (1, NULL, NULL), got $a")
    val want = IncrementalAgg.fullWithExtrema(
      base.unionByName(delta), Seq("k"), col("w"), sums, ext)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("extrema: duplicate-value retraction only cancels one multiplicity") {
    // two identical (a, 7) rows; retracting one must keep min/max at 7
    val base = Seq(("a", 7L), ("a", 7L), ("a", 9L)).toDF("k", "v").withColumn("w", lit(1L))
    val delta = Seq(("a", 7L, -1L)).toDF("k", "v", "w")
    val state = wantWithExt(base)
    val got = IncrementalAgg.refreshWithExtrema(state, delta, base, Seq("k"), col("w"), sums, ext)
    assert(got.where($"k" === "a").select("cnt", "min_v", "max_v").head() ==
      org.apache.spark.sql.Row(2L, 7L, 9L))
  }

  // ------------------------------------------------------------ top-k

  private def topk(rows: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.fullTopK(rows, Seq("k"), col("w"), col("id"), col("v"), k = 2)

  test("topk: retracting the current leader promotes rank 3 (base repair)") {
    val base = Seq(("a", 1L, 9L), ("a", 2L, 7L), ("a", 3L, 5L), ("b", 4L, 1L))
      .toDF("k", "id", "v").withColumn("w", lit(1L))
    val delta = Seq(("a", 1L, 9L, -1L)).toDF("k", "id", "v", "w")
    val got = IncrementalAgg.refreshTopK(topk(base), delta, base,
      Seq("k"), col("w"), col("id"), col("v"), k = 2)
    val want = topk(base.unionByName(delta))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the old rank-3 (id 3, v 5) — NOT in the k=2 state — must surface
    assert(got.where($"k" === "a" && $"rank" === 2).select("id", "value").head() ==
      org.apache.spark.sql.Row(3L, 5L))
    // b untouched: carried through the merge path
    assert(got.where($"k" === "b").select("rank", "id", "value").head() ==
      org.apache.spark.sql.Row(1, 4L, 1L))
  }

  test("topk: insert-only keys re-rank state ∪ inserts without base access; stepwise ≡ from-scratch") {
    val base = Seq(("a", 1L, 5L), ("a", 2L, 3L), ("a", 3L, 1L)).toDF("k", "id", "v")
      .withColumn("w", lit(1L))
    val state = topk(base)
    // base deliberately WRONG (empty) to prove inserts never reread it
    val emptyBase = Seq.empty[(String, Long, Long)].toDF("k", "id", "v")
      .withColumn("w", lit(1L))
    val delta = Seq(("a", 9L, 4L, 1L), ("n", 7L, 2L, 1L)).toDF("k", "id", "v", "w")
    val got = IncrementalAgg.refreshTopK(state, delta, emptyBase,
      Seq("k"), col("w"), col("id"), col("v"), k = 2)
    // a: insert (9, 4) displaces rank 2 (id 2, v 3); n is a new key
    assert(got.where($"k" === "a").orderBy("rank").select("id", "value").collect().toSeq ==
      Seq(org.apache.spark.sql.Row(1L, 5L), org.apache.spark.sql.Row(9L, 4L)))
    assert(got.where($"k" === "n").select("rank", "id", "value").head() ==
      org.apache.spark.sql.Row(1, 7L, 2L))

    // stepwise: two refreshes ≡ one from-scratch over everything
    val d2 = Seq(("a", 2L, 3L, -1L)).toDF("k", "id", "v", "w")
    val all = base.unionByName(delta).unionByName(d2)
    val step = IncrementalAgg.refreshTopK(got, d2, base.unionByName(delta),
      Seq("k"), col("w"), col("id"), col("v"), k = 2)
    val want = topk(all)
    assert(step.exceptAll(want).isEmpty && want.exceptAll(step).isEmpty)
  }

  test("topk: value ties break on id ascending, deterministically") {
    val base = Seq(("a", 5L, 7L), ("a", 3L, 7L), ("a", 9L, 7L)).toDF("k", "id", "v")
      .withColumn("w", lit(1L))
    assert(topk(base).orderBy("rank").select("id").as[Long].collect().toSeq == Seq(3L, 5L))
  }

  private def ndvOf(rows: org.apache.spark.sql.DataFrame) = {
    val idx = IncrementalAgg.fullDistinctIndex(rows, Seq("k"), col("w"), col("v"))
    IncrementalAgg.distinctSummary(idx, Seq("k"))
  }

  test("distinct: retracting one of two copies keeps the value; both copies drops it") {
    // "a" holds value 1 twice (ids differ, value repeats) and 2 once
    val base = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
      .withColumn("w", lit(1L))
    val idx = IncrementalAgg.fullDistinctIndex(base, Seq("k"), col("w"), col("v"))
    val sum0 = IncrementalAgg.distinctSummary(idx, Seq("k"))
    assert(sum0.where($"k" === "a").select("ndv").as[Long].head() == 2L)
    // retract ONE copy of (a, 1): ndv must stay 2
    val d1 = Seq(("a", 1L, -1L)).toDF("k", "v", "w")
    val (idx1, sum1) = IncrementalAgg.refreshDistinct(idx, sum0, d1, Seq("k"), col("w"), col("v"))
    assert(sum1.where($"k" === "a").select("ndv").as[Long].head() == 2L)
    // retract the second copy: ndv drops to 1
    val (_, sum2) = IncrementalAgg.refreshDistinct(idx1, sum1, d1, Seq("k"), col("w"), col("v"))
    assert(sum2.where($"k" === "a").select("ndv").as[Long].head() == 1L)
  }

  test("distinct: refresh == from-scratch on a mixed changelog; NULLs never count; keys can vanish") {
    val base = Seq(("a", Some(1L)), ("a", Some(2L)), ("b", Some(5L)), ("b", None))
      .toDF("k", "v").withColumn("w", lit(1L))
    val delta = Seq(("a", Some(3L), 1L), ("b", Some(5L), -1L), ("c", Some(8L), 1L),
      ("c", None, 1L)).toDF("k", "v", "w")
    val idx = IncrementalAgg.fullDistinctIndex(base, Seq("k"), col("w"), col("v"))
    val sum0 = IncrementalAgg.distinctSummary(idx, Seq("k"))
    val (_, got) = IncrementalAgg.refreshDistinct(idx, sum0, delta, Seq("k"), col("w"), col("v"))
    val want = ndvOf(base.unionByName(delta))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // b's only non-NULL value was retracted: the key vanishes from the summary
    assert(got.where($"k" === "b").isEmpty)
  }

  test("NULL group keys refresh exactly like the from-scratch twin (null-safe key joins)") {
    // groupBy treats NULL as a group, so every full* twin aggregates it;
    // refresh paths must pair NULL-key state/delta/base rows the same way
    val base = Seq((Option.empty[String], 10L), (Option.empty[String], 4L), (Some("a"), 7L))
      .toDF("k", "v").withColumn("w", lit(1L))
    val delta = Seq((Option.empty[String], 10L, -1L), (Option.empty[String], 6L, 1L),
      (Some("a"), 2L, 1L)).toDF("k", "v", "w")
    val after = base.unionByName(delta)
    val sums = Seq(IncrementalAgg.SumSpec("sv", col("v")))
    val ext = Seq(IncrementalAgg.ExtremaSpec("v", col("v")))

    // sums + extrema: the NULL-key retraction must route through base repair
    val st = IncrementalAgg.fullWithExtrema(base, Seq("k"), col("w"), sums, ext)
    val got = IncrementalAgg.refreshWithExtrema(st, delta, base, Seq("k"), col("w"), sums, ext)
    val want = IncrementalAgg.fullWithExtrema(after, Seq("k"), col("w"), sums, ext)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.where($"k".isNull).select("max_v").as[Long].head() == 6L) // 10 retracted

    // top-k: NULL-key leader retraction promotes the next value
    val bT = base.select($"k", monotonically_increasing_id().as("id"), $"v", $"w")
      .withColumn("id", $"v") // unique per key here; value doubles as id
    val dT = delta.select($"k", $"v".as("id"), $"v", $"w")
    val gotT = IncrementalAgg.refreshTopK(topk(bT), dT, bT, Seq("k"), col("w"),
      col("id"), col("v"), k = 2)
    val wantT = topk(bT.unionByName(dT))
    assert(gotT.exceptAll(wantT).isEmpty && wantT.exceptAll(gotT).isEmpty)

    // distinct: NULL-key index/summary merge is null-safe
    val idx = IncrementalAgg.fullDistinctIndex(base, Seq("k"), col("w"), col("v"))
    val sum0 = IncrementalAgg.distinctSummary(idx, Seq("k"))
    val (_, gotD) = IncrementalAgg.refreshDistinct(idx, sum0, delta, Seq("k"), col("w"), col("v"))
    val wantD = ndvOf(after)
    assert(gotD.exceptAll(wantD).isEmpty && wantD.exceptAll(gotD).isEmpty)
  }
}
