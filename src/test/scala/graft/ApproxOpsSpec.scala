package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, SimilarityQueries}

/** The approximate operators measured against their exact baselines on the
  * deterministic corpus: MinHash-LSH is *sound* (finds only true near-dups,
  * verified by exact Jaccard) and here *complete* w.r.t. the exact
  * pairwise scan; LSH ANN neighbors carry exactly the brute-force cosine
  * values (the approximation loses candidates, never corrupts scores).
  */
class ApproxOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("minhash-LSH near-dup pairs are a subset of the exact n-gram Jaccard pairs") {
    val exact = DedupQueries.d2NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.d3MinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH found non-near-dup pairs: ${lsh -- exact}")
    // 2-row × 6-band LSH catches a j=0.5 pair with p = 1-(1-0.25)^6 ≈ 0.82
    // (and ≈ 1.0 for the j≈0.97 planted dups); this corpus sits at 24/28.
    // Soundness is structural, recall is the banding knob.
    assert(exact.nonEmpty && lsh.size >= math.ceil(exact.size * 0.8).toInt,
      s"recall ${lsh.size}/${exact.size} — banding config regressed")
  }

  test("s13 recall audit equals a driver-side recount of s1 truth vs s3 serve") {
    val truth = SimilarityQueries.s1BruteTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val served = SimilarityQueries.s3IvfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val audit = SimilarityQueries.s13AnnRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(audit.keySet == truth.keySet) // one verdict per query in the sample
    audit.foreach { case (qid, (k, hits, recall)) =>
      val t = truth(qid)
      val expectHits = (t intersect served.getOrElse(qid, Set.empty)).size.toLong
      assert(k == t.size.toLong && hits == expectHits, s"qid=$qid")
      assert(recall == expectHits.toDouble / t.size, s"qid=$qid")
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // the audit must be able to show imperfection: on the near-random
    // corpus the 2/16-probe IVF cannot be a perfect index
    assert(audit.values.exists(_._3 < 1.0))
  }

  test("exact dedup marks exactly the planted duplicates") {
    val rows = DedupQueries.d1ExactDedup(spark, dir).collect()
    val dups = rows.filter(_.getLong(1) > 1)
    assert(dups.forall(_.getLong(1) == 2)) // each planted dup appears twice
    assert(dups.length == rows.map(_.getLong(2)).count(_ % 10 == 0))
  }

  test("approx_count_distinct profile stays within the configured error of exact") {
    import org.apache.spark.sql.functions._
    val approx = graft.queries.CorpusQueries.v4ProfileApproxCore(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val exact = graft.sources.Tables.documents(spark, dir)
      .select(col("source"), explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .groupBy("source").agg(countDistinct(col("token")).as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, ex) =>
      val ap = approx(src)
      assert(math.abs(ap - ex).toDouble / ex < 0.1, s"$src: approx $ap vs exact $ex")
    }
  }

  test("LSH ANN: every neighbor shares the query bucket and carries the exact cosine") {
    val brute = SimilarityQueries.s1BruteTopK(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val lsh = SimilarityQueries.s2LshTopK(spark, dir).collect()
    assert(lsh.nonEmpty)
    // scores of LSH-found pairs that brute force also ranked must be identical bits
    val overlapping = lsh.flatMap { r =>
      brute.get((r.getLong(0), r.getLong(1))).map(b => (r.getDouble(3), b))
    }
    assert(overlapping.forall { case (a, b) => a == b },
      "LSH must not perturb cosine scores")
  }

  test("graph ANN: beam search recall vs brute truth; scores exact; search is bounded") {
    val brute = SimilarityQueries.s1BruteTopK(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    val truth = brute.map(_._1).toSet
    val bruteMap = brute.toMap
    val graph = SimilarityQueries.s8GraphAnn(spark, dir).collect()
    assert(graph.nonEmpty)
    // found neighbors carry the brute-force cosine bits exactly (the graph
    // loses candidates, never corrupts scores)
    graph.foreach { r =>
      bruteMap.get((r.getLong(0), r.getLong(1))).foreach(b =>
        assert(r.getDouble(3) == b, "graph search must not perturb cosine scores"))
    }
    // recall@5 floor: near-random synthetic embeddings are the WORST case
    // for a navigable graph (no cluster structure to navigate), so the
    // bound is a floor, not a target; it must at least beat blind chance
    // by a wide margin and should be ≥ the s2 LSH serve path's regime
    val hit = graph.map(r => (r.getLong(0), r.getLong(1))).count(truth)
    val recall = hit.toDouble / truth.size
    assert(recall >= 0.3, s"graph ANN recall@5 = $recall")
    // serve-cost contract: the search touches ≤ entries + hops·beam·degree
    // nodes per query — candidates bounded by the graph, never the corpus
    val perQuery = graph.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= 5))
  }

  test("approx percentiles land between exact neighbor percentiles") {
    import org.apache.spark.sql.functions._
    val approx = graft.queries.StatQueries.x5ApproxPercentilesCore(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cents = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    // accuracy=1000 → rank error ≤ n/1000; bracket by ±2% rank for slack
    cents.foreach { case (prio, sorted) =>
      val n = sorted.length
      def at(p: Double) = sorted(math.min(n - 1, math.max(0, (p * n).toInt)))
      val (p50, p90) = approx(prio)
      assert(p50 >= at(0.48) && p50 <= at(0.52), s"$prio p50 $p50 outside [${at(0.48)}, ${at(0.52)}]")
      assert(p90 >= at(0.88) && p90 <= at(0.92), s"$prio p90 $p90 outside [${at(0.88)}, ${at(0.92)}]")
    }
  }

  test("count-min heavy hitters honor the CMS one-sided error bound") {
    val rows = graft.queries.CorpusQueries.v5HeavyHittersRaw(spark, dir).collect()
    assert(rows.length == 10)
    val n = graft.sources.Tables.lineitem(spark, dir).count()
    val epsN = math.ceil(0.001 * n).toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must never undercount: key ${r.getLong(0)} est $est < exact $exact")
      assert(est <= exact + epsN, s"key ${r.getLong(0)}: est $est exceeds exact+εN ${exact + epsN}")
    }
  }

  test("k-means assignment: broadcast-join path == literal-centroid path") {
    // the gate SFs sit on the k=8 floor and only ever exercise the literal
    // path; this pins the adaptive-k join path (codegen'd dot expansion,
    // min-struct argmin) to identical (cid, dist) for every vector
    import org.apache.spark.sql.functions._
    val q = graft.sources.Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    val cents = q.where(col("vec_id") < 9).orderBy("vec_id").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray)).toSeq
    def res(force: Boolean) =
      SimilarityQueries.kmAssign(q, cents, forceJoinPath = force)
        .select("vec_id", "cid", "dist").orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(res(force = true) == res(force = false))
  }
}
