package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** The distributed (uncapped) BPE merge loop must be bit-identical to the
  * driver-tier trainer — [[Bpe.trainDistributed]] is the documented
  * beyond-MaxTypes contract, and its whole value is that switching paths
  * never changes a merge. t15's green gate pins the driver loop to the
  * DuckDB replay; this spec pins the distributed loop to the driver loop
  * (corpus equivalence, overlapping-pair counting, code-point tie-breaks,
  * drain), closing the triangle.
  */
class DistBpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def distOnHist(hist: Seq[(String, Long)], rounds: Int): Seq[(String, String, Long)] = {
    val s2 = spark; import s2.implicits._
    Bpe.distMerges(hist.toDF("w", "cnt"), rounds)
  }

  test("distributed merges equal the driver-tier trainer's on a real corpus") {
    val dist = Bpe.trainDistributed(spark, sf, rounds = Bpe.DistRounds)
    val mem = Bpe.train(spark, sf, rounds = Bpe.DistRounds).merges
    assert(dist == mem)
  }

  test("overlapping adjacent pairs are counted, weighted by type count") {
    // "aaa"×3: (a,a) at two positions → c=6
    assert(distOnHist(Seq(("aaa", 3L)), 1) == Seq(("a", "a", 6L)))
  }

  test("greedy left-to-right application: merged symbol is not re-paired in-round") {
    // after merging (a,a), "aaaa" segments as (aa)(aa) → next round's top
    // pair is (aa,aa), never (a,aa)
    val m = distOnHist(Seq(("aaaa", 1L)), 2)
    assert(m == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("tie-break is code-point order, not UTF-16 order (supplementary plane)") {
    // U+E000 (BMP private-use) vs U+1F600 (astral): UTF-16 code-unit order
    // ranks the surrogate pair BELOW U+E000, code-point/UTF-8-binary order
    // ranks it above — both trainers must pick (U+E000, x) on the count tie
    val e = "\uE000"; val g = new String(Character.toChars(0x1F600))
    val hist = Seq((e + "x", 1L), (g + "x", 1L))
    val dist = distOnHist(hist, 1)
    val mem = Bpe.trainInMemory(hist.toArray, 1).merges
    assert(dist == mem)
    assert(dist == Seq((e, "x", 1L)))
  }

  test("line terminators inside a token symbolize as their own code points (DOTALL round 0)") {
    // U+2028 LINE SEPARATOR survives the ASCII-only \s+ tokenization, so a
    // web-scraped token can carry it mid-word. Bare Java-regex '.' skips
    // line terminators — round-0 symbolization would leave U+2028 unwrapped
    // and fuse it into the following symbol, diverging from the driver
    // trainer's codePoints split. Cover U+2028/U+2029/U+0085.
    for (sep <- Seq('\u2028', '\u2029', '\u0085')) {
      val hist = Seq((s"a${sep}b", 2L))
      val dist = distOnHist(hist, 2)
      val mem = Bpe.trainInMemory(hist.toArray, 2).merges
      assert(dist == mem, s"diverged on U+${sep.toInt.toHexString}")
      // first merge must pair 'a' with the separator alone, not " b"
      assert(dist.head == ("a", sep.toString, 2L))
    }
  }

  test("drains when the pair space is exhausted") {
    // one 2-char type: a single merge exhausts all pairs; extra rounds no-op
    assert(distOnHist(Seq(("ab", 5L)), 16) == Seq(("a", "b", 5L)))
  }

  test("deep run crosses the checkpoint boundary and keeps merging correctly") {
    // a chain word long enough for > DistCheckpointEvery merges: "abc…"
    // repeated digits give a rich pair space; just assert the distributed
    // loop past the 64-round localCheckpoint equals the driver trainer
    val words = (0 until 40).map(i => (f"w$i%02d" * 3, (i + 1).toLong))
    val rounds = Bpe.DistCheckpointEvery + 8
    val dist = distOnHist(words, rounds)
    val mem = Bpe.trainInMemory(words.toArray, rounds).merges
    assert(dist == mem)
    assert(dist.length > Bpe.DistCheckpointEvery)
  }
}
