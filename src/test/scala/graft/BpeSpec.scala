package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** The driver-tier BPE merge loop on hand-computed histograms — the
  * invariants the DuckDB replay relies on, pinned without a SparkSession:
  * overlapping-pair counting, (count desc, a, b) tie-breaks, greedy
  * left-to-right non-overlapping application, drain, and the hex-pair
  * byte symbolization.
  */
class BpeSpec extends AnyFunSuite {

  test("pair stats count OVERLAPPING adjacents; merge applies greedy left-to-right") {
    // "aaa"×1: pairs (a,a) counted at both positions → c=2
    val m = Bpe.trainInMemory(Array(("aaa", 1L)), rounds = 1)
    assert(m.merges == Seq(("a", "a", 2L)))
    // greedy non-overlapping: aaa → (aa)(a), i.e. 2 symbols
    assert(m.types == Seq(("aaa", 2L)))
  }

  test("winner is (count desc, a asc, b asc); counts weighted by word count") {
    // "ba"×3 beats "ab"×2; at equal counts lexicographic pair wins
    val m1 = Bpe.trainInMemory(Array(("ab", 2L), ("ba", 3L)), rounds = 1)
    assert(m1.merges.head == ("b", "a", 3L))
    val m2 = Bpe.trainInMemory(Array(("ab", 2L), ("ba", 2L)), rounds = 1)
    assert(m2.merges.head == ("a", "b", 2L)) // tie → lexicographic (a,b)
  }

  test("incremental pair maintenance matches a from-scratch recount across rounds") {
    // a structured histogram with reuse across words; compare the
    // incremental trainer's merges against a naive reference
    val hist = Array(("the", 50L), ("then", 20L), ("them", 10L),
      ("he", 40L), ("hen", 5L), ("banana", 7L), ("bandana", 3L))
    def naive(rounds: Int): Seq[(String, String, Long)] = {
      var words = hist.map { case (w, c) => (w.map(_.toString).toArray, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (s, c) =>
          s.indices.dropRight(1).foreach { i =>
            counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
          }
        }
        if (counts.nonEmpty) {
          val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((a, b, c))
          words = words.map { case (s, cnt) =>
            val r = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { r += a + b; i += 2 }
              else { r += s(i); i += 1 }
            }
            (r.toArray, cnt)
          }
        }
      }
      out.toSeq
    }
    assert(Bpe.trainInMemory(hist, rounds = 12).merges == naive(12))
  }

  test("drain: rounds beyond the pair space return the full merge list and single-symbol types") {
    val m = Bpe.trainInMemory(Array(("ab", 1L), ("cd", 2L)), rounds = 100)
    assert(m.merges.length == 2) // one merge per word, then nothing left
    assert(m.types.forall(_._2 == 1L))
  }

  test("tie-break collation is code-point order, not UTF-16 code-unit order") {
    // U+1F600 (😀, surrogate pair D83D DE00) vs U+FFFD (�): UTF-16
    // code-unit comparison ranks the emoji FIRST (0xD83D < 0xFFFD);
    // code-point / UTF-8 byte order — what Spark's UTF8String and
    // DuckDB's binary collation use — ranks U+FFFD first (0xFFFD < 0x1F600).
    val emoji = new String(Character.toChars(0x1F600))
    val bmp = "�"
    assert(emoji < bmp)          // the Scala String trap this guards against
    assert(Bpe.cpLt(bmp, emoji)) // code-point order: opposite winner
    assert(!Bpe.cpLt(emoji, bmp))
    // prefix rule: shorter string that is a prefix sorts first
    assert(Bpe.cpLt("ab", "abc") && !Bpe.cpLt("abc", "ab"))
    assert(!Bpe.cpLt("ab", "ab"))
    // a count tie between pairs starting with these symbols picks the
    // code-point-smaller pair — matching the oracle's ORDER BY c DESC, a, b
    val m = Bpe.trainInMemory(Array((emoji + emoji, 1L), (bmp + bmp, 1L)), rounds = 1)
    assert(m.merges.head == ((bmp, bmp, 1L)))
  }

  test("byte symbolization is UTF-8 hex pairs (uppercase, multi-byte safe)") {
    assert(Bpe.byteSyms("the").toSeq == Seq("74", "68", "65"))
    assert(Bpe.byteSyms("é").toSeq == Seq("C3", "A9")) // 2-byte UTF-8
    // byte-level training merges hex symbols, not characters
    val m = Bpe.trainSymbols(Array(("aaa", 1L)), Bpe.byteSyms, rounds = 1)
    assert(m.merges == Seq(("61", "61", 2L)))
  }
}
