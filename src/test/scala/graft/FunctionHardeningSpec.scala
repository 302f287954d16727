package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArgMaxLong, ArgValue}

/** Library-primitive edge cases (ADVICE r3):
  * - `graft_char_ngrams` registration must accept any foldable integral n
  *   (BIGINT literals included) and reject everything else with an
  *   AnalysisException that names the function — not a bare
  *   ClassCastException/NPE from `eval(null).asInstanceOf[Int]`.
  * - `ArgMaxLong` must not reserve any arg value as an empty sentinel: a
  *   legitimate arg = -1 row has to be able to win its group.
  */
class FunctionHardeningSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; GraftSession.prepare(s); s }

  private def ngrams(sql: String) = {
    import spark.implicits._
    Seq("abcd").toDF("t").createOrReplaceTempView("fh_t")
    spark.sql(s"SELECT $sql AS g FROM fh_t")
  }

  test("char_ngrams: INT and BIGINT literal n both fold") {
    val i = ngrams("graft_char_ngrams(t, 3)").head.getSeq[String](0)
    val l = ngrams("graft_char_ngrams(t, CAST(3 AS BIGINT))").head.getSeq[String](0)
    assert(i == Seq("abc", "bcd") && l == i)
  }

  test("char_ngrams: non-foldable / NULL / overflowing n → named AnalysisException") {
    for (bad <- Seq("graft_char_ngrams(t, length(t))",
                    "graft_char_ngrams(t, CAST(NULL AS INT))",
                    "graft_char_ngrams(t, 9999999999999)",
                    "graft_char_ngrams(t)")) {
      val e = intercept[AnalysisException](ngrams(bad).collect())
      assert(e.getMessage.contains("graft_char_ngrams"),
        s"$bad: message should name the function, got: ${e.getMessage}")
    }
  }

  test("ArgMaxLong: arg = -1 is a legitimate key, not an empty sentinel") {
    import spark.implicits._
    val out = Seq((1L, -1L, 100L), (1L, 7L, 50L), (2L, -1L, 10L))
      .toDF("k", "arg", "value").as[(Long, Long, Long)]
      .map { case (k, a, v) => (k, ArgValue(a, v)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(new ArgMaxLong().toColumn.name("best"))
      .collect().map { case (k, b) => k -> ((b.arg, b.value, b.set)) }.toMap
    assert(out(1L) == ((-1L, 100L, true)), s"arg=-1 must win group 1, got ${out(1L)}")
    assert(out(2L) == ((-1L, 10L, true)))
  }

  test("ArgMaxLong: deterministic tie-break to smallest arg") {
    import spark.implicits._
    val out = Seq((1L, 9L, 5L), (1L, 3L, 5L), (1L, 6L, 5L))
      .toDF("k", "arg", "value").as[(Long, Long, Long)]
      .map { case (k, a, v) => (k, ArgValue(a, v)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(new ArgMaxLong().toColumn.name("best"))
      .collect().head._2
    assert(out.arg == 3L && out.value == 5L && out.set)
  }
}
