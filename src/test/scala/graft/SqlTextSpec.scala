package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ReferenceQueries
import graft.sources.Tables

/** C7 parity (SURVEY.md §2.9, §3.2): the reference submits *query text* to
  * its engine. Our engine accepts the same shapes as one `spark.sql` string
  * over the federated temp-view namespace — CTE named subqueries (S3),
  * `unwrap` as a SQL function (P2), the exclusion join as its two-anti-join
  * SQL form (J1), group-by-expression aggregates (A2) — and returns results
  * identical to the DataFrame API plans.
  */
class SqlTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("Q3 federation shape as one SQL text == DataFrame API result") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """WITH a AS (
        |  SELECT o_orderkey AS id, o_orderdate AS pdate, 'pg' AS src FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  UNION ALL
        |  SELECT o_orderkey AS id, o_orderdate AS pdate, 's3' AS src FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT CAST(year(pdate) AS INT) AS dyear, src, count(1) AS cnt
        |FROM a GROUP BY 1, 2 ORDER BY dyear, src""".stripMargin).collect()
    val api = ReferenceQueries.q3Federation(spark, dir).collect()
    assert(sql.sameElements(api))
  }

  test("unwrap works in SQL text and fails loudly on NULL") {
    Tables.registerAll(spark, dir)
    GraftSession.prepare(spark)
    val ok = spark.sql("SELECT unwrap(o_orderkey) AS id FROM orders ORDER BY id LIMIT 3").collect()
    val want = spark.table("orders").selectExpr("o_orderkey AS id").orderBy("id").limit(3).collect()
    assert(ok.map(_.getLong(0)).sameElements(want.map(_.getLong(0))))
    val e = intercept[Exception] {
      spark.sql("SELECT unwrap(CASE WHEN o_orderkey = 5 THEN NULL ELSE o_orderkey END) FROM orders").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("unwrap() failed")))
  }

  test("exclusion join as SQL text (two anti joins) == operator result") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
        |     b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT * FROM a ANTI JOIN b USING (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
        |UNION ALL
        |SELECT * FROM b ANTI JOIN a USING (o_orderkey, o_custkey, o_orderstatus, o_totalprice)""".stripMargin)
    val api = graft.operators.ExclusionJoin(
      spark.table("orders").selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .where("o_orderkey % 7 <> 0"),
      spark.table("orders").selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .where("o_orderkey % 5 <> 0"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
    assert(sql.count() == api.count())
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }
}
