package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Yql
import graft.operators.ExclusionJoin
import graft.sources.Tables

/** The reference's three YQL query shapes (SURVEY.md §0) re-expressed
  * Spark-first over the driver corpus (`orders` stands in for `payments`;
  * FIXTURES.md §B maps each SURVEY §2 operator ID to a corpus table).
  *
  * Every query ends in a deterministic ORDER BY and aliases every computed
  * column identically to its DuckDB oracle, because the driver hash-compares
  * column-sorted values.
  */
object ReferenceQueries {

  /** Q1 "load" shape (/root/reference/src/py/yq_dag.py:65-74): one-year
    * half-open window filter (P6), projection+alias (P1), unwrap (P2),
    * second-truncating Datetime cast (P3), date literals (P5), derived
    * partition year (P4). Filter + pruned columns reach the parquet scan.
    */
  def q1ExportProject(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.prepare(spark)
    val lo = to_timestamp(lit("1996-01-01 00:00:00"))
    val hi = to_timestamp(lit("1997-01-01 00:00:00"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(
        Yql.unwrap(col("o_orderkey")).as("id"),
        col("o_custkey").as("acc"),
        Yql.toDatetime(col("o_orderdate")).as("payment_date"),
        col("o_totalprice").as("amount"),
        col("o_orderstatus").as("state"),
        Yql.paymentYear(col("o_orderdate")).as("payment_year"))
      .orderBy("id")
  }

  val q1Oracle: String =
    """SELECT o_orderkey AS id, o_custkey AS acc,
      |       date_trunc('second', o_orderdate) AS payment_date,
      |       o_totalprice AS amount, o_orderstatus AS state,
      |       CAST(year(o_orderdate) AS INTEGER) AS payment_year
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |ORDER BY id""".stripMargin

  private val exclKeys = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** Q2 "check" shape (/root/reference/src/py/yq_dag.py:82-95): EXCLUSION
    * JOIN (J1) on a multi-column equi-key that includes a DOUBLE
    * (`o_totalprice`, like the reference's `amount`). The two sides are
    * overlapping-but-different subsets of `orders`, so the result is
    * non-empty and every row's origin is observable via the side tag.
    */
  def q2ExclusionJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(exclKeys.map(col): _*)
    val a = o.filter(col("o_orderkey") % 7 =!= 0)
    val b = o.filter(col("o_orderkey") % 5 =!= 0)
    ExclusionJoin.tagged(a, b, exclKeys, tagCol = "side", leftTag = "a", rightTag = "b")
      .orderBy("side", "o_orderkey")
  }

  val q2Oracle: String =
    """WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
      |     b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT a.*, 'a' AS side FROM a WHERE NOT EXISTS (
      |  SELECT 1 FROM b WHERE b.o_orderkey = a.o_orderkey AND b.o_custkey = a.o_custkey
      |    AND b.o_orderstatus = a.o_orderstatus AND b.o_totalprice = a.o_totalprice)
      |UNION ALL
      |SELECT b.*, 'b' AS side FROM b WHERE NOT EXISTS (
      |  SELECT 1 FROM a WHERE a.o_orderkey = b.o_orderkey AND a.o_custkey = b.o_custkey
      |    AND a.o_orderstatus = b.o_orderstatus AND a.o_totalprice = b.o_totalprice)
      |ORDER BY side, o_orderkey""".stripMargin

  /** Q2's production form: the count-only reconciliation gate. Identical
    * subsets ⇒ 0; used by CoolingPipeline. Exposed as a 1-row DataFrame so
    * the driver can hash it (A1 global count).
    */
  def q2ReconcileCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(exclKeys.map(col): _*)
    val a = o.filter(col("o_orderkey") % 7 =!= 0)
    val b = o.filter(col("o_orderkey") % 5 =!= 0)
    Seq(ExclusionJoin.count(a, b, exclKeys)).toDF("diff_cnt")
  }

  val q2ReconcileOracle: String =
    """WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
      |     b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT (SELECT count(1) FROM a WHERE NOT EXISTS (
      |          SELECT 1 FROM b WHERE b.o_orderkey = a.o_orderkey AND b.o_custkey = a.o_custkey
      |            AND b.o_orderstatus = a.o_orderstatus AND b.o_totalprice = a.o_totalprice))
      |     + (SELECT count(1) FROM b WHERE NOT EXISTS (
      |          SELECT 1 FROM a WHERE a.o_orderkey = b.o_orderkey AND a.o_custkey = b.o_custkey
      |            AND a.o_orderstatus = b.o_orderstatus AND a.o_totalprice = b.o_totalprice))
      |       AS diff_cnt""".stripMargin

  /** Q3 "federation analytics" shape (/root/reference/README_en.md:239-246):
    * two tagged scans (P7) UNION ALL'd positionally (U1), hash aggregate on
    * a year expression + tag (A2/A3, F1), global sort (O1). The hot/cold cut
    * plays the PG-vs-S3 federation split.
    */
  def q3Federation(spark: SparkSession, dir: String): DataFrame = {
    val cut = to_timestamp(lit("1998-01-01 00:00:00"))
    val o = Tables.orders(spark, dir)
    val hot  = o.filter(col("o_orderdate") >= cut)
      .select(col("o_orderkey").as("id"), col("o_orderdate").as("pdate"), lit("pg").as("src"))
    val cold = o.filter(col("o_orderdate") < cut)
      .select(col("o_orderkey").as("id"), col("o_orderdate").as("pdate"), lit("s3").as("src"))
    hot.unionAll(cold)
      .groupBy(year(col("pdate")).cast("int").as("dyear"), col("src"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("dyear", "src")
  }

  val q3Oracle: String =
    """SELECT CAST(year(pdate) AS INTEGER) AS dyear, src, count(1) AS cnt
      |FROM (
      |  SELECT o_orderkey AS id, o_orderdate AS pdate, 'pg' AS src FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |  UNION ALL
      |  SELECT o_orderkey AS id, o_orderdate AS pdate, 's3' AS src FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |)
      |GROUP BY 1, 2
      |ORDER BY dyear, src""".stripMargin

  /** A1: ungrouped scalar count over a window filter. */
  def q4AggCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-06-01 00:00:00")) &&
              col("l_shipdate") <  to_timestamp(lit("1996-06-01 00:00:00")))
      .agg(count(lit(1)).as("cnt"))

  val q4Oracle: String =
    """SELECT count(1) AS cnt FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1996-06-01'""".stripMargin

  /** Scalar-function battery (F2 lpad, F5 floor/mod, F6 make_date,
    * F7 add_months, F9 concat+cast) over `customer`.
    */
  def q5ScalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    val mon = (col("c_custkey") % 12 + 1).cast("int")
    Tables.customer(spark, dir)
      .select(
        col("c_custkey").as("id"),
        lpad(col("c_custkey").cast("string"), 20, "0").as("num"),
        concat(lit("customer "), col("c_custkey").cast("string")).as("descr"),
        floor(col("c_custkey") / 12).cast("long").as("grp"),
        mon.as("mon"),
        make_date(lit(2020), mon, lit(1)).as("month_start"),
        add_months(make_date(lit(2020), mon, lit(1)), 1).as("next_month"))
      .orderBy("id")
  }

  val q5Oracle: String =
    """SELECT c_custkey AS id,
      |       lpad(CAST(c_custkey AS VARCHAR), 20, '0') AS num,
      |       'customer ' || CAST(c_custkey AS VARCHAR) AS descr,
      |       CAST(floor(c_custkey / 12) AS BIGINT) AS grp,
      |       CAST(c_custkey % 12 + 1 AS INTEGER) AS mon,
      |       make_date(2020, CAST(c_custkey % 12 + 1 AS INTEGER), 1) AS month_start,
      |       make_date(CASE WHEN c_custkey % 12 + 1 = 12 THEN 2021 ELSE 2020 END,
      |                 CAST(CASE WHEN c_custkey % 12 + 1 = 12 THEN 1 ELSE c_custkey % 12 + 2 END AS INTEGER), 1)
      |         AS next_month
      |FROM customer ORDER BY id""".stripMargin

  /** S6: integer series generator (`generate_series(0,10000)` analog). */
  def q6RangeSeries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.range(0, 10001).toDF("id").orderBy("id")
  }

  val q6Oracle: String = "SELECT range AS id FROM range(0, 10001) ORDER BY id"

  /** S7: timestamp series, 1 row/minute over a day (`generate_series(ts, ts,
    * interval)` analog) via `explode(sequence(...))`.
    */
  def q7TimeSeries(spark: SparkSession, dir: String): DataFrame =
    spark.range(1).select(
      explode(sequence(
        to_timestamp(lit("2024-01-01 00:00:00")),
        to_timestamp(lit("2024-01-01 23:59:00")),
        expr("interval 1 minute"))).as("ts"))
      .orderBy("ts")

  val q7Oracle: String =
    """SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 23:59:00', INTERVAL 1 MINUTE)) AS ts
      |ORDER BY ts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_export_project" -> (q1ExportProject _),
    "q2_exclusion_join" -> (q2ExclusionJoin _),
    "q2_reconcile_count" -> (q2ReconcileCount _),
    "q3_federation" -> (q3Federation _),
    "q4_agg_count" -> (q4AggCount _),
    "q5_scalar_funcs" -> (q5ScalarFuncs _),
    "q6_range_series" -> (q6RangeSeries _),
    "q7_time_series" -> (q7TimeSeries _))

  val oracles: Map[String, String] = Map(
    "q1_export_project" -> q1Oracle,
    "q2_exclusion_join" -> q2Oracle,
    "q2_reconcile_count" -> q2ReconcileOracle,
    "q3_federation" -> q3Oracle,
    "q4_agg_count" -> q4Oracle,
    "q5_scalar_funcs" -> q5Oracle,
    "q6_range_series" -> q6Oracle,
    "q7_time_series" -> q7Oracle)
}
