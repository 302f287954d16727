package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.sources.Tables

/** Time-series and OLAP analytics beyond the reference surface: the as-of
  * join (point-in-time lookup — composed as one keyed window, see
  * operators.AsOfJoin), rollup/cube hierarchies, and bag/set operations.
  * DuckDB's native ASOF JOIN is the oracle for ours.
  */
object AnalyticsQueries {

  /** Each purchase event joined to the user's most recent signup at or
    * before it (inner as-of semantics).
    */
  def a1AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"), col("value").as("signup_value"))
    AsOfJoin(purchases, signups, "user_id", "ts", "signup_ts", Seq("signup_value"))
      .orderBy("event_id")
  }

  val a1Oracle: String =
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
      |     s AS (SELECT user_id, ts AS signup_ts, value AS signup_value FROM events WHERE event_type = 'signup')
      |SELECT p.event_id, p.user_id, p.ts, p.value, s.signup_ts, s.signup_value
      |FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
      |ORDER BY event_id""".stripMargin

  /** a2: the other `merge_asof` half — FORWARD as-of with tolerance and
    * left-outer semantics: each purchase finds the NEXT error event of the
    * same user within 1 hour, or NULLs. The nearest candidate is picked
    * first and then tolerance-filtered (merge_asof's order of operations);
    * the error side pre-dedups to one row per (user, instant) per the
    * operator's uniqueness contract. Same single-shuffle keyed-window plan
    * as a1 — direction only flips the frame and the side ordering.
    */
  def a2AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts").as("err_ts"))
      .agg(min("event_id").as("err_id"))
    AsOfJoin(purchases, errors, "user_id", "ts", "err_ts", Seq("err_id"),
      direction = "forward", toleranceMicros = Some(3600L * 1000000L), outer = true)
      .orderBy("event_id")
  }

  val a2Oracle: String =
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, ts AS err_ts, min(event_id) AS err_id
      |      FROM events WHERE event_type = 'error' GROUP BY user_id, ts),
      |cand AS (
      |  SELECT p.event_id, e.err_ts, e.err_id,
      |         row_number() OVER (PARTITION BY p.event_id ORDER BY e.err_ts) AS rn
      |  FROM p JOIN e ON e.user_id = p.user_id AND e.err_ts >= p.ts
      |     AND epoch_us(e.err_ts) - epoch_us(p.ts) <= 3600000000)
      |SELECT p.event_id, p.user_id, p.ts, p.value, c.err_ts, c.err_id
      |FROM p LEFT JOIN (SELECT event_id, err_ts, err_id FROM cand WHERE rn = 1) c USING (event_id)
      |ORDER BY p.event_id""".stripMargin

  /** ROLLUP hierarchy: (year, status) → (year) → (). */
  def g1Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(year(col("o_orderdate")).cast("int").as("dyear"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("dyear").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  val g1Oracle: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS dyear, o_orderstatus, count(1) AS cnt
      |FROM orders GROUP BY ROLLUP(dyear, o_orderstatus)
      |ORDER BY dyear NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** CUBE over (priority, status). */
  def g2Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  val g2Oracle: String =
    """SELECT o_orderpriority, o_orderstatus, count(1) AS cnt
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** INTERSECT / EXCEPT (set semantics): customers ordering in both 1996
    * and 1997, and in 1996 only.
    */
  def g3SetOps(spark: SparkSession, dir: String): DataFrame = {
    def buyers(y: Int) = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit(s"$y-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit(s"${y + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))
    val both = buyers(1996).intersect(buyers(1997))
      .select(col("o_custkey"), lit("both").as("tag"))
    val only96 = buyers(1996).except(buyers(1997))
      .select(col("o_custkey"), lit("only96").as("tag"))
    both.unionByName(only96).orderBy("tag", "o_custkey")
  }

  val g3Oracle: String =
    """WITH b96 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |     b97 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM b96 INTERSECT SELECT o_custkey FROM b97)
      |UNION ALL
      |SELECT o_custkey, 'only96' AS tag FROM (SELECT o_custkey FROM b96 EXCEPT SELECT o_custkey FROM b97)
      |ORDER BY tag, o_custkey""".stripMargin

  /** PIVOT: order counts cross-tabulated status × priority (explicit value
    * list — the only scalable form: an open value list needs a pre-pass).
    */
  def g4Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("O"), lit(0L)).as("cnt_o"),
        coalesce(col("P"), lit(0L)).as("cnt_p"))
      .orderBy("o_orderpriority")

  val g4Oracle: String =
    """SELECT o_orderpriority,
      |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
      |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
      |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt): wide numeric columns → long (metric, value) rows. */
  def g5Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .unpivot(
        Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nationkey").cast("double").as("c_nationkey")),
        "metric", "value")
      .orderBy("c_custkey", "metric")

  val g5Oracle: String =
    """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
      |UNION ALL
      |SELECT c_custkey, 'c_nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
      |ORDER BY c_custkey, metric""".stripMargin

  /** g6: explicit GROUPING SETS — the two marginal distributions (by
    * priority, by status) in ONE aggregation pass, disambiguated by
    * `grouping()` flags (rollup/cube are just fixed grouping-set lists;
    * this is the general form).
    */
  def g6GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_g6")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |       CAST(grouping(o_orderstatus) AS INT) AS g_stat,
        |       count(1) AS cnt
        |FROM orders_g6
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY g_prio, g_stat, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        |""".stripMargin)
  }

  val g6Oracle: String =
    """SELECT o_orderpriority, o_orderstatus,
      |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |       CAST(grouping(o_orderstatus) AS INT) AS g_stat,
      |       count(1) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY g_prio, g_stat, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** g7: bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) — g3's
    * multiset counterparts: multiplicities survive (a customer ordering
    * twice in each year intersects twice). Implemented physically as
    * grouped-count arithmetic by both engines — one shuffle, no distinct.
    */
  def g7SetOpsBag(spark: SparkSession, dir: String): DataFrame = {
    def buyers(y: Int) = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit(s"$y-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit(s"${y + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))
    val common = buyers(1996).intersectAll(buyers(1997))
      .select(col("o_custkey"), lit("common").as("tag"))
    val surplus96 = buyers(1996).exceptAll(buyers(1997))
      .select(col("o_custkey"), lit("surplus96").as("tag"))
    common.unionByName(surplus96)
      .groupBy("tag", "o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("tag", "o_custkey")
  }

  val g7Oracle: String =
    """WITH b96 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |     b97 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
      |tagged AS (
      |  SELECT o_custkey, 'common' AS tag FROM (SELECT * FROM b96 INTERSECT ALL SELECT * FROM b97)
      |  UNION ALL
      |  SELECT o_custkey, 'surplus96' AS tag FROM (SELECT * FROM b96 EXCEPT ALL SELECT * FROM b97))
      |SELECT tag, o_custkey, count(1) AS multiplicity
      |FROM tagged GROUP BY tag, o_custkey
      |ORDER BY tag, o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_asof_join" -> (a1AsofJoin _),
    "a2_asof_forward" -> (a2AsofForward _),
    "g1_rollup" -> (g1Rollup _),
    "g2_cube" -> (g2Cube _),
    "g3_setops" -> (g3SetOps _),
    "g4_pivot" -> (g4Pivot _),
    "g5_unpivot" -> (g5Unpivot _),
    "g6_grouping_sets" -> (g6GroupingSets _),
    "g7_setops_bag" -> (g7SetOpsBag _))

  val oracles: Map[String, String] = Map(
    "a1_asof_join" -> a1Oracle,
    "a2_asof_forward" -> a2Oracle,
    "g1_rollup" -> g1Oracle,
    "g2_cube" -> g2Oracle,
    "g3_setops" -> g3Oracle,
    "g4_pivot" -> g4Oracle,
    "g5_unpivot" -> g5Oracle,
    "g6_grouping_sets" -> g6Oracle,
    "g7_setops_bag" -> g7Oracle)
}
