package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-way join / top-k / window analytics over the TPC-H-shaped corpus —
  * the headline shapes a warehouse runs constantly, tuned the way they must
  * run at 100 TB:
  *
  *  - dimensions (`nation`, `customer`, `part`) are `broadcast()` so the
  *    fact scan joins map-side — no fact-table shuffle for dim joins;
  *  - aggregations go partial→final on the fact table *before* meeting
  *    small sides where possible (j2 aggregates lineitem down to one row
  *    per part before the dim join);
  *  - revenue math is exact integer cents (`round(x*100)::BIGINT`), making
  *    the aggregate order-independent — double sums would differ between
  *    engines (and between runs at different parallelism).
  */
object JoinQueries {

  /** revenue in "centi-cent" integer units: price-cents × (100 − discount-cents). */
  private def revCents2(price: Column, discount: Column): Column =
    round(price * 100).cast("long") * (lit(100L) - round(discount * 100).cast("long"))

  private val revSql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  /** Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation with the
    * dims broadcast. The only big shuffle is lineitem⋈orders on orderkey.
    */
  def j1RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), revCents2(col("l_extendedprice"), col("l_discount")).as("rc2"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("rc2")) / 10000.0).as("revenue"))
      .orderBy("n_name")
  }

  val j1Oracle: String =
    s"""SELECT n_name, count(1) AS n_items, sum($revSql) / 10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Top-10 parts by revenue: aggregate the fact table FIRST (partial agg
    * map-side), then broadcast-join the `part` dim onto 10⁴× fewer rows.
    */
  def j2TopParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), revCents2(col("l_extendedprice"), col("l_discount")).as("rc2"))
      .groupBy("l_partkey")
      .agg(sum(col("rc2")).as("rc2sum"), count(lit(1)).as("n_items"))
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"), col("p_brand"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("n_items"),
        (col("rc2sum") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
      .limit(10)
  }

  val j2Oracle: String =
    s"""WITH li AS (
       |  SELECT l_partkey, sum($revSql) AS rc2sum, count(1) AS n_items
       |  FROM lineitem GROUP BY 1)
       |SELECT p_partkey, p_name, p_brand, n_items, rc2sum / 10000.0 AS revenue
       |FROM li JOIN part ON l_partkey = p_partkey
       |ORDER BY revenue DESC, p_partkey LIMIT 10""".stripMargin

  /** Window ranking: top-3 orders by price within each priority class
    * (ranking window over a shuffled-by-key partition — no global sort).
    */
  def j3TopOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  val j3Oracle: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |       CAST(row_number() OVER (PARTITION BY o_orderpriority
      |                               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |FROM orders QUALIFY rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** Anti/semi-join pair: customers with no orders in 1997 (anti) next to
    * the count of those with orders (semi) — the classic existence shapes,
    * broadcast-free (both sides keyed, one shuffle each).
    */
  def j4CustomerActivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord97 = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val active = cust.join(ord97, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val inactive = cust.join(ord97, col("c_custkey") === col("o_custkey"), "left_anti").count()
    Seq((active, inactive)).toDF("n_active", "n_inactive")
  }

  val j4Oracle: String =
    """SELECT
      |  (SELECT count(1) FROM customer WHERE EXISTS (
      |     SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |       AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')) AS n_active,
      |  (SELECT count(1) FROM customer WHERE NOT EXISTS (
      |     SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |       AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')) AS n_inactive""".stripMargin

  /** j5: the TPC-H Q1 pricing-summary shape — multi-aggregate scan-side
    * rollup with derived expressions (disc price, charge). The canonical
    * "is partial aggregation working" benchmark: one scan, map-side
    * combine, 4-row result. Money through DECIMAL so every engine sums
    * exactly; averages derived from exact sums in double.
    */
  def j5PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val disc = round(col("l_discount") * 100).cast("long")   // discount in % points
    val tax = round(col("l_tax") * 100).cast("long")
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents).as("sum_base_cents"),
        sum(cents * (lit(100L) - disc)).as("sum_disc_price_c4"),  // cents × 10⁻²·%
        sum(cents * (lit(100L) - disc) * (lit(100L) + tax)).as("sum_charge_c6"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(cents).cast("double") / count(lit(1))).as("avg_cents"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val j5Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_c4,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_c6,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(1) AS avg_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(1) AS avg_cents,
      |       count(1) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** j6: correlated scalar subquery — customers whose single largest order
    * is more than twice THEIR OWN average order. Catalyst decorrelates the
    * correlated aggregate into a join against a grouped subplan (one
    * shuffle), the same plan the hand-written groupBy+join would produce.
    */
  def j6CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_j6")
    spark.sql(
      """SELECT o_custkey,
        |       CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_cents
        |FROM orders_j6 o
        |GROUP BY o_custkey
        |HAVING max(round(o_totalprice * 100)) >
        |       2 * (SELECT avg(round(o2.o_totalprice * 100))
        |            FROM orders_j6 o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey""".stripMargin)
  }

  val j6Oracle: String =
    """SELECT o_custkey,
      |       CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_cents
      |FROM orders o
      |GROUP BY o_custkey
      |HAVING max(round(o_totalprice * 100)) >
      |       2 * (SELECT avg(round(o2.o_totalprice * 100))
      |            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_custkey""".stripMargin

  /** j7: the TPC-H Q3 shape — segment filter on the dim, date filters on
    * both fact sides, 3-way join, revenue aggregation, global top-10. The
    * dim side broadcasts; the global top-k runs as TakeOrderedAndProject
    * (per-partition heaps, k rows to the driver — no full sort at any
    * scale). Revenue in integer micro-units: cents × (100 − discount%) is
    * exact, so the sum and the top-10 cutoff are engine-independent.
    */
  def j7ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1995-03-15 00:00:00"))
    val cust = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_c4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev_c4")).as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("l_orderkey"))
      .limit(10)
  }

  val j7Oracle: String =
    """SELECT l_orderkey, o_orderdate,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |             JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue_c4 DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** j8: TPC-H Q18 shape (large-volume customers) — a HAVING-filtered
    * aggregate over the fact table drives a semi-ish join back through
    * orders to customer. The qty aggregate reduces lineitem BEFORE any
    * join (partial agg + one key shuffle); the handful of qualifying
    * orderkeys then join broadcast-style against orders/customer. Cites
    * the reference's federated-analytics pattern
    * (/root/reference/README_en.md:239) at TPC-H heft.
    */
  def j8BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
      .where(col("qty") > 300)
    qty
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("qty"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  val j8Oracle: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |       CAST(qty AS BIGINT) AS qty
      |FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) q
      |JOIN orders ON o_orderkey = q.l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY price_cents DESC, o_orderkey LIMIT 100""".stripMargin

  /** j9: customer order-count distribution (the TPC-H Q13 shape, adapted
    * to this schema's columns — the filter excludes urgent orders where
    * Q13 excludes special-request comments): how many customers placed
    * exactly k qualifying orders, INCLUDING the zero-order customers the
    * left join preserves. The plan reduces the fact side FIRST — orders
    * pre-aggregate to (custkey, cnt) before touching customer (the j8
    * discipline: the join input is one row per customer, not one per
    * order) — then the distribution is a second, |distinct counts|-sized
    * aggregate. Both shuffles key on custkey / cnt; nothing is quadratic
    * and the dim join broadcasts when customer fits.
    */
  def j9CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ordCnt = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, dir)
      .join(ordCnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val j9Oracle: String =
    """WITH oc AS (
      |  SELECT o_custkey, count(1) AS cnt
      |  FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
      |SELECT coalesce(oc.cnt, 0) AS c_count, count(1) AS custdist
      |FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j9_custdist" -> (j9CustDist _),
    "j8_big_orders" -> (j8BigOrders _),
    "j1_revenue_by_nation" -> (j1RevenueByNation _),
    "j2_top_parts" -> (j2TopParts _),
    "j3_top_orders_per_priority" -> (j3TopOrdersPerPriority _),
    "j4_customer_activity" -> (j4CustomerActivity _),
    "j5_pricing_summary" -> (j5PricingSummary _),
    "j6_correlated_subquery" -> (j6CorrelatedSubquery _),
    "j7_shipping_priority" -> (j7ShippingPriority _))

  val oracles: Map[String, String] = Map(
    "j9_custdist" -> j9Oracle,
    "j8_big_orders" -> j8Oracle,
    "j1_revenue_by_nation" -> j1Oracle,
    "j2_top_parts" -> j2Oracle,
    "j3_top_orders_per_priority" -> j3Oracle,
    "j4_customer_activity" -> j4Oracle,
    "j5_pricing_summary" -> j5Oracle,
    "j6_correlated_subquery" -> j6Oracle,
    "j7_shipping_priority" -> j7Oracle)
}
