package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcPaymentsSource

/** S1/S4/K3/C8 over a REAL JDBC engine: embedded Derby (ships with Spark)
  * stands in for the reference's PostgreSQL. Exercises the parallel
  * range-split scan with predicate pushdown, the catalog partition
  * enumeration, and the destructive partition drop — the exact code paths
  * production runs against `pg-finance`.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val setup: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE payments (
      id BIGINT NOT NULL, doc_num VARCHAR(10) NOT NULL,
      accdt BIGINT NOT NULL, acckt BIGINT NOT NULL,
      amount DOUBLE NOT NULL, payment_date TIMESTAMP NOT NULL,
      descr VARCHAR(64), state VARCHAR(10) NOT NULL)""")
    val ins = conn.prepareStatement("INSERT INTO payments VALUES (?,?,?,?,?,?,?,?)")
    (1 to 240).foreach { i => // 2 years, ~10 rows/month
      ins.setLong(1, i); ins.setString(2, i.toString)
      ins.setLong(3, i % 100); ins.setLong(4, 100 - i % 100)
      ins.setDouble(5, i * 1.25)
      ins.setTimestamp(6, java.sql.Timestamp.valueOf(
        f"${2020 + (i - 1) / 120}-${(i - 1) / 10 % 12 + 1}%02d-0${(i - 1) % 10 % 9 + 1} 12:00:00"))
      ins.setString(7, s"payment $i"); ins.setString(8, "done")
      ins.addBatch()
    }
    ins.executeBatch()
    // monthly "child partition" marker tables, reference naming
    Seq("payments_y2020m01", "payments_y2020m02", "payments_y2021m01")
      .foreach(t => st.execute(s"CREATE TABLE $t (id BIGINT)"))
    conn.close()
  }

  private def source = new JdbcPaymentsSource(
    url, fetchPar = 4, idBounds = (0L, 256L),
    catalogQuery = prefix =>
      s"SELECT tablename FROM SYS.SYSTABLES WHERE tablename LIKE '${prefix.toUpperCase}%'")

  test("parallel JDBC scan with window filter pushed to the database") {
    setup
    val df = source.scan(spark)
      .filter(col("payment_date") >= lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")) &&
        col("payment_date") < lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")))
    assert(df.count() == 120)
    assert(df.rdd.getNumPartitions == 4) // range-split over id — parallel read
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("PAYMENT_DATE"),
      s"window filter should reach the JDBC source:\n$plan")
  }

  test("column pruning reaches the JDBC scan: 2-column projection reads 2 columns") {
    setup
    val df = source.scan(spark).select("id", "amount")
    val plan = df.queryExecution.executedPlan.toString
    // ReadSchema on the JDBC relation must carry ONLY the projected columns:
    // a scan that drags DESCR/DOC_NUM through the wire for a 2-column
    // projection pays the width at every row
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ID") && read.contains("AMOUNT"),
      s"projected columns missing from ReadSchema:\n$plan")
    assert(!read.contains("DESCR") && !read.contains("DOC_NUM") && !read.contains("PAYMENT_DATE"),
      s"unprojected columns leaked into the JDBC ReadSchema:\n$plan")
  }

  test("DSv2 catalog: q4-shaped COUNT and grouped SUM push into the database") {
    setup
    source.registerCatalog(spark, "hotcat")
    // q4 shape: global scalar count — the K4 result-fetch pattern
    val q4 = spark.sql("SELECT count(1) AS n FROM hotcat.PAYMENTS")
    val q4Plan = q4.queryExecution.executedPlan.toString
    assert(q4Plan.contains("PushedAggregates: [COUNT(*)]"),
      s"global count should compile into the remote SQL:\n$q4Plan")
    assert(q4.collect().head.getLong(0) == 240L)

    // grouped rollup: GROUP BY + COUNT/SUM — the q3-federation JDBC side
    val grp = spark.sql(
      "SELECT state, count(1) AS n, sum(amount) AS amt FROM hotcat.PAYMENTS GROUP BY state")
    val grpPlan = grp.queryExecution.executedPlan.toString
    assert(grpPlan.contains("PushedAggregates: [COUNT(*), SUM(AMOUNT)]") &&
      grpPlan.contains("PushedGroupByExpressions: [STATE]"),
      s"grouped aggregate should push group keys + aggregates:\n$grpPlan")
    assert(grp.collect().map(_.getLong(1)).sum == 240L)

    // q2's JOIN itself can never push (the cold side is parquet, not in
    // the database) — but the hot side of the join still prunes + filters
    val cold = spark.range(0, 100).selectExpr("id AS id")
    val joined = spark.sql("SELECT id, amount FROM hotcat.PAYMENTS WHERE amount > 10")
      .join(cold, "id")
    val jPlan = joined.queryExecution.executedPlan.toString
    // the join even adds its own ID IS NOT NULL to the pushed set
    assert(jPlan.contains("AMOUNT > 10.0") && jPlan.contains("PushedFilters"),
      s"hot-side filter should still push under the join:\n$jPlan")
  }

  test("catalog partition enumeration and destructive drop (S4 + K3)") {
    setup
    assert(source.listPartitions(spark, "payments_y2020") ==
      Seq("PAYMENTS_Y2020M01", "PAYMENTS_Y2020M02"))
    source.dropPartitions(spark, Seq("PAYMENTS_Y2020M01", "PAYMENTS_Y2020M02"))
    assert(source.listPartitions(spark, "payments_y2020").isEmpty)
    assert(source.listPartitions(spark, "payments_y2021") == Seq("PAYMENTS_Y2021M01"))
  }

  test("DEFAULT PostgreSQL catalog query text executes verbatim (pg_tables emulation)") {
    // No PostgreSQL exists in this container, but the default catalog
    // query is plain SQL over a relation named pg_tables — so plant that
    // relation in Derby and run the UNMODIFIED PG query text
    // (yq_dag.py:112's shape) end to end. This pins the exact SQL string
    // production would send to pg-finance, not a dialect-injected stand-in.
    val pgUrl = "jdbc:derby:memory:graftpg;create=true"
    val conn = DriverManager.getConnection(pgUrl)
    val st = conn.createStatement()
    st.execute("CREATE TABLE pg_tables (tablename VARCHAR(64))")
    Seq("payments_y2020m01", "payments_y2020m02", "payments_y2021m01", "other_table")
      .foreach(t => st.execute(s"INSERT INTO pg_tables VALUES ('$t')"))
    conn.close()

    val pgSource = new JdbcPaymentsSource(pgUrl) // default (PG) catalogQuery
    assert(pgSource.listPartitions(spark, "payments_y2020") ==
      Seq("payments_y2020m01", "payments_y2020m02"))
    assert(pgSource.listPartitions(spark, "payments_y") ==
      Seq("payments_y2020m01", "payments_y2020m02", "payments_y2021m01"))
  }
}
