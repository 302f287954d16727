package graft

import java.sql.DriverManager

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcPaymentsSource

/** PG-dialect verification WITHOUT a server (none exists in this
  * container): every PostgreSQL-bound string the pipeline can emit is
  * pinned against a golden form, and Spark's `PostgresDialect` type/literal
  * mappings — the layer that compiles pushed filters and reads `numeric`/
  * `timestamp` columns on a real PG connection — are pinned through the
  * public `JdbcDialects` API. The engine-independent JDBC→Catalyst numeric
  * path is exercised live on embedded Derby (same `JdbcUtils` code a PG
  * read runs).
  *
  * Reference surface: /root/reference/src/py/yq_dag.py:67 (federated PG
  * read), :112 (pg_tables catalog scan), :113-116 (partition drop DDL).
  */
class PgDialectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // -- golden wire strings (exactly what production executes) -----------

  test("catalog enumeration SQL matches the reference's pg_tables scan") {
    assert(JdbcPaymentsSource.pgCatalogQuery("payments_y2020") ==
      "select tablename from pg_tables where tablename like 'payments_y2020%'")
  }

  test("partition drop DDL matches the reference's PL/pgSQL execute string") {
    assert(JdbcPaymentsSource.dropDdl("payments_y2020m01") == "drop table payments_y2020m01")
  }

  // -- PostgresDialect resolution + mappings ----------------------------

  private val pg = JdbcDialects.get("jdbc:postgresql://host:5432/finance")

  test("postgresql:// URLs resolve to PostgresDialect") {
    assert(pg.getClass.getName == "org.apache.spark.sql.jdbc.PostgresDialect")
    assert(pg.quoteIdentifier("payment_date") == "\"payment_date\"")
  }

  test("write-side type mapping: Catalyst -> PG column types") {
    assert(pg.getJDBCType(DecimalType(10, 2)).get.databaseTypeDefinition == "NUMERIC(10,2)")
    // Spark TimestampType is TZ-aware -> timestamptz; NTZ has no PG override
    // and falls through to the shared default, plain TIMESTAMP
    assert(pg.getJDBCType(TimestampType).get.databaseTypeDefinition == "TIMESTAMP WITH TIME ZONE")
    assert(pg.getJDBCType(TimestampNTZType).isEmpty)
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    assert(JdbcUtils.getCommonJDBCType(TimestampNTZType).get.databaseTypeDefinition == "TIMESTAMP")
    assert(pg.getJDBCType(DoubleType).get.databaseTypeDefinition == "FLOAT8")
    assert(pg.getJDBCType(StringType).get.databaseTypeDefinition == "TEXT")
  }

  test("read-side type mapping: PG-specific Catalyst overrides") {
    val md = new MetadataBuilder()
    assert(pg.getCatalystType(java.sql.Types.REAL, "float4", 0, md).contains(FloatType))
    assert(pg.getCatalystType(java.sql.Types.SMALLINT, "int2", 0, md).contains(ShortType))
    assert(pg.getCatalystType(java.sql.Types.VARCHAR, "text", 0, md).contains(StringType))
    // numeric(p,s) deliberately has NO PG override: it flows to the shared
    // JdbcUtils default (DecimalType(p,s)) — exercised live on Derby below
    assert(pg.getCatalystType(java.sql.Types.NUMERIC, "numeric", 10, md).isEmpty)
  }

  test("pushed-filter literal compilation is PG-safe") {
    assert(pg.compileValue("it's") == "'it''s'") // quote doubling, no backslash escapes
    assert(pg.compileValue(java.sql.Timestamp.valueOf("2020-03-04 05:06:07")) ==
      "'2020-03-04 05:06:07.0'")
    assert(pg.compileValue(java.sql.Date.valueOf("2020-03-04")) == "'2020-03-04'")
  }

  // -- the shared JDBC read path, live (Derby = same JdbcUtils code) ----

  test("numeric(10,2) reads as DecimalType(10,2), timestamp as microsecond TimestampType") {
    val url = "jdbc:derby:memory:graftpgdialect;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("create table typed_probe (amount numeric(10,2), ts timestamp)")
      st.execute("insert into typed_probe values (12345678.91, timestamp('2020-03-04 05:06:07.123456'))")
    } finally conn.close()
    val df = spark.read.jdbc(url, "typed_probe", new java.util.Properties())
    val byName = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(byName("amount") == DecimalType(10, 2))
    assert(byName("ts") == TimestampType)
    val row = df.head()
    assert(row.getDecimal(0).toPlainString == "12345678.91")
    // microsecond precision survives the JDBC read (PG timestamps are µs)
    assert(row.getTimestamp(1).getNanos == 123456000)
  }
}
