package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink format coverage beyond parquet: CSV and JSON-lines write →
  * read → aggregate round-trips. The reference's only format is parquet
  * (img/YQLink2.png); a usable engine must also ingest the interchange
  * formats raw corpora arrive in. Values are carried in exact
  * representations (longs, strings, integer cents) so the text round-trip
  * is lossless and the DuckDB oracle — which reads the original parquet —
  * must agree bit-for-bit with the round-tripped result.
  *
  * Scale note: both formats read splittable here (CSV uncompressed,
  * JSON-lines) so a 100 TB ingest parallelizes per-block like parquet;
  * schemas are declared, never inferred — inference would scan the data
  * twice and race against schema drift.
  */
object FormatQueries {

  /** Per-JVM scratch root, deleted on normal JVM exit. Round-trip scratch
    * lives under one unique-per-process directory so two drivers on the
    * same host (sbt test overlapping tools/check.py) can never race each
    * other's overwrite-deletes against in-flight reads (r15 review
    * finding); the shutdown hook keeps repeated gate/bench runs from
    * accumulating copies (only a SIGKILLed JVM leaks, and at most one
    * copy per query per corpus).
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = Files.createTempDirectory("graft-fmt-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p
  }

  /** Deterministic per-(format, corpus) scratch dir under [[scratchRoot]].
    * Every writer here uses mode("overwrite"), so one path per
    * (prefix, corpus dir) keeps round-trip scratch space BOUNDED — one
    * table copy per query per corpus per JVM — where a fresh
    * createTempDirectory per call leaked a copy per INVOCATION (min-of-N
    * benches and probes re-invoke every query: the ×1000 probe's f2 reps
    * left 2 × 10 GB of JSON in /tmp and ran the host out of disk, r15).
    * Within one JVM the drivers run queries sequentially (Verify/Bench
    * loops; forked scalatest runs suites in one JVM), so reuse is
    * race-free by construction.
    */
  private def tmp(prefix: String, dir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    val p = scratchRoot.resolve(s"$prefix-$key")
    Files.createDirectories(p)
    p.toString
  }

  /** f1: nation → CSV (header, quoted strings) → declared-schema read →
    * join region → per-region nation count. The CSV reader must survive
    * commas inside quoted text fields.
    */
  def f1CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-csv", dir)
    Tables.nation(spark, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    val nation = spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .option("header", "true").csv(out)
    nation.join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  val f1Oracle: String =
    """SELECT r_name, count(1) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** f2: orders (cents-encoded price) → JSON lines → declared-schema read →
    * per-priority totals. Money as integer cents: exact in text, exact in
    * the sum, exact vs the oracle.
    */
  def f2JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-json", dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .write.mode("overwrite").json(out)
    spark.read
      .schema("o_orderkey BIGINT, o_orderpriority STRING, cents BIGINT")
      .json(out)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      .orderBy("o_orderpriority")
  }

  val f2Oracle: String =
    """SELECT o_orderpriority, count(1) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** f3: parquet schema evolution — the long-lived-dataset reality: an old
    * writer produced (o_orderkey, cents), a newer writer added a `chan`
    * column; readers must see the union schema with NULLs for the old
    * files. `mergeSchema` unions footers at planning time; per-file
    * ReadSchema still prunes to the requested columns, so evolution costs
    * footer metadata, not data. Batch-count columns prove which rows came
    * through which schema vintage.
    */
  def f3SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-evo", dir)
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    orders.where(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "cents")
      .write.mode("overwrite").parquet(s"$out/v1")
    orders.where(col("o_orderkey") % 2 === 1)
      .withColumn("chan", concat(lit("ch"), (col("o_orderkey") % 3).cast("string")))
      .select("o_orderkey", "cents", "chan")
      .write.mode("overwrite").parquet(s"$out/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
      .groupBy(coalesce(col("chan"), lit("legacy")).as("chan"))
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      .orderBy("chan")
  }

  val f3Oracle: String =
    """WITH t AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |         CASE WHEN o_orderkey % 2 = 1 THEN 'ch' || CAST(o_orderkey % 3 AS VARCHAR)
      |              ELSE 'legacy' END AS chan
      |  FROM orders)
      |SELECT chan, count(1) AS n_orders, CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** f4: ORC round-trip — the other splittable columnar format big estates
    * carry; same exact-representation discipline as f2 (integer cents), so
    * the parquet-reading oracle must agree bit-for-bit.
    */
  def f4OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-orc", dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  val f4Oracle: String =
    """SELECT o_orderstatus, count(1) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** f7: Avro round-trip — the row-oriented interchange format every
    * Kafka-fed ingestion tier speaks (Spark 4 bundles the avro source in
    * spark-sql; no external package). Same exactness discipline as
    * f1/f4: prices cross the format boundary as integer cents, and the
    * oracle computes the aggregate straight from the original parquet, so
    * a hash match certifies write → read fidelity. This distribution
    * bundles the avro classes in spark-sql WITHOUT the service-registry
    * entry (the short name "avro" is in the separate spark-avro artifact),
    * so the source is addressed by its implementation class — the
    * documented fallback `DataSource.lookupDataSource` supports. Scale note: avro is
    * splittable (block-compressed container) but ROW-oriented — fine for
    * the ingest hop it models, wrong for analytic scans; the pipeline's
    * first move is always a columnar rewrite (f1's CSV note applies).
    */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  def f7AvroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-avro", dir)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .write.mode("overwrite").format(AvroFmt).save(out)
    spark.read.format(AvroFmt).load(out)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum("cents").as("total_cents"))
      .orderBy("l_returnflag")
  }

  val f7Oracle: String =
    """SELECT l_returnflag, count(1) AS n_items,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** f5: semi-structured VARIANT ingestion — the modern JSON-lake shape
    * (Spark 4's `VariantType`). Orders become nested JSON payloads,
    * `parse_json` turns them into a VARIANT column, the column round-trips
    * through parquet in its binary variant encoding, and typed fields come
    * back out with `variant_get` path extraction (top-level + nested
    * object) to drive a plain aggregate. The oracle computes the same
    * aggregate straight from the original parquet, so a hash match
    * certifies the whole parse → shred → store → extract path. Values
    * stay exact (longs, strings): nothing float crosses the text
    * boundary.
    *
    * Scale note: VARIANT parquet is splittable and columnar like any other
    * column; extraction is per-row expression work inside codegen — no
    * shuffle is added over the equivalent typed pipeline.
    */
  def f5VariantExtract(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-variant", dir)
    Tables.orders(spark, dir)
      .select(to_json(struct(
        col("o_orderkey").as("id"),
        col("o_orderpriority").as("prio"),
        struct(col("o_custkey").as("cust"),
          round(col("o_totalprice") * 100).cast("long").as("cents")).as("payment")))
        .as("payload"))
      .select(parse_json(col("payload")).as("v"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .select(
        expr("variant_get(v, '$.prio', 'string')").as("prio"),
        expr("variant_get(v, '$.payment.cents', 'bigint')").as("cents"),
        expr("variant_get(v, '$.id', 'bigint')").as("id"))
      .groupBy("prio")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"),
        max("id").as("max_key"))
      .orderBy("prio")
  }

  val f5Oracle: String =
    """SELECT o_orderpriority AS prio, count(1) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |       max(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** f6: ecosystem-table-format round-trip, certified end-to-end by the
    * oracle computing from the ORIGINAL parquet: documents land in a
    * [[graft.sources.VersionedStore]] as two committed snapshots (evens,
    * then all), the store exports its Delta-shape transaction log WITH
    * checkpoints, and [[graft.sources.DeltaLogReader]] — which knows only
    * the public log protocol, not graft's layout — reads both the live
    * table and the `asOf=0` time-travel snapshot back. A hash match means
    * the exported log names exactly the right file set at every version.
    */
  def f6DeltaRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // fresh store per call: the two-snapshot history IS the fixture, so
    // the deterministic scratch dir is wiped rather than overwritten
    // (appending snapshots per invocation would grow disk per call)
    val base = tmp("graft-delta", dir) + "/t"
    val hp = new org.apache.hadoop.fs.Path(base)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    val st = new graft.sources.VersionedStore(base)
    val docs = Tables.documents(spark, dir)
    st.write(spark, docs.where(col("doc_id") % 2 === 0))
    st.write(spark, docs)
    st.exportDeltaLog(spark, checkpointEvery = 1)
    val full = graft.sources.DeltaLogReader.read(spark, st.base)
    val v0 = graft.sources.DeltaLogReader.read(spark, st.base, asOf = Some(0L))
    full.agg(count(lit(1)).cast("long").as("full_docs"),
        sum(col("n_chars")).cast("long").as("full_chars"))
      .crossJoin(v0.agg(count(lit(1)).cast("long").as("v0_docs"),
        sum(col("n_chars")).cast("long").as("v0_chars")))
  }

  val f6Oracle: String =
    """SELECT
      |  (SELECT CAST(count(1) AS BIGINT) FROM documents) AS full_docs,
      |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS full_chars,
      |  (SELECT CAST(count(1) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS v0_docs,
      |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS v0_chars""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f6_delta_roundtrip" -> (f6DeltaRoundtrip _),
    "f5_variant_extract" -> (f5VariantExtract _),
    "f1_csv_roundtrip" -> (f1CsvRoundtrip _),
    "f2_json_roundtrip" -> (f2JsonRoundtrip _),
    "f3_schema_evolution" -> (f3SchemaEvolution _),
    "f4_orc_roundtrip" -> (f4OrcRoundtrip _),
    "f7_avro_roundtrip" -> (f7AvroRoundtrip _))

  val oracles: Map[String, String] = Map(
    "f6_delta_roundtrip" -> f6Oracle,
    "f5_variant_extract" -> f5Oracle,
    "f1_csv_roundtrip" -> f1Oracle,
    "f2_json_roundtrip" -> f2Oracle,
    "f3_schema_evolution" -> f3Oracle,
    "f4_orc_roundtrip" -> f4Oracle,
    "f7_avro_roundtrip" -> f7Oracle)
}
