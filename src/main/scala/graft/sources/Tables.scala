package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test corpus (`TESTDATA.md`): one parquet file per
  * table under a scale-factor directory. All reads go through `spark.read
  * .parquet` so Catalyst's column pruning / filter pushdown reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else memoLoad(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))

  /** Relation-handle memo: `spark.read.parquet` pays a fresh file listing
    * plus a footer schema read on EVERY call, and every query construction
    * calls it for each table it touches (the y-family re-registers all ten
    * views per run). The memo key carries the session identity and the
    * [[manifestFingerprint]] (one driver-side listing, no footer opens), so
    * a rewritten table re-resolves — the same staleness rule [[fitKey]]
    * already applies to model memos. This memoizes a LOGICAL relation
    * (schema + file index), never data or results: execution still scans
    * the parquet files on every invocation.
    *
    * Keys carry `sessionUUID` — unique and never reused, unlike
    * `identityHashCode`, whose collision with a later session could serve a
    * relation bound to a STOPPED session's confs (r17 advice). Entries whose
    * context has stopped are purged on every miss, so the memo can neither
    * grow without bound across test sessions nor pin dead sessions.
    */
  private val loadMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  private def memoLoad(spark: SparkSession, dir: String, name: String)
      (mk: => DataFrame): DataFrame = {
    val uuid = org.apache.spark.sql.GraftCacheBridge.sessionUUID(spark)
    val key = s"$uuid|$dir|$name|${manifestFingerprint(spark, dir, name)}"
    val hit = loadMemo.get(key)
    if (hit != null) hit._2
    else {
      loadMemo.forEach((k, v) => if (v._1.sparkContext.isStopped) loadMemo.remove(k, v))
      loadMemo.computeIfAbsent(key, _ => (spark, mk))._2
    }
  }

  /** Exact row count from parquet FOOTER metadata — driver-side file-meta
    * reads, no Spark job, no data pages touched. The stand-in for the
    * table-manifest row count a production catalog carries: sizing
    * decisions (k selection, partition counts) should read the manifest,
    * never pay a count() scan over the corpus.
    */
  def rowCountFromFooters(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Array(p)
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Cheap manifest fingerprint of a corpus table — file names, lengths and
    * modification times from one driver-side listing (no footer opens, no
    * Spark job). The stand-in for a production catalog's table version:
    * anything memoizing a fit over the table keys on this, never on the
    * path alone.
    */
  def manifestFingerprint(spark: SparkSession, dir: String, name: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
      else Array(st)
    files.map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString(";")
  }

  /** Memo key for a per-JVM fit over `dir/name`: `dir|fingerprint`. A
    * rewrite of the table under the same path changes the key, so the memo
    * retrains instead of silently serving centroids/weights fit on the old
    * data. On a fingerprint CHANGE this also refreshes Spark's cached
    * relations over the path — cached scans match on root path alone
    * (`InMemoryFileIndex` equality), so without the refresh the retrain
    * would read the stale cached snapshot rather than the new files.
    */
  def fitKey(spark: SparkSession, dir: String, name: String): String = {
    val fp = manifestFingerprint(spark, dir, name)
    val prev = fpSeen.put(s"$dir/$name", fp)
    if (prev != null && prev != fp) spark.catalog.refreshByPath(s"$dir/$name.parquet")
    s"$dir|$fp"
  }
  private val fpSeen = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Normalize `events.ts` to session-zoned TIMESTAMP whatever the driver
    * wrote this round: TIMESTAMP(NANOS) parquet arrives as raw nanos longs
    * (via the `nanosAsLong` legacy flag — Spark's vectorized reader rejects
    * nanos) and is truncated to micros, exactly the truncation DuckDB
    * applies; TIMESTAMP(MICROS) without a zone arrives as TIMESTAMP_NTZ and
    * is re-tagged (a no-op on the stored micros under the pinned UTC session
    * zone, which is also how DuckDB reads it).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    memoLoad(spark, dir, "events")(
      normalizeEventTs(spark.read.parquet(s"$dir/events.parquet")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every corpus table as a temp view so `spark.sql` text can
    * address them by bare name — the Spark analog of the reference's single
    * federated SQL namespace (SURVEY.md §1.3).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
