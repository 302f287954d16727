package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Protocol-level reader for the transaction log [[VersionedStore.exportDeltaLog]]
  * emits — and for any log with the same public Delta shape. It knows
  * NOTHING about graft's `v=K` layout or `_current` pointer: the table is
  * whatever add-minus-remove replay of `_delta_log/` says it is, which is
  * exactly the contract an external Delta reader holds, so round-tripping
  * through this reader certifies the export end-to-end.
  *
  * Replay is O(live files + JSON tail), not O(history): the newest
  * `<v>.checkpoint.parquet` at-or-below the target version seeds the live
  * set and only later JSON versions replay on top ([[graft.DeltaLogSpec]]
  * proves the pre-checkpoint JSONs are genuinely unread by deleting
  * them). Actions resolve Spark-side — schema-declared JSON scan, version
  * recovered from the 20-digit file name, latest action per path wins —
  * so a million-file log replays as a plan, not a driver loop; only the
  * final live file LIST collects (metadata-sized, the same boundary real
  * Delta crosses handing paths to the scan). A log whose head has been
  * truncated past its newest usable checkpoint fails loudly as a gap —
  * never a silently partial table.
  *
  * Partition columns are restored from the log's `partitionValues` (cast
  * per the declared schema — never inferred from directory shapes), and
  * [[readWhere]] turns the log's per-file stats into PLANNING-TIME file
  * skipping: files whose `[min,max]` interval cannot intersect the
  * predicate range are never opened — the log as a file-level index, the
  * thing that makes a 100 TB range query read megabytes when the layout
  * (partitioning, Z-order, range-sorted compaction) keeps per-file ranges
  * tight. Files without stats are conservatively kept.
  *
  * `asOf` time-travels to an exported log version (0-based, per the Delta
  * convention — distinct from graft's 1-based pointer versions).
  */
object DeltaLogReader {

  private val actionSchema: StructType = StructType.fromDDL(
    """protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>,
      |metaData STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>,
      |add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN, stats: STRING>,
      |remove STRUCT<path: STRING, dataChange: BOOLEAN>""".stripMargin.replace("\n", " "))

  private val statsSchema =
    "struct<numRecords: bigint, minValues: map<string,string>, maxValues: map<string,string>>"

  /** One live data file after replay: absolute path, partition values,
    * per-file stats JSON (null when the log carries none).
    */
  private[graft] final case class LiveFile(
      path: String, pv: Map[String, String], stats: String)

  private[graft] final case class LogState(
      live: Seq[LiveFile], schema: StructType, partCols: Seq[String])

  def read(spark: SparkSession, tableDir: String, asOf: Option[Long] = None): DataFrame = {
    val st = resolve(spark, tableDir, asOf)
    assemble(spark, st, st.live)
  }

  /** `read(...).where(column BETWEEN lower AND upper)` with file skipping:
    * partition files prune on their `partitionValues`, data files on the
    * log's per-file min/max stats, both cast to the column's declared
    * type — files that cannot contain a match are never opened. `lower` /
    * `upper` are canonical-string literals of the column's type.
    */
  def readWhere(spark: SparkSession, tableDir: String, column: String,
      lower: String, upper: String, asOf: Option[Long] = None): DataFrame = {
    val st = resolve(spark, tableDir, asOf)
    val kept = pruneFiles(spark, st, column, lower, upper)
    val t = st.schema(column).dataType
    assemble(spark, st, kept)
      .where(col(column).between(lit(lower).cast(t), lit(upper).cast(t)))
  }

  /** The skipping decision alone (spec hook): live files that may contain
    * `column ∈ [lower, upper]`.
    */
  private[graft] def pruneFiles(spark: SparkSession, st: LogState,
      column: String, lower: String, upper: String): Seq[LiveFile] = {
    val t = st.schema(column).dataType
    if (st.partCols.contains(column)) {
      import spark.implicits._
      val keep = st.live.map(lf => (lf.path, lf.pv.get(column).orNull))
        .toDF("path", "w")
        .where(col("w").isNull ||
          !(col("w").cast(t) < lit(lower).cast(t) || col("w").cast(t) > lit(upper).cast(t)))
        .select("path").as[String].collect().toSet
      st.live.filter(lf => keep.contains(lf.path))
    } else {
      // parse each file's stats once, driver-side relation is file-count
      // sized; comparisons run in the column's declared type
      import spark.implicits._
      val withStats = st.live.filter(_.stats != null)
      val keepPaths: Set[String] =
        if (withStats.isEmpty) Set.empty
        else withStats.map(lf => (lf.path, lf.stats)).toDF("path", "stats")
          .withColumn("s", from_json(col("stats"),
            DataType.fromDDL(statsSchema).asInstanceOf[StructType]))
          .withColumn("mn", element_at(col("s.minValues"), column).cast(t))
          .withColumn("mx", element_at(col("s.maxValues"), column).cast(t))
          .where(col("mn").isNull || col("mx").isNull ||
            !(col("mx") < lit(lower).cast(t) || col("mn") > lit(upper).cast(t)))
          .select("path").as[String].collect().toSet
      st.live.filter(lf => lf.stats == null || keepPaths.contains(lf.path))
    }
  }

  /** Replay the log to its live state at `asOf` (default: latest). */
  private[graft] def resolve(spark: SparkSession, tableDir: String,
      asOf: Option[Long]): LogState = {
    val logDir = new Path(tableDir, "_delta_log")
    val f = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(logDir), s"$tableDir has no _delta_log")
    val names = f.listStatus(logDir).map(_.getPath.getName)

    def ver(n: String, suffix: String): Option[Long] =
      if (n.length == 20 + suffix.length && n.endsWith(suffix) &&
        n.take(20).forall(_.isDigit)) Some(n.take(20).toLong) else None
    val jsonVers = names.flatMap(ver(_, ".json")).sorted.toSeq
    val cpVers = names.flatMap(ver(_, ".checkpoint.parquet")).sorted.toSeq
    val latest = (jsonVers ++ cpVers).maxOption
      .getOrElse(sys.error(s"$logDir contains no log entries"))
    val upTo = asOf.getOrElse(latest)
    require(upTo >= 0 && (jsonVers.contains(upTo) || cpVers.contains(upTo)),
      s"$tableDir: log version $upTo does not exist (latest is $latest)")

    // base state + the JSON tail that replays on top of it; without a
    // checkpoint the log must reach back to version 0 — a truncated head
    // is a GAP, not an empty prefix
    val cp = cpVers.filter(_ <= upTo).maxOption
    val tail = jsonVers.filter(v => v <= upTo && cp.forall(v > _))
    val expected = cp.map(_ + 1).getOrElse(0L)
    require(tail == (expected to upTo),
      s"$tableDir: log gap — need versions $expected..$upTo after checkpoint $cp, have $tail")

    def cpDf(v: Long): DataFrame =
      spark.read.parquet(new Path(logDir, f"$v%020d.checkpoint.parquet").toString)
    val tailDf = if (tail.isEmpty) None else Some {
      spark.read.schema(actionSchema)
        .json(tail.map(v => new Path(logDir, f"$v%020d.json").toString): _*)
        .withColumn("v", regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
    }

    // live set: checkpoint seed ∪ tail adds/removes, latest action per
    // path wins (exports never add+remove one path in the same version,
    // so (path, v) is unique and max_by is exact); each surviving add
    // carries its partitionValues and stats — both live in the LOG, not
    // in the data files, per the Delta convention
    val noPv = lit(null).cast("map<string,string>")
    def adds(df: DataFrame, v: Column) = df.where(col("add").isNotNull)
      .select(col("add.path").as("path"), v.as("v"), lit(true).as("alive"),
        col("add.partitionValues").as("pv"), col("add.stats").as("stats"))
    val seed = cp.map(v => adds(cpDf(v), lit(v)))
    val deltas = tailDf.map(raw => adds(raw, col("v"))
      .unionAll(raw.where(col("remove").isNotNull)
        .select(col("remove.path").as("path"), col("v"), lit(false).as("alive"),
          noPv, lit(null).cast("string"))))
    val live = (seed.toSeq ++ deltas.toSeq).reduce(_ unionAll _)
      .groupBy("path")
      .agg(max_by(struct(col("alive"), col("pv"), col("stats")), col("v")).as("last"))
      .where(col("last.alive"))
      .select(col("path"), col("last.pv").as("pv"), col("last.stats").as("stats"))
      .collect()
      .map(r => LiveFile(new Path(tableDir, r.getString(0)).toString,
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
        r.getString(2)))
      .sortBy(_.path).toSeq

    // declared schema + partition columns from the newest metaData ≤ upTo:
    // an empty table still scans typed, and the snapshot's exact schema
    // wins over footer merging across file vintages
    val meta = tailDf.flatMap {
      _.where(col("metaData").isNotNull).orderBy(col("v").desc)
        .select("metaData.schemaString", "metaData.partitionColumns").limit(1)
        .collect().headOption
    }.orElse(cp.flatMap(v => cpDf(v).where(col("metaData").isNotNull)
      .select("metaData.schemaString", "metaData.partitionColumns").limit(1)
      .collect().headOption))
      .getOrElse(sys.error(s"$tableDir: no metaData action at or below version $upTo"))
    LogState(live,
      DataType.fromJson(meta.getString(0)).asInstanceOf[StructType],
      Option(meta.getSeq[String](1)).map(_.toSeq).getOrElse(Nil))
  }

  /** Scan `files` with the declared schema, partition columns restored
    * from the log's partitionValues — one scan per distinct partition
    * tuple, never inferred from directory shapes.
    */
  private def assemble(spark: SparkSession, st: LogState,
      files: Seq[LiveFile]): DataFrame = {
    val dataSchema = StructType(st.schema.filterNot(fld => st.partCols.contains(fld.name)))
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), st.schema)
    else files.groupBy(_.pv).toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (pv, group) =>
        val df = spark.read.schema(dataSchema).parquet(group.map(_.path): _*)
        val full = st.partCols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, lit(pv.getOrElse(c, null)).cast(st.schema(c).dataType))
        }
        full.select(st.schema.fieldNames.toIndexedSeq.map(col): _*)
      }
      .reduce(_ unionAll _)
  }
}
