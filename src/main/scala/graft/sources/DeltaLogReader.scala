package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * `asOf` time-travels to an exported log version (0-based, per the Delta
  * convention — distinct from graft's 1-based pointer versions).
  */
object DeltaLogReader {

  private val actionSchema: StructType = StructType.fromDDL(
    """protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>,
      |metaData STRUCT<id: STRING, schemaString: STRING, partitionColumns: ARRAY<STRING>>,
      |add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN>,
      |remove STRUCT<path: STRING, dataChange: BOOLEAN>""".stripMargin.replace("\n", " "))

  def read(spark: SparkSession, tableDir: String, asOf: Option[Long] = None): DataFrame = {
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
    // carries its partitionValues — partition columns live in the LOG,
    // not in the data files' footers, per the Delta convention
    val noPv = lit(null).cast("map<string,string>")
    val seed = cp.map(v => cpDf(v).where(col("add").isNotNull)
      .select(col("add.path").as("path"), lit(v).as("v"), lit(true).as("alive"),
        col("add.partitionValues").as("pv")))
    val deltas = tailDf.map(raw =>
      raw.where(col("add").isNotNull)
        .select(col("add.path").as("path"), col("v"), lit(true).as("alive"),
          col("add.partitionValues").as("pv"))
        .unionAll(raw.where(col("remove").isNotNull)
          .select(col("remove.path").as("path"), col("v"), lit(false).as("alive"), noPv)))
    val live = (seed.toSeq ++ deltas.toSeq).reduce(_ unionAll _)
      .groupBy("path").agg(max_by(struct(col("alive"), col("pv")), col("v")).as("last"))
      .where(col("last.alive")).select(col("path"), col("last.pv").as("pv"))
      .collect()
      .map(r => (new Path(tableDir, r.getString(0)).toString,
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty[String, String])))
      .sortBy(_._1).toSeq

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
    val schema = DataType.fromJson(meta.getString(0)).asInstanceOf[StructType]
    val partCols: Seq[String] =
      Option(meta.getSeq[String](1)).map(_.toSeq).getOrElse(Nil)
    val dataSchema = StructType(schema.filterNot(fld => partCols.contains(fld.name)))

    if (live.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else {
      // one scan per distinct partition tuple, partition columns restored
      // from the log's partitionValues and cast to the declared types —
      // never inferred from directory shapes
      live.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
        .map { case (pv, group) =>
          val df = spark.read.schema(dataSchema).parquet(group.map(_._1): _*)
          val full = partCols.foldLeft(df) { (acc, c) =>
            acc.withColumn(c, lit(pv.getOrElse(c, null)).cast(schema(c).dataType))
          }
          full.select(schema.fieldNames.toIndexedSeq.map(col): _*)
        }
        .reduce(_ unionAll _)
    }
  }
}
