package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.StreamingOps

/** Streaming-RUNTIME scale probe. [[ScaleProbe]] measures the batch twins;
  * this main runs the actual Structured Streaming machinery — the
  * `flatMapGroupsWithState` sessionizer, `dropDuplicatesWithinWatermark`,
  * and the stream-stream attribution join — over micro-batches of the
  * events corpus at a base SF and at `factor`× (synthesized by
  * [[ScaleProbe.synthesize]]: replicated users, so state cardinality scales
  * with the data), and records what only the runtime can show:
  *
  *  - state-store growth (`stateOperators.numRowsTotal` / `memoryUsedBytes`
  *    from query progress) — does watermark eviction actually hold state to
  *    O(active keys) at 10× the key space?
  *  - post-crash recovery: every workload is killed mid-timeline (half the
  *    chunks, `Trigger.AvailableNow` terminates, checkpoint persists) and a
  *    NEW query resumes — the second run's wall-clock includes state
  *    restore, the cost a 100 TB deployment pays on every failover.
  *
  * The source is the events parquet split into `Chunks` chronological files
  * with `maxFilesPerTrigger=1`, so micro-batches advance event time the way
  * a live stream does (watermarks move, timers fire, state evicts) instead
  * of one giant batch where the watermark only moves once at the end.
  *
  * Diagnostic, not an oracle gate (the batch≡stream twins in
  * `StreamingSpec` are the correctness proof). Results land in
  * `target/bench_stream.json`; SCALE.md §Streaming records conclusions.
  */
object StreamProbe {

  /** Chronological source chunks = micro-batches per full run. 8 gives the
    * watermark 7 chances to advance and splits cleanly for the mid-run kill.
    */
  private val Chunks = 8

  private val RunTimeoutMs: Long =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_TIMEOUT_SEC", "600").toLong * 1000L

  /** Split the on-disk events file into `Chunks` chronological single-file
    * chunks under `srcRoot`. Returns the chunk paths in timeline order.
    * The source is read through [[graft.sources.Tables.events]] so `ts` is
    * normalized to session-zoned TIMESTAMP whatever physical type the
    * corpus generation used; chunk cuts are epoch-micros quantiles, which
    * keep chunks equal-sized even though the raw file is written unsorted.
    */
  def chunkEvents(spark: SparkSession, dir: String, srcRoot: String): Seq[String] = {
    val raw = graft.sources.Tables.events(spark, dir)
      .withColumn("_tsk", unix_micros(col("ts")))
    val cuts = raw.stat.approxQuantile("_tsk", (1 until Chunks).map(_.toDouble / Chunks).toArray, 0.001)
    Files.createDirectories(Paths.get(srcRoot))
    val bounds = (Array(Long.MinValue) ++ cuts.map(_.toLong)) :+ Long.MaxValue
    (0 until Chunks).map { i =>
      val tmp = s"$srcRoot/_tmp_chunk"
      raw.where(col("_tsk") > bounds(i) && col("_tsk") <= bounds(i + 1)).drop("_tsk")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst.orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      val dest = Paths.get(f"$srcRoot/pool/chunk-$i%02d.parquet")
      Files.createDirectories(dest.getParent)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toString
    }
  }

  /** One measured streaming run over whatever chunks are in `srcDir`:
    * wall-clock, micro-batch count, max state rows/bytes over the run.
    */
  final case class RunStats(sec: Double, batches: Int, stateRows: Long, stateBytes: Long)

  private[graft] def runOnce(spark: SparkSession, name: String, srcDir: String, outDir: String,
                             ck: String, build: DataFrame => DataFrame): RunStats = {
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema(spark, srcDir))
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
    val t0 = System.nanoTime()
    val q: StreamingQuery = build(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(RunTimeoutMs)
    if (!finished) { System.err.println(s"[streamprobe] TIMEOUT: $name"); q.stop() }
    val sec = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    val rows = progs.flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
    val bytes = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes)).foldLeft(0L)(math.max)
    RunStats(sec, progs.length, rows, bytes)
  }

  /** The three stateful runtimes under probe, as stream transforms. */
  def workloads(spark: SparkSession): Seq[(String, DataFrame => DataFrame)] = {
    import spark.implicits._
    Seq(
      "sessionize" -> { ev: DataFrame =>
        StreamingOps.sessionizeStream(spark,
          ev.select("event_id", "ts", "user_id", "event_type", "value").as[StreamingOps.Event]).toDF()
      },
      "dedup" -> { ev: DataFrame => StreamingOps.dedupEvents(ev, "2 hours") },
      "attribution" -> { ev: DataFrame =>
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        val c = ev.where(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
        StreamingOps.attributionJoin(p, c, "2 hours").select("p_id", "c_id", "p_ts")
      })
  }

  /** Probe one workload at one scale: first half of the timeline, a "crash"
    * (AvailableNow terminates; checkpoint persists state), then a NEW query
    * over the full timeline — run2's clock includes state restore. Returns
    * (run1, run2, output rows).
    */
  private[graft] def probeWorkload(spark: SparkSession, tag: String, name: String,
                            chunks: Seq[String], root: String,
                            build: DataFrame => DataFrame): (RunStats, RunStats, Long) = {
    val src = s"$root/$tag/$name/src"; val out = s"$root/$tag/$name/out"
    val ck = s"$root/$tag/$name/ck"
    Files.createDirectories(Paths.get(src))
    def deliver(paths: Seq[String]): Unit = paths.foreach { p =>
      // absolute target: a RELATIVE symlink target resolves against the
      // link's own directory, so `target/...` links from inside src/ dangle
      val from = Paths.get(p).toAbsolutePath.normalize
      Files.createSymbolicLink(Paths.get(src, from.getFileName.toString), from)
    }
    val (firstHalf, secondHalf) = chunks.splitAt(Chunks / 2)
    deliver(firstHalf)
    val r1 = runOnce(spark, s"$name@$tag/1", src, out, ck, build)
    deliver(secondHalf)
    val r2 = runOnce(spark, s"$name@$tag/2", src, out, ck, build)
    val outRows = spark.read.parquet(out).count()
    (r1, r2, outRows)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val probeDir = if (args.length > 2) args(2) else s"target/sfprobe/x$factor"
    val root = "target/streamprobe"
    val spark = GraftSession.prepare(GraftSession.local("graft-stream-probe"))

    ScaleProbe.synthesize(spark, baseDir, probeDir, factor)

    val entries = for ((tag, dir) <- Seq("base" -> baseDir, s"x$factor" -> probeDir)) yield {
      val chunks = chunkEvents(spark, dir, s"$root/$tag/chunks")
      workloads(spark).map { case (name, build) =>
        val (r1, r2, rows) = probeWorkload(spark, tag, name, chunks, root, build)
        println(f"[streamprobe] $tag%-5s $name%-12s run1=${r1.sec}%7.2fs run2=${r2.sec}%7.2fs " +
          f"batches=${r1.batches + r2.batches} stateRows=${math.max(r1.stateRows, r2.stateRows)} " +
          f"stateMB=${math.max(r1.stateBytes, r2.stateBytes) / 1e6}%.1f rows=$rows")
        (tag, name, r1, r2, rows)
      }
    }
    val flat = entries.flatten
    val byName = flat.groupBy(_._2)
    val qjson = byName.toSeq.sortBy(_._1).map { case (name, rs) =>
      val parts = rs.map { case (tag, _, r1, r2, rows) =>
        s""""$tag":{"run1_sec":${r1.sec},"recovery_run_sec":${r2.sec},""" +
          s""""batches":${r1.batches + r2.batches},""" +
          s""""state_rows_max":${math.max(r1.stateRows, r2.stateRows)},""" +
          s""""state_bytes_max":${math.max(r1.stateBytes, r2.stateBytes)},"rows_out":$rows}"""
      }.mkString(",")
      s""""$name":{$parts}"""
    }.mkString("{", ",", "}")
    val total = flat.map(e => e._3.sec + e._4.sec).sum
    val line = s"""{"metric":"stream_probe_total","value":$total,"unit":"sec",""" +
      s""""factor":$factor,"chunks":$Chunks,"base":"$baseDir","scaled":"$probeDir",""" +
      s""""workloads":$qjson}"""
    println(line)
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/bench_stream.json"), line.getBytes("UTF-8"))
    spark.stop()
  }
}
