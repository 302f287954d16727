package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaLogReader, VersionedStore}

/** The exported transaction log read back through the PROTOCOL, not the
  * layout: [[DeltaLogReader]] replays checkpoint + JSON tail and never
  * touches `_current` or the `v=K` convention, so these tests certify
  * that an external Delta-shape reader sees the right table at every
  * version — and that checkpoints make replay O(tail), proven by deleting
  * the pre-checkpoint history outright.
  */
class DeltaLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshStore() =
    new VersionedStore(Files.createTempDirectory("graft-dlog").toString + "/t")

  private def sumN(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(sum("n")).head.getLong(0)

  test("protocol replay matches the store at every version; asOf time-travels") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))
    st.write(spark, (1 to 50).toDF("n").repartition(3))
    st.write(spark, (1 to 7).toDF("n"))
    st.exportDeltaLog(spark)

    val live = DeltaLogReader.read(spark, st.base)
    assert(live.schema == st.read(spark).schema)
    assert(live.count() == 7 && sumN(live) == 28L)
    // 0-based log versions map onto the addressable 1-based store versions
    assert(sumN(DeltaLogReader.read(spark, st.base, asOf = Some(0L))) == 5050L)
    assert(sumN(DeltaLogReader.read(spark, st.base, asOf = Some(1L))) == 1275L)
    // a version the log does not carry refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaLogReader.read(spark, st.base, asOf = Some(9L))
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("checkpoint: written on the interval, read as the seed, replay is O(tail) — pre-checkpoint JSONs deleted") {
    import spark.implicits._
    val st = freshStore()
    (1 to 5).foreach(i => st.write(spark, (1 to i * 10).toDF("n")))
    st.exportDeltaLog(spark, checkpointEvery = 2) // checkpoints at log v=1, v=3

    val logDir = new java.io.File(s"${st.base}/_delta_log")
    val cps = logDir.listFiles.map(_.getName).filter(_.endsWith(".checkpoint.parquet")).sorted
    assert(cps.toSeq == Seq(f"${1L}%020d.checkpoint.parquet", f"${3L}%020d.checkpoint.parquet"),
      s"expected checkpoints at log versions 1 and 3, got ${cps.toSeq}")
    val lastCp = new String(Files.readAllBytes(new java.io.File(logDir, "_last_checkpoint").toPath))
    assert(lastCp.contains("\"version\":3"))

    // replay from the newest checkpoint only: delete the pre-checkpoint
    // history (JSONs 0-1 and the older checkpoint); the live read and any
    // asOf at/above the surviving checkpoint must not notice
    Seq(0, 1).foreach { v =>
      assert(new java.io.File(logDir, f"$v%020d.json").delete())
    }
    assert(new java.io.File(logDir, f"${1L}%020d.checkpoint.parquet").delete())
    val live = DeltaLogReader.read(spark, st.base) // seeds at cp v=3, replays v=4
    assert(live.count() == 50 && sumN(live) == 1275L)
    assert(sumN(DeltaLogReader.read(spark, st.base, asOf = Some(3L))) == 820L)

    // but a version below the surviving checkpoint whose prefix is gone is
    // a loud gap (JSON 2 exists, 0-1 do not), never a silently partial table
    val gap = intercept[IllegalArgumentException] {
      DeltaLogReader.read(spark, st.base, asOf = Some(2L))
    }
    assert(gap.getMessage.contains("gap"))
  }

  test("partitioned snapshots: export carries partitionValues, protocol read restores partition columns from the log") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, spark.range(100).select(col("id").as("n"), (col("id") % 4).as("cid")),
      partitionBy = Seq("cid"))
    st.write(spark, spark.range(40).select(col("id").as("n"), (col("id") % 2).as("cid")),
      partitionBy = Seq("cid"))
    st.exportDeltaLog(spark, checkpointEvery = 1)

    // the log declares the partitioning and each add carries its values
    val log0 = new String(Files.readAllBytes(
      new java.io.File(s"${st.base}/_delta_log", "0" * 20 + ".json").toPath))
    assert(log0.contains(""""partitionColumns":["cid"]"""))
    assert(log0.contains(""""partitionValues":{"cid":"3"}"""))

    // protocol read ≡ the store's own read, partition column restored with
    // the declared type and values (from the log, not directory shapes)
    val live = DeltaLogReader.read(spark, st.base)
    assert(live.schema == st.read(spark).schema)
    assert(live.exceptAll(st.read(spark)).isEmpty && st.read(spark).exceptAll(live).isEmpty)
    assert(live.count() == 40 && live.where(col("cid") === 3).count() == 0)
    val v0 = DeltaLogReader.read(spark, st.base, asOf = Some(0L))
    assert(v0.count() == 100 && v0.where(col("cid") === 3).count() == 25)
  }

  test("per-file stats in the log drive planning-time file skipping on range-laid-out snapshots") {
    import spark.implicits._
    val st = freshStore()
    // range-sorted layout → near-disjoint per-file n ranges: exactly what
    // range-compaction / Z-order buys, and what makes log stats selective
    st.write(spark, spark.range(1000).select(col("id").as("n"))
      .repartitionByRange(10, col("n")))
    st.exportDeltaLog(spark)

    val log0 = new String(Files.readAllBytes(
      new java.io.File(s"${st.base}/_delta_log", "0" * 20 + ".json").toPath))
    // stats is a STRING field whose content is JSON (the Delta form), so
    // the inner quotes appear escaped in the log line
    assert(log0.contains("""\"numRecords\"""") && log0.contains("""\"minValues\":{\"n\""""),
      s"adds must carry per-file stats:\n${log0.take(500)}")

    val state = DeltaLogReader.resolve(spark, st.base, None)
    assert(state.live.size == 10)
    assert(state.live.forall(_.stats != null))
    val kept = DeltaLogReader.pruneFiles(spark, state, "n", "100", "199")
    assert(kept.size <= 3 && kept.nonEmpty,
      s"a 10%-range predicate over a range layout must prune most files, kept ${kept.size}/10")

    // skipping never changes the answer
    val a = DeltaLogReader.readWhere(spark, st.base, "n", "100", "199")
    val b = DeltaLogReader.read(spark, st.base).where(col("n").between(100, 199))
    assert(a.count() == 100 && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("OPTIMIZE through the export: compaction lands as remove+add in one log version, stats refresh, skipping improves") {
    import spark.implicits._
    val st = freshStore()
    // hash-scattered layout: every file spans ~the full n range, so the
    // exported stats can skip NOTHING — the regime OPTIMIZE exists for
    st.write(spark, spark.range(1000)
      .select(col("id").as("n"), md5(col("id").cast("string")).as("scatter"))
      .repartition(10, col("scatter"))
      .select("n"))
    st.exportDeltaLog(spark)
    val before = DeltaLogReader.resolve(spark, st.base, None)
    val keptBefore = DeltaLogReader.pruneFiles(spark, before, "n", "100", "199")
    assert(before.live.size == 10)
    assert(keptBefore.size == 10, // the motivating failure: zero skipping
      s"scattered layout should defeat stats skipping, kept ${keptBefore.size}/10")

    // OPTIMIZE: cluster by n, re-export (the log is derived state)
    st.optimizeCurrent(spark, orderBy = Seq("n"), targetBytes = 4096)
    st.exportDeltaLog(spark)

    // the compacted snapshot is ONE committed log version carrying a
    // remove for every prior file and stats-bearing adds for the new ones
    val log1 = new String(Files.readAllBytes(
      new java.io.File(s"${st.base}/_delta_log", "0" * 19 + "1.json").toPath))
    val removes = log1.linesIterator.count(_.contains("\"remove\""))
    val adds = log1.linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(removes == 10, s"expected 10 removes in the optimize version, got $removes")
    assert(adds.nonEmpty && adds.forall(_.contains("""\"minValues\"""")),
      "every optimized add must carry refreshed stats")

    // replay reads identical data...
    val replay = DeltaLogReader.read(spark, st.base)
    assert(replay.count() == 1000 && sumN(replay) == 499500L)
    // ...and the SAME predicate now skips most files, absolutely and as a
    // fraction of the live set
    val after = DeltaLogReader.resolve(spark, st.base, None)
    val keptAfter = DeltaLogReader.pruneFiles(spark, after, "n", "100", "199")
    assert(after.live.size > 1, "targetBytes should have produced multiple files")
    assert(keptAfter.size < keptBefore.size,
      s"skipping must improve after OPTIMIZE: kept ${keptAfter.size} vs ${keptBefore.size}")
    assert(keptAfter.size.toDouble / after.live.size < keptBefore.size.toDouble / before.live.size,
      s"kept fraction must drop: ${keptAfter.size}/${after.live.size} vs ${keptBefore.size}/${before.live.size}")

    // skipping never changes the answer on the optimized table
    val a = DeltaLogReader.readWhere(spark, st.base, "n", "100", "199")
    assert(a.count() == 100 && a.exceptAll(replay.where(col("n").between(100, 199))).isEmpty)
  }

  test("Z-ordered snapshot + log stats: a narrow predicate on EITHER dimension skips most files") {
    import spark.implicits._
    val st = freshStore()
    val df = spark.range(16384)
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    st.write(spark, graft.operators.ZOrder.cluster(df, "x", "y", nFiles = 16))
    st.exportDeltaLog(spark)

    val state = DeltaLogReader.resolve(spark, st.base, None)
    assert(state.live.size == 16)
    // a 1/8-range predicate: with a z-curve layout every file holds a
    // BOUNDED range in x AND in y, so both dimensions prune (a plain
    // x-sort would prune x only and keep all 16 files for y)
    val kx = DeltaLogReader.pruneFiles(spark, state, "x", "0", "15")
    val ky = DeltaLogReader.pruneFiles(spark, state, "y", "0", "15")
    assert(kx.size <= 8 && ky.size <= 8,
      s"z-order must bound both dimensions: x kept ${kx.size}/16, y kept ${ky.size}/16")

    val a = DeltaLogReader.readWhere(spark, st.base, "y", "0", "15")
    val b = DeltaLogReader.read(spark, st.base).where(col("y").between(0, 15))
    assert(a.count() == 16 * 128 && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("readWhere prunes partition files via the log's partitionValues") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, spark.range(400).select(col("id").as("n"), (col("id") % 4).as("cid")),
      partitionBy = Seq("cid"))
    st.exportDeltaLog(spark)

    val state = DeltaLogReader.resolve(spark, st.base, None)
    val kept = DeltaLogReader.pruneFiles(spark, state, "cid", "2", "2")
    assert(kept.nonEmpty && kept.forall(_.pv("cid") == "2") &&
      kept.size < state.live.size)

    val a = DeltaLogReader.readWhere(spark, st.base, "cid", "2", "2")
    assert(a.count() == 100 && a.where(col("cid") =!= 2).count() == 0)
  }

  test("vacuumed store re-exports a log whose replay still matches the survivors") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))
    st.write(spark, (1 to 50).toDF("n"))
    st.write(spark, (1 to 7).toDF("n"))
    st.vacuum(spark, keep = 2)
    st.exportDeltaLog(spark, checkpointEvery = 1)
    assert(sumN(DeltaLogReader.read(spark, st.base)) == 28L)
    assert(sumN(DeltaLogReader.read(spark, st.base, asOf = Some(0L))) == 1275L)
  }
}
