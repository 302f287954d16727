package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedStore

/** The pointer-commit snapshot store: every mutation is write-new +
  * atomic `_current` flip, so readers never observe a partial directory,
  * crashes leave only orphans (never a missing table), and compaction has
  * no rename window — the object-storage-safe path SCALE.md promises.
  */
class VersionedStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshStore() =
    new VersionedStore(Files.createTempDirectory("graft-vstore").toString + "/t")

  test("write/read roundtrip; versions increment; old snapshot intact until vacuum") {
    import spark.implicits._
    val st = freshStore()
    assert(st.currentVersion(spark) == 0L)

    val v1 = st.write(spark, (1 to 100).toDF("n"))
    assert(v1 == 1L && st.read(spark).count() == 100)

    val v2 = st.write(spark, (1 to 50).toDF("n"))
    assert(v2 == 2L && st.currentVersion(spark) == 2L)
    assert(st.read(spark).count() == 50)
    // superseded snapshot still fully present (time-travel / racing reader)
    assert(spark.read.parquet(s"${st.base}/v=1").count() == 100)

    assert(st.vacuum(spark) == Seq(1L))
    assert(st.read(spark).count() == 50)
  }

  test("compactCurrent: fewer files, same rows, no rename window") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 10000).toDF("n").repartition(64)) // synthetic small-file mess
    val filesBefore = new java.io.File(s"${st.base}/v=1")
      .listFiles.count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(filesBefore == 64)

    val v = st.compactCurrent(spark) // 10k ints ≪ 128 MB → 1 file
    assert(v == 2L)
    val filesAfter = new java.io.File(s"${st.base}/v=2")
      .listFiles.count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(filesAfter == 1, s"expected 1 compacted file, got $filesAfter")
    assert(st.read(spark).agg(sum("n")).head.getLong(0) == 50005000L)
  }

  test("partitioned snapshots: layout declared + preserved through compaction; time travel intact") {
    import spark.implicits._
    val st = freshStore()
    val v1 = st.write(spark,
      spark.range(1000).select(col("id").as("n"), (col("id") % 4).as("cid")).repartition(16),
      partitionBy = Seq("cid"))
    assert(v1 == 1L && st.partitioningOf(spark, 1L) == Seq("cid"))
    assert(st.read(spark).where(col("cid") === 2).count() == 250)
    assert(new java.io.File(s"${st.base}/v=1/cid=3").isDirectory)

    // compaction keeps the DECLARED layout (never flattens) and the content
    val v2 = st.compactCurrent(spark)
    assert(st.partitioningOf(spark, v2) == Seq("cid"))
    assert(new java.io.File(s"${st.base}/v=$v2/cid=3").isDirectory)
    val a = st.readAsOf(spark, 1L); val b = st.read(spark)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // partitioned CAS: staged tree (with subdirs) publishes atomically
    assert(st.writeIf(spark,
      spark.range(10).select(col("id").as("n"), (col("id") % 2).as("cid")),
      expectedVersion = v2, partitionBy = Seq("cid")).contains(v2 + 1))
    assert(st.read(spark).count() == 10 && st.partitioningOf(spark, v2 + 1) == Seq("cid"))
  }

  test("crashed writer leaves an orphan: reads unaffected, version never reused, vacuum GCs it") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 10).toDF("n"))

    // simulate a writer that died before the pointer flip: data dir
    // exists (even half-written), _current untouched
    (11 to 20).toDF("n").write.parquet(s"${st.base}/v=2")
    assert(st.currentVersion(spark) == 1L)
    assert(st.read(spark).count() == 10, "orphan must be invisible to readers")

    // next writer allocates ABOVE the orphan — never re-enters v=2
    val v = st.write(spark, (1 to 30).toDF("n"))
    assert(v == 3L && st.read(spark).count() == 30)

    // vacuum removes both the superseded v=1 and the orphan v=2
    assert(st.vacuum(spark).toSet == Set(1L, 2L))
    assert(st.read(spark).count() == 30)
  }

  test("vacuum refuses a never-committed table (would classify in-flight writes as orphans)") {
    import spark.implicits._
    val st = freshStore()
    // simulate a first writer mid-flight: data dir present, pointer not yet flipped
    (1 to 10).toDF("n").write.parquet(s"${st.base}/v=1")
    val e = intercept[IllegalArgumentException](st.vacuum(spark))
    assert(e.getMessage.contains("no committed version"))
    assert(spark.read.parquet(s"${st.base}/v=1").count() == 10, "in-flight write must survive")
  }

  test("keep is the reader grace window: pinned reader survives keep=2, fails after eviction") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 10).toDF("n"))
    val pinned = st.read(spark) // resolves _current=1 once, like a mid-scan reader
    assert(pinned.count() == 10)

    // maintenance runs concurrently: new snapshot + vacuum with grace
    st.write(spark, (1 to 50).toDF("n"))
    assert(st.vacuum(spark, keep = 2).isEmpty, "keep=2 must retain the previous snapshot")
    assert(pinned.count() == 10, "reader pinned to v=1 must survive vacuum(keep=2)")
    assert(st.read(spark).count() == 50, "new readers resolve the live snapshot")

    // a third snapshot pushes v=1 out of the grace window
    st.compactCurrent(spark)
    assert(st.vacuum(spark, keep = 2) == Seq(1L))
    // the documented failure mode: a reader still pinned below the window
    // now breaks loudly (missing files), never silently returns partial data
    val e = intercept[Exception](pinned.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("v=1") || m.toLowerCase.contains("not exist")),
      s"expected a missing-snapshot failure, got: $e")
  }

  test("time-travel: readAsOf(N) stays pinned while N+1 publishes; orphans and vacuumed history refuse") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))
    st.write(spark, (1 to 50).toDF("n"))
    // read v=1 WHILE v=3 publishes: the as-of frame must keep serving v=1
    val asOf1 = st.readAsOf(spark, 1L)
    assert(asOf1.count() == 100)
    st.write(spark, (1 to 7).toDF("n"))
    assert(asOf1.count() == 100, "as-of reader must not see the concurrent publish")
    assert(st.readAsOf(spark, 2L).count() == 50)
    assert(st.read(spark).count() == 7)
    assert(st.versions(spark) == Seq(1L, 2L, 3L))

    // orphan above the pointer is NOT addressable history
    (1 to 5).toDF("n").write.parquet(s"${st.base}/v=9")
    val orphan = intercept[IllegalArgumentException](st.readAsOf(spark, 9L))
    assert(orphan.getMessage.contains("never committed"))
    assert(st.versions(spark) == Seq(1L, 2L, 3L))

    // vacuum shrinks the horizon loudly
    st.vacuum(spark, keep = 2)
    val gone = intercept[IllegalArgumentException](st.readAsOf(spark, 1L))
    assert(gone.getMessage.contains("vacuumed"))
    assert(st.readAsOf(spark, 2L).count() == 50)
  }

  test("writeIf: concurrent publishers on the same base version — exactly one wins") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 10).toDF("n"))

    // two writers both read current=1 and race their commits
    val a = st.writeIf(spark, (1 to 20).toDF("n"), expectedVersion = 1L)
    val b = st.writeIf(spark, (1 to 30).toDF("n"), expectedVersion = 1L)
    assert(a.contains(2L), "first claimant commits")
    assert(b.isEmpty, "second claimant on the same base must lose, not overwrite")
    assert(st.read(spark).count() == 20)
    // the loser's snapshot directory is cleaned up, not left as an orphan
    assert(!new java.io.File(s"${st.base}/v=3").exists)

    // the loser retries the optimistic loop from the NEW current and wins
    val retry = st.writeIf(spark, (1 to 30).toDF("n"), expectedVersion = st.currentVersion(spark))
    assert(retry.contains(3L))
    assert(st.read(spark).count() == 30)

    // stale expectation pre-checks out immediately
    assert(st.writeIf(spark, (1 to 5).toDF("n"), expectedVersion = 1L).isEmpty)

    // plain write remains last-writer-wins on top of the CAS history
    assert(st.write(spark, (1 to 4).toDF("n")) == 4L)
    assert(st.read(spark).count() == 4)
  }

  test("writeIf: TRUE interleaving — both racers stage before either claims; loser cleanup never touches the winner") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 10).toDF("n"))

    // the race the sequential test can't see: both writers pass the
    // pre-check and fully materialize their snapshots BEFORE either
    // claims — with a shared pre-claim version allocation both would
    // write into the same v=2 and the loser's delete would destroy the
    // winner's published snapshot
    val stageA = st.stageSnapshot(spark, (1 to 20).toDF("n"))
    val stageB = st.stageSnapshot(spark, (1 to 30).toDF("n"))
    val b = st.claimAndPublish(spark, stageB, expectedVersion = 1L) // B claims first
    val a = st.claimAndPublish(spark, stageA, expectedVersion = 1L) // A loses, cleans up
    assert(b.contains(2L), "claim winner publishes")
    assert(a.isEmpty, "post-stage claimant on the same base loses")
    assert(st.read(spark).count() == 30, "winner's snapshot intact after loser cleanup")
    assert(st.readAsOf(spark, 2L).count() == 30)
    // loser's staging is gone; winner's staging was renamed into place
    assert(!new java.io.File(s"${st.base}/_staging/${stageA.getName}").exists)
    assert(!new java.io.File(s"${st.base}/_staging/${stageB.getName}").exists)

    // a crashed writer's abandoned staging dir is GC'd by vacuum
    val orphan = st.stageSnapshot(spark, (1 to 5).toDF("n"))
    assert(new java.io.File(orphan.toString).exists)
    st.write(spark, (1 to 7).toDF("n"))
    st.vacuum(spark, keep = 2)
    assert(!new java.io.File(orphan.toString).exists, "vacuum GCs crashed staging dirs")
  }

  test("delta-shape export: action replay reads the live snapshot back path-independently") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))
    st.write(spark, (1 to 50).toDF("n").repartition(3))
    st.exportDeltaLog(spark)

    val logFiles = new java.io.File(s"${st.base}/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getName).sorted
    assert(logFiles.toSeq == Seq("0" * 20 + ".json", "0" * 19 + "1.json"),
      s"one 20-digit log entry per committed version, got ${logFiles.toSeq}")

    // path-independent reader: replay adds-minus-removes over the ordered
    // log, then read the surviving file list with the PLAIN parquet reader
    // (an action kind can be wholly absent — a single-version log has no
    // removes — so the replay tolerates a missing column)
    def livePaths(logDf: org.apache.spark.sql.DataFrame): Seq[String] = {
      def pathsOf(action: String): Set[String] =
        if (logDf.columns.contains(action))
          logDf.where(col(action).isNotNull).select(s"$action.path").as[String].collect().toSet
        else Set.empty
      (pathsOf("add") -- pathsOf("remove")).toSeq.sorted
    }
    val log = spark.read.json(s"${st.base}/_delta_log/*.json")
    val live = livePaths(log).map(p => s"${st.base}/$p")
    assert(live.size == 3 && live.forall(_.contains("v=2")), s"live file list: $live")
    val back = spark.read.parquet(live: _*)
    assert(back.count() == 50 &&
      back.agg(sum("n")).head.getLong(0) == st.read(spark).agg(sum("n")).head.getLong(0))

    // protocol present once; schemaString is Spark schema JSON and parses
    // back to the live snapshot's exact schema
    assert(log.where(col("protocol").isNotNull).count() == 1)
    val schemaString = log.where(col("metaData").isNotNull)
      .select("metaData.schemaString").as[String].collect().last
    assert(org.apache.spark.sql.types.DataType.fromJson(schemaString) == st.read(spark).schema)

    // vacuum shrinks the exportable horizon: regenerated log starts at the
    // oldest addressable snapshot and still replays to the same live set
    st.write(spark, (1 to 7).toDF("n"))
    st.vacuum(spark, keep = 1)
    st.exportDeltaLog(spark)
    val live2 = livePaths(spark.read.json(s"${st.base}/_delta_log/*.json"))
      .map(p => s"${st.base}/$p")
    assert(spark.read.parquet(live2: _*).count() == 7)
  }
}
