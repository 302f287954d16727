package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ObjectStoreFileSystem, VersionedStore}

/** VersionedStore's commit protocol wire-tested against OBJECT-STORE
  * semantics instead of argued from Scaladoc: `objstore://` has no rename
  * verb (every rename is per-object atomic copies + deletes, crashable
  * between any two objects, exactly S3A), no append, and per-object
  * atomic PUT. The suite drives the full verb set over that surface,
  * injects crashes into the one multi-object window the CAS publish has,
  * and proves the recovery verb converges from every window — plus the
  * marker fix for the crashed-writer-below-live time-travel hazard the
  * fault injection surfaced.
  */
class ObjectStoreSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjectStoreFileSystem].getName)
    s
  }

  private def freshStore(): VersionedStore = {
    val local = Files.createTempDirectory("graft-objstore").toString
    new VersionedStore(s"objstore://$local/t")
  }

  private def sumN(st: VersionedStore): Long =
    st.read(spark).agg(sum("n")).head.getLong(0)

  test("full verb set works on rename-less storage (committer renames degrade to copy+delete)") {
    import spark.implicits._
    ObjectStoreFileSystem.clearFaults()
    val st = freshStore()

    assert(st.write(spark, (1 to 100).toDF("n")) == 1L)
    assert(sumN(st) == 5050L)

    // CAS write over objstore: stage → claim → intent → copy-publish → flip
    assert(st.writeIf(spark, (1 to 10).toDF("n"), 1L).contains(2L))
    assert(sumN(st) == 55L)
    // stale expected refused
    assert(st.writeIf(spark, (1 to 3).toDF("n"), 1L).isEmpty)

    // compaction + vacuum + time travel all on the objstore scheme
    st.compactCurrent(spark)
    assert(st.readAsOf(spark, 1L).count() == 100)
    assert(st.vacuum(spark, keep = 1).nonEmpty)
    assert(sumN(st) == 55L)
  }

  test("conditional create is atomic on the 2-arg dispatch path (the one createClaimNonPosix uses)") {
    // FileSystem.create(path, overwrite) dispatches to the 6-arg
    // create(Path, boolean, int, short, long, Progressable), which
    // RawLocalFileSystem overrides and routes to a PRIVATE 8-arg create —
    // NEVER reaching the 7-arg FsPermission override (r16 review finding:
    // the r15 fix only covered the 7-arg form, leaving the actual claim
    // path non-atomic). Prove our reservation is on THIS dispatch path by
    // asserting the objstore-specific failure message, which the inherited
    // exists-then-open code can never produce.
    val base = new org.apache.hadoop.fs.Path(
      s"objstore://${Files.createTempDirectory("graft-objstore-dispatch")}")
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(base, "claim-x")
    f.create(p, false).close()
    val boom = intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      f.create(p, false)
    }
    assert(boom.getMessage.contains("conditional PUT lost"),
      s"2-arg create(path, false) bypassed the O_EXCL reservation: ${boom.getMessage}")

    // and a straight N-thread race on the raw verb: exactly one winner
    val p2 = new org.apache.hadoop.fs.Path(base, "claim-race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        try { f.create(p2, false).close(); wins.incrementAndGet() }
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => () }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(60000))
    assert(wins.get() == 1, s"raw conditional-PUT race admitted ${wins.get()} winners")
  }

  test("conditional create is atomic on the createNonRecursive dispatch paths too") {
    // RawLocalFileSystem.createNonRecursive inherits the same non-atomic
    // exists-then-open flaw the create() overloads had (r16 advice): a
    // future caller using createNonRecursive(overwrite = false) for a
    // claim would silently lose conditional-PUT semantics. Both public
    // overloads (boolean and EnumSet[CreateFlag]) must hit the O_EXCL
    // reservation — proven by the objstore-specific failure message.
    val base = new org.apache.hadoop.fs.Path(
      s"objstore://${Files.createTempDirectory("graft-objstore-nonrec")}")
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val p = new org.apache.hadoop.fs.Path(base, "claim-bool")
    f.createNonRecursive(p, false, 4096, 1.toShort, 1L << 20, null).close()
    val boom = intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      f.createNonRecursive(p, false, 4096, 1.toShort, 1L << 20, null)
    }
    assert(boom.getMessage.contains("conditional PUT lost"),
      s"boolean createNonRecursive bypassed the O_EXCL reservation: ${boom.getMessage}")

    val p2 = new org.apache.hadoop.fs.Path(base, "claim-flags")
    val createOnly = java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE)
    f.createNonRecursive(p2, org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      createOnly, 4096, 1.toShort, 1L << 20, null).close()
    val boom2 = intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      f.createNonRecursive(p2, org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
        createOnly, 4096, 1.toShort, 1L << 20, null)
    }
    assert(boom2.getMessage.contains("conditional PUT lost"),
      s"EnumSet createNonRecursive bypassed the O_EXCL reservation: ${boom2.getMessage}")

    // overwrite = true keeps working (no reservation in the way)
    f.createNonRecursive(p, true, 4096, 1.toShort, 1L << 20, null).close()
  }

  test("two-thread claim race on objstore: the conditional create admits exactly one winner") {
    import spark.implicits._
    // RawLocalFileSystem.create(overwrite = false) is exists-then-open —
    // NOT atomic — so without ObjectStoreFileSystem's O_EXCL reservation
    // two racing claimAndPublish calls could both win the same version
    // and publish colliding v=K snapshots (lost update). Race the claim
    // step directly, three rounds for scheduling variety.
    ObjectStoreFileSystem.clearFaults()
    (1 to 3).foreach { round =>
      val st = freshStore()
      st.write(spark, (1 to 10).toDF("n"))                // v1
      val sA = st.stageSnapshot(spark, (1 to 3).toDF("n"))
      val sB = st.stageSnapshot(spark, (1 to 7).toDF("n"))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[Long]]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      def racer(stg: org.apache.hadoop.fs.Path) = new Thread(() => {
        gate.await()
        results.add(st.claimAndPublish(spark, stg, 1L))
      })
      val (a, b) = (racer(sA), racer(sB))
      a.start(); b.start(); gate.countDown()
      a.join(60000); b.join(60000)
      val wins = scala.jdk.CollectionConverters.CollectionHasAsScala(results).asScala.toSeq
      assert(wins.count(_.isDefined) == 1, s"round $round: claim winners = $wins")
      assert(wins.flatten == Seq(2L))
      assert(st.currentVersion(spark) == 2L)
      val n = st.read(spark).count()
      assert(n == 3L || n == 7L, s"round $round: merged/corrupt snapshot ($n rows)")
    }
  }

  test("crash mid-publish-rename: pointer never flips, reader keeps old snapshot; recoverClaims completes the publish") {
    import spark.implicits._
    ObjectStoreFileSystem.clearFaults()
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))

    // stage a MULTI-file snapshot so the rename has a real partial window,
    // then crash after exactly one object copy lands in v=2
    val staging = st.stageSnapshot(spark, (1 to 60).toDF("n").repartition(3))
    val armPrefix = new org.apache.hadoop.fs.Path(st.base).toUri.getPath + "/v="
    ObjectStoreFileSystem.armRenameCrash(armPrefix, afterCopies = 1)
    val boom = intercept[Exception] { st.claimAndPublish(spark, staging, 1L) }
    ObjectStoreFileSystem.clearFaults()
    assert(boom.getMessage.contains("injected"))

    // acknowledged state unharmed: pointer old, snapshot v=1 fully served
    assert(st.currentVersion(spark) == 1L)
    assert(sumN(st) == 5050L)
    // and the crashed claim blocks a competing CAS writer (claim consumed)
    assert(st.writeIf(spark, (1 to 5).toDF("n"), 1L).isEmpty)

    // single-maintainer recovery finishes the crashed winner's exact publish
    assert(st.recoverClaims(spark).contains(2L))
    assert(st.currentVersion(spark) == 2L)
    assert(sumN(st) == 1830L)
    assert(st.read(spark).count() == 60)

    // the CAS lane is unblocked on the NEW version
    assert(st.writeIf(spark, (1 to 7).toDF("n"), 2L).contains(3L))
    assert(st.recoverClaims(spark).isEmpty) // nothing pending afterwards
  }

  test("crash with the intent record lost: recovery re-allocates; the partial v=K is never addressable history") {
    import spark.implicits._
    ObjectStoreFileSystem.clearFaults()
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))

    val staging = st.stageSnapshot(spark, (1 to 60).toDF("n").repartition(3))
    val armPrefix = new org.apache.hadoop.fs.Path(st.base).toUri.getPath + "/v="
    ObjectStoreFileSystem.armRenameCrash(armPrefix, afterCopies = 1)
    intercept[Exception] { st.claimAndPublish(spark, staging, 1L) }
    ObjectStoreFileSystem.clearFaults()

    // simulate the pre-intent crash window: claim present, intent never landed
    val f = new org.apache.hadoop.fs.Path(st.base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new org.apache.hadoop.fs.Path(st.base, "_claims/intent-1"), false))

    // recovery cannot trust the partial v=2 (no intent names it) — it
    // allocates ABOVE it and publishes the staged snapshot as v=3
    assert(st.recoverClaims(spark).contains(3L))
    assert(st.currentVersion(spark) == 3L)
    assert(sumN(st) == 1830L)

    // the half-copied v=2 now sits BELOW live — the marker keeps it out of
    // committed history (this was the time-travel hazard) and vacuum may
    // remove it at any keep horizon
    assert(st.versions(spark) == Seq(1L, 3L))
    val bad = intercept[IllegalArgumentException] { st.readAsOf(spark, 2L) }
    assert(bad.getMessage.contains("crashed writer"))
    assert(st.vacuum(spark, keep = 2).contains(2L))
    assert(st.readAsOf(spark, 1L).count() == 100) // keep=2 horizon intact
  }

  test("crash mid-publish of a PARTITIONED staged snapshot: recovery reassembles the full partition tree") {
    import spark.implicits._
    ObjectStoreFileSystem.clearFaults()
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))

    val staging = st.stageSnapshot(spark,
      spark.range(60).select(col("id").as("n"), (col("id") % 3).as("cid")),
      partitionBy = Seq("cid"))
    val armPrefix = new org.apache.hadoop.fs.Path(st.base).toUri.getPath + "/v="
    ObjectStoreFileSystem.armRenameCrash(armPrefix, afterCopies = 2)
    intercept[Exception] { st.claimAndPublish(spark, staging, 1L) }
    ObjectStoreFileSystem.clearFaults()
    assert(st.currentVersion(spark) == 1L)

    assert(st.recoverClaims(spark).contains(2L))
    val live = st.read(spark)
    assert(live.count() == 60 && live.where(col("cid") === 2).count() == 20)
    assert(st.partitioningOf(spark, 2L) == Seq("cid"))
  }

  test("zero-byte claim (crash between create and write): recovery refuses loudly instead of resolving staging to the _staging/ root") {
    import spark.implicits._
    ObjectStoreFileSystem.clearFaults()
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))

    // two unrelated orphaned staging dirs — the hazard is copyTree merging
    // them all into one committed snapshot via an empty staging name
    st.stageSnapshot(spark, (1 to 5).toDF("n"))
    st.stageSnapshot(spark, (1 to 9).toDF("n"))
    val f = new org.apache.hadoop.fs.Path(st.base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the create-then-write window of createClaim's NON-POSIX branch (the
    // one this objstore FS dispatches to): claim visible but empty
    f.mkdirs(new org.apache.hadoop.fs.Path(st.base, "_claims"))
    f.create(new org.apache.hadoop.fs.Path(st.base, "_claims/claim-1"), false).close()

    val boom = intercept[IllegalArgumentException] { st.recoverClaims(spark) }
    assert(boom.getMessage.contains("empty"))
    // nothing published, pointer untouched, both staging dirs intact
    assert(st.currentVersion(spark) == 1L)
    assert(sumN(st) == 5050L)
    assert(graft.sources.FsUtil.listDir(spark,
      new org.apache.hadoop.fs.Path(st.base, "_staging").toString).size == 2)

    // a traversal-shaped claim is refused by the same guard
    val out = f.create(new org.apache.hadoop.fs.Path(st.base, "_claims/claim-1"), true)
    out.write("../v=1".getBytes("UTF-8")); out.close()
    val boom2 = intercept[IllegalArgumentException] { st.recoverClaims(spark) }
    assert(boom2.getMessage.contains("UUID"))
  }

  test("structured streaming on objstore://: checkpoint, state store, and sink all on rename-less storage; exactly-once across a restart") {
    ObjectStoreFileSystem.clearFaults()
    val local = Files.createTempDirectory("graft-objstream").toString
    val srcDir = s"objstore://$local/src"
    val outDir = s"objstore://$local/out"
    val ck = s"objstore://$local/ck"
    val sfDir = "/root/testdata/sf0.001"
    val f = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(srcDir))
    def deliver(name: String): Unit = f.copyFromLocalFile(
      new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet"),
      new org.apache.hadoop.fs.Path(s"$srcDir/$name.parquet"))

    def run(): Unit = {
      val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream
          .schema(graft.streaming.StreamingOps.rawEventSchema(spark, srcDir))
          .parquet(srcDir))
      val q = graft.streaming.StreamingOps.dedupEvents(stream, "60 days")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // offset log, commit log, state store deltas, and the sink's
    // _spark_metadata manifest all land through objstore's no-rename
    // semantics; the SAME events redelivered after the restart must be
    // suppressed by state recovered from the objstore checkpoint
    deliver("batch1"); run()
    deliver("batch2"); run()

    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    val got = spark.read.parquet(outDir).count()
    assert(got == n, s"redelivery after restart on objstore duplicated rows: $got vs $n")
  }

  test("persistent IVF index on objstore://: build, incremental append, and serve are object-store-clean") {
    ObjectStoreFileSystem.clearFaults()
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.embeddings(spark, dir)
    val isInc = col("vec_id") % 7 === 0
    val localBase = Files.createTempDirectory("graft-ivf-objstore").toString
    val objBase = s"objstore://$localBase/idx"
    val refBase = Files.createTempDirectory("graft-ivf-ref").toString + "/idx"

    // build on objstore (committer renames → copies), append the increment
    val obj = graft.operators.IvfIndex.build(spark, e.where(!isInc), objBase,
      cells = 16, lloydIters = 0)
    obj.append(spark, e.where(isInc))
    // the reference: same data, same deterministic seed, local filesystem
    val ref = graft.operators.IvfIndex.build(spark, e.where(!isInc), refBase,
      cells = 16, lloydIters = 0)
    ref.append(spark, e.where(isInc))

    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
    val a = obj.query(spark, q, probes = 3, topK = 5)
    val b = ref.query(spark, q, probes = 3, topK = 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "IVF serve over objstore must be bit-identical to the local build")
  }

  test("append is refused (object stores have no append)") {
    val f = new org.apache.hadoop.fs.Path("objstore:///")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(
      s"objstore://${Files.createTempDirectory("graft-objstore")}/x")
    val out = f.create(p, true); out.write(1); out.close()
    intercept[java.io.IOException] { f.append(p) }
  }
}
