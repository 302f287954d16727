package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedStore

/** Maintenance and ingest run CONCURRENTLY on a production table —
  * compaction cannot be allowed to publish over a commit it never saw.
  * Both verbs now commit through the same claim CAS: these tests pin (a)
  * the deterministic interleaving — the side that loses the claim retries
  * on the new current, and the racing commit's rows survive into the
  * compacted snapshot — and (b) a live two-thread race where every commit
  * lands exactly once and the final snapshot is the full union of what
  * both sides published (the lost-update anomaly a blind pointer flip
  * would produce).
  */
class ConcurrentWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshStore() =
    new VersionedStore(Files.createTempDirectory("graft-cwspec").toString + "/t")

  private def stagingDirs(st: VersionedStore): Seq[String] = {
    val d = new java.io.File(s"${st.base}/_staging")
    if (!d.exists()) Nil else d.listFiles().map(_.getName).toSeq
  }

  test("interleaved claim race: ingest wins, compactor loses + retries on the new current — no lost update") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))                 // v1
    assert(st.currentVersion(spark) == 1L)

    // Both actors read current = 1 and stage their snapshots...
    val compStaging = st.stageSnapshot(spark, st.read(spark).repartition(1))
    val ingestStaging = st.stageSnapshot(spark, (1 to 150).toDF("n"))

    // ...the ingest writer claims first and publishes v2...
    assert(st.claimAndPublish(spark, ingestStaging, 1L).contains(2L))
    // ...so the compactor's claim on version 1 MUST lose, and its loser
    // cleanup removes only its own staging directory.
    assert(st.claimAndPublish(spark, compStaging, 1L).isEmpty)
    assert(st.currentVersion(spark) == 2L)
    assert(stagingDirs(st).isEmpty, "loser left staging debris")

    // The retry (the public verb re-reads current) compacts v2's DATA —
    // the ingest commit survives into v3; compacting stale v1 would have
    // silently resurrected the 100-row snapshot.
    assert(st.compactCurrent(spark) == 3L)
    assert(st.read(spark).count() == 150L)
    assert(st.versions(spark) == Seq(1L, 2L, 3L))
  }

  test("crashed claim winner: compaction fails fast with the recoverClaims message instead of burning its attempt budget") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))                 // v1
    // a winner that staged, claimed, and DIED before publishing: its
    // staging dir and claim file exist, the pointer never moves
    val deadStaging = st.stageSnapshot(spark, (1 to 50).toDF("n"))
    val f = new org.apache.hadoop.fs.Path(st.base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(st.base, "_claims"))
    val out = f.create(new org.apache.hadoop.fs.Path(st.base, "_claims/claim-1"), false)
    out.write(deadStaging.getName.getBytes("UTF-8")); out.close()

    sys.props("graft.claimWaitMs") = "200" // spec hook: shrink the 60 s wait
    try {
      val t0 = System.nanoTime()
      val boom = intercept[IllegalStateException] { st.compactCurrent(spark) }
      val sec = (System.nanoTime() - t0) / 1e9
      // the FAIL-FAST message (dead winner), not the 5-attempt race message
      assert(boom.getMessage.contains("recoverClaims"))
      assert(boom.getMessage.contains("never"), boom.getMessage)
      // one stage + one bounded wait — not five restage/wait cycles
      assert(sec < 30.0, s"took $sec s — burned the attempt budget instead of failing fast")
    } finally sys.props.remove("graft.claimWaitMs")

    // recoverClaims is exactly the tool the message names: it completes
    // the dead winner's publish, after which compaction succeeds
    assert(st.recoverClaims(spark).contains(2L))
    assert(st.read(spark).count() == 50L)
    assert(st.compactCurrent(spark) == 3L)
  }

  test("torn intent held mid-write across two full windows: a LIVE winner is not declared crashed") {
    import spark.implicits._
    // r16 verdict finding: publishProgress mapped every unreadable intent
    // to the constant (true, -1L), so two consecutive unreadable windows
    // compared EQUAL and a live-but-mid-write winner was declared crashed,
    // routing the operator to the destructive recoverClaims path. The fix
    // counts unreadable windows separately (indeterminate, not
    // "unchanged") — this test holds a torn intent across >2 full windows
    // while the winner is demonstrably alive, then lets it finish, and
    // asserts compaction retries instead of throwing.
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))                 // v1
    val winnerStaging = st.stageSnapshot(spark, (1 to 50).toDF("n"))
    val winnerName = winnerStaging.getName
    val f = new org.apache.hadoop.fs.Path(st.base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(st.base, "_claims"))
    def put(name: String, content: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(st.base, s"_claims/$name"), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    put("claim-1", winnerName)
    put("intent-1", "mid-write-torn") // no ':'-suffixed version → unreadable

    val waitMs = 400L
    sys.props("graft.claimWaitMs") = waitMs.toString
    val died = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val winner = new Thread(() => {
      try {
        // the compactor stages under _staging, loses the claim, and the
        // loser deletes its own staging dir just before entering the wait
        // loop — appearance-then-disappearance of a second staging dir
        // therefore places the compactor provably INSIDE the no-progress
        // windows before we start the hold
        def others() = stagingDirs(st).filterNot(_ == winnerName)
        while (others().isEmpty) Thread.sleep(10)
        while (others().nonEmpty) Thread.sleep(10)
        // hold the torn record across two FULL windows (the pre-fix code
        // declared a stall at the second window), then finish the publish
        // exactly as the live winner would
        Thread.sleep(2 * waitMs + waitMs / 2)
        put("intent-1", s"$winnerName:2")
        st.recoverClaims(spark)
        ()
      } catch { case t: Throwable => died.compareAndSet(null, t) }
    })
    winner.start()
    try {
      val v = st.compactCurrent(spark)
      winner.join(60000)
      if (died.get() != null) throw died.get()
      // the winner's v2 (50 rows) landed, then the compactor's retry
      // compacted it as v3 — nobody was sent to recoverClaims in anger
      assert(v == 3L, s"expected the retry to publish v3, got v$v")
      assert(st.read(spark).count() == 50L)
      assert(st.currentVersion(spark) == 3L)
    } finally {
      sys.props.remove("graft.claimWaitMs")
      winner.join(60000)
    }
  }

  test("torn intent frozen forever (winner crashed mid-intent-write): fail-fast still fires, and clearing the torn record recovers") {
    import spark.implicits._
    // the bounded-unreadable-window counter must not turn the liveness fix
    // into an infinite wait: a torn intent NOBODY is rewriting reads as
    // unreadable every window, and after the budget the stall verdict
    // lands with the recoverClaims routing message
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))                 // v1
    val deadStaging = st.stageSnapshot(spark, (1 to 50).toDF("n"))
    val f = new org.apache.hadoop.fs.Path(st.base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(st.base, "_claims"))
    def put(name: String, content: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(st.base, s"_claims/$name"), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    put("claim-1", deadStaging.getName)
    put("intent-1", "mid-write-torn")

    sys.props("graft.claimWaitMs") = "200"
    try {
      val t0 = System.nanoTime()
      val boom = intercept[IllegalStateException] { st.compactCurrent(spark) }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(boom.getMessage.contains("recoverClaims"))
      assert(sec < 30.0, s"took $sec s — burned the attempt budget instead of failing fast")
    } finally sys.props.remove("graft.claimWaitMs")

    // the operator clears the torn record (it names no version, so nothing
    // was published); recoverClaims then completes the dead winner's
    // publish from the claim alone
    f.delete(new org.apache.hadoop.fs.Path(st.base, "_claims/intent-1"), false)
    assert(st.recoverClaims(spark).contains(2L))
    assert(st.read(spark).count() == 50L)
  }

  test("live two-thread race: ingest writeIf loop vs optimizeCurrent — every commit lands exactly once") {
    import spark.implicits._
    val st = freshStore()
    st.write(spark, (1 to 100).toDF("n"))                 // v1
    val markers = Seq(1000001L, 1000002L, 1000003L, 1000004L)

    // Ingest: the standard optimistic loop — read current, append one
    // marker, writeIf; on a lost race re-read and retry the transform.
    // a thread that DIES would otherwise read as a lost update in the
    // final assertions — capture and rethrow its real failure instead
    val died = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    def guarded(body: => Unit): Runnable = () =>
      try body catch { case t: Throwable => died.compareAndSet(null, t) }
    val ingestRetries = new java.util.concurrent.atomic.AtomicInteger(0)
    val ingest = new Thread(guarded {
      markers.foreach { m =>
        var committed = false
        while (!committed) {
          val cur = st.currentVersion(spark)
          val next = st.read(spark).select(col("n").cast("long").as("n"))
            .unionByName(Seq(m).toDF("n"))
          if (st.writeIf(spark, next, cur).isEmpty) ingestRetries.incrementAndGet()
          else committed = true
        }
      }
    })
    // Maintenance: two OPTIMIZE passes racing the ingest loop. With 4
    // ingest commits total, a single optimizeCurrent call can lose its
    // claim at most 4 times — inside its 5-attempt budget, so the verb
    // always converges here (a loss implies a concurrent commit).
    val maintRetries = new java.util.concurrent.atomic.AtomicInteger(0)
    val maint = new Thread(guarded {
      (1 to 2).foreach { _ =>
        val before = st.currentVersion(spark)
        val v = st.optimizeCurrent(spark, Seq("n"), targetBytes = 1L << 20)
        // every claim loss skipped at least one version number
        maintRetries.addAndGet((v - before - 1).toInt)
      }
    })
    ingest.start(); maint.start()
    // generous join budget: each commit is several Spark jobs on the
    // SHARED test session, and under full-suite co-tenancy (parallel
    // suites + host load) the six commits have been observed to need
    // multiples of their isolated ~14 s — 120 s flaked once at a 1.5×
    // slower battery; the race semantics don't depend on the deadline
    ingest.join(600000); maint.join(600000)
    if (died.get() != null) throw died.get()
    assert(!ingest.isAlive && !maint.isAlive, "race threads did not finish")

    // No lost update: the final snapshot is the base ∪ every marker, no
    // matter how the six commits interleaved.
    val finalRows = st.read(spark).select(col("n").cast("long")).collect().map(_.getLong(0)).toSet
    assert(markers.forall(finalRows), s"lost ingest commits: ${markers.filterNot(finalRows)}")
    assert((1 to 100).forall(i => finalRows(i.toLong)), "compaction dropped base rows")
    assert(finalRows.size == 104)

    // Exactly one committed version per successful commit (4 ingest + 2
    // maintenance + the seed), versions strictly increasing, no staging
    // debris from any loser.
    assert(st.versions(spark).size == 7, s"versions: ${st.versions(spark)}")
    assert(st.currentVersion(spark) == st.versions(spark).max)
    assert(stagingDirs(st).isEmpty, "a loser left staging debris")
  }
}
