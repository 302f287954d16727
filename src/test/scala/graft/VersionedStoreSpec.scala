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
}
