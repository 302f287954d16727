package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The streaming-runtime probe harness on gate-scale data: the chronological
  * chunking must partition the corpus exactly (no lost/duplicated events at
  * the quantile cuts), and a measured run must produce real micro-batches,
  * real state metrics, and the same output the one-shot stream gives.
  */
class StreamProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("chunkEvents splits the timeline exactly: 8 chronological files, no row lost") {
    val root = Files.createTempDirectory("graft-streamprobe").toString
    val chunks = StreamProbe.chunkEvents(spark, sfDir, s"$root/chunks")
    assert(chunks.length == 8)
    assert(chunks.forall(p => Files.exists(Paths.get(p))))
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    val chunked = spark.read.parquet(chunks: _*)
    assert(chunked.count() == total)
    assert(chunked.select("event_id").distinct().count() ==
      spark.read.parquet(s"$sfDir/events.parquet").select("event_id").distinct().count())
    // chronological: chunk i's max ts <= chunk i+1's min ts
    val ranges = chunks.map { p =>
      import org.apache.spark.sql.functions.{col, min, max, unix_micros}
      val r = spark.read.parquet(p).agg(
        min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi <= lo) }
  }

  test("a measured run over chunked micro-batches matches the one-shot stream") {
    val root = Files.createTempDirectory("graft-streamprobe-run").toString
    val chunks = StreamProbe.chunkEvents(spark, sfDir, s"$root/chunks")
    val src = s"$root/src"
    Files.createDirectories(Paths.get(src))
    chunks.foreach { p =>
      val from = Paths.get(p)
      Files.createSymbolicLink(Paths.get(src, from.getFileName.toString), from)
    }
    val dedup = StreamProbe.workloads(spark).toMap.apply("dedup")
    val stats = StreamProbe.runOnce(spark, "spec-dedup", src, s"$root/out", s"$root/ck", dedup)
    assert(stats.batches == 8, s"expected one micro-batch per chunk, got ${stats.batches}")
    assert(stats.stateRows > 0 && stats.stateBytes > 0, "no state metrics recorded")
    val got = spark.read.parquet(s"$root/out").count()
    // dropDuplicatesWithinWatermark over a unique-id corpus passes everything
    val want = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(got == want, s"dedup stream emitted $got of $want")
  }

  test("probeWorkload delivers chunks under a RELATIVE root (main's usage)") {
    // main passes root = "target/streamprobe"; symlink targets must be
    // absolutized or they resolve against the link's directory and dangle
    // (the whole stream then reads zero files and reports an empty run)
    val root = "target/streamprobe-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val chunks = StreamProbe.chunkEvents(spark, sfDir, s"$root/chunks")
    val dedup = StreamProbe.workloads(spark).toMap.apply("dedup")
    val (r1, r2, rows) = StreamProbe.probeWorkload(spark, "base", "dedup", chunks, root, dedup)
    assert(r1.batches == 4 && r2.batches == 4, s"got ${r1.batches}+${r2.batches} batches")
    val want = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(rows == want, s"relative-root probe emitted $rows of $want")
  }
}
