package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventQueries, WindowQueries}
import graft.streaming.StreamingOps

/** Streaming ⇔ batch equivalence (the Structured Streaming contract): the
  * same StreamingOps transform applied to a `readStream` file source under
  * `Trigger.AvailableNow` must reproduce the batch result that the DuckDB
  * oracle checks.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** events.parquet copied into its own dir — file stream sources read
    * directories.
    */
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def runStream(out: DataFrame, mode: String, name: String): DataFrame = {
    val q = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming tumbling-window counts == batch result") {
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema(spark, streamDir)).parquet(streamDir))
    val got = runStream(StreamingOps.windowedCounts(stream), "complete", "wc")
      .orderBy("wstart", "event_type").collect()
    val want = EventQueries.e1WindowedCounts(spark, sfDir).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("streaming sessionization (flatMapGroupsWithState) == batch closed sessions") {
    import spark.implicits._
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(StreamingOps.rawEventSchema(spark, streamDir)).parquet(streamDir))
      .select("event_id", "ts", "user_id", "event_type", "value").as[StreamingOps.Event]
    val got = runStream(StreamingOps.sessionize(spark, stream).toDF(), "append", "sess")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    // batch twin: all sessions minus each user's last (still open in state)
    val all = EventQueries.e3Sessions(spark, sfDir)
    val lastPerUser = all.groupBy("user_id").agg(max(col("session_id")).as("session_id"))
    val want = all.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect()

    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("late event within gap is absorbed — session never inverts (ADVICE r1)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.sessionize(spark, mem.toDS()).toDF()
      .writeStream.format("memory").queryName("late_sess").outputMode("append").start()
    try {
      mem.addData(StreamingOps.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0))
      q.processAllAvailable()
      // out-of-order event from a later micro-batch, within the 30m gap:
      // must extend start backwards, NOT rewind end below start
      mem.addData(StreamingOps.Event(2L, ts("2024-01-01 09:50:00"), 1L, "a", 2.0))
      q.processAllAvailable()
      // far-future event closes the session
      mem.addData(StreamingOps.Event(3L, ts("2024-01-01 13:00:00"), 1L, "a", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_sess")
      .select("user_id", "session_start", "session_end", "n_events").collect()
    assert(rows.length == 1)
    assert(rows.head.getTimestamp(1) == ts("2024-01-01 09:50:00"))
    assert(rows.head.getTimestamp(2) == ts("2024-01-01 10:00:00"))
    assert(rows.head.getLong(3) == 2L)
  }

  test("sessionizeStream flushes idle sessions via event-time timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.sessionizeStream(spark, mem.toDS(), gapMinutes = 30, watermarkDelay = "1 hour")
      .toDF()
      .writeStream.format("memory").queryName("wm_sess").outputMode("append").start()
    try {
      mem.addData(
        StreamingOps.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
        StreamingOps.Event(2L, ts("2024-01-01 10:10:00"), 1L, "a", 2.0))
      q.processAllAvailable()
      // advance the watermark far past user 1's end+gap via another user:
      // wm = 20:00 − 1h = 19:00 > 10:40 ⇒ user 1's open session must flush
      // even though no further user-1 event ever arrives
      mem.addData(StreamingOps.Event(3L, ts("2024-01-01 20:00:00"), 2L, "a", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("wm_sess").filter($"user_id" === 1L)
      .select("session_start", "session_end", "n_events").collect()
    assert(u1.length == 1, s"expected user 1's idle session flushed, got ${u1.length} rows")
    assert(u1.head.getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(u1.head.getTimestamp(1) == ts("2024-01-01 10:10:00"))
    assert(u1.head.getLong(2) == 2L)
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) == batch distinct across batches") {
    // the same file delivered twice in two micro-batches = at-least-once
    // redelivery; state must dedupe across the batch boundary
    val d = Files.createTempDirectory("graft-dedup").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/a.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/b.parquet"))
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema(spark, d))
        .option("maxFilesPerTrigger", "1").parquet(d))
    // delay wider than the data span: nothing is late, so every batch-2 row
    // is dropped by dedup STATE, not by the lateness filter
    val got = runStream(StreamingOps.dedupEvents(stream, "60 days"), "append", "dedup")
      .groupBy("event_type").count().orderBy("event_type").collect()
    val want = graft.sources.Tables.events(spark, sfDir)
      .dropDuplicates("event_id")
      .groupBy("event_type").count().orderBy("event_type").collect()
    assert(got.sameElements(want))
  }

  test("stream-stream interval join == batch band join") {
    def purchases(df: DataFrame) = df.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    def clicks(df: DataFrame) = df.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))

    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema(spark, streamDir)).parquet(streamDir))
    val got = runStream(
        StreamingOps.attributionJoin(purchases(stream), clicks(stream), "40 days")
          .select("p_id", "c_id"), "append", "attr")
      .orderBy("p_id", "c_id").collect()

    val batch = graft.sources.Tables.events(spark, sfDir)
    val want = StreamingOps.attributionJoin(purchases(batch), clicks(batch))
      .select("p_id", "c_id").orderBy("p_id", "c_id").collect()
    assert(got.length == want.length && got.sameElements(want))

    // cross-check the same semantics against the RangeJoin operator
    val bj = graft.operators.RangeJoin.bandJoin(
        purchases(batch).withColumnRenamed("p_user", "user_id"),
        clicks(batch).withColumnRenamed("c_user", "user_id"),
        "user_id", "p_ts", "c_ts", -3600L * 1000000L, 0L)
      .select("p_id", "c_id").orderBy("p_id", "c_id").collect()
    assert(bj.sameElements(want))
  }

  test("stream-static broadcast join enriches the stream == batch result") {
    val dim = spark.range(0, 200)
      .select(col("id").as("user_id"), (col("id") % 3).as("tier"))
    def enrich(events: DataFrame) =
      events.join(broadcast(dim), "user_id")
        .groupBy("tier").agg(count(lit(1)).as("cnt"))

    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(StreamingOps.rawEventSchema(spark, streamDir)).parquet(streamDir))
    val got = runStream(enrich(stream), "complete", "enriched")
      .orderBy("tier").collect()
    val want = enrich(graft.sources.Tables.events(spark, sfDir))
      .orderBy("tier").collect()
    assert(got.sameElements(want))
  }

  test("foreachBatch idempotent sink: full reprocess leaves exactly one copy") {
    val root = Files.createTempDirectory("graft-febatch").toString
    val d = Files.createTempDirectory("graft-febatch-in").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/a.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/b.parquet"))

    def runOnce(checkpoint: String): Unit = {
      val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(StreamingOps.rawEventSchema(spark, d))
          .option("maxFilesPerTrigger", "1").parquet(d))
      val q = StreamingOps.idempotentPartitionedSink(stream, s"$root/out", checkpoint)
      q.awaitTermination(120000)
    }

    runOnce(s"$root/cp1")
    val first = spark.read.parquet(s"$root/out").count()
    // crash-and-restart from scratch: a fresh checkpoint replays every
    // batch; overwrite-per-batch_id must leave counts unchanged
    runOnce(s"$root/cp2")
    val second = spark.read.parquet(s"$root/out").count()
    assert(first == second, s"reprocess duplicated rows: $first -> $second")
    assert(first == spark.read.parquet(d).count())
  }

  test("rate source: unbounded synthetic stream aggregates under watermark") {
    import spark.implicits._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "1000").load() // (timestamp, value)
    val agg = rate
      .withWatermark("timestamp", "2 seconds")
      .groupBy(window(col("timestamp"), "1 second"), pmod(col("value"), lit(5)).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("rate_agg")
      .outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("rate_agg").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
    } finally q.stop()
    val rows = spark.table("rate_agg").collect()
    assert(rows.nonEmpty, "rate stream produced no windows in 30s")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("stream-static dedup == batch d9 verdicts across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Text
    implicit val sqlCtx = spark.sqlContext

    // static corpus fp index: unique per fp, min-id survivor (the d1 shape)
    val index = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(md5(Text.normText(col("text"))).as("fp"))
      .agg(min("doc_id").as("corp_id"))
    index.cache()

    // increment: 3 re-crawled fps (dups) + 2 unseen fps, split over two batches
    val known = index.orderBy("corp_id").limit(3)
      .select(col("corp_id") + 1000000L, col("fp")).as[(Long, String)].collect()
    val fresh = Seq((2000001L, "f" * 32), (2000002L, "0" * 32))

    val mem = MemoryStream[(Long, String)]
    val inc = mem.toDF().toDF("in_id", "fp")
    val q = StreamingOps.streamStaticDedup(inc, index)
      .writeStream.format("memory").queryName("ssd").outputMode("append").start()
    try {
      mem.addData(known.take(2).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData((known.drop(2) ++ fresh).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssd").orderBy("in_id")
      .select("in_id", "dup_of", "is_dup").collect()
    assert(got.length == 5)
    assert(got.take(3).forall(r => r.getBoolean(2) && r.getLong(1) == r.getLong(0) - 1000000L))
    assert(got.drop(3).forall(r => !r.getBoolean(2) && r.isNullAt(1)))
    index.unpersist()
  }

  test("stream-static span dedup == batch span merge across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val index = graft.queries.DedupQueries.spanWindows(docs)
      .groupBy("fp").agg(count(lit(1)).as("corp_c"))
    index.cache()

    // increment: two re-crawls (whole-doc span), one head-quote (partial
    // span: 20 corpus tokens then 13 novel ones), one fully novel doc
    // (enough tokens to window, zero index hits — absent from output)
    val base = docs.orderBy("doc_id").limit(3).collect().map(r => (r.getLong(0), r.getString(1)))
    val recrawls = base.take(2).map { case (id, text) => (id + 1000000L, text) }
    val headQuote = {
      val toks = base(2)._2.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      (3000001L, (toks.take(20) ++ (1 to 13).map(j => s"nvq$j")).mkString(" "))
    }
    val fresh = (3000002L, (1 to 12).map(j => s"nvl$j").mkString(" "))

    val mem = MemoryStream[(Long, String)]
    val inc = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.streamStaticSpanDedup(inc, index)
      .writeStream.format("memory").queryName("ssp").outputMode("complete").start()
    try {
      mem.addData(recrawls.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(headQuote, fresh)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssp").orderBy("doc_id")
      .select("doc_id", "n_spans", "dup_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // the batch path over the SAME increment: window-function island merge
    // must agree with the streaming HOF fold
    val incBatch = spark.createDataFrame(recrawls.toSeq :+ headQuote :+ fresh)
      .toDF("doc_id", "text")
    val repB = graft.queries.DedupQueries.spanWindows(incBatch)
      .join(index.where(col("corp_c") >= 1).select("fp"), "fp")
      .select("doc_id", "pos")
    val expect = graft.queries.DedupQueries.mergeSpans(repB)
      .select(col("doc_id"), col("n_spans"), col("dup_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    assert(got == expect)
    assert(got.map(_._1).toSet == (recrawls.map(_._1) :+ headQuote._1).toSet,
      "recrawls and the head-quote marked; the novel doc absent")
    val quote = got.find(_._1 == headQuote._1).get
    assert(quote._2 == 1L && quote._3 == 20L, "head quote = one 20-token span")
    index.unpersist()
  }

  test("streaming CDC apply == batch u9 under out-of-order + redelivered batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps.CdcChange
    implicit val sqlCtx = spark.sqlContext

    val base = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val b = base.collect().map(r => (r.getLong(0), r.getLong(1)))
    val us = b.filter(_._1 % 5 == 0).map { case (k, bal) => CdcChange(k, 1L, "U", bal + 111L) }
    val ds = b.filter(_._1 % 7 == 0).map { case (k, _) => CdcChange(k, 2L, "D", null) }
    val is = b.filter(t => t._1 % 7 == 0 && t._1 % 2 == 0)
      .map { case (k, _) => CdcChange(k, 3L, "I", 55500L) }

    val mem = MemoryStream[CdcChange]
    val q = StreamingOps.cdcApplyStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("cdcw").outputMode("update").start()
    try {
      // batch 1: the LATEST ops first (seq 3 before 2 before 1) — the
      // apply must not read delivery order
      mem.addData(is.toIndexedSeq: _*)
      q.processAllAvailable()
      // batch 2: deletes + half the updates, plus the I ops REDELIVERED
      // (at-least-once across the batch boundary — must be idempotent)
      mem.addData((ds ++ us.take(us.length / 2) ++ is).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(us.drop(us.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // assemble the materialized table exactly as batch u9 does
    val winners = spark.table("cdcw").groupBy("k")
      .agg(max_by(struct(col("op"), col("v")), col("seq")).as("w"))
    val got = base.join(winners, Seq("k"), "full")
      .where(col("w").isNull || col("w.op") =!= "D")
      .select(col("k"),
        coalesce(col("w.v"), col("bal_cents")).as("bal"),
        when(col("w").isNull, "base").otherwise(col("w.op")).as("src"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = graft.queries.UpsertQueries.u9CdcApply(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want)
    assert(got.exists(_._3 == "I") && want.count(_._3 == "U") > 0,
      "resurrections and updates both present")
    assert(b.map(_._1).count(k => k % 7 == 0 && k % 2 != 0) ==
      b.length - got.length, "every odd %7 key deleted, nothing else")
  }

  test("stream-static boilerplate removal == batch d18 scrub across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.queries.DedupQueries
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val segsC = DedupQueries.segmentRows(docs, "doc_id", Seq("source"))
      .withColumn("h", md5(col("seg")))
    val index = segsC.select("source", "h", "doc_id").distinct()
      .groupBy("source", "h").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2).select("source", "h")
    index.cache()

    // recrawl two docs the BATCH pass provably rewrites (n_kept <
    // n_segments in d18's gated output) plus one fully novel doc
    val d18 = DedupQueries.d18BoilerplateRemoval(spark, sfDir)
      .where(col("n_kept") < col("n_segments"))
      .orderBy("doc_id").limit(2).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(d18.length == 2, "fixture corpus must contain boilerplate docs")
    val base = docs.where(col("doc_id").isin(d18.map(_._1): _*))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val recrawls = base.map { case (id, src, text) => (id + 1000000L, src, text) }
    val fresh = (3000001L, base(0)._2, (1 to 25).map(j => s"nvb$j").mkString(" "))
    val incRows = recrawls.toSeq :+ fresh

    val mem = MemoryStream[(Long, String, String)]
    val inc = mem.toDF().toDF("doc_id", "source", "text")
    val q = StreamingOps.streamStaticBoilerplate(inc, index)
      .writeStream.format("memory").queryName("sbp").outputMode("complete").start()
    try {
      mem.addData(incRows.take(1): _*)
      q.processAllAvailable()
      mem.addData(incRows.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sbp").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    // batch reference: d18's own scrub helpers over the same increment
    // against the same frozen index (incl. the ids-join rebuild path)
    val incBatch = spark.createDataFrame(incRows).toDF("doc_id", "source", "text")
    val markedB = DedupQueries.segmentRows(incBatch, "doc_id", Seq("source"))
      .withColumn("h", md5(col("seg")))
      .join(index.withColumn("bp", lit(true)), Seq("source", "h"), "left")
      .withColumn("keep", col("bp").isNull)
    val expect = DedupQueries
      .rebuildFromSegments(markedB, incBatch.select("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expect)

    // same source + same text ⇒ the recrawl's cleaned text is byte-equal
    // to what the batch d18 pass produced for the original doc
    val gotByBase = got.map(t => (t._1 - 1000000L, t._4)).toMap
    d18.foreach { case (id, md5Clean) => assert(gotByBase(id) == md5Clean) }
    // recrawls really scrubbed; the novel doc passes through untouched
    got.filter(_._1 > 3000000L).foreach(t => assert(t._2 == t._3))
    got.filter(_._1 < 3000000L).foreach(t => assert(t._3 < t._2))
    index.unpersist()
  }

  test("stream-static decontamination == batch v2 on the same frozen eval index; leaked recrawl fully flagged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Text
    import graft.queries.CorpusQueries
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val index = docs.where(col("doc_id") % 11 === 0)
      .select(explode(Text.shingles(Text.tokens(col("text")), CorpusQueries.NGram)).as("g"))
      .select(Text.md5Long(col("g")).as("g64")).distinct()
    index.cache()

    // a leaked EVAL doc recrawled under a new id (every gram collides), a
    // fully novel doc (zero collisions), and an ordinary train doc
    val leaked = docs.where(col("doc_id") % 11 === 0).orderBy("doc_id").limit(1)
      .collect().map(r => (r.getLong(0) + 5000000L, r.getString(1))).head
    val train = docs.where(col("doc_id") % 11 =!= 0).orderBy("doc_id").limit(1)
      .collect().map(r => (r.getLong(0), r.getString(1))).head
    val fresh = (6000001L, (1 to 20).map(j => s"nvq$j").mkString(" "))
    val incRows = Seq(leaked, fresh, train)

    val mem = MemoryStream[(Long, String)]
    val inc = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.decontaminateStream(inc, index)
      .writeStream.format("memory").queryName("decon").outputMode("complete").start()
    try {
      mem.addData(incRows.take(1): _*)
      q.processAllAvailable()
      mem.addData(incRows.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("decon").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // batch reference: the same increment rows through the same frozen index
    val incBatch = spark.createDataFrame(incRows).toDF("doc_id", "text")
    val expect = StreamingOps.decontaminateStream(incBatch, index)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)

    // leaked recrawl: EVERY gram collides; novel doc: none
    val byId = got.map(t => (t._1, t)).toMap
    assert(byId(leaked._1)._3 == byId(leaked._1)._2 && byId(leaked._1)._4 == 1L,
      s"leaked eval text must be fully flagged: ${byId(leaked._1)}")
    assert(byId(fresh._1)._3 == 0L && byId(fresh._1)._4 == 0L)
    // the ordinary train doc matches its batch-v2 verdict
    val v2Row = CorpusQueries.v2Decontaminate(spark, sfDir)
      .where(col("doc_id") === train._1).collect().head
    assert(byId(train._1)._3 == v2Row.getLong(2) && byId(train._1)._4 == v2Row.getLong(3))
    index.unpersist()
  }

  test("streaming IVF serve == batch s3 probes, bit-exact cosines, across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.queries.SimilarityQueries
    implicit val sqlCtx = spark.sqlContext

    val cents = SimilarityQueries.ivfCents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val assigned = SimilarityQueries.ivfAssigned(spark, sfDir).cache()
    assigned.count() // materialize the static side once, not per micro-batch
    val qs = SimilarityQueries.ivfEmb(spark, sfDir)
      .where(col("vec_id") < SimilarityQueries.QueryBlock)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      .as[StreamingOps.VecQuery].collect().sortBy(_.qid)
    val (b1, b2) = qs.splitAt(qs.length / 2)

    val mem = MemoryStream[StreamingOps.VecQuery]
    val q = StreamingOps.ivfServeStream(spark, mem.toDS(), cents, assigned,
        SimilarityQueries.Probes, SimilarityQueries.TopK)
      .writeStream.format("memory").queryName("sivf").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sivf").select("qid", "rank", "nid", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    val want = SimilarityQueries.s3IvfTopK(spark, sfDir)
      .select(col("qid"), col("rank").cast("int"), col("nid"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    assigned.unpersist()
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq) // bit-exact, cosines included
  }

  test("streaming sequence packing == batch n9 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Text
    implicit val sqlCtx = spark.sqlContext

    // the same (doc_id, shard, n_tokens) projection n9 packs, delivered
    // in doc_id order over three arbitrary batch splits (the append-only
    // crawl contract); state carried between batches is (bin, fill) only
    val docs = graft.sources.Tables.documents(spark, sfDir).select(
        col("doc_id"),
        pmod(Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(8L))
          .cast("int").as("shard"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[StreamingOps.PackDoc].collect().sortBy(_.doc_id)
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[StreamingOps.PackDoc]
    val q = StreamingOps.packStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("spack").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
    val got = spark.table("spack").select("doc_id", "shard", "bin", "n_tokens")
      .orderBy("shard", "bin", "doc_id").collect().map(key)
    val want = graft.queries.SamplingQueries.n9SequencePack(spark, sfDir)
      .collect().map(key)
    assert(got.length == docs.length)
    assert(got.toSeq == want.toSeq)
  }

  test("streaming top-k == batch fullTopK across micro-batches (insert-only feed)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // per-priority top-3 orders by cents — the u5 shape, insert-only,
    // delivered over three arbitrary batch splits
    val rows = graft.sources.Tables.orders(spark, sfDir).select(
        col("o_orderpriority").as("key"), col("o_orderkey").as("id"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
      .as[StreamingOps.TopKIn].collect()
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[StreamingOps.TopKIn]
    val q = StreamingOps.topKStream(spark, mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("stopk").outputMode("update").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    // Update-shaped emissions: the key's final ranking is its max-gen rows
    val emitted = spark.table("stopk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val maxGen = emitted.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max }
    val got = emitted
      .filter { case (k, g, _, _, _) => maxGen(k) == g }
      .map { case (k, _, rank, id, v) => (k, rank, id, v) }
      .sortBy { case (k, rank, _, _) => (k, rank) }
    val want = graft.operators.IncrementalAgg.fullTopK(
        rows.toSeq.toDF("key", "id", "v").withColumn("w", lit(1L)),
        Seq("key"), col("w"), col("id"), col("v"), k = 3)
      .orderBy("key", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming transitions == batch e10 counts across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("event_type"))
      .as[StreamingOps.TransIn].collect()
      .sortBy(e => (e.tsMicros, e.event_id)) // append-only per-user contract
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[StreamingOps.TransIn]
    val q = StreamingOps.transitionsStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("strans").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("strans")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = EventQueries.e10Transitions(spark, sfDir)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming first-seen == batch w7 running distinct across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1990-01-01"))).cast("int").as("dayN"))
      .as[StreamingOps.FirstSeenIn].collect()
      .sortBy(_.dayN) // chronological micro-batches — the ingest contract
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[StreamingOps.FirstSeenIn]
    val q = StreamingOps.firstSeenStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("sfseen").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    // exactly one emission per (type, user): the key's first day
    val seen = spark.table("sfseen")
    assert(seen.groupBy("event_type", "user_id").count().where(col("count") > 1).isEmpty)
    // aggregated to (type, day) new-user counts + running sum == batch w7
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = seen
      .select(col("event_type"),
        date_add(to_date(lit("1990-01-01")), col("dayN")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("new_users"))
      .select(col("event_type"), col("day"), col("new_users"),
        sum("new_users").over(w).as("cum_users"))
      .orderBy("event_type", "day").collect().map(_.toString).toSeq
    val want = WindowQueries.w7RunningDistinct(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("stream-static LSH == batch d14 pairs across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.queries.DedupQueries
    implicit val sqlCtx = spark.sqlContext

    // the persisted artifacts: band index + per-doc shingle-hash arrays
    val corpusDocs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("corp_id"), col("text"))
    val corpusSh = DedupQueries.lshShingles(corpusDocs, "corp_id")
    val bandIndex = DedupQueries.lshBands(corpusSh, "corp_id")
      .localCheckpoint(true) // static for the whole run, computed once
    val shingleIndex = corpusSh.groupBy("corp_id")
      .agg(collect_list("sh64").as("corp_sh")).localCheckpoint(true)

    val inc = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("in_id"),
        concat(col("text"), lit(" updated revision two")).as("text"))
      .as[(Long, String)].collect()
    val (b1, rest) = inc.splitAt(inc.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamStaticLsh(
        mem.toDS().toDF("in_id", "text"), bandIndex, shingleIndex)
      .writeStream.format("memory").queryName("slsh").outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("slsh").orderBy("in_id", "corp_id")
      .collect().map(_.toString).toSeq
    val want = DedupQueries.d14IncrementalLsh(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("stream-static semantic decontamination == batch s11; planted eval clone flagged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.queries.SimilarityQueries
    implicit val sqlCtx = spark.sqlContext

    // the batch fit's own centroids — stream assignment must be bit-equal
    val cents = SimilarityQueries.kmCentroids(spark, sfDir)
    val index = SimilarityQueries.s11EvalIndex(spark, sfDir, cents).cache()
    index.count() // materialize the static side once, not per micro-batch

    val train = SimilarityQueries.ivfEmb(spark, sfDir)
      .where(col("vec_id") % 20 =!= 0)
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    // planted contamination: an exact clone of the LOWEST eval id under a
    // fresh train-shaped id — distance 0, must be flagged by its source
    val evalRow = SimilarityQueries.ivfEmb(spark, sfDir)
      .where(col("vec_id") % 20 === 0).orderBy("vec_id")
      .select(col("vec_id"), col("v")).collect().head
    val plantedId = 900001L
    val rows = train :+ ((plantedId, evalRow.getSeq[Double](1).toArray))

    val mem = MemoryStream[(Long, Array[Double])]
    val q = StreamingOps.streamStaticSemanticDecontam(
        mem.toDS().toDF("vec_id", "embedding"), cents, index)
      .writeStream.format("memory").queryName("sdecon").outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sdecon").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

    val planted = got.find(_._1 == plantedId)
    assert(planted.nonEmpty && planted.get._4 == evalRow.getLong(0),
      s"planted eval clone must be flagged by its source: $planted")

    // real-slice verdicts ≡ batch s11, bit-for-bit
    val batch = SimilarityQueries.s11SemanticDecontam(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.filterNot(_._1 == plantedId) == batch)
    index.unpersist()
  }

  test("batch sessionization totals are exact decimal sums (order-independent)") {
    val df = EventQueries.e3Sessions(spark, sfDir)
    val total = df.agg(sum(col("total_value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    val direct = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(math.abs(total - direct) < 1e-9)
  }
}
