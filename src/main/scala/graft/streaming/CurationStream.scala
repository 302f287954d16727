package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Text
import graft.queries.{DedupQueries, SamplingQueries}

/** v11: STREAMING incremental curation — the serve twin of the batch v10
  * flagship (`CorpusQueries.v10Pipeline`). v10 curates a corpus at rest;
  * production crawls arrive continuously, and re-running the batch
  * pipeline per crawl drop re-pays the whole corpus every time. This
  * operator runs the increment-shaped form of every v10 stage as ONE
  * checkpointed stream:
  *
  *   1. exact dedup Δ-vs-index (d9's shape): the micro-batch anti-joins
  *      the STATIC corpus fingerprint index — stateless stream-static.
  *   2. near-dup Δ-vs-index (d14's shape): the batch's own band keys probe
  *      the static band index; candidates verify exact Jaccard against
  *      the static shingle index; hits drop. The corpus is never
  *      re-banded.
  *   3. quality gate (t11's frozen hashed-feature linear model): per-row
  *      scoring against broadcast weights — a frozen model is the ONLY
  *      stream-safe gate (v10's corpus-relative LM floor depends on
  *      whole-corpus statistics and belongs to the batch re-curation).
  *   4. incremental packing (n10's shape): survivors fold onto the
  *      per-shard open-bin state carried from the PREVIOUS batch.
  *
  * Architecture: `foreachBatch` + idempotent partitioned sink + an
  * explicit O(shards) state table — the standard Structured Streaming
  * pattern when a pipeline needs full batch semantics (multi-join
  * verify, aggregation) per micro-batch plus a small carried state.
  * Stages 1–3 are PURE per-doc functions of (doc, static indexes), so
  * they need no cross-batch state at all; the pack state is two longs
  * per shard, written per batch as `state/v=<batchId>` (deterministic
  * content ⇒ a replayed batch overwrites its own state and output
  * partition byte-identically — exactly-once without a transactional
  * sink). Assignments land partitioned by batch id under the dynamic
  * partition-overwrite the session already runs.
  *
  * Ordering contract (inherited from n10/packStream): doc_ids arrive
  * nondecreasing per shard across batches — the append-only crawl-output
  * contract. Within a batch the fold sorts, so intra-batch order never
  * matters. Increment-internal exact/near dedup is the batch operator's
  * job (same contract as the d9/d14/d16 twins): verdicts here are
  * Δ-vs-BASE.
  *
  * At 100 TB: the static indexes are the compact projections (fp rows,
  * band rows, shingle arrays), bucketed on their join keys for
  * co-located per-batch probes; per-batch cost is O(Δ·bands +
  * candidates) like d14; state is O(shards); nothing re-touches the
  * corpus. `CurationStreamSpec` pins stream ≡ one-shot batch across
  * micro-batch splits and restarts.
  */
object CurationStream {

  val Budget = 256L
  val Shards = 8
  val JaccardTau = 0.5

  /** Static base-corpus indexes the stream probes (built once, refreshed
    * by the nightly batch re-curation).
    */
  final case class BaseIndexes(fpIndex: DataFrame, bandIndex: DataFrame, shingleIndex: DataFrame)

  /** Build the three probe indexes from a curated base (doc_id, text). */
  def buildIndexes(base: DataFrame): BaseIndexes = {
    val b = base.select(col("doc_id").as("corp_id"), col("text"))
    val fp = b.select(md5(Text.normText(col("text"))).as("fp"), col("corp_id"))
      .groupBy("fp").agg(min("corp_id").as("corp_id"))
    val sh = DedupQueries.lshShingles(b, "corp_id")
    BaseIndexes(
      fpIndex = fp,
      bandIndex = DedupQueries.lshBands(sh, "corp_id"),
      shingleIndex = sh.groupBy("corp_id")
        .agg(array_distinct(sort_array(collect_list("sh64"))).as("corp_sh")))
  }

  private def shardCol = pmod(
    Text.md5Long(concat(lit("n9s:"), col("doc_id").cast("string"))), lit(Shards.toLong))
    .cast("int").as("shard")

  /** One curation step over a (doc_id, text) batch: gates 1–3 then the
    * state-seeded pack. Returns (assignments, new per-shard state).
    * Pure batch DataFrame ops — reused verbatim by the spec's one-shot
    * batch reference, which is what makes the equivalence assertion
    * meaningful rather than circular: the CLAIM under test is that
    * splitting the input across micro-batches and restarts changes
    * nothing, and only the state carry can break it.
    */
  def curateBatch(inc: DataFrame, idx: BaseIndexes, state: DataFrame,
                  budget: Long = Budget): (DataFrame, DataFrame) = {
    val spark = inc.sparkSession
    // 1. exact Δ-vs-index
    val exactOk = inc.withColumn("fp", md5(Text.normText(col("text"))))
      .join(idx.fpIndex.select("fp"), Seq("fp"), "left_anti")
      .drop("fp")
    // 2. near-dup Δ-vs-index: band probe + exact-Jaccard verify
    val incSh = DedupQueries.lshShingles(exactOk, "doc_id")
    val cand = DedupQueries.lshBands(incSh, "doc_id")
      .join(idx.bandIndex, Seq("band", "key"))
      .select("doc_id", "corp_id").distinct()
    val incSets = incSh.groupBy("doc_id")
      .agg(array_distinct(sort_array(collect_list("sh64"))).as("in_sh"))
    val nearDup = cand.join(incSets, "doc_id").join(idx.shingleIndex, "corp_id")
      .withColumn("i", size(array_intersect(col("in_sh"), col("corp_sh"))))
      .where(col("i") * lit(1.0) /
        (size(col("in_sh")) + size(col("corp_sh")) - col("i")) >= JaccardTau)
      .select("doc_id").distinct()
    val nearOk = exactOk.join(nearDup, Seq("doc_id"), "left_anti")
    // 3. frozen t11 model: hashed-feature linear score ≥ 0 keeps
    val B = 1024
    val weights = broadcast(spark.range(B).select(
      col("id").as("bucket"),
      (pmod(Text.md5Long(concat(lit("w:"), col("id").cast("string"))), lit(2001L)) - 1000L).as("w")))
    val keptIds = nearOk.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), pmod(Text.md5Long(col("tok")), lit(B.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
      .join(weights, "bucket")
      .groupBy("doc_id").agg(sum(col("c") * col("w")).as("score"))
      .where(col("score") >= 0).select("doc_id")
    val kept = nearOk.join(keptIds, "doc_id")
    // 4. pack survivors from the carried per-shard state
    val docs = kept.select(col("doc_id"), shardCol,
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val seeded = docs.join(broadcast(state), Seq("shard"), "left")
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        coalesce(col("bin"), lit(0L)).as("bin0"),
        coalesce(col("used"), lit(budget + 1)).as("used0"))
    val asg = SamplingQueries.packLinear(seeded, budget, Shards)
    (asg, mergeState(state, asg, budget))
  }

  /** Fold a pack output into the carried state: per shard the open bin is
    * the max bin id and its fill is that bin's token sum (+ the previous
    * fill when the batch only topped up the still-open bin); untouched
    * shards pass through.
    */
  private[graft] def mergeState(state: DataFrame, asg: DataFrame, budget: Long): DataFrame = {
    val lastBin = asg.groupBy("shard").agg(max("bin").as("bin_last"))
    val lastFill = asg.join(lastBin, "shard").where(col("bin") === col("bin_last"))
      .groupBy("shard", "bin_last").agg(sum("n_tokens").as("s"))
    state.join(lastFill, Seq("shard"), "full")
      .select(col("shard"),
        coalesce(col("bin_last"), col("bin")).as("bin"),
        when(col("bin_last").isNull, col("used"))
          .when(col("bin_last") === coalesce(col("bin"), lit(0L)),
            coalesce(col("used"), lit(budget + 1)) + col("s"))
          .otherwise(col("s")).as("used"))
  }

  /** Per-shard (bin, used) state of an already-curated base corpus — the
    * stream's initial state (v10's final pack left these bins open).
    */
  def basePackState(base: DataFrame, budget: Long = Budget): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val docs = base.select(col("doc_id"), shardCol,
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val asg = SamplingQueries.packLinear(
      docs.withColumn("bin0", lit(0L)).withColumn("used0", lit(budget + 1)), budget, Shards)
    mergeState(Seq.empty[(Int, Long, Long)].toDF("shard", "bin", "used"), asg, budget)
  }

  /** Latest committed state strictly BEFORE `batchId` — what a replayed
    * batch must re-read so its overwrite is byte-identical.
    */
  private def stateBefore(spark: SparkSession, stateDir: String, batchId: Long): Option[DataFrame] = {
    val vs = graft.sources.FsUtil.listDir(spark, stateDir)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).filter(_ < batchId)
    if (vs.isEmpty) None else Some(spark.read.parquet(s"$stateDir/v=${vs.max}"))
  }

  /** Run the checkpointed stream over a parquet-file source of
    * (doc_id, text) increments until all available data is processed
    * (`Trigger.AvailableNow` — re-invoke per crawl drop; the checkpoint
    * resumes across invocations and crashes).
    */
  def run(spark: SparkSession, srcDir: String, outDir: String, stateDir: String,
          ckDir: String, idx: BaseIndexes, initState: DataFrame,
          budget: Long = Budget): Unit = {
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val state = stateBefore(sp, stateDir, batchId).getOrElse(initState)
        val (asg, newState) = curateBatch(batch.toDF(), idx, state, budget)
        // dynamic mode PER WRITE: a replayed batch must overwrite only its
        // own batch= partition; on a vanilla session (static default) this
        // mode(overwrite) would truncate every earlier batch's output
        asg.withColumn("batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(outDir)
        newState.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
  }
}
