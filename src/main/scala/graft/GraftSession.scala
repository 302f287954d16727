package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the test harness (local[N], small SF) but every setting is the
  * one we'd ship on a 1000-executor cluster too:
  *  - AQE on (runtime re-plan, skew-join splitting, partition coalescing),
  *  - dynamic partition overwrite (idempotent partitioned re-export; replaces
  *    the reference's delete-then-insert, /root/reference/src/py/yq_dag.py:16-19 + 71-73),
  *  - UTC session time zone (oracle parity + reference uses naive timestamps).
  *
  * `spark.sql.shuffle.partitions` defaults to the local core count; on a real
  * cluster AQE's coalescing makes the initial number mostly a ceiling.
  */
object GraftSession {
  def builder(appName: String = "graft", master: Option[String] = None): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE re-plan INSIDE cached relations: off (the default), a
      // .cache() materializes with the raw spark.sql.shuffle.partitions
      // fan-out, and every downstream consumer — including each broadcast
      // subquery, which is its own job — pays a partition-count-sized task
      // wave to scan a cache whose bytes fit in a handful of partitions.
      // With it on, cache partitioning is byte-adaptive (AQE coalescing),
      // the same §2.2 fewer-larger-partitions rule the rest of the session
      // already applies; at cluster scale big caches stay wide because
      // coalescing targets bytes, not a constant. Measured on the r17
      // single-JVM interleaved A/B at 32 cpus: x18 0.49x, v13 0.46x,
      // d12 0.78x, d21 0.82x, v10 0.94x, s7 0.93x, s8/s9 1.0x, d2 1.13x
      // (the one mild loser; battery-level net is strongly positive).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse") // keep catalog tables out of the repo
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
    master.fold(b)(m => b.master(m))
  }

  /** Local session for tests/benchmarks. */
  def local(appName: String = "graft", cores: Int = 0): SparkSession = {
    val n = if (cores > 0) cores.toString
      else sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString)
    val s = builder(appName, Some(s"local[$n]")).config("spark.sql.shuffle.partitions", n).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Idempotent per-session setup of graft SQL functions (unwrap, graft_dot, …).
    * Guarded on the first function so repeated prepare() calls (every query
    * entry point calls it defensively) don't spam replace-warnings.
    */
  def prepare(spark: SparkSession): SparkSession = {
    val registered = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("unwrap"))
    if (!registered) {
      graft.functions.Yql.register(spark)
      graft.functions.VectorExpressions.register(spark)
      graft.functions.TextExpressions.register(spark)
      graft.functions.BloomExpressions.register(spark)
    }
    spark
  }
}
