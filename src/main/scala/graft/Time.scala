package graft

/** Times a single named SparkEntry query (min of `reps`) — the per-query
  * profiling companion to Bench.
  *
  * Run: `java -cp "target/scala-2.13/classes:SPARK_JARS" graft.Time <query> [sfDir] [reps]`
  */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: graft.Time <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.prepare(GraftSession.local("graft-time"))
    val fn = SparkEntry.queries(name)
    // warm + measure via toRdd.count() — EXACTLY what Bench times. The
    // former df.count() here measured a different physical plan (count's
    // aggregate pushdown prunes projections and replans around cached
    // relations), so Time's numbers weren't comparable to the battery's —
    // the r16 v10 A/B read 12.9 s under count() vs 4.3 s for the same
    // query, same host, under the battery's toRdd form.
    fn(spark, sfDir).queryExecution.toRdd.count() // warm: codegen + JIT + file listing + shared caches
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: $dt%.3f s ($n rows)")
      dt
    }
    println(f"$name min-of-$reps: ${times.min}%.3f s")
    spark.stop()
  }
}
