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
    fn(spark, sfDir).count() // warm: codegen + JIT + file listing
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: $dt%.3f s ($n rows)")
      dt
    }
    println(f"$name min-of-$reps: ${times.min}%.3f s")
    spark.stop()
  }
}
