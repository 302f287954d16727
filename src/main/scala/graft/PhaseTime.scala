package graft

/** Print QueryPlanningTracker phase durations (analysis / optimization /
  * planning) plus wall-clock for a named query — separates driver-side
  * Catalyst cost from execution cost (guide §7.3: "nothing seems to be
  * happening" = driver work).
  *
  * Run: `java -cp ... graft.PhaseTime <query> [sfDir] [reps]`
  */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val sample = sys.env.get("GRAFT_PHASE_SAMPLE").exists(_ == "1")
    val spark = GraftSession.prepare(GraftSession.local("graft-phase"))
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).queryExecution.toRdd.count() // warm

    // in-process main-thread sampler (external attach is blocked in the
    // sandbox): histogram the deepest interesting frame every 15 ms
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        val key = st.iterator
          .map(_.toString)
          .filter(f => f.contains("org.apache.spark.sql") || f.contains("graft"))
          .take(3).mkString(" <- ")
        if (key.nonEmpty) hist.merge(key, 1, (a, b) => a + b)
        Thread.sleep(15)
      }
    })
    if (sample) { sampler.setDaemon(true); sampler.start() }

    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val qe = df.queryExecution
      val t1 = System.nanoTime()
      qe.toRdd.count()
      val tExec = (System.nanoTime() - t1) / 1e9
      val phases = qe.tracker.phases.map { case (k, v) =>
        f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.2fs"
      }.mkString(" ")
      println(f"rep $r: build=$tBuild%.2fs execPath=$tExec%.2fs [$phases]")
    }
    if (sample) {
      sampling = false
      import scala.jdk.CollectionConverters._
      println("--- top sampled frames (15 ms ticks) ---")
      hist.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
        println(f"$v%4d  $k")
      }
    }
    spark.stop()
  }
}
