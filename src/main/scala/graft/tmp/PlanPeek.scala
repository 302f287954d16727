package graft.tmp
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.prepare(graft.GraftSession.local("plan-peek"))
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
