package graft

/** Dump `explain("formatted")` for named queries into `plans/r18/` —
  * the optimization round's before/after plan evidence.
  *
  * Run: `java -cp ... graft.PlanDump <suffix> <query> [query...]`
  * writes `plans/r18/<query>_<suffix>.txt` (suffix = before | after).
  * SF dir comes from SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale,
  * so join-strategy choices match what the battery actually runs).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.PlanDump <suffix> <query> [query...]")
    val suffix = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.prepare(GraftSession.local("graft-plandump"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r18"))
    args.drop(1).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r18/${n}_$suffix.txt"),
        Plans.collapseRepeats(plan).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/r18/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
