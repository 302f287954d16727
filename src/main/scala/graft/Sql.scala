package graft

import org.apache.spark.sql.SparkSession

/** SQL-text entry point (the reference's submission model, C7): register
  * the corpus tables of a scale-factor directory as the federated
  * namespace, run one SQL text, print the result.
  *
  * Usage: `graft.Sql <sfDir> <sql-or-@file> [--out <parquetDir>] [--yql]`
  *
  * The graft dialect surface is preregistered: `unwrap(x)` (YQL
  * Optional→required assert), `graft_dot(a, b)` (vector dot product), plus
  * everything Spark SQL ships. ANTI JOIN pairs express EXCLUSION JOIN
  * (SqlTextSpec shows the shapes) — or pass `--yql` to submit a script in
  * the reference's OWN dialect (`$name = (…);` bindings, `unwrap`,
  * `cast(x as Datetime)`, `EXCLUSION JOIN`, …) through
  * [[graft.yql.YqlFrontend]] unchanged.
  */
object Sql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Sql <sfDir> <sql-or-@file> [--out dir] [--yql]")
    val sfDir = args(0)
    val sql =
      if (args(1).startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1).drop(1))), "UTF-8")
      else args(1)
    val out = args.sliding(2).collectFirst { case Array("--out", d) => d }
    val yql = args.contains("--yql")
    // --param name=value (repeatable): YQL DECLARE parameters, passed as strings
    val params: Map[String, Any] = args.sliding(2).collect {
      case Array("--param", kv) if kv.contains('=') =>
        val Array(k, v) = kv.split("=", 2); (k, v: Any)
    }.toMap

    val spark = GraftSession.prepare(GraftSession.local("graft-sql"))
    sources.Tables.registerAll(spark, sfDir)
    val df =
      if (yql) graft.yql.YqlFrontend.run(spark, sql, params = params).getOrElse {
        println("yql insert completed"); spark.stop(); return
      }
      else spark.sql(sql)
    out match {
      case Some(dir) => df.write.mode("overwrite").parquet(dir); println(s"wrote $dir")
      case None => df.show(100, truncate = false)
    }
    spark.stop()
  }
}
