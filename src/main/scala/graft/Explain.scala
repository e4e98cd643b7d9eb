package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the executed physical plan of named gate
  * queries (all of them with no names given) — the `.explain` loop the
  * 100 TB review asks for, as a first-class tool instead of an ad-hoc
  * console session. AQE final plans require execution, so each query is
  * run through the noop sink first (same convention as Bench).
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <sfDir> [queryName ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked =
      if (args.length == 1) SparkEntry.allQueries
      else {
        val names = args.tail.toSet
        val known = SparkEntry.allQueries.filter(q => names(q.name))
        val unknown = names -- known.map(_.name).toSet
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        known
      }
    picked.foreach { q =>
      println(s"\n===== ${q.name} =====")
      try {
        val df = q.fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        // formatted mode first (scan details: PushedFilters/ReadSchema,
        // numbered operators — the optimization-round artifact format),
        // then the executed tree (AQE-final shape) for the node list
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        println(df.queryExecution.executedPlan.toString)
      } catch {
        case e: Throwable => println(s"ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
