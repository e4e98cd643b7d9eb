package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // dev loop: extra args narrow the dump to the named queries (the
    // driver always passes exactly two, so the gate surface is unchanged).
    // Unknown names fail fast — a typo'd filter must not produce an
    // empty-but-green run.
    val unknown = args.drop(2).filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[verify] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val picked: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.length > 2) SparkEntry.queries.view.filterKeys(args.drop(2).contains).toMap
      else SparkEntry.queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    picked.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // dev loop: full trace on demand — a null getMessage (NPE) is
        // otherwise undiagnosable from the artifact alone
        if (sys.env.contains("SPARK_GRAFT_VERBOSE")) e.printStackTrace()
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    def q(s: String): String = Jsonl.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Fail LOUDLY: an errors.json in the artifact plus a non-zero exit.
    // Round 5 shipped with 30 analysis exceptions swallowed into stderr —
    // the artifact just looked "smaller" and nobody noticed until judging.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} of ${picked.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
