package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run one named gate query against an sf dir and show the
  * result — `runMain graft.RunOne q72_sessions_tws /root/testdata/sf0.001`. */
/** Dev utility: print the SetSimJoin route chosen for a corpus dir at a
  * threshold — `runMain graft.RouteProbe /root/testdata/sf0.1 0.9`. */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, thr) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), functions.Text.tokenSet(col("text")).as("ts"))
    val n = docs.count()
    val vocab = docs.selectExpr("explode(ts) tok").distinct().count()
    println(s"n=$n vocab=$vocab route=" +
      operators.SetSimJoin.chosenRoute(spark, docs, thr.toDouble).name)
    spark.stop()
  }
}

object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(20, truncate = false)
    println(f"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
