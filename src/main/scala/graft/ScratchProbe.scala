package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary timing probe for the SetSimJoin router stages. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), functions.Text.tokenSet(col("text")).as("ts"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup scan
    time("warmup count")(docs.count())
    val cap = 4096
    time("old probe: distinct+limit") {
      docs.select(explode($"ts").as("tok")).distinct()
        .limit(cap + 1).as[String].collect().length
    }
    time("new probe: treeAggregate") {
      docs.select(explode($"ts").as("tok")).as[String].rdd
        .treeAggregate(new java.util.LinkedHashSet[String]())(
          (set, t) => { if (set.size <= cap) set.add(t); set },
          (a, b) => {
            val it = b.iterator()
            while (it.hasNext && a.size <= cap) a.add(it.next())
            a
          }).size()
    }
    time("count")(docs.count())
    time("full q24") {
      operators.SetSimJoin.jaccardPairs(spark, docs, 0.8).count()
    }
    spark.stop()
  }
}
