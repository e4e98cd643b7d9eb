package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B profiler for the q54 driver-union-find cap (dev tool,
  * r15 verdict item #8): replays the q54 `decisions` pipeline at a
  * sweep fixture with an explicit `driverEdgeCap`, interleaving the
  * candidate caps inside one JVM so GC pressure and JIT state hit both
  * arms equally. Prints the edge count once and per-arm wall seconds. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sweep10x")
    val caps = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(operators.DedupClusters.DriverEdgeCap, 512000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def onePass(cap: Long): Double = {
      val s0 = System.nanoTime()
      val docs = Tables.documents(spark, dir)
        .select($"doc_id", functions.Text.tokenSet($"text").as("ts"))
        .localCheckpoint(true)
      val pairs = operators.SetSimJoin
        .jaccardPairs(spark, docs, 0.9, filterOnRounded = false)
        .select("id_a", "id_b")
        .localCheckpoint(true)
      println(f"[dedupprof] cap=$cap pair build: ${(System.nanoTime() - s0) / 1e9}%.2f s (${pairs.count()} pairs)")
      val s1 = System.nanoTime()
      val comps = operators.DedupClusters
        .connectedComponents(spark, pairs, driverEdgeCap = cap)
      val n = docs.select($"doc_id")
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("component", coalesce($"label", $"doc_id"))
        .withColumn("keep", $"component" === $"doc_id")
        .filter($"keep").count()
      val dt = (System.nanoTime() - s1) / 1e9
      println(f"[dedupprof] cap=$cap components+keep: $dt%.2f s (kept $n)")
      dt
    }
    for (rep <- 1 to 2; cap <- caps) {
      println(s"== repeat $rep cap $cap ==")
      onePass(cap)
    }
    spark.stop()
  }
}
