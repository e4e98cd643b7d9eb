package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q291 cost-split profiler (dev tool, r15): times the three
  * phases of the brute cross-modal gate separately at sf0.1 — image
  * decode+dHash (broadcast side), caption feature build, and the full
  * gate (adds the 3.6M-pair qdot + heap top-k) — so the bench profile
  * note states where the seconds go instead of guessing. */
object XmodalProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit =
      for (r <- 1 to 3) {
        val s0 = System.nanoTime()
        val n = f
        println(f"[xmprof] $label rep$r: ${(System.nanoTime() - s0) / 1e9}%.2f s (n=$n)")
      }
    t("image decode+dhash")(multimodal.Multimodal.imageFeatures(spark, dir).count())
    t("caption features")(multimodal.Multimodal.captionFeatures(spark, dir).count())
    t("full q291")(multimodal.Multimodal.q291.fn(spark, dir).count())
    spark.stop()
  }
}
