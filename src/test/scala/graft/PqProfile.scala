package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the PQ gate (dev tool). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[pqprof] $label: ${(System.nanoTime()-s)/1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"== repeat $rep ==")
      val e = Tables.embeddings(spark, dir)
      val en = t("normalize+checkpoint") {
        operators.Pq.normalized(e).localCheckpoint(true) }
      val cb = t("trainCodebook") { operators.Pq.trainCodebook(en) }
      val codes = operators.Pq.encode(en, cb)
        .withColumnRenamed("vec_id", "neighbor_id")
      t("encode+xor(no prune)") {
        codes.agg(bit_xor(col("codes"))).collect() }
      val qs = en.orderBy("vec_id").limit(50)
        .select(col("vec_id").as("query_id"), col("ne").as("qn"))
      val pairs = codes.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      val adc = functions.Exprs.pq_adc(col("qn"), col("codes"),
        operators.Pq.flatCb(cb), operators.Pq.M, operators.Pq.SUB, operators.Pq.K)
      t("adc scan, xor agg (no prune)") {
        pairs.select(col("query_id"), col("neighbor_id"), adc.as("score"))
          .groupBy("query_id").agg(bit_xor(col("score")).as("x"))
          .agg(bit_xor(col("x"))).collect() }
      t("adcShortlist k=5") {
        operators.Pq.adcShortlist(e, shortlist = 5).count() }
      t("adcShortlist k=20") {
        operators.Pq.adcShortlist(e, shortlist = 20).count() }
      t("adcShortlist k=50") {
        operators.Pq.adcShortlist(e).count() }
      t("adcShortlist k=50 queries=2000") {
        operators.Pq.adcShortlist(e, queries = 2000).count() }
      t("full gate") {
        operators.Pq.q154.fn(spark, dir).count() }
    }
    spark.stop()
  }
}
