package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the q98 lifecycle gate (dev tool, the
  * PqProfile pattern): splits the gate's wall time into seed rebuild,
  * per-batch incremental rebuilds (called directly), the streaming
  * drop-folder form of the same two batches, and the metric tail — so
  * "two full governance rebuilds + state-store warmup" becomes a
  * measured breakdown instead of a guess (r15 verdict item #6). */
object GovProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.gov.{Fixtures, Gov}
    import graft.pipeline.Governance
    // per-phase JOB COUNT alongside wall time: at 21-doc scale the batch
    // cost is fixed-latency jobs, so the count is the noise-immune
    // measure of a job-fusion change (r16 verdict item 3)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          sites.add(j.stageInfos.lastOption.map(_.name).getOrElse("?")
            .takeWhile(_ != '\n'))
        }
      })
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val j0 = jobs.get(); val r = f
      println(f"[govprof] $label: ${(System.nanoTime() - s) / 1e9}%.2f s" +
        s" (${jobs.get() - j0} jobs)")
      if (sys.env.contains("SPARK_GRAFT_GOVPROF_SITES")) {
        import scala.jdk.CollectionConverters._
        sites.asScala.drop(j0.toInt).foreach(c => println(s"[govprof]    job: $c"))
      }
      r
    }
    for (rep <- 1 to 3) {
      println(s"== repeat $rep ==")
      val out = java.nio.file.Files.createTempDirectory("govprof").toString
      t("seed runFixture")(Governance.runFixture(spark, out))
      val base = Gov.fixtureLanding(spark).toDF()
      val d1 = base.filter($"id" === 1001L)
        .withColumn("updated_time", lit("2026-09-20T10:00:00"))
      val d2 = base.filter($"id" === 1001L)
        .withColumn("updated_time", lit("2026-09-21T10:00:00"))
        .unionByName(base.filter($"id" === 1002L)
          .withColumn("id", lit(88888L))
          .withColumn("updated_time", lit("2026-10-02T00:00:00")))
      t("incremental batch 1 (direct)")(
        Governance.runIncrementalDf(spark, s"$out/01_landing.jsonl", d1, out,
          Fixtures.lookups, Fixtures.instanceEcollection,
          Fixtures.dbInstanceEcollection, Fixtures.temas, 2026))
      t("incremental batch 2 (direct)")(
        Governance.runIncrementalDf(spark, s"$out/01_landing", d2, out,
          Fixtures.lookups, Fixtures.instanceEcollection,
          Fixtures.dbInstanceEcollection, Fixtures.temas, 2026))
      // fresh tree for the streaming form: the same two batches through
      // the AvailableNow drop-folder query — the delta over the direct
      // calls is the streaming machinery (source listing, checkpoint
      // writes, query startup/teardown)
      val out2 = java.nio.file.Files.createTempDirectory("govprof2").toString
      val drop = java.nio.file.Files.createTempDirectory("govprof_drop").toString
      t("seed runFixture #2")(Governance.runFixture(spark, out2))
      def dropFile(df: DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("govprof_d").toString
        df.withColumnRenamed("abstracts", "abstract")
          .coalesce(1).write.mode("overwrite").json(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".json")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(drop, name))
      }
      t("drop-file staging") {
        dropFile(d1, "d1.json"); dropFile(d2, "d2.json")
      }
      t("runStreamingIngest (2 batches)")(
        Governance.runStreamingIngest(spark, drop, s"$out2/01_landing.jsonl",
          out2, Fixtures.lookups, Fixtures.instanceEcollection,
          Fixtures.dbInstanceEcollection, Fixtures.temas, 2026))
      t("metric tail reads") {
        graft.ingest.XmlSource.read(spark, s"$out2/04_export_delta.xml").count()
        spark.read.parquet(s"$out2/03_enriched").count()
        spark.read.parquet(s"$out2/02_iahx").count()
        Gov.readLanding(spark, s"$out2/01_landing").toDF()
          .filter($"id" === 1001L).select("updated_time").as[String].head()
      }
      Seq(out, out2, drop).foreach { dir =>
        val root = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(root)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    spark.stop()
  }
}
