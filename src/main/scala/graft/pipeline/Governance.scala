package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gov._

/** The governance lifecycle (SURVEY §3.1) as one driver program — each
  * reference DAG stage becomes a DataFrame stage, stage boundaries become
  * Parquet layer writes, Airflow fan-out disappears into partition
  * parallelism:
  *
  *   01 landing (JSONL)  → 02 iahx (+02_x01 folded in)  → 03 enriched
  *   → 04 Solr-XML export
  *
  * Each layer is drop-and-rebuild from its input (the reference's
  * idempotence model — 02_create…py:715-728, 03_xml_enriched.py:168-175),
  * so re-running any stage is safe; only the landing zone accumulates
  * (via Harvest.upsert).
  */
object Governance {

  case class Layers(landing: String, iahx: String, enriched: String, xml: String)

  def run(spark: SparkSession, landingJsonl: String, outDir: String,
      lookups: Lookups,
      instTab: Seq[Enrich.InstRow], dbInstTab: Seq[Enrich.DbInstRow],
      temas: Seq[Enrich.TemaRow], nowYear: Int): Layers = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(outDir))

    import org.apache.spark.sql.functions.{coalesce, col, lit, substring}
    // Layers are partitioned by update month (p_upd=yyyymm, derived from
    // update_date): at 100 TB a trailing-window incremental export prunes
    // its scan to the changed partitions instead of rescanning the corpus,
    // and the per-month files keep individual partitions executor-sized.
    def writePartitioned(df: DataFrame, path: String): Unit =
      df.withColumn("p_upd",
        coalesce(substring(col("update_date"), 1, 6), lit("unknown")))
        .write.mode("overwrite").partitionBy("p_upd").parquet(path)
    def readLayer(path: String): DataFrame =
      spark.read.parquet(path).drop("p_upd")

    // 02 (+02_x01): standardize
    val iahx = Gov.toIahx(Gov.readLanding(spark, landingJsonl), lookups, nowYear)
    val iahxPath = s"$outDir/02_iahx"
    writePartitioned(iahx.toDF(), iahxPath)

    // 03: enrich
    val enriched = Enrich(spark, readLayer(iahxPath), instTab, dbInstTab, temas)
    val enrichedPath = s"$outDir/03_enriched"
    writePartitioned(enriched, enrichedPath)

    // 04: export (reads the enriched layer back through the typed encoder)
    val xmlPath = s"$outDir/04_export.xml"
    val enrichedDs = readLayer(enrichedPath).as[IahxDoc](Gov.iahxEnc)
    SolrXml.writeSingleFile(enrichedDs, xmlPath)

    Layers(landingJsonl, iahxPath, enrichedPath, xmlPath)
  }

  /** Incremental read of a layer: only partitions with update month ≥
    * `sinceMonth` (yyyymm) are scanned — the engine-side equivalent of
    * the reference's trailing-window incremental export. The filter is a
    * partition filter, so at 100 TB the scan touches only the changed
    * months' files (asserted in PlanSpec). */
  def readLayerSince(spark: SparkSession, path: String,
      sinceMonth: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .filter(col("p_upd") >= sinceMonth)
      .drop("p_upd")
  }

  /** End-to-end over the fixture corpus — the t1-smoke entry point. */
  def runFixture(spark: SparkSession, outDir: String): Layers = {
    // materialize the classpath fixture as a real landing JSONL first
    val in = getClass.getResourceAsStream("/graft/gov/landing.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val landingPath = s"$outDir/01_landing.jsonl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(landingPath),
      lines.mkString("\n").getBytes("UTF-8"))
    run(spark, landingPath, outDir, Fixtures.lookups,
      Fixtures.instanceEcollection, Fixtures.dbInstanceEcollection,
      Fixtures.temas, nowYear = 2026)
  }
}
