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

  /** Month partition key (p_upd) as computed from the LANDING side:
    * update_date is X19's `updated_time.take(10).replace("-","")`, so the
    * yyyymm prefix is derivable before the 02 transform — which is what
    * lets the incremental rebuild prune its landing scan. */
  private def landingMonth: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // null/absent updated_time maps to the same 'unknown' bucket the 02
    // write uses for p_upd — without the coalesce a null-dated delta doc
    // lands in the zone but never matches the isin() rebuild filter (and
    // touched.min NPEs on the null month)
    coalesce(
      substring(regexp_replace(substring(col("updated_time"), 1, 10), "-", ""), 1, 6),
      lit("unknown"))
  }

  /** The incremental lifecycle (reference 00_run_all_incremental.py:30-82:
    * trailing-window harvest → landing upsert → rebuild → export), over a
    * `deltaJsonl` batch (the harvest output):
    *
    *  1. last-write-wins upsert into the landing zone (S6);
    *  2. rebuild ONLY the update-month partitions the delta touches — the
    *     months its docs land in plus the months those ids occupied
    *     before (so a doc that moves months leaves no stale row) — and
    *     swap them in with dynamic partition overwrite; partitions
    *     emptied by a move are deleted explicitly (dynamic overwrite
    *     can't replace a partition it writes no rows to);
    *  3. export only partitions ≥ the earliest touched month via the
    *     partition-pruned [[readLayerSince]] scan.
    *
    * Equivalent to a full [[run]] over the merged landing (spec-asserted
    * layer-for-layer) at delta cost: the 02/03 recompute and the export
    * scan touch only changed partitions. Requires a prior full run's
    * layers in `outDir`. */
  def runIncremental(spark: SparkSession, landingJsonl: String,
      deltaJsonl: String, outDir: String, lookups: Lookups,
      instTab: Seq[Enrich.InstRow], dbInstTab: Seq[Enrich.DbInstRow],
      temas: Seq[Enrich.TemaRow], nowYear: Int): Layers =
    runIncrementalDf(spark, landingJsonl,
      Gov.readLanding(spark, deltaJsonl).toDF(), outDir, lookups,
      instTab, dbInstTab, temas, nowYear)

  /** [[runIncremental]] with the delta batch as a DataFrame (landing
    * schema, `abstracts` side) — the form a streaming `foreachBatch`
    * hands over. */
  def runIncrementalDf(spark: SparkSession, landingJsonl: String,
      delta: DataFrame, outDir: String, lookups: Lookups,
      instTab: Seq[Enrich.InstRow], dbInstTab: Seq[Enrich.DbInstRow],
      temas: Seq[Enrich.TemaRow], nowYear: Int): Layers = {
    import org.apache.spark.sql.functions._
    val iahxPath = s"$outDir/02_iahx"
    val enrichedPath = s"$outDir/03_enriched"

    // 1 — merge the harvest batch into the landing zone. The merge is
    // materialized (lineage cut) BEFORE the landing write so the updated
    // zone may overwrite the very path `existing` was read from — which
    // is exactly what happens from the second streaming batch on.
    val existing = Gov.readLanding(spark, landingJsonl).toDF()
    val merged = graft.ingest.Harvest.upsert(existing, delta, "id", "updated_time")
      .localCheckpoint(true)
    val landingPath = s"$outDir/01_landing"
    // back to the wire name (readLanding's schema expects `abstract`)
    merged.withColumnRenamed("abstracts", "abstract")
      .write.mode("overwrite").json(landingPath)

    // 2 — touched months: where the delta docs land now + where their ids
    // lived before (both sides are tiny: distinct yyyymm values). ONE
    // unioned collect (r16): the two separate collects were two driver
    // round-trips per batch, and at 21-doc batch scale each fixed-latency
    // job is a measurable slice of the gate (guide §1.2 — the q98 phase
    // profile shows the batch cost IS the job count).
    import spark.implicits._
    val deltaIds = delta.select("id").distinct()
    // old months are keyed by the TRANSFORMED (iahx) id — derive it for
    // every delta doc, deliberately skipping the F1 gate so an update
    // that gates a doc OUT still cleans its old partition
    val lkB = spark.sparkContext.broadcast(lookups)
    val deltaIahxIds = merged.join(deltaIds, "id").as[Landing](Gov.landingEnc)
      .map(d => Gov.transformDoc(d, lkB.value, nowYear).id)(
        org.apache.spark.sql.Encoders.STRING)
      .toDF("iid")
    val touched = delta.select(landingMonth.as("m"))
      .unionByName(spark.read.parquet(iahxPath)
        .join(deltaIahxIds, col("id") === col("iid"), "left_semi")
        .select(col("p_upd").cast("string").as("m")))
      .distinct().as[String].collect().toSet
    require(touched.nonEmpty, "empty delta batch")

    // rebuild the touched partitions from the MERGED landing frame —
    // already materialized above (lineage cut), so the rebuild reads the
    // checkpoint blocks instead of re-parsing the JSON zone it just
    // wrote (r16; the landing file stays the durable state for the NEXT
    // batch). Value-identical to the old written-file re-read: the full
    // run's 02 feeds toIahx the same un-round-tripped frame, and the
    // incremental≡full layer equivalence is spec-asserted.
    val rebuiltLanding = merged.filter(landingMonth.isin(touched.toSeq: _*))
      .as[Landing](Gov.landingEnc)
    // materialized once: the rebuilt slice feeds the 02 write, the 03
    // enrichment (which scans its docs side three times), and the
    // emptied-partition check — without the checkpoint the per-doc
    // transform re-runs for each. Bounded by the touched months, not
    // the corpus.
    val rebuilt02 = Gov.toIahx(rebuiltLanding, lookups, nowYear).toDF()
      .withColumn("p_upd",
        coalesce(substring(col("update_date"), 1, 6), lit("unknown")))
      .localCheckpoint(true)
    val rebuilt03 = Enrich(spark, rebuilt02.drop("p_upd"), instTab, dbInstTab, temas)
      .withColumn("p_upd",
        coalesce(substring(col("update_date"), 1, 6), lit("unknown")))

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      rebuilt02.write.mode("overwrite").partitionBy("p_upd").parquet(iahxPath)
      rebuilt03.write.mode("overwrite").partitionBy("p_upd").parquet(enrichedPath)
    } finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // delete touched partitions the rebuild wrote no rows to (a month all
    // of whose docs moved away or were gated out)
    val kept = rebuilt02.select(col("p_upd").cast("string")).distinct()
      .as[String].collect().toSet
    val emptied = touched -- kept
    if (emptied.nonEmpty) {
      Seq(iahxPath, enrichedPath).foreach { layer =>
        emptied.foreach { m =>
          val p = new org.apache.hadoop.fs.Path(s"$layer/p_upd=$m")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
      }
    }

    // 3 — delta export: partition-pruned scan from the earliest touched
    // month (the reference's trailing-window export)
    val sinceMonth = touched.min
    val xmlPath = s"$outDir/04_export_delta.xml"
    val deltaDs = readLayerSince(spark, enrichedPath, sinceMonth)
      .as[IahxDoc](Gov.iahxEnc)
    SolrXml.writeSingleFile(deltaDs, xmlPath)

    Layers(landingPath, iahxPath, enrichedPath, xmlPath)
  }

  /** Continuous governance ingestion: the landing drop-folder consumed
    * as a file stream, each micro-batch applied through the incremental
    * lifecycle ([[runIncrementalDf]]: upsert → partition-scoped rebuild
    * → pruned delta export). The reference's weekly batch becomes a
    * standing query; Trigger.AvailableNow here drains what's present and
    * stops, which is also the backfill mode on a cluster. Batches must
    * apply in order (each rebuild reads the previous merge), so
    * foreachBatch — which Structured Streaming serializes — is the
    * correct hook; the landing zone itself is the recovery state: a
    * replayed batch re-upserts the same docs idempotently
    * (last-write-wins on updated_time). Requires a prior full [[run]]'s
    * layers in `outDir`. */
  def runStreamingIngest(spark: SparkSession, dropDir: String,
      initialLandingJsonl: String, outDir: String, lookups: Lookups,
      instTab: Seq[Enrich.InstRow], dbInstTab: Seq[Enrich.DbInstRow],
      temas: Seq[Enrich.TemaRow], nowYear: Int,
      maxFilesPerTrigger: Int = 1): Unit = {
    val mergedLanding = s"$outDir/01_landing"
    // Hadoop FS, not java.io.File: outDir may be HDFS/S3, where a local
    // File.exists is always false and every batch would re-read the seed
    // landing, discarding all prior batches' upserts
    def currentLanding(): String = {
      val p = new org.apache.hadoop.fs.Path(mergedLanding)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        mergedLanding
      else initialLandingJsonl
    }
    val stream = spark.readStream
      .schema(Gov.readSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dropDir)
      .withColumnRenamed("abstract", "abstracts")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          runIncrementalDf(spark, currentLanding(), batch, outDir,
            lookups, instTab, dbInstTab, temas, nowYear)
          ()
        }
      }
      .option("checkpointLocation", s"$outDir/_ingest_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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

  /** S8/streaming gate: the continuous drop-folder lifecycle end-to-end
    * — seed full run, two drop batches (doc 1001 updated twice across
    * batches, one brand-new doc) drained via [[runStreamingIngest]] —
    * then the layer state pinned as (metric, value) rows: landing
    * row/upsert outcomes, 02/03 rebuild counts, the new doc's month
    * partition, and the partition-pruned delta export. Oracle is
    * hand-computed from the 21-doc fixture (like q45/q47): 21 gated docs
    * + 1 new copy of 1002 = 22; the delta export covers months ≥ 202609
    * = {1001, 88888}. Fixture-driven, so the sf dir is unused. */
  val q98 = graft.operators.Q.sql("q98_streaming_ingest",
    """SELECT * FROM (VALUES
      |  ('delta_export_docs', '2'),
      |  ('enriched_rows', '22'),
      |  ('iahx_rows', '22'),
      |  ('landing_1001_updated_time', '2026-09-21T10:00:00'),
      |  ('new_doc_month_rows', '1')
      |) AS t(metric, value) ORDER BY metric""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.functions._
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_q98").toString
    val drop = java.nio.file.Files.createTempDirectory("graft_q98_drop").toString
    val staged = scala.collection.mutable.ArrayBuffer(out, drop)
    runFixture(s, out) // seed full run
    def dropFile(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q98_d").toString
      staged += tmp
      df.withColumnRenamed("abstracts", "abstract")
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".json")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(drop, name))
    }
    val base = Gov.fixtureLanding(s).toDF()
    dropFile(base.filter($"id" === 1001L)
      .withColumn("updated_time", lit("2026-09-20T10:00:00")), "d1.json")
    dropFile(base.filter($"id" === 1001L)
      .withColumn("updated_time", lit("2026-09-21T10:00:00"))
      .unionByName(base.filter($"id" === 1002L)
        .withColumn("id", lit(88888L))
        .withColumn("updated_time", lit("2026-10-02T00:00:00"))), "d2.json")
    runStreamingIngest(s, drop, s"$out/01_landing.jsonl", out,
      Fixtures.lookups, Fixtures.instanceEcollection,
      Fixtures.dbInstanceEcollection, Fixtures.temas, nowYear = 2026)
    val landed = Gov.readLanding(s, s"$out/01_landing").toDF()
    val rows = Seq(
      "delta_export_docs" ->
        graft.ingest.XmlSource.read(s, s"$out/04_export_delta.xml").count().toString,
      "enriched_rows" -> s.read.parquet(s"$out/03_enriched").count().toString,
      "iahx_rows" -> s.read.parquet(s"$out/02_iahx").count().toString,
      "landing_1001_updated_time" ->
        landed.filter($"id" === 1001L).select("updated_time").as[String].head(),
      "new_doc_month_rows" ->
        s.read.parquet(s"$out/02_iahx").filter($"p_upd" === "202610").count().toString)
    // all pinned values are materialized strings now — drop the staged
    // temp trees (a full layer set per invocation would otherwise
    // accumulate across every verify/bench run)
    staged.foreach { dir =>
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    rows.toDF("metric", "value").orderBy("metric")
  }
}
