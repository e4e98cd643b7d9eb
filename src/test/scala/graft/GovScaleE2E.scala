package graft

import org.apache.spark.sql.SparkSession

/** Sweep-scale governance E2E driver (dev tool, r15 verdict item #4):
  * the ScaleSpec bench-scale lifecycle test (~5.5k docs) scaled by a
  * command-line replication factor — fixture landing replicated with
  * disjoint id ranges through the REAL Governance.run (01→04), then
  * layer counts checked closed-form and the Solr-XML export parsed
  * with a namespace-aware SAX pass. Prints one summary line per run
  * for SCALING_r15. */
object GovScaleE2E {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(1200) // 23 docs/rep
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = getClass.getResourceAsStream("/graft/gov/landing.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    val idRe = """"id": (\d+)""".r
    val big = (0 until reps).flatMap { r =>
      lines.map(l => idRe.replaceAllIn(l,
        m => s""""id": ${m.group(1).toLong + r.toLong * 100000L}"""))
    }
    val out = java.nio.file.Files.createTempDirectory("graft_gov_e2e5x").toString
    val landing = s"$out/01_landing.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(landing),
      big.mkString("\n").getBytes("UTF-8"))
    val t0 = System.nanoTime()
    val layers = graft.pipeline.Governance.run(spark, landing, out,
      graft.gov.Fixtures.lookups, graft.gov.Fixtures.instanceEcollection,
      graft.gov.Fixtures.dbInstanceEcollection, graft.gov.Fixtures.temas,
      nowYear = 2026)
    val dt = (System.nanoTime() - t0) / 1e9
    val iahxN = spark.read.parquet(layers.iahx).count()
    val enrN = spark.read.parquet(layers.enriched).count()
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setNamespaceAware(true)
    var docTags = 0L
    f.newSAXParser().parse(new java.io.File(layers.xml),
      new org.xml.sax.helpers.DefaultHandler {
        override def startElement(uri: String, local: String, q: String,
            a: org.xml.sax.Attributes): Unit = if (q == "doc") docTags += 1
      })
    val ok = iahxN == 21L * reps && enrN == iahxN && docTags == iahxN
    println(f"[gove2e] landing=${big.size} docs reps=$reps run=$dt%.1f s " +
      f"02=$iahxN 03=$enrN xml_docs=$docTags expected=${21L * reps} ok=$ok")
    // keep the tree only on failure, for diagnosis
    if (ok) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
        .asScala.toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } else println(s"[gove2e] MISMATCH — layers kept at $out")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
