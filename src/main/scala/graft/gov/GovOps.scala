package graft.gov

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Q

/** Gate queries for the governance layer: the fixture corpus through the
  * full 02+02_x01 transform, flattened to scalar columns and compared to
  * the golden oracle (GovOracle — VALUES computed by running the
  * REFERENCE's own python on the same fixtures; tools/golden.py).
  */
object GovOps {

  /** '|'-joined array, NULL when empty (the drop-if-empty contract). */
  private def jn(c: Column): Column =
    when(size(c) > 0, array_join(c, "|"))

  private def iahx(s: SparkSession): DataFrame = Gov.fixtureIahx(s)

  val q40 = Q.sql("q40_iahx_biblio", GovOracle.q40) { (s, _) =>
    iahx(s).select(
      col("id"), col("id_pk"), col("fo"), col("lo"), jn(col("pg")).as("pg"),
      col("book_title"), col("da"), col("dp"), col("entry_date"),
      col("update_date"), col("status_fiadmin"), col("weight"),
      jn(col("vi")).as("vi"), col("is").as("issn"), col("ta"), col("aid"),
      col("cc"), col("ed"), col("cy"), col("pu"), col("tombo"),
      jn(col("la")).as("la"), jn(col("database")).as("dbase"),
      jn(col("db")).as("db"),
      jn(element_at(col("ti"), "pt")).as("ti_pt"),
      jn(element_at(col("ti"), "en")).as("ti_en"),
      jn(element_at(col("ti"), "es")).as("ti_es"),
      element_at(col("ab"), "pt").as("ab_pt"),
      element_at(col("ab"), "en").as("ab_en"),
      jn(array_sort(col("type"))).as("doctype"),
      col("ec"), col("no_indexing"),
      jn(col("alternate_id")).as("alternate_id"),
      jn(col("related_research")).as("related_research"),
      jn(col("ot")).as("ot"), jn(col("ta_var")).as("ta_var"),
      jn(col("ta_fascic")).as("ta_fascic"),
      col("nivel_tratamento"), col("ip"))
      .orderBy("id")
  }

  val q41 = Q.sql("q41_iahx_authors", GovOracle.q41) { (s, _) =>
    iahx(s).select(
      col("id"), jn(col("au")).as("au"), jn(col("af")).as("af"),
      jn(col("afiliacao_autor")).as("afiliacao_autor"),
      jn(col("pais_afiliacao")).as("pais_afiliacao"),
      jn(col("instituicao_pais_afiliacao")).as("instituicao_pais_afiliacao"),
      jn(col("auid")).as("auid"), jn(col("email")).as("email"),
      jn(col("kw")).as("kw"), jn(col("ai")).as("ai"),
      jn(array_sort(col("cp"))).as("cp"), col("pais_publicacao"))
      .orderBy("id")
  }

  val q42 = Q.sql("q42_iahx_tags", GovOracle.q42) { (s, _) =>
    iahx(s).select(
      col("id"), jn(col("ct")).as("ct"), jn(col("pt")).as("pt"),
      jn(col("mj")).as("mj"), jn(col("mh")).as("mh"),
      jn(col("tema_susdigital_programas")).as("tema_susdigital_programas"),
      jn(col("tema_susdigital_publico_alvo")).as("tema_susdigital_publico_alvo"),
      jn(col("tag_comunidade")).as("tag_comunidade"),
      jn(col("tag_colecao")).as("tag_colecao"),
      col("th_in"), jn(col("th_le")).as("th_le"), col("th_ti"),
      jn(col("ur")).as("ur"),
      jn(col("ur_multimedia")).as("ur_multimedia"),
      jn(col("ur_audio")).as("ur_audio"),
      jn(col("ur_meta")).as("ur_meta"),
      col("fulltext"),
      jn(col("descritores_locais")).as("descritores_locais"))
      .orderBy("id")
  }

  /** Layer-03 enrichment (J4/J5/J6) on the fixture corpus; expected
    * values hand-computed from Fixtures.{instanceEcollection,
    * dbInstanceEcollection, temas}. All set-valued outputs sorted (the
    * reference's $setUnion order is unspecified). */
  val q43 = Q.sql("q43_enrich",
    """SELECT * FROM (VALUES
      |  ('biblio-1002', NULL, NULL, NULL, 'fonte2', NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1003', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1004', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1005', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1006', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1009', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1010', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1011', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1013', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1014', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1015', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1016', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1017', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1018', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1019', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1020', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1021', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1022', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('biblio-1023', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('lil-777', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      |  ('lil-839300', 'LILACS-DB|lilacs', 'bvs|enfermagem|regional|regional2',
      |   'fonte1|lilacs', NULL, 'valor1|valor2', 'x', 'v1|v2', 'v3', 'p1')
      |) AS t(id, db, instance, cola, colb, proj, area, tagx, tagy, ctx1)
      |ORDER BY id""".stripMargin) { (s, _) =>
    val enriched = Enrich(s, iahx(s),
      graft.gov.Fixtures.instanceEcollection,
      graft.gov.Fixtures.dbInstanceEcollection,
      graft.gov.Fixtures.temas)
    def dynCol(k: String) = jn(array_sort(element_at(col("dyn"), k)))
    enriched.select(
      col("id"),
      jn(array_sort(col("db"))).as("db"),
      dynCol("instance").as("instance"),
      dynCol("colA").as("cola"),
      dynCol("colB").as("colb"),
      dynCol("proj").as("proj"),
      dynCol("area").as("area"),
      dynCol("tagX").as("tagx"),
      dynCol("tagY").as("tagy"),
      dynCol("ctx1").as("ctx1"))
      .orderBy("id")
  }

  /** K1 — each fixture doc serialized to its `<doc>` XML, compared to the
    * reference's own ElementTree output (golden.py `to_xml`). Newlines
    * normalized to literal `\n` on both sides. */
  val q44 = Q.sql("q44_solr_xml", GovOracle.q44) { (s, _) =>
    import s.implicits._
    Gov.toIahx(Gov.fixtureLanding(s), Fixtures.lookups, 2026)
      .map(d => (d.id, SolrXml.docXml(d)))
      .toDF("id", "xml")
      .withColumn("xml", regexp_replace(col("xml"), "\n", "\\\\n"))
      .orderBy("id")
  }

  /** K1+S5 roundtrip: export the corpus to a single `<add>` file, parse
    * it back with the StAX source, count fields per doc. */
  val q46 = Q.sql("q46_xml_roundtrip", GovOracle.q46) { (s, _) =>
    import s.implicits._
    val ds = Gov.toIahx(Gov.fixtureLanding(s), Fixtures.lookups, 2026)
    // deterministic repo-local path (the returned DF parses the file
    // LAZILY, so it can't be deleted here; a fixed name overwritten per
    // run bounds the footprint to one file instead of one per invocation)
    val dir = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_TMP",
      s"${System.getProperty("user.dir")}/.tmp"), "graft_q46_xml")
    java.nio.file.Files.createDirectories(dir)
    val file = dir.resolve("export.xml").toString
    // pid-staged + atomic replace: a concurrent bench/verify pair writes
    // byte-identical content, so a reader sees a complete old or new
    // file, never a mid-write truncation
    val stage = dir.resolve(s"export.xml.stage-${ProcessHandle.current().pid()}")
    SolrXml.writeSingleFile(ds, stage.toString)
    java.nio.file.Files.move(stage, java.nio.file.Paths.get(file),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.ingest.XmlSource.read(s, file)
      .map(d => (d.id, d.fields.valuesIterator.map(_.size).sum.toLong))
      .toDF("id", "n_fields")
      .orderBy("id")
  }

  /** K1/K2 serve path as a driver gate: the SHARDED `<add>` export (the
    * 100 TB path — q44 pins only the per-doc XML, q46 the single-file
    * roundtrip). Shard layout is deterministic: murmur3(id) % 3 with a
    * within-shard id sort. Pins, per shard: StAX-parsed doc count
    * (well-formedness included), and globally that (a) concatenating the
    * shard bodies in part order — envelopes stripped, exactly the K2
    * manifest's documented concat rule — byte-equals the single-file
    * export body, and (b) the manifest lists every shard with its true
    * on-disk size and total. Counts are pinned constants: the fixture
    * corpus (21 docs) and Spark's murmur3 are both fixed. */
  val q144 = Q.sql("q144_sharded_export",
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (CAST(1 AS BIGINT), CAST(4 AS BIGINT), true, true),
      |  (CAST(2 AS BIGINT), CAST(11 AS BIGINT), true, true)
      |) AS t(shard, n_docs, concat_equals_single, manifest_matches)
      |ORDER BY shard""".stripMargin) { (s, _) =>
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val ds = Gov.toIahx(Gov.fixtureLanding(s), Fixtures.lookups, 2026)
      .repartition(3, col("id"))
      .sortWithinPartitions("id")
    // the gate's result rows are fully materialized below (local Seq →
    // toDF), so the export tree can be deleted before returning — every
    // gate/verify/bench invocation used to leak a full XML tree in the
    // system tmpdir
    val tmp = java.nio.file.Files.createTempDirectory("graft_shardgate")
    try {
    val dir = tmp.resolve("xml").toString
    SolrXml.writeSharded(ds, dir)
    SolrXml.writeHandoffManifest(ds, dir)
    val single = tmp.resolve("single.xml").toString
    SolrXml.writeSingleFile(ds, single)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0)
      .sortBy(_.getName)
    def lines(p: String): Seq[String] =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p),
        java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq
    // strip the per-file envelope: XML declaration + <add> (2 lines), </add> (1)
    def body(p: String): Seq[String] = lines(p).drop(2).dropRight(1)
    val concatEq =
      parts.toSeq.flatMap(f => body(f.getPath)) == body(single)
    val manifest = lines(s"$dir/manifest.json").mkString("\n")
    val manifestOk = parts.forall(p =>
      manifest.contains(s""""name": "${p.getName}", "bytes": ${p.length()}""")) &&
      manifest.contains(s""""total_bytes": ${parts.map(_.length()).sum}""")
    parts.toSeq.zipWithIndex.map { case (f, i) =>
      (i.toLong, graft.ingest.XmlSource.read(s, f.getPath).count(),
        concatEq, manifestOk)
    }.toDF("shard", "n_docs", "concat_equals_single", "manifest_matches")
      .orderBy("shard")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  val all: Seq[Q] = Seq(q40, q41, q42, q43, q44, q46, q144)
}
