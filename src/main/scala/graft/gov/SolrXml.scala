package graft.gov

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Dataset

/** K1 — Solr-style `<add><doc>` XML export (reference
  * 04_export_xml.py:82-128): one `<field name=k>` per scalar / per array
  * element, field names sorted (stable — per-key value order preserved),
  * `boost` attribute from `weight`, invalid-XML chars scrubbed (X26),
  * ElementTree-compatible 2-space indent and escaping.
  *
  * Quirks kept: `weight` 0 survives the drop-None/''/[] filter (python's
  * `in` uses ==, and 0 equals none of those sentinels) so boost="0" and
  * the field are emitted; set-derived fields (`type`, `cp`) are emitted in
  * sorted order (the reference's set iteration order is
  * PYTHONHASHSEED-dependent — sorted is the deterministic choice, and the
  * golden oracle canonicalizes identically).
  */
object SolrXml {

  private def escText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escAttr(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
      .replace("\r", "&#13;").replace("\n", "&#10;").replace("\t", "&#09;")

  /** Flatten an IahxDoc to its (field, value) pairs with the
    * drop-None/''/[] contract applied; ti/ab/dyn maps expand to their
    * per-language / dynamic field names. */
  def fields(doc: IahxDoc): Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    def s(k: String, v: Option[String]): Unit =
      v.filter(_.nonEmpty).foreach(x => b += k -> x)
    def a(k: String, vs: Seq[String]): Unit =
      if (vs != null) vs.foreach(x => b += k -> x)
    def n(k: String, v: Option[Long]): Unit =
      v.foreach(x => b += k -> x.toString)

    b += "id" -> doc.id
    b += "id_pk" -> doc.id_pk.toString
    a("ai", doc.ai); s("aid", doc.aid); a("alternate_id", doc.alternate_id)
    s("book_title", doc.book_title); s("cc", doc.cc)
    s("cn_co", doc.cn_co); s("cn_cy", doc.cn_cy); s("cn_da", doc.cn_da)
    s("cn_dt", doc.cn_dt); s("cn_in", doc.cn_in); s("cn_na", doc.cn_na)
    a("ct", doc.ct); s("cy", doc.cy); s("da", doc.da)
    a("database", doc.database); a("db", doc.db)
    a("descritores_locais", doc.descritores_locais); s("dp", doc.dp)
    n("ec", doc.ec); s("ed", doc.ed); s("entry_date", doc.entry_date)
    s("ip", doc.ip); s("is", doc.is); s("isbn", doc.isbn)
    a("la", doc.la); s("license", doc.license)
    a("mh", doc.mh); a("mj", doc.mj)
    s("nivel_tratamento", doc.nivel_tratamento); n("no_indexing", doc.no_indexing)
    s("non_decs_region", doc.non_decs_region); s("ntv", doc.ntv)
    a("ot", doc.ot); a("pg", doc.pg)
    s("pr_in", doc.pr_in); s("pr_na", doc.pr_na); s("pr_nu", doc.pr_nu)
    a("pt", doc.pt); s("pu", doc.pu)
    a("related_research", doc.related_research)
    a("related_resource", doc.related_resource)
    s("status_fiadmin", doc.status_fiadmin); s("ta", doc.ta)
    a("ta_fascic", doc.ta_fascic); a("ta_var", doc.ta_var)
    a("tag_comunidade", doc.tag_comunidade); a("tag_colecao", doc.tag_colecao)
    s("th_in", doc.th_in); a("th_le", doc.th_le); s("th_ti", doc.th_ti)
    s("tombo", doc.tombo)
    a("type", doc.`type`.sorted)
    s("update_date", doc.update_date); a("vi", doc.vi)
    b += "weight" -> doc.weight.toString
    s("fo", doc.fo); s("lo", doc.lo)
    doc.ti.foreach { case (lang, vs) =>
      val k = if (lang.isEmpty) "ti" else s"ti_$lang"
      vs.foreach(x => b += k -> x)
    }
    doc.ab.foreach { case (lang, v) =>
      val k = if (lang.isEmpty) "ab" else s"ab_$lang"
      if (v.nonEmpty) b += k -> v
    }
    a("kw", doc.kw); a("au", doc.au); a("af", doc.af)
    a("afiliacao_autor", doc.afiliacao_autor)
    a("instituicao_pais_afiliacao", doc.instituicao_pais_afiliacao)
    a("pais_afiliacao", doc.pais_afiliacao)
    a("auid", doc.auid); a("email", doc.email)
    a("ur", doc.ur); a("ur_MULTIMEDIA", doc.ur_multimedia)
    a("ur_AUDIO", doc.ur_audio); a("ur_meta", doc.ur_meta)
    n("fulltext", doc.fulltext)
    a("cp", doc.cp.sorted)
    s("pais_publicacao", doc.pais_publicacao)
    a("tema_susdigital_programas", doc.tema_susdigital_programas)
    a("tema_susdigital_publico_alvo", doc.tema_susdigital_publico_alvo)
    doc.dyn.toSeq.foreach { case (k, vs) => vs.foreach(x => b += k -> x) }
    // stable sort: python's sorted(doc.keys()) + per-key list order
    b.result().sortBy(_._1)
  }

  /** One `<doc>` element, ElementTree-byte-compatible. */
  def docXml(doc: IahxDoc): String = {
    val fs = fields(doc)
    val boost = doc.weight.toString
    val sb = new StringBuilder
    sb.append(s"""<doc boost="${escAttr(boost)}">""")
    fs.foreach { case (k, v) =>
      val clean = Option(v).map(RefTransforms.removeInvalidXmlChars).getOrElse("")
      if (clean.isEmpty)
        sb.append(s"""\n  <field name="${escAttr(k)}" />""")
      else
        sb.append(s"""\n  <field name="${escAttr(k)}">${escText(clean)}</field>""")
    }
    sb.append("\n</doc>")
    sb.toString
  }

  /** Distributed `<add>` export: every partition writes its own complete,
    * well-formed `<add>` part file — the 100 TB path (no driver
    * bottleneck; the SFTP/concat post-step or the ingest box consumes the
    * shard directory). Round-trips through [[graft.ingest.XmlSource]]. */
  def writeSharded(ds: Dataset[IahxDoc], dir: String): Unit = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<add>") ++
        it.map(docXml _) ++ Iterator("</add>")
    }(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(dir)
  }

  /** K2 hand-off contract (SFTP push is deliberately out-of-engine —
    * SURVEY §7.5: a network side-effect belongs to the scheduler, not a
    * Spark job; a failed push must be retryable without recomputing the
    * export). The engine's side of the contract is this manifest:
    *
    *  1. [[writeSharded]] writes `part-*` shard files, each a complete
    *     well-formed `<add>` document, plus Spark's `_SUCCESS` marker;
    *  2. `writeHandoffManifest` then records every shard (name, bytes)
    *     and the total byte count in `manifest.json` beside them;
    *  3. the ops side (reference: `04_export_xml.py` SFTP step) treats
    *     `_SUCCESS` + `manifest.json` as the ready signal, verifies the
    *     listed sizes after transfer, and either pushes shards as-is
    *     (Solr accepts multiple `<add>` posts) or concatenates
    *     stripping the per-shard XML declaration/`<add>` envelope.
    *
    * Uses the Hadoop FileSystem API so the same code addresses local
    * dirs here and HDFS/object stores on a cluster. */
  def writeHandoffManifest(ds: Dataset[IahxDoc], dir: String): String = {
    val conf = ds.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val shards = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val entries = shards.map(s =>
      s"""    {"name": "${s.getPath.getName}", "bytes": ${s.getLen}}""")
    val json = "{\n  \"shards\": [\n" + entries.mkString(",\n") +
      s"\n  ],\n  \"total_bytes\": ${shards.map(_.getLen).sum}\n}\n"
    val out = new org.apache.hadoop.fs.Path(p, "manifest.json")
    val os = fs.create(out, true)
    try os.write(json.getBytes(StandardCharsets.UTF_8)) finally os.close()
    json
  }

  /** Single-file `<add>` export (reference writes one file then SFTPs it).
    * FIXTURE-SCALE ONLY: streams every partition through the driver's
    * `toLocalIterator` — bounded by driver I/O, not cluster width. It
    * exists because the reference's contract is literally "one file";
    * at corpus scale use [[writeSharded]] + the manifest (q144 pins that
    * concatenating the shards in part order, envelopes stripped,
    * byte-equals this writer's output). */
  def writeSingleFile(ds: Dataset[IahxDoc], path: String): Unit = {
    import ds.sparkSession.implicits._
    // coalesce(1) first: toLocalIterator launches ONE JOB PER PARTITION,
    // and at fixture scale those fixed-latency jobs dominate the export
    // (q98 phase profile, r16). The narrow coalesce concatenates parent
    // partitions in index order — the same order toLocalIterator itself
    // iterates — so the emitted bytes are identical (q144 pins them
    // against the sharded writer).
    val it = ds.coalesce(1)
      .map(docXml _)(org.apache.spark.sql.Encoders.STRING).toLocalIterator()
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    try {
      w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<add>\n")
      while (it.hasNext) { w.write(it.next()); w.write("\n") }
      w.write("</add>")
    } finally w.close()
  }
}
