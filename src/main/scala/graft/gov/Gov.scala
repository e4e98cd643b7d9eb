package graft.gov

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Layer 02 (+02_x01) of the governance pipeline as one shuffle-free
  * Spark stage: landing-zone docs → standardized iAHx docs.
  *
  * Architecture choice: the ~30 interdependent per-doc transforms
  * (X1–X19) are a single typed `Dataset.map` with broadcast lookup maps
  * (J1–J3, J7) — embarrassingly parallel, Encoder-backed, zero shuffles;
  * the heavy order-sensitive string formatting (X6/X7/X9) gains nothing
  * from per-column codegen and everything from being one coherent,
  * golden-tested function. Relational shapes (filters, joins, aggs,
  * explodes) stay in the DataFrame API (see operators/ and Enrich/Metrics).
  */
object Gov {

  implicit val landingEnc: ExpressionEncoder[Landing] = ExpressionEncoder[Landing]()
  implicit val iahxEnc: ExpressionEncoder[IahxDoc] = ExpressionEncoder[IahxDoc]()

  /** JSON read schema: the encoder schema with the `abstracts` field
    * renamed back to the wire name `abstract` (a reserved Java identifier
    * the encoder can't carry). */
  private[graft] val readSchema = org.apache.spark.sql.types.StructType(
    landingEnc.schema.fields.map(f =>
      if (f.name == "abstracts") f.copy(name = "abstract") else f))

  /** Read landing-zone JSONL (the S1 "fetch to JSONL then read.json" shape)
    * with the explicit schema — no inference pass at scale. */
  def readLanding(spark: SparkSession, path: String): Dataset[Landing] =
    spark.read.schema(readSchema).json(path)
      .withColumnRenamed("abstract", "abstracts").as[Landing]

  /** The classpath fixture corpus (written by tools/golden.py). */
  def fixtureLanding(spark: SparkSession): Dataset[Landing] = {
    val in = getClass.getResourceAsStream("/graft/gov/landing.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val ds = spark.createDataset(lines)(Encoders.STRING)
    spark.read.schema(readSchema).json(ds)
      .withColumnRenamed("abstract", "abstracts").as[Landing]
  }

  /** F1 input gate (02_create…py:776-779). */
  def gate(ds: Dataset[Landing]): Dataset[Landing] =
    ds.filter { d =>
      d.status.exists(s => s == 0 || s == 1 || s == -2 || s == -3) &&
        d.treatment_level != null && d.treatment_level.nonEmpty
    }

  /** The 02 transform glue (02_create…py:783-999) + the 02_x01 pass
    * (country-name caps + ai rename — the reference runs it as a separate
    * read-modify-write DAG; here it composes into the same map). */
  def toIahx(ds: Dataset[Landing], lookups: Lookups, nowYear: Int): Dataset[IahxDoc] = {
    val sc = ds.sparkSession.sparkContext
    val lk = sc.broadcast(lookups)
    gate(ds).map(d => transformDoc(d, lk.value, nowYear))
  }

  def transformDoc(d: Landing, lk: Lookups, nowYear: Int): IahxDoc = {
    import RefTransforms._

    def opt(s: String): Option[String] = Option(s).filter(_.nonEmpty)
    def seqOf(s: Seq[String]): Seq[String] = if (s == null) Nil else s
    def seqM(s: Seq[Map[String, String]]): Seq[Map[String, String]] =
      if (s == null) Nil else s

    // Key-presence contract: for the presence-sensitive fields (pages, the
    // six author fields, title_monographic, created_time,
    // transfer_date_to_database) a null Seq/String means the key was ABSENT
    // in the landing JSON, while Nil/"" means present-but-empty — mirroring
    // python's `'k' in doc` checks. Everything else treats null ≡ empty
    // (the reference's glue is observably truthiness-equivalent there).

    // 02_create:783-786 — `if 'pages' in doc` is key-presence: a PRESENT
    // empty pages list yields pg=[] (dropped) and pages_monographic unused.
    val pg: Seq[String] =
      if (d.pages != null) standardizePages(d.pages)
      else opt(d.pages_monographic).toSeq

    val titleFields = standardizeMultilingualTitle(d)
    val abstractFields = standardizeAbstract(seqM(d.abstracts))
    val e = standardizeEletronicAddress(d.electronic_address)

    // X10 author-source precedence (02_create…py:802-814): KEY-PRESENCE
    // elif-chain — a present-but-empty earlier field blocks later ones.
    val authorSource = Seq(
      d.individual_author, d.corporate_author,
      d.individual_author_monographic, d.corporate_author_monographic,
      d.individual_author_collection, d.corporate_author_collection)
      .find(_ != null)
    val authors = authorSource.map(standardizeIndividualAuthors(_, lk.country))
      .getOrElse(Authors(Nil, Nil, Nil, Nil, Nil, Nil, Nil))

    val kw = seqM(d.author_keyword).flatMap(_.get("text"))
    val lo = standardizeLocation(seqM(d.call_number))
    // drop-empty contract: an all-empty fo ('c' docs without a city)
    // is dropped like any '' value (02_create…py:998-999)
    val fo = standardizeFo(d).filter(_.nonEmpty)

    // publication_country precedence: own field, else journal-country
    // fallback via title_serial (02_create…py:829-841). Key-absence
    // semantics: publication_country is Option (None = key absent).
    val pubCountry: Option[String] = d.publication_country match {
      case Some(pc) => Some(pc).filter(_ != null)
      case None =>
        lk.titleCountry.get(Option(d.title_serial).getOrElse("").toLowerCase.trim)
          .flatMap(_.headOption)
    }
    val cp = pubCountry.filter(_.nonEmpty)
      .map(standardizeCp(_, lk.country)).getOrElse(Nil)
    val paisPub = pubCountry.filter(_.nonEmpty)
      .flatMap(standardizePaisPublicacao(_, lk.country))
      .map(normalizeAfiliacaoString) // 02_x01 pass

    val ct = seqOf(d.check_tags).flatMap(getDecsMfn(_, lk.decs))
    val ptv = seqOf(d.publication_type).flatMap(getDecsMfn(_, lk.decs))
    val mj = seqM(d.descriptors_primary).flatMap(_.get("text"))
      .flatMap(t => getDecsMfn(t.replace("^d", ""), lk.decs))
    val mh = seqM(d.descriptors_secondary).flatMap(_.get("text"))
      .flatMap(t => getDecsMfn(t.replace("^d", ""), lk.decs))

    var susProg, susAlvo = Vector[String]()
    seqOf(d.community_collection_path).foreach { item =>
      if (item.contains("Programas"))
        extractSusdigitalTheme(item).foreach(susProg :+= _)
      if (item.contains("Alvo"))
        extractSusdigitalTheme(item).foreach(susAlvo :+= _)
    }

    val id = standardizeId(d.id, d.LILACS_original_id)
    val dl: Seq[String] = Option(d.local_descriptors).filter(_.nonEmpty)
      .map(_.split("\\r?\\n", -1).toSeq).getOrElse(Nil)
    val taVar = standardizeTaVar(d, lk.issn, lk.shortTitle)
    val pdn = Option(d.publication_date_normalized).getOrElse("")

    // book_title reads title_monographic AFTER standardize_multilingual_title
    // has run, and the reference's `title_list += title_collection` (tl=='mc',
    // lit in ('mc','m')) MUTATES doc['title_monographic'] in place — but only
    // when the key is PRESENT (an absent key gets a fresh list from
    // doc.get(..., []), so nothing is written back). Replicate both halves.
    val tlLower = d.treatment_level.toLowerCase
    val litLower = Option(d.literature_type).getOrElse("").toLowerCase
    val tmEffective: Seq[Map[String, String]] =
      if (tlLower == "mc" && (litLower == "mc" || litLower == "m") &&
        d.title_monographic != null)
        d.title_monographic ++ seqM(d.title_collection)
      else seqM(d.title_monographic)
    val bookTitle: Option[String] =
      if (tmEffective.nonEmpty && !(
        Seq("T", "N").contains(litLower.toUpperCase) &&
          !tlLower.startsWith("a")))
        tmEffective.headOption.flatMap(m => Option(m.getOrElse("text", null)))
      else None

    val ai0 = (seqM(d.corporate_author) ++ seqM(d.corporate_author_monographic))
      .map(_.getOrElse("text", null))
    val ai = renameAi(ai0.filter(_ != null), lk.aiMap) // 02_x01 pass

    IahxDoc(
      id = id,
      id_pk = d.id,
      ai = ai,
      aid = opt(d.doi_number),
      alternate_id = seqOf(d.alternate_ids).filter(a => a != null && a.nonEmpty && a != id),
      book_title = bookTitle,
      cc = opt(d.cooperative_center_code),
      cn_co = opt(d.conference_country), cn_cy = opt(d.conference_city),
      cn_da = opt(d.conference_normalized_date), cn_dt = opt(d.conference_date),
      cn_in = opt(d.conference_sponsoring_institution), cn_na = opt(d.conference_name),
      ct = ct,
      cy = opt(d.publication_city),
      da = if (pdn.nonEmpty) Some(pdn.take(6)) else None,
      database = seqOf(d.database),
      db = seqOf(d.indexed_database),
      descritores_locais = dl,
      dp = opt(d.publication_date),
      ec = if (d.clinical_trial_registry_name != null && d.clinical_trial_registry_name.nonEmpty) Some(1L) else None,
      ed = opt(d.edition),
      // python doc.get('created_time', fallback): the fallback fires only
      // when the key is ABSENT (null); a present-but-empty '' stays '' and
      // entry_date is then dropped by the empty-value contract.
      entry_date = opt(Option(d.created_time)
        .getOrElse(Option(d.transfer_date_to_database).getOrElse(""))
        .take(10).replace("-", "")),
      ip = opt(d.issue_number),
      is = opt(d.issn),
      isbn = opt(d.isbn),
      la = seqOf(d.text_language),
      license = opt(d.license),
      mh = mh, mj = mj,
      nivel_tratamento = opt(d.treatment_level),
      no_indexing = if (seqM(d.descriptors_primary).isEmpty && seqM(d.descriptors_secondary).isEmpty) Some(1L) else None,
      non_decs_region = opt(d.non_decs_region),
      ntv = opt(d.total_number_of_volumes),
      ot = dl,
      pg = pg,
      pr_in = opt(d.project_sponsoring_institution),
      pr_na = opt(d.project_name), pr_nu = opt(d.project_number),
      pt = ptv,
      pu = opt(d.publisher),
      related_research = seqOf(d.related_research).map(String.valueOf),
      related_resource = seqOf(d.related_resource).map(String.valueOf),
      status_fiadmin = d.status.flatMap(StatusMap.get),
      ta = opt(d.title_serial),
      ta_fascic = standardizeTaFascic(taVar, d.volume_serial, d.issue_number, pdn.take(4)),
      ta_var = taVar,
      tag_comunidade = seqOf(d.community),
      tag_colecao = seqOf(d.community_collection_path),
      th_in = opt(d.thesis_dissertation_institution),
      th_le = seqM(d.thesis_dissertation_leader).flatMap(_.get("text")),
      th_ti = opt(d.thesis_dissertation_academic_title),
      tombo = opt(d.inventory_number),
      `type` = determineDocumentType(d),
      update_date = opt(Option(d.updated_time).getOrElse("").take(10).replace("-", "")),
      vi = Seq(d.volume_monographic, d.volume_serial).filter(v => v != null && v.nonEmpty),
      weight = calculateWeight(d, nowYear),
      fo = fo,
      lo = lo,
      ti = titleFields,
      ab = abstractFields,
      kw = kw,
      au = authors.au, af = authors.af,
      afiliacao_autor = authors.afiliacao,
      instituicao_pais_afiliacao = authors.instPais,
      pais_afiliacao = authors.paisAfiliacao.map(normalizeAfiliacaoString), // 02_x01
      auid = authors.auid, email = authors.email,
      ur = e.ur, ur_multimedia = e.urMultimedia, ur_audio = e.urAudio,
      ur_meta = e.urMeta, fulltext = e.fulltext,
      cp = cp,
      pais_publicacao = paisPub,
      tema_susdigital_programas = susProg,
      tema_susdigital_publico_alvo = susAlvo,
      dyn = Map.empty)
  }

  /** The fixture corpus pushed through 02+02_x01 — the shared source of
    * the q40-q42 gate queries. */
  def fixtureIahx(spark: SparkSession): DataFrame =
    toIahx(fixtureLanding(spark), Fixtures.lookups, nowYear = 2026).toDF()
}
