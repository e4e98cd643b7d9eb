package graft.gov

/** Landing-zone record (FI-Admin REST shape; see FIXTURES.md §1 and
  * reference `tasks_for_01.py:179-191` which upserts the raw API JSON).
  * Subfield-struct arrays (ISIS/MARC `{text,_i}`, `{_f,_l}`, `{_u,_y,…}`)
  * are modeled as `Seq[Map[String,String]]` — mirroring the schemaless
  * reference exactly and keeping key-presence semantics (python `'k' in d`)
  * observable.
  */
case class Landing(
    id: Long,
    LILACS_original_id: String,
    status: Option[Int],
    treatment_level: String,
    literature_type: String,
    cooperative_center_code: String,
    title: Seq[Map[String, String]],
    title_monographic: Seq[Map[String, String]],
    title_collection: Seq[Map[String, String]],
    english_translated_title: String,
    english_title_monographic: String,
    english_title_collection: String,
    title_serial: String,
    shortened_title: String,
    issn: String,
    volume_serial: String,
    issue_number: String,
    volume_monographic: String,
    pages: Seq[Map[String, String]],
    pages_monographic: String,
    abstracts: Seq[Map[String, String]],  // JSON key 'abstract' (renamed on read: not a valid encoder field name)
    electronic_address: Seq[Map[String, String]],
    individual_author: Seq[Map[String, String]],
    corporate_author: Seq[Map[String, String]],
    individual_author_monographic: Seq[Map[String, String]],
    corporate_author_monographic: Seq[Map[String, String]],
    individual_author_collection: Seq[Map[String, String]],
    corporate_author_collection: Seq[Map[String, String]],
    author_keyword: Seq[Map[String, String]],
    check_tags: Seq[String],
    publication_type: Seq[String],
    descriptors_primary: Seq[Map[String, String]],
    descriptors_secondary: Seq[Map[String, String]],
    local_descriptors: String,
    publication_country: Option[String],
    publication_city: String,
    publisher: String,
    edition: String,
    publication_date: String,
    publication_date_normalized: String,
    descriptive_information: Seq[Map[String, String]],
    symbol: Seq[String],
    text_language: Seq[String],
    database: Seq[String],
    indexed_database: Seq[String],
    community: Seq[String],
    community_collection_path: Seq[String],
    doi_number: String,
    isbn: String,
    alternate_ids: Seq[String],
    related_research: Seq[String],
    related_resource: Seq[String],
    clinical_trial_registry_name: String,
    call_number: Seq[Map[String, String]],
    inventory_number: String,
    total_number_of_volumes: String,
    thesis_dissertation_institution: String,
    thesis_dissertation_leader: Seq[Map[String, String]],
    thesis_dissertation_academic_title: String,
    conference_name: String,
    conference_city: String,
    conference_country: String,
    conference_date: String,
    conference_normalized_date: String,
    conference_sponsoring_institution: String,
    project_name: String,
    project_number: String,
    project_sponsoring_institution: String,
    license: String,
    non_decs_region: String,
    created_time: String,
    updated_time: String,
    transfer_date_to_database: String)

/** Standardized iAHx document (layer 02 output; reference
  * `02_create_iahx_xml_collection.py:915-996`). Per-language title/abstract
  * fields (`ti_<lang>`, `ab_<lang>`) live in the `ti`/`ab` maps; dynamic
  * enrichment fields (layer 03: `collection_*`, `tag_*`, theme tags) land
  * in `dyn`. The reference's drop-None/''/[] contract (`:998-999`) is
  * enforced at the sinks, not in this schema (Spark columns can't be
  * absent).
  */
case class IahxDoc(
    id: String,
    id_pk: Long,
    ai: Seq[String],
    aid: Option[String],
    alternate_id: Seq[String],
    book_title: Option[String],
    cc: Option[String],
    cn_co: Option[String],
    cn_cy: Option[String],
    cn_da: Option[String],
    cn_dt: Option[String],
    cn_in: Option[String],
    cn_na: Option[String],
    ct: Seq[String],
    cy: Option[String],
    da: Option[String],
    database: Seq[String],
    db: Seq[String],
    descritores_locais: Seq[String],
    dp: Option[String],
    ec: Option[Long],
    ed: Option[String],
    entry_date: Option[String],
    ip: Option[String],
    is: Option[String],
    isbn: Option[String],
    la: Seq[String],
    license: Option[String],
    mh: Seq[String],
    mj: Seq[String],
    nivel_tratamento: Option[String],
    no_indexing: Option[Long],
    non_decs_region: Option[String],
    ntv: Option[String],
    ot: Seq[String],
    pg: Seq[String],
    pr_in: Option[String],
    pr_na: Option[String],
    pr_nu: Option[String],
    pt: Seq[String],
    pu: Option[String],
    related_research: Seq[String],
    related_resource: Seq[String],
    status_fiadmin: Option[String],
    ta: Option[String],
    ta_fascic: Seq[String],
    ta_var: Seq[String],
    tag_comunidade: Seq[String],
    tag_colecao: Seq[String],
    th_in: Option[String],
    th_le: Seq[String],
    th_ti: Option[String],
    tombo: Option[String],
    `type`: Seq[String],
    update_date: Option[String],
    vi: Seq[String],
    weight: Long,
    fo: Option[String],
    lo: Option[String],
    ti: Map[String, Seq[String]],
    ab: Map[String, String],
    kw: Seq[String],
    au: Seq[String],
    af: Seq[String],
    afiliacao_autor: Seq[String],
    instituicao_pais_afiliacao: Seq[String],
    pais_afiliacao: Seq[String],
    auid: Seq[String],
    email: Seq[String],
    ur: Seq[String],
    ur_multimedia: Seq[String],
    ur_audio: Seq[String],
    ur_meta: Seq[String],
    fulltext: Option[Long],
    cp: Seq[String],
    pais_publicacao: Option[String],
    tema_susdigital_programas: Seq[String],
    tema_susdigital_publico_alvo: Seq[String],
    dyn: Map[String, Seq[String]])

/** A country row of TABS.tabpais (reference `misc.py:68-84`). */
case class CountryRow(pt: String, en: String, es: String, fr: String,
    pais2: String, sinonimo: Seq[String])

/** A journal row of TITLE.title_current (reference `misc.py:129-176`);
  * `^`-subfielded title strings keep their raw form, the loader strips
  * at build time. */
case class TitleRow(issn: String, title: String, shortenedTitle: String,
    medlineShortenedTitle: String, parallelTitles: Seq[String],
    shortenedParallelTitles: Seq[String], otherTitles: Seq[String],
    country: Seq[String])

/** Broadcastable lookup bundle replacing the reference's driver-side dict
  * loads (S10): key-normalized maps for tabpais (J1), DeCS (J2), journal
  * title authority (J3), and the ai1→ai2 corporate-author rename (J7).
  * All KB–MB scale — shipped to executors once, no shuffle.
  */
case class Lookups(
    country: Map[String, CountryRow],
    decs: Map[String, String],
    issn: Map[String, Seq[String]],
    shortTitle: Map[String, Seq[String]],
    titleCountry: Map[String, Seq[String]],
    aiMap: Map[String, String])

object Lookups {
  import RefTransforms.removeDiacritics

  /** Build the key-normalized lookup maps exactly like the reference
    * loaders (misc.py load_tabpais/load_decs_descriptors/
    * load_title_current, 02_x01 _carregar_mapa_ai). */
  def build(tabpais: Seq[CountryRow], decsRows: Seq[(String, Seq[String])],
      titleRows: Seq[TitleRow], aiRows: Seq[(String, String)]): Lookups = {
    val country: Map[String, CountryRow] = tabpais.flatMap { row =>
      val keys = Seq(row.pt, row.en, row.es, row.fr, row.pais2)
        .filter(_.nonEmpty).map(_.toLowerCase.trim) ++
        row.sinonimo.filter(_.nonEmpty).map(_.toLowerCase.trim)
      keys.map(_ -> row)
    }.toMap

    val decs: Map[String, String] = decsRows.flatMap { case (mfn, terms) =>
      val formatted = mfn.dropWhile(_ == '0')
      terms.filter(_.nonEmpty)
        .map(t => removeDiacritics(t.trim.toLowerCase) -> formatted)
    }.toMap

    def titleValues(t: TitleRow): Seq[String] = {
      val b = Seq.newBuilder[String]
      if (t.title.nonEmpty) b += t.title.split("\\^")(0)
      if (t.shortenedTitle.nonEmpty) b += t.shortenedTitle.split("\\^")(0)
      if (t.medlineShortenedTitle.nonEmpty) b += t.medlineShortenedTitle.split("\\^")(0)
      t.parallelTitles.foreach(x => b += x.split("\\^")(0))
      t.shortenedParallelTitles.foreach(x => b += x.split("\\^")(0))
      t.otherTitles.foreach(x => b += x.split("\\^")(0))
      b.result()
    }
    val issn = titleRows.filter(_.issn.nonEmpty)
      .map(t => t.issn.toLowerCase.trim -> titleValues(t)).toMap
    val shortTitle = titleRows.filter(_.shortenedTitle.nonEmpty)
      .map(t => t.shortenedTitle.toLowerCase.trim -> titleValues(t)).toMap
    val titleCountry = titleRows.filter(_.shortenedTitle.nonEmpty)
      .map(t => t.shortenedTitle.toLowerCase.trim -> t.country).toMap

    Lookups(country, decs, issn, shortTitle, titleCountry,
      aiRows.map { case (k, v) => k.trim -> v }.toMap)
  }

  /** Production loader: the four reference tables as DataFrames (parquet,
    * CSV, JDBC snapshot — anything) funneled through the SAME
    * normalization as the fixtures. Schemas:
    *
    *  - `tabpais(pt, en, es, fr, pais2, sinonimo: array<string>)`
    *  - `decs(mfn: string, terms: array<string>)`
    *  - `title(issn, title, shortened_title, medline_shortened_title,
    *    parallel_titles, shortened_parallel_titles, other_titles,
    *    country — last five array<string>)`
    *  - `ai(ai1, ai2)`
    *
    * The collects are the point, not a smell: these are the reference's
    * driver-dict tables (S10), KB–MB scale, broadcast to executors once. */
  def fromTables(spark: org.apache.spark.sql.SparkSession,
      tabpais: org.apache.spark.sql.DataFrame,
      decs: org.apache.spark.sql.DataFrame,
      title: org.apache.spark.sql.DataFrame,
      ai: org.apache.spark.sql.DataFrame): Lookups = {
    import spark.implicits._
    def s(v: String): String = Option(v).getOrElse("")
    def a(v: Seq[String]): Seq[String] = Option(v).getOrElse(Nil)
    val tp = tabpais
      .select($"pt", $"en", $"es", $"fr", $"pais2", $"sinonimo")
      .as[(String, String, String, String, String, Seq[String])]
      .collect().toSeq
      .map(r => CountryRow(s(r._1), s(r._2), s(r._3), s(r._4), s(r._5), a(r._6)))
    val dc = decs.select($"mfn", $"terms").as[(String, Seq[String])]
      .collect().toSeq.map(r => (s(r._1), a(r._2)))
    val tt = title
      .select($"issn", $"title", $"shortened_title", $"medline_shortened_title",
        $"parallel_titles", $"shortened_parallel_titles", $"other_titles",
        $"country")
      .as[(String, String, String, String, Seq[String], Seq[String],
        Seq[String], Seq[String])]
      .collect().toSeq
      .map(r => TitleRow(s(r._1), s(r._2), s(r._3), s(r._4), a(r._5), a(r._6),
        a(r._7), a(r._8)))
    val am = ai.select($"ai1", $"ai2").as[(String, String)]
      .collect().toSeq.map(r => (s(r._1), s(r._2)))
    build(tp, dc, tt, am)
  }
}
