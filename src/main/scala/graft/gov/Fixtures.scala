package graft.gov

import RefTransforms.removeDiacritics

/** Reference-table fixtures — MUST stay in sync with tools/golden.py
  * (TABPAIS/DECS/TITLE/AI_MAP_ROWS there), which runs the reference's
  * loaders over the same data to produce the golden oracle.
  *
  * In production these load from Parquet via [[Fixtures.lookupsFrom]]-style
  * builders; the maps are small (KB–MB) and broadcast to executors.
  */
object Fixtures {

  val tabpais: Seq[CountryRow] = Seq(
    CountryRow("Brasil", "Brazil", "Brasil", "Brésil", "BR", Seq("Brazil (BR)")),
    CountryRow("estados unidos da américa", "united states of america",
      "estados unidos", "états-unis", "US", Seq("united states")))

  /** (Mfn, terms…) rows; loader normalization per misc.py:87-126. */
  val decsRows: Seq[(String, Seq[String])] = Seq(
    ("012345", Seq("Traditional Medicine", "Medicina Tradicional",
      "Medicina Tradicional", "Médecine traditionnelle")),
    ("000022", Seq("/history", "/história", "/historia")),
    ("007500", Seq("Humans", "Humanos", "Humanos", "Humains", "Human beings")),
    ("036666", Seq("Systematic Review", "Revisão Sistemática",
      "Revisión Sistemática")))

  case class TitleRow(issn: String, title: String, shortenedTitle: String,
      medlineShortenedTitle: String, parallelTitles: Seq[String],
      shortenedParallelTitles: Seq[String], otherTitles: Seq[String],
      country: Seq[String])
  val titleRows: Seq[TitleRow] = Seq(
    TitleRow("0034-8910", "Revista de Saúde Pública^nota", "Rev. Saúde Pública",
      "Rev Saude Publica", Seq("Journal of Public Health^x"), Nil, Nil,
      Seq("Brasil")))

  val aiRows: Seq[(String, String)] = Seq("Organização Z" -> "Organizacao Z Renamed")

  // ---- layer-03 enrichment fixtures (hand-computed oracle in GovOps.q43) ----
  val instanceEcollection: Seq[Enrich.InstRow] = Seq(
    Enrich.InstRow("lilacs", Seq("regional"), Seq("colA")))
  val dbInstanceEcollection: Seq[Enrich.DbInstRow] = Seq(
    Enrich.DbInstRow("lilacs", Seq("LILACS-DB"), Seq("regional2"), Seq("proj:valor1")),
    Enrich.DbInstRow("bdenf", Nil, Seq("enfermagem"), Seq("proj:valor2", "area:x")))
  val temas: Seq[Enrich.TemaRow] = Seq(
    Enrich.TemaRow("lil-839300", "fonte1", Seq("bvs"), Seq("colA"),
      Seq("tagX", "v1", "tagX", "v2"), Seq("tagY", "v3"), Seq("ctx1", "p1")),
    Enrich.TemaRow("biblio-1002", "fonte2", Nil, Seq("colB"), Nil, Nil, Nil))

  /** Build the key-normalized lookup maps exactly like the reference
    * loaders (misc.py load_tabpais/load_decs_descriptors/load_title_current,
    * 02_x01 _carregar_mapa_ai). */
  def lookups: Lookups = {
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
}
