package graft.gov

/** Reference-table fixtures — MUST stay in sync with tools/golden.py
  * (TABPAIS/DECS/TITLE/AI_MAP_ROWS there), which runs the reference's
  * loaders over the same data to produce the golden oracle.
  *
  * In production these load from Parquet via [[Lookups.fromTables]];
  * the maps are small (KB–MB) and broadcast to executors.
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

  /** The fixture tables through the production normalization
    * ([[Lookups.build]] — the same code path [[Lookups.fromTables]]
    * feeds from parquet/CSV/JDBC). */
  def lookups: Lookups = Lookups.build(tabpais, decsRows, titleRows, aiRows)
}
