package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gov.{Landing, RefTransforms => R}

/** Pure-function specs for the governance transforms (no SparkSession).
  * The reference-parity cases live in the golden gate (q40-q44); these
  * cover edge inputs the fixture corpus doesn't reach.
  */
class RefTransformsSpec extends AnyFunSuite {

  test("X20 removeDiacritics strips combining marks and is idempotent") {
    assert(R.removeDiacritics("Médecine traditionnelle à l'hôpital") ==
      "Medecine traditionnelle a l'hopital")
    assert(R.removeDiacritics("ação çãõ ÀÉÎÕÜ") == "acao cao AEIOU")
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(40))
      val once = R.removeDiacritics(s)
      assert(R.removeDiacritics(once) == once)
    }
  }

  test("X1 pages quirks: f-l needs both; bare _f falls through to 'f' key") {
    assert(R.standardizePages(Seq(Map("_f" -> "1", "_l" -> "9"))) == Seq("1-9"))
    // _f alone does NOT emit (reference checks key 'f', not '_f')
    assert(R.standardizePages(Seq(Map("_f" -> "1"))) == Nil)
    assert(R.standardizePages(Seq(Map("_f" -> "1", "f" -> "1"))) == Seq("1"))
    assert(R.standardizePages(Seq(Map("text" -> "xii"), Map("_e" -> "e3"))) ==
      Seq("xii", "e3"))
  }

  test("X21 country capitalization: prepositions, hyphens, parentheticals") {
    assert(R.normalizeCountryName("estados unidos da américa") ==
      "Estados Unidos da América")
    assert(R.normalizeCountryName("états-unis") == "États-Unis")
    assert(R.normalizeCountryName("congo (república democrática do)") ==
      "Congo (República Democrática do)")
    assert(R.normalizeCountryName("GUINÉ-BISSAU") == "Guiné-Bissau")
  }

  test("X22 packed-string rewrite only touches ^x segments") {
    assert(R.normalizeAfiliacaoString("^ibrazil^efrança") == "^iBrazil^eFrança")
    assert(R.normalizeAfiliacaoString("no packed prefix") == "no packed prefix")
  }

  test("J2 getDecsMfn: digit passthrough, qualifier, miss") {
    val decs = Map("humans" -> "7500", "/historia" -> "22", "medicina" -> "12")
    assert(R.getDecsMfn("123", decs).contains("^d123"))
    assert(R.getDecsMfn("Humans", decs).contains("^d7500"))
    assert(R.getDecsMfn("Medicina/História", decs).contains("^d12^s22"))
    assert(R.getDecsMfn("Medicina/unknown", decs).isEmpty)
    assert(R.getDecsMfn("nope", decs).isEmpty)
    assert(R.getDecsMfn("", decs).isEmpty)
  }

  test("X26 removeInvalidXmlChars strips C0/DEL/FFFE, keeps tab/nl/cr") {
    assert(R.removeInvalidXmlChars("a\u0001b\u0008c\u000Bd\u007Fe\uFFFEf") ==
      "abcdef")
    assert(R.removeInvalidXmlChars("keep\ttabs\nand\rnewlines") ==
      "keep\ttabs\nand\rnewlines")
  }

  test("X17 susdigital theme: pt occurrence, last path segment") {
    assert(R.extractSusdigitalTheme("SUS|pt-br^Programas/Tema A").contains("Tema A"))
    assert(R.extractSusdigitalTheme("SUS|en^Other/X").isEmpty)
    assert(R.extractSusdigitalTheme("").isEmpty)
  }

  test("X16 weight floors at zero and skips malformed years") {
    def landing(lit: String, pdn: String, abs: Int, ea: Int): Landing =
      emptyLanding.copy(literature_type = lit, publication_date_normalized = pdn,
        abstracts = Seq.fill(abs)(Map("text" -> "x")),
        electronic_address = Seq.fill(ea)(Map("_u" -> "http://x")))
    assert(R.calculateWeight(landing("s", "20260101", 1, 1), 2026) == 45)
    assert(R.calculateWeight(landing("n", "19000101", 0, 0), 2026) == 0)
    assert(R.calculateWeight(landing("t", "garbage", 0, 0), 2026) == 10)
    // python int(pdn[:4]) semantics (ADVICE r1): short digit runs and
    // signed values PARSE (clamped via the year term), mixed junk doesn't
    assert(R.calculateWeight(landing("s", "19", 0, 0), 2026) == 0) // 15+20-2007
    assert(R.calculateWeight(landing("s", "+2024", 0, 0), 2026) == 0) // int('+202')=202
    assert(R.calculateWeight(landing("s", "2a21", 0, 0), 2026) == 15) // ValueError → no term
    assert(R.calculateWeight(landing("s", " 999", 0, 0), 2026) == 0) // int(' 999')=999 → clamp
    assert(R.calculateWeight(landing("s", null, 0, 0), 2026) == 15)
  }

  test("Enrich pairWalk pairs and handles odd tails") {
    assert(gov.Enrich.pairWalk(Seq("a", "1", "b", "2")) ==
      Seq(("a", "1"), ("b", "2")))
    assert(gov.Enrich.pairWalk(Seq("a", "1", "b")) == Seq(("a", "1"), ("b", null)))
    assert(gov.Enrich.pairWalk(Nil) == Nil)
  }

  private val emptyLanding = Landing(
    id = 0L, LILACS_original_id = "", status = Some(1), treatment_level = "as",
    literature_type = "", cooperative_center_code = "",
    title = Nil, title_monographic = Nil, title_collection = Nil,
    english_translated_title = "", english_title_monographic = "",
    english_title_collection = "", title_serial = "", shortened_title = "",
    issn = "", volume_serial = "", issue_number = "", volume_monographic = "",
    pages = Nil, pages_monographic = "", abstracts = Nil,
    electronic_address = Nil, individual_author = Nil, corporate_author = Nil,
    individual_author_monographic = Nil, corporate_author_monographic = Nil,
    individual_author_collection = Nil, corporate_author_collection = Nil,
    author_keyword = Nil, check_tags = Nil, publication_type = Nil,
    descriptors_primary = Nil, descriptors_secondary = Nil,
    local_descriptors = "", publication_country = Some(""),
    publication_city = "", publisher = "", edition = "",
    publication_date = "", publication_date_normalized = "",
    descriptive_information = Nil, symbol = Nil, text_language = Nil,
    database = Nil, indexed_database = Nil, community = Nil,
    community_collection_path = Nil, doi_number = "", isbn = "",
    alternate_ids = Nil, related_research = Nil, related_resource = Nil,
    clinical_trial_registry_name = "", call_number = Nil,
    inventory_number = "", total_number_of_volumes = "",
    thesis_dissertation_institution = "", thesis_dissertation_leader = Nil,
    thesis_dissertation_academic_title = "", conference_name = "",
    conference_city = "", conference_country = "", conference_date = "",
    conference_normalized_date = "", conference_sponsoring_institution = "",
    project_name = "", project_number = "", project_sponsoring_institution = "",
    license = "", non_decs_region = "", created_time = "", updated_time = "",
    transfer_date_to_database = "")
}
