package graft.metrics

import org.apache.spark.sql.functions._

import graft.operators.Q

/** Gate for the TMGL metric pass: a 4-doc fixture exercising dimension
  * explode, X23 year extraction (+ the 1400 year-floor reject), regex
  * name extraction, DECS label fallback (J9), F5 country matching via
  * pais_afiliacao / cp, and the A3 global+region scope fan-out. Oracle
  * hand-computed.
  */
object MetricsOps {

  val fixtureDocs: Seq[Metrics.TmglDoc] = Seq(
    Metrics.TmglDoc("t1", Seq("AMRO/Brazil"), Seq("^d12345^s22"),
      Seq("en", "pt"), "2020", "1",
      Seq("^iBrazil^eBrasil^pBrasil^fBrésil"), Nil,
      Seq("article"), Seq("systematic_reviews", "unknown_x"), "Revista A",
      Seq("dim/One"), Seq("ther/A"), Seq("comp/B"), Seq("trad1")),
    Metrics.TmglDoc("t2", Seq("AMRO/Brazil", "EURO/France"), Seq("^d99"),
      Seq("EN"), "jul. 2021", "", Nil, Seq("France"),
      Seq("monography", "video"), Nil, "", Nil, Nil, Nil, Nil),
    Metrics.TmglDoc("t3", Seq("EURO/France"), Nil, Seq("fr"), "1400", "1",
      Nil, Seq("france"), Seq("article"), Nil, "Journal B", Nil, Nil, Nil, Nil),
    Metrics.TmglDoc("t4", Nil, Seq("^d12345"), Seq("pt"), "2020", "1",
      Seq("^iUnited States of America"), Nil,
      Seq("article", "podcast"), Seq("review"), "Revista A", Seq("nodim"),
      Nil, Nil, Nil))

  val fixtureRegions: Seq[Metrics.WhoRegion] = Seq(
    Metrics.WhoRegion("AMR", Seq("brazil")),
    Metrics.WhoRegion("EUR", Seq("france")))

  val fixtureDecsLabels: Map[String, String] = Map("12345" -> "Traditional Medicine")
  val fixtureAreaLabels: Map[String, String] = Map(
    "dim/One" -> "Dimension One", "ther/A" -> "Therapy A",
    "trad1" -> "Traditional One")

  val q45 = Q.sql("q45_tmgl_metrics",
    """SELECT * FROM (VALUES
      |  ('complementary', NULL, 'comp/B', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('complementary', 'AMR', 'comp/B', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('dimension', NULL, 'Dimension One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('dimension', 'AMR', 'Dimension One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', NULL, 'Articles', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('doctype', NULL, 'Monograph', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', NULL, 'Multimedia', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', NULL, 'Multimedia', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'AMR', 'Articles', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'EUR', 'Monograph', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'EUR', 'Multimedia', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('journal', NULL, 'Revista A', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('journal', 'AMR', 'Revista A', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', NULL, 'en', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', NULL, 'en', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', NULL, 'pt', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('language', 'AMR', 'en', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'AMR', 'pt', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'EUR', 'en', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', NULL, 'AMRO/Brazil', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', NULL, 'AMRO/Brazil', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', NULL, 'EURO/France', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'AMR', 'AMRO/Brazil', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'EUR', 'AMRO/Brazil', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'EUR', 'EURO/France', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', NULL, 'Other Reviews', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', NULL, 'Systematic review', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', NULL, 'unknown_x', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', 'AMR', 'Systematic review', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', 'AMR', 'unknown_x', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', NULL, '99', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', NULL, 'Traditional Medicine', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('subject', 'AMR', 'Traditional Medicine', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', 'EUR', '99', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('therapy', NULL, 'Therapy A', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('therapy', 'AMR', 'Therapy A', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', NULL, 'total', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('timeline', NULL, 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', NULL, 'with_fulltext', CAST(2020 AS BIGINT), CAST(2 AS BIGINT)),
      |  ('timeline', NULL, 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('timeline', 'AMR', 'total', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'AMR', 'with_fulltext', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'EUR', 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'EUR', 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('traditional', NULL, 'Traditional One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('traditional', 'AMR', 'Traditional One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT))
      |) AS t(type, region, name, year, count)
      |ORDER BY type, region NULLS FIRST, name, year""".stripMargin) { (s, _) =>
    import s.implicits._
    val docs = s.createDataset(fixtureDocs).toDF()
    // production path: the single-pass fusion (allCells is the per-metric
    // reference implementation; EngineSpec asserts they agree)
    Metrics.allCellsFused(s, docs, fixtureRegions, fixtureDecsLabels, fixtureAreaLabels)
      .orderBy(col("type"), col("region").asc_nulls_first, col("name"), col("year"))
  }

  val fixtureCountries: Seq[Metrics.Country] = Seq(
    Metrics.Country("brazil", "BR"), Metrics.Country("france", "FR"))

  /** Per-country timeline with ISO resolution (tmgl_countries scope +
    * J11); hand-computed: t1->brazil (pais ^i); t2->brazil AND france
    * (who_regions suffix /Brazil + cp France — the suffix arm is the
    * tmgl_countries extra vs the region variant); t3 year-filtered;
    * t4 matches no fixture country. */
  val q49 = Q.sql("q49_country_metrics",
    """SELECT * FROM (VALUES
      |  ('brazil', 'BR', 'total', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('brazil', 'BR', 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('brazil', 'BR', 'with_fulltext', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('brazil', 'BR', 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('france', 'FR', 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('france', 'FR', 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT))
      |) AS t(country, iso, name, year, count)
      |ORDER BY country, name, year""".stripMargin) { (s, _) =>
    import s.implicits._
    val docs = s.createDataset(fixtureDocs).toDF()
    val dc = Metrics.docCountries(s, docs, fixtureCountries)
    Metrics.countryTimeline(docs, dc).orderBy("country", "name", "year")
  }

  /** ALL metric types in country scope (the tmgl_countries fan-out, A3
    * completed): same fused entries pass as q45, joined to docCountries.
    * Hand-computed over the 4-doc fixture: brazil sees t1 (2020) + t2
    * (2021); france sees t2 only; t3 is year-gated (1400); t4 matches no
    * fixture country. t2 contributes region×2, subject '99', language
    * 'en', doctype Monograph+Multimedia, timeline total (fulltext '' →
    * with_fulltext zero-filled). */
  val q61 = Q.sql("q61_country_cells",
    """SELECT * FROM (VALUES
      |  ('complementary', 'brazil', 'BR', 'comp/B', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('dimension', 'brazil', 'BR', 'Dimension One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'brazil', 'BR', 'Articles', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'brazil', 'BR', 'Monograph', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'brazil', 'BR', 'Multimedia', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'france', 'FR', 'Monograph', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('doctype', 'france', 'FR', 'Multimedia', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('journal', 'brazil', 'BR', 'Revista A', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'brazil', 'BR', 'en', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'brazil', 'BR', 'en', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'brazil', 'BR', 'pt', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('language', 'france', 'FR', 'en', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'brazil', 'BR', 'AMRO/Brazil', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'brazil', 'BR', 'AMRO/Brazil', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'brazil', 'BR', 'EURO/France', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'france', 'FR', 'AMRO/Brazil', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('region', 'france', 'FR', 'EURO/France', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', 'brazil', 'BR', 'Systematic review', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('studytype', 'brazil', 'BR', 'unknown_x', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', 'brazil', 'BR', '99', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', 'brazil', 'BR', 'Traditional Medicine', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('subject', 'france', 'FR', '99', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('therapy', 'brazil', 'BR', 'Therapy A', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'brazil', 'BR', 'total', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'brazil', 'BR', 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'brazil', 'BR', 'with_fulltext', CAST(2020 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'brazil', 'BR', 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('timeline', 'france', 'FR', 'total', CAST(2021 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('timeline', 'france', 'FR', 'with_fulltext', CAST(2021 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('traditional', 'brazil', 'BR', 'Traditional One', CAST(2020 AS BIGINT), CAST(1 AS BIGINT))
      |) AS t(type, country, iso, name, year, count)
      |ORDER BY type, country, name, year""".stripMargin) { (s, _) =>
    import s.implicits._
    val docs = s.createDataset(fixtureDocs).toDF()
    Metrics.countryCells(s, docs, fixtureCountries, fixtureDecsLabels, fixtureAreaLabels)
      .orderBy("type", "country", "name", "year")
  }

  /** Additive maintenance of the metric cells — the engine-side answer
    * to the reference's WEEKLY FULL REBUILD of every TMGL metric
    * (SURVEY §3.2): every cell key is a pure per-doc derivation and
    * every measure is an additive count/conditional-sum, so cells
    * computed over a standing corpus and over an arriving batch merge
    * by `groupBy(keys).sum(count)` into exactly the full recompute.
    * The gate runs the fused pass over the fixture split in two,
    * merges, and must reproduce q45's hand-computed oracle VERBATIM —
    * a batch append costs one delta pass + a cell-table merge, never a
    * corpus re-scan. */
  def mergeCells(parts: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy("type", "region", "name", "year")
      .agg(org.apache.spark.sql.functions.sum("count").as("count"))

  val q140 = Q.sql("q140_metric_maintenance", q45.oracle.get) { (s, _) =>
    import s.implicits._
    val old = s.createDataset(fixtureDocs.take(2)).toDF()
    val delta = s.createDataset(fixtureDocs.drop(2)).toDF()
    def cells(docs: org.apache.spark.sql.DataFrame) =
      Metrics.allCellsFused(s, docs, fixtureRegions, fixtureDecsLabels,
        fixtureAreaLabels)
    mergeCells(Seq(cells(old), cells(delta)))
      .orderBy(col("type"), col("region").asc_nulls_first, col("name"), col("year"))
  }

  val all: Seq[Q] = Seq(q45, q49, q61, q140)
}
