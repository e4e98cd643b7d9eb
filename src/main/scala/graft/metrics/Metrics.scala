package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TMGL bibliometric metrics (reference dags/tmgl_regions/dag_02_*.py):
  * explode a dimension → X23 year extraction from `dp` → year ≥ 1500
  * gate → count by (name, year), computed once globally and once per WHO
  * region scope.
  *
  * The reference runs each metric 1 + R times (once per region with a
  * country-regex $match prepended — A3 in SURVEY §2.5). Here the scope
  * fan-out is collapsed: doc→regions matches (F5) are computed ONCE into
  * a (doc, region) table and every metric joins it — one pass over the
  * corpus per metric instead of R+1, and the region-match logic lives in
  * one place. Cells: (type, region, name, year, count) with region NULL
  * for the global scope.
  */
object Metrics {

  /** The iAHx-shaped TMGL doc fields the metrics read. */
  case class TmglDoc(id: String, who_regions: Seq[String], mj: Seq[String],
      la: Seq[String], dp: String, fulltext: String,
      pais_afiliacao: Seq[String], cp: Seq[String],
      `type`: Seq[String], type_of_study: Seq[String], ta: String,
      tag_dimentions: Seq[String], tag_mtc_tema3: Seq[String],
      tag_mtc_tema2: Seq[String], traditional_medicines_cluster: Seq[String])

  /** X25 $switch recodes (dag_02_doc_type.py:14-29,
    * dag_02_study_type.py:14-43), default = passthrough. */
  val DocTypeMap: Map[String, String] = Map(
    "article" -> "Articles", "monography" -> "Monograph",
    "thesis" -> "Thesis", "non-conventional" -> "Non-conventional",
    "project document" -> "Project document",
    "congress and conference" -> "Congress and conference",
    "video" -> "Multimedia", "audio" -> "Multimedia",
    "podcast" -> "Multimedia")
  val StudyTypeMap: Map[String, String] = Map(
    "systematic_reviews" -> "Systematic review",
    "systematic_review_of_observational_studies" -> "Systematic review",
    "literature_review" -> "Other Reviews", "review" -> "Other Reviews",
    "guideline" -> "Practice guideline",
    "clinical_trials" -> "Controlled Clinical Trials",
    "qualitative_research" -> "Qualitative studies",
    "risk_factors_studies" -> "Risk factors", "overview" -> "Overview",
    "evidence_synthesis" -> "Evidence synthesis",
    "observational_studies" -> "Observational studies",
    "sysrev_observational_studies" -> "Observational studies",
    "policy_brief" -> "Policy brief",
    "diagnostic_studies" -> "Other studies",
    "etiology_studies" -> "Other studies",
    "prognostic_studies" -> "Other studies",
    "prevalence_studies" -> "Other studies",
    "screening_studies" -> "Other studies",
    "incidence_studies" -> "Other studies",
    "health_technology_assessment" -> "Other studies",
    "health_economic_evaluation" -> "Other studies",
    "evaluation_studies" -> "Other studies",
    "overview_evidence_synthesis" -> "Other studies")

  private def recodeExpr(m: Map[String, String]): org.apache.spark.sql.Column =
    coalesce(element_at(typedlit(m), col("dim")), col("dim"))

  /** WHO region → lowercase country names (J8, tmgl_regions/misc.py:4-24). */
  case class WhoRegion(who_region: String, countries: Seq[String])

  /** A country with its ISO code (J11 — the reference resolves ISO as the
    * first 2-char entry of pais_sinonimo; modeled directly). */
  case class Country(name: String, iso: String)

  /** X23 — year from `dp`: first \d{4}, default 0 (BASE_PIPELINE). */
  private def yearCol: org.apache.spark.sql.Column =
    coalesce(nullif(regexp_extract(col("dp"), "\\d{4}", 0), lit("")), lit("0"))
      .cast("bigint")

  /** F5 — doc→region matches: pais_afiliacao contains `^i<country>` or cp
    * contains `<country>`, case-insensitive (tmgl_metrics/misc.py:27-44).
    * Broadcast cross-match against the (region, country) pairs — the
    * country table is tiny; each doc tests ~hundreds of substrings with
    * no shuffle. */
  def docRegions(spark: SparkSession, docs: DataFrame,
      regions: Seq[WhoRegion]): DataFrame = {
    import spark.implicits._
    val rc = broadcast(regions.flatMap(r => r.countries.map(c => (r.who_region, c.toLowerCase)))
      .toDF("region", "country"))
    docs.select($"id", $"pais_afiliacao", $"cp")
      .join(rc, lit(true))
      .filter(
        exists($"pais_afiliacao", x => lower(x).contains(concat(lit("^i"), $"country"))) ||
        exists($"cp", x => lower(x).contains($"country")))
      .select($"id", $"region").distinct()
  }

  /** Run one exploded-dimension count metric in both scopes. `nameExpr`
    * maps the exploded value column `dim` to the cell name. */
  private def dimMetric(docs: DataFrame, docReg: DataFrame, metricType: String,
      dimCol: String, nameExpr: org.apache.spark.sql.Column): DataFrame = {
    val base = docs
      .select(col("id"), explode(col(dimCol)).as("dim"), col("dp"))
      .withColumn("year", yearCol)
      .withColumn("name", nameExpr)
      .filter(col("year") >= 1500 && col("name").isNotNull)
    val global = base.groupBy("name", "year")
      .agg(count(lit(1)).as("count"))
      .select(lit(metricType).as("type"), lit(null.asInstanceOf[String]).as("region"),
        col("name"), col("year"), col("count"))
    val scoped = base.join(docReg, "id")
      .groupBy("region", "name", "year")
      .agg(count(lit(1)).as("count"))
      .select(lit(metricType).as("type"), col("region"), col("name"),
        col("year"), col("count"))
    global.unionByName(scoped)
  }

  /** Publications per WHO region (dag_02_regions.py): name = the
    * who_regions value when it matches `.+/.+`. */
  def regions(docs: DataFrame, docReg: DataFrame): DataFrame =
    dimMetric(docs, docReg, "region", "who_regions",
      when(col("dim").rlike(".+/.+"), regexp_extract(col("dim"), ".+/.+", 0)))

  /** Subjects (dag_02_subjects.py): subject_id = first (\d+) capture of
    * mj, labeled via the DECS Mfn→English map (J9), fallback raw id. */
  def subjects(docs: DataFrame, docReg: DataFrame,
      decsLabels: Map[String, String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labels = broadcast(decsLabels.toSeq.toDF("mfn", "label"))
    val cells = dimMetric(docs, docReg, "subject", "mj",
      nullif(regexp_extract(col("dim"), "(\\d+)", 1), lit("")))
    cells.join(labels, cells("name") === labels("mfn"), "left")
      .select($"type", $"region", coalesce($"label", $"name").as("name"),
        $"year", $"count")
  }

  /** Languages (dag_02_languages.py): name = lower(la). */
  def languages(docs: DataFrame, docReg: DataFrame): DataFrame =
    dimMetric(docs, docReg, "language", "la", lower(col("dim")))

  /** Document types (dag_02_doc_type.py): unwind type -> 9-branch recode. */
  def docTypes(docs: DataFrame, docReg: DataFrame): DataFrame =
    dimMetric(docs, docReg, "doctype", "type", recodeExpr(DocTypeMap))

  /** Study types (dag_02_study_type.py): 23-branch recode. */
  def studyTypes(docs: DataFrame, docReg: DataFrame): DataFrame =
    dimMetric(docs, docReg, "studytype", "type_of_study", recodeExpr(StudyTypeMap))

  /** Journals (dag_02_journals.py): F4 gate `type == "article"` (Mongo
    * array-equality = contains), dimension = the scalar `ta`. */
  def journals(docs: DataFrame, docReg: DataFrame): DataFrame =
    dimMetric(
      docs.filter(array_contains(col("type"), "article"))
        .withColumn("__ta", array(col("ta"))),
      docReg, "journal", "__ta", col("dim"))

  /** Shared shape of the area-labeled tag metrics (J10): unwind a tag
    * column, optionally gate on `.+/.+`, label via tmgl_areas.label_en
    * with code fallback. */
  private def areaTagMetric(docs: DataFrame, docReg: DataFrame,
      metricType: String, tagCol: String, regexGate: Boolean,
      areaLabels: Map[String, String]): DataFrame = {
    val m = if (regexGate)
      when(col("dim").rlike(".+/.+"), regexp_extract(col("dim"), ".+/.+", 0))
    else col("dim")
    val named = if (areaLabels.isEmpty) m
      else coalesce(element_at(typedlit(areaLabels), m), m)
    dimMetric(docs, docReg, metricType, tagCol, named)
  }

  /** Dimensions (dag_02_dimention.py). */
  def dimensions(docs: DataFrame, docReg: DataFrame,
      areaLabels: Map[String, String]): DataFrame =
    areaTagMetric(docs, docReg, "dimension", "tag_dimentions", regexGate = true, areaLabels)

  /** Therapies (dag_02_therapies.py): tag_mtc_tema3, regex gate + label. */
  def therapies(docs: DataFrame, docReg: DataFrame,
      areaLabels: Map[String, String]): DataFrame =
    areaTagMetric(docs, docReg, "therapy", "tag_mtc_tema3", regexGate = true, areaLabels)

  /** Complementary (dag_02_complementary.py): tag_mtc_tema2. */
  def complementary(docs: DataFrame, docReg: DataFrame,
      areaLabels: Map[String, String]): DataFrame =
    areaTagMetric(docs, docReg, "complementary", "tag_mtc_tema2", regexGate = true, areaLabels)

  /** Traditional-medicine clusters (dag_02_traditional.py): the raw
    * cluster value (no regex gate) + label. */
  def traditional(docs: DataFrame, docReg: DataFrame,
      areaLabels: Map[String, String]): DataFrame =
    areaTagMetric(docs, docReg, "traditional", "traditional_medicines_cluster",
      regexGate = false, areaLabels)

  /** Timeline (dag_02_timeline.py, A2): per year total + fulltext=='1'
    * conditional count; emitted as two cell names. */
  def timeline(docs: DataFrame, docReg: DataFrame): DataFrame = {
    def agg2(df: DataFrame, regionCol: org.apache.spark.sql.Column,
        grp: Seq[String]): DataFrame =
      df.withColumn("year", yearCol)
        .filter(col("year") >= 1500)
        .groupBy(grp.map(col): _*)
        .agg(count(lit(1)).as("total"),
          sum(when(col("fulltext") === "1", 1L).otherwise(0L)).as("with_fulltext"))
        .select(lit("timeline").as("type"), regionCol.as("region"), col("year"),
          col("total"), col("with_fulltext"))
    val global = agg2(docs, lit(null.asInstanceOf[String]), Seq("year"))
    val scoped = agg2(docs.join(docReg, "id"), col("region"), Seq("region", "year"))
    global.unionByName(scoped)
      .select(col("type"), col("region"),
        explode(map(lit("total"), col("total"), lit("with_fulltext"), col("with_fulltext"))),
        col("year"))
      .withColumnRenamed("key", "name").withColumnRenamed("value", "count")
      .select("type", "region", "name", "year", "count")
  }

  /** F5 single-country matching (tmgl_metrics/misc.py:4-22, the
    * tmgl_countries variant): pais ^i-contains OR cp-contains OR
    * who_regions suffix `/<country_with_underscores>` — one extra arm vs
    * the region variant. */
  def docCountries(spark: SparkSession, docs: DataFrame,
      countries: Seq[Country]): DataFrame = {
    import spark.implicits._
    val ct = broadcast(countries
      .map(c => (c.name.toLowerCase, c.name.toLowerCase.replace(" ", "_"), c.iso))
      .toDF("country", "country_us", "iso"))
    docs.select($"id", $"pais_afiliacao", $"cp", $"who_regions")
      .join(ct, lit(true))
      .filter(
        exists($"pais_afiliacao", x => lower(x).contains(concat(lit("^i"), $"country"))) ||
        exists($"cp", x => lower(x).contains($"country")) ||
        exists($"who_regions", x => lower(x).endsWith(concat(lit("/"), $"country_us"))))
      .select($"id", $"country", $"iso").distinct()
  }

  /** Per-country timeline (tmgl_countries/dag_02_indicators.py, A2+A3
    * country scope): total + fulltext counts per (country, year), with
    * the ISO code resolved (J11). */
  def countryTimeline(docs: DataFrame, docCountry: DataFrame): DataFrame =
    docs.join(docCountry, "id")
      .withColumn("year", yearCol)
      .filter(col("year") >= 1500)
      .groupBy("country", "iso", "year")
      .agg(count(lit(1)).as("total"),
        sum(when(col("fulltext") === "1", 1L).otherwise(0L)).as("with_fulltext"))
      .select(col("country"), col("iso"),
        explode(map(lit("total"), col("total"),
          lit("with_fulltext"), col("with_fulltext"))),
        col("year"))
      .withColumnRenamed("key", "name").withColumnRenamed("value", "count")
      .select("country", "iso", "name", "year", "count")

  /** All metric cells for a corpus — union of the implemented metrics,
    * one corpus pass per metric (the readable reference implementation;
    * [[allCellsFused]] is the production path and a spec asserts they
    * agree cell-for-cell). */
  def allCells(spark: SparkSession, docs: DataFrame, regions0: Seq[WhoRegion],
      decsLabels: Map[String, String],
      areaLabels: Map[String, String] = Map.empty): DataFrame = {
    val dr = docRegions(spark, docs, regions0).cache()
    regions(docs, dr)
      .unionByName(subjects(docs, dr, decsLabels))
      .unionByName(languages(docs, dr))
      .unionByName(timeline(docs, dr))
      .unionByName(docTypes(docs, dr))
      .unionByName(studyTypes(docs, dr))
      .unionByName(journals(docs, dr))
      .unionByName(dimensions(docs, dr, areaLabels))
      .unionByName(therapies(docs, dr, areaLabels))
      .unionByName(complementary(docs, dr, areaLabels))
      .unionByName(traditional(docs, dr, areaLabels))
  }

  /** The SURVEY §4 fusion: every metric's (type, name) entries are
    * generated per doc as one array, exploded ONCE, and aggregated in a
    * single groupBy per scope — the 11-metrics × 2-scopes = 22 corpus
    * passes collapse to one explode + two shuffles (plus a tiny zero-fill
    * join for the timeline's conditional-sum cells, which a pure count
    * explode cannot produce). At 100 TB this is the difference between
    * scanning the corpus 22× and once. */
  def allCellsFused(spark: SparkSession, docs: DataFrame,
      regions0: Seq[WhoRegion], decsLabels: Map[String, String],
      areaLabels: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val exploded = fusedEntries(docs, decsLabels, areaLabels)
    val dr = docRegions(spark, docs, regions0)
    val global = exploded.groupBy("type", "name", "year")
      .agg(count(lit(1)).as("count"))
      .select(col("type"), lit(null.asInstanceOf[String]).as("region"),
        col("name"), col("year"), col("count"))
    val scoped = exploded.join(dr, "id")
      .groupBy("region", "type", "name", "year")
      .agg(count(lit(1)).as("count"))
      .select("type", "region", "name", "year", "count")
    val cells = global.unionByName(scoped)

    // conditional-sum zero-fill: every timeline/total group must also
    // carry a with_fulltext cell (0 when no doc in the group had one)
    val zeros = cells
      .filter($"type" === "timeline" && $"name" === "total")
      .select($"type", $"region", lit("with_fulltext").as("name"),
        $"year", lit(0L).as("count"))
      .join(cells.filter($"name" === "with_fulltext")
          .select($"region".as("r2"), $"year".as("y2")),
        $"region" <=> $"r2" && $"year" === $"y2", "left_anti")
    cells.unionByName(zeros)
  }

  /** The tmgl_countries scope of the same fusion: every metric cell
    * counted per matched country (reference runs the ~10 metric DAGs once
    * per country — dags/tmgl_countries/dag_02_subjects.py:152-162 and
    * siblings; here it is the SAME single exploded-entries pass joined to
    * the (doc, country) match table and grouped by country). Cells:
    * (type, country, iso, name, year, count). */
  def countryCells(spark: SparkSession, docs: DataFrame,
      countries: Seq[Country], decsLabels: Map[String, String],
      areaLabels: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val exploded = fusedEntries(docs, decsLabels, areaLabels)
    val dc = docCountries(spark, docs, countries)
    val cells = exploded.join(dc, "id")
      .groupBy("country", "iso", "type", "name", "year")
      .agg(count(lit(1)).as("count"))
      .select("type", "country", "iso", "name", "year", "count")
    val zeros = cells
      .filter($"type" === "timeline" && $"name" === "total")
      .select($"type", $"country", $"iso", lit("with_fulltext").as("name"),
        $"year", lit(0L).as("count"))
      .join(cells.filter($"name" === "with_fulltext")
          .select($"country".as("c2"), $"year".as("y2")),
        $"country" === $"c2" && $"year" === $"y2", "left_anti")
    cells.unionByName(zeros)
  }

  /** One corpus pass generating every metric's (type, name) entries per
    * doc as a single exploded table (id, year, type, name) — the shared
    * front half of [[allCellsFused]] and [[countryCells]]. */
  private def fusedEntries(docs: DataFrame, decsLabels: Map[String, String],
      areaLabels: Map[String, String]): DataFrame = {
    type C = org.apache.spark.sql.Column
    val emptyE = array().cast("array<struct<t:string,n:string>>")
    def ent(t: String, n: C): C = struct(lit(t).as("t"), n.as("n"))
    def entries(colName: String, t: String, f: C => C): C =
      coalesce(transform(col(colName), d => ent(t, f(d))), emptyE)
    def regexGate(d: C): C =
      when(d.rlike(".+/.+"), regexp_extract(d, ".+/.+", 0))
    def area(m: C): C =
      if (areaLabels.isEmpty) m
      else coalesce(element_at(typedlit(areaLabels), m), m)
    def subjectName(d: C): C = {
      val sid = nullif(regexp_extract(d, "(\\d+)", 1), lit(""))
      if (decsLabels.isEmpty) sid
      else coalesce(element_at(typedlit(decsLabels), sid), sid)
    }

    val allEntries = concat(
      entries("who_regions", "region", regexGate),
      entries("mj", "subject", subjectName),
      entries("la", "language", d => lower(d)),
      entries("type", "doctype",
        d => coalesce(element_at(typedlit(DocTypeMap), d), d)),
      entries("type_of_study", "studytype",
        d => coalesce(element_at(typedlit(StudyTypeMap), d), d)),
      when(array_contains(col("type"), "article"),
        array(ent("journal", col("ta")))).otherwise(emptyE),
      entries("tag_dimentions", "dimension", d => area(regexGate(d))),
      entries("tag_mtc_tema3", "therapy", d => area(regexGate(d))),
      entries("tag_mtc_tema2", "complementary", d => area(regexGate(d))),
      entries("traditional_medicines_cluster", "traditional", d => area(d)),
      array(ent("timeline", lit("total"))),
      when(col("fulltext") === "1",
        array(ent("timeline", lit("with_fulltext")))).otherwise(emptyE))

    docs
      .select(col("id"), yearCol.as("year"), explode(allEntries).as("e"))
      .select(col("id"), col("year"),
        col("e.t").as("type"), col("e.n").as("name"))
      .filter(col("year") >= 1500 && col("name").isNotNull)
  }
}
