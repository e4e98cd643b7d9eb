package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.{Exports, Metrics, MetricsOps}

/** Golden checks for the K4 dashboard page skeleton against the
  * structure of the reference template
  * (tmgl_regions/dag_03_export_html.py:23-369): section/container order,
  * nav tabs, region option list, year-slider bounds, and the per-metric
  * embedded data blocks the tasks_for_export modules interpolate. */
class DashboardSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val page: String = {
    import spark.implicits._
    val cells = Metrics.allCells(spark,
      spark.createDataset(MetricsOps.fixtureDocs).toDF(),
      MetricsOps.fixtureRegions, MetricsOps.fixtureDecsLabels,
      MetricsOps.fixtureAreaLabels)
    Exports.dashboardPage(cells, today = "2026-01-01")
  }

  test("all 12 chart containers render, in the reference's page order") {
    val ids = Exports.ChartSections.map(_._2).distinct
    val positions = ids.map(id => id -> page.indexOf(s"""id="$id"""))
    positions.foreach { case (id, p) => assert(p >= 0, s"container $id missing") }
    assert(positions.map(_._2) == positions.map(_._2).sorted,
      s"containers out of reference order: $positions")
  }

  test("the five nav tabs carry the reference's ids") {
    for (t <- Seq("pills-output-tab", "pills-study-type-tab",
        "pills-topics-countries-tab", "pills-tcim-areas-tab", "pills-about-tab"))
      assert(page.contains(s"""id="$t""""), s"tab $t missing")
  }

  test("region select lists All first, then the cell regions sorted") {
    val opts = """<option value="([^"]+)"""".r
      .findAllMatchIn(page).map(_.group(1)).toSeq
    assert(opts == Seq("Todas", "AMR", "EUR"), opts.toString)
  }

  test("year slider bounds are YEAR_FROM and the A8 max-year aggregate") {
    // fixture years: 2020/2021 pass the 1500 floor; 1400 is rejected
    assert(page.contains(s"start: [${Exports.YearFrom}, 2021]"), "slider start")
    assert(page.contains(s"range: { min: ${Exports.YearFrom}, max: 2021 }"),
      "slider range")
  }

  test("every metric embeds global and per-region pivot data blocks") {
    for ((_, _, pfx) <- Exports.ChartSections if pfx != "indicators") {
      assert(page.contains(s"const ${pfx}_year_json = "), s"$pfx global block")
      assert(page.contains(s"const ${pfx}_region_year_json = "), s"$pfx region block")
      assert(page.contains(s"function update${pfx.capitalize}Chart()"), s"$pfx updater")
    }
    // the indicator section embeds no data: indicator.py's updater reads
    // the timeline pivot and writes the two DOM counters
    assert(page.contains("function updateIndicators()"))
    assert(!page.contains("const indicators_year_json"))
    assert(page.contains("""document.getElementById("indicator_total_documents")"""))
    // timeline.py:146-147 renames the stored cell names in the embedded
    // JSON; the updaters key on the renamed fields (fixture: 2 docs in
    // 2020 of which 2 fulltext, 1 in 2021)
    assert(page.contains("""const timeline_year_json = [{"ano":2020,"total_documents":2,"total_fulltext":2},{"ano":2021,"total_documents":1,"total_fulltext":0}];"""),
      page.linesIterator.filter(_.contains("timeline_year_json")).mkString("\n"))
  }

  test("the 11 chart constructors carry the reference's types and containers") {
    // (pfx, container, type marker) per tasks_for_export module; the
    // indicator section has no chart (two DOM counters)
    val expected = Seq(
      ("lang", "lang_container", "type: 'bar'"),
      ("timeline", "timeline_container", "type: 'line'"),
      ("journal", "journals_container", "type: 'bar'"),
      ("doctype", "doctype_container", "type: 'column'"),
      ("studytype", "studytype_container", "type: 'pie'"),
      ("subject", "subject_container", "type: 'wordcloud'"),
      ("region", "region_container", "type: 'pie'"),
      ("dimention", "dimention_container", "type: 'treemap'"),
      ("therapy", "therapy_container", "type: 'pie'"),
      ("complementary", "complementary_container", "type: 'bar'"),
      ("traditional", "traditional_container", "type: 'lollipop'"))
    for ((pfx, container, marker) <- expected) {
      val decl = s"""let ${pfx}_chart = Highcharts.chart("$container","""
      val at = page.indexOf(decl)
      assert(at >= 0, s"missing chart constructor: $decl")
      val block = page.substring(at, page.indexOf("});", at))
      assert(block.contains(marker), s"$pfx: expected $marker in\n$block")
      assert(block.contains("backgroundColor: '#F7F7F8'"), s"$pfx frame")
    }
    assert(page.contains("Highcharts.setOptions({ lang: { thousandsSep: ' ' } })"))
  }

  test("chart families carry their reference options") {
    // log axes on the count charts (language/doctype/traditional)
    val langAt = page.indexOf("let lang_chart")
    val langBlock = page.substring(langAt, page.indexOf("});", langAt))
    assert(langBlock.contains("type: \"logarithmic\""), "lang log axis")
    // the drilldown pies ship an empty drilldown series set + tooltip
    for (pfx <- Seq("region", "therapy")) {
      val at = page.indexOf(s"let ${pfx}_chart")
      val block = page.substring(at, page.indexOf("});", at))
      assert(block.contains("drilldown: { series: [] }"), s"$pfx drilldown")
      assert(block.contains("{point.percentage:.2f}%"), s"$pfx tooltip")
    }
    // treemap levels (dimention.py's two-level sliceAndDice)
    val dimAt = page.indexOf("let dimention_chart")
    val dimBlock = page.substring(dimAt, page.indexOf("});", dimAt))
    assert(dimBlock.contains("allowTraversingTree: true"), "treemap traversal")
    assert(dimBlock.contains("layoutAlgorithm: 'sliceAndDice'"), "treemap levels")
    // the blue ramp on the colorByPoint charts
    assert(dimBlock.contains("\"#003b58\""), "palette")
    // two timeline series with the reference names
    assert(page.contains("""{ name: "Total Documents", data: [], color: "#0093d5" }"""))
    assert(page.contains("""{ name: "Full Texts", data: [], color: "#005881" }"""))
  }

  test("updaters filter by slider range and region, then redraw") {
    // every updater opens with the shared year/region filter prelude
    val updaters = Seq("Lang", "Timeline", "Journal", "Doctype", "Studytype",
      "Subject", "Region", "Dimention", "Therapy", "Complementary",
      "Traditional")
    for (u <- updaters) {
      val at = page.indexOf(s"function update${u}Chart()")
      assert(at >= 0, s"update${u}Chart missing")
      val body = page.substring(at, page.indexOf("\n    }", at))
      assert(body.contains("slider.noUiSlider.get(true)"), s"$u slider read")
      assert(body.contains("regionSelect.value"), s"$u region read")
      assert(body.contains(".setData("), s"$u redraw")
    }
    // reference top-N caps: language 10, doctype 20, subject 100,
    // complementary 40, traditional 30
    assert(page.contains("sorted.slice(0, 10)"), "lang/journal top 10")
    assert(page.contains("sorted.slice(0, 20)"), "doctype/studytype top 20")
    assert(page.contains("sorted.slice(0, 100)"), "subject top 100")
    assert(page.contains("sorted.slice(0, 40)"), "complementary top 40")
    assert(page.contains("sorted.slice(0, 30)"), "traditional top 30")
    // drilldown assembly on the level1/level2 split
    assert(page.contains("name.split('/')"), "drilldown split")
  }

  test("the language data block is the pivot the export task would ship") {
    // q47's oracle pins the same numbers: 2020 → en 1, pt 2; 2021 → en 1
    val expected =
      """const lang_year_json = [{"ano":2020,"en":1,"pt":2},{"ano":2021,"en":1}];"""
    assert(page.contains(expected),
      page.linesIterator.filter(_.contains("lang_year_json")).mkString("\n"))
    assert(page.contains(""""AMR": [{"ano":2020,"en":1,"pt":1}]"""),
      page.linesIterator.filter(_.contains("lang_region_year_json")).mkString("\n"))
  }

  test("the About pane stamps the injected date") {
    assert(page.contains("Last data update: 2026-01-01"))
  }

  test("country pages carry the 8 chart constructors and slider-only updaters") {
    import graft.metrics.Metrics
    val cc = Metrics.countryCells(spark,
      {
        import spark.implicits._
        spark.createDataset(MetricsOps.fixtureDocs).toDF()
      },
      MetricsOps.fixtureCountries, MetricsOps.fixtureDecsLabels,
      MetricsOps.fixtureAreaLabels)
    val pages = Exports.countryPages(cc, today = "2026-01-01")
    assert(pages.nonEmpty)
    val cp = pages.values.head
    // 8 chart constructors (no language/timeline/journal section; the
    // indicator section has no chart), byte-compatible with the regions
    // configs — the tmgl_countries modules repeat them verbatim
    for (pfx <- Seq("doctype", "studytype", "subject", "region",
        "dimention", "therapy", "complementary", "traditional"))
      assert(cp.contains(s"let ${pfx}_chart = Highcharts.chart("), s"$pfx chart")
    assert(!cp.contains("let lang_chart"), "country page must not render lang")
    // slider-only: no region select exists on this page, so neither the
    // filter branch nor the change wiring may appear
    assert(!cp.contains("regionSelect"), "country page leaked regionSelect JS")
    assert(cp.contains("function updateIndicators()"))
    assert(cp.contains("const indicators_year_json"))
    // the timeline rename applies on this page's indicator data too
    assert(cp.contains("total_documents"), "indicator data not renamed")
  }
}
