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
    for ((_, _, pfx) <- Exports.ChartSections) {
      assert(page.contains(s"const ${pfx}_year_json = "), s"$pfx global block")
      assert(page.contains(s"const ${pfx}_region_year_json = "), s"$pfx region block")
      assert(page.contains(s"function update${pfx.capitalize}Chart()"), s"$pfx updater")
    }
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
}
