package graft

import org.apache.spark.sql.SparkSession

import graft.metrics.{Exports, Metrics, MetricsOps}

/** Renders the K4 dashboard from the metric fixture to a file, for
  * inspection and for `tools/dashboard_harness.js` (which executes the
  * emitted inline JS under stubs of the vendored chart libs and asserts
  * every chart updater renders):
  *
  *   sbt 'Test/runMain graft.DumpPage /tmp/dash.html'
  *   node tools/dashboard_harness.js /tmp/dash.html
  */
object DumpPage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val cells = Metrics.allCells(spark,
      spark.createDataset(MetricsOps.fixtureDocs).toDF(),
      MetricsOps.fixtureRegions, MetricsOps.fixtureDecsLabels,
      MetricsOps.fixtureAreaLabels)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      Exports.dashboardPage(cells, today = "2026-01-01").getBytes("UTF-8"))
    // optional second arg: one per-country page from the fixture
    if (args.length > 1) {
      val cc = Metrics.countryCells(spark,
        spark.createDataset(MetricsOps.fixtureDocs).toDF(),
        MetricsOps.fixtureCountries, MetricsOps.fixtureDecsLabels,
        MetricsOps.fixtureAreaLabels)
      val pages = Exports.countryPages(cc, today = "2026-01-01")
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        pages.values.head.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
