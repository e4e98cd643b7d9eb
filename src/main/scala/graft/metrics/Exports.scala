package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Q

/** Metric-cell exports: K3 (pivot to year × name tables, the reference's
  * client-side JSON shape) and K5 (the year-range rollup + top-k that the
  * reference ships to the browser, moved into the engine as
  * Window.rank ≤ k).
  */
object Exports {

  /** K3 — pivot one metric's global cells to {year, name₁:count…} rows. */
  def pivotYearByName(cells: DataFrame, metricType: String,
      names: Seq[String]): DataFrame =
    cells.filter(col("type") === metricType && col("region").isNull)
      .groupBy(col("year").as("ano"))
      .pivot("name", names)
      .sum("count")
      .na.fill(0, names)

  /** K3 JSON rows — the `[{ano: year, <name>: count,…}]` export shape. */
  def pivotJson(cells: DataFrame, metricType: String, names: Seq[String]): DataFrame =
    pivotYearByName(cells, metricType, names)
      .select(to_json(struct((Seq("ano") ++ names).map(col): _*)).as("row_json"))

  /** K5 — rollup counts across years, top-k names per metric (global
    * scope), deterministic tie-break by name. */
  def topK(cells: DataFrame, metricType: String, k: Int): DataFrame = {
    val w = Window.orderBy(col("total").desc, col("name"))
    cells.filter(col("type") === metricType && col("region").isNull)
      .groupBy("name").agg(sum("count").as("total"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }

  /** K4 — minimal dashboard HTML from a pivoted metric table: the
    * reference interpolates chart JS into a template on the driver
    * (dag_03_export_html.py); engine work ends at the pivoted/top-k
    * data, so this renders that data as a static table+JSON block. */
  def htmlDashboard(title: String, pivot: DataFrame): String = {
    val cols = pivot.columns
    val rows = pivot.collect().map(r =>
      "<tr>" + cols.map(c => s"<td>${r.getAs[Any](c)}</td>").mkString + "</tr>")
    val json = pivot.toJSON.collect().mkString("[", ",", "]")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>$title</title></head>
       |<body><h1>$title</h1>
       |<table border="1"><tr>${cols.map(c => s"<th>$c</th>").mkString}</tr>
       |${rows.mkString("\n")}</table>
       |<script type="application/json" id="data">$json</script>
       |</body></html>""".stripMargin
  }

  /** K4 per-country fan-out (reference dag_03_export_html.py:268-314
    * writes one `<iso>.html` per country): render one dashboard page per
    * country from the [[Metrics.countryCells]] table. The cell table is
    * small (countries × names × years of COUNTS, not documents) — the
    * distributed work ended at the fused metric pass; page templating is
    * a driver loop over an already-aggregated result, same as the
    * reference. Returns iso → html. */
  /** Minimal HTML escape for corpus-derived values (journal titles,
    * descriptor labels — anything with &, <, > would otherwise land raw
    * in the markup). */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def countryPages(countryCells: DataFrame): Map[String, String] = {
    val rows = countryCells
      .select("iso", "country", "type", "name", "year", "count")
      .collect()
    rows.groupBy(r => (r.getString(0), r.getString(1))).map {
      case ((iso, country), cells) =>
        val byType = cells.groupBy(_.getString(2)).toSeq.sortBy(_._1)
        val sections = byType.map { case (t, cs) =>
          val trs = cs.sortBy(r => (r.getString(3), r.getLong(4)))
            .map(r => s"<tr><td>${esc(r.getString(3))}</td><td>${r.getLong(4)}</td><td>${r.getLong(5)}</td></tr>")
          s"""<h2>${esc(t)}</h2><table border="1"><tr><th>name</th><th>ano</th><th>count</th></tr>
             |${trs.mkString("\n")}</table>""".stripMargin
        }
        iso -> s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(country)} ($iso)</title></head>
                  |<body><h1>${esc(country)} ($iso)</h1>
                  |${sections.mkString("\n")}
                  |</body></html>""".stripMargin
    }
  }

  /** Write the per-country pages as `<iso>.html` under `dir`. */
  def writeCountryPages(countryCells: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    countryPages(countryCells).foreach { case (iso, html) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$iso.html"),
        html.getBytes("UTF-8"))
    }
  }

  private def fixtureCells(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Metrics.allCells(s, s.createDataset(MetricsOps.fixtureDocs).toDF(),
      MetricsOps.fixtureRegions, MetricsOps.fixtureDecsLabels,
      MetricsOps.fixtureAreaLabels)
  }

  /** Pivoted language table (global): hand-computed from the q45 cells. */
  val q47 = Q.sql("q47_pivot_export",
    """SELECT * FROM (VALUES
      |  (CAST(2020 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
      |  (CAST(2021 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT))
      |) AS t(ano, en, pt) ORDER BY ano""".stripMargin) { (s, _) =>
    pivotYearByName(fixtureCells(s), "language", Seq("en", "pt"))
      .orderBy("ano")
  }

  /** Top-2 document types by all-year rollup (tie → name order). */
  val q48 = Q.sql("q48_topk_rollup",
    """SELECT * FROM (VALUES
      |  ('Articles', CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
      |  ('Multimedia', CAST(2 AS BIGINT), CAST(2 AS BIGINT))
      |) AS t(name, total, rn) ORDER BY rn""".stripMargin) { (s, _) =>
    topK(fixtureCells(s), "doctype", 2).orderBy("rn")
  }

  val all: Seq[Q] = Seq(q47, q48)
}
