package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Q

/** Data-quality checks as DataFrame programs — the "SQL for data quality
  * checks" half of the north star. Each check reduces a table to one
  * (check_name, metric, passed) row; the suite unions them into a
  * quality report. The reference enforces these operationally (unique
  * indexes, upserts, drop-and-rebuild); here they are first-class
  * queries a scheduler can gate a pipeline on.
  *
  * Scale: all co-aggregable checks over one table (uniqueness,
  * completeness, range) fold into ONE aggregation pass — [[tableChecks]]
  * computes them in a single `agg(...)` and unpivots with `stack`, so a
  * 100 TB table costs one scan for its whole check battery, not one
  * scan per check (the round-9 report shape scanned orders 3×). Only
  * referential integrity needs its own anti-join per FK edge. No
  * collects anywhere.
  */
object Checks {

  case class CheckResult(check_name: String, metric: Long, passed: Boolean)

  /** One named violation-count metric, co-aggregable with others over
    * the same table in a single pass. 0 violations = check passed. */
  case class AggCheck(name: String, metric: Column)

  /** Duplicate count on a key (0 = unique). */
  def uniquenessMetric(key: String): Column =
    count(lit(1)) - countDistinct(col(key))

  /** Null count on a required column (0 = complete). */
  def completenessMetric(column: String): Column =
    sum(when(col(column).isNull, 1L).otherwise(0L))

  /** Out-of-range count for a predicate that should always hold. */
  def rangeMetric(valid: Column): Column =
    sum(when(!valid, 1L).otherwise(0L))

  /** The whole co-aggregable check battery for one table in ONE
    * aggregation (one scan, map-side partial agg), unpivoted to the
    * (check_name, metric, passed) report rows via `stack`. */
  def tableChecks(df: DataFrame, checks: Seq[AggCheck]): DataFrame = {
    val cols = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val agged = df.agg(cols.head, cols.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', __m$i" }.mkString(", ")
    agged.selectExpr(s"stack(${checks.size}, $stackArgs) AS (check_name, metric)")
      .select(col("check_name"), col("metric"),
        (col("metric") === 0).as("passed"))
  }

  /** Single-check conveniences (each one scan; prefer [[tableChecks]]
    * to batch checks over the same table). */
  def uniqueness(df: DataFrame, key: String, name: String): DataFrame =
    tableChecks(df, Seq(AggCheck(name, uniquenessMetric(key))))

  def completeness(df: DataFrame, column: String, name: String): DataFrame =
    tableChecks(df, Seq(AggCheck(name, completenessMetric(column))))

  /** Orphan count: child keys absent from the parent (left anti join). */
  def referentialIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check_name"), col("metric"),
        (col("metric") === 0).as("passed"))

  /** Out-of-range count for a predicate that should always hold. */
  def range(df: DataFrame, valid: Column, name: String): DataFrame =
    tableChecks(df, Seq(AggCheck(name, rangeMetric(valid))))

  /** The star-schema quality report: ONE aggregation pass per table
    * (customer, orders, lineitem) plus one anti-join per FK edge. */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val nation = Tables.nation(spark, dir)
    Seq(
      tableChecks(customer, Seq(
        AggCheck("customer_pk_unique", uniquenessMetric("c_custkey")))),
      tableChecks(orders, Seq(
        AggCheck("orders_pk_unique", uniquenessMetric("o_orderkey")),
        AggCheck("orders_date_complete", completenessMetric("o_orderdate")),
        AggCheck("orders_price_positive", rangeMetric(col("o_totalprice") > 0)))),
      tableChecks(lineitem, Seq(
        AggCheck("lineitem_discount_range",
          rangeMetric(col("l_discount").between(0.0, 1.0))),
        AggCheck("lineitem_quantity_positive",
          rangeMetric(col("l_quantity") > 0)))),
      referentialIntegrity(orders, "o_custkey", customer, "c_custkey",
        "orders_customer_fk"),
      referentialIntegrity(customer, "c_nationkey", nation, "n_nationkey",
        "customer_nation_fk")
    ).reduce(_.unionByName(_))
  }

  val q55 = Q.sql("q55_data_quality",
    """SELECT * FROM (
      |  SELECT 'customer_pk_unique' AS check_name,
      |    count(*) - count(DISTINCT c_custkey) AS metric FROM customer
      |  UNION ALL SELECT 'orders_pk_unique', count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'orders_date_complete', CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'orders_customer_fk', count(*) FROM orders
      |    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |  UNION ALL SELECT 'customer_nation_fk', count(*) FROM customer
      |    WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
      |  UNION ALL SELECT 'lineitem_discount_range', CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 1.0) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'lineitem_quantity_positive', CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'orders_price_positive', CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |) t
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    report(s, d).select("check_name", "metric").orderBy("check_name")
  }

  /** The same checks over a DETERMINISTICALLY dirtied copy of the tables —
    * duplicated keys, nulled dates, dangling FKs, negated quantities — so
    * the oracle pins the failure path of every check, not just the
    * all-green report (a check that can't fail is not a check). */
  val q56 = Q.sql("q56_data_quality_dirty",
    """WITH customer_d AS (
      |  SELECT * FROM customer
      |  UNION ALL SELECT * FROM customer WHERE c_custkey % 100 = 0),
      |orders_d AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
      |    CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
      |    o_totalprice
      |  FROM orders),
      |lineitem_d AS (
      |  SELECT l_orderkey,
      |    CASE WHEN l_orderkey % 101 = 0 THEN -l_quantity ELSE l_quantity END AS l_quantity,
      |    l_discount
      |  FROM lineitem)
      |SELECT *, metric = 0 AS passed FROM (
      |  SELECT 'customer_pk_unique' AS check_name,
      |    count(*) - count(DISTINCT c_custkey) AS metric FROM customer_d
      |  UNION ALL SELECT 'orders_date_complete', CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders_d
      |  UNION ALL SELECT 'orders_customer_fk', count(*) FROM orders_d
      |    WHERE NOT EXISTS (SELECT 1 FROM customer_d WHERE c_custkey = o_custkey)
      |  UNION ALL SELECT 'lineitem_quantity_positive', CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem_d
      |) t
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    val customer = Tables.customer(s, d)
    val customerD = customer.unionByName(customer.filter(col("c_custkey") % 100 === 0))
    val ordersD = Tables.orders(s, d)
      .withColumn("o_orderdate",
        when(col("o_orderkey") % 50 === 0, lit(null)).otherwise(col("o_orderdate")))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 97 === 0, col("o_custkey") + 1000000)
          .otherwise(col("o_custkey")))
    val lineitemD = Tables.lineitem(s, d)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 101 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")))
    Seq(
      uniqueness(customerD, "c_custkey", "customer_pk_unique"),
      completeness(ordersD, "o_orderdate", "orders_date_complete"),
      referentialIntegrity(ordersD, "o_custkey", customerD, "c_custkey",
        "orders_customer_fk"),
      range(lineitemD, col("l_quantity") > 0, "lineitem_quantity_positive")
    ).reduce(_.unionByName(_))
      .orderBy("check_name")
  }

  /** Length-tail trimming — the distributional fence a training
    * pipeline applies per language stratum: docs outside the exact
    * [p05, p95] length band are flagged (truncated garbage at the low
    * end, concatenation accidents at the high end). Quantiles are exact
    * interpolated percentiles over integer lengths, computed identically
    * by both engines (`percentile` ≡ `quantile_cont`, pos = p·(n−1));
    * the per-stratum fence table is tiny and broadcast — one scan plus
    * a map-side filter at any scale. */
  val q89 = Q.sql("q89_length_tails",
    """WITH q AS (
      |  SELECT lang,
      |    quantile_cont(n_chars, 0.05) AS p05,
      |    quantile_cont(n_chars, 0.95) AS p95
      |  FROM documents GROUP BY lang)
      |SELECT d.doc_id, d.lang, d.n_chars
      |FROM documents d JOIN q ON d.lang = q.lang
      |WHERE d.n_chars > q.p95 OR d.n_chars < q.p05
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = graft.Tables.documents(s, d)
    val fences = docs.groupBy("lang").agg(
      element_at(expr("percentile(n_chars, array(0.05D, 0.95D))"), 1).as("p05"),
      element_at(expr("percentile(n_chars, array(0.05D, 0.95D))"), 2).as("p95"))
    docs.join(broadcast(fences), "lang")
      .filter(col("n_chars") > col("p95") || col("n_chars") < col("p05"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q55, q56, q89)
}
