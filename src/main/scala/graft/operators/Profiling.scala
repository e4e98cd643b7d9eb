package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling — the per-column census (row count, null count,
  * distinct count, min/max) a governance pipeline publishes next to
  * every layer it writes (the reference's operational equivalent is its
  * unique-index + presence conventions; a Spark-side profile makes the
  * same facts queryable).
  *
  * Shape: ONE aggregation over the table computes every column's
  * counters (no per-column scans). Exact `countDistinct` over many
  * columns expands rows ×columns through the shuffle — the right
  * correctness gate at oracle scale; at 100 TB flip `approxDistinct`
  * and the expand is replaced by mergeable HLL sketches at the same
  * single-scan cost. min/max are computed on the raw typed values and
  * rendered to canonical strings only after aggregation.
  */
object Profiling {

  /** One column's profile spec: the raw column plus a post-aggregation
    * canonical string renderer (applied to min/max AFTER the agg so
    * ordering happens on the typed value, not its string form). */
  final case class ColSpec(name: String, raw: Column,
      render: Column => Column = _.cast("string"))

  def profile(df: DataFrame, specs: Seq[ColSpec],
      approxDistinct: Boolean = false): DataFrame = {
    val aggs = specs.flatMap { sp =>
      Seq(
        count(sp.raw).as(s"__nn_${sp.name}"),
        (if (approxDistinct) approx_count_distinct(sp.raw)
         else countDistinct(sp.raw)).as(s"__nd_${sp.name}"),
        min(sp.raw).as(s"__mn_${sp.name}"),
        max(sp.raw).as(s"__mx_${sp.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = specs.map { sp =>
      struct(
        lit(sp.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${sp.name}")).as("n_null"),
        col(s"__nd_${sp.name}").as("n_distinct"),
        sp.render(col(s"__mn_${sp.name}")).as("min_s"),
        sp.render(col(s"__mx_${sp.name}")).as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Profile gate over `orders`: every column, exact distincts, typed
    * min/max rendered canonically (doubles via DECIMAL(18,2),
    * timestamps via DATE). The oracle is the same census as six
    * UNION-ALL'd aggregates. */
  val q122 = Q.sql("q122_profile",
    """SELECT * FROM (
      |  SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
      |    count(*) - count(o_custkey) AS n_null,
      |    count(DISTINCT o_custkey) AS n_distinct,
      |    CAST(min(o_custkey) AS VARCHAR) AS min_s,
      |    CAST(max(o_custkey) AS VARCHAR) AS max_s FROM orders
      |  UNION ALL
      |  SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
      |    count(DISTINCT o_orderdate),
      |    CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR),
      |    CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
      |    count(DISTINCT o_orderkey),
      |    CAST(min(o_orderkey) AS VARCHAR),
      |    CAST(max(o_orderkey) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
      |    count(DISTINCT o_orderpriority),
      |    min(o_orderpriority), max(o_orderpriority) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |    count(DISTINCT o_orderstatus),
      |    min(o_orderstatus), max(o_orderstatus) FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |    count(DISTINCT o_totalprice),
      |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
      |) ORDER BY col_name""".stripMargin) { (s, d) =>
    profile(Tables.orders(s, d), Seq(
      ColSpec("o_orderkey", col("o_orderkey")),
      ColSpec("o_custkey", col("o_custkey")),
      ColSpec("o_orderstatus", col("o_orderstatus")),
      ColSpec("o_totalprice", col("o_totalprice"),
        c => c.cast("decimal(18,2)").cast("string")),
      ColSpec("o_orderdate", col("o_orderdate"),
        c => c.cast("date").cast("string")),
      ColSpec("o_orderpriority", col("o_orderpriority"))))
      .orderBy("col_name")
  }

  val all: Seq[Q] = Seq(q122)
}
