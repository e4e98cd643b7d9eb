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

  /** Exact order-statistic selection per group — the EXACT counterpart
    * of q114's binned approximation: the lower median and the p90 of
    * `value` per event type, by POSITION (k-th smallest, k = ⌈n/2⌉ and
    * ⌈0.9n⌉), with values floor-quantized to integer micro-units first
    * (the q162 device) so no float compare or interpolation exists
    * anywhere — selection by rank is deterministic even through value
    * ties. One sort-shuffle per group set, then a rank filter; at
    * 100 TB the same statement runs on range-partitioned sort, and the
    * approximate path (q114) pre-shrinks when exactness isn't owed. */
  val q188 = Q.sql("q188_exact_quantiles",
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq,
      |    event_id
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, vq,
      |    row_number() OVER (PARTITION BY event_type ORDER BY vq, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN vq END) AS BIGINT) AS med_q6,
      |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN vq END) AS BIGINT) AS p90_q6
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"), col("event_id"))
    val byType = Window.partitionBy("event_type")
    v.withColumn("rn", row_number().over(byType.orderBy("vq", "event_id")))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max(when(expr("rn = (n + 1) div 2"), col("vq"))).as("med_q6"),
        max(when(expr("rn = (9 * n + 9) div 10"), col("vq"))).as("p90_q6"))
      .orderBy("event_type")
  }

  /** Per-source data card — the datasheet row a corpus release ships:
    * volume (docs, tokens), language spread, exact-duplicate mass
    * (docs minus distinct digests), mean quality (q22 scores summed as
    * DECIMAL — order-free — then one division), and the EXACT median
    * document length (the q188 selection device with doc_id
    * tie-break). One scan computes every per-doc feature; the card
    * itself is a sources-sized aggregate. The judge of a data release
    * reads exactly this table — making it a gate keeps the numbers
    * honest against the engines' independent derivations. */
  val q189 = Q.sql("q189_data_card",
    """WITH f AS (
      |  SELECT doc_id, source, lang, md5(text) AS dig,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS nt,
      |    round(0.4 * least(length(text)/500.0, 1.0)
      |        + 0.3 * (1.0 - least(5.0*(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
      |        + 0.3 * least(4.0*len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> list_contains(['the','and','of','to','in','is','a'], x))) / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
      |    , 4) AS quality
      |  FROM documents),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM f)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(max(n) - count(DISTINCT dig) AS BIGINT) AS dup_docs,
      |  round(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / max(n), 4)
      |    AS mean_quality,
      |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN nt END) AS BIGINT)
      |    AS med_tokens
      |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val f = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(col("text").cast("binary")).as("dig"),
        size(Text.tokens(col("text"))).cast("long").as("nt"),
        Text.qualityScore(col("text")).as("quality"))
    val bySource = Window.partitionBy("source")
    f.withColumn("rn", row_number().over(bySource.orderBy("nt", "doc_id")))
      .withColumn("n", count(lit(1)).over(bySource))
      .groupBy("source")
      .agg(max("n").cast("long").as("n_docs"),
        sum("nt").cast("long").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        (max("n") - countDistinct("dig")).cast("long").as("dup_docs"),
        round(sum(col("quality").cast("decimal(18,4)")).cast("double")
          / max("n"), 4).as("mean_quality"),
        max(when(expr("rn = (n + 1) div 2"), col("nt"))).as("med_tokens"))
      .orderBy("source")
  }

  /** Poisson-bootstrap confidence intervals — the resampling that
    * works at 100 TB: instead of drawing n rows with replacement
    * (impossible distributed), every row enters replica b with
    * multiplicity k ~ Poisson(1), so a replica is one weighted
    * aggregation and all [[BootB]] replicas ride ONE map-side explode +
    * one shuffle. Draws are deterministic: k inverts the Poisson(1)
    * CDF (quantized to 1/10⁴) at u = poly-131·G hash of
    * "event_id:replica" mod 10⁴ — both engines replay every draw, so
    * the replica means (DECIMAL-exact weighted sums, one IEEE division,
    * rounded) and the min/max envelope hash-match. */
  val BootB = 16

  /** Poisson(1) CDF cut points in 1/10⁴ units: P(K ≤ k) for k = 0.. */
  private val PoisCdf = Seq(3679L, 7358L, 9197L, 9810L, 9963L, 9994L, 9999L)

  val q197 = Q.sql("q197_bootstrap_ci", {
    val kSql = PoisCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoisCdf.size} END")
    s"""WITH r AS (
       |  SELECT e.event_type, e.value, b.b,
       |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(k) + 1),
       |                     c -> CAST(ascii(substr(k, c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 % 10000 AS BIGINT)
       |      AS u
       |  FROM (SELECT event_type, value, event_id,
       |               CAST(event_id AS VARCHAR) AS ks
       |        FROM events WHERE value IS NOT NULL) e
       |  CROSS JOIN (SELECT unnest(range(0, $BootB)) AS b) b
       |  CROSS JOIN LATERAL (SELECT e.ks || ':' || CAST(b.b AS VARCHAR) AS k) t),
       |w AS (SELECT event_type, value, b, $kSql AS k FROM r),
       |m AS (
       |  SELECT event_type, b,
       |    round(CAST(sum(k * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
       |          / sum(k), 4) + 0.0 AS mb
       |  FROM w GROUP BY 1, 2 HAVING sum(k) > 0),
       |pt AS (
       |  SELECT event_type,
       |    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
       |          / count(*), 4) + 0.0 AS mean,
       |    count(*) AS n
       |  FROM events WHERE value IS NOT NULL GROUP BY 1)
       |SELECT pt.event_type, pt.mean, CAST(pt.n AS BIGINT) AS n,
       |  min(m.mb) AS ci_lo, max(m.mb) AS ci_hi
       |FROM pt JOIN m ON m.event_type = pt.event_type
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  }) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
      .localCheckpoint(true) // replica stream + point estimate share it
    val kExpr = {
      val u = col("u")
      PoisCdf.zipWithIndex.foldRight(lit(PoisCdf.size): org.apache.spark.sql.Column) {
        case ((c, k), acc) => when(u < c, k).otherwise(acc)
      }
    }
    val m = ev
      .select(col("event_type"), col("value"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"),
        col("event_id"))
      .withColumn("u", pmod(Exprs.mulmod61(Exprs.poly_hash(
        concat(col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
        Kmv.G), lit(10000L)))
      .withColumn("k", kExpr)
      .groupBy("event_type", "b")
      .agg((sum(col("k") * col("value").cast("decimal(18,6)"))).as("sv"),
        sum("k").as("sk"))
      .filter(col("sk") > 0)
      .select(col("event_type"),
        round(col("sv").cast("double") / col("sk"), 4).as("mb"))
    val pt = ev.groupBy("event_type")
      .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 4).as("mean"),
        count(lit(1)).as("n"))
    pt.join(m, "event_type")
      .groupBy("event_type", "mean", "n")
      .agg(min("mb").as("ci_lo"), max("mb").as("ci_hi"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q122, q188, q189, q197)
}
