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
    * DECIMAL — order-free — then ONE integer half-up division: quality
    * values are exact 4-dp decimals, so the exact mean is a finite
    * decimal that can land on a .XXXX5 boundary where float round
    * splits the engines — the q233 rule), and the EXACT median
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
      |  CAST((CAST(sum(CAST(CAST(quality AS DECIMAL(18,4)) * 10000 AS BIGINT))
      |             AS BIGINT) * 2
      |        + max(n)) // (2 * max(n)) AS DOUBLE) / 10000.0
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
        (expr("CAST((sum(CAST(CAST(quality AS DECIMAL(18,4)) * 10000 AS BIGINT)) * 2"
          + " + max(n)) div (2 * max(n)) AS DOUBLE)") / 10000.0).as("mean_quality"),
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
    * the replica means (DECIMAL-exact weighted micro sums, rounded in
    * INTEGERS — (s + 50c) div (100c), the q233 half-boundary rule: a
    * mean of 6-dp-exact values is a finite decimal that can sit on a
    * .XXXX5 boundary) and the min/max envelope hash-match. */
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
       |w AS (SELECT event_type, b, $kSql AS k,
       |        CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6
       |      FROM r),
       |m AS (
       |  SELECT event_type, b,
       |    CAST((CAST(sum(k * v6) AS BIGINT) + 50 * CAST(sum(k) AS BIGINT))
       |         // (100 * CAST(sum(k) AS BIGINT)) AS DOUBLE) / 10000.0 AS mb
       |  FROM w GROUP BY 1, 2 HAVING sum(k) > 0),
       |pt AS (
       |  SELECT event_type,
       |    CAST((CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
       |               AS BIGINT)
       |          + 50 * count(*)) // (100 * count(*)) AS DOUBLE) / 10000.0 AS mean,
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
    val v6 = expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
    val m = ev
      .select(col("event_type"), col("value"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"),
        col("event_id"))
      .withColumn("u", pmod(Exprs.mulmod61(Exprs.poly_hash(
        concat(col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
        Kmv.G), lit(10000L)))
      .withColumn("k", kExpr)
      .groupBy("event_type", "b")
      .agg(sum(col("k") * v6).cast("long").as("sv"),
        sum("k").cast("long").as("sk"))
      .filter(col("sk") > 0)
      .select(col("event_type"),
        (expr("CAST((sv + 50 * sk) div (100 * sk) AS DOUBLE)") / 10000.0).as("mb"))
    val pt = ev.groupBy("event_type")
      .agg(sum(v6).cast("long").as("sv"), count(lit(1)).as("n"))
      .select(col("event_type"),
        (expr("CAST((sv + 50 * n) div (100 * n) AS DOUBLE)") / 10000.0).as("mean"),
        col("n"))
    pt.join(m, "event_type")
      .groupBy("event_type", "mean", "n")
      .agg(min("mb").as("ci_lo"), max("mb").as("ci_hi"))
      .orderBy("event_type")
  }

  /** Two-sample Kolmogorov–Smirnov drift: for every source, the KS
    * distance between its document-length distribution and the REST of
    * the corpus — the distribution-shift alarm a corpus refresh runs
    * before accepting a new crawl (q195 covers token-level drift; this
    * is the shape-level complement). Integer-exact: both ECDFs are
    * compared cross-multiplied — D·n_src·n_rest = max over observed
    * values of |cumS·n_rest − cumR·n_src| — so the max is over BIGINTs
    * and the single division happens once at the end.
    *
    * Scale: one scan folds the corpus to a (source × value) histogram;
    * every later step (grid, cumsums, max) runs on histogram-sized
    * data — bounded by distinct lengths, not rows — so the gate costs
    * one aggregation at 100 TB. */
  val q199 = Q.sql("q199_ks_drift",
    """WITH tok AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |h AS (SELECT source, nt, count(*) AS c FROM tok GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM h GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
      |cell AS (
      |  SELECT s.source, v.nt, COALESCE(h.c, 0) AS c
      |  FROM (SELECT DISTINCT source FROM h) s
      |  CROSS JOIN (SELECT DISTINCT nt FROM h) v
      |  LEFT JOIN h ON h.source = s.source AND h.nt = v.nt),
      |sc AS (
      |  SELECT source, nt,
      |    CAST(sum(c) OVER (PARTITION BY source ORDER BY nt) AS BIGINT) AS scum
      |  FROM cell),
      |gc AS (
      |  SELECT nt, CAST(sum(gcv) OVER (ORDER BY nt) AS BIGINT) AS gcum
      |  FROM (SELECT nt, sum(c) AS gcv FROM h GROUP BY 1)),
      |j AS (
      |  SELECT sc.source, sc.scum, gc.gcum, ns.n_src,
      |    tot.n - ns.n_src AS n_rest
      |  FROM sc JOIN gc USING (nt) JOIN ns USING (source) CROSS JOIN tot)
      |SELECT source,
      |  CAST(max(n_src) AS BIGINT) AS n_src,
      |  CAST(max(n_rest) AS BIGINT) AS n_rest,
      |  CAST(max(abs(scum * n_rest - (gcum - scum) * n_src)) AS BIGINT)
      |    AS ks_num,
      |  CAST((CAST(max(abs(scum * n_rest - (gcum - scum) * n_src)) AS BIGINT)
      |        * 20000 + max(n_src) * max(n_rest))
      |       // (2 * max(n_src) * max(n_rest)) AS DOUBLE) / 10000.0 AS ks,
      |  CAST((CAST(max(abs(scum * n_rest - (gcum - scum) * n_src)) AS BIGINT)
      |        * 20000 + max(n_src) * max(n_rest))
      |       // (2 * max(n_src) * max(n_rest)) AS DOUBLE) / 10000.0 >= 0.1
      |    AS drifted
      |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val h = Tables.documents(s, d)
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source", "nt").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // grid, cumsums, and totals all read it
    val ns = h.groupBy("source").agg(sum("c").cast("long").as("n_src"))
    val tot = h.agg(sum("c").cast("long").as("n"))
    val cell = h.select("source").distinct()
      .crossJoin(h.select("nt").distinct())
      .join(h, Seq("source", "nt"), "left").na.fill(0L, Seq("c"))
    val sc = cell.withColumn("scum",
      sum("c").over(Window.partitionBy("source").orderBy("nt")).cast("long"))
    val gc = h.groupBy("nt").agg(sum("c").as("gcv"))
      .withColumn("gcum", sum("gcv").over(Window.orderBy("nt")).cast("long"))
      .select("nt", "gcum")
    sc.join(gc, "nt").join(ns, "source").crossJoin(tot)
      .withColumn("n_rest", col("n") - col("n_src"))
      .withColumn("dnum",
        abs(col("scum") * col("n_rest") - (col("gcum") - col("scum")) * col("n_src")))
      .groupBy("source")
      .agg(max("n_src").cast("long").as("n_src"),
        max("n_rest").cast("long").as("n_rest"),
        max("dnum").cast("long").as("ks_num"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("ks",
        expr("CAST((ks_num * 20000 + n_src * n_rest)"
          + " div (2 * n_src * n_rest) AS DOUBLE)") / 10000.0)
      .withColumn("drifted", col("ks") >= 0.1)
      .orderBy("source")
  }

  /** k-anonymity / l-diversity audit — the re-identification-risk
    * census a governance pipeline publishes before releasing an event
    * table: group rows by a quasi-identifier tuple (event type, day,
    * integer value band), bucket the group sizes k, and report how many
    * groups/rows sit in each risk band together with the l-diversity
    * envelope (distinct users per group — a k-safe group with l = 1
    * still leaks its sensitive attribute). All counts integer; the
    * audit is one aggregation over the table at any scale. */
  val q201 = Q.sql("q201_k_anonymity",
    """WITH g AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(floor(value) AS BIGINT) AS vb,
      |    count(*) AS k, count(DISTINCT user_id) AS l
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY 1, 2, 3)
      |SELECT
      |  CASE WHEN k = 1 THEN '1' WHEN k < 5 THEN '2-4'
      |       WHEN k < 20 THEN '5-19' ELSE '20+' END AS k_bucket,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(k) AS BIGINT) AS n_rows,
      |  CAST(min(l) AS BIGINT) AS min_l,
      |  CAST(max(l) AS BIGINT) AS max_l
      |FROM g GROUP BY 1 ORDER BY k_bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d).filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"),
        floor(col("value")).cast("long").as("vb"))
      .agg(count(lit(1)).as("k"), countDistinct("user_id").as("l"))
      .groupBy(when(col("k") === 1, "1").when(col("k") < 5, "2-4")
        .when(col("k") < 20, "5-19").otherwise("20+").as("k_bucket"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum("k").cast("long").as("n_rows"),
        min("l").cast("long").as("min_l"),
        max("l").cast("long").as("max_l"))
      .orderBy("k_bucket")
  }

  /** Corpus-diversity data card: per source, type–token ratio, Simpson
    * repeat rate Σc(c−1)/N(N−1), Shannon entropy, and the Zipf
    * rank–frequency slope — the lexical-diversity block of a release
    * datasheet (q189 carries volume/quality; this carries the
    * distributional fingerprint a mixture designer reads).
    *
    * Exactness: entropy and the Zipf regression run on the INTEGER
    * piecewise-linear log2 (q181's device — exact in both engines), so
    * the least-squares slope is a ratio of two BIGINTs and every value
    * crosses to DOUBLE exactly once. Scale: everything after the
    * (source × token) count is vocabulary-sized. */
  val q208 = Q.sql("q208_zipf_card",
    """WITH tk AS (
      |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |      FROM tk GROUP BY 1, 2),
      |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |        CAST(count(*) AS BIGINT) AS vocab,
      |        CAST(sum(c * (c - 1)) AS BIGINT) AS rep,
      |        CAST(sum(c * ((length(bin(c)) - 1) * 1024
      |          + c * 1024 // (1::BIGINT << (length(bin(c)) - 1)) - 1024))
      |          AS BIGINT) AS sclogc
      |      FROM c GROUP BY 1),
      |r AS (SELECT source, c,
      |        row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rk
      |      FROM c),
      |q AS (SELECT source,
      |        (length(bin(rk)) - 1) * 1024
      |          + rk * 1024 // (1::BIGINT << (length(bin(rk)) - 1)) - 1024 AS x,
      |        (length(bin(c)) - 1) * 1024
      |          + c * 1024 // (1::BIGINT << (length(bin(c)) - 1)) - 1024 AS y
      |      FROM r),
      |ft AS (SELECT source, CAST(count(*) AS BIGINT) AS m,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx
      |      FROM q GROUP BY 1)
      |SELECT n.source, n.n AS n_tokens, n.vocab,
      |  CAST((n.vocab * 20000 + n.n) // (2 * n.n) AS DOUBLE) / 10000.0 AS ttr,
      |  CAST((n.rep * 20000 + n.n * (n.n - 1))
      |       // (2 * n.n * (n.n - 1)) AS DOUBLE) / 10000.0 AS simpson,
      |  CAST(((n.n * ((length(bin(n.n)) - 1) * 1024
      |      + n.n * 1024 // (1::BIGINT << (length(bin(n.n)) - 1)) - 1024)
      |      - n.sclogc) * 20000 + 1024 * n.n)
      |       // (2048 * n.n) AS DOUBLE) / 10000.0 AS entropy_bits,
      |  CAST(((ft.m * ft.sxy - ft.sx * ft.sy) * 20000
      |        + CASE WHEN ft.m * ft.sxy - ft.sx * ft.sy < 0
      |               THEN -(ft.m * ft.sxx - ft.sx * ft.sx)
      |               ELSE ft.m * ft.sxx - ft.sx * ft.sx END)
      |       // (2 * (ft.m * ft.sxx - ft.sx * ft.sx)) AS DOUBLE) / 10000.0
      |    + 0.0 AS zipf_slope
      |FROM n JOIN ft USING (source) ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val qlog = (name: String) =>
      expr(s"(length(bin($name)) - 1) * 1024" +
        s" + $name * 1024 div shiftleft(1L, length(bin($name)) - 1) - 1024")
    val c = Tables.documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // totals and the rank table both read it
    val n = c.groupBy("source").agg(
      sum("c").cast("long").as("n"),
      count(lit(1)).cast("long").as("vocab"),
      sum(col("c") * (col("c") - 1)).cast("long").as("rep"),
      sum(col("c") * qlog("c")).cast("long").as("sclogc"))
    val ft = c
      .withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy(col("c").desc, col("tok")))
          .cast("long"))
      .select(col("source"), qlog("rk").as("x"), qlog("c").as("y"))
      .groupBy("source").agg(
        count(lit(1)).cast("long").as("m"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
    // all four readouts are integer quotients — integer half-up (sign-
    // aware for the slope) ten-thousandths, the q233 finite-decimal rule
    n.join(ft, "source")
      .select(col("source"), col("n").as("n_tokens"), col("vocab"),
        (expr("CAST((vocab * 20000 + n) div (2 * n) AS DOUBLE)") / 10000.0)
          .as("ttr"),
        (expr("CAST((rep * 20000 + n * (n - 1))"
          + " div (2 * n * (n - 1)) AS DOUBLE)") / 10000.0).as("simpson"),
        (expr("CAST(((n * ((length(bin(n)) - 1) * 1024"
          + " + n * 1024 div shiftleft(1L, length(bin(n)) - 1) - 1024)"
          + " - sclogc) * 20000 + 1024 * n)"
          + " div (2048 * n) AS DOUBLE)") / 10000.0).as("entropy_bits"),
        (expr("CAST(((m * sxy - sx * sy) * 20000"
          + " + CASE WHEN m * sxy - sx * sy < 0"
          + " THEN -(m * sxx - sx * sx) ELSE m * sxx - sx * sx END)"
          + " div (2 * (m * sxx - sx * sx)) AS DOUBLE)") / 10000.0)
          .as("zipf_slope"))
      .orderBy("source")
  }

  /** Two-sided-geometric "DP-style" noisy counts — the release
    * mechanism shape that pairs with q201's k-anonymity audit: each
    * published count carries additive noise from the discrete (two-
    * sided geometric) distribution the geometric mechanism uses. The
    * noise here is DETERMINISTIC — magnitude = trailing-zero count of
    * the key's poly-131·G hash (trailing zeros of a uniform word ARE
    * geometric(½) draws) and the sign is the next bit up — so both
    * engines replay every draw and the gate stays exact. A production
    * release swaps the hash for a secure RNG and gains real ε-DP
    * (ε = ln 2 per count at this p); the pipeline around the draw —
    * one aggregate, one stateless noising map — is what the gate pins.
    * No true count survives into a release table; the gate emits both
    * solely because it IS the correctness check of the mechanism. */
  val q213 = Q.sql("q213_dp_noisy_counts",
    """WITH c AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
      |  FROM events GROUP BY 1),
      |h AS (
      |  SELECT event_type, n_true,
      |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(ks) + 1),
      |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
      |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS hv
      |  FROM (SELECT event_type, n_true, 'dp:' || event_type AS ks FROM c)),
      |z AS (
      |  SELECT event_type, n_true, hv,
      |    CASE WHEN hv = 0 THEN 0
      |         ELSE length(bin(hv & -hv)) - 1 END AS mag
      |  FROM h)
      |SELECT event_type, n_true,
      |  CAST(((hv >> (mag + 1)) & 1) * 2 - 1 AS BIGINT) * mag AS noise,
      |  n_true + CAST(((hv >> (mag + 1)) & 1) * 2 - 1 AS BIGINT) * mag
      |    AS n_noisy
      |FROM z ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).cast("long").as("n_true"))
      .withColumn("hv", Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("dp:"), col("event_type"))), Kmv.G))
      .withColumn("mag",
        when(col("hv") === 0, 0L)
          .otherwise(expr("length(bin(hv & -hv)) - 1").cast("long")))
      .withColumn("noise",
        (expr("shiftright(hv, cast(mag + 1 as int)) & 1") * 2 - 1).cast("long")
          * col("mag"))
      .select(col("event_type"), col("n_true"), col("noise"),
        (col("n_true") + col("noise")).as("n_noisy"))
      .orderBy("event_type")
  }

  /** Population Stability Index drift — q199's KS alarm in the banked
    * form risk/monitoring teams publish: per source, bucket the
    * document-length distribution into bands, add-one smooth over the
    * union of observed bands (the standard guard for empty cells), and
    * PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) against the rest of the corpus, flagged
    * at the industry 0.2 threshold.
    *
    * Exactness: the log is the integer qlog2 over the cross-multiplied
    * rationals — ln(p/q) = ln2·(qlog2(cA·nR) − qlog2(cR·nA))/1024 — so
    * the whole Σ is ONE exact BIGINT accumulator; ln2 enters once as a
    * shared double literal and the final scaling is a fixed IEEE
    * expression. qlog2's monotonicity keeps every term ≥ 0 like the
    * true PSI. Scale: identical to q199 — histogram-sized after one
    * scan. */
  val q216 = Q.sql("q216_psi_drift",
    """WITH tok AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) // 8 AS BIGINT)
      |      AS band
      |  FROM documents),
      |h AS (SELECT source, band, count(*) AS c FROM tok GROUP BY 1, 2),
      |cell AS (
      |  SELECT s.source, v.band, COALESCE(h.c, 0) + 1 AS ca
      |  FROM (SELECT DISTINCT source FROM h) s
      |  CROSS JOIN (SELECT DISTINCT band FROM h) v
      |  LEFT JOIN h ON h.source = s.source AND h.band = v.band),
      |gb AS (SELECT band, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY 1),
      |j AS (
      |  SELECT cell.source, cell.band, cell.ca,
      |    gb.gc + 2 - cell.ca AS cr
      |  FROM cell JOIN gb USING (band)),
      |ns AS (
      |  SELECT source, CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cr) AS BIGINT) AS nr
      |  FROM j GROUP BY 1),
      |terms AS (
      |  SELECT j.source,
      |    (j.ca * ns.nr - j.cr * ns.na)
      |    * (((length(bin(j.ca * ns.nr)) - 1) * 1024
      |        + (j.ca * ns.nr) * 1024
      |          // (1::BIGINT << (length(bin(j.ca * ns.nr)) - 1)) - 1024)
      |      - ((length(bin(j.cr * ns.na)) - 1) * 1024
      |        + (j.cr * ns.na) * 1024
      |          // (1::BIGINT << (length(bin(j.cr * ns.na)) - 1)) - 1024))
      |      AS t,
      |    ns.na, ns.nr
      |  FROM j JOIN ns USING (source))
      |SELECT source, CAST(count(*) AS BIGINT) AS n_buckets,
      |  round(CAST(sum(t) AS DOUBLE) * 0.6931471805599453
      |        / (1024.0 * max(na) * max(nr)), 4) AS psi,
      |  round(CAST(sum(t) AS DOUBLE) * 0.6931471805599453
      |        / (1024.0 * max(na) * max(nr)), 4) > 0.2 AS drifted
      |FROM terms GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val qlog = (e: String) =>
      expr(s"(length(bin($e)) - 1) * 1024" +
        s" + ($e) * 1024 div shiftleft(1L, length(bin($e)) - 1) - 1024")
    val h2 = Tables.documents(s, d)
      .select(col("source"),
        (size(Text.tokens(col("text"))).cast("long")).as("nt"))
      .select(col("source"), expr("nt div 8").as("band"))
      .groupBy("source", "band").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // grid + global bands both read it
    val cell = h2.select("source").distinct()
      .crossJoin(h2.select("band").distinct())
      .join(h2, Seq("source", "band"), "left").na.fill(0L, Seq("c"))
      .withColumn("ca", col("c") + 1)
    val gb = h2.groupBy("band").agg(sum("c").cast("long").as("gc"))
    val j = cell.join(gb, "band")
      .withColumn("cr", col("gc") + 2 - col("ca"))
    val ns = j.groupBy("source")
      .agg(sum("ca").cast("long").as("na"), sum("cr").cast("long").as("nr"))
    j.join(ns, "source")
      .withColumn("pa", col("ca") * col("nr"))
      .withColumn("pb", col("cr") * col("na"))
      .withColumn("t", (col("pa") - col("pb")) * (qlog("pa") - qlog("pb")))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        round(sum("t").cast("double") * lit(0.6931471805599453)
          / (lit(1024.0) * max("na") * max("nr")), 4).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
      .orderBy("source")
  }

  /** Equi-depth histogram build — the ANALYZE-TABLE statistic a
    * cost-based optimizer actually wants (equal ROW mass per bucket,
    * so selectivity of a range predicate reads off the bucket count):
    * values floor-quantize to integer micros (q188's device), rank in
    * the (value, event_id) total order, and bucket b holds ranks
    * ((b−1)·n, b·n]/B — so bucket bounds, counts, and edges are all
    * exact integers and ties split deterministically by rank, the way
    * equi-depth requires (value-split histograms can't bound bucket
    * mass under heavy duplicates). One sort-shuffle per group set. */
  val HistBuckets = 4

  val q222 = Q.sql("q222_equidepth_hist",
    s"""WITH v AS (
       |  SELECT event_type,
       |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq, event_id
       |  FROM events WHERE value IS NOT NULL),
       |r AS (
       |  SELECT event_type, vq,
       |    row_number() OVER (PARTITION BY event_type ORDER BY vq, event_id) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM v)
       |SELECT event_type,
       |  CAST((rn - 1) * $HistBuckets // n + 1 AS BIGINT) AS bucket,
       |  CAST(min(vq) AS BIGINT) AS lo_q6,
       |  CAST(max(vq) AS BIGINT) AS hi_q6,
       |  CAST(count(*) AS BIGINT) AS n_rows
       |FROM r GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"), col("event_id"))
      .withColumn("rn", row_number().over(byType.orderBy("vq", "event_id")))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy(col("event_type"),
        expr(s"(rn - 1) * $HistBuckets div n + 1").cast("long").as("bucket"))
      .agg(min("vq").cast("long").as("lo_q6"),
        max("vq").cast("long").as("hi_q6"),
        count(lit(1)).cast("long").as("n_rows"))
      .orderBy("event_type", "bucket")
  }

  /** k-anonymity generalization ladder — the algorithmic half q201's
    * audit feeds: walk the generalization lattice from the finest
    * quasi-identifier tuple to coarser ones, measure min-k and the
    * at-risk row share at each level, and CHOOSE the first level whose
    * minimum group size clears k ≥ 5 — the core loop of
    * Datafly/Incognito-style anonymizers (their lattices are wider;
    * the ladder is the same decision machinery). At-risk shares round
    * half-up in integers (the operators.Q rule — these are finite
    * decimals). Three aggregations over the table, each
    * histogram-sized after its groupBy. */
  val q239 = Q.sql("q239_generalization_ladder",
    """WITH base AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(floor(value) AS BIGINT) AS vb
      |  FROM events WHERE value IS NOT NULL),
      |l0 AS (SELECT 0 AS lvl, count(*) AS k FROM base GROUP BY event_type, day, vb),
      |l1 AS (SELECT 1 AS lvl, count(*) AS k FROM base GROUP BY event_type, day),
      |l2 AS (SELECT 2 AS lvl, count(*) AS k FROM base GROUP BY event_type),
      |g AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL SELECT * FROM l2),
      |m AS (
      |  SELECT lvl, CAST(min(k) AS BIGINT) AS min_k,
      |    CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_at_risk,
      |    CAST(sum(k) AS BIGINT) AS n_rows
      |  FROM g GROUP BY 1),
      |ch AS (SELECT min(lvl) AS chosen FROM m WHERE min_k >= 5)
      |SELECT CAST(m.lvl AS BIGINT) AS lvl, m.min_k, m.n_groups,
      |  CAST((m.rows_at_risk * 20000 + m.n_rows) // (2 * m.n_rows) AS DOUBLE)
      |    / 10000.0 AS risk_share,
      |  m.lvl = ch.chosen AS chosen
      |FROM m CROSS JOIN ch ORDER BY lvl""".stripMargin) { (s, d) =>
    val base = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        floor(col("value")).cast("long").as("vb"))
      .localCheckpoint(true) // three lattice levels read it
    def level(lvl: Int, keys: Seq[String]) =
      base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("k"))
        .select(lit(lvl).as("lvl"), col("k"))
    val g = level(0, Seq("event_type", "day", "vb"))
      .unionByName(level(1, Seq("event_type", "day")))
      .unionByName(level(2, Seq("event_type")))
    val m = g.groupBy("lvl")
      .agg(min("k").cast("long").as("min_k"),
        count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long").as("rows_at_risk"),
        sum("k").cast("long").as("n_rows"))
    val ch = m.filter(col("min_k") >= 5).agg(min("lvl").as("chosen"))
    m.crossJoin(broadcast(ch))
      .select(col("lvl").cast("long").as("lvl"), col("min_k"), col("n_groups"),
        (expr("CAST((rows_at_risk * 20000 + n_rows) div (2 * n_rows) AS DOUBLE)")
          / 10000.0).as("risk_share"),
        (col("lvl") === col("chosen")).as("chosen"))
      .orderBy("lvl")
  }

  /** Robust outlier census — median/MAD, the outlier rule that
    * survives the exact contamination it is hunting (a mean/stddev
    * z-score drags its own threshold toward the outliers; the median
    * and the median absolute deviation do not): per event type, the
    * EXACT lower median of the micro-quantized values (the q188/q189
    * selection device with event_id tie-break), the exact median of
    * the absolute deviations, and the count beyond 3·MAD. All
    * integers end to end — no rounding seam at all. Two per-type
    * selection windows + one counting aggregate; at 100 TB an exact
    * per-key median costs the per-key sort either way, and the
    * deviation pass reuses the same key partitioning. */
  val q248 = Q.sql("q248_mad_outliers",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY vq, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v),
      |med AS (
      |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN vq END) AS med
      |  FROM r GROUP BY 1),
      |dv AS (
      |  SELECT v.event_type, v.event_id, abs(v.vq - m.med) AS dev,
      |    m.med, m.n
      |  FROM v JOIN med m USING (event_type)),
      |dr AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY dev, event_id) AS rn
      |  FROM dv),
      |mad AS (
      |  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN dev END)
      |    AS mad
      |  FROM dr GROUP BY 1)
      |SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
      |  CAST(max(d.med) AS BIGINT) AS med_micro,
      |  CAST(max(mad.mad) AS BIGINT) AS mad_micro,
      |  CAST(count(CASE WHEN d.dev > 3 * mad.mad THEN 1 END) AS BIGINT)
      |    AS n_outliers
      |FROM dv d JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
      .localCheckpoint(true) // median selection + deviation pass read it
    val byType = Window.partitionBy("event_type")
    val med = v
      .withColumn("rn", row_number().over(byType.orderBy("vq", "event_id")))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max(when(expr("rn = (n + 1) div 2"), col("vq"))).as("med"))
    val dv = v.join(med, "event_type")
      .withColumn("dev", abs(col("vq") - col("med")))
      .localCheckpoint(true) // MAD selection + the outlier count read it
    val mad = dv
      .withColumn("rn", row_number().over(byType.orderBy("dev", "event_id")))
      .groupBy("event_type")
      .agg(max(when(expr("rn = (n + 1) div 2"), col("dev"))).as("mad"))
    dv.join(mad, "event_type")
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max("med").cast("long").as("med_micro"),
        max("mad").cast("long").as("mad_micro"),
        count(when(col("dev") > lit(3) * col("mad"), 1)).cast("long")
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** Cross-source quantile normalization — the batch-effect corrector
    * applied before mixing heterogeneous sources (the q199/q216 drift
    * alarms DETECT a shape mismatch; this op REMOVES it): each doc's
    * token count maps to the pooled corpus value at the same quantile,
    * so every source's length distribution becomes the global one
    * while within-source order is preserved. Exact and replayable:
    * within-source rank r of n_src rows maps to pooled rank
    * 1 + round((r−1)(N−1)/(n_src−1)) — the interpolation is integer
    * half-up, ranks break ties by doc_id, and the mapped value is an
    * exact selection from the pooled order (no float anywhere).
    * Scale: one per-source rank window + one pooled rank — the same
    * cost class as the exact-median gates; production swaps the pooled
    * rank for q114's binned quantiles when N is corpus-sized. */
  val q250 = Q.sql("q250_quantile_normalize",
    """WITH f AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, nt,
      |    row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS r,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM f),
      |g AS (
      |  SELECT nt AS gnt,
      |    row_number() OVER (ORDER BY nt, doc_id) AS gr
      |  FROM f),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM f),
      |m AS (
      |  SELECT r.doc_id, r.source, r.nt,
      |    CASE WHEN r.n = 1 THEN (t.nn + 1) // 2
      |         ELSE 1 + ((r.r - 1) * (t.nn - 1) * 2 + (r.n - 1))
      |                  // (2 * (r.n - 1)) END AS pos
      |  FROM r CROSS JOIN t)
      |SELECT m.doc_id, m.source, m.nt, g.gnt AS norm_nt
      |FROM m JOIN g ON g.gr = m.pos
      |ORDER BY m.doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val f = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("nt"))
      .localCheckpoint(true) // source ranks + the pooled rank read it
    val bySource = Window.partitionBy("source")
    val r = f
      .withColumn("r", row_number().over(bySource.orderBy("nt", "doc_id"))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(bySource))
    // the POOLED rank rides the corpus — routed above GlobalWindowCap to
    // the distributed sort + partition-offset form (the per-source ranks
    // above stay windowed: they are partitioned, never a global funnel)
    val g = ScaleWindows.globalOrderedScan(
        f.select(col("nt").as("gnt"), col("doc_id").as("gid")),
        Seq(col("gnt"), col("gid")), Some("gr"),
        // f is checkpointed — its count is a cached-blocks job, and
        // passing it keeps the pooled-rank call from re-materializing
        // the projection just to route (r14 advice)
        knownCount = Some(f.count()))
      .select("gnt", "gr")
    val nn = f.agg(count(lit(1)).cast("long").as("nn"))
    r.crossJoin(broadcast(nn))
      .withColumn("pos",
        when(col("n") === 1, expr("(nn + 1) div 2"))
          .otherwise(expr(
            "1 + ((r - 1) * (nn - 1) * 2 + (n - 1)) div (2 * (n - 1))")))
      .join(g, col("gr") === col("pos"))
      .select(col("doc_id"), col("source"), col("nt"), col("gnt").as("norm_nt"))
      .orderBy("doc_id")
  }

  /** Per-user behavioral entropy — the bot/automation census an abuse
    * team reads: a genuine user spreads events across types (high
    * entropy), a scripted one hammers a single action (low entropy at
    * high volume). Entropy in integer qlog2 units per q208's device —
    * H = Σc·(qlog2(n) − qlog2(c)) / (1024·n) bits, rounded half-up in
    * integers — and the flag is the fixed policy (≥ [[BotMinEvents]]
    * events AND < 1 bit). Top-50 most active users keep the output
    * bounded. One groupBy(user, type) then a users-sized fold. */
  val BotMinEvents = 40

  val q253 = Q.sql("q253_user_entropy", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    s"""WITH c AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
       |u AS (
       |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(sum(c * ${ql("c")}) AS BIGINT) AS sclogc
       |  FROM c GROUP BY 1),
       |e AS (
       |  SELECT user_id, n, n_types,
       |    CAST(((n * ${ql("n")} - sclogc) * 20000 + 1024 * n)
       |         // (2048 * n) AS DOUBLE) / 10000.0 AS entropy_bits
       |  FROM u)
       |SELECT user_id, n AS n_events, n_types, entropy_bits,
       |  n >= $BotMinEvents AND entropy_bits < 1.0 AS bot_suspect
       |FROM e ORDER BY n_events DESC, user_id LIMIT 50""".stripMargin
  }) { (s, d) =>
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 div shiftleft(1L, length(bin($x)) - 1) - 1024)"
    Tables.events(s, d).filter(col("user_id").isNotNull)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("user_id")
      .agg(sum("c").cast("long").as("n"),
        count(lit(1)).cast("long").as("n_types"),
        sum(expr(s"c * ${ql("c")}")).cast("long").as("sclogc"))
      .withColumn("entropy_bits",
        expr(s"CAST(((n * ${ql("n")} - sclogc) * 20000 + 1024 * n)"
          + " div (2048 * n) AS DOUBLE)") / 10000.0)
      .select(col("user_id"), col("n").as("n_events"), col("n_types"),
        col("entropy_bits"),
        (col("n") >= BotMinEvents && col("entropy_bits") < 1.0)
          .as("bot_suspect"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(50)
  }

  /** Gini concentration of the token distribution per source — the
    * one-number "how head-heavy is this corpus" census (q208's Zipf
    * slope fits the shape; Gini summarizes inequality the way release
    * datasheets quote it): with counts sorted ascending and ranked
    * 1..n, G = (2·Σi·cᵢ − (n+1)·T) / (n·T) — exact integers end to
    * end, one half-up integer division at the readout (numerator ≥ 0
    * for the ascending order). Vocab-sized rank window per source. */
  val q259 = Q.sql("q259_gini_concentration",
    """WITH c AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source,
      |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |        FROM documents) GROUP BY 1, 2),
      |r AS (
      |  SELECT source, c,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY c, tok)
      |      AS BIGINT) AS i
      |  FROM c),
      |a AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS t, CAST(sum(i * c) AS BIGINT) AS s
      |  FROM r GROUP BY 1)
      |SELECT source, n AS n_vocab, t AS total_tokens,
      |  CAST(((2 * s - (n + 1) * t) * 20000 + n * t)
      |       // (2 * n * t) AS DOUBLE) / 10000.0 AS gini
      |FROM a ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    Tables.documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).cast("long").as("c"))
      .withColumn("i", row_number().over(
        Window.partitionBy("source").orderBy(col("c"), col("tok")))
        .cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("c").cast("long").as("t"),
        sum(col("i") * col("c")).cast("long").as("s"))
      .select(col("source"), col("n").as("n_vocab"),
        col("t").as("total_tokens"),
        (expr("CAST(((2 * s - (n + 1) * t) * 20000 + n * t)"
          + " div (2 * n * t) AS DOUBLE)") / 10000.0).as("gini"))
      .orderBy("source")
  }

  /** Winsorization report — the tail-clipping preprocessor a metrics
    * pipeline applies before averaging anything a whale can skew:
    * per event type, the exact p5/p95 cut values (rank selection with
    * event_id tie-break — lo at ⌈0.05n⌉, hi at n+1−⌈0.05n⌉), the
    * clipped-row counts, and the winsorized mean over micro-quantized
    * values (integer half-up — the q233 rule). The raw mean rides
    * along so the report shows what the clipping changed. One rank
    * window + one counting aggregate per type. */
  val q261 = Q.sql("q261_winsorize",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY vq, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v),
      |cuts AS (
      |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |    max(CASE WHEN rn = (n + 19) // 20 THEN vq END) AS lo,
      |    max(CASE WHEN rn = n + 1 - (n + 19) // 20 THEN vq END) AS hi
      |  FROM r GROUP BY 1),
      |w AS (
      |  SELECT v.event_type, c.n, c.lo, c.hi,
      |    CASE WHEN v.vq < c.lo THEN c.lo
      |         WHEN v.vq > c.hi THEN c.hi ELSE v.vq END AS wq,
      |    CASE WHEN v.vq < c.lo THEN 1 ELSE 0 END AS cl,
      |    CASE WHEN v.vq > c.hi THEN 1 ELSE 0 END AS ch,
      |    v.vq
      |  FROM v JOIN cuts c USING (event_type))
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(lo) AS BIGINT) AS lo_micro,
      |  CAST(max(hi) AS BIGINT) AS hi_micro,
      |  CAST(sum(cl) AS BIGINT) AS n_clipped_low,
      |  CAST(sum(ch) AS BIGINT) AS n_clipped_high,
      |  CAST((CAST(sum(vq) AS BIGINT) + 50 * max(n)) // (100 * max(n))
      |       AS DOUBLE) / 10000.0 AS raw_mean,
      |  CAST((CAST(sum(wq) AS BIGINT) + 50 * max(n)) // (100 * max(n))
      |       AS DOUBLE) / 10000.0 AS wins_mean
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
      .localCheckpoint(true) // cut selection + the clipping pass read it
    val byType = Window.partitionBy("event_type")
    val cuts = v
      .withColumn("rn", row_number().over(byType.orderBy("vq", "event_id")))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max(when(expr("rn = (n + 19) div 20"), col("vq"))).as("lo"),
        max(when(expr("rn = n + 1 - (n + 19) div 20"), col("vq"))).as("hi"))
    v.join(broadcast(cuts), "event_type")
      .withColumn("wq",
        when(col("vq") < col("lo"), col("lo"))
          .when(col("vq") > col("hi"), col("hi")).otherwise(col("vq")))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max("lo").cast("long").as("lo_micro"),
        max("hi").cast("long").as("hi_micro"),
        sum(when(col("vq") < col("lo"), 1L).otherwise(0L)).cast("long")
          .as("n_clipped_low"),
        sum(when(col("vq") > col("hi"), 1L).otherwise(0L)).cast("long")
          .as("n_clipped_high"),
        sum("vq").cast("long").as("sv"), sum("wq").cast("long").as("sw"))
      .select(col("event_type"), col("n"), col("lo_micro"), col("hi_micro"),
        col("n_clipped_low"), col("n_clipped_high"),
        (expr("CAST((sv + 50 * n) div (100 * n) AS DOUBLE)") / 10000.0)
          .as("raw_mean"),
        (expr("CAST((sw + 50 * n) div (100 * n) AS DOUBLE)") / 10000.0)
          .as("wins_mean"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q122, q188, q189, q197, q199, q201, q208, q213, q216,
    q222, q239, q248, q250, q253, q259, q261)
}
