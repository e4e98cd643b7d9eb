package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew- and inequality-join strategies for cluster scale.
  *
  * Both operators here exist because the naive Spark formulation of
  * their workload stops scaling at some multiple of the data: a plain
  * shuffle join collapses when one key holds a double-digit percent of
  * the fact table (one straggler task gets the whole key), and a plain
  * theta/inequality join has no equality conjunct at all, so Spark
  * falls back to BroadcastNestedLoopJoin — O(|L|·|R|) comparisons.
  *
  * `saltedJoin` is the classic remedy for the first (explode the hot
  * keys across `salts` sub-keys; replicate the compact side once per
  * sub-key), for the regime where the compact side is too large to
  * broadcast outright but cheap to replicate a handful of times. AQE's
  * skew-join split handles moderate skew automatically; salting is the
  * explicit, planner-independent form that also works inside
  * aggregations and when AQE's per-partition thresholds don't trigger.
  *
  * `rangeJoin` is the standard binning rewrite for the second: quantize
  * the point and the interval onto a bin grid sized so each interval
  * spans a bounded number of bins, join on bin EQUALITY (shuffle or
  * broadcast — the planner's choice again), then re-check the exact
  * predicate. Cost becomes O(matches + bins touched), independent of
  * |L|·|R|.
  */
object ScaleJoins {

  /** Inner equi-join `skewed ⋈ compact` on `key`, with the skewed side
    * scattered across `salts` deterministic sub-keys and the compact
    * side replicated once per sub-key. Result is identical to the plain
    * join for ANY salt assignment; `saltOn` names the skewed-side
    * columns whose hash spreads the hot key (pick columns ~unique per
    * row, e.g. a line number). Contract: `key` is unique-ish on
    * `compact` in the usual dimension-join sense — replication does not
    * duplicate matches because each skewed row carries exactly one salt.
    */
  def saltedJoin(skewed: DataFrame, compact: DataFrame, key: String,
      salts: Int, saltOn: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val s = skewed.withColumn("__salt",
      pmod(xxhash64(saltOn.map(col): _*), lit(salts)).cast("int"))
    val c = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(c, Seq(key, "__salt")).drop("__salt")
  }

  /** Inner join of `points` (long column `pCol`) to `intervals`
    * (half-open `[sCol, eCol)`, long columns) via bin-grid equality.
    * Each interval is exploded to the bins it overlaps (≤ ⌈len/binWidth⌉
    * + 1 rows); each point probes exactly its own bin, so no pair is
    * produced twice and no distinct/dedup pass is needed. Choose
    * `binWidth` ≈ the typical interval length: replication stays O(1)
    * per interval and bin selectivity does the pruning the missing
    * equality conjunct couldn't.
    */
  def rangeJoin(points: DataFrame, pCol: String, intervals: DataFrame,
      sCol: String, eCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // floor-div via floor(double): exact for |days| < 2^52, and matches
    // floor semantics for negative values where Spark's `div` truncates
    val p = points.withColumn("__bin",
      floor(col(pCol).cast("double") / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(sCol).cast("double") / binWidth).cast("long"),
        floor((col(eCol).cast("double") - 1) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pCol) >= col(sCol) && col(pCol) < col(eCol))
      .drop("__bin")
  }

  /** Salted-join gate: lineitem scattered over 8 salts, orders
    * replicated ×8, then the usual revenue rollup. The oracle is the
    * PLAIN join — salting must be invisible in the result. */
  val q101 = Q.sql("q101_salted_join",
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    saltedJoin(
      Tables.lineitem(s, d),
      Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey"),
      key = "l_orderkey", salts = 8,
      saltOn = Seq("l_orderkey", "l_linenumber"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Range-join gate: every urgent order is the interval
    * [orderdate, orderdate+2d) on the epoch-day line; lineitem shipdates
    * are the points. The oracle states the relation as the raw
    * inequality join — the binned plan must produce exactly it.
    *
    * The aggregation is pushed BELOW the join (eager aggregation): the
    * final group keys are (o_orderkey) and the measures are additive,
    * so lineitem first collapses to one row per distinct ship-day
    * (~2.4k days regardless of SF) carrying (count, sum_qty) partials,
    * and the range join then pairs day-aggregates with intervals
    * instead of raw rows. At sf0.1 that's a 30M-candidate pair stream
    * reduced to ~60k; at 100 TB the join cost becomes O(days ×
    * intervals-per-bin), independent of lineitem row count. Catalyst
    * does not perform this group-by pushdown itself, so it is stated
    * in the plan. Exactness: each (day, interval) pair is produced at
    * most once by the bin grid, and decimal partial sums re-add to the
    * same total. */
  val q102 = Q.sql("q102_range_join",
    """SELECT o_orderkey, count(*) AS n_ship,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM orders o JOIN lineitem l
      |  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
      | AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE) + INTERVAL 2 DAY
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val dayAgg = Tables.lineitem(s, d)
      .select(unix_date(to_date(col("l_shipdate"))).cast("long").as("p"),
        col("l_quantity").cast("decimal(18,2)").as("__qty"))
      .groupBy("p")
      .agg(count(lit(1)).as("__n"), sum(col("__qty")).as("__sum"))
    val intervals = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("s"))
      .withColumn("e", col("s") + 2)
    rangeJoin(dayAgg, "p", intervals, "s", "e", binWidth = 2L)
      .groupBy("o_orderkey")
      .agg(
        sum(col("__n")).as("n_ship"),
        sum(col("__sum")).cast("double").as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** Zipfian stress for the salted join: ~25% of lineitem is remapped
    * onto ONE hot key (l_orderkey % 4 = 0 → 0 — deterministic, DuckDB
    * replays it), the dim side collapses to unique keys under the same
    * remap, and the join runs salted. The oracle is the PLAIN join over
    * the remapped relations: salting must be invisible in the result
    * under adversarial skew, not just the mild natural kind q101 sees.
    * (At gate scale the planner may broadcast the small dim anyway;
    * the salt-spread bound itself — max rows per (key, salt) ≈
    * |hot|/salts — is pinned by ScaleSpec directly on the salted
    * stream, planner-independently.) */
  val q149 = Q.sql("q149_skew_salted_join",
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0 ELSE l_orderkey END AS hk,
      |         l_extendedprice, l_discount
      |  FROM lineitem),
      |dim AS (
      |  SELECT CASE WHEN o_orderkey % 4 = 0 THEN 0 ELSE o_orderkey END AS hk,
      |         min(o_orderpriority) AS pr
      |  FROM orders GROUP BY 1)
      |SELECT pr, count(*) AS n_items,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM f JOIN dim USING (hk)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val fact = Tables.lineitem(s, d)
      .withColumn("hk",
        when(pmod(col("l_orderkey"), lit(4)) === 0, lit(0L))
          .otherwise(col("l_orderkey")))
      .select(col("hk"), col("l_extendedprice"), col("l_discount"),
        col("l_orderkey"), col("l_linenumber"))
    val dim = Tables.orders(s, d)
      .withColumn("hk",
        when(pmod(col("o_orderkey"), lit(4)) === 0, lit(0L))
          .otherwise(col("o_orderkey")))
      .groupBy("hk").agg(min("o_orderpriority").as("pr"))
    saltedJoin(fact, dim, key = "hk", salts = 8,
      saltOn = Seq("l_orderkey", "l_linenumber"))
      .groupBy("pr")
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("pr")
  }

  /** Join-key skew census — the diagnostic a pipeline runs BEFORE
    * choosing between a plain shuffle join and q149's salted plan: per
    * power-of-two group-size bucket, how many keys live there, how many
    * rows they carry, and the bucket's share of the table. The heavy
    * tail (top buckets holding a double-digit row share across a
    * handful of keys) is exactly the signal that triggers salting /
    * AQE skew splitting; publishing it as a table makes the decision
    * auditable. One groupBy(key) then a bucket fold over the
    * keys-sized count table — the census never rescans rows. */
  val q211 = Q.sql("q211_skew_report",
    """WITH c AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
      |SELECT CAST(length(bin(cnt)) AS BIGINT) AS size_bucket,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  CAST(max(cnt) AS BIGINT) AS max_rows,
      |  CAST((CAST(sum(cnt) AS BIGINT) * 20000 + max(t.n))
      |       // (2 * max(t.n)) AS DOUBLE) / 10000.0 AS row_share
      |FROM c CROSS JOIN t
      |GROUP BY 1 ORDER BY size_bucket""".stripMargin) { (s, d) =>
    val c = graft.Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).cast("long").as("cnt"))
    val t = c.agg(sum("cnt").cast("long").as("n"))
    c.crossJoin(broadcast(t))
      .groupBy(length(bin(col("cnt"))).cast("long").as("size_bucket"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum("cnt").cast("long").as("n_rows"),
        max("cnt").cast("long").as("max_rows"),
        // integer half-up: a keys-share is a finite-decimal-capable
        // quotient — the q233 rule
        (expr("CAST((sum(cnt) * 20000 + max(n)) div (2 * max(n)) AS DOUBLE)")
          / 10000.0).as("row_share"))
      .orderBy("size_bucket")
  }

  val all: Seq[Q] = Seq(q101, q102, q149, q211)
}
