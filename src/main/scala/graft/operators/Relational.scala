package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator inventory from SURVEY.md §2 re-expressed over the
  * driver's star schema: aggregations (A1-A8), joins (J1-J11 classes),
  * filters (F1-F9), set ops (§2.7), window/top-k (§2.6 / K5), pivot
  * (A6/K3), scope fan-out collapse (A3), recodes (X25), year extraction
  * (X23), key normalization (X20/X27).
  *
  * Scale notes (100 TB design intent, verified via .explain on the bench):
  *  - dimension sides (region/nation/supplier/customer-by-key) are
  *    `broadcast()` so fact scans never shuffle for the join;
  *  - aggregations are partial (map-side combine) by construction;
  *  - top-k per group is window + row_number ≤ k, which AQE executes as a
  *    single shuffle on the partition key — no global sort;
  *  - all filters/projections are pushdown-friendly (no UDF gates).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: the A1 "wide agg" archetype.
    * Decimal-exact sums, double at the boundary. */
  val q01 = Q.sql("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)/count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(18,6)")).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A1: count by (dimension, day) over the event stream table. */
  val q02 = Q.sql("q02_events_by_type_day",
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "day")
  }

  /** A2: conditional sum (reference's fulltext metric shape). */
  val q03 = Q.sql("q03_conditional_sum",
    """SELECT CAST(ts AS DATE) AS day, count(*) AS total,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("day")
  }

  /** F1: the governance input gate — IN-set + non-null + non-empty. */
  val q04 = Q.sql("q04_filter_gate",
    """SELECT o_orderstatus, count(*) AS cnt
      |FROM orders
      |WHERE o_orderstatus IN ('O','F') AND o_orderpriority IS NOT NULL
      |  AND o_orderpriority <> ''
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F") &&
        col("o_orderpriority").isNotNull && col("o_orderpriority") =!= "")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** J1-class: fact scan + chain of broadcast dimension joins. */
  val q05 = Q.sql("q05_star_join",
    """SELECT r_name, n_name, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("cnt"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** J3-class: left join + coalesce fallback precedence. */
  val q06 = Q.sql("q06_left_join_coalesce",
    """SELECT coalesce(n_name, 'unknown') AS nation_name, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_bal
      |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(coalesce(col("n_name"), lit("unknown")).as("nation_name"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .orderBy("nation_name")
  }

  /** Left-semi join (EXISTS): J6's probe shape. */
  val q07 = Q.sql("q07_semi_join",
    """SELECT c_mktsegment, count(*) AS cnt FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS). */
  val q08 = Q.sql("q08_anti_join",
    """SELECT c_mktsegment, count(*) AS cnt FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")
  }

  /** K5: top-10 per group via ranking window, deterministic tie-break. */
  val q09 = Q.sql("q09_topk_per_group",
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      |  FROM customer) t
      |WHERE rn <= 10
      |ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).cast("bigint").as("rn"))
      .filter(col("rn") <= 10)
      .orderBy("c_mktsegment", "rn")
  }

  /** A6/K3: pivot day × event_type counts (the JSON-export shape). */
  val q10 = Q.sql("q10_pivot_day_type",
    """SELECT CAST(ts AS DATE) AS day,
      |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .orderBy("day")
  }

  /** A3 collapsed: the reference's global + per-scope re-runs become one
    * scope-exploded aggregation pass. */
  val q11 = Q.sql("q11_scope_explode",
    """SELECT scope, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM (SELECT unnest(['GLOBAL', o_orderstatus]) AS scope, o_totalprice
      |      FROM orders) t
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(explode(array(lit("GLOBAL"), col("o_orderstatus"))).as("scope"),
        col("o_totalprice"))
      .groupBy("scope")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("scope")
  }

  /** A5: distinct count per group. */
  val q12 = Q.sql("q12_distinct_users",
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** S9: multi-source union with provenance tag. */
  val q13 = Q.sql("q13_union_provenance",
    """SELECT _source, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_bal
      |FROM (SELECT c_acctbal AS acctbal, 'customer' AS _source FROM customer
      |      UNION ALL
      |      SELECT s_acctbal, 'supplier' FROM supplier) t
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
      .select(col("c_acctbal").as("acctbal"), lit("customer").as("_source"))
    val p = Tables.supplier(s, d)
      .select(col("s_acctbal").as("acctbal"), lit("supplier").as("_source"))
    c.unionByName(p)
      .groupBy("_source")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .orderBy("_source")
  }

  /** A4: set-union accumulation (collect_set ≡ $addToSet), order-normalized. */
  val q14 = Q.sql("q14_collect_set",
    """SELECT c_nationkey, array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))
      .orderBy("c_nationkey")
  }

  /** A8: min/max bounds per group. */
  val q15 = Q.sql("q15_minmax_bounds",
    """SELECT event_type, min(CAST(ts AS DATE)) AS min_day,
      |  max(CAST(ts AS DATE)) AS max_day, count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        min(to_date(col("ts"))).as("min_day"),
        max(to_date(col("ts"))).as("max_day"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** §2.6: running sum window (decimal-exact accumulation). */
  val q16 = Q.sql("q16_running_sum",
    """SELECT event_id, user_id,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 3) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double"), 3)
          .as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** X25: $switch-style recode via when-chain. */
  val q17 = Q.sql("q17_recode",
    """SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'critical'
      |            WHEN o_orderpriority = '2-HIGH' THEN 'high'
      |            WHEN o_orderpriority IN ('3-MEDIUM','4-NOT SPECIFIED') THEN 'normal'
      |            ELSE 'low' END AS priority_class,
      |  count(*) AS cnt
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        when(col("o_orderpriority") === "1-URGENT", "critical")
          .when(col("o_orderpriority") === "2-HIGH", "high")
          .when(col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), "normal")
          .otherwise("low").as("priority_class"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("priority_class")
  }

  /** X23: regex year extraction with default-0 fallback. */
  val q18 = Q.sql("q18_year_extract",
    """SELECT CAST(coalesce(nullif(regexp_extract(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '\d{4}'), ''), '0') AS BIGINT) AS year,
      |  count(*) AS cnt
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        coalesce(
          nullif(regexp_extract(col("o_orderdate").cast("date").cast("string"), "\\d{4}", 0), lit("")),
          lit("0")).cast("bigint").as("year"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("year")
  }

  /** X20/X27: join-key normalization — lower/trim/strip-accents via the
    * custom codegen StripAccents expression (DuckDB strip_accents parity,
    * exercised with injected accented text). */
  val q19 = Q.sql("q19_normalize_key",
    """SELECT strip_accents(lower(trim(p_name || ' Çafé'))) AS norm_key, count(*) AS cnt
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .groupBy(graft.functions.Exprs.strip_accents(
        lower(trim(concat(col("p_name"), lit(" Çafé"))))).as("norm_key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("norm_key")
  }

  /** §2.7 completeness beyond the reference: INTERSECT — nations having
    * both customers and suppliers. */
  val q33 = Q.sql("q33_intersect",
    """SELECT n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier) t
      |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("n_nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("n_nationkey")))
      .orderBy("n_nationkey")
  }

  /** EXCEPT — part brands never shipped (via lineitem partkeys). */
  val q34 = Q.sql("q34_except",
    """SELECT p_brand FROM (
      |  SELECT DISTINCT p_brand FROM part
      |  EXCEPT
      |  SELECT DISTINCT p.p_brand FROM part p JOIN lineitem ON p_partkey = l_partkey) t
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
    val shipped = p.join(Tables.lineitem(s, d).select("l_partkey"),
      col("p_partkey") === col("l_partkey"))
      .select("p_brand").distinct()
    p.select("p_brand").distinct()
      .except(shipped)
      .orderBy("p_brand")
  }

  /** ROLLUP — order counts by (status, priority) hierarchy with subtotal
    * and grand-total rows; grouping-null markers recoded to 'ALL' so the
    * NULL semantics are explicit on both engines. */
  val q35 = Q.sql("q35_rollup",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS cnt
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"))
      .orderBy("status", "priority")
  }

  /** CUBE — all grouping combinations of (returnflag, linestatus). */
  val q36 = Q.sql("q36_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS cnt
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"))
      .orderBy("rf", "ls")
  }

  /** Landing-zone JSON field extraction (the S1 raw-JSON shape): pull a
    * typed value out of the props JSON document column. */
  val q37 = Q.sql("q37_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
      |  count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(get_json_object(col("props"), "$.k").cast("bigint").as("k_value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k_value")
  }

  /** Cohort retention over the events stream: users grouped by
    * first-seen day, counted on each later active day as an offset from
    * the cohort day — the classic retention-triangle query. Two
    * aggregations (first-seen per user, distinct active days) sharing
    * the user_id shuffle key, then a per-user join that AQE broadcasts
    * when the user dimension is small; integer output, no rounding. */
  val q81 = Q.sql("q81_retention_cohorts",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |  FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
      |  count(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Funnel conversion: view → click → purchase, strictly ordered per
    * user (each step's first occurrence must be AFTER the previous
    * step's). Three aggregations chained by per-user timestamps — every
    * shuffle keys on user_id, so a pre-partitioned events table pays the
    * exchange once; no window over the full event history is needed. */
  val q82 = Q.sql("q82_funnel",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM s1) AS n_view,
      |  (SELECT count(*) FROM s2) AS n_view_click,
      |  (SELECT count(*) FROM s3) AS n_view_click_purchase""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_view"))
      .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  /** The ranking-window surface in one pass: ntile, percent_rank,
    * cume_dist, lag, lead over a single (partition, order) spec — one
    * shuffle by event_type, one sort, five functions sharing the frame.
    * Ordering is (µs timestamp, event_id): the unique tie-break makes
    * every function deterministic, and the oracle orders by epoch_us to
    * mirror Spark's micros-truncated view of the nanosecond source.
    * percent_rank/cume_dist are single divisions of identical integer
    * operands on both engines — bit-equal doubles, no rounding step
    * needed; lag/lead move values untouched. */
  val q108 = Q.sql("q108_rank_windows",
    """SELECT event_id, event_type,
      |  CAST(ntile(4) OVER w AS BIGINT) AS tile4,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).cast("long").as("tile4"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy("event_id")
  }

  /** Multi-touch linear attribution — the credit-assignment join that
    * completes the q81 cohort / q82 funnel analytics block: every
    * `purchase` conversion splits one unit of credit (in micros)
    * equally across its user's last ≤3 preceding touches (click /
    * view / signup — `error` events earn nothing), with the integer
    * remainder pinned to the MOST RECENT touch so each conversion's
    * credit sums to exactly 10⁶ and the per-channel totals are exact
    * BIGINTs. Event order is the (ts, event_id) total order, so the
    * lookback ranking is deterministic through timestamp ties.
    *
    * Scale: the touch×conversion pairing joins per user (one shuffle
    * on user_id) and the rank filter caps fan-out at 3 rows per
    * conversion; channel totals are a 3-row aggregate. */
  val AttrLookback = 3

  val q214 = Q.sql("q214_linear_attribution",
    s"""WITH t AS (
       |  SELECT user_id, ts, event_id, event_type FROM events
       |  WHERE event_type IN ('click', 'view', 'signup')),
       |c AS (
       |  SELECT user_id, ts, event_id FROM events
       |  WHERE event_type = 'purchase'),
       |p AS (
       |  SELECT t.event_type, c.event_id AS conv_id,
       |    row_number() OVER (PARTITION BY c.event_id
       |                       ORDER BY t.ts DESC, t.event_id DESC) AS rk
       |  FROM c JOIN t ON t.user_id = c.user_id
       |    AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))),
       |a AS (
       |  SELECT event_type, conv_id, rk,
       |    count(*) OVER (PARTITION BY conv_id) AS k
       |  FROM p WHERE rk <= $AttrLookback),
       |cr AS (
       |  SELECT event_type,
       |    CASE WHEN rk = 1 THEN 1000000 - (k - 1) * (1000000 // k)
       |         ELSE 1000000 // k END AS credit
       |  FROM a)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
       |  CAST(sum(credit) AS BIGINT) AS credit_micro
       |FROM cr GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val t = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_id").as("t_id"), col("event_type"))
    val c = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("conv_id"))
    c.join(t, Seq("user_id"))
      .filter(col("t_ts") < col("c_ts") ||
        (col("t_ts") === col("c_ts") && col("t_id") < col("conv_id")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("conv_id").orderBy(col("t_ts").desc, col("t_id").desc)))
      .filter(col("rk") <= AttrLookback)
      .withColumn("k", count(lit(1)).over(Window.partitionBy("conv_id")))
      .withColumn("credit",
        when(col("rk") === 1,
          lit(1000000) - (col("k") - 1) * expr("1000000 div k"))
          .otherwise(expr("1000000 div k")))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_touches"),
        sum("credit").cast("long").as("credit_micro"))
      .orderBy("event_type")
  }

  /** A/B effect readout with CUPED variance reduction (Deng et al.
    * 2013) — the experiment-analysis pass run over an event log:
    * deterministic hash assignment of users to variants, per-user
    * pre-period covariate X and post-period metric Y, the pooled
    * regression adjustment θ = Cov(X,Y)/Var(X), and the adjusted means
    * Ȳᵥ − θ(X̄ᵥ − X̄) whose variance CUPED shrinks.
    *
    * Exactness: values floor-quantize to integer micros (q188's
    * device), so every Σ is a BIGINT/DECIMAL(38,0) exact sum; θ's
    * numerator n·ΣXY − ΣX·ΣY and denominator run in 38-digit decimals
    * and cross to DOUBLE through the VARCHAR bridge (operators.Q rule);
    * y_mean is a micro-sum ÷ count — a FINITE-decimal quotient, so it
    * rounds in integers ((s + 50c) div (100c), the q233 rule); y_adj's
    * exact value passes through θ (an irrational-ish IEEE quotient), a
    * decimal half boundary is unreachable, and its single float round
    * is safe — the remaining arithmetic is a fixed IEEE expression tree
    * evaluated identically by both engines. Scale: one scan to
    * per-user (X, Y) pairs, then variant-sized aggregates — the
    * standard two-level experiment rollup. */
  val q215 = Q.sql("q215_ab_cuped",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(ks) + 1),
      |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
      |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |      * 1752450205419405103 % 2305843009213693951 % 2 AS BIGINT)
      |      AS variant,
      |    CAST(sum(CASE WHEN day <= 15 THEN vq ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN day > 15 THEN vq ELSE 0 END) AS BIGINT) AS y
      |  FROM (SELECT user_id, 'ab:' || CAST(user_id AS VARCHAR) AS ks,
      |          day(CAST(ts AS DATE)) AS day,
      |          CAST(floor(value * 1000000.0) AS BIGINT) AS vq
      |        FROM events WHERE value IS NOT NULL) e
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |  FROM u),
      |th AS (
      |  SELECT n, sx, sy,
      |    CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
      |      AS theta
      |  FROM g)
      |SELECT u.variant, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST((CAST(sum(u.y) AS BIGINT) + 50 * count(*))
      |       // (100 * count(*)) AS DOUBLE) / 10000.0
      |    AS y_mean,
      |  round(CAST(sum(u.y) AS DOUBLE) / (count(*) * 1000000.0)
      |    - max(th.theta) * (CAST(sum(u.x) AS DOUBLE) / (count(*) * 1000000.0)
      |        - CAST(max(th.sx) AS DOUBLE) / (max(th.n) * 1000000.0)), 4) + 0.0
      |    AS y_adj
      |FROM u CROSS JOIN th
      |GROUP BY u.variant ORDER BY u.variant""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    val u = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"),
        dayofmonth(col("ts").cast("date")).as("day"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
      .groupBy("user_id")
      .agg(sum(when(col("day") <= 15, col("vq")).otherwise(0L)).cast("long").as("x"),
        sum(when(col("day") > 15, col("vq")).otherwise(0L)).cast("long").as("y"))
      .withColumn("variant", pmod(Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("ab:"), col("user_id").cast("string"))), Kmv.G),
        lit(2L)))
      .localCheckpoint(true) // pooled theta + per-variant rollup read it
    val g = u.agg(count(lit(1)).cast("long").as("n"),
      sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn("theta",
        expr("CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)") /
          expr("CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"))
      .select("n", "sx", "theta")
    u.crossJoin(broadcast(g))
      .groupBy("variant")
      .agg(count(lit(1)).cast("long").as("n_users"),
        (expr("CAST((sum(y) + 50 * count(1)) div (100 * count(1)) AS DOUBLE)")
          / 10000.0).as("y_mean"),
        round(sum("y").cast("double") / (count(lit(1)) * lit(1000000.0))
          - max("theta") * (sum("x").cast("double") / (count(lit(1)) * lit(1000000.0))
            - max("sx").cast("double") / (max("n") * lit(1000000.0))), 4)
          .as("y_adj"))
      .orderBy("variant")
  }

  /** Windowed sequential funnel — q82's ordered funnel upgraded with
    * the per-step conversion WINDOW real funnel analytics applies
    * (each step must follow the previous within 7 days, not just
    * eventually): per user the chain is a sequence of min-timestamp
    * selections, each conditioned on the previous step's time, so the
    * whole funnel is 3 user-key joins over per-user scalars — no
    * window function, no per-event state. Epochs compare in integer
    * microseconds (the q84 device), counts are exact, conversion
    * ratios round once. */
  val FunnelWindowUs = 604800000000L // 7 days

  val q221 = Q.sql("q221_windowed_funnel",
    s"""WITH s1 AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
       |  FROM events e JOIN s1 ON s1.user_id = e.user_id
       |  WHERE e.event_type = 'view'
       |    AND epoch_us(e.ts) > s1.t AND epoch_us(e.ts) <= s1.t + $FunnelWindowUs
       |  GROUP BY 1),
       |s3 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
       |  FROM events e JOIN s2 ON s2.user_id = e.user_id
       |  WHERE e.event_type = 'click'
       |    AND epoch_us(e.ts) > s2.t AND epoch_us(e.ts) <= s2.t + $FunnelWindowUs
       |  GROUP BY 1),
       |s4 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
       |  FROM events e JOIN s3 ON s3.user_id = e.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND epoch_us(e.ts) > s3.t AND epoch_us(e.ts) <= s3.t + $FunnelWindowUs
       |  GROUP BY 1),
       |c AS (SELECT
       |  (SELECT count(*) FROM s1) AS c1, (SELECT count(*) FROM s2) AS c2,
       |  (SELECT count(*) FROM s3) AS c3, (SELECT count(*) FROM s4) AS c4)
       |SELECT * FROM (
       |  SELECT 1 AS step, 'signup' AS step_name, CAST(c1 AS BIGINT) AS n_users,
       |    CAST(1.0 AS DOUBLE) AS conv_from_prev FROM c
       |  UNION ALL SELECT 2, 'view', CAST(c2 AS BIGINT),
       |    CAST((c2 * 20000 + c1) // (2 * c1) AS DOUBLE) / 10000.0 FROM c
       |  UNION ALL SELECT 3, 'click', CAST(c3 AS BIGINT),
       |    CAST((c3 * 20000 + c2) // (2 * c2) AS DOUBLE) / 10000.0 FROM c
       |  UNION ALL SELECT 4, 'purchase', CAST(c4 AS BIGINT),
       |    CAST((c4 * 20000 + c3) // (2 * c3) AS DOUBLE) / 10000.0 FROM c)
       |ORDER BY step""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .localCheckpoint(true) // all four stage selections read it
    def stage(prev: DataFrame, etype: String): DataFrame =
      ev.filter(col("event_type") === etype)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .filter(col("us") > col("pt") && col("us") <= col("pt") + FunnelWindowUs)
        .groupBy("user_id").agg(min("us").as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("us").as("t"))
    val s2 = stage(s1, "view")
    val s3 = stage(s2, "click")
    val s4 = stage(s3, "purchase")
    val c = s1.agg(count(lit(1)).as("c1"))
      .crossJoin(s2.agg(count(lit(1)).as("c2")))
      .crossJoin(s3.agg(count(lit(1)).as("c3")))
      .crossJoin(s4.agg(count(lit(1)).as("c4")))
    // step conversions are integer ratios — integer half-up
    // ten-thousandths (the q233 finite-decimal rule)
    def conv(num: String, den: String) =
      expr(s"CAST(($num * 20000 + $den) div (2 * $den) AS DOUBLE)") / 10000.0
    c.select(lit(1).as("step"), lit("signup").as("step_name"),
        col("c1").cast("long").as("n_users"), lit(1.0).as("conv_from_prev"))
      .union(c.select(lit(2), lit("view"), col("c2").cast("long"),
        conv("c2", "c1")))
      .union(c.select(lit(3), lit("click"), col("c3").cast("long"),
        conv("c3", "c2")))
      .union(c.select(lit(4), lit("purchase"), col("c4").cast("long"),
        conv("c4", "c3")))
      .orderBy("step")
  }

  /** Sample-ratio-mismatch guardrail — the FIRST check an experiment
    * readout runs before anyone reads q215's effect: with 50/50
    * intended assignment, the chi-square statistic over the two
    * variant counts collapses algebraically to (nA − nB)²/n, so the
    * test is one exact rational over the assignment counts, rounded
    * once and compared to the df=1, p=0.05 critical value 3.841. A
    * true SRM means the bucketing hash is biased or events were lost
    * — the readout is invalid regardless of the effect size. */
  val q234 = Q.sql("q234_ab_srm",
    """WITH a AS (
      |  SELECT CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(ks) + 1),
      |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
      |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |      * 1752450205419405103 % 2305843009213693951 % 2 AS BIGINT)
      |      AS variant
      |  FROM (SELECT DISTINCT 'ab:' || CAST(user_id AS VARCHAR) AS ks
      |        FROM events WHERE user_id IS NOT NULL)),
      |c AS (
      |  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM a)
      |SELECT na, nb,
      |  CAST(((na - nb) * (na - nb) * 20000 + (na + nb))
      |       // (2 * (na + nb)) AS DOUBLE) / 10000.0 AS chi2,
      |  CAST(((na - nb) * (na - nb) * 20000 + (na + nb))
      |       // (2 * (na + nb)) AS DOUBLE) / 10000.0 > 3.841 AS srm_detected
      |FROM c""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    Tables.events(s, d).filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct()
      .withColumn("variant", pmod(Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("ab:"), col("user_id").cast("string"))), Kmv.G),
        lit(2L)))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).cast("long").as("na"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).cast("long").as("nb"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("chi2",
        expr("CAST(((na - nb) * (na - nb) * 20000 + (na + nb))"
          + " div (2 * (na + nb)) AS DOUBLE)") / 10000.0)
      .withColumn("srm_detected", col("chi2") > 3.841)
  }

  /** Pivot → unpivot roundtrip — the melt/stack half of the reshaping
    * surface (q10/q47 pin the widening direction; this pins that the
    * long form comes BACK exactly): documents pivot to a source ×
    * language count grid (missing cells zero-filled), then `stack`
    * melts the grid to (source, lang, n_docs) and the zero cells drop
    * — the oracle is the direct GROUP BY, so the gate IS the
    * pivot∘unpivot ≡ identity contract. The language column list is a
    * bounded collect (the lookup-table pattern); the unpivot itself is
    * a pure projection — no extra shuffle beyond the pivot's
    * aggregation. */
  val q263 = Q.sql("q263_unpivot_roundtrip",
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val langs = docs.select("lang").distinct().orderBy("lang")
      .collect().map(_.getString(0)).toSeq // bounded: the language set
    val wide = docs.groupBy("source").pivot("lang", langs).count()
    // typed melt, not string-built stack(): pivot column names ARE data
    // values, so interpolating them into selectExpr would let a lang
    // containing a quote/backtick break the plan — rename positionally
    // (toDF parses nothing) and carry the value as a lit() instead
    val safe = wide.toDF("source" +: langs.indices.map(i => s"_l$i"): _*)
      .na.fill(0L, langs.indices.map(i => s"_l$i"))
    safe.select(col("source"), explode(array(langs.zipWithIndex.map {
        case (l, i) => struct(lit(l).as("lang"),
          col(s"_l$i").cast("long").as("n_docs")) }: _*)).as("kv"))
      .select(col("source"), col("kv.lang").as("lang"),
        col("kv.n_docs").as("n_docs"))
      .filter(col("n_docs") > 0)
      .orderBy("source", "lang")
  }

  /** Explicit GROUPING SETS — the third reshaping primitive next to
    * q35's ROLLUP and q36's CUBE: a hand-picked grain list ((source,
    * lang), (source), (lang), ()) in ONE aggregation pass, with the
    * grain id composed EXPLICITLY as 2·grouping(source)+grouping(lang)
    * — the portable form; engines' built-in grouping_id bit orders are
    * not part of any standard. Subtotal NULLs recode to 'ALL' so the
    * NULL semantics stay explicit. This is the multi-grain metrics
    * pass that replaces N separate GROUP BYs with one scan at 100 TB. */
  val q264 = Q.sql("q264_grouping_sets",
    """SELECT coalesce(source, 'ALL') AS source,
      |  coalesce(lang, 'ALL') AS lang,
      |  CAST(2 * grouping(source) + grouping(lang) AS BIGINT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |    AS n_tokens
      |FROM documents
      |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
      |ORDER BY gid, source, lang""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val v = Tables.documents(s, d)
      .select(col("source"), col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("nt"))
    v.createOrReplaceTempView("q264_docs")
    s.sql(
      """SELECT coalesce(source, 'ALL') AS source,
        |  coalesce(lang, 'ALL') AS lang,
        |  CAST(2 * grouping(source) + grouping(lang) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM q264_docs
        |GROUP BY source, lang GROUPING SETS ((source, lang), (source),
        |  (lang), ())
        |ORDER BY gid, source, lang""".stripMargin)
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q33, q34, q35, q36, q37,
    q81, q82, q108, q214, q215, q221, q234, q263, q264)
}
