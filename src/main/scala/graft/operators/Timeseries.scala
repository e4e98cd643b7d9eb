package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sliding-window aggregates and batch sessionization over event
  * streams — the batch complements of the streaming window/session
  * gates (q50/q51/q63).
  *
  * The sliding aggregate deliberately does NOT use a single
  * `Window.partitionBy(key)`: with few hot keys (events has a handful
  * of event types at every SF) one task would sort an entire key's
  * history — the classic window-skew collapse at 100 TB. Instead the
  * timeline is cut into `chunkUs` slabs, each row is owned by its slab,
  * and the last `windowUs` of every slab is REPLICATED into the next
  * slab so each owner row still sees its full look-back frame. The
  * per-(key, slab) windows then parallelize across the cluster and the
  * result is row-identical to the naive single-partition window (pinned
  * by EngineSpec's chunked≡naive test). Replication overhead is
  * windowUs/chunkUs per row — bounded and chosen by the caller.
  *
  * Sessionization needs no such treatment: it partitions by user, a
  * key whose cardinality grows with the data.
  */
object Timeseries {

  /** Per-row look-back sum/count of `valCol` over the half-open time
    * frame `[ts − windowUs, ts]` within `key`, computed chunk-parallel.
    * Output keeps every input column plus `wsum` (exact decimal sum,
    * returned as double) and `wn`. Requires `chunkUs >= windowUs` so a
    * single boundary copy suffices. */
  def slidingSumCount(df: DataFrame, key: String, tsUs: Column,
      valCol: String, windowUs: Long, chunkUs: Long): DataFrame = {
    require(windowUs > 0 && chunkUs >= windowUs,
      s"need chunkUs ($chunkUs) >= windowUs ($windowUs) > 0")
    val base = df.withColumn("__us", tsUs.cast("long"))
      // exact floor for any sign (Spark's div truncates toward zero)
      .withColumn("__chunk",
        expr(s"(__us - pmod(__us, ${chunkUs}L)) div ${chunkUs}L"))
    val owners = base.withColumn("__owner", lit(true))
    // tail of each slab, re-homed one slab later purely as frame context
    val copies = base
      .filter(pmod(col("__us"), lit(chunkUs)) >= lit(chunkUs - windowUs))
      .withColumn("__chunk", col("__chunk") + 1)
      .withColumn("__owner", lit(false))
    val w = Window.partitionBy(col(key), col("__chunk"))
      .orderBy(col("__us")).rangeBetween(-windowUs, 0)
    owners.unionByName(copies)
      .withColumn("wsum",
        sum(col(valCol).cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("wn", count(col(valCol)).over(w))
      .filter(col("__owner"))
      .drop("__us", "__chunk", "__owner")
  }

  /** Gap-based sessions: a new session starts when the user's
    * inter-event gap exceeds `gapUs`. Returns one row per session with
    * its ordinal (1-based per user), event count, and bounds. */
  def sessionize(ev: DataFrame, gapUs: Long): DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("__us"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("__us"))
      .withColumn("__brk",
        when(lag(col("__us"), 1).over(order).isNull ||
          col("__us") - lag(col("__us"), 1).over(order) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__brk")).over(run))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"), max(col("__us")).as("end_us"))
  }

  /** Trailing-window z-score anomaly detection: each event is scored
    * against the mean/σ of its user's previous `lookback` events. The
    * windowed sums run over exact DECIMAL(18,6) values, so the double
    * arithmetic downstream starts from bit-identical inputs in any
    * engine — the z-score and the flag are then deterministic because
    * both sides evaluate the same IEEE expression tree. Partitioned by
    * user (cardinality grows with the data), rows-frame windows — the
    * skew-safe shape; no driver state.
    */
  def rollingZScore(ev: DataFrame, lookback: Int = 20, minPrev: Int = 5)
      : DataFrame = {
    val order = Window.partitionBy("user_id")
      .orderBy(col("__us"), col("event_id"))
    val w = order.rowsBetween(-lookback, -1)
    ev.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("__us"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("n_prev", count(col("v")).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("sq", sum(col("v") * col("v")).over(w))
      .filter(col("n_prev") >= minPrev)
      .withColumn("x", col("v").cast("double"))
      .withColumn("mean_prev", col("s").cast("double") / col("n_prev"))
      .withColumn("var0",
        col("sq").cast("double") / col("n_prev") -
          (col("s").cast("double") / col("n_prev")) *
          (col("s").cast("double") / col("n_prev")))
      .withColumn("z",
        round(when(col("var0") > 1e-12,
          (col("x") - col("mean_prev")) / sqrt(col("var0"))), 3))
      // reported mean is rounded in INTEGER micro-units — round(double, 4)
      // can land on a .00005 boundary where engines' double-rounding
      // disagrees by one ulp (s/n has small denominators). Half-up via
      // (2a+b) div 2b; trunc≡floor here because sums are non-negative
      // (guarded below), so Spark `div` and any floor-division agree.
      .withColumn("__s_micro", (col("s") * lit(1000000)).cast("long"))
      .withColumn("__mean4",
        when(col("__s_micro") >= 0,
          expr("(2 * __s_micro + 100 * n_prev) div (200 * n_prev)"))
          .otherwise(-expr("(-2 * __s_micro + 100 * n_prev) div (200 * n_prev)")))
      .select(col("event_id"), col("user_id"), col("n_prev"),
        (col("__mean4") / lit(10000.0)).as("mean_prev"), col("z"),
        coalesce(abs(col("z")) > 3, lit(false)).as("anomaly"))
  }

  /** Rolling z-score gate: 20-event look-back per user, scored from the
    * 5th prior event on. The oracle replays the identical decimal-sums →
    * double expression tree. */
  val q121 = Q.sql("q121_rolling_zscore",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, us, v,
      |    count(v) OVER win AS n_prev,
      |    sum(v) OVER win AS s,
      |    sum(v * v) OVER win AS sq
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |c AS (
      |  SELECT event_id, user_id, n_prev,
      |    CAST(v AS DOUBLE) AS x,
      |    CAST(s AS DOUBLE) / n_prev AS mean_prev,
      |    CAST(s * 1000000 AS BIGINT) AS sm,
      |    CAST(sq AS DOUBLE) / n_prev -
      |      (CAST(s AS DOUBLE) / n_prev) * (CAST(s AS DOUBLE) / n_prev) AS var0
      |  FROM w WHERE n_prev >= 5),
      |z AS (
      |  SELECT event_id, user_id, n_prev,
      |    (CASE WHEN sm >= 0 THEN (2 * sm + 100 * n_prev) // (200 * n_prev)
      |          ELSE -((-2 * sm + 100 * n_prev) // (200 * n_prev)) END)
      |      / 10000.0 AS mean_i,
      |    round(CASE WHEN var0 > 1e-12 THEN (x - mean_prev) / sqrt(var0) END,
      |          3) + 0.0 AS z
      |  FROM c)
      |SELECT event_id, user_id, n_prev, mean_i AS mean_prev, z,
      |  coalesce(abs(z) > 3, false) AS anomaly
      |FROM z ORDER BY event_id""".stripMargin) { (s, d) =>
    rollingZScore(Tables.events(s, d), lookback = 20, minPrev = 5)
      .orderBy("event_id")
  }

  /** Sliding-aggregate gate: 1-hour look-back sum/count per event type,
    * chunked into 4-hour slabs. The oracle is the PLAIN range-frame
    * window — chunking must be invisible in the result. */
  val q115 = Q.sql("q115_sliding_window",
    """SELECT event_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS wsum,
      |  count(value) OVER w AS wn
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    slidingSumCount(
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("ts"), col("value")),
      key = "event_type", tsUs = expr("unix_micros(ts)"), valCol = "value",
      windowUs = 3600000000L, chunkUs = 4 * 3600000000L)
      .select(col("event_id"), col("wsum"), col("wn"))
      .orderBy("event_id")
  }

  /** Sessionization gate: 30-minute gap sessions over the full event
    * stream, replayed by the oracle as lag + running break-sum. */
  val q116 = Q.sql("q116_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id, us,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events,
      |  min(us) AS start_us, max(us) AS end_us
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    sessionize(Tables.events(s, d), gapUs = 1800000000L)
      .orderBy("user_id", "sid")
  }

  /** SCD2 history build (slowly-changing dimension, type 2): collapse a
    * keyed event timeline into VERSION rows — one row per run of equal
    * values, with [valid_from, valid_to) bounds and a current flag. The
    * warehouse shape behind "what was this entity's state at time t":
    * change detection is a lag() inequality, version ids a running sum
    * of change flags (the q116 sessionize machinery pointed at value
    * changes instead of time gaps), bounds a lead() over the version
    * starts. One hash exchange on the key serves all three windows and
    * the rollup; `valid_to_us = -1` marks the open (current) version —
    * a sentinel, not NULL, so the driver's hash compare never sees
    * engine-specific null ordering. */
  def scd2(events: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol)
      .orderBy(col("us"), col("event_id"))
    val e = events
      .select(col(keyCol), col("event_id"), col(valueCol).as("v"),
        unix_micros(col("ts")).as("us"))
      .withColumn("brk",
        when(lag(col("v"), 1).over(byKey).isNull ||
          lag(col("v"), 1).over(byKey) =!= col("v"), 1L).otherwise(0L))
      .withColumn("ver", sum(col("brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = e.groupBy(col(keyCol), col("ver"))
      .agg(min(col("v")).as("value"), min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val byVer = Window.partitionBy(keyCol).orderBy(col("ver"))
    versions
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(byVer), lit(-1L)))
      .withColumn("is_current", col("valid_to_us") === -1L)
      .select(col(keyCol), col("ver").cast("long").as("ver"), col("value"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"),
        col("is_current"))
  }

  /** SCD2 gate over the per-user event_type timeline. */
  val q137 = Q.sql("q137_scd2_history",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type AS v, epoch_us(ts) AS us,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id, v, us,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS ver
      |  FROM e),
      |vr AS (
      |  SELECT user_id, ver, min(v) AS value, min(us) AS valid_from_us,
      |    count(*) AS n_events
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, CAST(ver AS BIGINT) AS ver, value, valid_from_us,
      |  coalesce(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver),
      |           -1) AS valid_to_us,
      |  n_events,
      |  coalesce(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver),
      |           -1) = -1 AS is_current
      |FROM vr ORDER BY user_id, ver""".stripMargin) { (s, d) =>
    scd2(Tables.events(s, d), "user_id", "event_type")
      .orderBy("user_id", "ver")
  }

  /** Exponentially-decayed counters with a one-day half-life, EXACT:
    * an event d days before the reference date (the stream's max day)
    * contributes 2^−d — a dyadic rational — held in Q40 fixed point, so
    * the contribution is the INTEGER `1 << (40 − d)` (0 beyond d = 40,
    * where the weight is below one Q40 ulp anyway). The decayed count
    * is then an exact BIGINT sum: order-independent, overflow-safe
    * (count·2^40 needs count < 2^23 per group — raise the ulp floor to
    * shrink Q for bigger groups), and both engines replay it
    * bit-for-bit — no pow(), no float accumulation.
    *
    * This is the recency-weighting a curation pipeline uses for
    * trending-source stats, and it maintains additively like A1/q140:
    * decayed(T+1 day) = (decayed(T) >> 1) + today's raw count · 2^40 —
    * one shift and one add per refresh, no rescan (pinned in
    * EngineSpec; exact while no group holds ≥2 events AT the 40-day
    * ulp floor, whose unit weights can carry into the shift — they are
    * dropped a day later either way). Scale: stateless map + one
    * partial-aggregated groupBy; the reference date is a 1-row
    * broadcast. */
  def decayedCounts(events: DataFrame): DataFrame = {
    val ref = events.agg(max(to_date(col("ts"))).as("ref_day"))
    events.select(col("event_type"), to_date(col("ts")).as("day"))
      .crossJoin(broadcast(ref))
      .withColumn("d", datediff(col("ref_day"), col("day")))
      .withColumn("w",
        when(col("d") <= 40, expr("shiftleft(1L, 40 - d)"))
          .otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("w").cast("long").as("decayed_q40"))
  }

  /** Shared by q159 (batch) and q171 (streaming maintenance of the
    * same registers). */
  val DecayOracle: String =
    """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
      |w AS (
      |  SELECT event_type,
      |    date_diff('day', CAST(ts AS DATE), ref.ref_day) AS d
      |  FROM events, ref)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN d <= 40 THEN 1::BIGINT << (40 - d) ELSE 0 END) AS BIGINT) AS decayed_q40
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  val q159 = Q.sql("q159_decayed_counts", DecayOracle) { (s, d) =>
    decayedCounts(Tables.events(s, d)).orderBy("event_type")
  }

  /** Snapshot diff — the audit companion to q93's upsert and q137's
    * SCD2: given two versions of a keyed table, classify every key as
    * added / removed / changed / unchanged by full outer join on the
    * key with a content digest compare. The v2 fixture derives from v1
    * by deterministic rules (drop ≡0 mod 17, rewrite ≡0 mod 13, insert
    * a shifted copy for ≡0 mod 19) so both engines build the identical
    * pair of versions; the gate emits the non-unchanged rows plus their
    * status. One shuffle on the key, digest computed in the scan —
    * at 100 TB this is the standard "what did this delivery change"
    * pass, and the md5 compare keeps the join payload at 32 bytes/row
    * regardless of document size. */
  val q176 = Q.sql("q176_snapshot_diff",
    """WITH v1 AS (SELECT doc_id, md5(text) AS dig FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS dig
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, md5(text || ' new') AS dig
      |  FROM documents WHERE doc_id % 19 = 0)
      |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |  CASE WHEN v1.doc_id IS NULL THEN 'added'
      |       WHEN v2.doc_id IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status
      |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      |WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.dig <> v2.dig
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val v1 = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("dig"))
    val v2 = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).cast("binary")).as("dig"))
      .unionByName(docs.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          md5(concat(col("text"), lit(" new")).cast("binary")).as("dig")))
    v1.select(col("doc_id").as("k1"), col("dig").as("d1"))
      .join(v2.select(col("doc_id").as("k2"), col("dig").as("d2")),
        col("k1") === col("k2"), "full_outer")
      .filter(col("k1").isNull || col("k2").isNull || col("d1") =!= col("d2"))
      .select(coalesce(col("k1"), col("k2")).as("doc_id"),
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .otherwise("changed").as("status"))
      .orderBy("doc_id")
  }

  /** Incremental metric maintenance under the q176 snapshot diff —
    * q140's additive-maintenance discipline applied to a delivery: the
    * engine NEVER scans v2; it takes the v1 aggregate and applies the
    * diff's deltas (removed rows subtract, changed rows contribute
    * their token delta, added rows add), while the ORACLE aggregates
    * the rebuilt v2 from scratch — so the gate IS the
    * maintained-equals-recomputed equality, per (lang, source) cell.
    * At 100 TB this is the difference between touching the delivery
    * (∝ |diff|) and re-scanning the corpus; counts stay exact
    * integers, so maintenance is associative and order-free. */
  val q185 = Q.sql("q185_incremental_metrics",
    """WITH v2 AS (
      |  SELECT doc_id, lang, source,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, lang, source, text || ' new'
      |  FROM documents WHERE doc_id % 19 = 0)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |    AS n_tokens
      |FROM v2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val v1 = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("nt"))
      .localCheckpoint(true) // base agg + three delta scans share it
    val base = v1.groupBy("lang", "source")
      .agg(count(lit(1)).as("d_docs"), sum("nt").as("d_tokens"))
    val removed = v1.filter(col("doc_id") % 17 === 0)
      .groupBy("lang", "source")
      .agg((-count(lit(1))).as("d_docs"), (-sum("nt")).as("d_tokens"))
    // ' v2' appends exactly one token to a surviving changed row
    val changed = v1.filter(col("doc_id") % 13 === 0 && col("doc_id") % 17 =!= 0)
      .groupBy("lang", "source")
      .agg(lit(0L).as("d_docs"), count(lit(1)).as("d_tokens"))
    val added = v1.filter(col("doc_id") % 19 === 0)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("d_docs"), (sum("nt") + count(lit(1))).as("d_tokens"))
    base.unionByName(removed).unionByName(changed).unionByName(added)
      .groupBy("lang", "source")
      .agg(sum("d_docs").cast("long").as("n_docs"),
        sum("d_tokens").cast("long").as("n_tokens"))
      .filter(col("n_docs") > 0)
      .orderBy("lang", "source")
  }

  /** Token-frequency drift between snapshot versions — the monitoring
    * read of the q176 delivery: which terms' corpus frequencies moved
    * most when v2 landed, as exact integer deltas ranked by magnitude
    * (the report a data-drift monitor publishes before anyone retrains
    * on the new snapshot). The engine derives BOTH versions' counts
    * from one v1 scan plus the delta rules (the q185 discipline —
    * never materialize v2); at 100 TB the same two count tables come
    * from the maintained metric store. Top-50 by (|Δ| DESC, token). */
  val q195 = Q.sql("q195_token_drift",
    """WITH v2 AS (
      |  SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT text || ' new' FROM documents WHERE doc_id % 19 = 0),
      |c1 AS (
      |  SELECT tok, count(*) AS n FROM (
      |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |    FROM documents) GROUP BY 1),
      |c2 AS (
      |  SELECT tok, count(*) AS n FROM (
      |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |    FROM v2) GROUP BY 1)
      |SELECT coalesce(c1.tok, c2.tok) AS tok,
      |  CAST(coalesce(c1.n, 0) AS BIGINT) AS n_v1,
      |  CAST(coalesce(c2.n, 0) AS BIGINT) AS n_v2,
      |  CAST(coalesce(c2.n, 0) - coalesce(c1.n, 0) AS BIGINT) AS delta
      |FROM c1 FULL OUTER JOIN c2 ON c1.tok = c2.tok
      |ORDER BY abs(coalesce(c2.n, 0) - coalesce(c1.n, 0)) DESC, tok
      |LIMIT 50""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val t1 = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .localCheckpoint(true) // v1 counts + all three delta terms reuse it
    val c1 = t1.groupBy("tok").agg(count(lit(1)).as("n_v1"))
    // v2 counts = v1 + deltas, never a v2 scan: removed docs subtract
    // their tokens; changed docs add one 'v2'; added docs re-add their
    // tokens plus one 'new'
    val removed = t1.filter(col("doc_id") % 17 === 0)
      .groupBy("tok").agg((-count(lit(1))).as("d"))
    val changedTok = Tables.documents(s, d)
      .filter(col("doc_id") % 13 === 0 && col("doc_id") % 17 =!= 0)
      .agg(count(lit(1)).as("d")).select(lit("v2").as("tok"), col("d"))
    val addedBase = t1.join(
        Tables.documents(s, d).filter(col("doc_id") % 19 === 0).select("doc_id"),
        "doc_id")
      .groupBy("tok").agg(count(lit(1)).cast("long").as("d"))
    val addedNew = Tables.documents(s, d).filter(col("doc_id") % 19 === 0)
      .agg(count(lit(1)).as("d")).select(lit("new").as("tok"), col("d"))
    val delta = removed.unionByName(changedTok).unionByName(addedBase)
      .unionByName(addedNew)
      .groupBy("tok").agg(sum("d").as("delta"))
    c1.join(delta, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        (coalesce(col("n_v1"), lit(0L)) + coalesce(col("delta"), lit(0L)))
          .as("n_v2"),
        coalesce(col("delta"), lit(0L)).as("delta"))
      .filter(col("n_v1") =!= 0 || col("n_v2") =!= 0)
      .orderBy(abs(col("delta")).desc, col("tok"))
      .limit(50)
  }

  /** Churn labeling + behavioral features — the label-generation pass
    * a retention model trains on: per user the activity features
    * (event count, distinct active days, exact mean value) and the
    * churn label — no event in the last [[ChurnDays]] days of the
    * observed window, with "now" anchored to the corpus max day so
    * the gate is a pure function of the data (the production form
    * injects the clock, X16's convention). Counts exact; the mean is
    * rounded ENTIRELY in integers — values quantize to micros and the
    * half-up ten-thousandth is (s + 50·c) div (100·c) — because the
    * exact mean can land on a .00005 boundary where Spark's round
    * (shortest-repr decimal via BigDecimal.valueOf) and DuckDB's
    * (the binary double) disagree: the 5× sweep caught user 939 at
    * exactly 55.68375. One groupBy(user). */
  val ChurnDays = 7

  val q233 = Q.sql("q233_churn_labels",
    s"""WITH mx AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
       |u AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
       |    max(CAST(ts AS DATE)) AS last_day,
       |    CAST((CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
       |          + 50 * count(value)) // (100 * count(value)) AS DOUBLE) / 10000.0
       |      AS mean_value
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1)
       |SELECT user_id, n_events, active_days, mean_value,
       |  last_day < ref - $ChurnDays AS churned
       |FROM u CROSS JOIN mx ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .localCheckpoint(true) // reference day + features read it
    val mx = ev.agg(max(col("ts").cast("date")).as("ref"))
    ev.filter(col("value").isNotNull).groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("ts").cast("date")).cast("long").as("active_days"),
        max(col("ts").cast("date")).as("last_day"),
        sum(floor(col("value") * 1000000.0).cast("long")).cast("long").as("sq"),
        count(col("value")).as("cv"))
      .withColumn("mean_value",
        expr("CAST((sq + 50 * cv) div (100 * cv) AS DOUBLE)") / lit(10000.0))
      .drop("sq", "cv")
      .crossJoin(broadcast(mx))
      .withColumn("churned", col("last_day") < date_sub(col("ref"), ChurnDays))
      .select("user_id", "n_events", "active_days", "mean_value", "churned")
      .orderBy("user_id")
  }

  /** Sweep-line concurrency — max simultaneous sessions per day, the
    * capacity number an ops team sizes connection pools from: each
    * (user, day) session spans [first event, last event], and the
    * classic sweep materializes ±1 boundary events, orders them by
    * (time, +1 before −1, user) — a session ending exactly when
    * another starts counts as overlapping, pinned by the tie order —
    * and takes the max running sum per day. Integer micros end to
    * end; the running sum partitions by day, so the shuffle is one
    * day-key exchange and each partition's window is
    * sessions-per-day-sized. */
  val q242 = Q.sql("q242_session_concurrency",
    """WITH s AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
      |  FROM events WHERE user_id IS NOT NULL
      |  GROUP BY 1, 2),
      |b AS (
      |  SELECT day, t0 AS t, 1 AS delta, user_id FROM s
      |  UNION ALL
      |  SELECT day, t1 AS t, -1 AS delta, user_id FROM s),
      |r AS (
      |  SELECT day,
      |    sum(delta) OVER (PARTITION BY day
      |      ORDER BY t, delta DESC, user_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      |  FROM b)
      |SELECT s.day, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(max(r.mx) AS BIGINT) AS max_concurrent
      |FROM s JOIN (SELECT day, max(live) AS mx FROM r GROUP BY 1) r USING (day)
      |GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val sess = Tables.events(s, d).filter(col("user_id").isNotNull)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"))
      .localCheckpoint(true) // boundaries + the per-day session count read it
    val b = sess.select(col("day"), col("t0").as("t"), lit(1).as("delta"), col("user_id"))
      .unionByName(sess.select(col("day"), col("t1").as("t"),
        lit(-1).as("delta"), col("user_id")))
    val mx = b.withColumn("live", sum("delta").over(
        Window.partitionBy("day").orderBy(col("t"), col("delta").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("day").agg(max("live").as("mx"))
    sess.groupBy("day").agg(count(lit(1)).cast("long").as("n_sessions"))
      .join(mx, "day")
      .select(col("day"), col("n_sessions"), col("mx").cast("long").as("max_concurrent"))
      .orderBy("day")
  }

  /** Weekday seasonality — the day-of-week profile with an exact
    * chi-square uniformity test (df = 6): per event type, Σ(oᵢ−n/7)²
    * / (n/7) collapses to Σ(7oᵢ−n)² / (7n), ONE integer rational
    * (milli-rounded half-up), flagged against the p = 0.05 critical
    * value 12.592. The sum runs over ALL 7 weekday cells — a weekday
    * with zero events contributes (7·0−n)² = n², and dropping it
    * would understate χ² against the df = 6 critical value; instead
    * of densifying with a cross join, the missing-cell mass folds in
    * as (7 − observed_cells)·n². The seasonal/flat verdict drives
    * whether a forecasting or sampling job needs a weekday term. One
    * aggregate to the 7×types histogram. */
  val q243 = Q.sql("q243_weekday_profile",
    """WITH d AS (
      |  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n FROM d GROUP BY 1),
      |x AS (
      |  SELECT d.event_type,
      |    CAST(sum((7 * d.o - n.n) * (7 * d.o - n.n))
      |         + (7 - count(*)) * max(n.n) * max(n.n) AS BIGINT) AS ss,
      |    max(n.n) AS n
      |  FROM d JOIN n USING (event_type) GROUP BY 1)
      |SELECT event_type, n AS n_events,
      |  CAST((ss * 2000 + 7 * n) // (14 * n) AS DOUBLE) / 1000.0 AS chi2,
      |  CAST((ss * 2000 + 7 * n) // (14 * n) AS DOUBLE) / 1000.0 > 12.592
      |    AS seasonal
      |FROM x ORDER BY event_type""".stripMargin) { (s, d) =>
    val dd = Tables.events(s, d)
      .groupBy(col("event_type"), dayofweek(col("ts").cast("date")).as("dow"))
      .agg(count(lit(1)).cast("long").as("o"))
    val n = dd.groupBy("event_type").agg(sum("o").cast("long").as("n"))
    dd.join(broadcast(n), "event_type")
      .groupBy("event_type")
      .agg((sum(expr("(7 * o - n) * (7 * o - n)"))
          + (lit(7) - count(lit(1))) * max("n") * max("n")).cast("long").as("ss"),
        max("n").as("n"))
      .select(col("event_type"), col("n").as("n_events"),
        (expr("CAST((ss * 2000 + 7 * n) div (14 * n) AS DOUBLE)") / 1000.0).as("chi2"))
      .withColumn("seasonal", col("chi2") > 12.592)
      .orderBy("event_type")
  }

  /** Weighted-moving-average forecast + one-step backtest — the
    * capacity-forecast pass an ingest scheduler runs over its daily
    * volume series: per event type the day axis is DENSIFIED to the
    * full corpus range (a zero-event day is a real observation — the
    * q243 lesson), the forecast for day t is the integer WMA
    * (4·xₜ₋₁ + 2·xₜ₋₂ + xₜ₋₃) div 7, and the backtest reports MAE
    * (integer milli-rounded — the q233 rule), signed bias, and the
    * next-day forecast the scheduler would act on. Scale: the series
    * table is (types × days) — time-axis-sized, not event-sized — so
    * everything after the one counting scan is free; the per-type
    * window sorts a bounded day range. */
  val q247 = Q.sql("q247_wma_forecast",
    """WITH bounds AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |actual AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT t.event_type, dy.day, coalesce(a.x, 0) AS x
      |  FROM types t CROSS JOIN days dy
      |  LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = dy.day),
      |w AS (
      |  SELECT event_type, day, x,
      |    lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
      |    lag(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2,
      |    lag(x, 3) OVER (PARTITION BY event_type ORDER BY day) AS x3
      |  FROM g)
      |SELECT event_type,
      |  CAST(count(CASE WHEN x3 IS NOT NULL THEN 1 END) AS BIGINT)
      |    AS n_scored,
      |  CAST(sum(CASE WHEN x3 IS NOT NULL
      |    THEN abs(x - (4 * x1 + 2 * x2 + x3) // 7) END) AS BIGINT)
      |    AS abs_err,
      |  CAST((CAST(sum(CASE WHEN x3 IS NOT NULL
      |          THEN abs(x - (4 * x1 + 2 * x2 + x3) // 7) END) AS BIGINT)
      |        * 2000 + count(CASE WHEN x3 IS NOT NULL THEN 1 END))
      |       // nullif(2 * count(CASE WHEN x3 IS NOT NULL THEN 1 END), 0)
      |       AS DOUBLE)
      |    / 1000.0 AS mae,
      |  CAST(sum(CASE WHEN x3 IS NOT NULL
      |    THEN (4 * x1 + 2 * x2 + x3) // 7 - x END) AS BIGINT) AS bias,
      |  CAST(max(CASE WHEN day = b.d1
      |    THEN (4 * x + 2 * x1 + x2) // 7 END) AS BIGINT) AS forecast_next
      |FROM w CROSS JOIN bounds b
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .localCheckpoint(true) // bounds + types + the counting scan read it
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val days = bounds.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val types = ev.select("event_type").distinct()
    val actual = ev.groupBy("event_type", "day")
      .agg(count(lit(1)).cast("long").as("x"))
    val g = types.crossJoin(days)
      .join(actual, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("x"))
    val wnd = Window.partitionBy("event_type").orderBy("day")
    val fc = "(4 * x1 + 2 * x2 + x3) div 7"
    g.withColumn("x1", lag("x", 1).over(wnd))
      .withColumn("x2", lag("x", 2).over(wnd))
      .withColumn("x3", lag("x", 3).over(wnd))
      .crossJoin(broadcast(bounds))
      .groupBy("event_type")
      .agg(
        count(when(col("x3").isNotNull, 1)).cast("long").as("n_scored"),
        sum(when(col("x3").isNotNull, abs(col("x") - expr(fc))))
          .cast("long").as("abs_err"),
        // nullif: a corpus spanning < 4 days scores zero forecasts —
        // mae must be NULL, not an ANSI div-by-zero error (q266 rule)
        (expr(s"CAST((sum(CASE WHEN x3 IS NOT NULL THEN abs(x - ($fc)) END)" +
          " * 2000 + count(CASE WHEN x3 IS NOT NULL THEN 1 END))" +
          " div nullif(2 * count(CASE WHEN x3 IS NOT NULL THEN 1 END), 0)" +
          " AS DOUBLE)") / 1000.0).as("mae"),
        sum(when(col("x3").isNotNull, expr(fc) - col("x")))
          .cast("long").as("bias"),
        max(when(col("day") === col("d1"),
          expr("(4 * x + 2 * x1 + x2) div 7"))).cast("long").as("forecast_next"))
      .orderBy("event_type")
  }

  /** Kaplan–Meier survival over user lifetimes — the estimator a
    * retention analysis publishes when lifetimes are CENSORED (q233's
    * churn label says who left; this says how long users survive,
    * counting the still-active correctly instead of dropping them):
    * lifetime = days between first and last event, an observed death =
    * q233's churn rule (quiet for the last [[ChurnDays]] days), and
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over the at-risk counts. Exactness:
    * every count is an integer; each factor is one IEEE division and
    * the product folds in PINNED ascending-t order on both engines
    * (window-ordered list → left fold, the q163 device), so the
    * survival curve is bit-identical WITHOUT rounding. Scale: one
    * groupBy(user), then everything runs on the duration histogram —
    * time-axis-sized, not user-sized. */
  val q256 = Q.sql("q256_kaplan_meier",
    s"""WITH mx AS (SELECT max(CAST(ts AS DATE)) AS ref FROM events),
       |u AS (
       |  SELECT user_id,
       |    date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
       |      AS t,
       |    max(CAST(ts AS DATE)) AS last_day
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
       |lab AS (
       |  SELECT u.t, u.last_day < mx.ref - ${Timeseries.ChurnDays} AS died
       |  FROM u CROSS JOIN mx),
       |h AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS n_t,
       |    CAST(sum(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d_t
       |  FROM lab GROUP BY 1),
       |r AS (
       |  SELECT t, d_t, n_t,
       |    CAST(sum(n_t) OVER (ORDER BY t DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS n_risk
       |  FROM h),
       |f AS (
       |  SELECT t, n_risk, d_t, n_t - d_t AS n_censored,
       |    1.0 - CAST(d_t AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
       |  FROM r)
       |SELECT t AS duration_days, n_risk, d_t AS d_churned, n_censored,
       |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |    list(factor) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |    (a, x) -> a * x) AS surv
       |FROM f ORDER BY duration_days""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      .localCheckpoint(true) // ref day + lifetimes read it
    val mx = ev.agg(max(col("ts").cast("date")).as("ref"))
    val h = ev.groupBy("user_id")
      .agg(datediff(max(col("ts").cast("date")), min(col("ts").cast("date")))
        .cast("long").as("t"),
        max(col("ts").cast("date")).as("last_day"))
      .crossJoin(broadcast(mx))
      .withColumn("died", col("last_day") < date_sub(col("ref"), ChurnDays))
      .groupBy("t")
      .agg(count(lit(1)).cast("long").as("n_t"),
        sum(when(col("died"), 1L).otherwise(0L)).cast("long").as("d_t"))
    h.withColumn("n_risk", sum("n_t").over(
        Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("factor",
        lit(1.0) - col("d_t").cast("double") / col("n_risk").cast("double"))
      .withColumn("surv",
        aggregate(collect_list("factor").over(
          Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(1.0), (a, x) => a * x))
      .select(col("t").as("duration_days"), col("n_risk"),
        col("d_t").as("d_churned"), (col("n_t") - col("d_t")).as("n_censored"),
        col("surv"))
      .orderBy("duration_days")
  }

  /** Mean-shift changepoint detection (one level of binary
    * segmentation) — the volume-monitoring alarm that catches "the
    * crawler broke on the 14th": per event type, over the zero-filled
    * daily series (q247's densification), pick the split that
    * maximizes the cross-multiplied mean gap |cumᵢ·(T−i) − restᵢ·i|
    * (exact integers — no division until the readout), and flag it
    * when the gap exceeds 10% of the overall mean
    * (10·T·score > total·i·(T−i), still all-integer). Means read out
    * milli-rounded half-up. One window pass over the time-axis-sized
    * series table. */
  val q257 = Q.sql("q257_changepoint",
    """WITH bounds AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |actual AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT t.event_type, dy.day, coalesce(a.x, 0) AS x
      |  FROM types t CROSS JOIN days dy
      |  LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = dy.day),
      |c AS (
      |  SELECT event_type, day,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |      AS BIGINT) AS i,
      |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tn
      |  FROM g),
      |sc AS (
      |  SELECT *, abs(cum * (tn - i) - (tot - cum) * i) AS score
      |  FROM c WHERE i < tn),
      |best AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type
      |      ORDER BY score DESC, day) AS rk
      |    FROM sc) t
      |  WHERE rk = 1)
      |SELECT event_type, day AS split_day, i AS n_left, tn - i AS n_right,
      |  CAST((cum * 2000 + i) // (2 * i) AS DOUBLE) / 1000.0 AS mean_left,
      |  CAST(((tot - cum) * 2000 + (tn - i)) // (2 * (tn - i)) AS DOUBLE)
      |    / 1000.0 AS mean_right,
      |  CAST(score AS BIGINT) AS score,
      |  10 * score * tn > tot * i * (tn - i) AS detected
      |FROM best ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .localCheckpoint(true) // bounds + types + the counting scan read it
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val days = bounds.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val g = ev.select("event_type").distinct()
      .crossJoin(days)
      .join(ev.groupBy("event_type", "day")
        .agg(count(lit(1)).cast("long").as("x")),
        Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("x"))
    val byType = Window.partitionBy("event_type")
    val c = g
      .withColumn("cum", sum("x").over(byType.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("i", row_number().over(byType.orderBy("day")).cast("long"))
      .withColumn("tot", sum("x").over(byType).cast("long"))
      .withColumn("tn", count(lit(1)).over(byType).cast("long"))
      .filter(col("i") < col("tn"))
      .withColumn("score",
        abs(col("cum") * (col("tn") - col("i"))
          - (col("tot") - col("cum")) * col("i")))
    c.withColumn("rk", row_number().over(
        byType.orderBy(col("score").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("i").as("n_left"), (col("tn") - col("i")).as("n_right"),
        (expr("CAST((cum * 2000 + i) div (2 * i) AS DOUBLE)") / 1000.0)
          .as("mean_left"),
        (expr("CAST(((tot - cum) * 2000 + (tn - i)) div (2 * (tn - i))"
          + " AS DOUBLE)") / 1000.0).as("mean_right"),
        col("score").cast("long").as("score"),
        (lit(10) * col("score") * col("tn")
          > col("tot") * col("i") * (col("tn") - col("i"))).as("detected"))
      .orderBy("event_type")
  }

  /** Top-k rank stability between snapshot versions — the drift
    * readout on RANKINGS (q195 reports count deltas; retraining
    * decisions hinge on whether the head of the distribution
    * reordered): top-20 tokens of v1 and of the q195-constructed v2,
    * set overlap as integer-rounded Jaccard, and Kendall's τ over the
    * common tokens — concordant/discordant pair counts are exact
    * integers (ranks are distinct, no tie terms) and τ = (C−D)/(C+D)
    * rounds sign-aware half-up in integers. Everything after the two
    * count scans runs on 20-row tables. */
  val q258 = Q.sql("q258_rank_stability",
    """WITH v2 AS (
      |  SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT text || ' new' FROM documents WHERE doc_id % 19 = 0),
      |r1 AS (
      |  SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS r
      |  FROM (SELECT tok, count(*) AS n FROM (
      |          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |          FROM documents) GROUP BY 1)
      |  QUALIFY r <= 20),
      |r2 AS (
      |  SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS r
      |  FROM (SELECT tok, count(*) AS n FROM (
      |          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |          FROM v2) GROUP BY 1)
      |  QUALIFY r <= 20),
      |com AS (
      |  SELECT r1.tok, r1.r AS ra, r2.r AS rb
      |  FROM r1 JOIN r2 USING (tok)),
      |pr AS (
      |  SELECT CAST(sum(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) < 0
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM com a JOIN com b ON a.tok < b.tok),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM com)
      |SELECT nc.n_common,
      |  CAST((nc.n_common * 20000 + (40 - nc.n_common))
      |       // (2 * (40 - nc.n_common)) AS DOUBLE) / 10000.0 AS jaccard,
      |  pr.c AS n_concordant, pr.d AS n_discordant,
      |  CAST(((pr.c - pr.d) * 20000
      |        + CASE WHEN pr.c < pr.d THEN -(pr.c + pr.d)
      |               ELSE pr.c + pr.d END)
      |       // nullif(2 * (pr.c + pr.d), 0) AS DOUBLE) / 10000.0 AS tau
      |FROM nc CROSS JOIN pr""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val v1tok = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true) // both versions' counts derive from it
    def top20(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("n").desc, col("tok"))).cast("long"))
      .filter(col("r") <= 20)
      .select("tok", "r")
    val r1 = top20(v1tok)
    val v2 = v1tok.filter(col("doc_id") % 17 =!= 0)
      .select(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
      .unionByName(v1tok.filter(col("doc_id") % 19 === 0)
        .select(concat(col("text"), lit(" new")).as("text")))
    val r2 = top20(v2)
    val com = r1.select(col("tok"), col("r").as("ra"))
      .join(r2.select(col("tok"), col("r").as("rb")), "tok")
      .localCheckpoint(true) // pair fold + count read it
    val pr = com.as("a").join(com.as("b"), col("a.tok") < col("b.tok"))
      .agg(sum(when(expr("(a.ra - b.ra) * (a.rb - b.rb) > 0"), 1L)
          .otherwise(0L)).cast("long").as("c"),
        sum(when(expr("(a.ra - b.ra) * (a.rb - b.rb) < 0"), 1L)
          .otherwise(0L)).cast("long").as("d"))
    com.agg(count(lit(1)).cast("long").as("n_common"))
      .crossJoin(pr)
      .select(col("n_common"),
        (expr("CAST((n_common * 20000 + (40 - n_common))"
          + " div (2 * (40 - n_common)) AS DOUBLE)") / 10000.0).as("jaccard"),
        col("c").as("n_concordant"), col("d").as("n_discordant"),
        // nullif: n_common <= 1 means zero rank pairs (c+d = 0) — tau
        // must be NULL, not an ANSI div-by-zero error (q266 rule)
        (expr("CAST(((c - d) * 20000 + CASE WHEN c < d THEN -(c + d)"
          + " ELSE c + d END) div nullif(2 * (c + d), 0) AS DOUBLE)")
          / 10000.0).as("tau"))
  }

  /** Lag-k autocorrelation of the daily volume series — the
    * seasonality-STRENGTH number that complements q243's chi² verdict
    * (chi² says "weekday effect exists"; r₇ says how much of the
    * series it explains, and r₁ reads short-term momentum): over the
    * zero-filled daily series, rₖ = Σ(n·xₜ−S)(n·xₜ₊ₖ−S) /
    * Σ(n·xₜ−S)² with S = Σx — cross-multiplied by n so BOTH sums are
    * exact BIGINTs, one sign-aware half-up integer division each at
    * the readout. One window pass per type over the time-axis-sized
    * table. */
  val q260 = Q.sql("q260_autocorrelation",
    """WITH bounds AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |    AS day
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |actual AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT t.event_type, dy.day, coalesce(a.x, 0) AS x
      |  FROM types t CROSS JOIN days dy
      |  LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = dy.day),
      |w0 AS (
      |  SELECT event_type, day,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * x
      |      - CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS dx
      |  FROM g),
      |w AS (
      |  SELECT event_type, dx,
      |    lead(dx, 1) OVER (PARTITION BY event_type ORDER BY day) AS dx1,
      |    lead(dx, 7) OVER (PARTITION BY event_type ORDER BY day) AS dx7
      |  FROM w0),
      |a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(dx * dx) AS BIGINT) AS den,
      |    CAST(sum(CASE WHEN dx1 IS NOT NULL THEN dx * dx1 END) AS BIGINT)
      |      AS num1,
      |    CAST(sum(CASE WHEN dx7 IS NOT NULL THEN dx * dx7 END) AS BIGINT)
      |      AS num7
      |  FROM w GROUP BY 1)
      |SELECT event_type, n_days,
      |  CAST((num1 * 20000 + CASE WHEN num1 < 0 THEN -den ELSE den END)
      |       // nullif(2 * den, 0) AS DOUBLE) / 10000.0 AS r1,
      |  CAST((num7 * 20000 + CASE WHEN num7 < 0 THEN -den ELSE den END)
      |       // nullif(2 * den, 0) AS DOUBLE) / 10000.0 AS r7
      |FROM a ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .localCheckpoint(true) // bounds + types + the counting scan read it
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val days = bounds.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val g = ev.select("event_type").distinct()
      .crossJoin(days)
      .join(ev.groupBy("event_type", "day")
        .agg(count(lit(1)).cast("long").as("x")),
        Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("x"))
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
    val w = g
      .withColumn("dx",
        count(lit(1)).over(byType).cast("long") * col("x")
          - sum("x").over(byType).cast("long"))
      .withColumn("dx1", lead("dx", 1).over(ordered))
      .withColumn("dx7", lead("dx", 7).over(ordered))
    w.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("dx") * col("dx")).cast("long").as("den"),
        sum(when(col("dx1").isNotNull, col("dx") * col("dx1")))
          .cast("long").as("num1"),
        sum(when(col("dx7").isNotNull, col("dx") * col("dx7")))
          .cast("long").as("num7"))
      // nullif: a constant daily series has den = Σdx² = 0 — r1/r7 must
      // be NULL, not an ANSI div-by-zero error (q266 rule)
      .select(col("event_type"), col("n_days"),
        (expr("CAST((num1 * 20000 + CASE WHEN num1 < 0 THEN -den ELSE den"
          + " END) div nullif(2 * den, 0) AS DOUBLE)") / 10000.0).as("r1"),
        (expr("CAST((num7 * 20000 + CASE WHEN num7 < 0 THEN -den ELSE den"
          + " END) div nullif(2 * den, 0) AS DOUBLE)") / 10000.0).as("r7"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q115, q116, q121, q137, q159, q176, q185, q195, q233,
    q242, q243, q247, q256, q257, q258, q260)
}
