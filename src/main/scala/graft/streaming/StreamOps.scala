package graft.streaming

import org.apache.spark.sql.functions._

import graft.operators.Q

/** Gates for the streaming surface: each runs a real Structured
  * Streaming query (memory sink, AvailableNow-style synchronous drain)
  * whose final result must equal the batch SQL the DuckDB oracle runs.
  */
object StreamOps {

  private def qn(prefix: String): String =
    prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "")

  /** Watermarked tumbling-window counts ≡ batch date_trunc group-by. */
  val q50 = Q.sql("q50_stream_window",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, count(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Streams.windowedCounts(s, d, qn("wincounts"))
      .orderBy("hour", "event_type")
  }

  /** Stateful sessionization ≡ batch lag-gap cumulative count. */
  val q51 = Q.sql("q51_stream_sessions",
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Streams.sessionize(s, d, qn("sessions"))
      .orderBy("user_id")
  }

  /** Streaming first-seen dedup ≡ batch DISTINCT. */
  val q57 = Q.sql("q57_stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    Streams.streamDedup(s, d, qn("dedup"))
      .orderBy("user_id", "event_type")
  }

  /** Native session_window sessionization ≡ batch gap/cumsum session
    * reconstruction, restricted to watermark-CLOSED sessions (append
    * mode emits a session once its end passes the watermark; Spark
    * tracks watermarks in whole milliseconds, hence the ms-floor in the
    * closed filter). Adds the total active span per user (sum over
    * sessions of last − first event, ms). */
  val q63 = Q.sql("q63_session_window",
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o),
      |g AS (
      |  SELECT user_id, sid, count(*) AS n,
      |    epoch_ms(max(ts)) - epoch_ms(min(ts)) AS dur,
      |    max(ts) AS last_ts
      |  FROM s GROUP BY 1, 2),
      |w AS (SELECT (epoch_us(max(ts)) // 1000) * 1000 AS wm FROM events)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(sum(n) AS BIGINT) AS n_events, CAST(sum(dur) AS BIGINT) AS active_ms
      |FROM g, w
      |WHERE epoch_us(last_ts) + 1800000000 <= wm
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Streams.sessionizeNative(s, d, qn("native_sessions"))
      .orderBy("user_id")
  }

  /** Watermark-bounded streaming dedup (the state-expiring 100 TB mode
    * of q57). All fixture events arrive in one batch, so every
    * duplicate falls inside the watermark window and the result equals
    * full DISTINCT — the equivalence this gate pins. */
  val q71 = Q.sql("q71_stream_dedup_wm",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    Streams.streamDedupWithinWatermark(s, d, qn("dedup_wm"))
      .orderBy("user_id", "event_type")
  }

  /** Sessionization on the Spark 4 `transformWithState` API (RocksDB
    * state store, TTL-able per-key state) ≡ the same batch lag-gap
    * oracle as q51 — pins that the migration preserved semantics. */
  val q72 = Q.sql("q72_sessions_tws",
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Streams.sessionizeTws(s, d, qn("sessions_tws"))
      .orderBy("user_id")
  }

  /** Stream-static dimension enrichment ≡ batch join + group-by. */
  val q76 = Q.sql("q76_stream_enrich",
    """SELECT n.n_name AS nation, count(*) AS cnt
      |FROM events e
      |JOIN customer c ON c.c_custkey = e.user_id + 1
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Streams.streamStaticEnrich(s, d, qn("stream_enrich"))
      .orderBy("nation")
  }

  /** Watermarked stream-stream interval join (view→purchase attribution
    * within 1h) ≡ batch self-join with the same time bounds; the raw
    * matched pairs from the append-mode sink are rolled up per user for
    * a compact deterministic compare. */
  val q84 = Q.sql("q84_stream_stream_join",
    """SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND epoch_us(p.ts) > epoch_us(v.ts)
      | AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Streams.streamStreamJoin(s, d, qn("ss_join"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Streaming HLL ≡ batch HLL: the register grid a Complete-mode max
    * aggregation leaves behind must equal q131's batch sketch — the
    * oracle is shared verbatim. Sketches-over-streams is the 100 TB
    * monitoring shape (distinct users per type, live, bounded state). */
  val q135 = Q.sql("q135_stream_hll",
    graft.operators.Sketches.HllOracle) { (s, d) =>
    Streams.hllSketch(s, d, qn("hll"))
  }

  /** Streaming Count-Min register maintenance ≡ the batch grid (q104's
    * register CTE): additive counters under Complete-mode streaming sum. */
  val q166 = Q.sql("q166_stream_countmin",
    """WITH k AS (
      |  SELECT user_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h,
      |    cnt
      |  FROM (SELECT user_id, CAST(user_id AS VARCHAR) AS u,
      |               count(*) AS cnt
      |        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)),
      |d AS (SELECT * FROM (VALUES
      |  (0, 2177342782468422681), (1, 2258633747088074174),
      |  (2, 1499779743744070127), (3, 1650849331375898009)) t(i, g)),
      |r AS (
      |  SELECT CAST(i AS BIGINT) AS i,
      |    CAST(CAST(h AS HUGEINT) * CAST(g AS HUGEINT)
      |         % 2305843009213693951 % 256 AS BIGINT) AS cell,
      |    CAST(sum(cnt) AS BIGINT) AS reg
      |  FROM k CROSS JOIN d GROUP BY 1, 2)
      |SELECT i, cell, reg FROM r ORDER BY i, cell""".stripMargin) { (s, d) =>
    Streams.cmsSketch(s, d, qn("cms"))
  }

  /** Streaming decayed-counter maintenance ≡ q159's batch registers:
    * per-(type, day) Complete-mode counts are the stream state, the
    * dyadic Q40 weighting is a bounded fold over the sink — oracle
    * shared verbatim with the batch gate. */
  val q171 = Q.sql("q171_stream_decay",
    graft.operators.Timeseries.DecayOracle) { (s, d) =>
    Streams.decayedSketch(s, d, qn("decay"))
  }

  /** Streaming exact top-k ≡ batch GROUP-BY top-k: the per-key count
    * state a Complete-mode aggregation maintains is q91's exact-regime
    * sketch kept live; selection folds the bounded sink. */
  val q218 = Q.sql("q218_stream_topk",
    """SELECT user_id AS item, CAST(count(*) AS BIGINT) AS count
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 ORDER BY count DESC, item LIMIT 10""".stripMargin) { (s, d) =>
    Streams.topkSketch(s, d, qn("topk"), top = 10)
  }

  val all: Seq[Q] = Seq(q50, q51, q57, q63, q71, q72, q76, q84, q135, q166, q171, q218)
}
