package graft.ingest

import org.apache.spark.sql.functions._

import graft.operators.Q

/** Gates for the ingest planning surface (S1/S4). The HTTP transport is
  * environment-injected (zero-egress container), but the plans
  * themselves are pure arithmetic — so the stripe layout is oracled
  * directly: DuckDB replays the offset/worker math over the same table
  * cardinality.
  */
object IngestOps {

  /** S1 — striped page plan over the documents table's cardinality:
    * every multiple of `limit` below total appears exactly once, and
    * worker assignment is round-robin by page index ((off/limit) mod
    * workers — exactly the reference's "worker i starts at page i,
    * steps by #workers" layout, 01_full_update.py:67-80). */
  val q92 = Q.sql("q92_harvest_plan",
    """WITH t AS (SELECT CAST(count(*) AS INTEGER) AS total FROM documents)
      |SELECT CAST((o // 37) % 5 AS BIGINT) AS worker,
      |  CAST(o AS BIGINT) AS page_offset,
      |  CAST(37 AS BIGINT) AS page_limit
      |FROM t, LATERAL unnest(range(0, total, 37)) u(o)
      |ORDER BY worker, page_offset""".stripMargin) { (s, d) =>
    val total = graft.Tables.documents(s, d).count()
    Harvest.planDf(s, total, limit = 37, workers = 5)
      .select(col("worker").cast("long").as("worker"),
        col("offset").cast("long").as("page_offset"),
        col("limit").cast("long").as("page_limit"))
      .orderBy("worker", "page_offset")
  }

  /** S6 — last-write-wins upsert, both decision paths in one gate: an
    * incoming batch touches every doc_id % 3 == 0 row, with a HIGHER
    * version on even ids (newer wins) and an EQUAL version on odd ids
    * (tie breaks toward the incoming batch — the reference's
    * UpdateOne(upsert=True) overwrite semantics). */
  val q93 = Q.sql("q93_upsert",
    """WITH cur AS (
      |  SELECT doc_id, lang, CAST(0 AS BIGINT) AS version FROM documents),
      |inc AS (
      |  SELECT doc_id, 'xx' AS lang,
      |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS version
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, lang, version FROM (
      |  SELECT u.doc_id, u.lang, u.version,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY version DESC, src DESC) AS rn
      |  FROM (SELECT doc_id, lang, version, 0 AS src FROM cur
      |        UNION ALL SELECT doc_id, lang, version, 1 AS src FROM inc) u) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = graft.Tables.documents(s, d)
    val existing = docs.select(col("doc_id"), col("lang"),
      lit(0L).as("version"))
    val incoming = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), lit("xx").as("lang"),
        when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("version"))
    Harvest.upsert(existing, incoming, "doc_id", "version")
      .orderBy("doc_id")
  }

  /** S4 — targeted re-harvest plan: one fetch unit per id, round-robin
    * striped (a re-fetch id list is small by nature — the collect IS the
    * reference's shape, 01_ids_update.py reads the id file on the
    * driver). */
  val q94 = Q.sql("q94_harvest_ids",
    """SELECT CAST((row_number() OVER (ORDER BY doc_id) - 1) % 4 AS BIGINT)
      |    AS worker, doc_id
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ids = graft.Tables.documents(s, d)
      .select(col("doc_id")).orderBy("doc_id").as[Long].collect().toSeq
    Harvest.planIds(ids, workers = 4)
      .toDF("worker", "doc_id")
      .select(col("worker").cast("long").as("worker"), col("doc_id"))
      .orderBy("doc_id")
  }

  /** Deterministic flaky transport for the S2/S3 gate: pages at
    * offset % 89 == 0 are permanently down (503 forever → dead-letter
    * after the 5-attempt budget), offset % 3 == 0 pages return 503 twice
    * then succeed (lands with attempts=3), everything else succeeds
    * first try. STATELESS — success is a pure function of (offset,
    * attempt), so a Spark task retry or speculative attempt replays the
    * identical outcome (a per-instance call counter would reset with the
    * re-deserialized closure and land off%3 pages at attempts=2). */
  private final class FlakyTransport
      extends ((String, Int) => Either[Int, String]) with Serializable {
    override def apply(url: String, attempt: Int): Either[Int, String] = {
      val off = url.split("offset=")(1).split("&")(0).toInt
      if (off % 89 == 0) Left(503)
      else if (off % 3 == 0 && attempt < 3) Left(503)
      else Right(s"""{"offset":$off}""")
    }
  }

  /** S2/S3 — the retry policy and dead-letter split, distributed and
    * oracled: the real `Fetcher.fetchPages` runs the striped plan
    * through [[FlakyTransport]] in mapPartitions, and DuckDB replays
    * which pages must land (and after how many attempts) from the
    * offset arithmetic alone. */
  val q96 = Q.sql("q96_fetch_deadletter",
    """WITH t AS (SELECT CAST(count(*) AS INTEGER) AS total FROM documents)
      |SELECT CAST(o AS BIGINT) AS page_offset,
      |  CASE WHEN o % 89 = 0 THEN 'dead' ELSE 'ok' END AS status,
      |  CAST(CASE WHEN o % 89 = 0 THEN 5
      |            WHEN o % 3 = 0 THEN 3 ELSE 1 END AS BIGINT) AS attempts
      |FROM t, LATERAL unnest(range(0, total, 37)) u(o)
      |ORDER BY page_offset""".stripMargin) { (s, d) =>
    val total = graft.Tables.documents(s, d).count()
    val plan = Harvest.planDf(s, total, limit = 37, workers = 5)
    val (fetched, dead) =
      Fetcher.fetchPagesAware(s, plan, "https://api.example.org/biblio", new FlakyTransport)
    fetched.select(col("offset").cast("long").as("page_offset"),
        lit("ok").as("status"), col("attempts").cast("long").as("attempts"))
      .unionByName(dead.select(col("offset").cast("long").as("page_offset"),
        lit("dead").as("status"), col("attempts").cast("long").as("attempts")))
      .orderBy("page_offset")
  }

  /** X28 — the incremental harvest window (trailing 10 days; the
    * reference's docstring says 5, its code says 10 — code wins,
    * tasks_for_01.py:117-119). Both engines compute the cutoff from the
    * same fixed anchor date with their own date arithmetic. */
  val q97 = Q.sql("q97_incremental_window",
    """SELECT 'updated_time__gte' AS param,
      |  strftime(DATE '2026-08-13' - INTERVAL 10 DAY, '%Y-%m-%d') AS cutoff""".stripMargin) {
    (s, _) =>
      import s.implicits._
      Harvest.incrementalParams(java.time.LocalDate.of(2026, 8, 13)).toSeq
        .toDF("param", "cutoff")
  }

  /** X28 DATE_PARAM mode — the bounded backfill window
    * (01_date_param_update.py): the gate pins BOTH the param strings the
    * reference sends (gte = start T00:00:00, lte = end T23:59:59) and
    * their server-side inclusive semantics applied to a real timestamp
    * column (events in/outside the window, replayed by DuckDB over the
    * same bounds). */
  val q145 = Q.sql("q145_date_param_window",
    """WITH w AS (
      |  SELECT count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |                            AND ts <= TIMESTAMP '2024-01-12 23:59:59') AS inside,
      |         count(*) AS total
      |  FROM events)
      |SELECT k, v FROM (
      |  SELECT 'updated_time__gte' AS k, '2024-01-10T00:00:00' AS v FROM w
      |  UNION ALL
      |  SELECT 'updated_time__lte', '2024-01-12T23:59:59' FROM w
      |  UNION ALL SELECT 'events_in_window', CAST(inside AS VARCHAR) FROM w
      |  UNION ALL SELECT 'events_outside', CAST(total - inside AS VARCHAR) FROM w)
      |ORDER BY k""".stripMargin) { (s, d) =>
    import s.implicits._
    val params = Harvest.dateParamParams(
      java.time.LocalDate.of(2024, 1, 10), java.time.LocalDate.of(2024, 1, 12))
    val ev = graft.Tables.events(s, d)
    val total = ev.count()
    val inside = Harvest.applyDateWindow(ev, "ts", params).count()
    (params.toSeq ++ Seq(
      "events_in_window" -> inside.toString,
      "events_outside" -> (total - inside).toString))
      .toDF("k", "v").orderBy("k")
  }

  val all: Seq[Q] = Seq(q92, q93, q94, q96, q97, q145)
}
