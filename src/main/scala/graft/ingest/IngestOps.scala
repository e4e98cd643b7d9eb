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
    val total = graft.Tables.documents(s, d).count().toInt
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

  val all: Seq[Q] = Seq(q92, q93, q94)
}
