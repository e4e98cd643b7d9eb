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

  val all: Seq[Q] = Seq(q92)
}
