package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ranking-quality evaluation — the measurement half of the retrieval
  * stack: score a candidate ranking (any ANN route) against a ground
  * truth ranking (the brute scan) with exact-integer metrics, per
  * query. This is how a 100 TB pipeline validates an index before
  * cutting traffic over: recall@k and reciprocal rank computed as a
  * JOIN of two rankings, no notebook in the loop.
  *
  * Metrics per truth query: `hits` = |pred top-k ∩ truth top-k|
  * (recall@k numerator), `first_rank` = the best predicted rank that
  * hits the truth set (0 when none), `rr_micro` = ⌊10⁶/first_rank⌋ (0
  * when none) — the MRR contribution. All integers, so the oracle
  * replays them exactly; aggregate recall/MRR are one further GROUP BY
  * the caller owns.
  *
  * Scale shape: each ranking is re-ranked only WITHIN its ≤k rows per
  * query (window over k, not over candidates), then one join on
  * (query_id, neighbor_id) and one groupBy query_id — nothing touches
  * vectors or the corpus.
  */
object RankEval {

  /** Rank rows within each query by (sim DESC, neighbor_id), keep ≤ k. */
  private def ranked(r: DataFrame, k: Int): DataFrame =
    r.withColumn("r", row_number().over(
      Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("r") <= k)
      .select("query_id", "neighbor_id", "r")

  /** Evaluate `pred` against `truth` (both (query_id, neighbor_id, sim)
    * frames) at depth k, one row per truth query. */
  def rankingEval(pred: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val p = ranked(pred, k)
    val t = ranked(truth, k)
    val hits = p.join(t.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min("r").as("first_rank"))
    t.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_micro"))
      .orderBy("query_id")
  }

  /** Gate: evaluate the SRP-LSH route (q31) against brute truth (q30)
    * at depth 3 — the oracle replays BOTH rankings (their own oracle
    * SQL, nested) plus the join-and-count metrics. */
  val q157 = Q.sql("q157_rank_eval",
    s"""WITH pred0 AS (SELECT * FROM (${Similarity.q31.oracle.get}) pp),
       |truth0 AS (SELECT * FROM (${Similarity.q30.oracle.get}) tt),
       |predr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS r
       |  FROM pred0 QUALIFY r <= 3),
       |truthr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS r
       |  FROM truth0 QUALIFY r <= 3),
       |h AS (
       |  SELECT p.query_id, count(*) AS hits, min(p.r) AS first_rank
       |  FROM predr p JOIN truthr t
       |    ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
       |  GROUP BY 1)
       |SELECT t.query_id,
       |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |  CAST(coalesce(h.first_rank, 0) AS BIGINT) AS first_rank,
       |  CAST(coalesce(1000000 // h.first_rank, 0) AS BIGINT) AS rr_micro
       |FROM (SELECT DISTINCT query_id FROM truthr) t
       |LEFT JOIN h ON h.query_id = t.query_id
       |ORDER BY t.query_id""".stripMargin) { (s, d) =>
    rankingEval(Similarity.q31.fn(s, d), Similarity.q30.fn(s, d), 3)
  }

  val all: Seq[Q] = Seq(q157)
}
