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

  /** nDCG@10 of the BM25 ranking under graded relevance — the eval
    * number IR teams actually report (q157 covers hits/MRR against a
    * truth ranking; nDCG grades partial relevance): a document's grade
    * is the count of distinct query terms it contains (0–3), gain =
    * 2^g − 1, and the rank discounts 1/log2(r+1) enter as PRECOMPUTED
    * micro literals shared by both engines (the q216 ln 2 discipline —
    * no runtime transcendental), so DCG and the ideal DCG are exact
    * BIGINT sums and nDCG is one integer-rounded rational (the
    * operators.Q half-boundary rule). IDCG takes the 10 best grades
    * corpus-wide — the strongest attainable ordering. */
  private val NdcgTerms = Seq("spark", "table", "fast")
  // 10^6 / log2(r+1) for r = 1..10
  private val DiscMicro = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)

  val q241 = Q.sql("q241_ndcg", {
    val inList = NdcgTerms.map("'" + _ + "'").mkString(",")
    val discVals = DiscMicro.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
    s"""WITH pred AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r
       |  FROM (${Postings.q141.oracle.get}) b),
       |grades AS (
       |  SELECT doc_id, CAST(count(DISTINCT token) AS BIGINT) AS g FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
       |    FROM documents) t
       |  WHERE token IN ($inList) GROUP BY 1),
       |disc(r, d) AS (VALUES $discVals),
       |dcg AS (
       |  SELECT CAST(sum(((1::BIGINT << COALESCE(g.g, 0)) - 1) * disc.d) AS BIGINT)
       |    AS dcg_micro
       |  FROM pred JOIN disc ON disc.r = pred.r
       |  LEFT JOIN grades g ON g.doc_id = pred.doc_id),
       |ideal AS (
       |  SELECT CAST(sum(((1::BIGINT << g) - 1) * d) AS BIGINT) AS idcg_micro
       |  FROM (SELECT g, row_number() OVER (ORDER BY g DESC) AS r
       |        FROM grades QUALIFY r <= 10) i
       |  JOIN disc ON disc.r = i.r)
       |SELECT dcg.dcg_micro, ideal.idcg_micro,
       |  CAST((dcg.dcg_micro * 20000 + ideal.idcg_micro)
       |       // (2 * ideal.idcg_micro) AS DOUBLE) / 10000.0 AS ndcg
       |FROM dcg CROSS JOIN ideal""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val spark = s
    import spark.implicits._
    val pred = Postings.q141.fn(s, d)
      .withColumn("r", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select("doc_id", "r")
    val grades = Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .filter(col("token").isin(NdcgTerms: _*))
      .groupBy("doc_id").agg(countDistinct("token").cast("long").as("g"))
      .localCheckpoint(true) // DCG + ideal both read it
    val disc = DiscMicro.zipWithIndex.map { case (dd, i) => (i + 1, dd) }
      .toDF("r", "d")
    val dcg = pred.join(broadcast(disc), "r")
      .join(grades, Seq("doc_id"), "left").na.fill(0L, Seq("g"))
      .agg(sum(expr("(shiftleft(1L, cast(g as int)) - 1) * d")).cast("long")
        .as("dcg_micro"))
    val ideal = grades
      .withColumn("r", row_number().over(Window.orderBy(col("g").desc)))
      .filter(col("r") <= 10)
      .join(broadcast(disc), "r")
      .agg(sum(expr("(shiftleft(1L, cast(g as int)) - 1) * d")).cast("long")
        .as("idcg_micro"))
    dcg.crossJoin(ideal)
      .withColumn("ndcg",
        expr("CAST((dcg_micro * 20000 + idcg_micro) div (2 * idcg_micro) AS DOUBLE)")
          / 10000.0)
  }

  /** Confidence calibration of the k-NN classifier (q224) — the
    * reliability table + expected calibration error (ECE, Naeini et
    * al. 2015) a model card reports: predictions bin by their vote
    * share (votes/k is the classifier's confidence — k+1 natural bins,
    * no arbitrary bin edges), each bin compares its empirical accuracy
    * to its confidence, and ECE is the n-weighted mean absolute gap.
    *
    * Exactness: accuracy = c/n and ECE = Σ|k·c_b − v_b·n_b| / (k·N)
    * are finite-decimal-capable rationals → integer half-up rounding
    * (the q233 rule); confidence v/k is one IEEE division of small
    * integers, identical both engines. Scale: the bin table is
    * k+1 rows — everything after the nested classifier is free. */
  val q246 = Q.sql("q246_calibration_bins", {
    val k = LabelProp.KnnK
    s"""WITH base AS (SELECT * FROM (${LabelProp.q224.oracle.get}) b),
       |bins AS (
       |  SELECT votes, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct
       |  FROM base GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(abs($k * n_correct - votes * n)) AS BIGINT) AS dev
       |  FROM bins)
       |SELECT votes, n, n_correct,
       |  CAST(votes AS DOUBLE) / $k.0 AS confidence,
       |  CAST((n_correct * 20000 + n) // (2 * n) AS DOUBLE) / 10000.0
       |    AS accuracy,
       |  CAST((dev * 20000 + $k * nn) // (2 * $k * nn) AS DOUBLE) / 10000.0
       |    AS ece
       |FROM bins CROSS JOIN tot ORDER BY votes""".stripMargin
  }) { (s, d) =>
    val k = LabelProp.KnnK
    val bins = LabelProp.q224.fn(s, d)
      .groupBy("votes")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("correct"), 1L).otherwise(0L)).cast("long").as("n_correct"))
      .localCheckpoint(true) // the ECE total + per-bin rows both read it
    val tot = bins.agg(sum("n").cast("long").as("nn"),
      sum(abs(lit(k) * col("n_correct") - col("votes") * col("n")))
        .cast("long").as("dev"))
    bins.crossJoin(broadcast(tot))
      .select(col("votes"), col("n"), col("n_correct"),
        (col("votes").cast("double") / k.toDouble).as("confidence"),
        (expr("CAST((n_correct * 20000 + n) div (2 * n) AS DOUBLE)")
          / 10000.0).as("accuracy"),
        (expr(s"CAST((dev * 20000 + $k * nn) div (2 * $k * nn) AS DOUBLE)")
          / 10000.0).as("ece"))
      .orderBy("votes")
  }

  val all: Seq[Q] = Seq(q157, q241, q246)
}
