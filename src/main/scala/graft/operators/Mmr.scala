package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity-aware selection pass a retrieval pipeline runs AFTER
  * candidate generation: greedily pick k of the top-N candidates,
  * each step maximizing λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s).
  * With λ = ½ the argmax is equivalent to maximizing the integer
  * rel_µ − maxsim_µ (the ½ scale cancels), which is how both engines
  * rank it here — exact BIGINT ten-thousandths, no float seam; the
  * first pick (empty picked set) is pure relevance.
  *
  * Scale shape: candidate generation stays fully distributed (brute
  * rounded-cosine here — swap any Similarity ANN route; MMR only needs
  * the top-N rows plus their vectors), then the inherently-sequential
  * greedy runs per query inside `flatMapGroups` over ≤N candidates —
  * bounded per-group state (N·64 floats), shuffled once on query_id,
  * never a driver loop. The pairwise candidate sims (N² per query) are
  * computed inside the group, so they never hit the shuffle either.
  *
  * Oracle: full unrolled replay (the q125 BPE pattern) — candidate CTE,
  * pairwise-sim CTE, then one MATERIALIZED layer per greedy step whose
  * per-query argmax is a row_number window over rel_µ − max(sim_µ to
  * the picked set).
  */
object Mmr {

  val NQueries = 10
  val Depth = 12
  val Picks = 5

  // public: Spark's encoder codegen instantiates these from generated
  // classes, which cannot touch private members
  case class CandRow(query_id: Long, cand_id: Long, rel: Long,
      emb: Seq[Float])
  case class MmrPick(query_id: Long, step: Long, doc_id: Long,
      mmr: Long)

  /** Rounded-cosine in integer ten-thousandths — the in-JVM twin of the
    * columnar round(round(cosine_sim, 4)·10⁴) path (same sequential
    * fold as TextKernels.cosineF, same BigDecimal HALF_UP round as
    * Spark's `round`). */
  private def cosMicro(a: Array[Float], b: Array[Float]): Long = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    val c = if (d == 0.0) 0.0 else dot / d
    (BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      * 10000).toLongExact
  }

  /** MMR top-`picks` per query over brute top-`depth` candidates. */
  def mmrRerank(e: DataFrame, nQueries: Int = NQueries,
      depth: Int = Depth, picks: Int = Picks): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val queries = e.orderBy("vec_id").limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val rel = e
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cemb"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        round(round(Exprs.cosine_sim(col("cemb"), col("qv")), 4) * 10000)
          .cast("long"))
    val top = Similarity.topKPerQueryLong(
      rel.select(col("query_id"), col("neighbor_id"), col("score")), depth)
    val cands = top
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("score").as("rel"), col("embedding").as("emb"))
      .as[CandRow]
    cands.groupByKey(_.query_id).flatMapGroups { (qid, it) =>
      val cs = it.toArray.sortBy(c => (c.cand_id))
      val embs = cs.map(_.emb.toArray)
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      val k = math.min(picks, cs.length)
      for (step <- 1 to k) {
        var bestIdx = -1
        var bestObj = Long.MinValue
        var i = 0
        while (i < cs.length) {
          if (!picked.contains(i)) {
            val maxSim =
              if (picked.isEmpty) 0L
              else picked.iterator.map(p => cosMicro(embs(i), embs(p))).max
            val obj = if (picked.isEmpty) cs(i).rel else cs(i).rel - maxSim
            // argmax, ties to the smaller cand_id (cs is id-sorted)
            if (obj > bestObj) { bestObj = obj; bestIdx = i }
          }
          i += 1
        }
        picked += bestIdx
        out += MmrPick(qid, step.toLong, cs(bestIdx).cand_id, bestObj)
      }
      out
    }.toDF("query_id", "step", "doc_id", "mmr")
      .orderBy("query_id", "step")
  }

  /** One MATERIALIZED oracle layer per greedy step (i ≥ 2): score every
    * unpicked candidate as rel − max(sim to picked), argmax per query. */
  private def oracleLayers(picks: Int): String = {
    val iters = (2 to picks).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT query_id, cand_id, mmr FROM (
         |    SELECT c.query_id, c.cand_id, c.rel - m.maxsim AS mmr,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY c.rel - m.maxsim DESC, c.cand_id) AS rn
         |    FROM cand c
         |    JOIN (SELECT p.query_id, p.ai AS cand_id, max(p.simu) AS maxsim
         |          FROM psim p JOIN picked${i - 1} s
         |            ON p.query_id = s.query_id AND p.bi = s.cand_id
         |          GROUP BY 1, 2) m
         |      ON m.query_id = c.query_id AND m.cand_id = c.cand_id
         |    WHERE NOT EXISTS (SELECT 1 FROM picked${i - 1} x
         |      WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
         |  ) t WHERE rn = 1),
         |picked$i AS MATERIALIZED (
         |  SELECT * FROM picked${i - 1}
         |  UNION ALL SELECT query_id, cand_id FROM s$i)""".stripMargin
    }
    iters.mkString(",\n")
  }

  val q156 = Q.sql("q156_mmr_rerank", {
    val steps = (1 to Picks).map(i =>
      s"SELECT query_id, CAST($i AS BIGINT) AS step, cand_id AS doc_id, mmr FROM s$i")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |queries AS (SELECT vec_id AS query_id, emb AS qv FROM e ORDER BY vec_id LIMIT $NQueries),
       |rel AS MATERIALIZED (
       |  SELECT q.query_id, c.vec_id AS cand_id,
       |    CAST(round(round(list_cosine_similarity(c.emb, q.qv), 4) * 10000) AS BIGINT) AS rel
       |  FROM queries q JOIN e c ON c.vec_id <> q.query_id),
       |cand AS MATERIALIZED (
       |  SELECT query_id, cand_id, rel FROM (
       |    SELECT query_id, cand_id, rel,
       |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
       |    FROM rel) t
       |  WHERE rn <= $Depth),
       |psim AS MATERIALIZED (
       |  SELECT a.query_id, a.cand_id AS ai, b.cand_id AS bi,
       |    CAST(round(round(list_cosine_similarity(ea.emb, eb.emb), 4) * 10000) AS BIGINT) AS simu
       |  FROM cand a
       |  JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
       |  JOIN e ea ON ea.vec_id = a.cand_id
       |  JOIN e eb ON eb.vec_id = b.cand_id),
       |s1 AS MATERIALIZED (
       |  SELECT query_id, cand_id, rel AS mmr FROM (
       |    SELECT query_id, cand_id, rel,
       |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
       |    FROM cand) t WHERE rn = 1),
       |picked1 AS MATERIALIZED (SELECT query_id, cand_id FROM s1),
       |${oracleLayers(Picks)}
       |SELECT query_id, step, doc_id, mmr
       |FROM (${steps.mkString(" UNION ALL ")}) u
       |ORDER BY query_id, step""".stripMargin
  }) { (s, d) =>
    mmrRerank(Tables.embeddings(s, d))
  }

  val all: Seq[Q] = Seq(q156)
}
