package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** IVF-PQ — the composition that serves billion-vector ANN in practice
  * (Jégou et al. 2011; the FAISS `IVFx,PQy` index): IVF routing prunes
  * WHICH vectors get scored (probe 2 of 16 k-means lists ⇒ ~⅛ of the
  * corpus), product quantization prunes the BYTES per scored vector
  * (8 B of codes instead of 256 B of floats), and an exact-cosine
  * re-rank of the small shortlist restores precision. Both stages are
  * the already-gated components composed unchanged: q62's Lloyd-refined
  * IVF quantizer for routing, q154's trained PQ codebooks + integer ADC
  * for scoring.
  *
  * 100 TB shape: the corpus-sized tables in the plan are (id, list) and
  * (id, codes) — 12 B/row; float vectors appear only in the two
  * bounded-output stages (codebook training collects K·M subvectors;
  * re-rank touches shortlist·queries rows). Probe count and shortlist
  * are the recall/cost knobs, exactly as in the served-index gate
  * (q139) this composes with.
  *
  * Oracle: the full replay, both quantizers — q62's two Lloyd steps for
  * the routing centroids, q154's two per-subspace Lloyd steps for the
  * codebooks, assignment, ADC, shortlist, re-rank — in one WITH chain,
  * so drift in either quantizer or in the composition hash-mismatches.
  */
object IvfPq {

  val SHORTLIST = 20
  val TOPK = 3

  def ivfPqTopK(e: DataFrame, probes: Int = Similarity.IVF_PROBES,
      shortlist: Int = SHORTLIST, topK: Int = TOPK): DataFrame = {
    // routing quantizer: q62's refined centroids over the raw vectors.
    // Queries = corpus, so ONE ranked assignment (checkpointed — 12 B
    // of (id, lst, crn) per row, vectors do NOT ride the routing table)
    // derives both sides instead of paying the C-cosine pass twice
    // (the ivfTopK single-pass rationale, r15)
    val centArr = Similarity.localCents(Similarity.kmeansCentroids(e))
    val asg = Similarity.ivfAssignRanked(
      e.select(col("vec_id"), col("embedding")),
      centArr, "vec_id", "embedding", "lst", probes)
      .select("vec_id", "lst", "crn")
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    val nlist = asg.filter(col("crn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("lst").as("nlist"))
    val qlist = asg
      .select(col("vec_id").as("query_id"), col("lst").as("qlist"))
    // scoring quantizer: q154's codebooks over the normalized vectors
    val en = Pq.normalized(e).localCheckpoint(true)
    val cb = Pq.trainCodebook(en)
    val codes = Pq.encode(en, cb).withColumnRenamed("vec_id", "neighbor_id")
    val qn = en.select(col("vec_id").as("query_id"), col("ne").as("qn"))
    val pairs = qlist.join(nlist, col("qlist") === col("nlist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(codes, "neighbor_id")
      .join(qn, "query_id")
    val adc = Exprs.pq_adc(col("qn"), col("codes"), Pq.flatCb(cb),
      Pq.M, Pq.SUB, Pq.K)
    val short = Similarity.topKPerQueryLong(
      pairs.select(col("query_id"), col("neighbor_id"), adc.as("score")),
      shortlist)
      .select("query_id", "neighbor_id")
    val reranked = short
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("va")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vb")), "neighbor_id")
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    Similarity.topKPerQuery(
      reranked.select(col("query_id"), col("neighbor_id"), col("sim")), topK)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  val q158 = Q.sql("q158_ann_ivfpq",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT ${Similarity.IVF_LISTS}),
       |${Similarity.lloydStepSql("c0", "a1", "m1", "c1")},
       |${Similarity.lloydStepSql("c1", "a2", "m2", "c2")},
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN c2 c),
       |nl AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |ql AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg WHERE crn <= ${Similarity.IVF_PROBES}),
       |en AS MATERIALIZED (
       |  SELECT vec_id, list_transform(emb,
       |    v -> CAST(CAST(v / sqrt(list_inner_product(emb, emb)) AS REAL) AS DOUBLE)) AS ne
       |  FROM e),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, ne
       |  FROM (SELECT * FROM en ORDER BY vec_id LIMIT ${Pq.K})),
       |ms AS (SELECT unnest(range(0, ${Pq.M})) AS m),
       |cb0 AS MATERIALIZED (
       |  SELECT m, k, list_slice(ne, m*${Pq.SUB}+1, m*${Pq.SUB}+${Pq.SUB}) AS cv FROM seeds, ms),
       |${Pq.pqLloydSql("cb0", "asg1", "mean1", "cb1")},
       |${Pq.pqLloydSql("cb1", "asg2", "mean2", "cb2")},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, k AS code FROM (
       |    SELECT en.vec_id, cb.m, cb.k,
       |      row_number() OVER (PARTITION BY en.vec_id, cb.m
       |        ORDER BY round(list_inner_product(list_slice(en.ne, cb.m*${Pq.SUB}+1, cb.m*${Pq.SUB}+${Pq.SUB}), cb.cv)
       |                       - list_inner_product(cb.cv, cb.cv) / 2.0, 4) + 0.0 DESC, cb.k) AS rn
       |    FROM en, cb2 cb) t WHERE rn = 1),
       |adc AS MATERIALIZED (
       |  SELECT q.query_id, n.neighbor_id,
       |    CAST(SUM(CAST(round(round(list_inner_product(list_slice(qe.ne, k.m*${Pq.SUB}+1, k.m*${Pq.SUB}+${Pq.SUB}), cb.cv), 4) * 10000) AS BIGINT)) AS BIGINT) AS score
       |  FROM ql q
       |  JOIN nl n ON n.lst = q.lst AND n.neighbor_id <> q.query_id
       |  JOIN codes k ON k.vec_id = n.neighbor_id
       |  JOIN cb2 cb ON cb.m = k.m AND cb.k = k.code
       |  JOIN en qe ON qe.vec_id = q.query_id
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
       |    FROM adc) t WHERE rn <= $SHORTLIST),
       |rerank AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    round(list_cosine_similarity(a.emb, b.emb), 4) + 0.0 AS sim
       |  FROM short s
       |  JOIN e a ON a.vec_id = s.query_id
       |  JOIN e b ON b.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM rerank) t WHERE rn <= $TOPK
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    ivfPqTopK(Tables.embeddings(s, d))
  }

  val all: Seq[Q] = Seq(q158)
}
