package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Product quantization (PQ) ANN — the memory-compression path (Jégou
  * et al., "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011), as the standard two-stage pipeline:
  *
  *   1. normalize vectors (so inner product ≡ cosine),
  *   2. train per-subspace codebooks (M=16 subspaces × 4 dims, K=16
  *      entries, 2 Lloyd steps from deterministic seeds),
  *   3. encode every vector to M 4-bit codes (argmin L2 per subspace ≡
  *      argmax ⟨x_m,c⟩ − ‖c‖²/2 on the quantized key),
  *   4. serve queries by asymmetric distance computation (ADC): the
  *      query keeps exact subvectors, neighbors contribute only their
  *      CODES — score = Σ_m ⟨q_m, codebook_m[code]⟩ in integer
  *      ten-thousandths — producing a shortlist,
  *   5. exact-cosine re-rank of the shortlist to the final top-k.
  *
  * 100 TB shape: the embedding table is scanned once to encode; the
  * probe side then joins a codes table of M·4 bits = 8 B per vector
  * (32× under the 64-float row), with the M·K = 256-subvector codebook
  * inlined as literals and the query batch broadcast. Only the ≤
  * shortlist·queries re-rank rows ever touch a float vector again.
  * Shortlist size scales with corpus (50 here ⇒ recall@5 ≈ 0.8–0.9 vs
  * brute on this data, pinned by ScaleSpec); compose with the IVF
  * lists (q32/q62) for IVF-PQ.
  *
  * Determinism contract: normalization is float-quantized (CAST REAL)
  * so both engines hold identical vectors; Lloyd means are exact
  * decimal sums → one IEEE divide → float-quantized centroids (the
  * q62 kmeans replay pattern); assignment keys and ADC terms round at
  * 4 dp before any ordering (code-ascending ties), ADC sums are
  * BIGINT, and the re-rank is the q30 rounded-cosine contract. The
  * oracle replays ALL of it — seeds, both Lloyd steps, encode, ADC,
  * shortlist, re-rank — so quantizer drift anywhere hash-mismatches.
  */
object Pq {

  val M = 16
  val SUB = 4
  val K = 16
  val ITERS = 2
  val QUERIES = 50
  val SHORTLIST = 50
  val TOPK = 5

  /** m → k → centroid subvector (floats — centroids are themselves
    * quantized to REAL so literal and oracle agree bit-for-bit). */
  type Codebook = IndexedSeq[IndexedSeq[IndexedSeq[Float]]]

  /** Unit-normalize to array<float>: v / ‖x‖ computed in double (same
    * sequential ‖x‖² fold as the oracle's list_inner_product), then
    * float-quantized. */
  def normalized(e: DataFrame): DataFrame = {
    val norm = sqrt(Exprs.dot_f(col("embedding"), col("embedding")))
    e.select(col("vec_id"),
      transform(col("embedding"),
        v => (v.cast("double") / norm).cast("float")).as("ne"))
  }

  /** Seed codebook: subvectors of the K smallest vec_ids (normalized) —
    * a bounded K×64-float collect. */
  def seedCodebook(en: DataFrame): Codebook = {
    val seeds = en.orderBy("vec_id").limit(K)
      .select("ne").collect()
      .map(_.getSeq[Float](0).toVector).toVector
    (0 until M).map(m =>
      seeds.map(v => v.slice(m * SUB, (m + 1) * SUB)): IndexedSeq[IndexedSeq[Float]]).toVector
  }

  /** Codebook flattened to the kernel layout: (m·K + k)·SUB + i. */
  private[graft] def flatCb(cb: Codebook): Array[Float] =
    cb.flatten.flatten.toArray

  /** Encode to the SERVED form: all M 4-bit codes bit-packed into ONE
    * BIGINT (M·log₂K = 16·4 = exactly 64 bits) — the codes table is
    * literally (vec_id, codes), 16 B/row, vs 256 B of floats. One
    * codegen'd kernel call per row ([[Exprs.pq_pack]]) computes every
    * subspace argmax of round₄(⟨x_m,c⟩ − ‖c‖²/2) with code-ascending
    * ties — the same key arithmetic the oracle replays — in place of
    * M·K unrolled expressions (whose per-plan janino compile, repeated
    * across the training jobs, dominated the gate's wall time). */
  def encode(en: DataFrame, cb: Codebook): DataFrame =
    en.select(col("vec_id"),
      Exprs.pq_pack(col("ne"), flatCb(cb), M, SUB, K).as("codes"))

  /** The per-subspace code columns, unpacked from the served form —
    * training reads this wide shape. */
  private[graft] def encodeWide(en: DataFrame, cb: Codebook): DataFrame =
    encode(en, cb).select(col("vec_id") +:
      (0 until M).map(m => unpack(col("codes"), m).as(s"code$m")): _*)

  /** Unpack subspace m's code from the packed BIGINT. */
  private[graft] def unpack(codes: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column =
    shiftright(codes, 4 * m).bitwiseAND(lit(15L)).cast("int")

  /** Lloyd refinement: encode, then recentre every (m, code) cell on
    * the exact-decimal mean of its members (empty cells keep their
    * previous centroid), float-quantized — collected per iteration so
    * step i+1 plans from literals (the kmeansCentroids pattern). */
  def trainCodebook(en: DataFrame, iters: Int = ITERS): Codebook = {
    var cb = seedCodebook(en)
    for (_ <- 1 to iters) {
      val coded = encodeWide(en, cb)
      val withSubs = en.join(coded, "vec_id")
      val stacked = withSubs.select(col("vec_id"), explode(array(
        (0 until M).map(m => struct(lit(m).as("m"), col(s"code$m").as("k"),
          slice(col("ne"), m * SUB + 1, SUB).as("sub"))): _*)).as("x"))
        .select(col("x.m").as("m"), col("x.k").as("k"),
          posexplode(col("x.sub")))
      val means = stacked.groupBy("m", "k", "pos")
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("v"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
        .map { case (mk, rows) =>
          mk -> rows.map(_._2).sortBy(_._1).map(_._2.toFloat).toVector
        }
      cb = (0 until M).map(m => (0 until K).map(k =>
        means.getOrElse((m, k), cb(m)(k)): IndexedSeq[Float]).toVector).toVector
    }
    cb
  }

  /** The full PQ pipeline: train, encode, ADC shortlist, exact re-rank. */
  def pqTopK(e: DataFrame, queries: Int = QUERIES,
      shortlist: Int = SHORTLIST, topK: Int = TOPK): DataFrame = {
    val en = normalized(e).localCheckpoint(true)
    val cb = trainCodebook(en)
    val codes = encode(en, cb).withColumnRenamed("vec_id", "neighbor_id")
    val qs = en.orderBy("vec_id").limit(queries)
      .select(col("vec_id").as("query_id"), col("ne").as("qn"))
    val pairs = codes.join(broadcast(qs),
      col("query_id") =!= col("neighbor_id"))
    val adc = Exprs.pq_adc(col("qn"), col("codes"), flatCb(cb), M, SUB, K)
    val short = Similarity.topKPerQueryLong(
      pairs.select(col("query_id"), col("neighbor_id"),
        adc.as("score")), shortlist)
      .select("query_id", "neighbor_id")
    // exact re-rank on the ORIGINAL vectors (q30's rounded-cosine
    // contract) — the only stage that touches floats post-encode
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

  /** ADC shortlist only (query_id, neighbor_id, integer score) — the
    * stage ScaleSpec pins recall and compression on. */
  private[graft] def adcShortlist(e: DataFrame,
      queries: Int = QUERIES, shortlist: Int = SHORTLIST): DataFrame = {
    val en = normalized(e).localCheckpoint(true)
    val cb = trainCodebook(en)
    val codes = encode(en, cb).withColumnRenamed("vec_id", "neighbor_id")
    val qs = en.orderBy("vec_id").limit(queries)
      .select(col("vec_id").as("query_id"), col("ne").as("qn"))
    val pairs = codes.join(broadcast(qs),
      col("query_id") =!= col("neighbor_id"))
    val adc = Exprs.pq_adc(col("qn"), col("codes"), flatCb(cb), M, SUB, K)
    Similarity.topKPerQueryLong(
      pairs.select(col("query_id"), col("neighbor_id"), adc.as("score")),
      shortlist)
  }

  /** One oracle Lloyd step: assignment rank on the rounded key, exact
    * decimal means per (m, code, pos), REAL-quantized recentre with
    * empty cells kept from the previous table (the q62 lloydStepSql
    * shape, per-subspace). */
  private[operators] def pqLloydSql(cin: String, asg: String, mean: String,
      cout: String): String =
    s"""$asg AS MATERIALIZED (
       |  SELECT vec_id, m, k AS code, sub FROM (
       |    SELECT en.vec_id, cb.m, cb.k,
       |      list_slice(en.ne, cb.m*$SUB+1, cb.m*$SUB+$SUB) AS sub,
       |      row_number() OVER (PARTITION BY en.vec_id, cb.m
       |        ORDER BY round(list_inner_product(list_slice(en.ne, cb.m*$SUB+1, cb.m*$SUB+$SUB), cb.cv)
       |                       - list_inner_product(cb.cv, cb.cv) / 2.0, 4) + 0.0 DESC, cb.k) AS rn
       |    FROM en, $cin cb) t WHERE rn = 1),
       |$mean AS MATERIALIZED (
       |  SELECT m, code AS k, p.pos,
       |    CAST(CAST(sum(CAST(sub[p.pos] AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS mv
       |  FROM $asg, (SELECT unnest(range(1, $SUB + 1)) AS pos) p
       |  GROUP BY 1, 2, 3),
       |$cout AS MATERIALIZED (
       |  SELECT prev.m, prev.k,
       |    coalesce(l.lv, prev.cv) AS cv
       |  FROM $cin prev LEFT JOIN (
       |    SELECT m, k, list_transform(list(mv ORDER BY pos),
       |      x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS lv
       |    FROM $mean GROUP BY 1, 2) l
       |  ON l.m = prev.m AND l.k = prev.k)""".stripMargin

  val q154 = Q.sql("q154_ann_pq",
    s"""WITH ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |en AS MATERIALIZED (
       |  SELECT vec_id, list_transform(emb,
       |    v -> CAST(CAST(v / sqrt(list_inner_product(emb, emb)) AS REAL) AS DOUBLE)) AS ne
       |  FROM ed),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, ne
       |  FROM (SELECT * FROM en ORDER BY vec_id LIMIT $K)),
       |ms AS (SELECT unnest(range(0, $M)) AS m),
       |cb0 AS MATERIALIZED (
       |  SELECT m, k, list_slice(ne, m*$SUB+1, m*$SUB+$SUB) AS cv FROM seeds, ms),
       |${pqLloydSql("cb0", "asg1", "mean1", "cb1")},
       |${pqLloydSql("cb1", "asg2", "mean2", "cb2")},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, k AS code FROM (
       |    SELECT en.vec_id, cb.m, cb.k,
       |      row_number() OVER (PARTITION BY en.vec_id, cb.m
       |        ORDER BY round(list_inner_product(list_slice(en.ne, cb.m*$SUB+1, cb.m*$SUB+$SUB), cb.cv)
       |                       - list_inner_product(cb.cv, cb.cv) / 2.0, 4) + 0.0 DESC, cb.k) AS rn
       |    FROM en, cb2 cb) t WHERE rn = 1),
       |queries AS (SELECT vec_id AS query_id, ne FROM en ORDER BY vec_id LIMIT $QUERIES),
       |adc AS MATERIALIZED (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(CAST(round(round(list_inner_product(list_slice(q.ne, c.m*$SUB+1, c.m*$SUB+$SUB), cb.cv), 4) * 10000) AS BIGINT)) AS BIGINT) AS score
       |  FROM queries q
       |  JOIN codes c ON q.query_id <> c.vec_id
       |  JOIN cb2 cb ON cb.m = c.m AND cb.k = c.code
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
       |  JOIN ed a ON a.vec_id = s.query_id
       |  JOIN ed b ON b.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM rerank) t WHERE rn <= $TOPK
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    pqTopK(Tables.embeddings(s, d))
  }

  val all: Seq[Q] = Seq(q154)
}
