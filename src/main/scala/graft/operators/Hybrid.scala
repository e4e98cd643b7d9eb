package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of a lexical BM25 list and a semantic cosine list over the same
  * corpus (documents.doc_id ≡ embeddings.vec_id). This is the standard
  * RAG retrieval shape: two rankers that fail differently, fused by
  * rank position only — no score calibration across rankers needed.
  *
  * Determinism: each list is ranked by its own exact key (BM25 integer
  * micros; rounded cosine with id tie-break), and the fused score is
  * the integer ⌊10⁹/(60+rank)⌋ summed over the lists a doc appears in —
  * all-integer, so DuckDB replays it bit-for-bit.
  *
  * Scale shape: each ranker keeps its own scale story (BM25: one token
  * shuffle + broadcast df; cosine: TakeOrderedAndProject over a
  * broadcast query — or any ANN route from Similarity, the fusion only
  * consumes (doc_id, rank)); fusion itself touches 2·topN rows per
  * query. Nothing about RRF sees a vector or a posting list.
  */
object Hybrid {

  /** RRF constant (Cormack et al.'s k = 60). */
  val RrfK = 60

  /** Per-list depth and fused cut used by the gate. */
  val ListDepth = 20
  val FusedTopK = 10

  /** Fuse ranked lists: input frames each carry (doc_id, rank) with
    * rank 1-based; output (doc_id, rrf, <name>_rank…) with absent-list
    * ranks as 0. */
  def rrfFuse(lists: Seq[(String, DataFrame)], topK: Int): DataFrame = {
    val tagged = lists.map { case (name, df) =>
      df.select(col("doc_id"),
        expr(s"1000000000 div ($RrfK + rank)").as("c"),
        lit(name).as("src"), col("rank"))
    }.reduce(_.unionByName(_))
    val rankCols = lists.map { case (name, _) =>
      max(when(col("src") === name, col("rank")).otherwise(0L))
        .cast("long").as(s"${name}_rank")
    }
    tagged.groupBy("doc_id")
      .agg(sum("c").cast("long").as("rrf"), rankCols: _*)
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Lexical list: BM25 top-N for the fixed terms, ranked on the exact
    * integer micros (window runs over ≤N already-selected rows). */
  private def lexList(documents: DataFrame, terms: Seq[String],
      depth: Int): DataFrame =
    Postings.bm25(documents, terms, depth)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank")

  /** Semantic list: rounded-cosine top-N of the query vector against
    * the corpus (self excluded), ranked sim DESC / id ASC. The brute
    * scorer here is the oracle-anchored form — swap in any Similarity
    * ANN route at scale, fusion only reads (doc_id, rank). */
  private def semList(e: DataFrame, queryId: Long, depth: Int): DataFrame = {
    val qv = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= queryId)
      .withColumn("sim", round(Exprs.cosine_sim(col("embedding"), col("qv")), 4))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(depth)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank"))
  }

  /** Gate query: fuse BM25(spark, table, fast) with cosine-to-doc-0. */
  private val Terms = Seq("spark", "table", "fast")
  private val QueryVec = 0L

  val q155 = Q.sql("q155_hybrid_rrf",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
       |  FROM documents),
       |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS n, CAST(sum(len) AS BIGINT) AS s FROM lens),
       |df AS (
       |  SELECT token, count(DISTINCT doc_id) AS df FROM toks
       |  WHERE token IN (${Terms.map("'" + _ + "'").mkString(",")}) GROUP BY 1),
       |tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM toks
       |  WHERE token IN (${Terms.map("'" + _ + "'").mkString(",")}) GROUP BY 1, 2),
       |t AS (
       |  SELECT tf.doc_id,
       |    CAST((CAST(2*n - 2*df + 1 AS HUGEINT) * 22 * s * tf * 1000000) //
       |         (CAST(2*df + 1 AS HUGEINT) *
       |          (CAST(10 AS HUGEINT)*s*tf + CAST(3 AS HUGEINT)*s
       |           + CAST(9 AS HUGEINT)*len*n)) AS BIGINT) AS term_micro
       |  FROM tf JOIN df USING (token) JOIN lens USING (doc_id) CROSS JOIN tot),
       |bm AS (SELECT doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
       |       FROM t GROUP BY 1),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r
       |  FROM bm ORDER BY score_micro DESC, doc_id LIMIT $ListDepth),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |qv AS (SELECT emb FROM e WHERE vec_id = $QueryVec),
       |sims AS (
       |  SELECT vec_id AS doc_id,
       |    round(list_cosine_similarity(e.emb, qv.emb), 4) + 0.0 AS sim
       |  FROM e, qv WHERE vec_id <> $QueryVec),
       |sem AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r
       |  FROM sims ORDER BY sim DESC, doc_id LIMIT $ListDepth),
       |contrib AS (
       |  SELECT doc_id, 1000000000 // ($RrfK + r) AS c, r AS lex_rank,
       |    CAST(0 AS BIGINT) AS sem_rank
       |  FROM lex
       |  UNION ALL
       |  SELECT doc_id, 1000000000 // ($RrfK + r), CAST(0 AS BIGINT), r FROM sem)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf,
       |  CAST(max(lex_rank) AS BIGINT) AS lex_rank,
       |  CAST(max(sem_rank) AS BIGINT) AS sem_rank
       |FROM contrib GROUP BY 1
       |ORDER BY rrf DESC, doc_id LIMIT $FusedTopK""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val e = Tables.embeddings(s, d)
    rrfFuse(Seq(
      "lex" -> lexList(docs, Terms, ListDepth),
      "sem" -> semList(e, QueryVec, ListDepth)), FusedTopK)
  }

  /** ColBERT-style late-interaction retrieval (Khattab & Zaharia's
    * MaxSim): instead of one dot product per (query, doc), each side
    * carries MULTIPLE vectors and the score is Σ over query vectors of
    * the max similarity to ANY doc vector — fine-grained term-level
    * matching that single-vector retrieval flattens away. Here each
    * 64-dim embedding stands in as 4 × 16-dim "token vectors" (the
    * fixture has no token embeddings; the slicing makes the MaxSim
    * machinery real while the vectors stay driver-generated).
    *
    * The 4×4 similarity grid is FULLY UNROLLED into one expression —
    * 16 integer qdots, 4 `greatest`, one sum — so scoring is a single
    * stateless codegen-friendly map over the pair stream with no
    * explode, and the oracle replays the identical integer expression.
    * Scale: the gate's pair table is the brute oracle anchor (q30's
    * precedent); production swaps in a candidate generator on the
    * pooled vector (the standard ColBERT two-stage serve). */
  val ColbertSlices = 4
  val ColbertDim = 16

  val q219 = Q.sql("q219_colbert_maxsim", {
    def dotSql(i: Int, j: Int): String = {
      val (qa, qb) = (i * ColbertDim + 1, (i + 1) * ColbertDim)
      val (da, db) = (j * ColbertDim + 1, (j + 1) * ColbertDim)
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(list_zip(q.qx[$qa:$qb], e.xq[$da:$db]),
         |                     z -> z[1] * z[2])), (x, y) -> x + y)""".stripMargin
    }
    val score = (0 until ColbertSlices).map { i =>
      "greatest(" + (0 until ColbertSlices).map(j => dotSql(i, j)).mkString(", ") + ")"
    }.mkString("\n      + ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, xq AS qx FROM e WHERE vec_id % 50 = 0),
       |p AS (
       |  SELECT q.qid, e.vec_id AS nb,
       |    $score AS score
       |  FROM q JOIN e ON e.vec_id <> q.qid)
       |SELECT qid AS vec_id, nb, score FROM (
       |  SELECT qid, nb, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nb) AS rn
       |  FROM p) WHERE rn <= 5
       |ORDER BY vec_id, score DESC, nb""".stripMargin
  }) { (s, d) =>
    val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    maxsimTopK(e, e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qx")))
  }

  /** q219's unrolled MaxSim scoring + top-5 over an arbitrary query
    * frame (qid, qx) — shared verbatim by the fraction anchor (q219)
    * and the fixed-panel form (q283). */
  private def maxsimTopK(e: org.apache.spark.sql.DataFrame,
      q: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dot(i: Int, j: Int) = graft.functions.Exprs.qdot(
      slice(col("qx"), i * ColbertDim + 1, ColbertDim),
      slice(col("embedding"), j * ColbertDim + 1, ColbertDim))
    val score = (0 until ColbertSlices).map { i =>
      greatest((0 until ColbertSlices).map(j => dot(i, j)): _*)
    }.reduce(_ + _)
    q.join(broadcast(e), col("vec_id") =!= col("qid"))
      .withColumn("score", score)
      .select(col("qid"), col("vec_id").as("nb"), col("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("nb"))))
      .filter(col("rn") <= 5)
      .select(col("qid").as("vec_id"), col("nb"), col("score"))
      .orderBy(col("vec_id"), col("score").desc, col("nb"))
  }

  /** The FIXED-PANEL form of the MaxSim evaluation (round-12 verdict
    * item #8): identical late-interaction scoring — [[maxsimTopK]],
    * the function q219 runs — over the [[EvalPanel]] query panel, so
    * the scored pair volume is K·N (linear) instead of N²/50. This is
    * the shape a ColBERT serving eval takes at 100 TB: a fixed query
    * workload MaxSim-scored against the (candidate-generated) corpus;
    * the gate scores against the full corpus because at fixture scale
    * the candidate stage would keep everything anyway. */
  val q283 = Q.sql("q283_colbert_maxsim_panel", {
    def dotSql(i: Int, j: Int): String = {
      val (qa, qb) = (i * ColbertDim + 1, (i + 1) * ColbertDim)
      val (da, db) = (j * ColbertDim + 1, (j + 1) * ColbertDim)
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(list_zip(q.qx[$qa:$qb], e.xq[$da:$db]),
         |                     z -> z[1] * z[2])), (x, y) -> x + y)""".stripMargin
    }
    val score = (0 until ColbertSlices).map { i =>
      "greatest(" + (0 until ColbertSlices).map(j => dotSql(i, j)).mkString(", ") + ")"
    }.mkString("\n      + ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |pnl AS MATERIALIZED (${EvalPanel.panelSql()}),
       |q AS (SELECT vec_id AS qid, xq AS qx FROM e JOIN pnl USING (vec_id)),
       |p AS (
       |  SELECT q.qid, e.vec_id AS nb,
       |    $score AS score
       |  FROM q JOIN e ON e.vec_id <> q.qid)
       |SELECT qid AS vec_id, nb, score FROM (
       |  SELECT qid, nb, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nb) AS rn
       |  FROM p) WHERE rn <= 5
       |ORDER BY vec_id, score DESC, nb""".stripMargin
  }) { (s, d) =>
    val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    maxsimTopK(e, e.join(broadcast(EvalPanel.panel(e)), "vec_id")
      .select(col("vec_id").as("qid"), col("embedding").as("qx")))
  }

  val all: Seq[Q] = Seq(q155, q219, q283)
}
