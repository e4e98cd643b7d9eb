package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (array<float> column, 64-dim).
  *
  * Baseline: brute-force cosine top-k — a block-nested self-join where
  * the cosine kernel is a custom codegen'd Catalyst expression
  * ([[Exprs.CosineSim]]), not a higher-order-function chain (HOFs don't
  * participate in whole-stage codegen; the custom expression keeps the
  * 25M-pair bench inside one codegen stage).
  *
  * Scale paths:
  *  - SRP-LSH: [[SRP_BITS]] (12) random-hyperplane sign bits → bucket
  *    join; q31 probes the home bucket only, q153 adds the 12
  *    one-bit-flip probes per query (multi-probe — recall is a superset
  *    by construction, pinned in ScaleSpec).
  *  - IVF: deterministic coarse centroids (first C vectors by id —
  *    k-means would need MLlib's nondeterministic init), assign each
  *    vector to nearest centroid, probe the query's 2 nearest lists.
  */
object Similarity {

  /** One ranked neighbor: the output element of [[TopKSim]]. */
  case class Hit(neighbor_id: Long, sim: Double)

  /** Bounded-heap top-k aggregator over (sim, neighbor_id) pairs —
    * the scale replacement for `row_number() OVER (PARTITION BY
    * query_id)` on the candidate-pair stream. The window form shuffles
    * EVERY pair row (25M at sf0.1 brute force) to sort-and-discard;
    * this aggregator is mergeable, so partial aggregation keeps at most
    * k rows per (query, partition) map-side and the exchange carries
    * k·partitions rows per query instead of the full pair stream.
    *
    * Ordering matches the oracle's rank: sim DESC (already rounded by
    * the caller), neighbor_id ASC tie-break. Neighbors are deduped
    * inside the buffer (same (query, neighbor) always carries the same
    * rounded sim), mirroring the oracle's DISTINCT-before-rank. */
  class TopKSim(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), Seq[(Double, Long)], Seq[Hit]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.distinctBy(_._2).sortWith(better).take(k)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)],
        x: (Double, Long)): Seq[(Double, Long)] =
      if (b.size == k && better(b.last, x)) b else trim(b :+ x)
    override def merge(a: Seq[(Double, Long)],
        b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(a ++ b)
    override def finish(b: Seq[(Double, Long)]): Seq[Hit] =
      b.map { case (s, n) => Hit(n, s) }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }

  /** One ranked neighbor with an exact integer score: the output
    * element of [[TopKSimLong]]. */
  case class LongHit(neighbor_id: Long, score: Long)

  /** [[TopKSim]] over exact Long scores — for rankings whose key is an
    * integer (BM25 micros): no double round-trip, so the selection
    * order is the integer order by construction at ANY magnitude, not
    * just below 2^53. Same mergeable bounded-buffer shape. */
  class TopKSimLong(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Seq[(Long, Long)], Seq[LongHit]] {
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      s.distinctBy(_._2).sortWith(better).take(k)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Long, Long)],
        x: (Long, Long)): Seq[(Long, Long)] =
      if (b.size == k && better(b.last, x)) b else trim(b :+ x)
    override def merge(a: Seq[(Long, Long)],
        b: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(a ++ b)
    override def finish(b: Seq[(Long, Long)]): Seq[LongHit] =
      b.map { case (s, n) => LongHit(n, s) }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[LongHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LongHit]]()
  }

  /** Top-k per query on an exact integer score column — the Long twin
    * of [[topKPerQuery]]. Input: (query_id, neighbor_id, score: Long). */
  private[operators] def topKPerQueryLong(pairs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopKSimLong(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    pairs.groupBy("query_id")
      .agg(agg(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("h"))
      .select(col("query_id"), col("h.neighbor_id").as("neighbor_id"),
        col("h.score").as("score"))
  }

  /** [[topKPerQueryLong]] with the 1-based rank materialized via
    * posexplode — the heap's `trim` keeps the buffer sorted
    * best-first ((score desc, neighbor_id asc), the row_number
    * ordering), so position+1 IS the rank and no window runs at all:
    * the pair stream partial-aggregates map-side to ≤k-element heaps
    * and only those cross the exchange (q291/q292's tail — at corpus
    * scale the scored candidate stream never shuffles row-wise). */
  private[graft] def topKPerQueryLongRanked(
      pairs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopKSimLong(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    pairs.groupBy("query_id")
      .agg(agg(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"),
        posexplode(col("top")).as(Seq("pos", "h")))
      .select(col("query_id"), col("h.neighbor_id").as("neighbor_id"),
        col("h.score").as("score"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Top-k rows per query from a (query_id, neighbor_id, sim) pair
    * stream via [[TopKSim]] — one partial-aggregated exchange, no
    * window sort over the pairs. */
  private[operators] def topKPerQuery(pairs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopKSim(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    pairs.groupBy("query_id")
      .agg(agg(col("sim"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("h"))
      .select(col("query_id"), col("h.neighbor_id").as("neighbor_id"),
        col("h.sim").as("sim"))
  }

  /** Brute-force cosine top-5 per query vector. Oracle: DuckDB
    * list_cosine_similarity (double accumulation, same fold order).
    * Ranking happens on the ROUNDED similarity with id tie-break so both
    * engines rank identically.
    */
  val q30 = Q.sql("q30_cosine_topk",
    """WITH pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
      |SELECT query_id, neighbor_id, sim FROM (
      |  SELECT query_id, neighbor_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
      |  FROM pairs) t
      |WHERE rn <= 5
      |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    // single-split parquet: spread the probe side across all cores
    val a = e.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("query_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
    val pairs = a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, 5)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** Embedding-cosine near-dup ranking: the most-similar vector pairs
    * (the dedup-by-embedding shape; this corpus has no pairs above ~0.5
    * cosine, so the operator surfaces the top of the ranking rather than
    * a thresholded set — same plan, thresholding is a filter swap). */
  val q29 = Q.sql("q29_embedding_neardup",
    """WITH pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, sim FROM pairs
      |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val a = e.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Exprs.cosine_sim(col("va"), col("vb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  /** BRUTE-FORCE hard-negative mining — the ORACLE-ANCHORED REFERENCE
    * formulation, not the production path. For every vector, the k most
    * cosine-similar vectors carrying a DIFFERENT label (the contrastive
    * hard-negative pair set). The plan is an exhaustive broadcast
    * nested-loop self-join (like [[q30]]'s brute baseline: codegen
    * cosine kernel, mergeable [[TopKSim]] — no window over the pair
    * stream) plus one label inequality in the join condition. That is
    * O(n²) by construction and exists only so DuckDB can replay it
    * exactly; it is excluded from the 5× sweep for the same reason
    * (SWEEP_r9). **The deployable 100 TB form is [[q152]]**: the same
    * label filter applied pre-rank over IVF probe-routed candidates —
    * ScaleSpec pins its candidate count ≪ all-pairs. */
  def hardNegatives(e: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val a = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id").as("query_id"), col("embedding").as("va"),
        col("label").as("la"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"),
      col("label").as("lb"))
    val pairs = a.join(broadcast(b),
      col("query_id") =!= col("neighbor_id") && col("la") =!= col("lb"))
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, k)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** Top-2 hard negatives per vector, brute reference only (see
    * [[hardNegatives]]); the oracle replays the exhaustive ranking with
    * the label-inequality predicate. Production path: [[q152]]. */
  val q150 = Q.sql("q150_hard_negatives",
    """WITH pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS sim
      |  FROM embeddings a JOIN embeddings b
      |    ON a.vec_id <> b.vec_id AND a.label <> b.label)
      |SELECT query_id, neighbor_id, sim FROM (
      |  SELECT query_id, neighbor_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
      |  FROM pairs) t
      |WHERE rn <= 2
      |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    hardNegatives(Tables.embeddings(s, d), k = 2)
  }

  private val SRP_BITS = 12
  private val DIM = 64

  /** Deterministic Rademacher (±1) hyperplanes, seed fixed — generated
    * on the driver, broadcast as a literal (KBs). The first 12 planes of
    * a longer request equal `srpPlanes(12)` (one sequential boolean
    * stream), so q31's inlined oracle is stable as other callers ask for
    * more bits. */
  private[operators] def srpPlanes(n: Int = SRP_BITS): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(Seq.fill(DIM)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** The same planes inlined into DuckDB SQL so the oracle reproduces the
    * bucketing bit-for-bit: ±1 entries are exact in double, and both
    * engines accumulate the dot product left-to-right in double, so the
    * sign test agrees (a tie at exactly 0.0 is the only hazard and is
    * measure-zero for real-valued embeddings). */
  private def srpPlanesSql(n: Int = SRP_BITS): String =
    srpPlanes(n).zipWithIndex.map { case (p, i) =>
      s"($i, CAST([${p.map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n  ")

  /** SRP-LSH bucketed ANN: 12 sign bits → bucket; exact cosine re-rank
    * within bucket; top-3 per query. Oracled: the hyperplanes are inlined
    * into the SQL as literals. */
  val q31 = Q.sql("q31_ann_srp_lsh",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |planes(bit, w) AS (VALUES
       |  ${srpPlanesSql()}),
       |b AS (
       |  SELECT e.vec_id, e.emb,
       |    CAST(sum(CASE WHEN list_inner_product(e.emb, p.w) >= 0
       |             THEN 1 << (${SRP_BITS - 1} - p.bit) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.emb),
       |pairs AS (
       |  SELECT a.vec_id AS query_id, bb.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(a.emb, bb.emb), 4) + 0.0 AS sim
       |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val planes = typedlit(srpPlanes())
    val e = Tables.embeddings(s, d)
      .withColumn("bucket",
        aggregate(
          sequence(lit(0), lit(SRP_BITS - 1)),
          lit(0L),
          (acc, i) => acc * 2 + when(
            Exprs.dot_f(col("embedding"), element_at(planes, i + lit(1))) >= 0, 1L
          ).otherwise(0L)))
    val a = e.select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("va"))
    val b = e.select(col("bucket"), col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, 3)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** Multi-probe SRP-LSH: q31's single-bucket probe misses any true
    * neighbor that lands one sign-bit away; here each QUERY additionally
    * probes the [[SRP_BITS]] one-bit-flip buckets (the classic
    * multi-probe extension — perturb the hash, not the index), while
    * neighbors stay indexed once at their own bucket. Candidate cost is
    * bits+1 probes per query — at 100 TB that is a fan-out knob, not a
    * second index — and every probed (query, neighbor) pair is produced
    * exactly once (flip buckets are pairwise distinct and never equal
    * the home bucket), so no dedup pass precedes the exact rerank. */
  val q153 = Q.sql("q153_ann_srp_multiprobe",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |planes(bit, w) AS (VALUES
       |  ${srpPlanesSql()}),
       |b AS (
       |  SELECT e.vec_id, e.emb,
       |    CAST(sum(CASE WHEN list_inner_product(e.emb, p.w) >= 0
       |             THEN 1 << (${SRP_BITS - 1} - p.bit) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.emb),
       |probes AS (
       |  SELECT vec_id AS query_id, emb AS qemb, bucket AS pbucket FROM b
       |  UNION ALL
       |  SELECT vec_id, emb, xor(bucket, CAST(1 AS BIGINT) << j.j)
       |  FROM b CROSS JOIN range(0, $SRP_BITS) j(j)),
       |pairs AS (
       |  SELECT p.query_id, n.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(p.qemb, n.emb), 4) + 0.0 AS sim
       |  FROM probes p JOIN b n ON p.pbucket = n.bucket AND p.query_id <> n.vec_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val planes = typedlit(srpPlanes())
    val e = Tables.embeddings(s, d)
      .withColumn("bucket",
        aggregate(
          sequence(lit(0), lit(SRP_BITS - 1)),
          lit(0L),
          (acc, i) => acc * 2 + when(
            Exprs.dot_f(col("embedding"), element_at(planes, i + lit(1))) >= 0, 1L
          ).otherwise(0L)))
      // signature table computed ONCE (24 dot products per vector);
      // the probe explode and the neighbor side both read it
      .localCheckpoint(true)
    val b = e.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("vb"))
    val probes = e
      .select(col("vec_id").as("query_id"), col("embedding").as("va"),
        explode(expr(
          s"concat(array(bucket), transform(sequence(0, ${SRP_BITS - 1}), " +
            "j -> bucket ^ shiftleft(cast(1 as bigint), j)))")).as("bucket"))
    val pairs = probes.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, 3)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  private[graft] val IVF_LISTS = 16
  private[graft] val IVF_PROBES = 2

  /** IVF-style ANN: coarse quantize to the nearest of 16 deterministic
    * centroids (first 16 vectors by id), probe the 2 nearest lists.
    * Assignment ranks on the ROUNDED similarity with cent_id tie-break
    * (Q determinism rules) so the oracle quantizes identically. */
  /** Deterministic k-means refinement of the IVF coarse quantizer: init =
    * first k vectors by id (exactly q32's centroids), then `iters` Lloyd
    * steps with cosine assignment. Determinism: assignment ranks on the
    * ROUNDED similarity with cent_id tie-break (Q rules) and the per-
    * dimension means accumulate as DECIMAL (order-independent exact)
    * before the final cast back to float — the refinement reproduces
    * bit-for-bit run-to-run, unlike MLlib's seeded-sample init. Empty
    * clusters drop out (the list count may shrink below k). */
  def kmeansCentroids(e: org.apache.spark.sql.DataFrame,
      k: Int = IVF_LISTS, iters: Int = 2,
      assignHof: Boolean = false): org.apache.spark.sql.DataFrame = {
    val spark = e.sparkSession
    var cents = localCents(e.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")))
    for (_ <- 1 to iters) {
      // assignment is the map-side literal argmax — no join, no window —
      // and the ≤k×64-float result of each step is COLLECTED before the
      // next, so iteration i's plan starts from a literal centroid table
      // instead of re-executing iteration i−1's assignment lazily.
      // assignHof swaps in the constant-codegen-size HOF form (identical
      // ranking by construction — EngineSpec pins the two forms
      // row-for-row equal) for DERIVED k, where the literal form's
      // generated code would grow past the JIT/64KB cliff
      val assignFn = if (assignHof) ivfAssignHof _ else ivfAssign _
      val assigned = assignFn(e.select(col("vec_id"), col("embedding")),
        cents, "vec_id", "embedding", "cent_id", 1)
      cents = localCents(assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy("cent_id", "pos")
        // exact decimal sum (order-independent), THEN one double
        // division: engines' decimal-division scale rules differ, but
        // cast-exact-sum-to-double + IEEE divide is bit-identical
        // everywhere — this is what lets q62's oracle replay the
        // refinement (two unrolled Lloyd steps in SQL)
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("v"))
        .groupBy("cent_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("cent_id"),
          transform(col("pv"), x => x.getField("v").cast("float")).as("cvec")))
    }
    centsDf(spark, cents)
  }

  /** Collect a (cent_id, cvec) frame to the driver — ≤ IVF_LISTS rows of
    * 64 floats, the bounded-materialization pattern the rest of the
    * codebase uses for lookup tables. Sorted by cent_id so downstream
    * literal construction is order-stable. */
  private[graft] def localCents(
      cents: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Float])] =
    cents.select(col("cent_id"), col("cvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .sortBy(_._1).toVector

  /** A driver-held centroid table back as a DataFrame (LocalRelation —
    * free to re-read, nothing to re-execute). */
  private[operators] def centsDf(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Long, Seq[Float])]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    cents.toDF("cent_id", "cvec")
      .select(col("cent_id"), col("cvec").cast("array<float>").as("cvec"))
  }

  /** THE nearest-centroid assignment idiom — rounded-cosine rank with
    * cent_id tie-break against the (≤16-row) centroid table, inlined as
    * LITERALS into a per-row expression: build the array of
    * (round(cos,4), −cent_id) structs, `sort_array` descending
    * (lexicographic struct order = sim DESC, cent_id ASC — exactly the
    * oracle's `ORDER BY sim DESC, cent_id`), slice the top `keep`. Pure
    * projection: no join, no Exchange, no Sort in the plan — the
    * row_number-window form this replaces shuffled the full n×C
    * cross-join to keep 1–2 rows per vector, the dominant exchange of
    * q32/q62/q139 at scale. One shared implementation on purpose:
    * q32's oracle, q62's Lloyd replay, and q139's served-equals-in-memory
    * contract all depend on this exact rounding + tie-break; a second
    * copy drifting by one detail would break them silently.
    * (Spark's round never produces −0.0 — it rounds through BigDecimal,
    * which has no signed zero — so the DESC double compare and the
    * oracle's agree on ties.) */
  private[graft] def ivfAssign(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], idCol: String,
      vecCol: String, outCol: String, keep: Int): org.apache.spark.sql.DataFrame = {
    val cands = array(cents.map { case (cid, cv) =>
      struct(
        round(Exprs.cosine_sim(col(vecCol), typedlit(cv)), 4).as("csim"),
        lit(-cid).as("negid"))
    }: _*)
    // pass every input column through (not just id + vector): callers
    // like the routed hard-negative miner ride labels alongside
    df.select(col("*"),
        explode(slice(sort_array(cands, asc = false), 1, keep)).as("cand"))
      .withColumn(outCol, -col("cand.negid"))
      .drop("cand")
  }

  /** [[ivfAssign]] with the rank EXPOSED: posexplode of the same
    * sorted slice, emitting `crn` = 1-based centroid rank alongside
    * `outCol`. Exists so self-IVF pipelines (queries and corpus are
    * the SAME table) can run the C-cosine assignment ONCE at
    * keep = probes and derive BOTH sides — nlist = crn 1 rows,
    * probe list = all rows — exactly how every IVF oracle's single
    * `asg` CTE feeds its `nlist`/`qlist` filters (r15 optimization:
    * the two-call form scanned the corpus and paid the C cosines
    * twice per gate; guide §1.2 "don't compute things twice"). Rank
    * semantics identical to [[ivfAssign]] by construction — same
    * struct sort, slice position = rank. */
  private[graft] def ivfAssignRanked(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], idCol: String,
      vecCol: String, outCol: String, keep: Int): org.apache.spark.sql.DataFrame = {
    val cands = array(cents.map { case (cid, cv) =>
      struct(
        round(Exprs.cosine_sim(col(vecCol), typedlit(cv)), 4).as("csim"),
        lit(-cid).as("negid"))
    }: _*)
    df.select(col("*"),
        posexplode(slice(sort_array(cands, asc = false), 1, keep)))
      .withColumn(outCol, -col("col.negid"))
      .withColumn("crn", (col("pos") + 1).cast("int"))
      .drop("col", "pos")
  }

  /** The IVF probe pipeline over a given centroid table: assign every
    * vector to its nearest list, probe each query's `probes` nearest
    * lists, exact cosine re-rank, top-`topK` per query.
    *
    * Queries and corpus are the same table, so the assignment runs
    * ONCE ([[ivfAssignRanked]] at keep = probes, localCheckpointed so
    * both join sides read the materialized blocks instead of
    * re-executing the C-cosine projection per side — one corpus scan
    * where the old two-[[ivfAssign]] form paid two). The checkpoint is
    * SLIM — (vec_id, lst, crn), the IvfPq 12 B/row discipline (r16):
    * the r15 form stored every corpus VECTOR probes× in executor block
    * storage, a §5 spill hazard at scale; vectors re-attach from the
    * (column-pruned, broadcastable) base scan inside
    * [[ivfTopKFromRanked]] BEFORE the candidate join, so the candidate
    * stream itself still never shuffles. */
  def ivfTopK(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      probes: Int = IVF_PROBES, topK: Int = 3): org.apache.spark.sql.DataFrame = {
    val centArr = localCents(cents) // one ≤16-row collect, shared by both sides
    val asg = ivfAssignRanked(
      e.select(col("vec_id"), col("embedding")),
      centArr, "vec_id", "embedding", "lst", probes)
      .select("vec_id", "lst", "crn")
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    ivfTopKFromRanked(asg, e, topK)
  }

  /** The probe/rerank tail over a precomputed SLIM ranked
    * self-assignment (`vec_id`, `lst`, `crn` with crn ≤ probes): nlist
    * = the crn 1 rows, probe stream = every row — the oracle's
    * `nlist`/`qlist` filters over one shared `asg` CTE. Vectors attach
    * from `e` (unique vec_id ⇒ row-preserving joins) BEFORE the
    * list-key join so the scored candidate stream is produced and
    * heap-reduced in-stage, never shuffled. Callers that evaluate
    * SEVERAL probe settings (q245's recall curve) pass
    * `asg.filter(crn <= p)` and pay the assignment once total. */
  private[operators] def ivfTopKFromRanked(
      asg: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val assigned = asg.filter(col("crn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("lst").as("nlist"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vb")), "neighbor_id")
    val qprobes = asg
      .select(col("vec_id").as("query_id"), col("lst").as("qlist"))
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("va")), "query_id")
    // TopKSim dedupes neighbors inside the buffer, so the multi-probe
    // stream needs no separate dropDuplicates pass
    val pairs = qprobes.join(assigned, col("qlist") === col("nlist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, topK)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  val q32 = Q.sql("q32_ann_ivf",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT $IVF_LISTS),
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN cents c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |qlist AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg WHERE crn <= $IVF_PROBES),
       |scored AS (
       |  SELECT DISTINCT q.query_id, n.neighbor_id,
       |    round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
       |  FROM qlist q JOIN nlist n USING (lst)
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN e ne ON ne.vec_id = n.neighbor_id
       |  WHERE q.query_id <> n.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    // centroid table: tiny, broadcast into both assignment passes
    val cents = e.orderBy("vec_id").limit(IVF_LISTS)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    ivfTopK(e, cents)
  }

  /** One Lloyd step in DuckDB SQL: assign every vector to its nearest
    * centroid in `cin` (rounded-sim rank, cent_id tie-break — the Q
    * determinism rules), then per-dimension means as exact
    * DECIMAL(28,12) sums cast to double, divided, and squeezed through
    * REAL — the bit-identical replay of [[kmeansCentroids]]'s step. */
  private[operators] def lloydStepSql(cin: String, asg: String, m: String,
      cout: String): String =
    s"""$asg AS (
       |  SELECT e.vec_id, c.cent_id, e.emb,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN $cin c),
       |$m AS (
       |  SELECT cent_id, r.i AS pos,
       |    CAST(CAST(sum(CAST(emb[r.i] AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) / count(*) AS v
       |  FROM $asg, range(1, $DIM + 1) r(i) WHERE crn = 1
       |  GROUP BY cent_id, r.i),
       |$cout AS (
       |  SELECT cent_id,
       |    list_transform(list(v ORDER BY pos),
       |      x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS cvec
       |  FROM $m GROUP BY cent_id)""".stripMargin

  /** IVF with the k-means-refined quantizer: same probe pipeline as q32
    * over Lloyd-refined centroids. Fully oracled: the two Lloyd steps
    * unroll into plain CTEs (assignment rank → exact decimal means →
    * REAL-rounded centroids, twice), then q32's probe/rerank tail runs
    * over the refined table — so quantizer drift, mean-accumulation
    * drift, and probe changes all hash-mismatch. EngineSpec additionally
    * measures recall@3 against brute force. */
  val q62 = Q.sql("q62_ann_ivf_kmeans",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT $IVF_LISTS),
       |${lloydStepSql("c0", "a1", "m1", "c1")},
       |${lloydStepSql("c1", "a2", "m2", "c2")},
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN c2 c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |qlist AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg WHERE crn <= $IVF_PROBES),
       |scored AS (
       |  SELECT DISTINCT q.query_id, n.neighbor_id,
       |    round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
       |  FROM qlist q JOIN nlist n USING (lst)
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN e ne ON ne.vec_id = n.neighbor_id
       |  WHERE q.query_id <> n.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    ivfTopK(e, kmeansCentroids(e))
  }

  /** Ceiling on [[autoNlist]] — bounds the driver-side centroid collect
    * (the BroadcastRankCap discipline, Graph.scala): 65 536 centroids ×
    * 64 floats ≈ 17 MB, still comfortably broadcastable; √N only
    * reaches the cap past N ≈ 4.3·10⁹ vectors, where a single flat IVF
    * gives way to a hierarchical coarse quantizer anyway. The oracle
    * applies the identical least/greatest clamp, so the geometry
    * formula replays exactly at any N. */
  private[operators] val AUTO_NLIST_CAP = 65536

  /** N-scaled IVF list count: nlist = clamp(⌈√N⌉, [[IVF_LISTS]],
    * [[AUTO_NLIST_CAP]]) — the standard IVF sizing rule (per-list
    * occupancy √N, probe cost probes·√N). Both engines compute it from
    * the same count through IEEE sqrt/ceil, so the geometry is
    * derived, not pinned. */
  private[graft] def autoNlist(n: Long): Int =
    math.min(AUTO_NLIST_CAP.toLong, math.max(IVF_LISTS.toLong,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** [[ivfAssign]]'s HOF twin for LARGE centroid tables: the same
    * rounded-cosine rank + cent_id tie-break, but the centroid table
    * rides as ONE array literal walked by `transform` instead of C
    * inlined expressions — generated code size is CONSTANT in C, where
    * the literal form's whole-stage code grows linearly and falls off
    * the JIT/64KB cliff around a few hundred lists. The trade: HOF
    * lambdas evaluate interpreted (one boxed kernel call per centroid
    * per row), and slice(sort_array) is O(C log C) per row — both fine
    * up to the cap, where candidates dominate cost anyway. Identical
    * ranking semantics to [[ivfAssign]] by construction (same struct
    * sort; EngineSpec pins the two assignment forms row-for-row equal
    * on the same centroid table). */
  private[graft] def ivfAssignHof(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], idCol: String,
      vecCol: String, outCol: String, keep: Int): org.apache.spark.sql.DataFrame = {
    val table = typedlit(cents.map { case (cid, cv) => (-cid, cv) })
    val ranked = transform(table, c =>
      struct(
        round(Exprs.cosine_sim(col(vecCol), c.getField("_2")), 4).as("csim"),
        c.getField("_1").as("negid")))
    // keep=1 — the ASSIGNMENT pass, the hot path at derived k (every
    // Lloyd iteration plus the final pass run it over the whole corpus):
    // array_max is one O(C) scan per row where slice(sort_array) pays
    // O(C log C). Identical semantics: struct max = lexicographic
    // (csim, negid) max = highest sim, ties to highest negid = LOWEST
    // cent_id — exactly sort-desc-take-1 (EngineSpec pins the HOF and
    // literal forms row-for-row equal, which covers this branch).
    // cents.nonEmpty guard: on an EMPTY centroid table the explode
    // branch drops every row where array_max would keep them with a
    // null assignment — unreachable via kmeansCentroids, but the
    // identical-by-construction claim must hold on the degenerate
    // input too (r14 advice)
    if (keep == 1 && cents.nonEmpty)
      df.select(col("*"), array_max(ranked).as("cand"))
        .withColumn(outCol, -col("cand.negid"))
        .drop("cand")
    else
      df.select(col("*"),
          explode(slice(sort_array(ranked, asc = false), 1, keep)).as("cand"))
        .withColumn(outCol, -col("cand.negid"))
        .drop("cand")
  }

  /** [[ivfAssignHof]] with the rank exposed (posexplode, `crn` =
    * 1-based) — the constant-codegen-size twin of [[ivfAssignRanked]],
    * for self-IVF pipelines over LARGE derived centroid tables. The
    * keep = 1 array_max fast path doesn't apply (rank > 1 rows are the
    * point), but the single shared pass replaces TWO per-row rankings,
    * which is strictly less work than the old pair of calls
    * (O(C log C) once vs O(C) + O(C log C)). */
  private[graft] def ivfAssignHofRanked(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], idCol: String,
      vecCol: String, outCol: String, keep: Int): org.apache.spark.sql.DataFrame = {
    val table = typedlit(cents.map { case (cid, cv) => (-cid, cv) })
    val ranked = transform(table, c =>
      struct(
        round(Exprs.cosine_sim(col(vecCol), c.getField("_2")), 4).as("csim"),
        c.getField("_1").as("negid")))
    df.select(col("*"),
        posexplode(slice(sort_array(ranked, asc = false), 1, keep)))
      .withColumn(outCol, -col("col.negid"))
      .withColumn("crn", (col("pos") + 1).cast("int"))
      .drop("col", "pos")
  }

  /** The q32 probe pipeline over an auto-sized geometry via
    * [[ivfAssignHofRanked]] — assignment and probing stay pure
    * projections at any list count, and (queries = corpus) the ranking
    * runs ONCE at keep = probes, checkpointed SLIM for both join sides
    * (same single-pass + vector-free-checkpoint rationale as
    * [[ivfTopK]]; the shared [[ivfTopKFromRanked]] tail re-attaches
    * the vectors from `e`). */
  def ivfTopKAuto(e: org.apache.spark.sql.DataFrame,
      centArr: Seq[(Long, Seq[Float])],
      probes: Int = IVF_PROBES, topK: Int = 3): org.apache.spark.sql.DataFrame = {
    val asg = ivfAssignHofRanked(
      e.select(col("vec_id"), col("embedding")),
      centArr, "vec_id", "embedding", "lst", probes)
      .select("vec_id", "lst", "crn")
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    ivfTopKFromRanked(asg, e, topK)
  }

  /** Auto-sized routed candidate volume — the quantity the q281
    * ScaleSpec pins: with nlist ∝ √N the per-query candidate list stays
    * ~probes·√N, so total candidates grow ~2·N^1.5 instead of the
    * pinned-geometry N²·probes/C. Exposed for the growth test. */
  def autoIvfCandidateCount(e: org.apache.spark.sql.DataFrame): Long = {
    val cents = localCents(e.orderBy("vec_id").limit(autoNlist(e.count()))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")))
    val asg = ivfAssignHof(
      e.select(col("vec_id").as("nb"), col("embedding").as("vb")),
      cents, "nb", "vb", "lst", 1).select("nb", "lst")
    val prb = ivfAssignHof(
      e.select(col("vec_id").as("qid"), col("embedding").as("va")),
      cents, "qid", "va", "lst", IVF_PROBES).select("qid", "lst")
    prb.join(asg, "lst").filter(col("qid") =!= col("nb")).count()
  }

  /** IVF with N-SCALED geometry (round-12 verdict item #2): q32's exact
    * probe/rerank pipeline, but nlist is DERIVED from the corpus size
    * by [[autoNlist]] instead of pinned at 16 — the one knob that kept
    * every pinned-geometry IVF gate in the 5×-sweep's class B
    * (candidates N²/C at fixed C). Here 5× data grows the list count
    * √5× and candidate volume ~N^1.5 (ScaleSpec pins the growth
    * exponent; the pinned-16 gates stay as oracle anchors). The oracle
    * computes the SAME nlist formula from its own count(*) —
    * `least(cap, greatest(16, ceil(sqrt(N))))` — and takes the first
    * nlist vectors by vec_id as centroids, so the derived geometry
    * replays bit-for-bit at every scale factor and sweep replica. */
  val q281 = Q.sql("q281_ann_ivf_autonlist",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |nl AS (SELECT least($AUTO_NLIST_CAP, greatest($IVF_LISTS,
       |         CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS nlists
       |       FROM e),
       |cents AS (
       |  SELECT cent_id, cvec FROM (
       |    SELECT vec_id AS cent_id, emb AS cvec,
       |      row_number() OVER (ORDER BY vec_id) AS rn FROM e) t
       |  CROSS JOIN nl WHERE t.rn <= nl.nlists),
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN cents c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |qlist AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg WHERE crn <= $IVF_PROBES),
       |scored AS (
       |  SELECT DISTINCT q.query_id, n.neighbor_id,
       |    round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
       |  FROM qlist q JOIN nlist n USING (lst)
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN e ne ON ne.vec_id = n.neighbor_id
       |  WHERE q.query_id <> n.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val nl = autoNlist(e.count())
    val cents = localCents(e.orderBy("vec_id").limit(nl)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")))
    ivfTopKAuto(e, cents)
  }

  private val SEM_BITS = 24
  private val SEM_BAND_BITS = 3 // 8 bands × 3 bits

  /** Banded-SRP candidate generation for semantic dedup: 24 sign bits
    * split into 8 bands of 3; vectors sharing any band's bucket are
    * candidates (MinHash-LSH banding applied to SRP signatures). The
    * banded frame carries (vec_id, band, bucket) ONLY — embeddings are
    * joined back just for the exact-threshold rerank, so the bucket
    * shuffle moves 24 bytes per (vector, band), never the vectors.
    *
    * Production sizing: bits-per-band grows with log₂(n) (≈16 at 10⁹
    * vectors, keeping per-bucket occupancy O(1)) and band count sets
    * recall (4 bands × 16 bits ≈ 0.86 recall at 0.9 cosine). The 3-bit
    * bands here match the 500-vector fixture; the shape — band explode,
    * bucket join, distinct, rerank — is the 100 TB plan. */
  def semanticDedupDecisions(spark: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame, threshold: Double): org.apache.spark.sql.DataFrame = {
    val nBands = SEM_BITS / SEM_BAND_BITS
    val planes = typedlit(srpPlanes(SEM_BITS))
    val banded = e
      .withColumn("bits", transform(sequence(lit(0), lit(SEM_BITS - 1)),
        i => when(Exprs.dot_f(col("embedding"), element_at(planes, i + lit(1))) >= 0, 1L)
          .otherwise(0L)))
      .select(col("vec_id"), explode(sequence(lit(0), lit(nBands - 1))).as("band"),
        col("bits"))
      .withColumn("bucket",
        aggregate(sequence(lit(0), lit(SEM_BAND_BITS - 1)), lit(0L),
          (acc, j) => acc * 2 + element_at(col("bits"), col("band") * SEM_BAND_BITS + j + lit(1))))
      .select("vec_id", "band", "bucket")
      // materialize the signature table once — the self-join below would
      // otherwise recompute every vector's 24 dot products on BOTH sides;
      // the table is 24 bytes per (vector, band), far smaller than the
      // embeddings it replaces
      .localCheckpoint(true)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val ea = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = cand.join(ea, "id_a").join(eb, "id_b")
      .filter(round(Exprs.cosine_sim(col("va"), col("vb")), 4) >= threshold)
      .select("id_a", "id_b")
    val comps = DedupClusters.connectedComponents(spark, pairs)
    e.select(col("vec_id"))
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("component", coalesce(col("label"), col("vec_id")))
      .withColumn("keep", col("component") === col("vec_id"))
      .select("vec_id", "component", "keep")
  }

  /** Semantic (embedding-space) dedup decisions at cosine ≥ 0.4: banded
    * SRP candidates → exact rounded-cosine threshold → connected
    * components → keep = min vec_id per component. Oracle replicates the
    * banding (planes inlined) and the components as an EXACT
    * reachability closure (recursive UNION-dedup fixpoint — a
    * round-BOUNDED label propagation under-merges any component whose
    * diameter exceeds the bound, which sf0.1's sprawling 0.4-threshold
    * graph actually does; the closure is diameter-independent).
    * ORACLE COST NOTE: the `lp` fixpoint materializes one row per
    * (node, reachable-node) pair — O(Σ component-size²) working set.
    * Fine at the swept SFs (sf0.1's largest component is small); a
    * denser corpus or lower threshold at a larger SF would need the
    * contraction form instead (carry only min-label-so-far per node,
    * i.e. `SELECT id, min(label) ... GROUP BY id` inside the recursion
    * via DuckDB's USING KEY), which is linear per round but
    * round-bounded by diameter. The ENGINE side has no such quadratic
    * term — this is a test-oracle trade only. */
  val q74 = Q.sql("q74_semantic_dedup",
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |planes(bit, w) AS (VALUES
       |  ${srpPlanesSql(SEM_BITS)}),
       |b AS (
       |  SELECT e.vec_id, p.bit // $SEM_BAND_BITS AS band,
       |    CAST(sum(CASE WHEN list_inner_product(e.emb, p.w) >= 0
       |             THEN 1 << (${SEM_BAND_BITS - 1} - (p.bit % $SEM_BAND_BITS)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, p.bit // $SEM_BAND_BITS),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
       |  FROM b a JOIN b bb ON a.band = bb.band AND a.bucket = bb.bucket
       |                    AND a.vec_id < bb.vec_id),
       |pairs AS (
       |  SELECT id_a, id_b FROM cand
       |  JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
       |  WHERE round(list_cosine_similarity(ea.emb, eb.emb), 4) >= 0.4),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
       |lp(id, label) AS (
       |  SELECT vec_id, vec_id FROM e
       |  UNION
       |  SELECT edges.src, lp.label FROM lp JOIN edges ON lp.id = edges.dst),
       |final AS (SELECT id, min(label) AS component FROM lp GROUP BY id)
       |SELECT e.vec_id, coalesce(f.component, e.vec_id) AS component,
       |  coalesce(f.component, e.vec_id) = e.vec_id AS keep
       |FROM e LEFT JOIN final f ON e.vec_id = f.id
       |ORDER BY e.vec_id""".stripMargin) { (s, d) =>
    semanticDedupDecisions(s, Tables.embeddings(s, d), 0.4).orderBy("vec_id")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): the cluster-scoped
    * variant of semantic dedup — k-means cluster the embedding space,
    * then look for near-duplicates ONLY within each cluster. Same
    * decision semantics as [[q74]] (rounded cosine ≥ τ → connected
    * components → keep = min id), same τ = 0.4; what changes is the
    * CANDIDATE GENERATOR: q74 bands the space with SRP hyperplanes,
    * SemDeDup scopes the quadratic to k-means cells — the paper's
    * point being that the cluster count grows with the corpus, so
    * per-cell pair work stays bounded while the cells themselves are
    * semantically tight (an SRP band cuts directions, a k-means cell
    * tracks density). Quantizer = [[kmeansCentroids]] (2 deterministic
    * Lloyd steps over the first-16 seed — exactly q62's, so the oracle
    * replays it with the same unrolled CTEs), assignment = the
    * literal-argmax [[ivfAssign]] (no join, no shuffle), components =
    * [[DedupClusters.connectedComponents]]. At 100 TB: nlist ∝ N/cell
    * keeps within-cell pairs linear per cell; the exact closure is the
    * oracle's device only — the engine never materializes
    * reachability. */
  val SemDedupTau = 0.4

  val q278 = Q.sql("q278_semdedup",
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT $IVF_LISTS),
       |${lloydStepSql("c0", "a1", "m1", "c1")},
       |${lloydStepSql("c1", "a2", "m2", "c2")},
       |asg AS (
       |  SELECT e.vec_id, c.cent_id, e.emb,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN c2 c),
       |a AS (SELECT vec_id, cent_id, emb FROM asg WHERE crn = 1),
       |pairs AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM a x JOIN a y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
       |  WHERE round(list_cosine_similarity(x.emb, y.emb), 4) >= $SemDedupTau),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |lp(id, label) AS (
       |  SELECT vec_id, vec_id FROM e
       |  UNION
       |  SELECT edges.src, lp.label FROM lp JOIN edges ON lp.id = edges.dst),
       |final AS (SELECT id, min(label) AS component FROM lp GROUP BY id)
       |SELECT a.vec_id, a.cent_id AS cluster,
       |  coalesce(f.component, a.vec_id) AS component,
       |  coalesce(f.component, a.vec_id) = a.vec_id AS keep
       |FROM a LEFT JOIN final f ON a.vec_id = f.id
       |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val asg = ivfAssign(e.select(col("vec_id"), col("embedding")),
        localCents(kmeansCentroids(e)), "vec_id", "embedding", "cent_id", 1)
      .localCheckpoint(true) // the pair self-join + the output read it
    semDedupDecisionsOn(s, asg)
  }

  /** q278's decision tail over a GIVEN cluster assignment (vec_id,
    * cent_id, embedding): within-cell pairs at rounded cosine ≥
    * [[SemDedupTau]] → connected components → keep = min vec_id. Shared
    * verbatim by the pinned-16-seed anchor (q278) and the derived-k form
    * (q288), so the twins can differ ONLY in the quantizer geometry,
    * never in the dedup decision. */
  private def semDedupDecisionsOn(s: org.apache.spark.sql.SparkSession,
      asg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pairs = asg
      .select(col("cent_id"), col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(asg.select(col("cent_id"), col("vec_id").as("id_b"),
        col("embedding").as("vb")), Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(Exprs.cosine_sim(col("va"), col("vb")), 4) >= SemDedupTau)
      .select("id_a", "id_b")
    val comps = DedupClusters.connectedComponents(s, pairs)
    asg.select(col("vec_id"), col("cent_id").as("cluster"))
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("component", coalesce(col("label"), col("vec_id")))
      .withColumn("keep", col("component") === col("vec_id"))
      .select("vec_id", "cluster", "component", "keep")
      .orderBy("vec_id")
  }

  /** The derived-k cluster assignment q288 and its ScaleSpec share:
    * k = [[autoNlist]](N) from count(*), two Lloyd steps with the
    * constant-codegen-size HOF argmax, assignment via the same HOF form.
    * Checkpointed — the pair self-join and the output both read it. */
  private def semDedupAutoAssign(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val k = autoNlist(e.count())
    ivfAssignHof(e.select(col("vec_id"), col("embedding")),
      localCents(kmeansCentroids(e, k, assignHof = true)),
      "vec_id", "embedding", "cent_id", 1)
      .localCheckpoint(true)
  }

  /** Derived-k SemDeDup candidate volume — Σ within-cell pairs under the
    * [[autoNlist]] geometry; the quantity the ScaleSpec pins: with
    * k ∝ √N and cell occupancy ~N/k = √N, Σ|cell|² grows ~N^1.5 where
    * the pinned-16 anchor grows N²/16. */
  def semDedupAutoCandidateCount(e: org.apache.spark.sql.DataFrame): Long = {
    val sizes = semDedupAutoAssign(e)
      .groupBy("cent_id").agg(count(lit(1)).as("sz"))
    sizes.agg(sum(col("sz") * (col("sz") - lit(1))).cast("long"))
      .head().getLong(0) / 2
  }

  /** SemDeDup with DERIVED cluster count (round-13 verdict item #1,
    * closing the last pinned knob on a production-path scaling claim):
    * identical decision semantics to [[q278]] — the same
    * [[semDedupDecisionsOn]] tail, same τ, same components — but the
    * k-means cell count derives from the corpus as
    * k = clamp(⌈√N⌉, [[IVF_LISTS]], [[AUTO_NLIST_CAP]]) computed from
    * count(*) on BOTH engines (the exact q281/q285 recipe that retired
    * pinned IVF geometry). With k fixed, cells grow ∝N and the
    * within-cell pair volume Σ|cell|² grows N²/k; with k ∝ √N it grows
    * ~N^1.5 — which is the paper's actual deployment shape (Abbas et
    * al. run ~100k clusters over LAION-scale corpora, not 16). The
    * quantizer is the same two deterministic Lloyd steps as q278/q62,
    * seeded by the first k vectors by vec_id — the oracle unrolls them
    * over a DERIVED-count seed CTE ([[lloydStepSql]] is geometry-blind:
    * it takes the centroid CTE by name), so the refined centroids, the
    * assignment, and every keep decision replay bit-for-bit at any N.
    * Assignment uses the HOF argmax on both Lloyd and final passes —
    * constant generated-code size at any k (the literal form would fall
    * off the JIT cliff once ⌈√N⌉ passes a few hundred). q278 stays as
    * the pinned oracle anchor. */
  val q288 = Q.sql("q288_semdedup_autok",
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |nl AS (SELECT least($AUTO_NLIST_CAP, greatest($IVF_LISTS,
       |         CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS nlists
       |       FROM e),
       |c0 AS (
       |  SELECT cent_id, cvec FROM (
       |    SELECT vec_id AS cent_id, emb AS cvec,
       |      row_number() OVER (ORDER BY vec_id) AS rn FROM e) t
       |  CROSS JOIN nl WHERE t.rn <= nl.nlists),
       |${lloydStepSql("c0", "a1", "m1", "c1")},
       |${lloydStepSql("c1", "a2", "m2", "c2")},
       |asg AS (
       |  SELECT e.vec_id, c.cent_id, e.emb,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN c2 c),
       |a AS (SELECT vec_id, cent_id, emb FROM asg WHERE crn = 1),
       |pairs AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM a x JOIN a y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
       |  WHERE round(list_cosine_similarity(x.emb, y.emb), 4) >= $SemDedupTau),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |lp(id, label) AS (
       |  SELECT vec_id, vec_id FROM e
       |  UNION
       |  SELECT edges.src, lp.label FROM lp JOIN edges ON lp.id = edges.dst),
       |final AS (SELECT id, min(label) AS component FROM lp GROUP BY id)
       |SELECT a.vec_id, a.cent_id AS cluster,
       |  coalesce(f.component, a.vec_id) AS component,
       |  coalesce(f.component, a.vec_id) = a.vec_id AS keep
       |FROM a LEFT JOIN final f ON a.vec_id = f.id
       |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    semDedupDecisionsOn(s, semDedupAutoAssign(Tables.embeddings(s, d)))
  }

  /** Vector-count threshold below which exact brute-force top-k (one
    * broadcast of the neighbor side) beats building an IVF index; above
    * it the routed path quantizes with the deterministic k-means
    * refinement and probes 2 lists. 64-dim floats: 100k vectors ≈ 26 MB
    * broadcast — the default keeps the broadcast comfortably inside
    * executor budgets. */
  val BruteForceCap = 100000L

  /** Auto-routed cosine top-k: exact brute force under [[BruteForceCap]]
    * vectors, IVF probes above (the same routing idea as
    * SetSimJoin.jaccardPairs — the caller states WHAT, the router picks
    * the physical plan that survives the data size). */
  def cosineTopK(spark: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame, topK: Int,
      bruteForceCap: Long = BruteForceCap): org.apache.spark.sql.DataFrame = {
    val n = e.count()
    if (n <= bruteForceCap) {
      val a = e.repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id").as("query_id"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
      val pairs = a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
      topKPerQuery(pairs, topK)
    } else ivfTopK(e, kmeansCentroids(e), topK = topK)
  }

  /** Persist an IVF index as TABLES: the centroid list and the
    * per-vector list assignment — the serving artifact an ANN system
    * writes once and probes many times (q127's persisted-band-index
    * shape, applied to vectors). At 100 TB the assignment table is
    * bucketed by `nlist` so a probe's shuffle prunes to the touched
    * lists; vectors themselves stay in the embedding store and join
    * back by id at rerank. */
  def writeIvfIndex(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    cents.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    ivfAssign(
      e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb")),
      localCents(cents), "neighbor_id", "vb", "nlist", 1)
      .select(col("neighbor_id"), col("nlist"))
      .write.mode("overwrite").parquet(s"$dir/assignments.parquet")
  }

  /** Probe a persisted IVF index: assign the QUERIES to their `probes`
    * nearest lists (centroids broadcast from the index), join the
    * stored assignment table on the list id, fetch neighbor vectors by
    * id, exact rerank, top-k. Query-time cost ∝ queries × probed lists
    * — the corpus is never re-assigned. */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession,
      queries: org.apache.spark.sql.DataFrame,
      vectors: org.apache.spark.sql.DataFrame, dir: String,
      probes: Int = IVF_PROBES, topK: Int = 3): org.apache.spark.sql.DataFrame =
    probeAssignments(queries, vectors,
      localCents(spark.read.parquet(s"$dir/centroids.parquet")),
      spark.read.parquet(s"$dir/assignments.parquet"), probes, topK)

  /** The probe tail over an explicit assignment table — shared by the
    * single-tree serve ([[probeIvfIndex]]) and the base∪delta serve of
    * the append-maintained index (q271). */
  def probeAssignments(queries: org.apache.spark.sql.DataFrame,
      vectors: org.apache.spark.sql.DataFrame, cents: Seq[(Long, Seq[Float])],
      assigned: org.apache.spark.sql.DataFrame,
      probes: Int = IVF_PROBES, topK: Int = 3): org.apache.spark.sql.DataFrame = {
    val qprobes = ivfAssign(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("va")),
      cents, "query_id", "va", "qlist", probes)
      .select(col("query_id"), col("va"), col("qlist"))
    val pairs = qprobes
      .join(assigned, col("qlist") === col("nlist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(vectors.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vb")), "neighbor_id")
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, topK)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** Index location + build-once memo: one DETERMINISTIC directory per
    * data dir (keyed by its md5) so repeated gate/bench/spec invocations
    * reuse the persisted index rather than leaking a parquet tree each,
    * and from the second call on the measured cost is the SERVE path
    * (probe-from-disk), which is what this operator exists to show.
    * Lives under the repo-local gitignored `.tmp/` (overridable via
    * GRAFT_TMP), not the world-shared java.io.tmpdir. Cross-process
    * safety: the index is built in a per-process staging dir and
    * atomically renamed into place — two concurrent JVMs (bench +
    * verify) on the same data dir either both rename-race (loser deletes
    * its staging and uses the winner's — byte-identical by determinism)
    * or see a completed dir and skip the build entirely.
    * Per-JVM memo only: a run that rewrites the embeddings under the
    * same path must clear it (the sf dirs are immutable). */
  private val ivfIndexBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfIndexDirFor(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): String =
    ivfIndexDirKeyed(dataDir, Tables.embeddings(spark, dataDir))

  /** q271's STANDING index: built over the standing subset only
    * (vec_id % 5 ≠ 0 plays the already-ingested corpus), centroids the
    * first [[IVF_LISTS]] standing vectors — the artifact that exists
    * BEFORE the batch arrives, which the append path must extend
    * without retraining. */
  private[graft] def ivfStandingDirFor(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): String =
    ivfIndexDirKeyed(s"$dataDir#standing5",
      Tables.embeddings(spark, dataDir).filter(col("vec_id") % 5 =!= 0))

  private def ivfIndexDirKeyed(cacheKey: String,
      e0: => org.apache.spark.sql.DataFrame): String =
    ivfIndexBuilt.computeIfAbsent(cacheKey, { _ =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(cacheKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = sys.env.getOrElse("GRAFT_TMP",
        s"${System.getProperty("user.dir")}/.tmp")
      val target = java.nio.file.Paths.get(base, s"graft_ivf_$key")
      if (!java.nio.file.Files.exists(target)) {
        // sweep stage dirs orphaned by crashed builds: their names are
        // pid-keyed, so no future run would ever reclaim them. A LIVE
        // concurrent JVM's in-progress staging dir must survive the
        // sweep (concurrent bench+verify on one data dir is supported —
        // deleting it would crash the victim's write/move with
        // NoSuchFileException, which the rename-race catch below does
        // not cover), so only dirs whose owner process is dead are
        // swept; an unparseable suffix is left in place.
        Option(target.getParent.toFile.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(s"graft_ivf_$key.stage-"))
          .filter { f =>
            f.getName.stripPrefix(s"graft_ivf_$key.stage-").toLongOption
              .exists { pid =>
                !java.lang.ProcessHandle.of(pid)
                  .map[java.lang.Boolean](_.isAlive).orElse(false)
              }
          }
          .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
        val staging = java.nio.file.Paths.get(base,
          s"graft_ivf_$key.stage-${java.lang.ProcessHandle.current().pid()}")
        val e = e0
        val cents = e.orderBy("vec_id").limit(IVF_LISTS)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        writeIvfIndex(e, cents, staging.toString)
        try java.nio.file.Files.move(staging, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another process completed the rename first: its index is
          // byte-identical (deterministic build); discard the staging.
          // AccessDenied can ALSO be a genuine permission failure (not a
          // lost race) — distinguishable by whether the target exists:
          // if it doesn't, swallowing here would defer the error to a
          // confusing parquet-read failure downstream, so rethrow
          case race @ (_: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.DirectoryNotEmptyException) =>
            org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
            if (!java.nio.file.Files.exists(target)) throw race
        }
      }
      target.toString
    })

  /** Persisted-index gate: build + write the IVF index (once per data
    * dir per JVM), then answer every query FROM the loaded index. Must
    * equal the in-memory q32 pipeline exactly — the oracle is q32's,
    * verbatim. */
  val q139 = Q.sql("q139_ann_index_serve", q32.oracle.get) { (s, d) =>
    val e = Tables.embeddings(s, d)
    probeIvfIndex(s, e, e, ivfIndexDirFor(s, d))
  }

  /** Assign an arriving embedding batch against a persisted index's
    * STORED centroids (no retrain) and write the assignments as a DELTA
    * table — increment cost ∝ |batch| (one projection over the batch;
    * the standing corpus is never re-read, never re-assigned). The base
    * index stays immutable: serving reads base ∪ delta, the LSM shape
    * every append-maintained index converges on. Returns the delta
    * path. */
  def appendIvfDelta(spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame, indexDir: String,
      deltaDir: String): String = {
    val cents = localCents(spark.read.parquet(s"$indexDir/centroids.parquet"))
    val out = s"$deltaDir/assignments.parquet"
    ivfAssign(
      batch.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb")),
      cents, "neighbor_id", "vb", "nlist", 1)
      .select(col("neighbor_id"), col("nlist"))
      .write.mode("overwrite").parquet(out)
    out
  }

  /** Index maintenance under appends — the vector analogue of q127's
    * incremental MinHash probe: the standing corpus (vec_id % 5 ≠ 0)
    * has a PERSISTED IVF index ([[ivfStandingDirFor]]); a batch
    * (vec_id % 5 = 0) arrives and is assigned to the EXISTING centroids
    * (no retrain) as a delta table; queries = the batch, served over
    * base ∪ delta. Because list assignment is per-vector independent,
    * the maintained index is row-identical to a full rebuild against
    * the same centroids — which is exactly what the oracle computes, so
    * a hash match IS the append≡rebuild contract (ScaleSpec pins the
    * increment-cost side: the delta holds |batch| rows and equals the
    * rebuilt table's batch slice). */
  val q271 = Q.sql("q271_ivf_index_append",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, emb AS cvec FROM e
       |          WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT $IVF_LISTS),
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN cents c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |qlist AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg
       |          WHERE crn <= $IVF_PROBES AND vec_id % 5 = 0),
       |scored AS (
       |  SELECT DISTINCT q.query_id, n.neighbor_id,
       |    round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
       |  FROM qlist q JOIN nlist n USING (lst)
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN e ne ON ne.vec_id = n.neighbor_id
       |  WHERE q.query_id <> n.neighbor_id)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 3
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val batch = e.filter(col("vec_id") % 5 === 0)
    val dir = ivfStandingDirFor(s, d)
    // fresh per-run delta dir: the shared base index is NEVER mutated,
    // so bench repeats and concurrent runs can't double-append
    val delta = java.nio.file.Files
      .createTempDirectory("graft_ivf_delta").toString
    appendIvfDelta(s, batch, dir, delta)
    val cents = localCents(s.read.parquet(s"$dir/centroids.parquet"))
    val assigned = s.read.parquet(s"$dir/assignments.parquet")
      .unionByName(s.read.parquet(s"$delta/assignments.parquet"))
    probeAssignments(batch, e, cents, assigned)
  }

  /** Gonzalez farthest-point (k-center) seeding — the 2-approximation
    * that seeds a clustering with well-SPREAD centers (k-means++'s
    * deterministic cousin, and the right initializer for the IVF coarse
    * quantizers this file trains): start from the min-id vector, then
    * repeatedly take the point FARTHEST from the chosen set (max of
    * min-distance, ties to min id). Distances are exact integers —
    * elements floor-quantized to 10⁻⁴ units so squared sums stay in
    * long (64·(4·10⁴)² ≈ 10¹¹) — and each round is one scan with the
    * new center as a plan literal plus a 1-row argmax collect (the BPE
    * precedent): K bounded driver rows total, never a shuffle of
    * pairs. Emits every vector's final min-distance and nearest center
    * (the seeding trace a downstream Lloyd pass starts from). */
  val KCenters = 8

  val q193 = Q.sql("q193_kcenter_seeding", {
    val dist = (a: String, c: String) =>
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(list_zip($a, $c), q -> (q[1]-q[2])*(q[1]-q[2]))),
         |      (x, y) -> x + y)""".stripMargin
    val steps = (2 to KCenters).map { t =>
      s"""c$t AS MATERIALIZED (
         |  SELECT vec_id, xq FROM d${t - 1} ORDER BY dmin DESC, vec_id LIMIT 1),
         |d$t AS MATERIALIZED (
         |  SELECT d.vec_id, d.xq,
         |    least(d.dmin, ${dist("d.xq", "c.xq")}) AS dmin,
         |    CASE WHEN ${dist("d.xq", "c.xq")} < d.dmin
         |         THEN c.vec_id ELSE d.cent END AS cent
         |  FROM d${t - 1} d, c$t c)""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 10000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |c1 AS MATERIALIZED (
       |  SELECT vec_id, xq FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS MATERIALIZED (
       |  SELECT e.vec_id, e.xq, ${dist("e.xq", "c.xq")} AS dmin,
       |    c.vec_id AS cent
       |  FROM e, c1 c),
       |${steps.mkString(",\n")}
       |SELECT vec_id, CAST(cent AS BIGINT) AS cent,
       |  CAST(dmin AS BIGINT) AS dmin
       |FROM d$KCenters ORDER BY vec_id""".stripMargin
  }) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e4)).cast("long")).as("xq"))
      .localCheckpoint(true)
    def d2(cv: Seq[Long]) =
      aggregate(zip_with(col("xq"), typedlit(cv), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    val first = e.orderBy("vec_id").limit(1)
      .select("vec_id", "xq").collect()(0)
    var cur = e.select(col("vec_id"), col("xq"),
        d2(first.getSeq[Long](1)).as("dmin"),
        lit(first.getLong(0)).as("cent"))
      .localCheckpoint(true)
    for (_ <- 2 to KCenters) {
      // 1-row argmax collect per round — K·1 bounded driver rows
      val c = cur.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .select("vec_id", "xq").collect()(0)
      val dNew = d2(c.getSeq[Long](1))
      cur = cur.select(col("vec_id"), col("xq"),
          least(col("dmin"), dNew).as("dmin2"),
          when(dNew < col("dmin"), c.getLong(0)).otherwise(col("cent")).as("cent"))
        .withColumnRenamed("dmin2", "dmin")
        .localCheckpoint(true)
    }
    cur.select(col("vec_id"), col("cent"), col("dmin"))
      .orderBy("vec_id")
  }

  /** Cluster-balanced sampling: k-means the embedding space (the q62
    * Lloyd chain), then cap every cluster at `cap` vectors chosen by
    * salted-hash rank — the semantic-diversity counterpart of the
    * per-source cap (q77): a training mixture where no embedding-space
    * region dominates, selected deterministically and order-free.
    * Plan: the map-side literal argmax assignment (zero Exchange — the
    * q30-family PlanSpec pin) followed by ONE window per cluster; a
    * heavy cluster at 100 TB takes the q148 two-phase pre-cap, same
    * rule. */
  def clusterBalancedSample(e: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centArr = localCents(kmeansCentroids(e))
    val assigned = ivfAssign(
      e.select(col("vec_id"), col("embedding").as("v")),
      centArr, "vec_id", "v", "cluster", 1)
      .select(col("vec_id"), col("cluster"))
    val w = Window.partitionBy("cluster")
      .orderBy(md5(concat(lit("bal:"), col("vec_id").cast("string")).cast("binary")),
        col("vec_id"))
    assigned
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .select("vec_id", "cluster", "rk")
  }

  /** The scale path for [[hardNegatives]]: candidates come from the IVF
    * probe (each query probes its `probes` nearest lists — first-C
    * centroids, q32's routing) instead of the all-pairs broadcast, with
    * the label inequality applied on the candidate stream before the
    * exact rerank. Approximate in the same sense as q32 (a negative in
    * an unprobed list is missed) and exactly as deterministic: the
    * oracle replays routing + filter + rerank verbatim, so the gate
    * hash-pins the whole contract, not a recall statistic. */
  def hardNegativesRouted(e: org.apache.spark.sql.DataFrame, k: Int,
      probes: Int = IVF_PROBES): org.apache.spark.sql.DataFrame = {
    val pairs = routedNegativeCandidates(e, probes)
      .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
    topKPerQuery(pairs, k)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /** The routed candidate stream [[hardNegativesRouted]] reranks —
    * exposed so ScaleSpec can pin its volume ≪ all-pairs (the whole
    * point of routing: q150's brute reference scores n·(n−1) label-
    * mismatched pairs, this streams ~probes/lists of that). */
  private[graft] def routedNegativeCandidates(
      e: org.apache.spark.sql.DataFrame,
      probes: Int = IVF_PROBES): org.apache.spark.sql.DataFrame = {
    val centArr = localCents(e.orderBy("vec_id").limit(IVF_LISTS)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")))
    // queries = corpus: ONE ranked assignment, checkpointed SLIM
    // (vec_id, lst, crn — the ivfTopK single-pass + vector-free-
    // checkpoint rationale, r15/r16); vectors AND labels re-attach
    // from the base scan before the list-key join
    val asg = ivfAssignRanked(
      e.select(col("vec_id"), col("embedding")),
      centArr, "vec_id", "embedding", "lst", probes)
      .select("vec_id", "lst", "crn")
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    val assigned = asg.filter(col("crn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("lst").as("nlist"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vb"), col("label").as("lb")), "neighbor_id")
    val qprobes = asg
      .select(col("vec_id").as("query_id"), col("lst").as("qlist"))
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("va"), col("label").as("la")), "query_id")
    qprobes.join(assigned, col("qlist") === col("nlist"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("la") =!= col("lb"))
  }

  /** IVF-routed top-2 hard negatives; the oracle is q32's routing CTEs
    * plus the label inequality. */
  val q152 = Q.sql("q152_hard_negatives_ivf",
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT $IVF_LISTS),
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN cents c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst FROM asg WHERE crn = 1),
       |qlist AS (SELECT vec_id AS query_id, cent_id AS lst FROM asg WHERE crn <= $IVF_PROBES),
       |scored AS (
       |  SELECT DISTINCT q.query_id, n.neighbor_id,
       |    round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
       |  FROM qlist q JOIN nlist n USING (lst)
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN e ne ON ne.vec_id = n.neighbor_id
       |  WHERE q.query_id <> n.neighbor_id AND qe.label <> ne.label)
       |SELECT query_id, neighbor_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 2
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin) { (s, d) =>
    hardNegativesRouted(Tables.embeddings(s, d), k = 2)
  }

  /** Per-cluster cap of 10 over the 2-step Lloyd clusters; oracle
    * replays the full chain (q62's CTEs) plus the capped window. */
  val q151 = Q.sql("q151_cluster_sample",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, emb AS cvec FROM e ORDER BY vec_id LIMIT $IVF_LISTS),
       |${lloydStepSql("c0", "a1", "m1", "c1")},
       |${lloydStepSql("c1", "a2", "m2", "c2")},
       |asg AS (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC, c.cent_id) AS crn
       |  FROM e CROSS JOIN c2 c)
       |SELECT vec_id, cluster, CAST(rk AS BIGINT) AS rk FROM (
       |  SELECT vec_id, cent_id AS cluster,
       |    row_number() OVER (PARTITION BY cent_id
       |      ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM asg WHERE crn = 1) t
       |WHERE rk <= 10 ORDER BY vec_id""".stripMargin) { (s, d) =>
    clusterBalancedSample(Tables.embeddings(s, d), cap = 10).orderBy("vec_id")
  }

  /** Recall-vs-nprobe curve — the tuning table every IVF deployment
    * reads before picking its probe count: for probes ∈
    * [[RecallProbes]], recall@3 of the IVF route against the brute
    * top-3 truth (truth computed ONCE, checkpointed, joined by each
    * setting). This is the capacity-planning artifact of the 100 TB
    * story: the curve tells you the cheapest probe count that clears
    * the recall bar, and the shape (one corpus assignment reused, per-
    * setting cost ∝ probed lists) is exactly how the measurement runs
    * against a production index. Brute truth is the oracle anchor
    * (q30's precedent); recall is an integer-rounded rational (the
    * q233 half-boundary rule). */
  val RecallProbes = Seq(1, 2, 4)

  val q245 = Q.sql("q245_ivf_recall_curve", {
    val ivfBlocks = RecallProbes.map { p =>
      s"""ivf$p AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT sc.query_id, sc.neighbor_id,
         |      row_number() OVER (PARTITION BY sc.query_id
         |        ORDER BY sc.sim DESC, sc.neighbor_id) AS rn
         |    FROM (
         |      SELECT DISTINCT q.vec_id AS query_id, n.neighbor_id,
         |        round(list_cosine_similarity(qe.emb, ne.emb), 4) + 0.0 AS sim
         |      FROM asg q JOIN nlist n ON n.lst = q.cent_id AND q.crn <= $p
         |      JOIN e qe ON qe.vec_id = q.vec_id
         |      JOIN e ne ON ne.vec_id = n.neighbor_id
         |      WHERE q.vec_id <> n.neighbor_id) sc) t
         |  WHERE rn <= 3),
         |h$p AS (
         |  SELECT CAST($p AS BIGINT) AS probes,
         |    CAST(count(*) AS BIGINT) AS n_hits
         |  FROM ivf$p JOIN truth USING (query_id, neighbor_id))""".stripMargin
    }.mkString(",\n")
    val unioned = RecallProbes.map(p => s"SELECT * FROM h$p")
      .mkString(" UNION ALL ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, emb AS cvec FROM e
       |          ORDER BY vec_id LIMIT $IVF_LISTS),
       |asg AS MATERIALIZED (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.emb, c.cvec), 4) DESC,
       |        c.cent_id) AS crn
       |  FROM e CROSS JOIN cents c),
       |nlist AS (SELECT vec_id AS neighbor_id, cent_id AS lst
       |          FROM asg WHERE crn = 1),
       |truth AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY round(list_cosine_similarity(a.emb, b.emb), 4) DESC,
       |          b.vec_id) AS rn
       |    FROM e a JOIN e b ON a.vec_id <> b.vec_id) t
       |  WHERE rn <= 3),
       |tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |$ivfBlocks
       |SELECT probes, n_truth, n_hits,
       |  CAST((n_hits * 20000 + n_truth) // (2 * n_truth) AS DOUBLE) / 10000.0
       |    AS recall
       |FROM ($unioned) u CROSS JOIN tn
       |ORDER BY probes""".stripMargin
  }) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cents = e.orderBy("vec_id").limit(IVF_LISTS)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val a = e.repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id").as("query_id"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
    val truth = topKPerQuery(
        a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4)), 3)
      .select("query_id", "neighbor_id")
      // lazy (r16): size + every probe setting read it
      .localCheckpoint(false)
    val tn = truth.agg(count(lit(1)).cast("long").as("n_truth"))
    // ONE ranked assignment at keep = max(probes) feeds every probe
    // setting (crn <= p filter) — the oracle's single shared `asg` CTE;
    // the old per-p ivfTopK calls re-ran the C-cosine assignment twice
    // per setting (6 corpus passes for the 3-point curve, now 1).
    // Checkpointed SLIM (vec_id, lst, crn — r16): the vectors re-attach
    // per probe setting inside ivfTopKFromRanked.
    val asg = ivfAssignRanked(
      e.select(col("vec_id"), col("embedding")),
      localCents(cents), "vec_id", "embedding", "lst", RecallProbes.max)
      .select("vec_id", "lst", "crn")
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    RecallProbes.map { p =>
      ivfTopKFromRanked(asg.filter(col("crn") <= p), e, topK = 3)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).cast("long").as("n_hits"))
        .select(lit(p.toLong).as("probes"), col("n_hits"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(tn))
      .select(col("probes"), col("n_truth"), col("n_hits"),
        (expr("CAST((n_hits * 20000 + n_truth) div (2 * n_truth) AS DOUBLE)")
          / 10000.0).as("recall"))
      .orderBy("probes")
  }

  val all: Seq[Q] = Seq(q29, q30, q31, q32, q62, q74, q139, q150, q151, q152,
    q153, q193, q245, q271, q278, q281, q288)
}
