package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Signature-level Jaccard ESTIMATION — the pure-sketch half of the
  * MinHash family. q25 generates candidates by banding and then
  * exact-verifies with a shingle scan; this operator stops at the
  * signatures: similarity is estimated as the fraction of agreeing
  * MinHash coordinates (an unbiased estimator of Jaccard, Broder '97),
  * which is what a 100 TB pipeline uses when re-reading both documents
  * for the exact verify is the expensive step (the text never moves —
  * only 16·8 B signatures shuffle).
  *
  * Hash family: coordinate i of a doc is min over its distinct tokens
  * of `(polyHash131(tok)·Gᵢ mod 2^61−1)` — the same oracle-replayable
  * modular-multiplier construction as the CMS/KMV sketches (M prime →
  * each Gᵢ is a bijection), so DuckDB rebuilds every signature
  * bit-for-bit in HUGEINT arithmetic.
  */
object MinhashEstimate {

  val K = 16
  val Rows = 4 // rows per band → 4 bands
  val Bands: Int = K / Rows

  /** splitmix64 stream (seed 0x5EEDCAFE) reduced mod 2^61−1. */
  val Gs: Array[Long] = Array(
    228306911474628631L, 1167673549497243331L, 2112403024448701698L,
    809674738077516596L, 845383944982593576L, 1308348358051381457L,
    1453449505825715565L, 1787550849459870439L, 516243539066360113L,
    800261756675004903L, 860876837426832833L, 1295616717811322051L,
    1525990493319459205L, 1254184912358004047L, 2065892881832967110L,
    2298790755795059679L)

  /** Per-doc K-coordinate MinHash signature as an array column.
    * Features are distinct word 2-shingles (q25's feature space): the
    * synthetic corpus has a ~31-token vocabulary, so token-level
    * signatures would collide on nearly every pair — bigrams give the
    * sketch a feature space that actually separates documents. */
  def signatures(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        explode(array_distinct(
          Text.shingles(Text.tokens(col("text")), 2))).as("tok"))
      // poly_hash is RAW poly-131; apply the KMV uniformizer explicitly
      // (the oracle replays hash·G before the per-coordinate multipliers)
      .select(col("doc_id"),
        Exprs.mulmod61(Exprs.poly_hash(col("tok")), Sketches.Kmv.G).as("h"))
      .groupBy("doc_id")
      .agg(min(Exprs.mulmod61(col("h"), Gs(0))).as("s0"),
        Gs.zipWithIndex.drop(1).map { case (g, i) =>
          min(Exprs.mulmod61(col("h"), g)).as(s"s$i")
        }.toSeq: _*)
      .select(col("doc_id"),
        array((0 until K).map(i => col(s"s$i")): _*).as("sig"))

  /** Skew guard, same role as q25's LSH bucket cap: a template-heavy
    * corpus puts identical signatures in every band, and an uncapped
    * bucket of b docs pairs b²/2 times. Capped by doc_id rank — a
    * DETERMINISTIC order, so unlike q25's (hash-bucketed, recall-argued)
    * cap this one is replayed verbatim by the oracle's row_number. At
    * gate scale no bucket reaches the cap (the oracle would catch a
    * drop); ScaleSpec plants a 600-doc template cluster to pin the
    * capped semantics. */
  val BucketCap = 512

  /** Banded candidate pairs with the coordinate-agreement estimate.
    *
    * Plan note: building this marks the signature table for a LAZY
    * local checkpoint — no job runs here, but the first action that
    * touches the result materializes the signatures into executor
    * block storage (unreplicated; lineage is truncated once stored),
    * where they stay until the ContextCleaner reclaims them. */
  def estimatePairs(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Materialized once (the q269 discipline): the signature build —
    // tokenize + shingle + explode + 16-coordinate min groupBy, the
    // dominant corpus pass — feeds FOUR consumers (both sides of the
    // banded self-join, then the siga/sigb lookups), whose join keys
    // all differ, so exchange reuse cannot collapse them. The
    // checkpoint is (doc_id, 16 longs) per doc, and it is LAZY (r16):
    // the r15 eager form ran a blocking materialization job per
    // invocation, which the driver bench showed costing more at gate
    // scale than the sharing saved (r15 verdict item 1); lazily the
    // first consumer's stage computes + persists the blocks and the
    // other three read them — same single kernel execution, no extra
    // job.
    val sig = signatures(documents).localCheckpoint(false)
    val bandCols = (0 until Bands).map { b =>
      array_join(transform(slice(col("sig"), b * Rows + 1, Rows),
        _.cast("string")), ":")
    }
    val banded = sig
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "bnd").withColumnRenamed("col", "bv")
      .withColumn("rn", row_number().over(
        Window.partitionBy("bnd", "bv").orderBy("doc_id")))
      .filter(col("rn") <= BucketCap)
      .drop("rn")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.bnd") === col("b.bnd") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("siga")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sigb")), "id_b")
      .withColumn("n_match",
        aggregate(zip_with(col("siga"), col("sigb"),
          (x, y) => (x === y).cast("int")), lit(0), (a, x) => a + x)
          .cast("long"))
      .select(col("id_a"), col("id_b"), col("n_match"),
        round(col("n_match") / lit(K.toDouble), 4).as("est"))
  }

  private val gList = Gs.mkString("[", ",", "]")

  val q132 = Q.sql("q132_minhash_estimate",
    s"""WITH t0 AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i+1]))) AS tok
      |  FROM t0 WHERE len(t) >= 2),
      |h AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(tok) + 1),
      |                     c -> CAST(ascii(substr(tok, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS h
      |  FROM tok),
      |sigl AS (
      |  SELECT doc_id, i,
      |    min(CAST((CAST(h AS HUGEINT) * ($gList)[i+1])
      |        % 2305843009213693951 AS BIGINT)) AS s
      |  FROM h, LATERAL unnest(range(0, $K)) AS u(i)
      |  GROUP BY doc_id, i),
      |sg AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM sigl GROUP BY doc_id),
      |b0 AS (
      |  SELECT doc_id, bnd,
      |    array_to_string(list_slice(sig, bnd*$Rows+1, bnd*$Rows+$Rows), ':') AS bv
      |  FROM sg, LATERAL unnest(range(0, $Bands)) AS u(bnd)),
      |b AS (
      |  SELECT doc_id, bnd, bv FROM (
      |    SELECT doc_id, bnd, bv,
      |      row_number() OVER (PARTITION BY bnd, bv ORDER BY doc_id) AS rn
      |    FROM b0)
      |  WHERE rn <= $BucketCap),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bv = b2.bv
      |                    AND a.doc_id < b2.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(len(list_filter(range(1, ${K + 1}), j -> x.sig[j] = y.sig[j])) AS BIGINT) AS n_match,
      |  round(CAST(len(list_filter(range(1, ${K + 1}), j -> x.sig[j] = y.sig[j])) AS DOUBLE) / $K.0, 4) AS est
      |FROM cand c JOIN sg x ON c.id_a = x.doc_id JOIN sg y ON c.id_b = y.doc_id
      |ORDER BY c.id_a, c.id_b""".stripMargin) { (s, d) =>
    estimatePairs(Tables.documents(s, d)).orderBy("id_a", "id_b")
  }

  /** Source-level MinHash overlap matrix — the sketch applied at the
    * grain a corpus registry actually tracks: each SOURCE keeps one
    * K-coordinate signature (per-coordinate min over every document's
    * shingle hashes — MinHash state is mergeable, so the source sketch
    * is the fold of its documents' sketches and maintains under
    * appends), and every source pair reads an estimated shingle-set
    * Jaccard from coordinate agreement. q217 computes the EXACT
    * containment matrix by joining the gram sets; this is what
    * replaces it when sources are petabytes — only 20 signatures of
    * 16×8 B ever meet. est = matches/16 is dyadic (≤4 decimal digits)
    * so float round is exact here. */
  val q269 = Q.sql("q269_source_minhash_overlap", {
    val gList = Gs.mkString("[", ",", "]")
    s"""WITH t0 AS (
       |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents),
       |tok AS (
       |  SELECT source,
       |    unnest(list_distinct(list_transform(range(1, len(t)),
       |      i -> t[i] || ' ' || t[i+1]))) AS tok
       |  FROM t0 WHERE len(t) >= 2),
       |h AS (
       |  SELECT source,
       |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(tok) + 1),
       |                     c -> CAST(ascii(substr(tok, c, 1)) AS HUGEINT))),
       |      (a, b) -> (a * 131 + b) % 2305843009213693951)
       |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS h
       |  FROM tok),
       |sigl AS (
       |  SELECT source, i,
       |    min(CAST((CAST(h AS HUGEINT) * ($gList)[i+1])
       |        % 2305843009213693951 AS BIGINT)) AS s
       |  FROM h, LATERAL unnest(range(0, $K)) AS u(i)
       |  GROUP BY source, i),
       |sg AS (SELECT source, list(s ORDER BY i) AS sig FROM sigl
       |       GROUP BY source)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(len(list_filter(range(1, ${K + 1}),
       |    j -> a.sig[j] = b.sig[j])) AS BIGINT) AS n_match,
       |  round(CAST(len(list_filter(range(1, ${K + 1}),
       |    j -> a.sig[j] = b.sig[j])) AS DOUBLE) / $K.0, 4) AS est
       |FROM sg a JOIN sg b ON a.source < b.source
       |ORDER BY src_a, src_b""".stripMargin
  }) { (s, d) =>
    sourceOverlap(Tables.documents(s, d))
  }

  /** Routing cap for the source-overlap matrix (r16, verdict item 6):
    * at or below this many sources the brute all-pairs signature join
    * runs — the oracle-replayable anchor shape, fine at any realistic
    * registry size. Above it the matrix is assembled WITHOUT an
    * all-pairs signature comparison: pairs with n_match ≥ 1 fall out of
    * a coordinate-equality join over the exploded (i, sᵢ) table (the
    * count of agreeing (i, sᵢ) keys IS n_match, exactly), and the
    * n_match = 0 complement — whose row count is inherent to the gate's
    * full-matrix contract — is emitted by an anti-join that never
    * touches signatures. Same routing idiom as DriverEdgeCap /
    * BroadcastRankCap: the caller states WHAT, the router picks the
    * plan that survives the source count. ScaleSpec pins routed ≡ brute
    * at the flip point (cap = 0 vs cap = ∞ on the same corpus). */
  val SourceAllPairsCap = 4096L

  /** Source-grain signature table (K mergeable MinHash coordinates per
    * source), lazily checkpointed: consumers share one materialization,
    * and the routing count below doubles as the materializing action. */
  private def sourceSignatures(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        explode(array_distinct(
          Text.shingles(Text.tokens(col("text")), 2))).as("tok"))
      .select(col("source"),
        Exprs.mulmod61(Exprs.poly_hash(col("tok")), Sketches.Kmv.G).as("h"))
      .groupBy("source")
      .agg(min(Exprs.mulmod61(col("h"), Gs(0))).as("s0"),
        Gs.zipWithIndex.drop(1).map { case (g, i) =>
          min(Exprs.mulmod61(col("h"), g)).as(s"s$i")
        }.toSeq: _*)
      .select(col("source"),
        array((0 until K).map(i => col(s"s$i")): _*).as("sig"))
      // lazy: every consumer reads it; the routing count (or the first
      // consumer stage) materializes the blocks (no standalone job — r16)
      .localCheckpoint(false)

  /** The q269 body with the source-count route. Both branches compute
    * the IDENTICAL full matrix — the route only changes the physical
    * plan (brute: S² signature comparisons; routed: coordinate-equality
    * candidates + signature-free complement). */
  def sourceOverlap(documents: DataFrame,
      allPairsCap: Long = SourceAllPairsCap): DataFrame = {
    val sig = sourceSignatures(documents)
    val nSources = sig.count() // bounded driver scalar; materializes sig
    if (nSources <= allPairsCap) {
      sig.as("a").join(sig.as("b"), col("a.source") < col("b.source"))
        .withColumn("n_match",
          aggregate(zip_with(col("a.sig"), col("b.sig"),
            (x, y) => (x === y).cast("int")), lit(0), (a, x) => a + x)
            .cast("long"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("n_match"),
          round(col("n_match") / lit(K.toDouble), 4).as("est"))
        .orderBy("src_a", "src_b")
    } else {
      // n_match ≥ 1 pairs: each agreeing coordinate (i, sᵢ) contributes
      // exactly one joined row, so the group count IS the coordinate-
      // agreement count — no signature array ever re-read
      val ex = sig.select(col("source"), posexplode(col("sig")))
      val cand = ex.as("a").join(ex.as("b"),
          col("a.pos") === col("b.pos") && col("a.col") === col("b.col") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).cast("long").as("n_match"))
      // n_match = 0 complement: the output contract is the FULL matrix,
      // so its S·(S−1)/2 row count is irreducible — but these rows are
      // (src_a, src_b, 0, 0.0) literals, built from the source LIST
      // without touching a signature
      val srcs = sig.select("source")
      val zero = srcs.select(col("source").as("src_a"))
        .join(srcs.select(col("source").as("src_b")),
          col("src_a") < col("src_b"))
        .join(cand.select("src_a", "src_b"), Seq("src_a", "src_b"),
          "left_anti")
        .select(col("src_a"), col("src_b"), lit(0L).as("n_match"))
      cand.select("src_a", "src_b", "n_match").unionByName(zero)
        .select(col("src_a"), col("src_b"), col("n_match"),
          round(col("n_match") / lit(K.toDouble), 4).as("est"))
        .orderBy("src_a", "src_b")
    }
  }

  val all: Seq[Q] = Seq(q132, q269)
}
