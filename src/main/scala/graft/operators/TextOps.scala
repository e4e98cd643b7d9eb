package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** LLM-training-data pipeline operators over the `documents` table:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), text
  * analysis (language ID, quality scoring, token counting, winnowing
  * fingerprints).
  *
  * Scale design: every pairwise operator goes through a bucketing stage
  * (hash group / LSH band / simhash band) so candidate generation is a
  * shuffle-on-key + within-bucket pairing, never an O(n²) cross join;
  * bucket size is capped to bound skew (a hot bucket of b docs costs
  * b²/2 pairs — the cap turns worst-case quadratic into linear with a
  * logged drop). The exact-verify stage runs only on candidates.
  */
object TextOps {

  /** Exact dedup: hash-groupBy on canonical text bytes (md5 here; the
    * group-by is on the 128-bit digest, not the text, so the shuffle
    * carries 16 bytes + id per row at scale). */
  val q20 = Q.sql("q20_dedup_exact",
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("text_hash")
  }

  /** Token counting: chars, whitespace tokens, BPE-ish word pieces. */
  val q21 = Q.sql("q21_token_count",
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars"),
        size(Text.tokens(col("text"))).cast("bigint").as("n_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("bigint").as("n_pieces"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / punctuation / stopword components. */
  val q22 = Q.sql("q22_quality_score",
    """SELECT doc_id,
      |  round(0.4 * least(length(text)/500.0, 1.0)
      |      + 0.3 * (1.0 - least(5.0*(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
      |      + 0.3 * least(4.0*len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> list_contains(['the','and','of','to','in','is','a'], x))) / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
      |  , 4) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  /** Language ID: marker-word argmax heuristic + CJK codepoint gate. */
  val q23 = Q.sql("q23_lang_id",
    """WITH t AS (
      |  SELECT doc_id, lang, text,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, lang, text,
      |    len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','a'], x))) AS c_en,
      |    len(list_filter(toks, x -> list_contains(['el','la','los','de','que','y','en'], x))) AS c_es,
      |    len(list_filter(toks, x -> list_contains(['le','la','les','et','des','un','est'], x))) AS c_fr,
      |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS c_de,
      |    len(list_filter(toks, x -> list_contains(['o','os','de','que','e','uma','um'], x))) AS c_pt
      |  FROM t)
      |SELECT doc_id, lang,
      |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |       WHEN greatest(c_en,c_es,c_fr,c_de,c_pt) = 0 THEN 'und'
      |       WHEN c_en = greatest(c_en,c_es,c_fr,c_de,c_pt) THEN 'en'
      |       WHEN c_es = greatest(c_en,c_es,c_fr,c_de,c_pt) THEN 'es'
      |       WHEN c_fr = greatest(c_en,c_es,c_fr,c_de,c_pt) THEN 'fr'
      |       WHEN c_de = greatest(c_en,c_es,c_fr,c_de,c_pt) THEN 'de'
      |       ELSE 'pt' END AS lang_pred
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** n-gram Jaccard near-dup: distinct-token-set similarity over all
    * candidate pairs. Oracle-checked at threshold; the Spark side uses a
    * token-sorted-signature broadcast self-join (small side deduped). */
  val q24 = Q.sql("q24_jaccard_pairs",
    """WITH s AS (
      |  SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS ts
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST((CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) * 20000
      |        + len(list_distinct(a.ts || b.ts)))
      |       // (2 * len(list_distinct(a.ts || b.ts))) AS DOUBLE) / 10000.0
      |    AS jac
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE CAST((CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) * 20000
      |        + len(list_distinct(a.ts || b.ts)))
      |       // (2 * len(list_distinct(a.ts || b.ts))) AS DOUBLE) / 10000.0 >= 0.8
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    // Adaptive physical plan (SetSimJoin): dense-vocab corpora get
    // bitset+popcount Jaccard, large vocabs get a hashed-long merge walk,
    // and PrefixJoin covers the sparse-candidate 100 TB regime — all
    // exact, all agreeing (asserted in ScaleSpec).
    SetSimJoin.jaccardPairs(s,
      Tables.documents(s, d)
        .select(col("doc_id"), Text.tokenSet(col("text")).as("ts")),
      threshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  private[operators] val MINHASH_K = 64
  private[operators] val LSH_ROWS = 2 // rows per band → 32 bands
  // Skew guard: an oversized LSH bucket is SAMPLED to its first
  // BUCKET_CAP members (by doc_id), not dropped — identical-signature
  // mega-clusters (template/exact-dup corpora) fill EVERY band's bucket,
  // so drop-the-bucket semantics would zero out recall exactly where a
  // near-dup detector matters most. Sampling bounds the pair loop at
  // C(cap,2) per bucket while keeping the cluster detectable; exact-dup
  // removal (q20) stays the pre-pass that shrinks such clusters before
  // LSH in the composed pipeline.
  private[operators] val BUCKET_CAP = 64

  /** The brute-force 2-shingle-set Jaccard pair set — the DuckDB oracle
    * both sketch-candidate gates (q25 MinHash-LSH, q27 SimHash bands)
    * verify against. The gate contract is therefore recall = 1.0 at gate
    * scale: every brute pair ≥ the threshold must surface through the
    * candidate machinery (the band math makes a miss ~1e-10 at J ≥ 0.8),
    * and every surfaced pair must carry the exact verified score. */
  private val ShinglePairsOracle =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i+1])) AS sh
      |  FROM tok WHERE len(t) >= 2)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST((CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 20000
      |        + len(list_distinct(a.sh || b.sh)))
      |       // (2 * len(list_distinct(a.sh || b.sh))) AS DOUBLE) / 10000.0
      |    AS jac
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE CAST((CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 20000
      |        + len(list_distinct(a.sh || b.sh)))
      |       // (2 * len(list_distinct(a.sh || b.sh))) AS DOUBLE) / 10000.0 >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** (doc_id, sh): the 2-shingle arrays both sketch gates band AND
    * verify over — built once per gate so candidate generation and the
    * exact verify derive from the same frame instead of re-scanning +
    * re-shingling the corpus per stage. */
  private[operators] def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        Text.shingles(Text.tokens(col("text")), 2).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact-verify stage shared by q25/q27: candidate (id_a, id_b) pairs
    * joined back onto the distinct shingle sets pre-hashed to sorted
    * longs (machine-word merge walk, same trick as SetSimJoin's hashed
    * path) → (id_a, id_b, jac) with jac ≥ `threshold` on the rounded
    * value. `docs` is the [[shingled]] frame. */
  private[operators] def verifyShinglePairs(docs: DataFrame, pairs: DataFrame,
      threshold: Double): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_sort(transform(array_distinct(col("sh")), t => xxhash64(t))).as("ts"))
    pairs
      .join(sets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("inter", Exprs.sorted_intersect_count_long(col("ts_a"), col("ts_b")))
      .withColumn("uni",
        size(col("ts_a")).cast("long") + size(col("ts_b")) - col("inter"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("jac",
        expr("CAST((inter * 20000 + uni) div (2 * uni) AS DOUBLE)") / 10000.0)
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
      .orderBy("id_a", "id_b")
  }

  /** MinHash + LSH near-dup detection: shingle → 64-hash signature →
    * 32 bands of 2 → band-hash bucket join → within-bucket pairs →
    * exact Jaccard verify on the candidate set only. Oracled against the
    * brute-force pair set: at J ≥ 0.8 a true pair escapes all 32 bands
    * with probability (1-s²)³² ≤ 6e-15, so the gate pins recall = 1.0
    * at gate scale (misses would hash-mismatch the oracle).
    */
  val q25 = Q.sql("q25_minhash_lsh", ShinglePairsOracle) { (s, d) =>
    val nBands = MINHASH_K / LSH_ROWS
    // materialize the shingle arrays once (q54's pattern): banding,
    // within-bucket pairing, and the exact verify all reference this
    // frame, and without the checkpoint each branch re-scans the corpus
    // and re-runs the shingle kernel
    val sh = shingled(Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism))
      .localCheckpoint(true)
    val docs = sh.select(col("doc_id"), col("sh"),
      Exprs.minhash_sig(col("sh"), MINHASH_K).as("sig"))
    val bandCols = (0 until nBands).map(i => struct(
      lit(i).as("band"),
      hash(slice(col("sig"), i * LSH_ROWS + 1, LSH_ROWS), lit(i)).as("bucket")))
    // the band join carries ONLY (band, bucket, id) — the shingle arrays
    // never ride the candidate shuffle; verification joins them back by
    // id afterwards (two slim hash joins instead of wide-row banding)
    val banded = docs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // within-bucket pairing, oversized buckets sampled to the cap
    val wRank = Window.partitionBy("band", "bucket").orderBy("doc_id")
    val capped = banded
      .withColumn("bsz", row_number().over(wRank))
      .filter(col("bsz") <= BUCKET_CAP)
    val pairs = capped.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(capped.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyShinglePairs(sh, pairs, 0.8)
  }

  /** SimHash signatures per document, emitted as the signed 64-bit
    * value. Fully oracled: the kernel's vote bits come from the q28
    * polynomial family (token poly-131 mod 2^61−1, then two fixed
    * multiplier mixes G1/G2 for the low/high 32 bits — see
    * TextKernels.simHash64), which DuckDB replays verbatim in HUGEINT
    * arithmetic: per-token hash, per-bit ±1 votes, sign, and the final
    * two's-complement reinterpretation all hash-compare exactly. */
  val q26 = Q.sql("q26_simhash",
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(t, tk -> list_reduce(
       |      list_prepend(CAST(0 AS HUGEINT),
       |        list_transform(range(1, length(tk) + 1),
       |                       i -> CAST(ascii(substr(tk, i, 1)) AS HUGEINT))),
       |      (a, b) -> (a * 131 + b) % 2305843009213693951)) AS hs
       |  FROM tok),
       |bv AS (
       |  SELECT doc_id, unnest(list_transform(hs, h ->
       |      ((h + 1) * ${graft.functions.TextKernels.SimHashG1}) % 2305843009213693951 % 4294967296
       |    + (((h + 1) * ${graft.functions.TextKernels.SimHashG2}) % 2305843009213693951 % 4294967296)
       |      * 4294967296)) AS bits
       |  FROM th),
       |vo AS (
       |  SELECT doc_id, r.b AS bit,
       |    sum(CASE WHEN (bits // CAST(power(2, r.b) AS HUGEINT)) % 2 = 1
       |             THEN 1 ELSE -1 END) AS vote
       |  FROM bv, range(0, 64) r(b) GROUP BY doc_id, r.b),
       |sig AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN vote > 0 THEN CAST(power(2, bit) AS HUGEINT)
       |             ELSE CAST(0 AS HUGEINT) END) AS s
       |  FROM vo GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(CASE WHEN coalesce(g.s, 0) >= 9223372036854775808
       |            THEN coalesce(g.s, 0) - 18446744073709551616
       |            ELSE coalesce(g.s, 0) END AS BIGINT) AS simhash
       |FROM tok t LEFT JOIN sig g ON t.doc_id = g.doc_id
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        Exprs.simhash64(Text.tokens(lower(col("text")))).as("simhash"))
      .orderBy("doc_id")
  }

  /** q27's oracle: the full block-pair banding pipeline in SQL — q26's
    * signature replay → 28 (tab, 16-bit key) cells per doc → the
    * doc_id-ordered bucket cap → key-collision candidate pairs → exact
    * shingle-Jaccard ≥ 0.8. Signatures are kept UNSIGNED (HUGEINT `s`);
    * block b of the two's-complement BIGINT equals `(s // 2^(8b)) % 256`
    * for every b, so no signed-shift semantics enter the replay. */
  private lazy val SimhashBandedOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(t)),
       |      i -> t[i] || ' ' || t[i+1])) AS sh
       |  FROM sh0 WHERE len(t) >= 2),
       |th AS (
       |  SELECT doc_id, list_transform(t, tk -> list_reduce(
       |      list_prepend(CAST(0 AS HUGEINT),
       |        list_transform(range(1, length(tk) + 1),
       |                       i -> CAST(ascii(substr(tk, i, 1)) AS HUGEINT))),
       |      (a, b) -> (a * 131 + b) % 2305843009213693951)) AS hs
       |  FROM tok WHERE doc_id IN (SELECT doc_id FROM sh)),
       |bv AS (
       |  SELECT doc_id, unnest(list_transform(hs, h ->
       |      ((h + 1) * ${graft.functions.TextKernels.SimHashG1}) % 2305843009213693951 % 4294967296
       |    + (((h + 1) * ${graft.functions.TextKernels.SimHashG2}) % 2305843009213693951 % 4294967296)
       |      * 4294967296)) AS bits
       |  FROM th),
       |vo AS (
       |  SELECT doc_id, r.b AS bit,
       |    sum(CASE WHEN (bits // CAST(power(2, r.b) AS HUGEINT)) % 2 = 1
       |             THEN 1 ELSE -1 END) AS vote
       |  FROM bv, range(0, 64) r(b) GROUP BY doc_id, r.b),
       |sigx AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN vote > 0 THEN CAST(power(2, bit) AS HUGEINT)
       |             ELSE CAST(0 AS HUGEINT) END) AS s
       |  FROM vo GROUP BY doc_id),
       |keys AS (
       |  SELECT doc_id, r1.i * 8 + r2.j AS tab,
       |    CAST(((s // CAST(power(2, r1.i * 8) AS HUGEINT)) % 256) * 256
       |       + ((s // CAST(power(2, r2.j * 8) AS HUGEINT)) % 256) AS BIGINT) AS key
       |  FROM sigx, range(0, 8) r1(i), range(0, 8) r2(j)
       |  WHERE r1.i < r2.j),
       |ck AS (
       |  SELECT doc_id, tab, key FROM (
       |    SELECT doc_id, tab, key,
       |      row_number() OVER (PARTITION BY tab, key ORDER BY doc_id) AS rn
       |    FROM keys)
       |  WHERE rn <= $SIMHASH_BUCKET_CAP),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ck a JOIN ck b ON a.tab = b.tab AND a.key = b.key
       |                     AND a.doc_id < b.doc_id)
       |SELECT c.id_a, c.id_b,
       |  CAST((CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) * 20000
       |        + len(list_distinct(x.sh || y.sh)))
       |       // (2 * len(list_distinct(x.sh || y.sh))) AS DOUBLE) / 10000.0
       |    AS jac
       |FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
       |WHERE CAST((CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) * 20000
       |        + len(list_distinct(x.sh || y.sh)))
       |       // (2 * len(list_distinct(x.sh || y.sh))) AS DOUBLE) / 10000.0 >= 0.8
       |ORDER BY c.id_a, c.id_b""".stripMargin

  /** SimHash block-pair bucket cap. A 16-bit key bucket past this size
    * is deterministically truncated to its `cap` LOWEST doc_ids
    * (row_number over doc_id — the q27 oracle replays exactly this
    * cap, so it is part of the gate contract, not an internal detail).
    * Only template/identical-signature mega-clusters can reach the cap
    * (16-bit keys hold ~n/65536 docs on non-degenerate corpora); such
    * clusters collide in ALL 28 tables, stay detectable at C(cap,2)
    * cost, and the exact-dup pre-pass (q20) is the composed pipeline's
    * first-line shrink for them — see [[simhashCandidates]]. */
  private[graft] val SIMHASH_BUCKET_CAP = 512

  /** Candidate pairs for simhash near-dup detection, scale-safe.
    *
    * Block-combination tables (the flat variant of Manku et al.,
    * WWW'07 §3): the 64-bit signature splits into 8 disjoint 8-bit
    * blocks; each doc is keyed into all C(8,2) = 28 tables, one per
    * unordered block pair, key = the 16 concatenated bits of that pair.
    * Pigeonhole: a pair at hamming ≤ 6 has ≥ 2 clean blocks, hence at
    * least one clean block PAIR — the two docs share that table's key
    * exactly, so recall for hamming ≤ 6 is structural, not
    * probabilistic.
    *
    * Why not single 8-bit bands (the previous layout): a band's key
    * space is 256 values, so at n ≫ 10⁵ every bucket holds ≥ n/256
    * docs — within-bucket pairing is then ~n²/256 candidates per band
    * (quadratic, regardless of capping), and any cap that bounds it
    * throws away true pairs precisely when scale arrives. The 16-bit
    * keys hold ~n/65536 docs per bucket: candidate volume stays
    * ~28·n²/65536, i.e. 900× sparser, and NO bucket saturates on
    * non-degenerate corpora (ScaleSpec pins recall = 1.0 on a 100k-doc
    * corpus with a fully saturated 8-bit band value).
    *
    * Degenerate bound: a bucket past `cap` (only reachable by
    * template/identical-signature mega-clusters — such docs collide in
    * ALL 28 tables) is row_number-sampled to `cap` members, keeping the
    * cluster detectable at C(cap,2) cost instead of quadratic; the
    * exact-dup pre-pass (q20) is the composed pipeline's first-line
    * shrink for those clusters.
    *
    * Input: (doc_id, sig64). Output: distinct (id_a, id_b), id_a < id_b.
    */
  private[graft] def simhashCandidates(sigs: DataFrame,
      cap: Int = SIMHASH_BUCKET_CAP): DataFrame = {
    val tabCols = for { i <- 0 until 8; j <- (i + 1) until 8 } yield struct(
      lit(i * 8 + j).as("tab"),
      (shiftright(col("sig64"), i * 8).bitwiseAND(lit(0xffL)) * 256L +
        shiftright(col("sig64"), j * 8).bitwiseAND(lit(0xffL))).as("key"))
    val keyed = sigs
      .select(col("doc_id"), explode(array(tabCols: _*)).as("tk"))
      .select(col("doc_id"), col("tk.tab").as("tab"), col("tk.key").as("key"))
    val w = Window.partitionBy("tab", "key").orderBy("doc_id")
    val capped = keyed
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap).drop("__r")
    capped.select(col("tab"), col("key"), col("doc_id").as("id_a"))
      .join(capped.select(col("tab"), col("key"), col("doc_id").as("id_b")),
        Seq("tab", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** SimHash-banded near-dup detection: 64-bit signature → 28
    * block-pair tables (16-bit keys, see [[simhashCandidates]]) →
    * key-collision candidates → exact shingle-Jaccard verify. Any pair
    * at hamming ≤ 6 has two clean 8-bit blocks, i.e. a clean block-pair
    * key, by pigeonhole — hamming-BOUNDED retrieval is the structural
    * guarantee, and the only one a simhash layout can make. (4×16
    * disjoint bands only guarantee hamming ≤ 3 — that layout missed two
    * hamming-5/6 true pairs; 8×8 disjoint bands guarantee ≤ 7 but their
    * 256-value key space collapses recall at corpus ≫ 10⁵ docs.)
    *
    * Oracle = that banding CONTRACT replayed end-to-end, NOT the brute
    * J ≥ 0.8 pair set: DuckDB rebuilds every signature (q26's HUGEINT
    * replay), the 28 block-pair keys, the deterministic doc_id-ordered
    * bucket cap, the key-collision candidates, and the exact verify.
    * The gate previously pinned q25's brute-force oracle, which encodes
    * the EMPIRICAL claim "every J ≥ 0.8 pair sits at hamming ≤ 6" —
    * true at sf0.01, false at sf0.1, where 4 of 256 true pairs land at
    * hamming ≥ 7 with no clean block-pair. Detector recall vs brute
    * force is therefore a MEASURED property (WebPipelineSpec floor 0.9;
    * 0.984 observed at sf0.1), not an oracle identity. */
  val q27 = Q.sql("q27_simhash_neardup", SimhashBandedOracle) { (s, d) =>
    // one corpus scan computes BOTH kernels (simhash for banding,
    // shingles for the verify), materialized once — without the
    // checkpoint the candidate and verify branches each re-scan and
    // re-run their kernel
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        Exprs.simhash64(Text.tokens(lower(col("text")))).as("sig64"),
        Text.shingles(Text.tokens(col("text")), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    // scale-safe candidate generation: 28 block-pair tables with the
    // deterministic doc_id-ordered bucket cap the oracle replays (see
    // simhashCandidates — ScaleSpec pins recall on a 100k-doc corpus
    // with a fully saturated 8-bit band value)
    val pairs = simhashCandidates(base.select(col("doc_id"), col("sig64")))
    verifyShinglePairs(base.select(col("doc_id"), col("sh")), pairs, 0.8)
  }

  /** Winnowing fingerprints (document sketch for plagiarism-style
    * near-dup): k=4-token shingles, window w=4. Oracled end-to-end: the
    * kernel's polynomial hash family (token poly-131 over code points,
    * gram poly-137 over token hashes, mod 2^61-1) is replayed verbatim
    * by DuckDB list_reduce/HUGEINT arithmetic, and the window-min +
    * dedup selection by slice minima — so sketch size AND the extreme
    * fingerprint values hash-compare exactly. */
  val q28 = Q.sql("q28_fingerprints",
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, len(t) AS n,
      |    list_transform(t, tk -> CAST(list_reduce(
      |      list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(tk) + 1),
      |                       i -> CAST(ascii(substr(tk, i, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT)) AS hs
      |  FROM tok),
      |gh AS (
      |  SELECT doc_id,
      |    CASE WHEN n >= 4 THEN
      |      list_transform(range(1, n - 4 + 2), i -> CAST(list_reduce(
      |        list_prepend(CAST(0 AS HUGEINT), hs[i : i + 3]),
      |        (a, b) -> (a * 137 + b) % 2305843009213693951) AS BIGINT))
      |    ELSE CAST([] AS BIGINT[]) END AS g
      |  FROM th),
      |fp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(g) = 0 THEN CAST([] AS BIGINT[])
      |         WHEN len(g) <= 4 THEN [list_min(g)]
      |         ELSE list_distinct(list_transform(range(1, len(g) - 4 + 2),
      |                                           j -> list_min(g[j : j + 3])))
      |    END AS fps
      |  FROM gh)
      |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
      |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
      |FROM fp ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        Exprs.winnow_fingerprints(Text.tokens(lower(col("text"))), 4, 4).as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("bigint").as("n_fingerprints"),
        // kernel output is sorted ascending: extremes are the ends
        when(size(col("fps")) > 0, element_at(col("fps"), 1)).as("min_fp"),
        when(size(col("fps")) > 0, element_at(col("fps"), size(col("fps"))))
          .as("max_fp"))
      .orderBy("doc_id")
  }

  /** TF-IDF-style distinctive terms per doc, top-3. The idf factor is the
    * LINEAR rarity N/df, not ln(N/df) (a transcendental would risk 1-ulp
    * library divergence across JVMs/libm and break the hash gate); the
    * score tf·N/df is a finite-decimal-capable integer quotient, so it
    * rounds half-up in INTEGERS (the q233 rule). Ranking follows the Q
    * determinism rules: rounded score + term tie-break. */
  val q38 = Q.sql("q38_tfidf_topterms",
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
      |    CAST((CAST(tf.tf AS BIGINT) * (SELECT count(*) FROM documents)
      |          * 20000 + df.df) // (2 * df.df) AS DOUBLE) / 10000.0 AS score
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, term, tf, df, score FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM scored) t
      |WHERE rn <= 3
      |ORDER BY doc_id, score DESC, term""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df is one row per distinct corpus term — unbounded at web scale, so
    // no broadcast hint: the join shuffles on term and AQE demotes it to
    // a broadcast only when the vocabulary actually fits
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      // integer half-up ten-thousandths of tf·N/df — the q233 rule
      .withColumn("score",
        expr(s"CAST((tf * ${n}L * 20000 + df) div (2 * df) AS DOUBLE)")
          / 10000.0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  /** Corpus-wide bigram frequency, top-20 (count desc, bigram tie-break) —
    * the n-gram language-model statistics pass. */
  val q39 = Q.sql("q39_ngram_freq",
    """WITH t AS (
      |  SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |b AS (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |                               i -> toks[i] || ' ' || toks[i+1])) AS bigram
      |  FROM t)
      |SELECT bigram, CAST(count(*) AS BIGINT) AS n
      |FROM b GROUP BY 1
      |ORDER BY n DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(Text.shingles(Text.tokens(col("text")), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** Gopher-style repetition filters: per-document duplicate-trigram
    * fraction (1 - distinct/total) and top-bigram fraction
    * (most-frequent-bigram count / total bigrams), with the boolean
    * drop decision a training pipeline applies. All three counters come
    * from the one-pass [[Exprs.repetition_stats]] codegen kernel — a
    * stateless map over the corpus, no shuffle, so the filter costs one
    * scan at 100 TB. Thresholds follow the Gopher paper's order of
    * magnitude (dup-trigram > 0.30 or top-bigram > 0.18).
    */
  val q64 = Q.sql("q64_repetition_filter",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |                                       i -> toks[i] || ' ' || toks[i+1])) AS g
      |  FROM t),
      |bstat AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |         CAST(max(c) AS BIGINT) AS top_bigram_cnt
      |  FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2) x GROUP BY 1),
      |tri AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
      |                                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
      |  FROM t),
      |tstat AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
      |         CAST(count(DISTINCT g) AS BIGINT) AS distinct_trigrams
      |  FROM tri GROUP BY 1)
      |SELECT b.doc_id, n_bigrams, top_bigram_cnt, n_trigrams, distinct_trigrams,
      |  CAST((top_bigram_cnt * 20000 + n_bigrams)
      |       // (2 * n_bigrams) AS DOUBLE) / 10000.0 AS top_bigram_frac,
      |  CAST(((n_trigrams - distinct_trigrams) * 20000 + n_trigrams)
      |       // (2 * n_trigrams) AS DOUBLE) / 10000.0 AS dup_trigram_frac,
      |  (CAST(((n_trigrams - distinct_trigrams) * 20000 + n_trigrams)
      |        // (2 * n_trigrams) AS DOUBLE) / 10000.0 > 0.30
      |   OR CAST((top_bigram_cnt * 20000 + n_bigrams)
      |        // (2 * n_bigrams) AS DOUBLE) / 10000.0 > 0.18) AS repetitive
      |FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
      |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
    val toks = Text.tokens(col("text"))
    val withStats = Tables.documents(s, d)
      .select(col("doc_id"),
        Exprs.repetition_stats(toks, 2).as("b"),
        Exprs.repetition_stats(toks, 3).as("t"))
      .filter(element_at(col("b"), 1) > 0 && element_at(col("t"), 1) > 0)
      .select(col("doc_id"),
        element_at(col("b"), 1).as("n_bigrams"),
        element_at(col("b"), 3).as("top_bigram_cnt"),
        element_at(col("t"), 1).as("n_trigrams"),
        element_at(col("t"), 2).as("distinct_trigrams"))
    withStats
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("top_bigram_frac",
        expr("CAST((top_bigram_cnt * 20000 + n_bigrams)"
          + " div (2 * n_bigrams) AS DOUBLE)") / 10000.0)
      .withColumn("dup_trigram_frac",
        expr("CAST(((n_trigrams - distinct_trigrams) * 20000 + n_trigrams)"
          + " div (2 * n_trigrams) AS DOUBLE)") / 10000.0)
      .withColumn("repetitive",
        col("dup_trigram_frac") > 0.30 || col("top_bigram_frac") > 0.18)
      .orderBy("doc_id")
  }

  /** Exact length quantiles per language — the corpus-statistics pass a
    * data pipeline runs before choosing chunk sizes and packing budgets
    * (and the engine's exact-quantile surface: `percentile` aggregates
    * with linear interpolation, matching DuckDB's `quantile_cont`).
    * Exact quantiles sort within each group at scale; for the
    * 100 TB approximate path use `percentile_approx` (t-digest, one
    * pass, mergeable) — approximate sketches can't be hash-gated against
    * another engine, so the exact variant is what the oracle checks. */
  val q70 = Q.sql("q70_length_quantiles",
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  round(quantile_cont(n_toks, 0.5), 4) AS p50,
      |  round(quantile_cont(n_toks, 0.9), 4) AS p90,
      |  CAST(max(n_toks) AS BIGINT) AS max_toks
      |FROM (SELECT lang, len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
      |      FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), size(Text.tokens(col("text"))).as("n_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(element_at(expr("percentile(n_toks, array(0.5D, 0.9D))"), 1), 4).as("p50"),
        round(element_at(expr("percentile(n_toks, array(0.5D, 0.9D))"), 2), 4).as("p90"),
        max(col("n_toks")).cast("long").as("max_toks"))
      .orderBy("lang")
  }

  /** Line-level (boilerplate) dedup — the C4/RefinedWeb rule applied
    * within this corpus: segment every doc into consecutive 3-token
    * "lines", drop any segment whose exact text occurs in ≥ 3 distinct
    * docs (cross-doc boilerplate), and reassemble the survivors in
    * order. Distinct from doc-level dedup: no doc is dropped, repeated
    * CONTENT is.
    *
    * Scale shape: one groupBy on the segment text (map-side partial
    * count-distinct; at web scale, group on a 16-byte hash of the
    * segment) to build the boilerplate set — which is small and
    * broadcasts into a left-anti join — then one groupBy doc_id to
    * reassemble. The doc text is shuffled once, as segments; the
    * reassembly collect_list is per-doc bounded. Tail tokens beyond the
    * last full segment are outside the rule on both sides. */
  val q75 = Q.sql("q75_line_dedup",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |seg AS (
      |  SELECT doc_id, g AS seg_id,
      |    array_to_string(list_slice(toks, g*3+1, g*3+3), ' ') AS seg
      |  FROM t, LATERAL unnest(range(0, len(toks) // 3)) AS u(g)),
      |boiler AS (
      |  SELECT seg FROM seg GROUP BY seg HAVING count(DISTINCT doc_id) >= 3),
      |kept AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(seg, ' ' ORDER BY seg_id) AS clean_text
      |  FROM seg WHERE seg NOT IN (SELECT seg FROM boiler)
      |  GROUP BY doc_id),
      |segs_per_doc AS (SELECT doc_id, count(*) AS n_segs FROM seg GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(coalesce(s.n_segs, 0) AS BIGINT) AS n_segs,
      |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  coalesce(k.clean_text, '') AS clean_text
      |FROM t LEFT JOIN segs_per_doc s ON t.doc_id = s.doc_id
      |       LEFT JOIN kept k ON t.doc_id = k.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    lineDedup(Tables.documents(s, d), width = 3, minDf = 3).orderBy("doc_id")
  }

  /** The q75 rule as a reusable operator over any (doc_id, text) frame:
    * segment into `width`-token lines, drop lines occurring in ≥ `minDf`
    * distinct docs, reassemble in order. */
  def lineDedup(documents: DataFrame, width: Int, minDf: Long): DataFrame = {
    val docs = documents
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    // guard: Spark sequence(0, n-1) DESCENDS when n == 0 — emit an empty
    // array for docs shorter than one segment (DuckDB range() is empty)
    val nSegs = floor(size(col("toks")) / width).cast("int")
    val segs = docs
      .select(col("doc_id"),
        posexplode(when(nSegs > 0,
          transform(sequence(lit(0), nSegs - 1),
            g => array_join(slice(col("toks"), g * width + 1, lit(width)), " ")))
          .otherwise(array().cast("array<string>"))))
      .withColumnRenamed("pos", "seg_id").withColumnRenamed("col", "seg")
    val boiler = segs.groupBy("seg")
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("seg"), lit(true).as("is_boiler"))
    // one pass over the marked segments yields total count, kept count,
    // and the ordered rebuild together (collect_list drops the nulls the
    // `when` leaves on boilerplate rows) — the corpus is segmented twice
    // (boiler build + apply), never a third time
    val perDoc = segs.join(boiler, Seq("seg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("is_boiler").isNull, 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("is_boiler").isNull,
            struct(col("seg_id"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_segs"), lit(0L)).cast("long").as("n_segs"),
        coalesce(col("n_kept"), lit(0L)).cast("long").as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** LM-based quality proxy: out-of-vocabulary fraction against the
    * corpus bigram LM table (top-200 bigrams by frequency, gram-lexical
    * tie-break). The KenLM-perplexity-filter shape without
    * transcendentals: per-doc gram explode → broadcast join against the
    * (small, capped) LM table → per-doc refold. One shuffle to build the
    * table, one to refold; the LM side stays bounded by construction. */
  val q78 = Q.sql("q78_lm_oov",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |                                       i -> toks[i] || ' ' || toks[i+1])) AS g
      |  FROM t),
      |lm AS (
      |  SELECT g FROM (SELECT g, count(*) AS c FROM bi GROUP BY 1
      |                 ORDER BY c DESC, g LIMIT 200)),
      |st AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    sum(CASE WHEN g IN (SELECT g FROM lm) THEN 1 ELSE 0 END) AS n_inlm
      |  FROM bi GROUP BY 1)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(n_inlm AS BIGINT) AS n_inlm,
      |  CAST((CAST(n_bigrams - n_inlm AS BIGINT) * 20000 + n_bigrams)
      |       // (2 * n_bigrams) AS DOUBLE) / 10000.0 AS oov_frac
      |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(Text.shingles(Text.tokens(col("text")), 2)).as("g"))
    val lm = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(200)
      .select(col("g"), lit(1L).as("inlm"))
    grams.join(broadcast(lm), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("inlm"), lit(0L))).as("n_inlm"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("oov_frac",
        expr("CAST(((n_bigrams - n_inlm) * 20000 + n_bigrams)"
          + " div (2 * n_bigrams) AS DOUBLE)") / 10000.0)
      .orderBy("doc_id")
  }

  /** HTML-to-text extraction (the WET step of a web-crawl pipeline):
    * each doc is wrapped into a deterministic page — script and style
    * blocks, tags, entities — and [[Text.stripHtml]] must recover the
    * readable text. The raw form is synthesized from the table (same
    * approach as the PII gate) since the corpus ships as plain text;
    * both engines build and strip the page with the same RE2-compatible
    * patterns. Stateless regexp chain — one scan, no shuffle, fusable
    * with the other shaping passes. */
  val q87 = Q.sql("q87_html_strip",
    """WITH pages AS (
      |  SELECT doc_id,
      |    '<html><head><script type="text/javascript">var t = 1 &lt; 2;</script>' ||
      |    '<style>p { color: red; }</style></head>' ||
      |    '<!-- nav: <div class="menu"> hidden -->' ||
      |    '<!-- <script>dead()</script> --><body><h1>' || lang ||
      |    '</h1><p>' || text || ' &amp; more &nbsp;</p></body></html>' AS page
      |  FROM documents)
      |SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(page,
      |        '(?s)<!--.*?-->', ' ', 'g'),
      |        '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      |        '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
      |        '<[^>]+>', ' ', 'g'),
      |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&nbsp;', ' ', 'g'),
      |        '&amp;', '&', 'g'),
      |    '\s+', ' ', 'g')) AS clean
      |FROM pages ORDER BY doc_id""".stripMargin) { (s, d) =>
    val page = concat(
      lit("""<html><head><script type="text/javascript">var t = 1 &lt; 2;</script>"""),
      lit("<style>p { color: red; }</style></head>"),
      lit("""<!-- nav: <div class="menu"> hidden -->"""),
      lit("""<!-- <script>dead()</script> --><body><h1>"""), col("lang"),
      lit("</h1><p>"), col("text"), lit(" &amp; more &nbsp;</p></body></html>"))
    Tables.documents(s, d)
      .select(col("doc_id"), Text.stripHtml(page).as("clean"))
      .orderBy("doc_id")
  }

  // good char → its mojibake form, from the single table the repair
  // chain runs; the gate corrupts and repairs from the same source so
  // the two sides cannot drift
  private val Moji: Map[String, String] =
    Text.MojibakeFixes.map { case (bad, good) => good -> bad }.toMap
  private val MojiSuffix =
    s" ${Moji("“")}quoted${Moji("”")} ${Moji("—")} y${Moji("é")}s${Moji("…")}"
  private val MojiFixChainSql: String =
    Text.MojibakeFixes.foldLeft("t") { case (acc, (bad, good)) =>
      s"replace($acc, '$bad', '$good')"
    }

  /** Encoding repair (the ftfy step of a web-crawl pipeline): classic
    * UTF-8-read-as-cp1252 mojibake sequences restored by the
    * single-pass longest-match kernel over [[Text.MojibakeFixes]]. The
    * corrupted form is synthesized from the corpus with the same table
    * that drives the repair — corruption, suffix, and the oracle's
    * replace chain all interpolate from one Seq. The oracle CAN be a
    * chain here (DuckDB has no scanner): chain ≡ scanner whenever no
    * lossy bare close-quote directly abuts another sequence, and the
    * synthesized corruption keeps ASCII between all sequences; the
    * adjacent-sequence case the chain gets wrong is PropertySpec's job.
    * Stateless map, no shuffle. */
  val q88 = Q.sql("q88_fix_mojibake",
    s"""WITH c AS (
       |  SELECT doc_id,
       |    replace(replace(text, 'e', '${Moji("é")}'), 'a', '${Moji("á")}') ||
       |    '$MojiSuffix' AS t
       |  FROM documents)
       |SELECT doc_id, $MojiFixChainSql AS fixed
       |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    val corrupted = concat(
      replace(replace(col("text"), lit("e"), lit(Moji("é"))),
        lit("a"), lit(Moji("á"))),
      lit(MojiSuffix))
    Tables.documents(s, d)
      .select(col("doc_id"), Text.fixMojibake(corrupted).as("fixed"))
      .orderBy("doc_id")
  }

  /** Hashed-feature linear quality classifier — the fasttext-style
    * model-application shape (the GPT-3/LLaMA "wiki-like" filter): each
    * token hashes into one of [[QcBuckets]] feature buckets, the
    * bucket's weight is looked up, and the document's score is the
    * weight sum — a pretrained linear model applied at corpus scale
    * with NO model table to join (the hashing trick folds the lookup
    * into the hash). Weights here derive deterministically from the
    * bucket id via the same poly-131·G chain (a stand-in for trained
    * coefficients — the gate pins the scoring MACHINERY: hashing,
    * bucket weights, integer accumulation, the accept threshold).
    *
    * Scale: stateless map + one groupBy(doc) — one scan, no joins, no
    * broadcast; swapping in real trained weights replaces the weight
    * derivation with a 2^[[QcBuckets]]-entry broadcast array and
    * changes nothing else. */
  val QcBuckets = 1024L

  val q209 = Q.sql("q209_linear_quality",
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |hb AS (
       |  SELECT doc_id,
       |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(tok) + 1),
       |                     c -> CAST(ascii(substr(tok, c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 % $QcBuckets AS BIGINT)
       |      AS b
       |  FROM tk),
       |ww AS (
       |  SELECT b,
       |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(ks) + 1),
       |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 % 2001 AS BIGINT) - 1000
       |      AS w
       |  FROM (SELECT b, 'w:' || CAST(b AS VARCHAR) AS ks
       |        FROM (SELECT DISTINCT b FROM hb))),
       |s AS (
       |  SELECT hb.doc_id, count(*) AS n_tokens,
       |    CAST(sum(ww.w) AS BIGINT) AS score_milli
       |  FROM hb JOIN ww USING (b) GROUP BY 1)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score_milli,
       |  CAST((score_milli * 20000
       |        + CASE WHEN score_milli < 0 THEN -n_tokens ELSE n_tokens END)
       |       // (2 * n_tokens) AS DOUBLE) / 10000.0 AS mean_w,
       |  score_milli > 0 AS accept
       |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.Sketches.Kmv
    Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("b",
        pmod(Exprs.mulmod61(Exprs.poly_hash(col("tok")), Kmv.G), lit(QcBuckets)))
      .withColumn("w",
        pmod(Exprs.mulmod61(
          Exprs.poly_hash(concat(lit("w:"), col("b").cast("string"))), Kmv.G),
          lit(2001L)) - 1000L)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("w").cast("long").as("score_milli"))
      // sign-aware integer half-AWAY ten-thousandths (score can be
      // negative; both engines' integer division truncates toward zero,
      // so ±n keeps the half rounding away from zero — matching what
      // float round would do, minus its half-boundary engine split)
      .withColumn("mean_w",
        expr("CAST((score_milli * 20000 + CASE WHEN score_milli < 0"
          + " THEN -n_tokens ELSE n_tokens END)"
          + " div (2 * n_tokens) AS DOUBLE)") / 10000.0)
      .withColumn("accept", col("score_milli") > 0)
      .orderBy("doc_id")
  }

  /** Precision/recall curve of the hashed classifier against the
    * rule-based quality labels — the shadow-deploy comparison a team
    * runs before swapping a model filter in for its rule predecessor:
    * q209's linear score thresholded at five operating points, scored
    * against q22's rule decision (quality ≥ 0.5) as the reference
    * label. Counts exact; precision/recall round HALF-UP in integers
    * ((tp·2·10⁴ + d) div 2d — the operators.Q rule: these quotients
    * are finite decimals, where float round splits engines), NULL when
    * a threshold yields no positives. One pass computes the score and
    * label per doc; the curve is a 5-row aggregate. */
  val PrThresholds = Seq(-2000L, -1000L, 0L, 1000L, 2000L)

  val q236 = Q.sql("q236_classifier_pr_curve", {
    val taus = PrThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH ql AS (
       |  SELECT doc_id,
       |    round(0.4 * least(length(text)/500.0, 1.0)
       |        + 0.3 * (1.0 - least(5.0*(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
       |        + 0.3 * least(4.0*len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> list_contains(['the','and','of','to','in','is','a'], x))) / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 1.0)
       |    , 4) >= 0.5 AS label
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |hb AS (
       |  SELECT doc_id,
       |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(tok) + 1),
       |                     c -> CAST(ascii(substr(tok, c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 % $QcBuckets AS BIGINT)
       |      AS b
       |  FROM tk),
       |ww AS (
       |  SELECT b,
       |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(ks) + 1),
       |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 % 2001 AS BIGINT) - 1000
       |      AS w
       |  FROM (SELECT b, 'w:' || CAST(b AS VARCHAR) AS ks
       |        FROM (SELECT DISTINCT b FROM hb))),
       |sc AS (
       |  SELECT hb.doc_id, CAST(sum(ww.w) AS BIGINT) AS score
       |  FROM hb JOIN ww USING (b) GROUP BY 1),
       |j AS (
       |  SELECT sc.doc_id, sc.score, ql.label
       |  FROM sc JOIN ql USING (doc_id)),
       |t(tau) AS (VALUES $taus),
       |m AS (
       |  SELECT t.tau,
       |    CAST(sum(CASE WHEN score > tau AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN score > tau AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN score <= tau AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM j CROSS JOIN t GROUP BY 1)
       |SELECT CAST(tau AS BIGINT) AS tau, tp, fp, fn,
       |  CAST((tp * 20000 + (tp + fp)) // NULLIF(2 * (tp + fp), 0) AS DOUBLE)
       |    / 10000.0 AS precision_v,
       |  CAST((tp * 20000 + (tp + fn)) // NULLIF(2 * (tp + fn), 0) AS DOUBLE)
       |    / 10000.0 AS recall_v
       |FROM m ORDER BY tau""".stripMargin
  }) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    val ql = Tables.documents(s, d)
      .select(col("doc_id"), (Text.qualityScore(col("text")) >= 0.5).as("label"))
    val sc = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("b",
        pmod(Exprs.mulmod61(Exprs.poly_hash(col("tok")), Kmv.G), lit(QcBuckets)))
      .withColumn("w",
        pmod(Exprs.mulmod61(
          Exprs.poly_hash(concat(lit("w:"), col("b").cast("string"))), Kmv.G),
          lit(2001L)) - 1000L)
      .groupBy("doc_id").agg(sum("w").cast("long").as("score"))
    val spark = s
    import spark.implicits._
    val taus = PrThresholds.toDF("tau")
    sc.join(ql, "doc_id")
      .crossJoin(broadcast(taus))
      .groupBy("tau")
      .agg(
        sum(when(col("score") > col("tau") && col("label"), 1L).otherwise(0L))
          .cast("long").as("tp"),
        sum(when(col("score") > col("tau") && !col("label"), 1L).otherwise(0L))
          .cast("long").as("fp"),
        sum(when(col("score") <= col("tau") && col("label"), 1L).otherwise(0L))
          .cast("long").as("fn"))
      .select(col("tau"), col("tp"), col("fp"), col("fn"),
        (expr("CAST((tp * 20000 + (tp + fp)) div nullif(2 * (tp + fp), 0) AS DOUBLE)")
          / 10000.0).as("precision_v"),
        (expr("CAST((tp * 20000 + (tp + fn)) div nullif(2 * (tp + fn), 0) AS DOUBLE)")
          / 10000.0).as("recall_v"))
      .orderBy("tau")
  }

  /** ROUGE-1/2 pair scoring — the n-gram overlap metric summarization
    * and near-dup analyses share, computed at corpus scale over
    * deterministic (even, odd) adjacent-id document pairs: multiset
    * unigram/bigram overlap Σ min(cA, cB), with F1 collapsing to
    * 2·overlap/(|A|+|B|) (the harmonic identity — no separate P and R
    * divisions to drift), rounded half-up in integers (operators.Q
    * rule). One gram-count aggregation per side, one join on the gram
    * key — the same shuffle shape as the dedup family. */
  val q244 = Q.sql("q244_rouge_pairs",
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |u AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(toks) AS tok FROM tk) GROUP BY 1, 2),
      |bgr AS (
      |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i+1])) AS g
      |    FROM tk) GROUP BY 1, 2),
      |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM tk),
      |o1 AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov1
      |  FROM u a JOIN u b ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok
      |  WHERE a.doc_id % 2 = 0 GROUP BY 1, 2),
      |o2 AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov2
      |  FROM bgr a JOIN bgr b ON b.doc_id = a.doc_id + 1 AND b.g = a.g
      |  WHERE a.doc_id % 2 = 0 GROUP BY 1, 2)
      |SELECT o1.doc_a, o1.doc_b, o1.ov1,
      |  CAST((2 * o1.ov1 * 20000 + (na.nt + nb.nt))
      |       // (2 * (na.nt + nb.nt)) AS DOUBLE) / 10000.0 AS r1_f,
      |  COALESCE(o2.ov2, 0) AS ov2,
      |  CAST((2 * COALESCE(o2.ov2, 0) * 20000 + (na.nt - 1 + nb.nt - 1))
      |       // (2 * (na.nt - 1 + nb.nt - 1)) AS DOUBLE) / 10000.0 AS r2_f
      |FROM o1 LEFT JOIN o2 ON o2.doc_a = o1.doc_a
      |JOIN n na ON na.doc_id = o1.doc_a
      |JOIN n nb ON nb.doc_id = o1.doc_b
      |ORDER BY o1.doc_a""".stripMargin) { (s, d) =>
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .localCheckpoint(true) // unigram, bigram, and length tables read it
    val u = tk.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("c"))
    val bgr = tk.select(col("doc_id"),
        explode(Text.shingles(col("toks"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).cast("long").as("c"))
    val n = tk.select(col("doc_id"), size(col("toks")).cast("long").as("nt"))
    def overlap(grams: org.apache.spark.sql.DataFrame, key: String, out: String) =
      grams.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("doc_a"), col(key).as("k"), col("c").as("ca"))
        .join(grams.select((col("doc_id") - 1).as("doc_a"), col(key).as("k"),
          col("c").as("cb")), Seq("doc_a", "k"))
        .groupBy("doc_a").agg(sum(least(col("ca"), col("cb"))).cast("long").as(out))
    val o1 = overlap(u, "tok", "ov1")
    val o2 = overlap(bgr, "g", "ov2")
    o1.withColumn("doc_b", col("doc_a") + 1)
      .join(o2, Seq("doc_a"), "left").na.fill(0L, Seq("ov2"))
      .join(n.select(col("doc_id").as("doc_a"), col("nt").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("nt").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ov1"),
        (expr("CAST((2 * ov1 * 20000 + (na + nb)) div (2 * (na + nb)) AS DOUBLE)")
          / 10000.0).as("r1_f"),
        col("ov2"),
        (expr("CAST((2 * ov2 * 20000 + (na - 1 + nb - 1)) div (2 * (na - 1 + nb - 1)) AS DOUBLE)")
          / 10000.0).as("r2_f"))
      .orderBy("doc_a")
  }

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q38, q39, q64, q70, q75, q78, q87, q88, q209, q236, q244)
}
