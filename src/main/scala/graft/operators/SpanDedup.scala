package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Exact duplicated-span removal — substring-level dedup at k-token
  * granularity (the "dedup long repeated spans" step of a training-data
  * pipeline, à la Lee et al. 2022's exact-substring dedup, bounded to
  * k-gram resolution so it stays a hash-join problem instead of a
  * suffix-array build): any k-token span whose hash occurs in ≥
  * `minDocs` distinct documents is boilerplate; every token covered by
  * such a span is dropped and the survivors reassemble in order.
  *
  * Sits between exact doc-dedup (q20, whole-text) and line dedup (q75,
  * line granularity): spans cross line boundaries and don't need
  * documents or lines to match wholly.
  *
  * Scale shape: grams ride the shuffle as slim (doc_id, pos, hash64)
  * triples — never token arrays; the duplicated-hash side is
  * df-filtered (HAVING distinct-docs ≥ minDocs) so it is a small
  * fraction of the gram stream, and the cover join is a plain shuffle
  * join on the hash followed by one per-doc aggregate. Token rebuild is
  * a stateless higher-order filter over the (checkpointed) token
  * arrays. At 100 TB the duplicated-hash side can also feed a Bloom
  * prefilter exactly like q83's decontamination — same shape.
  *
  * The gram hash is the oracle-replayable poly-131 family
  * ([[graft.functions.TextKernels.polyHash131]]), so DuckDB recomputes
  * every hash, the duplicate set, the coverage, and the md5 of the
  * rebuilt text — the gate pins the operator end-to-end.
  */
object SpanDedup {

  val SpanTokens = 8
  val MinDocs = 2

  /** (doc_id, n_tokens, n_dropped, clean_md5): per-doc token counts and
    * the digest of the reassembled text with duplicated spans removed. */
  def cleanSpans(spark: SparkSession, docs: DataFrame,
      k: Int = SpanTokens, minDocs: Int = MinDocs): DataFrame = {
    // tokenize once: gram generation and the rebuild both branch from
    // this frame (same materialize-once rule as q25/q54, plan-pinned)
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .localCheckpoint(true)
    val grams = toks
      .select(col("doc_id"),
        posexplode(Exprs.word_ngrams(col("t"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), Exprs.poly_hash(col("g")).as("gh"))
    val dup = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gh")
    val starts = grams.join(dup, "gh")
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .withColumn("starts", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", expr(
        s"transform(filter(sequence(0, size(t) - 1), " +
          s"p -> NOT exists(starts, s -> p >= s AND p < s + $k)), " +
          "p -> element_at(t, p + 1))"))
      .select(col("doc_id"),
        size(col("t")).cast("bigint").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("bigint").as("n_dropped"),
        md5(array_join(col("kept"), " ").cast("binary")).as("clean_md5"))
  }

  /** Gate: duplicated 8-token spans across ≥2 docs removed; DuckDB
    * replays the gram hashes (poly-131 over the gram string's code
    * points), the distinct-doc duplicate set, the coverage filter, and
    * the md5 of the rebuilt text. */
  val q99 = Q.sql("q99_span_dedup",
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length(gs) + 1),
       |                     c -> CAST(ascii(substr(gs, c, 1)) AS HUGEINT))),
       |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS gh
       |  FROM (SELECT doc_id, i, array_to_string(t[i : i + ${SpanTokens - 1}], ' ') AS gs
       |        FROM tok, LATERAL unnest(range(1, len(t) - $SpanTokens + 2)) u(i))),
       |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= $MinDocs),
       |starts AS (
       |  SELECT doc_id, list(pos) AS ss FROM g JOIN dup USING (gh) GROUP BY doc_id),
       |c AS (
       |  SELECT t.doc_id, t.t, coalesce(s.ss, CAST([] AS BIGINT[])) AS ss
       |  FROM tok t LEFT JOIN starts s ON t.doc_id = s.doc_id),
       |r AS (
       |  SELECT doc_id, len(t) AS n,
       |    list_transform(
       |      list_filter(range(0, len(t)),
       |        p -> len(list_filter(ss, s -> p >= s AND p < s + $SpanTokens)) = 0),
       |      p -> t[p + 1]) AS kept
       |  FROM c)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(n - len(kept) AS BIGINT) AS n_dropped,
       |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
       |  md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
       |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    cleanSpans(s, Tables.documents(s, d)).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q99)
}
