package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** The flagship composition gate: the whole training-data shaping
  * pipeline as ONE dataflow, each stage the already-gated rule —
  *
  *  1. line-level boilerplate removal (q75 rule: 3-token segments,
  *     drop df ≥ 3, reassemble) and keep docs with ≥ 1 surviving segment;
  *  2. exact dedup on the CLEANED text (q20 rule: min doc_id survives) —
  *     boilerplate stripping can make near-identical docs exactly equal,
  *     which is why this stage runs second;
  *  3. quality gate: ≥ 20 clean tokens;
  *  4. deterministic 50% sample by salted content hash (q67 rule,
  *     distinct salt);
  *  5. context-window chunking of the survivors (q68 rule: 32-token
  *     windows, stride 24).
  *
  * The oracle replays the same five stages as one CTE chain, so the gate
  * checks the COMPOSITION — stage ordering, column handoff, and the
  * dedup-after-cleaning interaction — not just each piece. Plan shape:
  * stages 2–5 add one groupBy (16-byte digest shuffle) and stateless
  * maps on top of q75's two segment passes; nothing quadratic, nothing
  * collected.
  */
object TrainingPipeline {

  val q80 = Q.sql("q80_training_pipeline",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |seg AS (
      |  SELECT doc_id, g AS seg_id,
      |    array_to_string(list_slice(toks, g*3+1, g*3+3), ' ') AS seg
      |  FROM t, LATERAL unnest(range(0, len(toks) // 3)) AS u(g)),
      |boiler AS (
      |  SELECT seg FROM seg GROUP BY seg HAVING count(DISTINCT doc_id) >= 3),
      |cleaned AS (
      |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_id) AS clean_text
      |  FROM seg WHERE seg NOT IN (SELECT seg FROM boiler)
      |  GROUP BY doc_id),
      |deduped AS (
      |  SELECT min(doc_id) AS doc_id, clean_text
      |  FROM cleaned GROUP BY clean_text),
      |gated AS (
      |  SELECT doc_id, clean_text,
      |    regexp_split_to_array(trim(clean_text), '\s+') AS ctoks
      |  FROM deduped
      |  WHERE len(regexp_split_to_array(trim(clean_text), '\s+')) >= 20),
      |sampled AS (
      |  SELECT doc_id, ctoks FROM gated
      |  WHERE substr(md5('pipe:' || clean_text), 1, 2) < '80'),
      |chunks AS (
      |  SELECT doc_id,
      |    unnest(range(0, 1 + (CASE WHEN len(ctoks) > 32 THEN (len(ctoks) - 32 + 23) // 24 ELSE 0 END))) AS chunk_id,
      |    ctoks
      |  FROM sampled)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(len(list_slice(ctoks, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(ctoks, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk
      |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val winSize = 32
    val stride = 24
    val cleaned = TextOps.lineDedup(Tables.documents(s, d), width = 3, minDf = 3)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text"))
    val deduped = cleaned
      .groupBy("clean_text").agg(min(col("doc_id")).as("doc_id"))
    val gated = deduped
      .withColumn("ctoks", Text.tokens(col("clean_text")))
      .filter(size(col("ctoks")) >= 20)
    val sampled = gated
      .filter(substring(md5(concat(lit("pipe:"), col("clean_text")).cast("binary")), 1, 2)
        < lit("80"))
      .select(col("doc_id"), col("ctoks"), size(col("ctoks")).as("n_toks"))
    sampled
      .select(col("doc_id"), col("ctoks"),
        explode(sequence(lit(0),
          when(col("n_toks") > winSize,
            floor((col("n_toks") - winSize + (stride - 1)) / stride)).otherwise(0)
            .cast("int"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("ctoks"), col("chunk_id") * stride + 1, lit(winSize)).as("cts"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("cts")).cast("long").as("n_tokens"),
        array_join(col("cts"), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic shard shuffle — the last step before a training run:
    * every doc gets a content-hash shard (16 here) and a stable
    * pseudo-random position inside it, so the "shuffled" dataset is
    * byte-reproducible across reruns and machines and uncorrelated with
    * the split/sample/cap hashes (distinct salts). The gate materializes
    * the explicit per-shard rank for the oracle compare; a production
    * writer skips the global row_number — `repartition(shard)` +
    * `sortWithinPartitions(pos_key)` gives each output file the same
    * order with no rank computed, and shard count scales with the
    * cluster (16 is gate-sized, 100 TB wants thousands — the hash nibble
    * count is the only knob). */
  val q85 = Q.sql("q85_shard_shuffle",
    """WITH t AS (
      |  SELECT doc_id,
      |    strpos('0123456789abcdef', substr(md5('shard:' || text), 1, 1)) - 1 AS shard,
      |    md5('pos:' || text) AS pos_key
      |  FROM documents)
      |SELECT CAST(shard AS BIGINT) AS shard, doc_id,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY pos_key, doc_id)
      |       AS BIGINT) AS pos
      |FROM t ORDER BY shard, pos""".stripMargin) { (s, d) =>
    shardShuffle(Tables.documents(s, d)).orderBy("shard", "pos")
  }

  /** The q85 rule as a reusable operator: content-hash shard + explicit
    * stable in-shard rank. */
  def shardShuffle(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = conv(substring(
      md5(concat(lit("shard:"), col("text")).cast("binary")), 1, 1), 16, 10)
      .cast("long")
    val posKey = md5(concat(lit("pos:"), col("text")).cast("binary"))
    docs
      .select(col("doc_id"), shard.as("shard"), posKey.as("pos_key"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("pos_key", "doc_id"))
        .cast("long"))
      .select("shard", "doc_id", "pos")
  }

  /** Epoch mixing — the data-mixing knob expressed as repetition: each
    * language stratum is repeated `n` times (scarce languages upsampled,
    * the dominant one seen once), each copy tagged with its epoch index
    * so downstream shuffling can interleave epochs. One broadcast join +
    * a stateless `explode(sequence(...))` — no shuffle at any scale; the
    * output is a lazy row multiplier, never a materialized copy. */
  val q86 = Q.sql("q86_epoch_mix",
    """WITH m AS (SELECT * FROM (VALUES ('en', 1), ('es', 2), ('fr', 3),
      |                                 ('de', 2), ('zh', 1)) m(lang, n))
      |SELECT d.doc_id, d.lang, CAST(unnest(range(m.n)) AS BIGINT) AS epoch
      |FROM documents d JOIN m ON d.lang = m.lang
      |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
    import s.implicits._
    val mix = Seq(("en", 1), ("es", 2), ("fr", 3), ("de", 2), ("zh", 1))
      .toDF("lang", "n")
    epochMix(Tables.documents(s, d), mix).orderBy("doc_id", "epoch")
  }

  /** The q86 rule as a reusable operator: `mix` is a (lang, n) repeat
    * table; docs gain one epoch-tagged copy per repeat. Rows with
    * n ≤ 0 mean "exclude the stratum" and are filtered BEFORE the
    * sequence — Spark's `sequence(0, -1)` would otherwise step
    * backwards and emit two phantom epochs. */
  def epochMix(docs: org.apache.spark.sql.DataFrame,
      mix: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .join(broadcast(mix.filter(col("n") >= 1)), "lang")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0L), col("n").cast("long") - 1)).as("epoch"))

  /** Web-curation pipeline — the round-6 operators composed end to end
    * the way a pretraining ingest actually chains them:
    * Gopher CORE rules (word count / mean word length / symbol ratio /
    * alpha fraction — the stopword/line rules are corpus config and
    * stay off for this vocabulary) → C4 line filtering + majority-drop
    * → exact dedup on the CLEANED text digest (template dups collapse
    * only after boilerplate lines go) → temperature-budgeted selection
    * (α = 0.5 mixture targets for a 200-doc budget, q77's salted-hash
    * rank inside each source). The oracle replays all four stages as
    * one CTE chain, so stage ORDER and handoff are pinned, not just the
    * pieces. Every stage is a stateless map or a slim keyed agg; the
    * only window partitions by source (bounded cardinality). */
  // The composed stages interpolate WebQuality's own constants — a
  // width/blocklist change there follows through this oracle too.
  private val W136 = graft.operators.WebQuality.LineWidth
  private val Block136 =
    graft.operators.WebQuality.BlockTerms.map("'" + _ + "'").mkString(",")
  private val Budget136 = 200 // selection budget (docs)

  val q136 = Q.sql("q136_web_curation",
    s"""WITH t AS (
      |  SELECT doc_id, text, source,
      |    regexp_split_to_array(trim(text), '\\s+') AS toks
      |  FROM documents),
      |core AS (
      |  SELECT doc_id, toks FROM (
      |    SELECT doc_id, toks,
      |      CAST(len(toks) AS BIGINT) AS n_words,
      |      CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_len,
      |      CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
      |      CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
      |      CAST(len(regexp_extract_all(text, '\\.\\.\\.'))
      |        + length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_ellipsis
      |    FROM t)
      |  WHERE n_words BETWEEN 50 AND 100000
      |    AND sum_len >= n_words*3 AND sum_len <= n_words*10
      |    AND (n_hash + n_ellipsis)*10 <= n_words
      |    AND alpha_words*10 >= n_words*8),
      |cl AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(range(0, (len(toks)+${W136 - 1})//$W136),
      |      g -> list_slice(toks, g*$W136+1, g*$W136+$W136)),
      |      a -> len(a) >= 3 AND NOT list_has_any(a, [$Block136])) AS kept,
      |    (len(toks)+${W136 - 1})//$W136 AS n_lines
      |  FROM core),
      |cleaned AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_transform(kept, a -> array_to_string(a, ' ')),
      |        chr(10))) AS clean_md5
      |  FROM cl WHERE NOT (len(kept)*10 < n_lines*5)),
      |deduped AS (
      |  SELECT clean_md5, min(doc_id) AS doc_id FROM cleaned GROUP BY 1),
      |ws AS (
      |  SELECT dd.doc_id, t.source FROM deduped dd JOIN t ON dd.doc_id = t.doc_id),
      |cnt AS (
      |  SELECT source,
      |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS w
      |  FROM ws GROUP BY 1),
      |tg AS (
      |  SELECT source,
      |    CAST(w * $Budget136 // (SELECT CAST(sum(w) AS BIGINT) FROM cnt) AS BIGINT) AS target
      |  FROM cnt),
      |rk AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('sel:' || CAST(doc_id AS VARCHAR)), doc_id) AS sel_rank
      |  FROM ws)
      |SELECT r.doc_id, r.source, CAST(r.sel_rank AS BIGINT) AS sel_rank
      |FROM rk r JOIN tg ON r.source = tg.source
      |WHERE r.sel_rank <= tg.target
      |ORDER BY r.doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val budget = Budget136
    val core = WebQuality.gopherStats(docs)
      .filter(col("r_wordcount") && col("r_meanwordlen") &&
        col("r_symbol") && col("r_alpha"))
      .select("doc_id")
    val cleaned = WebQuality.c4LineFilter(docs.join(core, "doc_id"))
      .filter(!col("dropped"))
      .select(col("doc_id"), col("clean_md5"))
    val deduped = cleaned.groupBy("clean_md5").agg(min("doc_id").as("doc_id"))
    val withSrc = deduped.join(docs.select("doc_id", "source"), "doc_id")
    val counts = withSrc.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        round(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
    val targets = counts.crossJoin(counts.agg(sum("w").as("total")))
      .select(col("source"), expr(s"w * $budget div total").as("target"))
    val rankW = Window.partitionBy("source").orderBy(
      md5(concat(lit("sel:"), col("doc_id").cast("string")).cast("binary")),
      col("doc_id"))
    withSrc
      .withColumn("sel_rank", row_number().over(rankW).cast("long"))
      .join(targets, "source") // targets side is tiny → broadcast
      .filter(col("sel_rank") <= col("target"))
      .select(col("doc_id"), col("source"), col("sel_rank"))
      .orderBy("doc_id")
  }

  /** Preference-pair construction — the DPO/RLHF data shape: within
    * each (lang, source) stratum, pair the highest-quality document
    * (chosen) with the lowest (rejected), quality = the q22 scorer.
    * Ties broken by doc_id on the chosen side and doc_id DESC on the
    * rejected side, so equal-quality strata still pair two DISTINCT
    * docs whenever the stratum has ≥ 2; single-doc (or fully-degenerate)
    * strata drop via the inequality filter. The margin is one identical
    * IEEE subtraction of two already-rounded doubles — no re-rounding,
    * so no signed-zero seam (equal operands give +0.0 in both engines).
    *
    * Scale: one stateless scoring scan, then two row_number windows
    * over the same (lang, source) shuffle — rank-1 rows only; the
    * stratum count, not the corpus, bounds the join. */
  val q170 = Q.sql("q170_preference_pairs",
    """WITH q AS (
      |  SELECT doc_id, lang, source,
      |    round(0.4 * least(length(text)/500.0, 1.0)
      |        + 0.3 * (1.0 - least(5.0*(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
      |        + 0.3 * least(4.0*len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> list_contains(['the','and','of','to','in','is','a'], x))) / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
      |    , 4) AS quality
      |  FROM documents WHERE text IS NOT NULL),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY lang, source
      |                       ORDER BY quality DESC, doc_id) AS rc,
      |    row_number() OVER (PARTITION BY lang, source
      |                       ORDER BY quality ASC, doc_id DESC) AS rr
      |  FROM q)
      |SELECT c.lang, c.source,
      |  c.doc_id AS chosen_id, j.doc_id AS rejected_id,
      |  c.quality AS chosen_q, j.quality AS rejected_q,
      |  c.quality - j.quality AS margin
      |FROM (SELECT * FROM r WHERE rc = 1) c
      |JOIN (SELECT * FROM r WHERE rr = 1) j USING (lang, source)
      |WHERE c.doc_id <> j.doc_id
      |ORDER BY lang, source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val q = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        Text.qualityScore(col("text")).as("quality"))
    val byStratum = Window.partitionBy("lang", "source")
    val r = q
      .withColumn("rc", row_number().over(
        byStratum.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("rr", row_number().over(
        byStratum.orderBy(col("quality").asc, col("doc_id").desc)))
    val c = r.filter(col("rc") === 1)
      .select(col("lang"), col("source"),
        col("doc_id").as("chosen_id"), col("quality").as("chosen_q"))
    val j = r.filter(col("rr") === 1)
      .select(col("lang"), col("source"),
        col("doc_id").as("rejected_id"), col("quality").as("rejected_q"))
    c.join(j, Seq("lang", "source"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(col("lang"), col("source"), col("chosen_id"), col("rejected_id"),
        col("chosen_q"), col("rejected_q"),
        (col("chosen_q") - col("rejected_q")).as("margin"))
      .orderBy("lang", "source")
  }

  val all: Seq[Q] = Seq(q80, q85, q86, q136, q170)
}
