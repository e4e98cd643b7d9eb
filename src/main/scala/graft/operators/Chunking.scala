package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Sequence-shaping operators — the last mile between a cleaned corpus
  * and a training run:
  *
  *  - **chunking**: split long documents into fixed-size token windows
  *    with overlap (context-window fitting). A per-row expression chain
  *    (tokens → start offsets → slice → join), so it is a stateless map:
  *    no shuffle, one scan at 100 TB.
  *  - **packing**: concatenate short documents into fixed-token-budget
  *    training sequences. Greedy running-total packing via ONE window
  *    pass per stratum: a doc's sequence id is its exclusive cumulative
  *    token count divided by the budget. Packing is per language stratum
  *    (`partitionBy(lang)`) — strata pack in parallel, which is also the
  *    scale story: a single global ordering would serialize on one
  *    partition, per-shard packing does not (and training shards are
  *    packed independently anyway).
  */
object Chunking {

  /** Fixed token windows: size 32, stride 24 (25% overlap). Chunk starts
    * are 0, stride, 2·stride, … up to the last window that still reaches
    * new tokens; a doc shorter than one window yields one chunk. */
  val q68 = Q.sql("q68_doc_chunking",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, len(toks) AS n_toks,
      |    unnest(range(0, 1 + (CASE WHEN len(toks) > 32 THEN (len(toks) - 32 + 23) // 24 ELSE 0 END))) AS chunk_id,
      |    toks
      |  FROM t)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(len(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ') AS chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val winSize = 32
    val stride = 24
    val toks = Text.tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n_toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          when(col("n_toks") > winSize,
            floor((col("n_toks") - winSize + (stride - 1)) / stride)).otherwise(0)
            .cast("int"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(winSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Greedy sequence packing at a 2048-token budget within each language
    * stratum, docs in doc_id order. A doc that straddles a budget
    * boundary stays whole (overflow tolerated) — the streaming-packer
    * semantics; `offset` is its start position inside the sequence. */
  val q69 = Q.sql("q69_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id, lang, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                             ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
      |  FROM t)
      |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  cum_before // 2048 AS seq_id, cum_before % 2048 AS seq_offset
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor(col("cum_before") / budget).as("seq_id"),
        (col("cum_before") % budget).as("seq_offset"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q68, q69)
}
