package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
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

  case class DocTok(doc_id: Long, lang: String, n_tokens: Long)
  case class Packed(doc_id: Long, lang: String, n_tokens: Long,
      bin_id: Long, bin_offset: Long)

  /** Best-fit-decreasing bin packing within each stratum: docs sorted by
    * (n_tokens desc, doc_id), each placed in the open bin with the least
    * remaining capacity that still fits (ties → lowest bin id); no fit →
    * new bin; a doc at/over the budget gets a bin of its own. O(n log n)
    * per stratum via a (remaining, bin) ordered set — the classic 11/9·OPT
    * bound, strictly tighter than [[q69]]'s arrival-order greedy fill.
    *
    * Scale shape: one `flatMapGroups` per stratum. Packing a shard
    * inherently needs that shard's doc lengths in one place, so the
    * stratum IS the parallelism unit — in deployment the key is
    * (lang, training-shard), bounding each group at shard size; lengths
    * only (16 B/doc) are shuffled, never text. */
  /** The per-stratum BFD loop, pure so PropertySpec can drive it on
    * random length multisets without a session. */
  def bfdStratum(lang: String, docs: Iterator[DocTok], budget: Long): Iterator[Packed] = {
    val arr = docs.toArray.sortInPlaceBy(d => (-d.n_tokens, d.doc_id))
    var nBins = 0
    val open = scala.collection.mutable.TreeSet.empty[(Long, Long)]
    arr.iterator.map { d =>
      if (d.n_tokens >= budget) {
        val id = nBins.toLong; nBins += 1
        Packed(d.doc_id, lang, d.n_tokens, id, 0L)
      } else open.minAfter((d.n_tokens, Long.MinValue)) match {
        case Some(slot @ (rem, id)) =>
          open.remove(slot)
          if (rem > d.n_tokens) open.add((rem - d.n_tokens, id))
          Packed(d.doc_id, lang, d.n_tokens, id, budget - rem)
        case None =>
          val id = nBins.toLong; nBins += 1
          open.add((budget - d.n_tokens, id))
          Packed(d.doc_id, lang, d.n_tokens, id, 0L)
      }
    }
  }

  def packBestFitDecreasing(docs: DataFrame, budget: Long): DataFrame = {
    docs.as[DocTok](Encoders.product[DocTok])
      .groupByKey(_.lang)(Encoders.STRING)
      .flatMapGroups { (lang: String, it: Iterator[DocTok]) =>
        bfdStratum(lang, it, budget)
      }(Encoders.product[Packed]).toDF()
  }

  /** BFD packing gate at the q69 budget. Best-fit needs an ordered
    * mutable bin set — the bin ASSIGNMENT is not expressible as one
    * DuckDB query — so the gate emits what SQL CAN pin exactly:
    * the corpus partition (every doc exactly once, with its true token
    * count — the oracle recomputes both sides from `documents`) plus
    * three invariant booleans the oracle hard-pins to `true`:
    *
    *  - `capacity_ok`: the doc's bin totals ≤ budget, or the doc is an
    *    at/over-budget doc alone in its own bin;
    *  - `gapless_ok`: the doc starts exactly where its bin predecessor
    *    ended (offset = Σ earlier docs' tokens — no holes, no overlap);
    *  - `halffull_ok`: at most one bin in the doc's stratum is ≤ half
    *    full — the classic any-fit quality bound, so a degenerate
    *    one-doc-per-bin regression flips the gate loudly.
    *
    * Any packing bug makes a boolean false (or a doc vanish/duplicate)
    * and hash-mismatches the oracle. PropertySpec additionally drives
    * the same invariants on random length multisets. */
  val q73 = Q.sql("q73_packing_bfd",
    """SELECT doc_id, lang,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |  true AS capacity_ok, true AS gapless_ok, true AS halffull_ok
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val budget = 2048L
    val packed = packBestFitDecreasing(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
      budget = budget)
    val binW = Window.partitionBy("lang", "bin_id")
    val binOrder = Window.partitionBy("lang", "bin_id").orderBy("bin_offset")
    val langW = Window.partitionBy("lang")
    packed
      .withColumn("bin_load", sum(col("n_tokens")).over(binW))
      .withColumn("bin_docs", count(lit(1)).over(binW))
      .withColumn("capacity_ok",
        (col("bin_load") <= budget) ||
          (col("n_tokens") >= budget && col("bin_docs") === 1))
      .withColumn("gapless_ok",
        col("bin_offset") === coalesce(
          lag(col("bin_offset") + col("n_tokens"), 1).over(binOrder), lit(0L)))
      // distinct (bin_id, load<=half) pairs per stratum, counted without
      // a second aggregation pass: flag each bin once at its first row
      .withColumn("__first_in_bin",
        row_number().over(binOrder) === 1)
      .withColumn("__half_bin",
        when(col("__first_in_bin") && col("bin_load") * 2 <= budget, 1L)
          .otherwise(0L))
      .withColumn("halffull_ok", sum(col("__half_bin")).over(langW) <= 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("capacity_ok"), col("gapless_ok"), col("halffull_ok"))
      .orderBy("doc_id")
  }

  /** T5-style span corruption — the denoising-objective example
    * builder: ~20% of tokens are masked by a deterministic hash,
    * CONSECUTIVE masked tokens collapse into one span, the input keeps
    * a numbered sentinel per span and the target lists each sentinel
    * followed by the tokens it hides. The mask decision is the sketch
    * family's poly-131·G hash of "doc:off" (mod 10 < 2), so both
    * engines derive the identical noise without any RNG; span
    * numbering is a running count of span STARTS (lag + prefix sum),
    * string assembly is order-pinned by token offset.
    *
    * Scale: windows partition by doc_id (never global), assembly is one
    * partial-agg'd groupBy — the whole thing is two passes over the
    * token stream, the same shape as q68's chunking. */
  val q180 = Q.sql("q180_span_corruption",
    """WITH tk AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents) d,
      |  LATERAL unnest(range(0, len(toks))) AS u(i)),
      |m AS (
      |  SELECT doc_id, off, tok,
      |    (list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(k) + 1),
      |                       c -> CAST(ascii(substr(k, c, 1)) AS HUGEINT))),
      |        (a, b) -> (a * 131 + b) % 2305843009213693951)
      |      * 1752450205419405103 % 2305843009213693951 % 10 < 2) AS masked
      |  FROM (SELECT *, CAST(doc_id AS VARCHAR) || ':' || CAST(off AS VARCHAR) AS k
      |        FROM tk)),
      |sp AS (
      |  SELECT *,
      |    CASE WHEN masked AND NOT coalesce(
      |      lag(masked) OVER (PARTITION BY doc_id ORDER BY off), FALSE)
      |      THEN 1 ELSE 0 END AS st
      |  FROM m),
      |sk AS (
      |  SELECT *,
      |    sum(st) OVER (PARTITION BY doc_id ORDER BY off
      |                  ROWS UNBOUNDED PRECEDING) - 1 AS span_k
      |  FROM sp)
      |SELECT doc_id,
      |  string_agg(CASE WHEN NOT masked THEN tok
      |                  WHEN st = 1 THEN '<extra_id_' || span_k || '>' END,
      |             ' ' ORDER BY off) AS input_text,
      |  coalesce(string_agg(CASE WHEN masked AND st = 1
      |                  THEN '<extra_id_' || span_k || '> ' || tok
      |                  WHEN masked THEN tok END,
      |             ' ' ORDER BY off), '') AS target_text,
      |  CAST(sum(st) AS BIGINT) AS n_spans
      |FROM sk GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{Exprs, Text}
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("off").cast("long").as("off"), col("tok"))
    val m = tk.withColumn("masked",
      pmod(Exprs.mulmod61(Exprs.poly_hash(
        concat(col("doc_id").cast("string"), lit(":"), col("off").cast("string"))),
        graft.operators.Sketches.Kmv.G), lit(10L)) < 2)
    val byDoc = Window.partitionBy("doc_id").orderBy("off")
    val sp = m.withColumn("st",
      when(col("masked") && !coalesce(lag(col("masked"), 1).over(byDoc), lit(false)),
        1L).otherwise(0L))
    val sk = sp.withColumn("span_k",
      sum("st").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    val sent = concat(lit("<extra_id_"), col("span_k").cast("string"), lit(">"))
    val pieces = sk.select(col("doc_id"), col("off"), col("st"),
      when(!col("masked"), col("tok"))
        .when(col("st") === 1, sent).as("ip"),
      when(col("masked") && col("st") === 1, concat(sent, lit(" "), col("tok")))
        .when(col("masked"), col("tok")).as("tp"))
    pieces.groupBy("doc_id")
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(off, ip)))," +
          " x -> x.ip)"), " ").as("input_text"),
        array_join(expr("transform(array_sort(collect_list(struct(off, tp)))," +
          " x -> x.tp)"), " ").as("target_text"),
        sum("st").as("n_spans"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q68, q69, q73, q180)
}
