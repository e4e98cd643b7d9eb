package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Byte-pair-encoding tokenizer, trained and applied in-engine (Sennrich
  * et al., ACL'16 — the merge loop every modern subword tokenizer runs).
  * q118 counts the pair statistics; this module closes the loop: learn
  * the top-K merges from the corpus and segment every document with
  * them.
  *
  * Scale shape — the HF/SentencePiece trick: training never touches the
  * corpus after one groupBy. The corpus collapses to the DISTINCT-WORD
  * frequency table (vocabulary-sized, ≪ corpus at any scale), every
  * merge iteration is one pair-count aggregation over that table plus a
  * 1-row argmax collect (bounded driver state, q106's iteration
  * pattern), and encoding is a join of the token stream against the
  * final word→segment-count table — no per-doc merge replay.
  *
  * Oracle replay — the symbol-boundary encoding: a segmented word is
  * `␟sym␟␟sym␟…` (U+001F fences each symbol on both sides), so applying
  * merge (a,b) is the literal string replace `␟a␟␟b␟ → ␟ab␟`: both
  * engines' replace() is non-overlapping left-to-right, which IS the
  * BPE pass order ("aaaa" → "aa","aa"), and the double fence keeps
  * adjacent matches from stealing each other's boundary. The K
  * iterations unroll into CTE layers exactly like q106's PageRank.
  */
object Bpe {

  /** Symbol fence (U+001F unit separator — absent from any text corpus
    * this side of a binary blob; the whitespace tokenizer can't emit
    * it inside a token). */
  private[graft] val U = ""
  private[graft] val MERGES = 8

  /** Learned merge list (rank, left, right, weighted pair count) plus
    * the final segmented word table (word, s, f). `words` = (word, f). */
  private[graft] def trainOn(words: DataFrame, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var w = words.select(col("word"), col("f"),
      regexp_replace(col("word"), "(.)", s"$U$$1$U").as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (i <- 1 to k if !exhausted) {
      val syms = split(trim(col("s"), U), U + U)
      val pairs = w.select(col("f"),
        explode(when(size(syms) > 1,
          transform(sequence(lit(1), size(syms) - 1),
            j => concat(element_at(syms, j), lit(U), element_at(syms, j + 1))))
          .otherwise(array().cast("array<string>"))).as("pr"))
      // argmax pair by weighted count, lexical tie-break — ONE row to the
      // driver per iteration (the bounded q106-style loop state)
      val best = pairs.groupBy("pr").agg(sum(col("f")).as("cf"))
        .orderBy(col("cf").desc, col("pr")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best.head.getString(0).split(U, 2)
        merges += ((i, a, b, best.head.getLong(1)))
        w = w.withColumn("s",
          replace(col("s"), lit(s"$U$a$U$U$b$U"), lit(s"$U$a$b$U")))
          .localCheckpoint(true)
      }
    }
    (merges.result(), w)
  }

  private def wordFreqs(documents: DataFrame): DataFrame = documents
    .select(explode(Text.tokens(col("text"))).as("word"))
    .groupBy("word").agg(count(lit(1)).as("f"))

  /** The k merge iterations as unrolled DuckDB CTEs. Returns the list of
    * CTE clauses; callers append their own SELECT. `w0` is the wrapped
    * word-frequency table; each b{i} is the 0-or-1-row argmax, each
    * w{i} the table after that merge (scalar-subquery fallback keeps
    * the replace an identity when the pair space is exhausted). */
  private def oracleIterations(k: Int): String = {
    val init =
      s"""tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |  FROM documents),
         |wf AS (SELECT word, count(*) AS f FROM tok GROUP BY 1),
         |w0 AS (SELECT word, f,
         |  regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s
         |  FROM wf)""".stripMargin
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    // and the two scalar-subquery reads of b{i} per layer would otherwise
    // re-expand the whole prefix chain exponentially (observed as
    // thousands of parquet re-opens at k=8)
    val iters = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT f, unnest(CASE WHEN len(li) > 1 THEN
         |      list_transform(range(1, len(li)),
         |                     j -> li[j] || chr(31) || li[j+1])
         |      ELSE CAST([] AS VARCHAR[]) END) AS pr
         |  FROM (SELECT f, string_split(trim(s, chr(31)), chr(31) || chr(31)) AS li
         |        FROM w${i - 1})),
         |b$i AS MATERIALIZED (
         |  SELECT pr, cf,
         |    chr(31) || split_part(pr, chr(31), 1) || chr(31) || chr(31)
         |      || split_part(pr, chr(31), 2) || chr(31) AS pat,
         |    chr(31) || replace(pr, chr(31), '') || chr(31) AS rep
         |  FROM (SELECT pr, sum(f) AS cf FROM p$i GROUP BY 1)
         |  ORDER BY cf DESC, pr LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT word, f, replace(s,
         |    coalesce((SELECT pat FROM b$i), chr(2)),
         |    coalesce((SELECT rep FROM b$i), chr(2))) AS s
         |  FROM w${i - 1})""".stripMargin
    }
    (init.replace("tok AS (", "tok AS MATERIALIZED (")
      .replace("wf AS (", "wf AS MATERIALIZED (")
      .replace("w0 AS (", "w0 AS MATERIALIZED (") +: iters).mkString(",\n")
  }

  /** The learned merge table: which pairs the corpus BPE merges, in
    * order, with their weighted counts at merge time. */
  val q125 = Q.sql("q125_bpe_train", {
    val rows = (1 to MERGES).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, split_part(pr, chr(31), 1) AS left_sym, " +
        s"split_part(pr, chr(31), 2) AS right_sym, CAST(cf AS BIGINT) AS pair_count FROM b$i")
    // no stripMargin here: the interpolated iteration SQL contains `||`
    // continuation lines a second strip would mangle into `|`
    s"WITH ${oracleIterations(MERGES)}\n" +
      s"SELECT * FROM (${rows.mkString(" UNION ALL ")}) ORDER BY merge_rank"
  }) { (s, d) =>
    val (merges, _) = trainOn(wordFreqs(Tables.documents(s, d)), MERGES)
    import s.implicits._
    merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .select(col("merge_rank").cast("long"), col("left_sym"),
        col("right_sym"), col("pair_count"))
      .orderBy("merge_rank")
  }

  /** Per-document token count under the learned BPE vocabulary — the
    * sequence-length statistic a packing/batching stage budgets by
    * (q69/q73 consume exactly this number at train time). Encoding is
    * the word-table join, not a per-doc merge replay. */
  val q126 = Q.sql("q126_bpe_encode", {
    // assembled without stripMargin — see q125
    s"WITH ${oracleIterations(MERGES)},\n" +
      "wn AS (SELECT word,\n" +
      "  CAST(len(string_split(trim(s, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n\n" +
      s"  FROM w$MERGES)\n" +
      "SELECT d.doc_id, CAST(coalesce(t.n_bpe, 0) AS BIGINT) AS n_bpe\n" +
      "FROM documents d LEFT JOIN (\n" +
      "  SELECT doc_id, sum(wn.n) AS n_bpe\n" +
      "  FROM tok JOIN wn USING (word) GROUP BY 1) t USING (doc_id)\n" +
      "ORDER BY d.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val (_, finalWords) = trainOn(wordFreqs(docs), MERGES)
    val wn = finalWords.select(col("word"),
      size(split(trim(col("s"), U), U + U)).cast("long").as("n"))
    val perDoc = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .join(wn, "word")
      .groupBy("doc_id").agg(sum(col("n")).as("n_bpe"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
      .orderBy("doc_id")
  }

  /** BPE fertility per language — tokens-per-word under the learned
    * vocabulary, THE statistic a tokenizer review reads per language
    * (fertility ≫ 1 means the vocab under-serves that language and its
    * documents pay more sequence length per word). Ratio held exact:
    * fertility_q4 = ΣBPE·10⁴ div Σwords, one positive floor division.
    * Reuses the q125/q126 training chain — the corpus is scanned once
    * for word counts; everything else is vocab-sized. */
  val q190 = Q.sql("q190_bpe_fertility", {
    // assembled without stripMargin — see q125
    s"WITH ${oracleIterations(MERGES)},\n" +
      "wn AS (SELECT word,\n" +
      "  CAST(len(string_split(trim(s, chr(31)), chr(31) || chr(31))) AS BIGINT) AS n\n" +
      s"  FROM w$MERGES),\n" +
      "pl AS (\n" +
      "  SELECT d.lang, CAST(sum(wn.n) AS BIGINT) AS n_bpe,\n" +
      "    CAST(count(*) AS BIGINT) AS n_words\n" +
      "  FROM tok JOIN wn USING (word)\n" +
      "  JOIN documents d USING (doc_id) GROUP BY 1)\n" +
      "SELECT lang, n_bpe, n_words,\n" +
      "  CAST((n_bpe * 10000) // n_words AS BIGINT) AS fertility_q4\n" +
      "FROM pl ORDER BY lang"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val (_, finalWords) = trainOn(wordFreqs(docs), MERGES)
    val wn = finalWords.select(col("word"),
      size(split(trim(col("s"), U), U + U)).cast("long").as("n"))
    docs.select(col("doc_id"), col("lang"), explode(Text.tokens(col("text"))).as("word"))
      .join(broadcast(wn), "word")
      .groupBy("lang")
      .agg(sum(col("n")).cast("long").as("n_bpe"),
        count(lit(1)).as("n_words"))
      .select(col("lang"), col("n_bpe"), col("n_words"),
        expr("(n_bpe * 10000) div n_words").as("fertility_q4"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(q125, q126, q190)
}
