package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Web-corpus quality gates in the Gopher / C4 / RefinedWeb family —
  * the document-level rule filters a pretraining pipeline runs before
  * any model-based scoring.
  *
  * Both operators are STATELESS MAPS over the corpus: every rule is an
  * expression over the doc's own tokens/lines, so the pass costs one
  * scan, fuses with any other per-doc shaping stage, and shuffles
  * nothing (PlanSpec pins the no-exchange shape). All rule arithmetic
  * is integer (ratio `a/b ≤ p/q` tested as `q·a ≤ p·b`) so the DuckDB
  * oracle replays every rule bit-for-bit.
  *
  * The synthetic corpus is single-line, so "lines" are the same
  * fixed-width token segments the q75 line-dedup gate uses (width 8,
  * tail-inclusive here — every token is covered). On a real web corpus
  * the segmenter is `split(text, '\n')`; the rules are unchanged.
  */
object WebQuality {

  /** Tokens per synthetic line (tail-inclusive). Public: composed gates
    * (q136) interpolate it into their oracles so a width change stays a
    * one-site edit. */
  val LineWidth = 8
  private val W = LineWidth

  /** Gopher rule set (Rae et al. '21, Table A1 subset): word count in
    * [50, 100k]; mean word length in [3, 10]; symbol-to-word ratio
    * ('#', '…', '...') ≤ 0.1; ≤ 90% of lines bullet-started; ≤ 30% of
    * lines ellipsis-ended; ≥ 80% of words contain an alphabetic char;
    * ≥ 2 distinct stop words present. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Tail-inclusive fixed-width token segments ("lines"). */
  private def segsCol(toks: Column): Column = {
    val nSegs = floor((size(toks) + lit(W - 1)) / lit(W)).cast("int")
    when(nSegs > 0,
      transform(sequence(lit(0), nSegs - 1),
        g => array_join(slice(toks, g * W + 1, lit(W)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-doc Gopher stats + rule booleans over any (doc_id, text). */
  def gopherStats(documents: DataFrame): DataFrame = {
    val stops = array(GopherStops.map(lit): _*)
    val t = documents
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
      .withColumn("segs", segsCol(col("toks")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x).cast("long"))
          .as("sum_len"),
        size(filter(col("toks"), x => x.rlike("[A-Za-z]"))).cast("long")
          .as("alpha_words"),
        size(array_intersect(array_distinct(transform(col("toks"), lower(_))),
          stops)).cast("long").as("stop_present"),
        (length(col("text")) - length(expr("replace(text, '#', '')")))
          .cast("long").as("n_hash"),
        (size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0))) +
          (length(col("text")) - length(expr("replace(text, '…', '')"))))
          .cast("long").as("n_ellipsis"),
        size(col("segs")).cast("long").as("n_lines"),
        size(filter(col("segs"), l => l.rlike("^\\s*[-*•]\\s"))).cast("long")
          .as("bullet_lines"),
        size(filter(col("segs"), l => l.rlike("(\\.\\.\\.|…)\\s*$")))
          .cast("long").as("ellend_lines"))
    t.withColumn("r_wordcount", col("n_words").between(50L, 100000L))
      .withColumn("r_meanwordlen",
        col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10)
      .withColumn("r_symbol",
        (col("n_hash") + col("n_ellipsis")) * 10 <= col("n_words"))
      .withColumn("r_bullet", col("bullet_lines") * 10 <= col("n_lines") * 9)
      .withColumn("r_ellipsis_end",
        col("ellend_lines") * 10 <= col("n_lines") * 3)
      .withColumn("r_alpha", col("alpha_words") * 10 >= col("n_words") * 8)
      .withColumn("r_stopwords", col("stop_present") >= 2L)
      .withColumn("keep",
        col("r_wordcount") && col("r_meanwordlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis_end") && col("r_alpha") &&
          col("r_stopwords"))
  }

  val q128 = Q.sql("q128_gopher_rules",
    s"""WITH t AS (
      |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text, toks,
      |    list_transform(range(0, (len(toks)+${W - 1})//$W),
      |      g -> array_to_string(list_slice(toks, g*$W+1, g*$W+$W), ' ')) AS segs
      |  FROM t),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_len,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
      |    CAST(len(list_intersect(list_distinct(list_transform(toks, x -> lower(x))),
      |      [${GopherStops.map("'" + _ + "'").mkString(",")}])) AS BIGINT) AS stop_present,
      |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
      |    CAST(len(regexp_extract_all(text, '\\.\\.\\.'))
      |      + length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_ellipsis,
      |    CAST(len(segs) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(segs, l -> regexp_matches(l, '^\\s*[-*•]\\s'))) AS BIGINT) AS bullet_lines,
      |    CAST(len(list_filter(segs, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT) AS ellend_lines
      |  FROM s)
      |SELECT *,
      |  (r_wordcount AND r_meanwordlen AND r_symbol AND r_bullet
      |   AND r_ellipsis_end AND r_alpha AND r_stopwords) AS keep
      |FROM (
      |  SELECT *,
      |    n_words BETWEEN 50 AND 100000 AS r_wordcount,
      |    sum_len >= n_words*3 AND sum_len <= n_words*10 AS r_meanwordlen,
      |    (n_hash + n_ellipsis)*10 <= n_words AS r_symbol,
      |    bullet_lines*10 <= n_lines*9 AS r_bullet,
      |    ellend_lines*10 <= n_lines*3 AS r_ellipsis_end,
      |    alpha_words*10 >= n_words*8 AS r_alpha,
      |    stop_present >= 2 AS r_stopwords
      |  FROM c)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    gopherStats(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** C4-style line blocklist terms — chosen from the corpus vocabulary
    * so the rule discriminates at gate scale (the mechanism is C4's
    * badword/policy-line filter; the production list is a config). */
  val BlockTerms: Seq[String] = Seq("slow", "big")

  /** C4/RefinedWeb line filtering: keep a line iff it has ≥ 3 words and
    * no blocklisted term; remove the whole doc when fewer than half its
    * lines survive. Returns per-doc line counts, the drop decision and
    * the digest of the reassembled text ('' when dropped). */
  def c4LineFilter(documents: DataFrame): DataFrame = {
    val block = array(BlockTerms.map(lit): _*)
    val toks = Text.tokens(col("text"))
    val nSegs = floor((size(col("toks")) + lit(W - 1)) / lit(W)).cast("int")
    documents
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("sgs",
        when(nSegs > 0,
          transform(sequence(lit(0), nSegs - 1),
            g => slice(col("toks"), g * W + 1, lit(W))))
          .otherwise(array().cast("array<array<string>>")))
      .withColumn("kept",
        filter(col("sgs"), a => size(a) >= 3 && !arrays_overlap(a, block)))
      .select(
        col("doc_id"),
        size(col("sgs")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("kept")) * 10 < size(col("sgs")) * 5).as("dropped"),
        md5(when(size(col("kept")) * 10 < size(col("sgs")) * 5, lit(""))
          .otherwise(array_join(transform(col("kept"), a => array_join(a, " ")),
            "\n")).cast("binary")).as("clean_md5"))
  }

  val q129 = Q.sql("q129_c4_line_filter",
    s"""WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_transform(range(0, (len(toks)+${W - 1})//$W),
      |      g -> list_slice(toks, g*$W+1, g*$W+$W)) AS sgs
      |  FROM t),
      |k AS (
      |  SELECT doc_id, sgs,
      |    list_filter(sgs, a -> len(a) >= 3 AND NOT list_has_any(a,
      |      [${BlockTerms.map("'" + _ + "'").mkString(",")}])) AS kept
      |  FROM s)
      |SELECT doc_id,
      |  CAST(len(sgs) AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  len(kept)*10 < len(sgs)*5 AS dropped,
      |  md5(CASE WHEN len(kept)*10 < len(sgs)*5 THEN ''
      |      ELSE array_to_string(list_transform(kept,
      |             a -> array_to_string(a, ' ')), chr(10)) END) AS clean_md5
      |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
    c4LineFilter(Tables.documents(s, d)).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q128, q129)
}
