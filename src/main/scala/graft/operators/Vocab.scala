package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Tokenizer-vocabulary construction primitives. One round of BPE-style
  * merge selection is "count every adjacent symbol pair across the
  * corpus, take the most frequent" — at training-data scale that is a
  * pure explode → map-side partial count → shuffle-on-pair aggregation,
  * which is exactly how it is expressed here (no driver loop; the
  * per-document pair list is built lazily with `transform(sequence)`,
  * never materialized as a whole-corpus array).
  */
object Vocab {

  /** Corpus-wide adjacent-token-pair counts over `textCol`, tokenized
    * as maximal `[a-z0-9]+` runs of the lower-cased text. Returns
    * (a, b, n) — one row per distinct ordered pair. */
  def adjacentPairCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(expr(
        s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> t != '')")
        .as("__l"))
      .filter(size(col("__l")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__l) - 2), " +
          "i -> struct(__l[i] AS a, __l[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"))

  /** BPE merge-candidate gate: top 20 adjacent pairs by corpus count
    * (pair lexicographic tie-break), replayed by the oracle with
    * list_zip over the same tokenization. */
  val q118 = Q.sql("q118_bpe_pairs",
    """WITH toks AS (
      |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      |  FROM documents),
      |pairs AS (
      |  SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
      |  FROM toks WHERE len(l) >= 2)
      |SELECT p[1] AS a, p[2] AS b, count(*) AS n
      |FROM pairs GROUP BY 1, 2
      |ORDER BY n DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
    adjacentPairCounts(Tables.documents(s, d), "text")
      .orderBy(desc("n"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Spelling correction against the corpus vocabulary — the
    * query-rewrite pass every search box runs before retrieval (and a
    * data pipeline runs over OCR/user-generated text): for each
    * misspelled query, the top-3 vocabulary terms by (edit distance
    * ASC, corpus frequency DESC, term) within distance ≤ 3. Both
    * engines implement the classic Wagner–Fischer Levenshtein, so the
    * distance is integer-exact and the ranking replays. Scale: the
    * query list is tiny and broadcast; at web-scale vocabularies the
    * cross product is pruned by length banding or SymSpell-style
    * deletes — the ranking contract here is what those candidate
    * generators must preserve. */
  val SpellQueries = Seq("jion", "hsah", "filtr", "mrege", "colum")

  val q255 = Q.sql("q255_spell_correct", {
    val qVals = SpellQueries.map(q => s"('$q')").mkString(", ")
    s"""WITH q(query) AS (VALUES $qVals),
       |v AS (
       |  SELECT tok AS term, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |        FROM documents)
       |  GROUP BY 1),
       |sc AS (
       |  SELECT q.query, v.term, v.freq,
       |    CAST(levenshtein(q.query, v.term) AS BIGINT) AS dist
       |  FROM q CROSS JOIN v
       |  WHERE levenshtein(q.query, v.term) <= 3)
       |SELECT query, term, dist, freq, CAST(rk AS BIGINT) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query
       |        ORDER BY dist, freq DESC, term) AS rk FROM sc) t
       |WHERE rk <= 3 ORDER BY query, rk""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Text
    val spark = s
    import spark.implicits._
    val v = Tables.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("freq"))
    SpellQueries.toDF("query").crossJoin(v)
      .withColumn("dist", levenshtein(col("query"), col("term")).cast("long"))
      .filter(col("dist") <= 3)
      .withColumn("rk", row_number().over(Window.partitionBy("query")
        .orderBy(col("dist"), col("freq").desc, col("term"))).cast("long"))
      .filter(col("rk") <= 3)
      .select("query", "term", "dist", "freq", "rk")
      .orderBy("query", "rk")
  }

  val all: Seq[Q] = Seq(q118, q255)
}
