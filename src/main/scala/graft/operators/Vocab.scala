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

  val all: Seq[Q] = Seq(q118)
}
