package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Distributed inverted-index build — the engine-side half of the
  * reference's Solr export (SURVEY §2.2 K1 ships documents to an
  * external indexer; this materializes the index itself as a table).
  *
  * Shape: token explode → groupBy(token). Partial aggregation combines
  * map-side, so the shuffle carries one (token, partial) row per
  * distinct token per partition, not one row per occurrence. The
  * posting LIST is emitted as a digest of the sorted doc-id vector:
  * at 100 TB a posting list for a stopword is itself huge, so the
  * production writer shards postings by (token, doc_id bucket) —
  * df/tf here stay one row per token either way; the gate pins the
  * full ordered list through the md5.
  */
object Postings {

  /** token → document frequency, term frequency, ordered-postings digest. */
  def invertedIndex(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(
        count_distinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf"),
        md5(array_join(transform(array_sort(collect_set(col("doc_id"))),
          x => x.cast("string")), ",").cast("binary")).as("postings_md5"))

  val q130 = Q.sql("q130_inverted_index",
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents)
      |SELECT token,
      |  count(DISTINCT doc_id) AS df,
      |  count(*) AS tf,
      |  md5(array_to_string(list_transform(list_sort(list(DISTINCT doc_id)),
      |    x -> CAST(x AS VARCHAR)), ',')) AS postings_md5
      |FROM t GROUP BY token ORDER BY token""".stripMargin) { (s, d) =>
    invertedIndex(Tables.documents(s, d)).orderBy("token")
  }

  val all: Seq[Q] = Seq(q130)
}
