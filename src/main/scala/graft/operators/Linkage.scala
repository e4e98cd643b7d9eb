package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the
  * match/possible/nonmatch decision rule a bibliographic governance
  * system runs when reconciling two registries of the same universe
  * (the reference reconciles harvested records against its own layers
  * by exact id — S6's upsert; linkage is what replaces that when the
  * second registry has no shared key).
  *
  * Shape: a deterministically PERTURBED snapshot of `documents` stands
  * in for the second registry (field drift: language overwritten for
  * doc_id % 7, trailing token dropped for doc_id % 5 — the q56
  * dirty-CTE device). Candidate pairs come from BLOCKING on
  * (source, length-band) — never the cross product; agreement on five
  * field comparators (content digest, language, first/last token,
  * length band) adds fixed integer log-likelihood-ratio weights
  * (production systems estimate m/u via EM; fixed weights keep the
  * gate deterministic and the DECISION machinery identical), and the
  * summed score classifies against the two Fellegi–Sunter thresholds.
  *
  * Scale: blocking keys hash-partition the join; block sizes are
  * bounded by construction (source × length-band), so pair volume is
  * Σ|block|² — the standard linkage cost model — and the scorer is a
  * stateless map over pairs. All-integer scores, no float anywhere.
  */
object Linkage {

  private val WDigest = 50
  private val Thresholds = (30, 0) // (match, possible)

  val q200 = Q.sql("q200_record_linkage",
    s"""WITH a AS (
       |  SELECT doc_id, source, lang,
       |    regexp_split_to_array(trim(text), '\\s+') AS tk
       |  FROM documents),
       |aa AS (
       |  SELECT doc_id, source, lang,
       |    md5(array_to_string(tk, ' ')) AS dig,
       |    tk[1] AS ft, tk[len(tk)] AS lt,
       |    CAST(len(tk) AS BIGINT) AS nt
       |  FROM a),
       |bb AS (
       |  SELECT doc_id + 1000000 AS id_b, source,
       |    CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS b_lang,
       |    md5(array_to_string(tkb, ' ')) AS b_dig,
       |    tkb[1] AS b_ft, tkb[len(tkb)] AS b_lt,
       |    CAST(len(tkb) AS BIGINT) AS b_nt
       |  FROM (SELECT doc_id, source, lang,
       |          CASE WHEN doc_id % 5 = 0 THEN tk[1:len(tk)-1] ELSE tk END AS tkb
       |        FROM a)),
       |p AS (
       |  SELECT aa.doc_id, bb.id_b,
       |    (CASE WHEN aa.dig = bb.b_dig THEN $WDigest ELSE 0 END
       |     + CASE WHEN aa.lang = bb.b_lang THEN 9 ELSE -25 END
       |     + CASE WHEN aa.ft = bb.b_ft THEN 14 ELSE -30 END
       |     + CASE WHEN aa.lt = bb.b_lt THEN 14 ELSE -30 END
       |     + CASE WHEN aa.nt // 4 = bb.b_nt // 4 THEN 7 ELSE -12 END) AS score,
       |    (bb.id_b - 1000000 = aa.doc_id) AS is_true
       |  FROM aa JOIN bb
       |    ON aa.source = bb.source AND aa.nt // 8 = bb.b_nt // 8)
       |SELECT
       |  CASE WHEN score >= ${Thresholds._1} THEN 'match'
       |       WHEN score >= ${Thresholds._2} THEN 'possible'
       |       ELSE 'nonmatch' END AS decision,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |  CAST(min(score) AS BIGINT) AS min_score,
       |  CAST(max(score) AS BIGINT) AS max_score
       |FROM p GROUP BY 1 ORDER BY decision""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        Text.tokens(col("text")).as("tk"))
    val aa = base.select(col("doc_id"), col("source"), col("lang"),
      md5(array_join(col("tk"), " ").cast("binary")).as("dig"),
      element_at(col("tk"), 1).as("ft"),
      element_at(col("tk"), size(col("tk"))).as("lt"),
      size(col("tk")).cast("long").as("nt"))
    val bb = base
      .withColumn("tkb", when(col("doc_id") % 5 === 0,
        expr("slice(tk, 1, size(tk) - 1)")).otherwise(col("tk")))
      .select((col("doc_id") + 1000000).as("id_b"), col("source"),
        when(col("doc_id") % 7 === 0, "xx").otherwise(col("lang")).as("b_lang"),
        md5(array_join(col("tkb"), " ").cast("binary")).as("b_dig"),
        element_at(col("tkb"), 1).as("b_ft"),
        element_at(col("tkb"), size(col("tkb"))).as("b_lt"),
        size(col("tkb")).cast("long").as("b_nt"))
    aa.join(bb,
        aa("source") === bb("source") &&
          expr("nt div 8") === expr("b_nt div 8"))
      .withColumn("score",
        when(col("dig") === col("b_dig"), WDigest).otherwise(0)
          + when(col("lang") === col("b_lang"), 9).otherwise(-25)
          + when(col("ft") === col("b_ft"), 14).otherwise(-30)
          + when(col("lt") === col("b_lt"), 14).otherwise(-30)
          + when(expr("nt div 4") === expr("b_nt div 4"), 7).otherwise(-12))
      .withColumn("is_true", col("id_b") - 1000000 === col("doc_id"))
      .groupBy(
        when(col("score") >= Thresholds._1, "match")
          .when(col("score") >= Thresholds._2, "possible")
          .otherwise("nonmatch").as("decision"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("is_true"), 1L).otherwise(0L)).cast("long").as("n_true"),
        min("score").cast("long").as("min_score"),
        max("score").cast("long").as("max_score"))
      .orderBy("decision")
  }

  val all: Seq[Q] = Seq(q200)
}
