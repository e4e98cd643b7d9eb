package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exprs

/** Prefix-filtered set-similarity join (PPJoin-lite, Chaudhuri et al. /
  * Xiao et al.): the scale path for EXACT threshold Jaccard when a
  * cross join is unaffordable.
  *
  * For J(a,b) ≥ t, a and b must share at least one token among each
  * side's first ⌊(1−t)·|s|⌋+1 tokens under a GLOBAL token order
  * (rarest-first by document frequency maximizes pruning). Candidate
  * generation becomes: explode prefixes → shuffle-join on token →
  * distinct pairs → merge-walk verify. O(index join) instead of O(n²).
  *
  * 100 TB notes: the global order is (document frequency, token) joined
  * per-token — a plain shuffle join that AQE turns into a broadcast only
  * when the vocabulary actually fits (no mandatory broadcast of a
  * corpus-sized side), and no global row_number window (which would
  * funnel the vocabulary through one partition). Each stage shuffles on
  * a bounded key (tok, then doc_id) and carries slim rows.
  *
  * [[SetSimJoin.jaccardPairs]] auto-routes here when a prefix-index df
  * probe says candidate enumeration is subquadratic; on dense-similarity
  * corpora (most pairs near-dup) the candidate set degenerates toward
  * all pairs and the brute-force kernels win on constant factors — the
  * spec asserts all paths produce identical results.
  */
object PrefixJoin {

  /** Candidate slack: prefixes and size bands are computed for raw
    * Jaccard ≥ threshold − 1e-4, so pairs that only cross the threshold
    * after 4-decimal rounding are never pruned from the candidate set. */
  private def tEff(threshold: Double): Double = threshold - 0.0001

  /** Per-doc prefix index (doc_id, tok): each doc's ⌊(1−t)·sz⌋+1
    * globally-rarest tokens. Input must carry (doc_id, ts, sz). */
  def prefixTokens(docs: DataFrame, threshold: Double): DataFrame = {
    val toks = docs.select(col("doc_id"), col("sz"), explode(col("ts")).as("tok"))
    val tokDf = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    toks
      .join(tokDf, "tok") // shuffle join; AQE broadcasts iff vocab is small
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("tf"), col("tok"))))
      .withColumn("plen",
        (floor(lit(1.0 - tEff(threshold)) * col("sz")) + 1).cast("int"))
      .filter(col("pos") <= col("plen"))
      .select(col("doc_id"), col("tok"))
  }

  /** Distinct candidate pairs (id_a < id_b) sharing a prefix token. */
  def candidates(prefix: DataFrame): DataFrame =
    prefix.select(col("doc_id").as("id_a"), col("tok"))
      .join(prefix.select(col("doc_id").as("id_b"), col("tok")), "tok")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

  /** Merge-walk verification of candidate pairs with the size-band
    * prefilter; same (rounded vs raw) threshold semantics as
    * [[SetSimJoin.jaccardPairs]]. Input docs must carry (doc_id, ts, sz). */
  def verify(docs: DataFrame, cand: DataFrame, threshold: Double,
      filterOnRounded: Boolean = true): DataFrame = {
    val slim = docs.select(col("doc_id"), col("ts"), col("sz"))
    cand
      .join(slim.select(col("doc_id").as("id_a"),
        col("ts").as("ts_a"), col("sz").as("sz_a")), "id_a")
      .join(slim.select(col("doc_id").as("id_b"),
        col("ts").as("ts_b"), col("sz").as("sz_b")), "id_b")
      .filter(col("sz_a") * tEff(threshold) <= col("sz_b") &&
        col("sz_b") * tEff(threshold) <= col("sz_a"))
      .withColumn("inter", Exprs.sorted_intersect_count(col("ts_a"), col("ts_b")))
      .withColumn("uni",
        col("sz_a").cast("long") + col("sz_b") - col("inter"))
      .filter(col("uni") > 0)
      .withColumn("jac_raw", col("inter").cast("double") / col("uni"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("jac",
        expr("CAST((inter * 20000 + uni) div (2 * uni) AS DOUBLE)") / 10000.0)
      .filter((if (filterOnRounded) col("jac") else col("jac_raw")) >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** docs (doc_id, ts sorted-distinct array<string>) → (id_a, id_b, jac)
    * pairs at Jaccard ≥ threshold, candidates via the prefix filter. */
  def jaccardPairs(spark: SparkSession, docs0: DataFrame, threshold: Double,
      filterOnRounded: Boolean = true): DataFrame = {
    val docs = docs0.select(col("doc_id"), col("ts"))
      .withColumn("sz", size(col("ts")))
    verify(docs, candidates(prefixTokens(docs, threshold)),
      threshold, filterOnRounded)
  }
}
