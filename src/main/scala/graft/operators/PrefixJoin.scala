package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Exprs, Text}

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
  * On the synthetic corpus (30-word vocabulary, most pairs similar) the
  * candidate set degenerates toward all pairs and the brute-force plan
  * (q24) wins on constant factors — which is exactly why both exist:
  * brute force for small-n or dense similarity, prefix join for the
  * 100 TB sparse-similarity regime. The spec asserts both produce
  * identical results.
  */
object PrefixJoin {

  def jaccardPairs(spark: SparkSession, docs0: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    val docs = docs0
      .select($"doc_id", Text.tokenSet($"text").as("ts"))
      .withColumn("sz", size($"ts"))

    // global rarest-first token order by document frequency
    val df = docs.select($"doc_id", explode($"ts").as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    // rank tokens; ties broken lexically for determinism
    val ranked = df.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"tf", $"tok")))
      .select("tok", "rank")

    // re-sort each doc's tokens by global rank and take the prefix
    val byRank = docs.select($"doc_id", $"sz", explode($"ts").as("tok"))
      .join(broadcast(ranked), "tok")
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"rank")))
      .withColumn("plen", floor((lit(1.0) - threshold) * $"sz").cast("int") + 1)
      .filter($"pos" <= $"plen")
      .select($"doc_id", $"tok")

    // candidates: docs sharing a prefix token
    val cand = byRank.select($"doc_id".as("id_a"), $"tok")
      .join(byRank.select($"doc_id".as("id_b"), $"tok"), "tok")
      .filter($"id_a" < $"id_b")
      .select("id_a", "id_b").distinct()

    // verify with the merge-walk kernel + size prefilter
    val slim = docs.select($"doc_id", $"ts", $"sz")
    cand
      .join(slim.select($"doc_id".as("id_a"), $"ts".as("ts_a"), $"sz".as("sz_a")), "id_a")
      .join(slim.select($"doc_id".as("id_b"), $"ts".as("ts_b"), $"sz".as("sz_b")), "id_b")
      .filter($"sz_a" * (threshold - 0.0001) <= $"sz_b" &&
        $"sz_b" * (threshold - 0.0001) <= $"sz_a")
      .withColumn("inter", Exprs.sorted_intersect_count($"ts_a", $"ts_b"))
      .withColumn("jac",
        round($"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"), 4))
      .filter($"jac" >= threshold)
      .select("id_a", "id_b", "jac")
  }
}
