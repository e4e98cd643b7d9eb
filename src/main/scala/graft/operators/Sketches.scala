package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable sketch aggregates. Spark ships HLL++ (`approx_count_distinct`)
  * and t-digest-style percentiles (`approx_percentile`) natively — those
  * are spec-checked elsewhere — but has no heavy-hitters sketch, so this
  * module adds SpaceSaving (Metwally et al., ICDT'05) as a typed
  * `Aggregator`: the 100 TB primitive for "which keys are hot" (skew
  * detection before salting, hot-domain discovery, top-K dashboards)
  * without an exact full-cardinality groupBy.
  *
  * Guarantees: the error envelope true ≤ est ≤ true + N/k holds
  * inductively under Spark's partial-aggregate merge tree (each merge
  * substitutes the absent side's min counter, which both upper-bounds
  * the untracked true count and is itself ≤ N_side/k — Agarwal et al.'s
  * mergeable-summaries argument). Presence of every item above N/k is
  * exact for a single-stream sketch; under merging the adversarial
  * presence threshold loosens toward 2N/k, so deployments size k a few
  * × above the target rank. Merge order across partitions may reorder
  * ties — the envelope, not exact counter values, is the contract
  * (EngineSpec pins envelope AND presence at N/k on a skewed
  * multi-partition stream).
  */
object Sketches {

  /** One sketch counter: estimated count and its max overestimate. */
  case class Heavy(item: Long, count: Long, err: Long)

  /** SpaceSaving over Long keys with capacity `k`. The buffer is a plain
    * Map encoded with the product encoder — at k ≤ a few thousand the
    * shuffled partial state is KBs. */
  class SpaceSaving(k: Int)
      extends Aggregator[Long, Map[Long, (Long, Long)], Seq[Heavy]] {

    override def zero: Map[Long, (Long, Long)] = Map.empty

    override def reduce(b: Map[Long, (Long, Long)], item: Long): Map[Long, (Long, Long)] =
      b.get(item) match {
        case Some((c, e)) => b.updated(item, (c + 1, e))
        case None if b.size < k => b.updated(item, (1L, 0L))
        case None =>
          // evict the min counter; the newcomer inherits its count as
          // overestimate (the SpaceSaving step)
          val (minItem, (minC, _)) = b.minBy { case (i, (c, _)) => (c, i) }
          (b - minItem).updated(item, (minC + 1, minC))
      }

    override def merge(a: Map[Long, (Long, Long)], b: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // mergeable-summaries merge: an item absent from a full sketch has
      // a count bounded by that sketch's min counter — add it as slack
      val minA = if (a.size < k) 0L else a.values.map(_._1).min
      val minB = if (b.size < k) 0L else b.values.map(_._1).min
      val merged = (a.keySet ++ b.keySet).iterator.map { i =>
        val (ca, ea) = a.getOrElse(i, (minA, minA))
        val (cb, eb) = b.getOrElse(i, (minB, minB))
        i -> (ca + cb, ea + eb)
      }.toMap
      if (merged.size <= k) merged
      else merged.toSeq
        .sortBy { case (i, (c, _)) => (-c, i) }
        .take(k).toMap
    }

    override def finish(b: Map[Long, (Long, Long)]): Seq[Heavy] =
      b.toSeq.map { case (i, (c, e)) => Heavy(i, c, e) }
        .sortBy(h => (-h.count, h.item))

    override def bufferEncoder: Encoder[Map[Long, (Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, (Long, Long)]]()

    override def outputEncoder: Encoder[Seq[Heavy]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Heavy]]()
  }

  /** Top heavy hitters of a Long column: one distributed pass, partial
    * sketches merged map-side like any aggregate, final top-`top` rows. */
  def heavyHitters(spark: SparkSession, items: DataFrame, col0: String,
      k: Int, top: Int): DataFrame = {
    import spark.implicits._
    val agg = new SpaceSaving(k).toColumn
    val sk = items.select(col(col0).cast("long").as("v"))
      .filter(col("v").isNotNull) // nulls (or uncastable keys) would kill
      .as[Long]                   // the primitive-Long encoder at runtime
      .select(agg.name("sk")).as[Seq[Heavy]].head()
    spark.createDataset(sk.take(top)).toDF("item", "count", "err")
  }

  /** Heavy-hitters gate. Sized EXACT on purpose: with k ≥ the distinct
    * key count (events has 1500 user_ids at sf0.1, k = 2048) no counter
    * is ever evicted, every partial sketch is an exact per-partition
    * count map, merges are exact sums with zero slack — so the sketch
    * provably equals GROUP BY count and DuckDB oracles it. The
    * approximate regime (k ≪ distinct, merge-order-dependent counters)
    * is EngineSpec's ε-N envelope spec, which this gate deliberately
    * does not re-test. */
  val q91 = Q.sql("q91_heavy_hitters",
    """SELECT user_id AS item, count(*) AS count, CAST(0 AS BIGINT) AS err
      |FROM events GROUP BY 1
      |ORDER BY count DESC, item LIMIT 10""".stripMargin) { (s, d) =>
    heavyHitters(s, Tables.events(s, d), "user_id", k = 2048, top = 10)
      .orderBy(col("count").desc, col("item"))
  }

  val all: Seq[Q] = Seq(q91)
}
