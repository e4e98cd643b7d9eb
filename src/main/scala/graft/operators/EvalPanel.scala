package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exprs

/** The fixed-size evaluation query panel (round-12 verdict item #8):
  * recall / MaxSim / rerank EVALUATION gates originally used the whole
  * corpus (or a fixed FRACTION of it) as the query set, so their brute
  * truth tables grew |Q|·N = N²·const — fine as oracle anchors, wrong
  * as a model of how eval runs on a 100 TB corpus, where the query
  * workload is a fixed panel and the truth table is panel×corpus =
  * LINEAR in N.
  *
  * The panel is the [[PanelK]] vec_ids with the smallest
  * (vec_id·g mod 2⁶¹−1, vec_id) — a deterministic hash-selected sample
  * (g is the house q168 multiplier), unbiased with respect to insertion
  * order and stable under corpus growth in distribution (each new
  * vector displaces a panel member with probability K/N). On the
  * engine it is `orderBy(h, vec_id).limit(K)` — Spark plans
  * TakeOrderedAndProject, a per-partition top-K plus a K-row driver
  * merge, NO single-partition sort (PlanSpec pins the operator). The
  * oracle replays it as ORDER BY + LIMIT over the identical HUGEINT
  * arithmetic.
  */
object EvalPanel {

  val PanelK = 100
  /** The q168 house multiplier — already replayed by DuckDB HUGEINT
    * arithmetic in the JL sign-matrix oracles. */
  val PanelG = 1752450205419405103L

  /** (vec_id) frame of the panel members. `e` must carry vec_id. */
  def panel(e: DataFrame): DataFrame =
    e.select(col("vec_id"))
      .withColumn("h", Exprs.mulmod61(col("vec_id"), PanelG))
      .orderBy("h", "vec_id").limit(PanelK)
      .select("vec_id")

  /** The oracle spelling — a CTE body selecting the panel vec_ids from
    * the named CTE (any table carrying vec_id). */
  def panelSql(src: String = "e"): String =
    s"""SELECT vec_id FROM (
       |    SELECT vec_id,
       |      CAST(CAST(vec_id AS HUGEINT) * $PanelG
       |           % 2305843009213693951 AS BIGINT) AS h
       |    FROM $src) ORDER BY h, vec_id LIMIT $PanelK""".stripMargin
}
