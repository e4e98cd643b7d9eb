package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join: for each left row, attach the one right row with the
  * greatest right timestamp ≤ the left timestamp within the same key —
  * the standard "state of the world when the event happened" lookup
  * (price at trade time, last purchase before a click, latest config
  * before a job ran).
  *
  * Spark has no native ASOF JOIN, and the naive formulation — an
  * inequality join followed by a max-per-left-row dedup — materializes
  * O(|L|·|R|) candidate pairs per key before collapsing them. This
  * implementation is the union + single-window-pass algorithm instead:
  * tag both sides, union, and take `last(payload, ignoreNulls)` over a
  * (key, ts)-ordered running window. Cost is ONE shuffle on the key and
  * one sort — the same price as a sort-merge join — independent of how
  * many right rows precede each left row, so it survives 100 TB where
  * the theta-join does not. Ties at equal timestamps order the right row
  * first (ASOF `>=` semantics).
  *
  * Contract: the right side must be unique per (key, ts) — dedupe
  * upstream if not, or the attached payload is ambiguous.
  */
object AsofJoin {

  /** Left columns survive; `payload` columns from the right arrive
    * null-filled when no right row precedes. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pStruct = struct(payload.map(right(_)): _*)
    // a null right timestamp must never match (ASOF's l.ts >= r.ts is
    // null-rejecting); unfiltered it would sort FIRST in the ascending
    // window and get carried forward as a fabricated payload
    val r = right.filter(right(rightTs).isNotNull).select(
      Seq(right(key).as(key), right(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__side"), pStruct.as("__p")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(left(key).as(key), left(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__side"), lit(null).cast(r.schema("__p").dataType).as("__p")) ++
        leftCols.filterNot(_ == key).map(left(_)): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__last.$p").as(p)): _*)
  }

  /** Gate: for every `view` event, the user's most recent `purchase` at
    * or before it (event id + value). (user_id, ts) is unique in the
    * synthetic events table, so the contract holds without a dedup. */
  val q66 = Q.sql("q66_asof_join",
    """SELECT l.event_id, l.user_id, r.event_id AS purchase_event_id,
      |       r.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'view') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val views = events.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"),
        col("value").as("purchase_value"))
    asof(views, purchases, "user_id", "ts", "ts",
      Seq("purchase_event_id", "purchase_value"))
      .select("event_id", "user_id", "purchase_event_id", "purchase_value")
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(q66)
}
