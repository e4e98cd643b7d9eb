package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series resampling with gap fill — the as-of join's cousin: an
  * irregular event stream becomes a regular per-key grid (one row per
  * key per bucket between that key's first and last event) carrying the
  * last observation forward across empty buckets.
  *
  * Scale shape (verified on the executed plan): exactly two slim hash
  * exchanges — one on (key, bucket) for the per-bucket last-event rank,
  * one on key that the bounds aggregate and the LOCF window both reuse;
  * the per-bucket table broadcasts into the grid join. The grid explode
  * is lazy (sequence per key, never a driver loop), and the fill is a
  * single running `last(ignoreNulls)` window — cost linear in grid
  * rows, independent of how many events a bucket holds.
  */
object Resample {

  /** LOCF resample of (user_id, ts, event_id, value) rows into
    * `bucketUs`-microsecond buckets. Within a bucket the LAST event wins
    * (max micros, event_id tie-break); empty buckets inherit the
    * previous value. Values round to 4 decimals for the cross-engine
    * compare. Bucketing uses FLOOR division (pmod-based, exact in long
    * arithmetic) so pre-1970 timestamps land in the bucket below zero —
    * Spark's `div` truncates toward zero and would merge the two buckets
    * adjacent to the epoch; DuckDB's `//` (the oracle) already floors. */
  def locf(ev: DataFrame, bucketUs: Long): DataFrame = {
    val e = ev.select(col("user_id"),
      expr("unix_micros(ts)").as("us"),
      // floorDiv(us, b) = (us - pmod(us, b)) / b — the numerator is an
      // exact multiple of b, so integer div is exact floor for any sign
      expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $bucketUs)) div $bucketUs").as("h"),
      col("event_id"), col("value"))
    val lastPerBucket = Window.partitionBy("user_id", "h")
      .orderBy(col("us").desc, col("event_id").desc)
    val lastv = e.withColumn("rn", row_number().over(lastPerBucket))
      .filter(col("rn") === 1).select("user_id", "h", "value")
    val bounds = e.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"))).as("h"))
    val fill = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastv, Seq("user_id", "h"), "left")
      .withColumn("v", round(last(col("value"), ignoreNulls = true).over(fill), 4))
      .select(col("user_id"), col("h").cast("long").as("h"), col("v"))
  }

  /** Hourly LOCF resample of the events stream (users < 50 keep the
    * grid gate-sized); the oracle rebuilds the same grid and fill with
    * generate_series + IGNORE NULLS last_value. */
  val q95 = Q.sql("q95_resample_locf",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, value
      |  FROM events WHERE user_id < 50),
      |ph AS (
      |  SELECT user_id, us // 3600000000 AS h, value,
      |    row_number() OVER (PARTITION BY user_id, us // 3600000000
      |                       ORDER BY us DESC, event_id DESC) AS rn
      |  FROM e),
      |lastv AS (SELECT user_id, h, value FROM ph WHERE rn = 1),
      |bounds AS (
      |  SELECT user_id, min(us // 3600000000) AS h0,
      |         max(us // 3600000000) AS h1
      |  FROM e GROUP BY 1),
      |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds)
      |SELECT g.user_id, CAST(g.h AS BIGINT) AS h,
      |  round(last_value(l.value IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v
      |FROM grid g LEFT JOIN lastv l ON g.user_id = l.user_id AND g.h = l.h
      |ORDER BY g.user_id, g.h""".stripMargin) { (s, d) =>
    locf(Tables.events(s, d).filter(col("user_id") < 50), 3600000000L)
      .orderBy("user_id", "h")
  }

  val all: Seq[Q] = Seq(q95)
}
