package graft.ingest

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S1/S3/S6 — harvest planning and landing-zone maintenance for the
  * paginated FI-Admin REST source (reference tasks_for_01.py,
  * 01_full_update.py). The HTTP fetch itself is environment-dependent
  * (zero egress here); everything around it is engine logic:
  *
  *  - the striped page plan (worker i fetches offsets i·limit,
  *    i·limit + w·limit, … — `01_full_update.py:67-80`): at scale the
  *    plan becomes `spark.range(nPages)` repartitioned to the fetch
  *    parallelism, each partition running the HTTP loop in mapPartitions
  *    and appending JSONL to the landing zone;
  *  - the incremental trailing window (X28, `tasks_for_01.py:117-119` —
  *    docstring says 5 days, code says 10; code wins);
  *  - the dead-letter replay union (S3): failed page params are data, the
  *    replay pass is re-fetch + union before dedup;
  *  - last-write-wins upsert (S6): the Mongo `UpdateOne(upsert=True)`
  *    becomes a windowed keep-latest merge by id.
  */
object Harvest {

  case class Page(worker: Int, offset: Int, limit: Int)

  /** Striped page plan: worker i fetches offsets i·limit, i·limit+step,…
    * with step = workers·limit, until total is covered. */
  def planPages(total: Int, limit: Int = 100, workers: Int = 3): Seq[Page] =
    (0 until workers).flatMap { w =>
      Iterator.from(0).map(k => w * limit + k * workers * limit)
        .takeWhile(_ < total)
        .map(off => Page(w, off, limit))
    }.sortBy(p => (p.worker, p.offset))

  /** X28 — incremental harvest params: trailing N-day window. */
  def incrementalParams(today: LocalDate, days: Int = 10): Map[String, String] =
    Map("updated_time__gte" ->
      today.minusDays(days.toLong).format(DateTimeFormatter.ISO_LOCAL_DATE))

  /** X28 — the DATE_PARAM bounded-window mode (reference
    * `01_date_param_update.py` + `tasks_for_01.py:120-123`, the backfill
    * shape): explicit start/end dates become full-day-inclusive bounds —
    * the reference appends "T00:00:00" to start and "T23:59:59" to end,
    * so both endpoint DAYS are included but a sub-second instant after
    * end 23:59:59 is not. Emitted exactly as the reference sends them. */
  def dateParamParams(startDate: LocalDate, endDate: LocalDate): Map[String, String] =
    Map(
      "updated_time__gte" ->
        s"${startDate.format(DateTimeFormatter.ISO_LOCAL_DATE)}T00:00:00",
      "updated_time__lte" ->
        s"${endDate.format(DateTimeFormatter.ISO_LOCAL_DATE)}T23:59:59")

  /** The server-side filter the DATE_PARAM (or INCREMENTAL) params ask
    * the API to apply, replayed engine-side: `__gte`/`__lte` are
    * INCLUSIVE timestamp comparisons. Used to bound a re-harvest plan to
    * the window's documents and by gates/specs to pin the semantics. */
  def applyDateWindow(df: DataFrame, tsCol: String,
      params: Map[String, String]): DataFrame = {
    // bound literals are cast to the COLUMN's own timestamp type
    // (events.parquet loads as TIMESTAMP or TIMESTAMP_NTZ depending on
    // the writer's nanos encoding — see Tables.loadEvents; session TZ is
    // UTC so the two agree) rather than to_timestamp's session-TZ type
    def bound(b: String) =
      lit(b.replace("T", " ")).cast(df.schema(tsCol).dataType)
    val withGte = params.get("updated_time__gte").fold(df)(b =>
      df.filter(col(tsCol) >= bound(b)))
    params.get("updated_time__lte").fold(withGte)(b =>
      withGte.filter(col(tsCol) <= bound(b)))
  }

  /** The page plan as a DataFrame — the distributed fetch skeleton:
    * `.repartition(workers)` then mapPartitions(httpFetch) at runtime. */
  def planDf(spark: SparkSession, total: Long, limit: Int = 100,
      workers: Int = 3): DataFrame = {
    import spark.implicits._
    // generated DISTRIBUTED: spark.range splits the offset space across
    // tasks and the worker stripe is (offset/limit) mod workers — the
    // same assignment planPages computes (HarvestSpec pins equality), but
    // the driver never materializes the plan and a >2³¹-document corpus
    // plans without Int overflow (round-14 hardening; planPages stays as
    // the driver-side helper for small plans)
    // integral `div`, not Column `/` (double division — exact only
    // below 2^53, which would undercut the Long-hardening intent);
    // `id div limit` stays LongType end-to-end (r14 advice)
    spark.range(0, total, limit.toLong)
      .select((expr(s"id div ${limit.toLong}") % workers)
          .cast("int").as("worker"),
        $"id".as("offset"), lit(limit).as("limit"))
      .repartition(workers, col("worker"))
  }

  /** S4 — targeted re-harvest by id list (reference 01_ids_update.py):
    * one fetch unit per id, striped across workers like the page plan. */
  def planIds(ids: Seq[Long], workers: Int = 3): Seq[(Int, Long)] =
    ids.zipWithIndex.map { case (id, i) => (i % workers, id) }

  /** S6 — last-write-wins upsert of a new batch into the landing zone,
    * keyed on `idCol`, latest `versionCol` (e.g. updated_time) kept;
    * ties broken toward the new batch. */
  def upsert(existing: DataFrame, incoming: DataFrame, idCol: String,
      versionCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)))
    val w = Window.partitionBy(idCol)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
