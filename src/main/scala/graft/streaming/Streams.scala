package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming over the events table. The reference is
  * batch-only (SURVEY §2.9 — "incremental" = scheduled re-harvest), so
  * these are the engine's forward-looking stream surface: the same
  * operators exposed as streams with Trigger.AvailableNow semantics —
  * a parquet drop-folder behaves like the reference's landing zone.
  *
  *  - windowed aggregation: tumbling-hour counts per event_type with a
  *    watermark (late data bounded at 1h);
  *  - stateful sessionization: flatMapGroupsWithState over user_id with a
  *    30-minute inactivity gap — the canonical custom-state operator.
  *
  * Both run synchronously here (memory sink + processAllAvailable) so the
  * batch oracle can check them; on a cluster the same code runs
  * continuously with kafka/files sources.
  */
object Streams {

  /** Start a streaming query and drain it, with the STATE partition
    * count sized separately from the session's batch shuffle setting.
    *
    * A stateful streaming query fixes its number of state partitions at
    * first start from `spark.sql.shuffle.partitions`, and every
    * micro-batch then pays per-partition state-store open/commit
    * overhead — at gate scale (KBs of state, many micro-batches) 32
    * partitions is almost pure overhead, while a deployment sizes this
    * to cores×k for state VOLUME. `SPARK_GRAFT_STREAM_PARTITIONS`
    * (default 8) is that knob; the session's batch setting is restored
    * after the query completes, and because these gates start fresh
    * queries (memory sink, ephemeral checkpoint) no persisted state can
    * disagree with the chosen count. */
  private def runToCompletion(spark: SparkSession,
      writer: org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    try {
      val q = writer.start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set(key, prev)
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessState(lastTs: Long, sessions: Long, events: Long)

  /** Sessionization on the Spark 4 arbitrary-state API
    * (`transformWithState` / `StatefulProcessor`, RocksDB-backed). Same
    * semantics as [[sessionize]]'s flatMapGroupsWithState version; what
    * the new API buys at scale:
    *
    *  - state lives in RocksDB with changelog checkpointing — per-key
    *    state is 3 longs regardless of history, and the store spills to
    *    disk instead of owning executor heap;
    *  - `TTLConfig` can expire idle users' state declaratively (the
    *    NoTimeout flatMapGroups version keeps every key forever);
    *  - timers/multiple typed state variables compose without re-keying.
    *
    * Within one micro-batch the key's rows are still sorted in memory —
    * bounded by trigger size (`maxFilesPerTrigger`/`maxBytesPerTrigger`),
    * not by stream length; cross-batch nothing is ever re-buffered.
    */
  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionAgg] {
    @transient private var st: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionAgg] = {
      val sorted = rows.toArray.sortInPlaceBy(e => (e.ts.getTime, e.event_id))
      var s = if (st.exists()) st.get() else SessState(Long.MinValue, 0L, 0L)
      sorted.foreach { e =>
        val t = e.ts.getTime
        val newSession = s.lastTs == Long.MinValue || t - s.lastTs > gapMs
        s = SessState(t, if (newSession) s.sessions + 1 else s.sessions, s.events + 1)
      }
      st.update(s)
      Iterator.single(SessionAgg(key, s.sessions, s.events))
    }
  }

  /** [[sessionize]] re-expressed on `transformWithState` — emits the
    * per-user running (n_sessions, n_events) each batch; the memory-sink
    * fold keeps the last row per user exactly like the q51 path. */
  def sessionizeTws(spark: SparkSession, dir: String, queryName: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider —
    // set it for THIS query only and restore after, so a later streaming
    // query resuming a checkpoint written under the default provider
    // doesn't silently start against the wrong state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = eventStream(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      runToCompletion(spark, events.groupByKey(_.user_id)
        .transformWithState(new SessionProcessor(gapMinutes * 60000L),
          TimeMode.None(), OutputMode.Update())
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(queryName))
      val t = spark.table(queryName)
      t.groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
        .select(col("user_id"), col("s.n_sessions").as("n_sessions"),
          col("s.n_events").as("n_events"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // Same dtype branch as Tables.loadEvents: 3.x-era readers need
    // nanosAsLong (INT64 TIMESTAMP(NANOS) → raw long), 4.1+ reads it
    // natively as TIMESTAMP_NTZ with the ns→us truncation built in.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources take a directory: point at the sf dir with a
    // glob so the events drop-folder shape is preserved
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling 1-hour window counts by event_type, 1h watermark. */
  def windowedCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"))
    runToCompletion(spark, agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    spark.table(queryName)
  }

  /** Streaming exact dedup: first-seen row per key, the shape a
    * training-data pipeline uses to drop duplicate documents as they
    * arrive. Unwatermarked here (state = one entry per distinct key;
    * bounded by key cardinality); with an event-time watermark the state
    * self-expires — `dropDuplicatesWithinWatermark` — which is the 100 TB
    * deployment mode. */
  def streamDedup(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val deduped = eventStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    runToCompletion(spark, deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName))
    spark.table(queryName)
  }

  /** Native session-window sessionization — the scale path. The
    * `session_window` aggregation keeps per-session aggregates in the
    * state store (merged incrementally as rows arrive), so no executor
    * ever buffers a key's raw events the way [[sessionize]]'s group
    * iterator does; a hot key costs one state row per open session, not
    * one per event. Emits per-user session count, event count, and total
    * active span (sum over sessions of last-event − first-event, ms).
    *
    * Append mode (the only mode Spark supports for session-window
    * aggregations): a session row is emitted exactly once, when the
    * watermark passes its end — i.e. only CLOSED sessions appear, and
    * sessions still open at the tail of the input stay in state, which
    * is precisely the semantics a continuous deployment wants. With the
    * 0-second watermark used here, closed means
    * `session_end ≤ ms-floor(max event time)` (Spark tracks watermarks
    * in milliseconds); the q63 oracle replicates that rule exactly.
    */
  def sessionizeNative(spark: SparkSession, dir: String, queryName: String,
      gapMinutes: Int = 30): DataFrame = {
    val gapMs = gapMinutes * 60000L
    val sessions = eventStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
    runToCompletion(spark, sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName))
    spark.table(queryName)
      .select(col("user_id"), col("n_events"),
        (unix_millis(col("session_window.end"))
          - unix_millis(col("session_window.start")) - gapMs).as("active_ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("active_ms")).as("active_ms"))
  }

  /** Streaming dedup in its 100 TB deployment mode:
    * `dropDuplicatesWithinWatermark` — state self-expires once the
    * watermark passes a key's event time plus the delay, so the state
    * store holds a bounded window of keys instead of every key ever
    * seen (the trade: duplicates farther apart than the delay are kept;
    * a training-data firehose dedupes within the replay window and
    * relies on the batch dedup pass for the long tail). */
  def streamDedupWithinWatermark(spark: SparkSession, dir: String,
      queryName: String, delay: String = "10 days"): DataFrame = {
    val deduped = eventStream(spark, dir)
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
    runToCompletion(spark, deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName))
    spark.table(queryName)
  }

  /** Stream-static enrichment: the events stream joined against the
    * static customer→nation dimensions, then aggregated per nation.
    * The static sides are plain DataFrames — Spark broadcasts them into
    * every micro-batch (no stream-side shuffle for the join; state
    * exists only for the final aggregation), which is exactly the 100 TB
    * deployment shape for dimension enrichment of a firehose. */
  def streamStaticEnrich(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val agg = eventStream(spark, dir)
      .join(customer, customer("c_custkey") === col("user_id") + 1)
      .join(nation, nation("n_nationkey") === customer("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("cnt"))
    runToCompletion(spark, agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    spark.table(queryName)
  }

  /** Stream-stream interval join: view events joined to the same user's
    * purchase events landing within the following hour — the attribution
    * shape (impression→conversion). Both sides carry a watermark and the
    * join condition bounds event-time distance, so Spark derives a state
    * eviction bound for BOTH sides: a view's state lives until the
    * purchase watermark passes view_ts + 1h, a purchase's until the view
    * watermark passes purchase_ts — nothing accumulates forever, which
    * is what makes the operator deployable against an unbounded
    * firehose. Inner join → append mode: each matched pair is emitted
    * exactly once, when it forms. Timestamps compare at micro precision
    * on both engine and oracle (the parquet source is nanos). */
  def streamStreamJoin(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val views = eventStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val pairs = views.join(purchases,
      expr("""v_user = p_user AND
             |p_ts > v_ts AND
             |p_ts <= v_ts + interval 1 hour""".stripMargin))
    runToCompletion(spark, pairs.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName))
    spark.table(queryName)
  }

  /** Idempotent micro-batch parquet writer for `foreachBatch` — the
    * exactly-once sink contract: each batch lands in its own
    * `batch_id=N` partition via dynamic partition overwrite, so a
    * redelivered batch (restart between sink write and offset commit —
    * Structured Streaming's at-least-once window) REPLACES its partition
    * instead of appending duplicates. Downstream reads see each record
    * once; the layer stays partition-prunable by batch. */
  def idempotentBatchWriter(outDir: String): (DataFrame, Long) => Unit =
    (df, batchId) => df
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** Sessionize per user with a 30-minute inactivity gap; emit per-user
    * session and event counts. State = (last event time, session count,
    * event count); events arrive time-ordered per group after a
    * secondary sort inside the group iterator — fixture-scale only; the
    * scale path is [[sessionizeNative]], which never materializes a
    * key's events. */
  def sessionize(spark: SparkSession, dir: String, queryName: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]

    def fn(userId: Long, it: Iterator[Event],
        state: GroupState[(Long, Long, Long)]): Iterator[SessionAgg] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var (lastTs, sessions, count) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (lastTs == Long.MinValue || t - lastTs > gapMinutes * 60000L) sessions += 1
        lastTs = t
        count += 1
      }
      state.update((lastTs, sessions, count))
      Iterator(SessionAgg(userId, sessions, count))
    }

    runToCompletion(spark, events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(fn)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName))
    // Update-mode memory sink appends one row per group per batch; the
    // final state per user is the last emitted row.
    val t = spark.table(queryName)
    t.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"), col("s.n_sessions").as("n_sessions"),
        col("s.n_events").as("n_events"))
  }

  /** Streaming HyperLogLog: the q131 register grid maintained by a
    * Complete-mode max aggregation over the event stream — distinct
    * users per event type from O(m) state per key while the stream
    * runs. Monotone max registers are the ideal streaming state: the
    * engine's incremental aggregation IS the sketch merge, no custom
    * stateful operator, and the final state provably equals the batch
    * sketch (the gate's oracle is q131's, verbatim). At 100 TB the
    * same query runs unbounded with the memory sink swapped for a
    * foreachBatch register-table upsert. */
  def hllSketch(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    import graft.operators.Sketches
    val regs = Sketches.hllRowRegs(eventStream(spark, dir))
      .groupBy("event_type", "reg_id").agg(max("rho").as("rho"))
    runToCompletion(spark, regs.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    // hllFinish self-joins the register frame (grid fill + estimate);
    // the memory-sink View keeps one attribute set per name, which the
    // analyzer cannot deduplicate across that self-join — checkpoint the
    // (≤ 5·64-row) state to give the finish plan fresh leaves.
    Sketches.hllFinish(spark.table(queryName).localCheckpoint(true))
  }

  /** Streaming Count-Min registers: each event contributes one
    * increment to `Depth` cells; a Complete-mode SUM aggregation over
    * (row, cell) IS the incrementally-maintained sketch — additive
    * counters are to sum-state what HLL's rho is to max-state
    * ([[hllSketch]]), so the streaming engine's state store does the
    * merging and the final registers equal the batch grid exactly
    * (the DuckDB oracle replays them from grouped exact counts). State
    * is bounded by depth×width regardless of stream length — the
    * always-on frequency monitor shape. */
  /** The register aggregation itself — one definition serving both the
    * batch recompute (spec) and the Complete-mode stream ([[cmsSketch]]). */
  def cmsRegisters(events: DataFrame): DataFrame = {
    import graft.operators.Sketches.Cms
    import graft.functions.Exprs
    events
      .filter(col("user_id").isNotNull)
      .select(Exprs.poly_hash(col("user_id").cast("string")).as("h"))
      .select(explode(array((0 until Cms.Depth).map { i =>
        struct(lit(i.toLong).as("i"),
          pmod(Exprs.mulmod61(col("h"), Cms.Gs(i)), lit(Cms.Width.toLong))
            .as("cell"))
      }: _*)).as("rc"))
      .select(col("rc.i").as("i"), col("rc.cell").as("cell"))
      .groupBy("i", "cell").agg(count(lit(1)).as("reg"))
  }

  def cmsSketch(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    runToCompletion(spark, cmsRegisters(eventStream(spark, dir)).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    spark.table(queryName).orderBy("i", "cell")
  }

  /** Streaming exact top-k — the live leaderboard shape (q91's exact
    * regime maintained under a stream): Complete-mode per-key counts
    * ARE the state (bounded by distinct keys, the premise q91's
    * k ≥ distinct sizing makes explicit), and the top-k selection is a
    * bounded fold over the sink table, re-evaluated per trigger in
    * production. Counts stay exact integers end to end, so the gate's
    * oracle is the plain batch GROUP-BY top-k. */
  def topkSketch(spark: SparkSession, dir: String, queryName: String,
      top: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = eventStream(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("count"))
    runToCompletion(spark, counts.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    spark.table(queryName).localCheckpoint(true)
      .select(col("user_id").as("item"), col("count").cast("long").as("count"))
      .orderBy(col("count").desc, col("item")).limit(top)
  }

  /** Streaming maintenance of q159's dyadic decayed counters: the
    * stream keeps ONE additive register pair per (event_type, day) —
    * a Complete-mode count, the state a day's refresh shifts-and-adds —
    * and the decay weighting is the bounded batch fold over the sink
    * table (state-sized, ≤ types × days rows), where the reference day
    * is whatever the stream has seen. Counters stay exact integers end
    * to end, so the gate shares q159's oracle verbatim. */
  def decayedSketch(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val daily = eventStream(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    runToCompletion(spark, daily.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName))
    // localCheckpoint: the sink table feeds both the max-day scalar and
    // the weighting join (the memory-sink self-reference gotcha)
    val t = spark.table(queryName).localCheckpoint(true)
    val ref = t.agg(max(col("day")).as("ref_day"))
    t.crossJoin(broadcast(ref))
      .withColumn("d", datediff(col("ref_day"), col("day")))
      .withColumn("w",
        when(col("d") <= 40, expr("n * shiftleft(1L, 40 - d)")).otherwise(0L))
      .groupBy("event_type")
      .agg(sum("n").cast("long").as("n_events"),
        sum("w").cast("long").as("decayed_q40"))
      .orderBy("event_type")
  }
}
