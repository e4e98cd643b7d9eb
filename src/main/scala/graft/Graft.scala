package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** The library façade — the operator surface a user of the reference
  * pipeline (bireme/data-governance) programs against, re-expressed
  * Spark-first. Every method delegates to a gate-checked module; see
  * README.md for the operator→gate map.
  *
  * {{{
  * val spark = SparkSession.builder()...getOrCreate()
  *
  * // governance: landing JSONL → iAHx docs → enriched → Solr XML
  * val layers = Graft.runGovernance(spark, "s3://…/landing.jsonl",
  *   "s3://…/warehouse", lookups, instTab, dbInstTab, temas, 2026)
  *
  * // training-data ops over a (doc_id, text) corpus
  * val pairs = Graft.nearDupPairs(spark, docs, threshold = 0.8)
  * val keep  = Graft.dedupDecisions(spark, dir, jaccard = 0.9)
  * }}}
  */
object Graft {

  // ---- governance pipeline (SURVEY §3.1) ---------------------------------

  /** 01→04: standardize (02+02_x01), enrich (03), export (04). Layers are
    * update-month-partitioned parquet; see [[pipeline.Governance]]. */
  def runGovernance(spark: SparkSession, landingJsonl: String, outDir: String,
      lookups: gov.Lookups, instTab: Seq[gov.Enrich.InstRow],
      dbInstTab: Seq[gov.Enrich.DbInstRow], temas: Seq[gov.Enrich.TemaRow],
      nowYear: Int): pipeline.Governance.Layers =
    pipeline.Governance.run(spark, landingJsonl, outDir, lookups,
      instTab, dbInstTab, temas, nowYear)

  /** Incremental layer scan: only partitions with update month ≥ yyyymm. */
  def readLayerSince(spark: SparkSession, layerPath: String,
      sinceMonth: String): DataFrame =
    pipeline.Governance.readLayerSince(spark, layerPath, sinceMonth)

  /** The 02-layer document transform (X1–X19 + 02_x01) as a typed map —
    * reference-golden semantics including key-presence quirks. */
  def standardize(ds: Dataset[gov.Landing], lookups: gov.Lookups,
      nowYear: Int): Dataset[gov.IahxDoc] =
    gov.Gov.toIahx(ds, lookups, nowYear)

  // ---- deduplication ------------------------------------------------------

  /** Exact-threshold Jaccard near-dup pairs over (doc_id, text rows).
    * Adaptive physical plan: dense-vocab bitsets / hashed merge walk
    * (see [[operators.SetSimJoin]]); [[operators.PrefixJoin]] for the
    * subquadratic candidate path. */
  def nearDupPairs(spark: SparkSession, docs: DataFrame,
      threshold: Double): DataFrame =
    operators.SetSimJoin.jaccardPairs(spark,
      docs.select(col("doc_id"),
        functions.Text.tokenSet(col("text")).as("ts")), threshold)

  /** Near-dup pairs → connected components → keep/drop decision per doc
    * (survivor = min doc_id per component). */
  def dedupDecisions(spark: SparkSession, dir: String,
      jaccard: Double): DataFrame =
    operators.DedupClusters.decisions(spark, dir, jaccard)

  /** Connected components over an (id_a, id_b) edge set: driver
    * union-find when small, bounded label propagation at scale. */
  def connectedComponents(spark: SparkSession, pairs: DataFrame): DataFrame =
    operators.DedupClusters.connectedComponents(spark, pairs)

  // ---- text analysis ------------------------------------------------------

  /** Heuristic language ID column (marker-word argmax + CJK gate). */
  def langId(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.Text.langId(text)

  /** Composite quality score in [0,1]. */
  def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.Text.qualityScore(text)

  /** Sorted-distinct whitespace token set. */
  def tokenSet(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.Text.tokenSet(text)

  /** Word n-gram shingles (codegen kernel). */
  def shingles(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    functions.Text.shingles(tokens, n)

  /** HTML→text extraction (WET step): script/style/tag/entity strip. */
  def stripHtml(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.Text.stripHtml(html)

  /** ftfy-style encoding repair (single-pass longest-match kernel). */
  def fixMojibake(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.Text.fixMojibake(text)

  // ---- quality checks -----------------------------------------------------

  /** One-row-per-check quality report over the star schema. */
  def qualityReport(spark: SparkSession, dir: String): DataFrame =
    quality.Checks.report(spark, dir)

  /** SpaceSaving heavy hitters of a Long column: one distributed pass,
    * est ≤ true + N/k, any item above N/k guaranteed present. */
  def heavyHitters(spark: SparkSession, items: DataFrame, column: String,
      k: Int, top: Int): DataFrame =
    operators.Sketches.heavyHitters(spark, items, column, k, top)

  // ---- training-data shaping ---------------------------------------------

  /** One-pass n-gram repetition counters `[total, distinct, max_count]`
    * for Gopher-style repetition filters (codegen kernel, no shuffle). */
  def repetitionStats(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    functions.Exprs.repetition_stats(tokens, n)

  /** Redact emails, phones, and IPv4s from a text column. */
  def redactPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    quality.Pii.redact(text)

  /** LOCF resample: irregular (user_id, ts, event_id, value) events to
    * a regular per-key grid, last observation carried forward. */
  def resampleLocf(events: DataFrame, bucketMicros: Long): DataFrame =
    operators.Resample.locf(events, bucketMicros)

  /** As-of join: latest right row at-or-before each left row's
    * timestamp per key — one shuffle, no theta-join blow-up. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    operators.AsofJoin.asof(left, right, key, leftTs, rightTs, payload)

  /** Cosine top-k neighbors, auto-routed: exact brute force for small
    * vector tables, IVF probes over deterministic k-means lists at
    * scale (threshold on [[operators.Similarity.BruteForceCap]]). */
  def cosineTopK(spark: SparkSession, embeddings: DataFrame, topK: Int): DataFrame =
    operators.Similarity.cosineTopK(spark, embeddings, topK)

  /** Semantic (embedding-space) dedup decisions: banded-SRP candidates →
    * exact rounded-cosine ≥ threshold → components → keep = min vec_id.
    * `e` needs (vec_id, embedding: array<float>). */
  def semanticDedup(spark: SparkSession, e: DataFrame,
      threshold: Double): DataFrame =
    operators.Similarity.semanticDedupDecisions(spark, e, threshold)

  /** Line-level boilerplate removal (C4/RefinedWeb rule): drop
    * `width`-token segments occurring in ≥ `minDf` docs, reassemble. */
  def lineDedup(docs: DataFrame, width: Int = 3, minDf: Long = 3): DataFrame =
    operators.TextOps.lineDedup(docs, width, minDf)

  /** Best-fit-decreasing sequence packing per language stratum. */
  def packBfd(docs: DataFrame, budget: Long): DataFrame =
    operators.Chunking.packBestFitDecreasing(docs, budget)

  /** Domain-mix rebalancing: keep the top-`k` docs per source by
    * salted-hash rank (two-phase variant for heavy-hitter sources on
    * [[operators.DataSplit.sourceCapTwoPhase]]). */
  def sourceCap(docs: DataFrame, k: Int): DataFrame =
    operators.DataSplit.sourceCap(docs, k)

  /** Deterministic pre-training shuffle: content-hash shard plus a
    * stable pseudo-random in-shard position — byte-reproducible across
    * reruns, salts disjoint from split/sample/cap hashes. */
  def shardShuffle(docs: DataFrame): DataFrame =
    operators.TrainingPipeline.shardShuffle(docs)

  /** Epoch mixing: repeat each language stratum `n` times (per the
    * (lang, n) `mix` table), each copy epoch-tagged — broadcast join +
    * lazy explode, no shuffle. */
  def epochMix(docs: DataFrame, mix: DataFrame): DataFrame =
    operators.TrainingPipeline.epochMix(docs, mix)

  /** Eval-set decontamination through a broadcast Bloom prefilter: the
    * train side is probed map-side, only the surviving sliver is
    * distinct-shuffled into the exact confirm join — bit-identical to
    * the direct overlap join. */
  def decontaminate(spark: SparkSession, docs: DataFrame,
      fpp: Double = 0.01): DataFrame =
    operators.DataSplit.decontaminateBloom(spark, docs, fpp)

  /** Multimodal inference batch formation: bucket by decoded shape,
    * pack fixed-size batches in stable id order. */
  def inferenceBatches(media: Dataset[multimodal.Multimodal.MediaRow],
      batchSize: Int): DataFrame =
    multimodal.Multimodal.inferenceBatches(media, batchSize)

  // ---- streaming ----------------------------------------------------------

  /** Native session-window sessionization over an events drop-folder —
    * per-session state, no per-key buffering; emits closed sessions. */
  def sessionize(spark: SparkSession, dir: String, queryName: String,
      gapMinutes: Int = 30): DataFrame =
    streaming.Streams.sessionizeNative(spark, dir, queryName, gapMinutes)

  /** Exactly-once `foreachBatch` parquet sink: each micro-batch lands in
    * its own partition via dynamic overwrite, so redelivery replaces
    * instead of appending. */
  def idempotentBatchWriter(outDir: String): (DataFrame, Long) => Unit =
    streaming.Streams.idempotentBatchWriter(outDir)

  /** Watermarked stream-stream interval join (impression→conversion
    * attribution): same-user pairs within the event-time bound, join
    * state evicted on both sides by the watermarks. */
  def streamAttribution(spark: SparkSession, dir: String,
      queryName: String): DataFrame =
    streaming.Streams.streamStreamJoin(spark, dir, queryName)

  /** Continuous governance ingestion: drain a landing drop-folder
    * through the incremental lifecycle (upsert → partition-scoped
    * rebuild → pruned export), one micro-batch at a time. */
  def runStreamingIngest(spark: SparkSession, dropDir: String,
      initialLandingJsonl: String, outDir: String, lookups: gov.Lookups,
      instTab: Seq[gov.Enrich.InstRow], dbInstTab: Seq[gov.Enrich.DbInstRow],
      temas: Seq[gov.Enrich.TemaRow], nowYear: Int): Unit =
    pipeline.Governance.runStreamingIngest(spark, dropDir,
      initialLandingJsonl, outDir, lookups, instTab, dbInstTab, temas, nowYear)
}
