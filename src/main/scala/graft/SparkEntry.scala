package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsofJoin, Chunking, DataSplit, DedupClusters, Q, Relational, Resample, Similarity, TextOps, TrainingPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full gate-checked operator inventory (one entry per
  * implemented operator class from SURVEY.md §2 plus the LLM-pipeline
  * operators); `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query. Column names and value determinism rules are
  * documented on [[graft.operators.Q]].
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    Relational.all ++ TextOps.all ++ Similarity.all ++
      Seq(DedupClusters.q54, DedupClusters.q267) ++ DataSplit.all ++ AsofJoin.all ++ Resample.all ++
      graft.operators.Sketches.all ++ graft.ingest.IngestOps.all ++
      Chunking.all ++ TrainingPipeline.all ++ graft.quality.Pii.all ++
      graft.gov.GovOps.all ++ graft.metrics.MetricsOps.all ++
      graft.metrics.Exports.all ++
      graft.streaming.StreamOps.all ++ graft.multimodal.Multimodal.all ++
      graft.quality.Checks.all ++ Seq(graft.pipeline.Governance.q98) ++
      graft.operators.SpanDedup.all ++ graft.operators.Quantize.all ++
      graft.operators.ScaleJoins.all ++ graft.operators.Graph.all ++
      graft.operators.Mining.all ++ graft.operators.Timeseries.all ++
      graft.operators.Layout.all ++ graft.operators.Vocab.all ++
      graft.operators.TextStats.all ++ graft.operators.Profiling.all ++
      graft.operators.Weighting.all ++ graft.operators.Bpe.all ++
      graft.operators.IncrementalDedup.all ++ graft.operators.WebQuality.all ++
      graft.operators.Postings.all ++ graft.operators.MinhashEstimate.all ++
      graft.operators.Pq.all ++ graft.operators.Hybrid.all ++
      graft.operators.Mmr.all ++ graft.operators.RankEval.all ++
      graft.operators.IvfPq.all ++ graft.operators.Linalg.all ++
      graft.operators.SuffixArray.all ++ graft.operators.LabelProp.all ++
      graft.operators.Linkage.all ++ graft.operators.LmScore.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Star join +
    * agg + top-k window — exercises scan, broadcast join, partial agg,
    * window in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
