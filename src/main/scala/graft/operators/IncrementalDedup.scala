package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Incremental near-dup detection: dedup an arriving BATCH against the
  * standing corpus via a persisted MinHash band INDEX, without ever
  * re-scanning the corpus.
  *
  * This is the shape a daily 100 TB pipeline actually runs — q25's
  * all-pairs LSH is the bootstrap that builds the index once; after
  * that, each increment costs O(|batch|) banding + a join against the
  * index buckets + exact verification of the candidates only. In
  * production [[buildIndex]]'s output is written as parquet bucketed by
  * (band, bucket) and [[probe]]'s band join hits only the matching
  * buckets; here both halves run in one plan so the gate can pin the
  * end-to-end math.
  *
  * Recall contract (same as q25): at J ≥ 0.8 with 32 bands × 2 rows a
  * true pair escapes every band with probability (1−s²)³² ≤ 6e-15, so
  * the DuckDB brute-force batch×corpus join IS the oracle — a missed
  * pair would hash-mismatch the gate.
  */
object IncrementalDedup {

  /** The standing corpus's banded signature index: (band, bucket,
    * doc_id). One row per doc per band — slim, mergeable (a new corpus
    * segment appends its own rows), and bucketable on (band, bucket). */
  def buildIndex(docs: DataFrame): DataFrame = banded(TextOps.shingled(docs))

  /** [[buildIndex]] over an already-shingled frame (avoids re-scanning
    * when the caller holds the shingle pass, as the gate does). */
  def buildIndexFromShingled(sh: DataFrame): DataFrame = banded(sh)

  private def banded(sh: DataFrame): DataFrame = {
    val nBands = TextOps.MINHASH_K / TextOps.LSH_ROWS
    val sigs = sh.select(col("doc_id"),
      Exprs.minhash_sig(col("sh"), TextOps.MINHASH_K).as("sig"))
    val bandCols = (0 until nBands).map(i => struct(
      lit(i).as("band"),
      hash(slice(col("sig"), i * TextOps.LSH_ROWS + 1, TextOps.LSH_ROWS),
        lit(i)).as("bucket")))
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id"))
  }

  /** Probe the index with a batch: band the batch docs the same way,
    * join on (band, bucket), verify candidates exactly. `corpusSh` and
    * `batchSh` are [[TextOps.shingled]] frames (the verify stage needs
    * the shingle arrays back); the INDEX side is capped per bucket
    * (q25's mega-cluster guard), the batch side is not — every arriving
    * doc probes. Output: (id_new, id_old, jac ≥ threshold). */
  def probe(index: DataFrame, corpusSh: DataFrame, batchSh: DataFrame,
      threshold: Double): DataFrame = {
    val wRank = Window.partitionBy("band", "bucket").orderBy("doc_id")
    val capped = index
      .withColumn("bsz", row_number().over(wRank))
      .filter(col("bsz") <= TextOps.BUCKET_CAP)
      .select(col("band"), col("bucket"), col("doc_id").as("id_old"))
    val cands = banded(batchSh)
      .select(col("band"), col("bucket"), col("doc_id").as("id_new"))
      .join(capped, Seq("band", "bucket"))
      .select("id_new", "id_old").distinct()
    // exact verify: hashed-sorted shingle sets from each side's frame
    def sets(sh: DataFrame, idCol: String): DataFrame = sh.select(
      col("doc_id").as(idCol),
      array_sort(transform(array_distinct(col("sh")), t => xxhash64(t)))
        .as(s"ts_$idCol"))
    cands
      .join(sets(batchSh, "id_new"), "id_new")
      .join(sets(corpusSh, "id_old"), "id_old")
      .withColumn("inter",
        Exprs.sorted_intersect_count_long(col("ts_id_new"), col("ts_id_old")))
      .withColumn("uni", size(col("ts_id_new")).cast("long")
        + size(col("ts_id_old")) - col("inter"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("jac",
        expr("CAST((inter * 20000 + uni) div (2 * uni) AS DOUBLE)") / 10000.0)
      .filter(col("jac") >= threshold)
      .select("id_new", "id_old", "jac")
  }

  /** Gate: docs with doc_id ≡ 0 (mod 5) arrive as the batch; the rest
    * are the standing corpus. Oracle = brute-force batch×corpus Jaccard
    * at 0.8 (recall argument above). */
  val q127 = Q.sql("q127_incremental_neardup",
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i+1])) AS sh
      |  FROM tok WHERE len(t) >= 2)
      |SELECT n.doc_id AS id_new, o.doc_id AS id_old,
      |  CAST((CAST(len(list_intersect(n.sh, o.sh)) AS BIGINT) * 20000
      |        + len(list_distinct(n.sh || o.sh)))
      |       // (2 * len(list_distinct(n.sh || o.sh))) AS DOUBLE) / 10000.0
      |    AS jac
      |FROM s n JOIN s o ON n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
      |WHERE CAST((CAST(len(list_intersect(n.sh, o.sh)) AS BIGINT) * 20000
      |        + len(list_distinct(n.sh || o.sh)))
      |       // (2 * len(list_distinct(n.sh || o.sh))) AS DOUBLE) / 10000.0 >= 0.8
      |ORDER BY id_new, id_old""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // both frames derive from one shingling pass (q25's checkpoint
    // pattern: banding + verify reuse it, no corpus re-scan per stage)
    val sh = TextOps.shingled(docs)
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val corpusSh = sh.filter(col("doc_id") % 5 =!= 0)
    val batchSh = sh.filter(col("doc_id") % 5 === 0)
    probe(buildIndexFromShingled(corpusSh), corpusSh, batchSh, threshold = 0.8)
      .orderBy("id_new", "id_old")
  }

  val all: Seq[Q] = Seq(q127)
}
