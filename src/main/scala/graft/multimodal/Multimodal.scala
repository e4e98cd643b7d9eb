package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Q

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partitions.
  *
  * The decode kernels are STUBS — this container has no image/audio
  * libraries — but everything Spark-side is real and load-bearing:
  * the (payload: binary, meta: struct) schema, the batched
  * mapPartitions shape (exactly what a Pandas-UDF/mapInPandas port
  * would see: fixed-size record batches per worker), partitioning, and
  * the explode of per-item frames. Swap [[fakeDecode]] for a real
  * decoder and nothing else changes. Payloads here are the documents'
  * UTF-8 bytes standing in for media bytes.
  */
object Multimodal {

  case class MediaMeta(mime: String, n_bytes: Long, sha: String)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
      brightness: Double)

  val BATCH_SIZE = 64 // records per decode batch (the mapInPandas shape)

  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val md = MessageDigest.getInstance("MD5")
        val sha = md.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("application/octet-stream", bytes.length.toLong, sha))
      }
  }

  /** STUB decode — deterministic fake standing in for an image/video
    * decoder (??? in spirit): derives frame count and dimensions from
    * the byte stream, "brightness" = mean byte value of the frame's
    * slice. Replace with a real codec; the batching/plumbing stays. */
  private def fakeDecode(row: MediaRow, everyN: Int): Seq[Frame] = {
    val n = row.payload.length
    val frameCount = math.max(1, n / 256)
    (0 until frameCount by everyN).map { i =>
      val start = i * 256 % math.max(n, 1)
      val end = math.min(start + 256, n)
      val slice = row.payload.slice(start, end)
      val bright = if (slice.isEmpty) 0.0
        else slice.map(b => (b & 0xff).toDouble).sum / slice.length
      Frame(row.doc_id, i, 64 + (n % 64), 64 + (n % 48), bright)
    }
  }

  /** Frame sampling through batch-shaped partitions: the iterator is
    * consumed in BATCH_SIZE groups so a vectorized decoder (or a Python
    * worker via mapInPandas) sees the same record-batch contract. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap { batch =>
        batch.iterator.flatMap(fakeDecode(_, everyN))
      }
    }
  }

  case class Resized(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
      resized_sha: String, width: Int, height: Int)

  /** STUB resize — half-scale stand-in: keep every 2nd payload byte
    * (stride decimation), halve the fake frame geometry. Replace with a
    * real scaler; the batch-shaped mapPartitions plumbing stays. */
  private def fakeResize(row: MediaRow): Resized = {
    val n = row.payload.length
    val dec = Array.tabulate((n + 1) / 2)(i => row.payload(i * 2))
    val md = MessageDigest.getInstance("MD5")
    val sha = md.digest(dec).map("%02x".format(_)).mkString
    Resized(row.doc_id, n.toLong, dec.length.toLong, sha,
      math.max(1, (64 + n % 64) / 2), math.max(1, (64 + n % 48) / 2))
  }

  /** Resize through the same batch-shaped partitions as [[sampleFrames]]. */
  def resizeAll(media: Dataset[MediaRow]): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.map(fakeResize))
    }
  }

  /** Resize gate — oracled like q53: the ASCII fixture payloads let
    * DuckDB rebuild the decimated byte stream with substr() stepping and
    * hash it, so the distributed slicing is checked byte-for-byte. */
  val q79 = Q.sql("q79_multimodal_resize",
    """WITH t AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |r AS (
      |  SELECT doc_id, n,
      |    array_to_string(list_transform(range(1, n + 1, 2),
      |                                   p -> substr(text, p, 1)), '') AS dec
      |  FROM t)
      |SELECT doc_id, CAST(n AS BIGINT) AS orig_bytes,
      |  CAST(octet_length(encode(dec)) AS BIGINT) AS resized_bytes,
      |  md5(dec) AS resized_sha,
      |  CAST(greatest(1, (64 + n % 64) // 2) AS INTEGER) AS width,
      |  CAST(greatest(1, (64 + n % 48) // 2) AS INTEGER) AS height
      |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    resizeAll(mediaTable(s, d)).toDF().orderBy("doc_id")
  }

  /** Metadata extraction gate — the binary/meta schema end-to-end,
    * checked against DuckDB computing the same digest over the bytes. */
  val q52 = Q.sql("q52_multimodal_meta",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS sha
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    mediaTable(s, d)
      .map(r => (r.doc_id, r.meta.n_bytes, r.meta.sha))
      .toDF("doc_id", "n_bytes", "sha")
      .orderBy("doc_id")
  }

  /** Frame-sample pipeline (stubbed decode): per-doc frame counts +
    * mean brightness. Oracled: the fixture payloads are the docs' UTF-8
    * bytes and the corpus is pure ASCII (byte == code point), so DuckDB
    * can replay the fake decoder's byte math — frame geometry from
    * octet_length, per-frame brightness = mean `ascii()` over the slice. */
  val q53 = Q.sql("q53_multimodal_frames",
    """WITH t AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (
      |  SELECT doc_id, text, n,
      |    unnest(range(0, greatest(n // 256, 1), 2)) AS i FROM t),
      |br AS (
      |  SELECT doc_id, n, i,
      |    list_aggregate(list_transform(
      |      range((i * 256) % greatest(n, 1) + 1,
      |            least((i * 256) % greatest(n, 1) + 256, n) + 1),
      |      p -> ascii(substr(text, p, 1))), 'avg') AS bright
      |  FROM f)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
      |  round(avg(bright), 2) AS mean_brightness,
      |  CAST(max(64 + n % 64) AS INTEGER) AS width,
      |  CAST(max(64 + n % 48) AS INTEGER) AS height
      |FROM br GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    sampleFrames(mediaTable(s, d), everyN = 2).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        round(avg(col("brightness")), 2).as("mean_brightness"),
        max(col("width")).as("width"), max(col("height")).as("height"))
      .orderBy("doc_id")
  }

  /** Overlapped windowing of the raw payload bytes — the audio
    * frame-window shape (window 128, hop 64). The chunker REALLY slices
    * byte arrays in batch-shaped partitions; the oracle re-derives the
    * chunk geometry from octet_length alone, so the gate checks that the
    * distributed slicing matches the arithmetic contract exactly. */
  val ChunkWindow = 128
  val ChunkHop = 64

  case class Chunk(doc_id: Long, chunk_idx: Int, chunk_len: Long)

  def chunkPayloads(media: Dataset[MediaRow]): Dataset[Chunk] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val n = row.payload.length
          Iterator.from(0).map(_ * ChunkHop).takeWhile(_ < n).zipWithIndex
            .map { case (start, idx) =>
              val slice = row.payload.slice(start, math.min(start + ChunkWindow, n))
              Chunk(row.doc_id, idx, slice.length.toLong)
            }
        }
      }
    }
  }

  val q58 = Q.sql("q58_multimodal_chunks",
    s"""WITH m AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       |g AS (
       |  SELECT doc_id, n,
       |    CAST((n + $ChunkHop - 1) // $ChunkHop AS BIGINT) AS n_chunks,
       |    list_transform(range(0, CAST((n + $ChunkHop - 1) // $ChunkHop AS BIGINT)),
       |                   k -> least($ChunkWindow, n - k * $ChunkHop)) AS lens
       |  FROM m)
       |SELECT doc_id, n_chunks,
       |  CAST(list_sum(lens) AS BIGINT) AS sum_len,
       |  CAST(list_min(lens) AS BIGINT) AS min_len
       |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
    chunkPayloads(mediaTable(s, d)).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("sum_len"),
        min(col("chunk_len")).as("min_len"))
      .orderBy("doc_id")
  }

  /** Inference batch formation: items bucket by decoded dimensions (a
    * model server pads within a batch, so same-shape batches waste no
    * FLOPs) and each bucket packs into fixed-size batches in stable
    * doc_id order. One shuffle on (width, height); a heavy-hitter shape
    * at 100 TB takes the same two-phase pre-rank as the source caps
    * (rank within salted sub-buckets first) — batch ids just need an
    * extra sub-bucket prefix. */
  def inferenceBatches(media: Dataset[MediaRow], batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = media.toDF()
      .select(col("doc_id"),
        (lit(64) + col("meta.n_bytes") % 64).cast("int").as("width"),
        (lit(64) + col("meta.n_bytes") % 48).cast("int").as("height"))
    val rk = row_number()
      .over(Window.partitionBy("width", "height").orderBy("doc_id")) - 1
    dims
      .withColumn("rk", rk)
      .select(col("doc_id"), col("width"), col("height"),
        (col("rk") / batchSize).cast("long").as("batch_id"),
        (col("rk") % batchSize).cast("long").as("batch_pos"))
  }

  /** Gate for [[inferenceBatches]] — geometry replayed from
    * octet_length, batch packing from the same rank arithmetic. */
  val q90 = Q.sql("q90_multimodal_batches",
    """WITH t AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    CAST(64 + n % 64 AS INTEGER) AS width,
      |    CAST(64 + n % 48 AS INTEGER) AS height,
      |    row_number() OVER (PARTITION BY 64 + n % 64, 64 + n % 48
      |                       ORDER BY doc_id) - 1 AS rk
      |  FROM t)
      |SELECT doc_id, width, height,
      |  CAST(rk // 8 AS BIGINT) AS batch_id,
      |  CAST(rk % 8 AS BIGINT) AS batch_pos
      |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    inferenceBatches(mediaTable(s, d), batchSize = 8).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q52, q53, q58, q79, q90)
}
