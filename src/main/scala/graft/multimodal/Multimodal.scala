package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Q

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partitions.
  *
  * Two payload families:
  *  - OPAQUE bytes (q52 meta, q58 chunking, q90 batch formation): the
  *    codec-agnostic plumbing — (payload: binary, meta: struct) schema,
  *    batched mapPartitions (the record-batch contract a
  *    Pandas-UDF/mapInPandas port would see), overlapped windowing,
  *    shape-bucketed batch packing.
  *  - REAL images (q53 frame sampling, q79 resize): binary PPM (P6)
  *    payloads synthesized per document and decoded by [[Ppm.decode]],
  *    a real pure-JVM parser — header tokenizer with comment support,
  *    raster extraction — feeding a real nearest-neighbor resize.
  *    Compressed codecs (JPEG/H.264/FLAC) need external libraries this
  *    container doesn't ship; they'd slot behind the same batch contract
  *    via mapInPandas, with PPM proving the plumbing end-to-end.
  */
object Multimodal {

  case class MediaMeta(mime: String, n_bytes: Long, sha: String)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
      bright_sum: Long, band_bytes: Long, brightness: Double)

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

  /** PPM fixture images, one per document: width/height derive from the
    * text's byte length (same geometry the opaque gates use), raster
    * byte j = (doc_id*7 + j*31) mod 256 — a deterministic pattern the
    * DuckDB oracle replays arithmetically, so every decoded value the
    * gates emit is independently predicted without DuckDB parsing PPM.
    * The payload is a REAL P6 file; [[Ppm.decode]] must parse the header
    * and land the raster offsets exactly or the gates hash-mismatch. */
  def ppmTable(spark: SparkSession, dir: String): Dataset[MediaRow] =
    ppmTable(spark, dir, lit(true))

  /** [[ppmTable]] with a pre-synthesis document filter. The synthesis
    * `.map` is a typed (opaque) operator, so Catalyst CANNOT push a
    * doc_id filter applied to its OUTPUT below it — a caller that wants
    * a subset of images must filter the documents BEFORE the map or it
    * pays raster synthesis + MD5 + P6 encode for every discarded doc
    * (r15: imageFeatures' %10 subset synthesized 100% of the corpus to
    * keep 10%; guide §4's opaque-operator column/filter-pruning caveat,
    * applied to rows). Row-wise map ⇒ filter-before ≡ filter-after. */
  def ppmTable(spark: SparkSession, dir: String,
      docFilter: org.apache.spark.sql.Column): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).filter(docFilter)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val n = text.getBytes("UTF-8").length
        val w = 64 + n % 64
        val h = 64 + n % 48
        val raster = Array.tabulate(w * h * 3)(j => ((id * 7 + j.toLong * 31) % 256).toByte)
        val bytes = Ppm.encode(Ppm.Image(w, h, raster))
        val md = MessageDigest.getInstance("MD5")
        val sha = md.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("image/x-portable-pixmap", bytes.length.toLong, sha))
      }
  }

  /** Rows per frame band: a "video" stand-in samples the image in
    * 16-row horizontal bands (deterministic, resolution-coupled). */
  val BAND_ROWS = 16

  /** Frame sampling through batch-shaped partitions: the iterator is
    * consumed in BATCH_SIZE groups so a vectorized decoder (or a Python
    * worker via mapInPandas) sees the same record-batch contract. Each
    * payload is REALLY decoded ([[Ppm.decode]]); frame i is the band of
    * rows [i*16, min((i+1)*16, h)) and brightness_sum is the exact
    * integer sum of its raster bytes (exact → hash-stable oracle). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap { batch =>
        batch.iterator.flatMap { row =>
          val img = Ppm.decode(row.payload)
          val nBands = (img.height + BAND_ROWS - 1) / BAND_ROWS
          (0 until nBands by everyN).iterator.map { i =>
            val from = i * BAND_ROWS * img.width * 3
            val until = math.min((i + 1) * BAND_ROWS, img.height) * img.width * 3
            var s = 0L
            var j = from
            while (j < until) { s += img.raster(j) & 0xff; j += 1 }
            Frame(row.doc_id, i, img.width, img.height,
              s, (until - from).toLong, s.toDouble / (until - from))
          }
        }
      }
    }
  }

  case class Resized(doc_id: Long, width: Int, height: Int,
      r_width: Int, r_height: Int, resized_bytes: Long, sum_bytes: Long)

  /** Real decode → real nearest-neighbor 2× downscale through the same
    * batch-shaped partitions as [[sampleFrames]]; emits the resized
    * geometry and the exact byte sum of the resized raster. */
  def resizeAll(media: Dataset[MediaRow]): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.map { row =>
        val img = Ppm.decode(row.payload)
        val small = Ppm.resizeNearest(img, 2)
        var s = 0L
        var j = 0
        while (j < small.raster.length) { s += small.raster(j) & 0xff; j += 1 }
        Resized(row.doc_id, img.width, img.height, small.width, small.height,
          small.raster.length.toLong, s)
      })
    }
  }

  /** Resize gate: the oracle replays the generator arithmetic through
    * the nearest-neighbor sampling grid — output pixel (x,y,c) must be
    * raster byte ((2y*w + 2x)*3 + c) of the original, so a decoder
    * offset error or a resize stride bug lands on the wrong bytes and
    * the exact sum mismatches. */
  val q79 = Q.sql("q79_multimodal_resize",
    """WITH t AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CAST(64 + n % 64 AS INTEGER) AS w, CAST(64 + n % 48 AS INTEGER) AS h
      |  FROM t),
      |r AS (
      |  SELECT doc_id, w, h, w // 2 AS w2, h // 2 AS h2,
      |    list_sum(list_transform(range(0, (h // 2)), y ->
      |      list_sum(list_transform(range(0, (w // 2) * 3), k ->
      |        (doc_id * 7 + ((2*y*w + 2*(k // 3)) * 3 + (k % 3)) * 31) % 256
      |      )))) AS s
      |  FROM g)
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(w2 AS INTEGER) AS r_width, CAST(h2 AS INTEGER) AS r_height,
      |  CAST(w2 * h2 * 3 AS BIGINT) AS resized_bytes,
      |  CAST(s AS BIGINT) AS sum_bytes
      |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    resizeAll(ppmTable(s, d)).toDF().orderBy("doc_id")
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

  /** Frame-sample pipeline over REAL decoded images: every 2nd 16-row
    * band of each PPM, per-doc band count + exact brightness byte sum +
    * decoded geometry. The oracle replays the fixture generator's
    * arithmetic over the same band index ranges — a header misparse or
    * off-by-one in the raster offsets shifts every sum and the gate
    * hash-mismatches. */
  val q53 = Q.sql("q53_multimodal_frames",
    """WITH t AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CAST(64 + n % 64 AS INTEGER) AS w, CAST(64 + n % 48 AS INTEGER) AS h
      |  FROM t),
      |f AS (
      |  SELECT doc_id, w, h,
      |    unnest(range(0, (h + 15) // 16, 2)) AS i FROM g),
      |b AS (
      |  SELECT doc_id, w, h, i,
      |    list_sum(list_transform(
      |      range(i * 16 * w * 3, least((i + 1) * 16, h) * w * 3),
      |      j -> (doc_id * 7 + j * 31) % 256)) AS bsum
      |  FROM f)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(sum(bsum) AS BIGINT) AS bright_sum,
      |  max(w) AS width, max(h) AS height
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    sampleFrames(ppmTable(s, d), everyN = 2).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("bright_sum")).as("bright_sum"),
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

  /** WAV fixture clips, one per document: n = 256 + (text bytes % 512)
    * PCM16 mono samples at 16 kHz, sample j = ((doc_id·11 + j·17) mod
    * 65536) − 32768 — full int16 range, deterministic, replayed
    * arithmetically by the oracle. The payload is a REAL RIFF/WAVE
    * file; [[Wav.decode]] must walk the chunk list and land the
    * little-endian sample decode exactly or the gates hash-mismatch. */
  def wavTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val n = 256 + text.getBytes("UTF-8").length % 512
        val samples = Array.tabulate(n)(j =>
          (((id * 11 + j.toLong * 17) % 65536) - 32768).toShort)
        val bytes = Wav.encode(Wav.Audio(16000, 1, samples))
        val md = MessageDigest.getInstance("MD5")
        val sha = md.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("audio/wav", bytes.length.toLong, sha))
      }
  }

  /** Audio frame windowing: window 256 samples, hop 128, full windows
    * only — the STFT/feature-frame shape. Real decode per clip through
    * the same batch-shaped partitions as [[sampleFrames]]; per window
    * the exact integer energy (Σ s²) and peak (max |s|), both
    * hash-stable. */
  val AudioWindow = 256
  val AudioHop = 128

  case class AudioWin(doc_id: Long, win_idx: Long, n_samples: Long,
      sample_rate: Long, energy: Long, peak: Long)

  def windowEnergy(media: Dataset[MediaRow], window: Int = AudioWindow,
      hop: Int = AudioHop): Dataset[AudioWin] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.flatMap { row =>
        val a = Wav.decode(row.payload)
        val n = a.samples.length
        val nWin = if (n < window) 0 else (n - window) / hop + 1
        (0 until nWin).iterator.map { w =>
          var e = 0L; var p = 0L
          var j = w * hop
          val until = j + window
          while (j < until) {
            val s = a.samples(j).toLong
            e += s * s
            val abs = math.abs(s)
            if (abs > p) p = abs
            j += 1
          }
          AudioWin(row.doc_id, w.toLong, n.toLong, a.sampleRate.toLong, e, p)
        }
      })
    }
  }

  /** Audio window gate: the oracle replays the generator arithmetic
    * through the window index ranges — a RIFF chunk-walk bug, an
    * endianness slip, or an off-by-one in the hop lands different
    * samples in a window and the exact energy/peak mismatch. */
  val q134 = Q.sql("q134_audio_windows",
    s"""WITH t AS (
       |  SELECT doc_id, 256 + octet_length(encode(text)) % 512 AS n
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, n,
       |    unnest(range(0, (n - $AudioWindow) // $AudioHop + 1)) AS win
       |  FROM t),
       |e AS (
       |  SELECT doc_id, n, win,
       |    list_sum(list_transform(range(win*$AudioHop, win*$AudioHop + $AudioWindow),
       |      j -> ((doc_id*11 + j*17) % 65536 - 32768)
       |         * ((doc_id*11 + j*17) % 65536 - 32768))) AS energy,
       |    list_max(list_transform(range(win*$AudioHop, win*$AudioHop + $AudioWindow),
       |      j -> abs((doc_id*11 + j*17) % 65536 - 32768))) AS peak
       |  FROM w)
       |SELECT doc_id, CAST(win AS BIGINT) AS win_idx, CAST(n AS BIGINT) AS n_samples,
       |  CAST(16000 AS BIGINT) AS sample_rate,
       |  CAST(energy AS BIGINT) AS energy, CAST(peak AS BIGINT) AS peak
       |FROM e ORDER BY doc_id, win_idx""".stripMargin) { (s, d) =>
    windowEnergy(wavTable(s, d)).toDF().orderBy("doc_id", "win_idx")
  }

  case class DHashRow(doc_id: Long, width: Int, height: Int,
      dhash_hi: Long, dhash_lo: Long)

  /** Perceptual difference-hash (dHash) over the REAL decoded images:
    * sample a 9×8 grayscale grid by nearest neighbor (sx = x·w/9,
    * sy = y·h/8 — the standard dHash shrink), then bit (y·8+x) is set
    * iff gray(x,y) < gray(x+1,y). All integer (gray = (r+g+b)/3 floor),
    * so the 64 bits are exact; they ride as two BIGINT halves because
    * bit 63 would wrap a signed sum. Runs through the same batch-shaped
    * partitions as the other decode gates — one stateless scan, the
    * canonical candidate key for image near-dup (Hamming-close hashes
    * bucket together; q27's SimHash banding applies unchanged). */
  def dhashAll(media: Dataset[MediaRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.map { row =>
        val img = Ppm.decode(row.payload)
        val (w, h) = (img.width, img.height)
        var hi = 0L
        var lo = 0L
        var y = 0
        while (y < 8) {
          val gray = Array.tabulate(9) { x =>
            val base = ((y * h / 8) * w + (x * w / 9)) * 3
            ((img.raster(base) & 0xff) + (img.raster(base + 1) & 0xff) +
              (img.raster(base + 2) & 0xff)) / 3
          }
          var x = 0
          while (x < 8) {
            if (gray(x) < gray(x + 1)) {
              val idx = y * 8 + x
              if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
            }
            x += 1
          }
          y += 1
        }
        DHashRow(row.doc_id, w, h, hi, lo)
      })
    }
  }

  /** dHash ORACLE prefix (the q172 pipeline as a CTE chain, emitting
    * doc_id + the two hash halves) — shared by q172 and q182. */
  private val DhashSql =
    """t AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |dims AS (SELECT doc_id, 64 + n % 64 AS w, 64 + n % 48 AS h FROM t),
      |g AS (
      |  SELECT doc_id, w, h, x.x, y.y,
      |    ((doc_id*7 + (((y.y*h//8)*w + (x.x*w//9))*3    )*31) % 256
      |   + (doc_id*7 + (((y.y*h//8)*w + (x.x*w//9))*3 + 1)*31) % 256
      |   + (doc_id*7 + (((y.y*h//8)*w + (x.x*w//9))*3 + 2)*31) % 256) // 3 AS gray
      |  FROM dims
      |  CROSS JOIN (SELECT unnest(range(0, 9)) AS x) x
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) y),
      |b AS (
      |  SELECT doc_id, w, h, x, y,
      |    CASE WHEN gray < lead(gray) OVER (PARTITION BY doc_id, y ORDER BY x)
      |         THEN 1 ELSE 0 END AS bit
      |  FROM g QUALIFY x < 8),
      |dh AS MATERIALIZED (
      |  SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
      |    CAST(max(h) AS BIGINT) AS height,
      |    CAST(sum(CASE WHEN y*8+x >= 32
      |             THEN bit::BIGINT << CAST(y*8+x-32 AS INTEGER)
      |             ELSE 0 END) AS BIGINT) AS dhash_hi,
      |    CAST(sum(CASE WHEN y*8+x < 32
      |             THEN bit::BIGINT << CAST(y*8+x AS INTEGER)
      |             ELSE 0 END) AS BIGINT) AS dhash_lo
      |  FROM b GROUP BY 1)""".stripMargin

  /** dHash gate: the oracle replays the generator arithmetic through
    * the dHash sampling grid — every grid gray value is predicted from
    * raster byte j = (doc_id·7 + j·31) mod 256 without parsing PPM, so
    * a header-offset or stride bug in the real decode path lands on
    * wrong bytes and flips bits. */
  val q172 = Q.sql("q172_image_dhash",
    s"""WITH $DhashSql
      |SELECT doc_id, width, height, dhash_hi, dhash_lo
      |FROM dh ORDER BY doc_id""".stripMargin) { (s, d) =>
    dhashAll(ppmTable(s, d))
      .toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("dhash_hi"), col("dhash_lo"))
      .orderBy("doc_id")
  }

  val HammingMax = 3

  /** Image near-dup: pairs of images whose dHashes differ in ≤
    * [[HammingMax]] bits. The engine runs the Manku banded form — the
    * 64 bits split into 4 16-bit bands, and any pair within Hamming 3
    * must agree EXACTLY on ≥ 1 band (pigeonhole), so candidates come
    * from 4 equi-joins on (band index, band value) instead of all
    * pairs, then one xor+popcount verifies. The oracle is the brute
    * quadratic ground truth over the same replayed hashes: the gate
    * therefore PINS the banding's losslessness at the driver, q25/q27
    * style. Scale: candidate volume rides band-bucket sizes (bounded
    * for near-uniform hashes); the verify is 2 codegen'd bit ops. */
  /** The banded Hamming pair build of q182, reusable: (id_a, id_b,
    * hamming) with id_a < id_b and hamming ≤ [[HammingMax]]. */
  def dhashPairs(s: SparkSession, d: String): DataFrame =
    dhashPairsFrom(dhashAll(ppmTable(s, d)).toDF()
      .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"))
      .localCheckpoint(true)) // band explode + both verify sides reuse it

  /** The banded pair build over a PRECOMPUTED (materialized) dhash
    * table — split out so composition gates that already hold the
    * decoded hashes (q184 reads geometry AND dup status) feed ONE
    * synthesize+decode pass to both consumers instead of re-running
    * ppmTable per consumer (r15; the caller must pass an
    * already-checkpointed frame or the two join sides re-execute it). */
  def dhashPairsFrom(dh: DataFrame): DataFrame = {
    val bands = dh.select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
      explode(array(
        struct(lit(0).as("bi"), (col("dhash_lo") % 65536).as("bv")),
        struct(lit(1).as("bi"), (shiftright(col("dhash_lo"), 16) % 65536).as("bv")),
        struct(lit(2).as("bi"), (col("dhash_hi") % 65536).as("bv")),
        struct(lit(3).as("bi"), (shiftright(col("dhash_hi"), 16) % 65536).as("bv"))))
        .as("band"))
      .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    val cand = bands.toDF("id_a", "hi_a", "lo_a", "bi", "bv")
      .join(bands.toDF("id_b", "hi_b", "lo_b", "bi", "bv"), Seq("bi", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
      .distinct()
    cand
      .withColumn("hamming",
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)")).cast("long"))
      .filter(col("hamming") <= HammingMax)
      .select("id_a", "id_b", "hamming")
  }

  val q182 = Q.sql("q182_image_neardup",
    s"""WITH $DhashSql
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
      |     + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT) AS hamming
      |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
      |    + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= $HammingMax
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    dhashPairs(s, d).orderBy("id_a", "id_b")
  }

  case class AudioFp(doc_id: Long, win_idx: Long, fp: Long)

  val FpBands = 8

  /** Audio fingerprint (the Haitsma–Kalker comparative-energy shape on
    * time-domain bands): each q134 window splits into [[FpBands]]
    * 32-sample bands, bit b of the window's fingerprint is set iff
    * band b carries more energy than band b+1 — a 7-bit robust hash
    * per window, all integer (energies are exact s² sums over the REAL
    * decoded samples). Same batch-shaped decode pass as q134; the
    * fingerprint column is what an audio near-dup stage would band on,
    * exactly as q182 does for images. */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    val bandW = AudioWindow / FpBands
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.flatMap { row =>
        val a = Wav.decode(row.payload)
        val n = a.samples.length
        val nWin = if (n < AudioWindow) 0 else (n - AudioWindow) / AudioHop + 1
        (0 until nWin).iterator.map { w =>
          val bands = Array.tabulate(FpBands) { b =>
            var e = 0L
            var j = w * AudioHop + b * bandW
            val until = j + bandW
            while (j < until) {
              val s = a.samples(j).toLong
              e += s * s
              j += 1
            }
            e
          }
          var fp = 0L
          var b = 0
          while (b < FpBands - 1) {
            if (bands(b) > bands(b + 1)) fp |= 1L << b
            b += 1
          }
          AudioFp(row.doc_id, w.toLong, fp)
        }
      })
    }
  }

  /** Audio fingerprint gate: oracle = the generator arithmetic pushed
    * through the band index ranges (q134's device one level deeper —
    * a band-boundary or hop error flips comparison bits). */
  val q183 = Q.sql("q183_audio_fingerprint",
    s"""WITH t AS (
       |  SELECT doc_id, 256 + octet_length(encode(text)) % 512 AS n
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, n,
       |    unnest(range(0, (n - $AudioWindow) // $AudioHop + 1)) AS win
       |  FROM t),
       |bands AS (
       |  SELECT doc_id, win, b.b,
       |    list_sum(list_transform(
       |      range(win*$AudioHop + b.b*${AudioWindow / FpBands},
       |            win*$AudioHop + (b.b + 1)*${AudioWindow / FpBands}),
       |      j -> ((doc_id*11 + j*17) % 65536 - 32768)
       |         * ((doc_id*11 + j*17) % 65536 - 32768))) AS e
       |  FROM w CROSS JOIN (SELECT unnest(range(0, $FpBands)) AS b) b),
       |fp AS (
       |  SELECT doc_id, win,
       |    CAST(sum(CASE WHEN e > en THEN 1::BIGINT << CAST(b AS INTEGER)
       |             ELSE 0 END) AS BIGINT) AS fp
       |  FROM (SELECT *, lead(e) OVER (PARTITION BY doc_id, win ORDER BY b) AS en
       |        FROM bands)
       |  WHERE b < ${FpBands - 1} GROUP BY 1, 2)
       |SELECT doc_id, CAST(win AS BIGINT) AS win_idx, fp
       |FROM fp ORDER BY doc_id, win_idx""".stripMargin) { (s, d) =>
    audioFingerprint(wavTable(s, d)).toDF().orderBy("doc_id", "win_idx")
  }

  /** Multimodal curation report — the composition gate that joins all
    * three modalities into one per-document decision row: text quality
    * (the q22 scorer), image geometry + near-dup status (q172/q182 —
    * the non-canonical side of any Hamming-close pair is flagged), and
    * audio coverage (window count), with the keep rule a pipeline would
    * apply (quality floor AND not an image dup). Every input is an
    * already-gated operator; what this pins is the JOIN seams — id
    * alignment, dup-side convention, null-free composition — which is
    * where multimodal pipelines actually break. All modality scans run
    * once each; the dup flag is a semi-join against the banded pair
    * table. */
  val q184 = Q.sql("q184_multimodal_report",
    s"""WITH $DhashSql,
      |dup AS (
      |  SELECT DISTINCT b.doc_id AS id_b
      |  FROM dh a JOIN dh b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
      |      + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= $HammingMax),
      |qy AS (
      |  SELECT doc_id,
      |    round(0.4 * least(length(text)/500.0, 1.0)
      |        + 0.3 * (1.0 - least(5.0*(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
      |        + 0.3 * least(4.0*len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> list_contains(['the','and','of','to','in','is','a'], x))) / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 1.0)
      |    , 4) AS quality
      |  FROM documents),
      |au AS (
      |  SELECT doc_id,
      |    CAST((octet_length(encode(text)) % 512) // $AudioHop + 1 AS BIGINT)
      |      AS n_audio_win
      |  FROM documents)
      |SELECT qy.doc_id, qy.quality, dh.width, dh.height, au.n_audio_win,
      |  dup.id_b IS NOT NULL AS dup_image,
      |  qy.quality >= 0.45 AND dup.id_b IS NULL AS keep
      |FROM qy
      |JOIN dh ON dh.doc_id = qy.doc_id
      |JOIN au ON au.doc_id = qy.doc_id
      |LEFT JOIN dup ON dup.id_b = qy.doc_id
      |ORDER BY qy.doc_id""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val qy = graft.Tables.documents(s, d)
      .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
    // ONE image synthesize+decode pass: the checkpointed dhash table
    // feeds BOTH the geometry columns and the banded pair build (the
    // old form ran ppmTable→dhashAll twice — once for dh, once inside
    // dhashPairs; r15, guide §1.2 "don't compute things twice")
    val dhAll = dhashAll(ppmTable(s, d)).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("dhash_hi"), col("dhash_lo"))
      .localCheckpoint(true)
    val dh = dhAll
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
    val au = audioFingerprint(wavTable(s, d)).toDF()
      .groupBy("doc_id").agg(count(lit(1)).as("n_audio_win"))
    val dup = dhashPairsFrom(
        dhAll.select(col("doc_id"), col("dhash_hi"), col("dhash_lo")))
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("dup_image", lit(true))
    qy.join(dh, "doc_id").join(au, "doc_id")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"), col("width"), col("height"),
        col("n_audio_win"),
        coalesce(col("dup_image"), lit(false)).as("dup_image"),
        (col("quality") >= 0.45 && coalesce(col("dup_image"), lit(false)) === false)
          .as("keep"))
      .orderBy("doc_id")
  }

  /** Sequential "video" container: one file per document made of
    * concatenated REAL P6 frames ([[Ppm.decodeAt]] walks them — a
    * header misparse desynchronizes every later frame). Frame f's
    * raster alternates v, v+1 with v = (doc_id·7 + f²·13) mod 255 —
    * the alternation pins byte-stride correctness while keeping the
    * frame's exact byte sum closed-form (B·v + B/2) so the oracle
    * predicts it without per-byte iteration. */
  val VideoH = 16

  def videoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val n = text.getBytes("UTF-8").length
        val w = 32 + n % 32
        val nf = 4 + (id % 5).toInt
        val bytes = (0 until nf).map { f =>
          val v = ((id * 7 + f.toLong * f * 13) % 255).toInt
          Ppm.encode(Ppm.Image(w, VideoH,
            Array.tabulate(w * VideoH * 3)(j => (v + (j % 2)).toByte)))
        }.reduce(_ ++ _)
        val md = MessageDigest.getInstance("MD5")
        val sha = md.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("video/x-ppm-seq", bytes.length.toLong, sha))
      }
  }

  case class KeyFrames(doc_id: Long, n_frames: Long, n_keyframes: Long,
      keyframes: String)

  /** Shot-boundary keyframe selection: decode the container frame by
    * frame, keep frame 0 plus every frame whose mean-brightness jump
    * from its predecessor reaches `thresh` gray levels. The compare is
    * integer (|Σf − Σprev| ≥ thresh·B, equal frame geometry), so
    * selection is exact. One stateless scan per video at any scale —
    * the decode loop is sequential per FILE, parallel across files,
    * which is the only parallelism a frame-dependent rule admits. */
  def keyframes(media: Dataset[MediaRow], thresh: Long): Dataset[KeyFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BATCH_SIZE).flatMap(_.iterator.map { row =>
        var off = 0
        var idx = 0
        var prevSum = 0L
        var prevB = 0L
        val sel = Seq.newBuilder[Int]
        while (off < row.payload.length) {
          val (img, next) = Ppm.decodeAt(row.payload, off)
          var s = 0L
          var j = 0
          while (j < img.raster.length) { s += img.raster(j) & 0xff; j += 1 }
          val b = img.raster.length.toLong
          require(idx == 0 || b == prevB, "variable frame geometry")
          if (idx == 0 || math.abs(s - prevSum) >= thresh * b) sel += idx
          prevSum = s; prevB = b; off = next; idx += 1
        }
        val ks = sel.result()
        KeyFrames(row.doc_id, idx.toLong, ks.size.toLong, ks.mkString(","))
      })
    }
  }

  val KeyframeThresh = 16L

  val q206 = Q.sql("q206_video_keyframes",
    s"""WITH t AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       |g AS (
       |  SELECT doc_id, 32 + n % 32 AS w, 4 + doc_id % 5 AS nf FROM t),
       |v AS (
       |  SELECT doc_id, nf, u.fi,
       |    (doc_id * 7 + u.fi * u.fi * 13) % 255 AS v,
       |    w * $VideoH * 3 AS b
       |  FROM g, LATERAL unnest(range(0, nf)) AS u(fi)),
       |s AS (
       |  SELECT doc_id, nf, fi, b, v * b + b // 2 AS fsum,
       |    lag(v * b + b // 2) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
       |  FROM v),
       |k AS (
       |  SELECT doc_id, nf, fi,
       |    (fi = 0 OR abs(fsum - prev) >= $KeyframeThresh * b) AS sel
       |  FROM s)
       |SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
       |  CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_keyframes,
       |  string_agg(CASE WHEN sel THEN CAST(fi AS VARCHAR) END, ','
       |             ORDER BY fi) AS keyframes
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    keyframes(videoTable(s, d), KeyframeThresh).toDF().orderBy("doc_id")
  }

  /** Bursty speech/silence WAV fixture for the VAD gate: [[wavTable]]'s
    * envelope is SMOOTH (its progression walks 1/120th of the 65536
    * cycle per window), which would collapse segmentation to one island
    * per clip — so this fixture gates the same sample generator by
    * 96-sample speech regions ((id·31 + region·7) mod 5 < 2) with true
    * digital silence between, the structure VAD exists to find. */
  val VadRegion = 96

  def vadWavTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val n = 256 + text.getBytes("UTF-8").length % 512
        val samples = Array.tabulate(n) { j =>
          if ((id * 31 + (j / VadRegion).toLong * 7) % 5 < 2)
            (((id * 11 + j.toLong * 17) % 65536) - 32768).toShort
          else 0.toShort
        }
        val bytes = Wav.encode(Wav.Audio(16000, 1, samples))
        val md = MessageDigest.getInstance("MD5")
        val sha = md.digest(bytes).map("%02x".format(_)).mkString
        MediaRow(id, bytes, MediaMeta("audio/wav", bytes.length.toLong, sha))
      }
  }

  /** Energy-threshold voice-activity segmentation: window the decoded
    * audio fine-grained (window 64, hop 32 — [[windowEnergy]]'s kernel,
    * parameterized), call a window active when its energy exceeds the
    * corpus-wide EXACT median (q188's selection device — deterministic
    * through ties via the (energy, doc, win) total order), and merge
    * consecutive active windows into segments by the gaps-and-islands
    * rule. Output is one row per segment with its exact energy mass.
    *
    * Scale: the global exact median is the oracle-exactness device; at
    * 100 TB the threshold comes from the mergeable histogram quantile
    * (q114) instead — either way one broadcast scalar. The islands
    * window partitions by doc, so segmentation shuffles once on
    * doc_id. */
  def vadSegments(wins: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the median's global rank rides EVERY audio window in the corpus —
    // routed above ScaleWindows.GlobalWindowCap to the distributed
    // sort + partition-offset form (same selection, same tie order).
    // Decode runs ONCE: the checkpoint materializes the window table,
    // and the routing count, the median scan, and the active-segment
    // pass all read the cached blocks (r14 advice — the old form
    // re-decoded for the count, the window, and the active pass)
    val w0 = wins.localCheckpoint(true)
    val ntl = w0.count()
    val ranked = graft.operators.ScaleWindows.globalOrderedScan(
        w0, Seq(col("energy"), col("doc_id"), col("win_idx")), Some("rn"),
        knownCount = Some(ntl))
    val med = ranked.filter(col("rn") === lit((ntl + 1L) / 2L))
      .select(col("energy").as("med"))
    val active = w0.crossJoin(broadcast(med)).filter(col("energy") > col("med"))
    active
      .withColumn("grp", col("win_idx") - row_number().over(
        Window.partitionBy("doc_id").orderBy("win_idx")))
      .groupBy("doc_id", "grp")
      .agg(min("win_idx").cast("long").as("seg_start"),
        max("win_idx").cast("long").as("seg_end"),
        count(lit(1)).cast("long").as("n_windows"),
        sum("energy").cast("long").as("seg_energy"))
      .drop("grp")
  }

  val VadWindow = 64
  val VadHop = 32

  val q207 = Q.sql("q207_vad_segments",
    s"""WITH t AS (
       |  SELECT doc_id, 256 + octet_length(encode(text)) % 512 AS n
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, n,
       |    unnest(range(0, (n - $VadWindow) // $VadHop + 1)) AS win
       |  FROM t),
       |e AS (
       |  SELECT doc_id, win,
       |    list_sum(list_transform(range(win*$VadHop, win*$VadHop + $VadWindow),
       |      j -> CASE WHEN (doc_id*31 + (j // $VadRegion) * 7) % 5 < 2
       |        THEN ((doc_id*11 + j*17) % 65536 - 32768)
       |           * ((doc_id*11 + j*17) % 65536 - 32768)
       |        ELSE 0 END)) AS energy
       |  FROM w),
       |r AS (
       |  SELECT *, row_number() OVER (ORDER BY energy, doc_id, win) AS rn,
       |    count(*) OVER () AS nt
       |  FROM e),
       |m AS (SELECT energy AS med FROM r WHERE rn = (nt + 1) // 2),
       |a AS (SELECT doc_id, win, energy FROM e CROSS JOIN m WHERE energy > med),
       |i AS (
       |  SELECT doc_id, win, energy,
       |    win - row_number() OVER (PARTITION BY doc_id ORDER BY win) AS grp
       |  FROM a)
       |SELECT doc_id, CAST(min(win) AS BIGINT) AS seg_start,
       |  CAST(max(win) AS BIGINT) AS seg_end,
       |  CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(energy) AS BIGINT) AS seg_energy
       |FROM i GROUP BY doc_id, grp
       |ORDER BY doc_id, seg_start""".stripMargin) { (s, d) =>
    vadSegments(windowEnergy(vadWavTable(s, d), VadWindow, VadHop).toDF())
      .orderBy("doc_id", "seg_start")
  }

  // ——— Cross-modal pair curation (CLIP-score shape) ———

  /** Shared feature dimensionality of the caption and image sides. */
  val CrossModalDim = 64

  /** Images kept per caption — the top-τ curation knob. */
  val CrossModalTopK = 3

  /** Caption-side features: token-hash bucket counts scaled by 2⁻⁷ —
    * exact in binary float, so floor(v·10⁸) = 781250·count and the
    * quantized dot replays integer-for-integer on both engines. Bucket
    * = polyHash(token) mod [[CrossModalDim]] (the q289 hash idiom).
    * One explode + two aggregations; at corpus scale this is a
    * map-side-combined shuffle on (doc, bucket) — never on raw
    * tokens. */
  private[graft] def captionFeatures(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{Exprs, Text}
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(Exprs.poly_hash(col("tok")), lit(64L)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
    counts.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("cnt")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(63L)),
          j => (coalesce(element_at(col("m"), j), lit(0L)) *
            lit(0.0078125d)).cast("float")).as("txt_vec"))
  }

  /** Image-side features: the 64 dHash bits of the REAL decoded image
    * as a ±0.125 hypercube vector (bit j set → +0.125) — the standard
    * sign-feature embedding of a perceptual hash, exact in binary
    * float so floor(v·10⁸) = ±12500000 on both engines. Images are the
    * doc_id % 10 == 0 subset (the corpus' image-bearing docs); the
    * filter runs BEFORE decode. */
  private[graft] def imageFeatures(s: SparkSession, d: String): DataFrame =
    dhashAll(ppmTable(s, d, col("doc_id") % 10 === 0)).toDF()
      .select(col("doc_id").as("image_id"),
        expr("""transform(sequence(0, 63), j -> CAST(
          IF(IF(j < 32, shiftright(dhash_lo, CAST(j AS INT)),
                shiftright(dhash_hi, CAST(j AS INT) - 32)) % 2 = 1,
             0.125D, -0.125D) AS FLOAT))""").as("img_vec"))

  /** The DhashSql-based oracle CTE chain shared by q291/q292: image
    * sign table `isig` (integer ±12500000 per (image, dim)), caption
    * bucket counts `cb`, and the exact integer pair score `sc` —
    * score(c, i) = Σ_j cnt_j(c)·781250 · sign_j(i)·12500000, which IS
    * qdot(txt_vec, img_vec) because every feature is binary-exact. */
  private val CrossModalScoreSql =
    s"""$DhashSql,
       |imgs AS (SELECT doc_id AS image_id, dhash_hi, dhash_lo
       |         FROM dh WHERE doc_id % 10 = 0),
       |isig AS (
       |  SELECT image_id, jj.j AS b,
       |    CASE WHEN (CASE WHEN jj.j < 32 THEN (dhash_lo >> jj.j)
       |               ELSE (dhash_hi >> (jj.j - 32)) END) % 2 = 1
       |         THEN 12500000 ELSE -12500000 END AS sgn
       |  FROM imgs CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    CAST(list_reduce(
       |      list_prepend(CAST(0 AS HUGEINT),
       |        list_transform(range(1, length(tok) + 1),
       |                       i -> CAST(ascii(substr(tok, i, 1)) AS HUGEINT))),
       |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) % 64 AS b
       |  FROM toks),
       |cb AS (SELECT doc_id, b, count(*) AS cnt FROM th GROUP BY doc_id, b),
       |sc AS (
       |  SELECT cb.doc_id, isig.image_id,
       |    CAST(sum(cb.cnt * 781250 * isig.sgn) AS BIGINT) AS score_q
       |  FROM cb JOIN isig ON isig.b = cb.b
       |  GROUP BY cb.doc_id, isig.image_id)""".stripMargin

  /** Cross-modal pair curation, brute anchor: every (caption, image)
    * pair scored by the quantized integer dot product
    * ([[graft.functions.Exprs.qdot]] — the codegen'd kernel), keep the
    * top-[[CrossModalTopK]] images per caption (the CLIP-score
    * alignment-filtering shape: LAION-style curation keeps pairs whose
    * image/text similarity ranks high). Both feature sides are
    * binary-exact (counts·2⁻⁷ and ±2⁻³), so the oracle replays the
    * scoring in pure integers — a quantization slip, a hash-bucket
    * slip, or a dHash bit slip all hash-mismatch. Scale: the brute
    * cross join is the oracle anchor (candidates = captions × images);
    * [[q292]] is the production twin that routes candidates through
    * the IVF machinery. */
  val q291 = Q.sql("q291_crossmodal_align",
    s"""WITH $CrossModalScoreSql
       |SELECT doc_id, image_id, score_q, rnk FROM (
       |  SELECT doc_id, image_id, score_q,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_q DESC, image_id) AS BIGINT) AS rnk
       |  FROM sc) t
       |WHERE rnk <= $CrossModalTopK
       |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Similarity
    // top-3 via the mergeable bounded-heap aggregate, not a window:
    // the 3.6M-pair scored stream partial-aggregates map-side and only
    // ≤k-element heaps cross the exchange (the q30 pattern; heap order
    // ≡ row_number()'s (score desc, image_id) by construction)
    val scored = captionFeatures(s, d)
      .crossJoin(broadcast(imageFeatures(s, d)))
      .select(col("doc_id").as("query_id"), col("image_id").as("neighbor_id"),
        Exprs.qdot(col("txt_vec"), col("img_vec")).as("score"))
    Similarity.topKPerQueryLongRanked(scored, CrossModalTopK)
      .select(col("query_id").as("doc_id"), col("neighbor_id").as("image_id"),
        col("score").as("score_q"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** Cross-modal pair curation, routed: the candidate join reuses the
    * IVF machinery verbatim — coarse centroids are the first
    * IVF_LISTS image vectors (q32's deterministic quantizer), images
    * assign to their nearest list, captions probe their IVF_PROBES
    * nearest lists, and only within-list pairs are scored (same
    * integer qdot, same top-[[CrossModalTopK]] rank). At 100 TB the
    * candidate volume rides cell occupancy (∝ N·cell instead of
    * N·images); the oracle replays the full assignment — centroid
    * choice, rounded-cosine ranks with cent_id tie-break, probes —
    * plus every surviving score. MultimodalSpec pins that routed
    * scores equal the brute pair scores on shared pairs. */
  val q292 = Q.sql("q292_crossmodal_align_ivf",
    s"""WITH $CrossModalScoreSql,
       |cvec AS (
       |  SELECT dd.doc_id,
       |    list(coalesce(cb2.cnt, 0) * CAST(0.0078125 AS DOUBLE)
       |         ORDER BY jj.j) AS v
       |  FROM (SELECT DISTINCT doc_id FROM documents) dd
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj
       |  LEFT JOIN cb cb2 ON cb2.doc_id = dd.doc_id AND cb2.b = jj.j
       |  GROUP BY dd.doc_id),
       |ivec AS (
       |  SELECT image_id,
       |    list(CASE WHEN sgn > 0 THEN CAST(0.125 AS DOUBLE)
       |         ELSE CAST(-0.125 AS DOUBLE) END ORDER BY b) AS v
       |  FROM isig GROUP BY image_id),
       |cents AS (SELECT image_id AS cent_id, v AS cvec FROM ivec
       |          ORDER BY image_id LIMIT ${graft.operators.Similarity.IVF_LISTS}),
       |nasg AS (
       |  SELECT i.image_id, c.cent_id,
       |    row_number() OVER (PARTITION BY i.image_id
       |      ORDER BY round(list_cosine_similarity(i.v, c.cvec), 4) DESC,
       |               c.cent_id) AS crn
       |  FROM ivec i CROSS JOIN cents c),
       |nlist AS (SELECT image_id, cent_id AS lst FROM nasg WHERE crn = 1),
       |qasg AS (
       |  SELECT cv.doc_id, c.cent_id,
       |    row_number() OVER (PARTITION BY cv.doc_id
       |      ORDER BY round(list_cosine_similarity(cv.v, c.cvec), 4) DESC,
       |               c.cent_id) AS crn
       |  FROM cvec cv CROSS JOIN cents c),
       |qlist AS (SELECT doc_id, cent_id AS lst FROM qasg
       |          WHERE crn <= ${graft.operators.Similarity.IVF_PROBES}),
       |cand AS (SELECT DISTINCT q.doc_id, n.image_id
       |         FROM qlist q JOIN nlist n USING (lst)),
       |sc2 AS (SELECT sc.doc_id, sc.image_id, sc.score_q
       |        FROM sc JOIN cand ON cand.doc_id = sc.doc_id
       |                         AND cand.image_id = sc.image_id)
       |SELECT doc_id, image_id, score_q, rnk FROM (
       |  SELECT doc_id, image_id, score_q,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_q DESC, image_id) AS BIGINT) AS rnk
       |  FROM sc2) t
       |WHERE rnk <= $CrossModalTopK
       |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Exprs
    import graft.operators.Similarity
    val cap = captionFeatures(s, d)
    val img = imageFeatures(s, d)
      .localCheckpoint(true) // decode once: centroids + assignment read it
    val cents = Similarity.localCents(img.orderBy("image_id")
      .limit(Similarity.IVF_LISTS)
      .select(col("image_id").as("cent_id"), col("img_vec").as("cvec")))
    val nlist = Similarity.ivfAssign(img, cents, "image_id", "img_vec", "lst", 1)
    val qlist = Similarity.ivfAssign(cap, cents, "doc_id", "txt_vec", "qlst",
      Similarity.IVF_PROBES)
    // an image sits in exactly one list, so a (caption, image) pair
    // appears at most once across the caption's probes — no dedup pass;
    // same heap-aggregate tail as q291 (no window over the candidates)
    val scored = qlist.join(nlist, col("qlst") === col("lst"))
      .select(col("doc_id").as("query_id"), col("image_id").as("neighbor_id"),
        Exprs.qdot(col("txt_vec"), col("img_vec")).as("score"))
    Similarity.topKPerQueryLongRanked(scored, CrossModalTopK)
      .select(col("query_id").as("doc_id"), col("neighbor_id").as("image_id"),
        col("score").as("score_q"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  val all: Seq[Q] = Seq(q52, q53, q58, q79, q90, q134, q172, q182, q183, q184,
    q206, q207, q291, q292)
}
