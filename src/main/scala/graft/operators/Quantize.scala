package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Symmetric per-vector int8 quantization of an embedding column — the
  * storage/serving compression step of an embedding pipeline (8× smaller
  * vectors for ANN serving and index shipping). scale = max|x|/127;
  * q_i = floor(x_i/scale + 0.5) clamped to [-127, 127]; all-zero vectors
  * quantize to zeros with scale 0.
  *
  * Stateless per-row map over native higher-order array expressions —
  * one scan, zero shuffle, whole-stage codegen; at 100 TB it fuses with
  * whatever shaping pass precedes the write. floor(x + 0.5) instead of
  * round(): its negative-half behavior is defined identically in Spark
  * and DuckDB, so the oracle replays the rounding bit-exactly (both
  * engines widen the same parquet floats to double and run the same
  * IEEE ops in the same order).
  */
object Quantize {

  /** The quantization formula, shared by every int8 surface: (scale,
    * quantized array) column pair over an `embedding` column. One
    * definition so the rounding/clamping choice can never drift between
    * gates. */
  private def quantCols: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val maxabs = array_max(transform(col("embedding"), x => abs(x)))
    val scale = (maxabs / lit(127.0)).cast("double")
    val q = when(scale === 0.0,
        transform(col("embedding"), _ => lit(0L)))
      .otherwise(transform(col("embedding"), x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / scale + lit(0.5))))))
    (scale, q)
  }

  /** (vec_id, n_dims, scale, sum_q, min_q, max_q): quantization summary
    * per vector — the integer columns are exact, scale rounds to 6. */
  def int8Summary(emb: DataFrame): DataFrame = {
    val (scale, q) = quantCols
    emb.select(col("vec_id"),
      size(col("embedding")).cast("bigint").as("n_dims"),
      round(scale, 6).as("scale"),
      aggregate(q, lit(0L), (a, x) => a + x).as("sum_q"),
      array_min(q).cast("bigint").as("min_q"),
      array_max(q).cast("bigint").as("max_q"))
  }

  /** Gate: the oracle recomputes scale and the floor-rounded clamped
    * quantized values from the same parquet floats. */
  val q100 = Q.sql("q100_embed_quant",
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    len(embedding) AS n,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, n, scale,
      |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding, x -> CAST(greatest(-127, least(127,
      |                floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT))
      |    END AS qv
      |  FROM s)
      |SELECT vec_id, CAST(n AS BIGINT) AS n_dims, round(scale, 6) AS scale,
      |  CAST(list_sum(qv) AS BIGINT) AS sum_q,
      |  CAST(list_min(qv) AS BIGINT) AS min_q,
      |  CAST(list_max(qv) AS BIGINT) AS max_q
      |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
    int8Summary(Tables.embeddings(s, d)).orderBy("vec_id")
  }

  /** (vec_id, qv): the quantized vectors themselves, same formula as
    * [[int8Summary]]. */
  def int8Vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quantCols._2.as("qv"))

  /** Quantized-ANN serving gate: top-5 neighbors per probe by INT8 dot
    * product. This is the rerank arithmetic an int8-compressed index
    * serves (q32's IVF is the candidate-pruning stage; this is the
    * scoring stage after compression) — and unlike float cosine it is
    * integer-exact, so the gate pins every score, not a rounded echo.
    * Probes broadcast (the small side by construction); candidates
    * stream through one scan; per-probe top-5 is one rank window whose
    * input is already pruned to |probes|·|cands| pairs. */
  val q112 = Q.sql("q112_ann_int8",
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id,
      |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding, x -> CAST(greatest(-127, least(127,
      |                floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT))
      |    END AS qv
      |  FROM s),
      |p AS (SELECT vec_id AS q_id, qv AS qa FROM q WHERE vec_id < 20),
      |pr AS (
      |  SELECT q_id, c.vec_id AS c_id,
      |    CAST(list_dot_product(qa, c.qv) AS BIGINT) AS dot
      |  FROM p, q c WHERE c.vec_id <> q_id)
      |SELECT q_id, c_id, dot, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |                               ORDER BY dot DESC, c_id) AS rk
      |  FROM pr) t
      |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val qv = int8Vectors(Tables.embeddings(s, d))
    val probes = qv.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("qv").as("qa"))
    val pairs = qv.select(col("vec_id").as("c_id"), col("qv"))
      .crossJoin(broadcast(probes))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        aggregate(zip_with(col("qa"), col("qv"), (x, y) => x * y),
          lit(0L), (a, x) => a + x).as("dot"))
    pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dot").desc, col("c_id"))).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }

  val all: Seq[Q] = Seq(q100, q112)
}
