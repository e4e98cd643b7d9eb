package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checked query: a Spark DataFrame program plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL run by the driver on
  * the same parquet tables. Queries without an oracle get a weaker
  * rows-only check — keep their outputs guaranteed non-empty.
  *
  * Determinism rules (both sides):
  *  - every double that passes through an aggregation is summed as
  *    DECIMAL (order-independent exact) and only then cast to double;
  *  - rounded (`round(x, n)`) before any threshold compare or ranking;
  *  - ties in top-k broken by a unique key column;
  *  - output columns only primitive types, names identical in both
  *    dialects (the driver's compare hashes by sorted column name);
  *  - a DECIMAL sum that can exceed ~15 significant digits must reach
  *    DOUBLE via `CAST(CAST(s AS VARCHAR) AS DOUBLE)` on the ORACLE
  *    side: DuckDB 1.0's decimal→double cast (int128 ÷ 10^scale, two
  *    roundings) is not correctly rounded, Spark's BigDecimal path is —
  *    the 5× sweep caught q01 diverging in the 17th digit (SWEEP_r9);
  *  - any rounded DOUBLE output column whose value can be negative must
  *    add `+ 0.0` on the ORACLE side: DuckDB's `round` preserves the
  *    sign of tiny negatives (`-0.0`), Spark's BigDecimal round
  *    normalizes to `+0.0` — value-equal but byte-distinct, and the
  *    driver hashes bytes (r9: q153 shipped hash-red this way);
  *  - `round(x, n)` of a derived DOUBLE whose EXACT value can land on
  *    a half boundary (e.g. a mean of micro-quantized values) is not
  *    cross-engine safe even when both engines hold the identical
  *    double: Spark rounds the SHORTEST-REPR decimal
  *    (`BigDecimal.valueOf`), DuckDB rounds the binary value — at
  *    55.68375 (binary 55.683749999999996) they split. Round such
  *    quantities in INTEGERS instead: half-up ten-thousandths of s/c
  *    = (s + 50·c) div (100·c) over micro sums (q233, 5× sweep);
  *  - a FLOAT column entering a DECIMAL sum must be cast
  *    `CAST(CAST(f AS DOUBLE) AS DECIMAL(p,s))` on the ORACLE side:
  *    DuckDB 1.0's direct FLOAT→DECIMAL cast scales in float32 and
  *    loses ~2e-9 per element (caught building q162); Spark's
  *    float→decimal rounds the exact binary value.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

object Q {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(fn)
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, None)(fn)
}
