package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided synthetic star schema
  * (see TESTDATA.md). One parquet file per table under the sf dir.
  *
  * At cluster scale these would be partitioned/bucketed tables; in this
  * harness each is a single parquet file, so we rely on Parquet row-group
  * parallelism + AQE. All lookups small enough to broadcast are marked at
  * the call sites (the operators package), not here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries INT64 TIMESTAMP(NANOS). How Spark reads that
    * depends on the jars: 3.x-era readers reject it unless
    * `nanosAsLong` maps it to a raw long; 4.1+ reads it natively as
    * TIMESTAMP_NTZ (truncating ns→us, same as DuckDB's ns→us cast).
    * Branch on the loaded dtype so both paths yield an identical
    * session-TZ(=UTC) microsecond TIMESTAMP column.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // No-op on jars that read TIMESTAMP(NANOS) natively; required on older
    // readers. Guarded: the legacy key may be retired entirely some day.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // raw nanos → truncate to micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // wall-clock micros; session TZ is pinned UTC at every entry
        // point, so the cast is the identity reinterpretation ns-parity
        // with the long path (EngineSpec pins equality of both routes).
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TIMESTAMP
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
