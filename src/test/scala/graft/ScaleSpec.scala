package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: the 100 TB playbook items that local
  * correctness gates can't see — bucketing that removes the join
  * shuffle, and salting that spreads a hot key without changing the
  * aggregate.
  */
class ScaleSpec extends AnyFunSuite {

  private lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no shuffle before the join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    // unique names: the suite may share a session whose warehouse dir
    // still holds a previous run's table locations
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val liT = s"li_bucketed_$tag"; val oT = s"o_bucketed_$tag"
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable(liT)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable(oT)
    val joined = spark.table(liT)
      .join(spark.table(oT),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle either side:\n$plan")
    // and it returns the right count
    val unbucketed = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == unbucketed)
    spark.sql(s"DROP TABLE IF EXISTS $liT")
    spark.sql(s"DROP TABLE IF EXISTS $oT")
  }

  test("salted aggregation of a skewed key equals the direct aggregate") {
    import spark.implicits._
    // skew: one hot key holding most rows
    val skewed = spark.range(100000)
      .select(when($"id" % 10 === 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 7))
        .as("key"), ($"id" % 100).cast("double").as("v"))
    val direct = skewed.groupBy("key")
      .agg(sum($"v".cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy("key").as[(String, Double)].collect().toSeq
    // two-phase: salt → partial agg per (key, salt) → final agg per key
    val SALTS = 16
    val salted = skewed
      .withColumn("salt", pmod(hash($"v", monotonically_increasing_id()), lit(SALTS)))
      .groupBy("key", "salt")
      .agg(sum($"v".cast("decimal(18,2)")).as("partial"))
      .groupBy("key").agg(sum($"partial").cast("double").as("s"))
      .orderBy("key").as[(String, Double)].collect().toSeq
    assert(salted == direct)
  }
}
