package graft.gov

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layer 03 — enrichment joins (reference 03_xml_enriched.py):
  *
  *  - J4: explode `db` → broadcast join TABS.instanceEcollection → per-doc
  *    instance set-union + `<collection_instance>: set(db)` dynamic fields
  *    (`:210-280`)
  *  - J5: same on `database` with NFKD-lower-trim keys; adds to `db` too;
  *    collection_instance entries are `key:value` pairs (`:283-382`)
  *  - J6: join the TEMAS union view (S9) on id_iahx; accumulate instance /
  *    collection sets and pair-walked `tema_subtema`/`tema`/`projeto`
  *    arrays into dynamic `{tag: [values]}` fields (`:385-500`)
  *
  * Spark shape: each join computes a per-id delta DataFrame
  * `(id, db_add, dyn_add: map<string,array<string>>)` from the ORIGINAL doc
  * state (matching the reference's task order, where J4 runs before J5's
  * db additions land), the three deltas union + merge, and ONE shuffle
  * join on `id` applies them via array_union / map merge. The reference's
  * $setUnion semantics (set, unspecified order) are normalized to sorted
  * arrays at the sinks.
  */
object Enrich {

  /** TABS.instanceEcollection row. */
  case class InstRow(db: String, instance: Seq[String], collection_instance: Seq[String])
  /** TABS.DBinstanceEcollection row (key = database_campo4). */
  case class DbInstRow(database_campo4: String, db: Seq[String],
      instance: Seq[String], collection_instance: Seq[String])
  /** One row of the TEMAS_BVS2 union view. */
  case class TemaRow(id_iahx: String, db: String, instance_iahx: Seq[String],
      collection_iahx: Seq[String], tema_subtema: Seq[String],
      tema: Seq[String], projeto: Seq[String])

  /** Walk a flat [k1,v1,k2,v2,…] array into (k, v) pairs; odd tails pair
    * with null (reference `:429-447`). */
  def pairWalk(arr: Seq[String]): Seq[(String, String)] =
    arr.grouped(2).map {
      case Seq(k, v) => (k, v)
      case Seq(k) => (k, null)
    }.toSeq

  /** Fixture-friendly overload: a driver-side TEMAS table. Production
    * uses the DataFrame variant — J6 is the reference's biggest join
    * (03_xml_enriched.py:385-453) and its input must not be capped at
    * driver memory. */
  def apply(spark: SparkSession, docs: DataFrame,
      instTab: Seq[InstRow], dbInstTab: Seq[DbInstRow],
      temas: Seq[TemaRow]): DataFrame = {
    import spark.implicits._
    apply(spark, docs, instTab, dbInstTab, temas.toDF(
      "id_iahx", "db", "instance_iahx", "collection_iahx",
      "tema_subtema", "tema", "projeto"))
  }

  /** Compute and apply all three enrichment deltas. `docs` must carry
    * `id`, `db` (array), `database` (array), `dyn` (map); `temas` is the
    * TEMAS_BVS2 union view with its natural column names (id_iahx, db,
    * instance_iahx, collection_iahx, tema_subtema, tema, projeto) — any
    * distributed source (parquet layer, JDBC snapshot), never collected. */
  def apply(spark: SparkSession, docs: DataFrame,
      instTab: Seq[InstRow], dbInstTab: Seq[DbInstRow],
      temas: DataFrame): DataFrame = {
    import spark.implicits._

    // Every branch emits slim (id, key, val) rows; ONE shuffle at the end
    // aggregates them (map-side partial collect_set). The reference's
    // $setUnion makes per-branch pre-aggregation redundant — the final
    // set-merge subsumes it — so the former 8 per-branch groupBys (8
    // extra shuffles) are gone.

    // ---- J4: db → instanceEcollection ----
    val instDf = broadcast(instTab.toDF("k_db", "t_instance", "t_coll_inst"))
    val j4 = docs.select($"id", explode($"db").as("db_name"))
      .join(instDf, $"db_name" === $"k_db")
    val j4inst = j4
      .select($"id", lit("instance").as("key"), explode($"t_instance").as("v"))
    val j4coll = j4
      .select($"id", explode($"t_coll_inst").as("key"), $"db_name".as("v"))

    // ---- J5: database → DBinstanceEcollection (NFKD-normalized key) ----
    val dbInstDf = broadcast(
      dbInstTab.toDF("k_database", "t_db", "t_instance", "t_coll_inst"))
    val j5base = docs.select($"id", explode($"database").as("database_name"))
      .withColumn("norm_key",
        lower(trim(graft.functions.Exprs.strip_accents_nfkd($"database_name"))))
      .join(dbInstDf, $"norm_key" === $"k_database")
    val j5db = j5base.groupBy("id")
      .agg(array_distinct(flatten(collect_list($"t_db"))).as("db_add"))
    val j5inst = j5base
      .select($"id", lit("instance").as("key"), explode($"t_instance").as("v"))
    val j5coll = j5base
      .select($"id", explode($"t_coll_inst").as("kv"))
      .select($"id", split($"kv", ":").getItem(0).as("key"),
        split($"kv", ":").getItem(1).as("v"))

    // ---- J6: TEMAS union view on id_iahx ----
    val temaDf = temas.select($"id_iahx", $"db".as("t_db"),
      $"instance_iahx".as("t_inst"), $"collection_iahx".as("t_coll"),
      $"tema_subtema".as("t_ts"), $"tema".as("t_t"), $"projeto".as("t_p"))
    val pairUdf = udf((a: Seq[String]) => pairWalk(a))
    val j6base = docs.select($"id")
      .join(temaDf, $"id" === $"id_iahx")
    val j6inst = j6base
      .select($"id", lit("instance").as("key"), explode($"t_inst").as("v"))
    val j6coll = j6base
      .select($"id", explode($"t_coll").as("key"), $"t_db".as("v"))
    val j6tags = j6base
      .select($"id", explode(pairUdf(concat($"t_ts", $"t_t"))).as("kv"))
      .select($"id", $"kv._1".as("key"), $"kv._2".as("v"))
    val j6ctx = j6base
      .select($"id", explode(pairUdf($"t_p")).as("kv"))
      .select($"id", $"kv._1".as("key"), $"kv._2".as("v"))

    // ---- merge deltas: (id, key, val)* → (id, dyn_add map) ----
    // collect_set drops the nulls pairWalk emits for odd tails (same as
    // the previous collect_list + final-distinct shape)
    val dynDelta = Seq(j4inst, j4coll, j5inst, j5coll, j6inst, j6coll, j6tags, j6ctx)
      .reduce(_.unionByName(_))
      .groupBy($"id", $"key")
      .agg(collect_set($"v").as("vals"))
      .filter(size($"vals") > 0)
      .groupBy($"id")
      .agg(map_from_entries(collect_list(struct($"key", $"vals"))).as("dyn_add"))

    // ---- apply: one shuffle join on id ----
    docs
      .join(j5db.withColumnRenamed("id", "j5_id"), $"id" === $"j5_id", "left")
      .join(dynDelta.withColumnRenamed("id", "dd_id"), $"id" === $"dd_id", "left")
      .withColumn("db",
        when($"db_add".isNotNull, array_distinct(concat($"db", $"db_add")))
          .otherwise($"db"))
      .withColumn("dyn",
        when($"dyn_add".isNull, $"dyn").otherwise(
          map_zip_with($"dyn", $"dyn_add",
            (_, v1, v2) => array_distinct(concat(
              coalesce(v1, array().cast("array<string>")),
              coalesce(v2, array().cast("array<string>")))))))
      .drop("j5_id", "db_add", "dd_id", "dyn_add")
  }
}
