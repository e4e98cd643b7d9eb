package graft.gov

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Spark shape: all deltas are computed from the ORIGINAL doc state
  * (matching the reference's task order, where J4 runs before J5's db
  * additions land) as slim `(id, key, val)` rows, in exactly TWO scans of
  * the corpus — J4+J5 fused into one explode against a unified broadcast
  * lookup `(src, key)`, J6's four emissions fused into one explode after
  * the TEMAS join — then one two-level aggregation builds a single
  * `(id, db_add, dyn_add)` delta table and ONE shuffle join on `id`
  * applies it via array_union / map merge. (A third corpus scan happens
  * at the apply join; in the production pipeline `docs` is a parquet
  * layer, so each scan is a pruned columnar read, not a transform
  * re-run.) The reference's $setUnion semantics (set, unspecified order)
  * are normalized to sorted arrays at the sinks.
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

    val emptyS = array().cast("array<string>")
    // pairUdf output is array<struct<_1,_2>>; rename to the shared
    // (key, v) element type so all emission arms concat
    val pairUdf = udf((a: Seq[String]) => pairWalk(a))
    def pairKv(c: Column): Column =
      transform(c, p => struct(p("_1").as("key"), p("_2").as("v")))

    // ---- J4 + J5 in ONE corpus scan ----
    // Unified broadcast lookup keyed by (src, k): instanceEcollection
    // rows join the raw `db` names, DBinstanceEcollection rows join the
    // NFKD-lower-trim `database` names. Each table row pre-computes its
    // static (key, v) emissions (`kvs`); only the J4 collection tags need
    // the doc-side name, carried as `coll_keys`. DbKey (NUL-prefixed) rows
    // fold the J5 db-additions into the same stream — a null-valued
    // marker is always present so a J5 match with an empty t_db still
    // set-normalizes `db`, exactly like the old per-branch j5db delta.
    val lookupRows =
      instTab.map(r => ("db", r.db,
        r.instance.map(("instance", _)),
        r.collection_instance)) ++
      dbInstTab.map { r =>
        val collKv = r.collection_instance.map { kv =>
          val parts = kv.split(":", -1)
          (parts(0), if (parts.length > 1) parts(1) else null)
        }
        ("database", r.database_campo4,
          r.instance.map(("instance", _)) ++ collKv ++
            ((DbKey, null: String) +: r.db.map((DbKey, _))),
          Seq.empty[String])
      }
    val lookupDf = broadcast(lookupRows.toDF("src", "k", "kvs", "coll_keys"))

    val names = docs.select($"id", explode(concat(
        transform(coalesce($"db", emptyS),
          x => struct(lit("db").as("src"), x.as("name"))),
        transform(coalesce($"database", emptyS),
          x => struct(lit("database").as("src"), x.as("name")))
      )).as("e"))
      .select($"id", $"e.src".as("src"), $"e.name".as("name"))
      .withColumn("k", when($"src" === "database",
        lower(trim(graft.functions.Exprs.strip_accents_nfkd($"name"))))
        .otherwise($"name"))
    val j45kv = names.join(lookupDf, Seq("src", "k"))
      .select($"id", explode(concat(
        pairKv($"kvs"),
        transform($"coll_keys", kk => struct(kk.as("key"), $"name".as("v")))
      )).as("kv"))

    // ---- J6: TEMAS union view on id_iahx, four emissions in one explode ----
    val temaDf = temas.select($"id_iahx", $"db".as("t_db"),
      $"instance_iahx".as("t_inst"), $"collection_iahx".as("t_coll"),
      $"tema_subtema".as("t_ts"), $"tema".as("t_t"), $"projeto".as("t_p"))
    val j6kv = docs.select($"id")
      .join(temaDf, $"id" === $"id_iahx")
      .select($"id", explode(concat(
        transform(coalesce($"t_inst", emptyS),
          v => struct(lit("instance").as("key"), v.as("v"))),
        transform(coalesce($"t_coll", emptyS),
          kk => struct(kk.as("key"), $"t_db".as("v"))),
        pairKv(pairUdf(concat(coalesce($"t_ts", emptyS), coalesce($"t_t", emptyS)))),
        pairKv(pairUdf(coalesce($"t_p", emptyS)))
      )).as("kv"))

    // ---- merge deltas: (id, key, val)* → (id, db_add, dyn_add) ----
    // Two-level agg, both map-side partial: collect_set drops the nulls
    // pairWalk emits for odd tails (and the J5 db marker), then the
    // per-id level splits the DbKey stream out of the dynamic-tag map.
    val delta = j45kv.unionByName(j6kv)
      .select($"id", $"kv.key".as("key"), $"kv.v".as("v"))
      .groupBy($"id", $"key")
      .agg(collect_set($"v").as("vals"))
      .groupBy($"id")
      .agg(
        collect_list(when($"key" =!= DbKey && size($"vals") > 0,
          struct($"key", $"vals"))).as("dyn_entries"),
        max($"key" === DbKey).as("db_touched"),
        flatten(collect_list(when($"key" === DbKey, $"vals"))).as("db_raw"))
      .select($"id",
        when(size($"dyn_entries") > 0, map_from_entries($"dyn_entries"))
          .as("dyn_add"),
        when($"db_touched", array_distinct($"db_raw")).as("db_add"))

    // ---- apply: one shuffle join on id ----
    // coalesce the doc side first: Gov.toIahx always materializes empty
    // arrays/maps, but Enrich.apply is a public entry point and a null
    // `db`/`dyn` would null out the concat and silently drop the
    // additions for that doc
    docs
      .join(delta.withColumnRenamed("id", "d_id"), $"id" === $"d_id", "left")
      .withColumn("db",
        when($"db_add".isNotNull, array_distinct(concat(
          coalesce($"db", array().cast("array<string>")), $"db_add")))
          .otherwise($"db"))
      .withColumn("dyn",
        when($"dyn_add".isNull, $"dyn").otherwise(
          map_zip_with(
            coalesce($"dyn", map().cast("map<string,array<string>>")), $"dyn_add",
            (_, v1, v2) => array_distinct(concat(
              coalesce(v1, array().cast("array<string>")),
              coalesce(v2, array().cast("array<string>")))))))
      .drop("d_id", "db_add", "dyn_add")
  }

  /** Reserved key routing J5's db-additions through the (id, key, val)
    * delta stream; NUL-prefixed so no real dynamic tag can collide. */
  private val DbKey = "\u0000db"
}
