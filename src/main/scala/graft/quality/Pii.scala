package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Q

/** PII detection + redaction — the scrub pass a training-data pipeline
  * runs before any text leaves the ingest layer. Pure `regexp_*`
  * expressions (codegen, no UDF), so the scrub is a stateless map: one
  * scan at 100 TB, trivially parallel, and safe to fuse with the quality
  * and language-ID passes that share the scan.
  *
  * The regexes stay inside the common Java-regex/RE2 dialect subset
  * (character classes + bounded repetition, no lookaround) so the DuckDB
  * oracle matches byte-for-byte.
  */
object Pii {

  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Count of matches of `re` in `text`. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact in severity order: emails, then phones, then bare IPs (phone
    * before IP so digit runs are claimed by the more specific pattern).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>"),
      IPV4_RE, "<IP>")

  /** The synthetic tables carry no real PII, so the gate constructs a
    * deterministic log line per event (address + phone + client IP
    * derived from event columns) and then proves the scrub finds and
    * removes exactly what was planted. Both engines build the same
    * line, so the oracle checks regex-semantics parity, not fixture
    * luck.
    */
  val q65 = Q.sql("q65_pii_scrub",
    """WITH lines AS (
      |  SELECT event_id,
      |    'user' || CAST(user_id AS VARCHAR) || '@example.com did ' || event_type ||
      |    ' from 10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) ||
      |    ' callback +1-555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') AS line
      |  FROM events)
      |SELECT event_id,
      |  CAST(len(regexp_extract_all(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(line, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
      |FROM lines ORDER BY event_id""".stripMargin) { (s, d) =>
    val line = concat(
      lit("user"), col("user_id").cast("string"), lit("@example.com did "),
      col("event_type"),
      lit(" from 10.0."), (col("user_id") % 256).cast("string"),
      lit("."), (col("event_id") % 256).cast("string"),
      lit(" callback +1-555-"),
      lpad((col("event_id") % 10000).cast("string"), 4, "0"))
    Tables.events(s, d)
      .select(col("event_id"), line.as("line"))
      .select(col("event_id"),
        piiCount(col("line"), EMAIL_RE).as("n_emails"),
        piiCount(col("line"), PHONE_RE).as("n_phones"),
        redact(col("line")).as("redacted"))
      .orderBy("event_id")
  }

  /** Deterministic pseudonymization — the identity-scrub pass q65's
    * text redaction doesn't cover: replace every stable user key with
    * a keyed token (here hex of the poly-131·G hash of a salted key —
    * production swaps in HMAC with a managed secret, same machinery),
    * keep the token↔key mapping in a vault only the governance layer
    * reads, and release the tokenized table. The gate publishes the
    * utility-vs-safety invariants a privacy review actually checks:
    * per event type the event count, distinct users, and distinct
    * pseudonyms — tokenization must preserve joinability EXACTLY
    * (n_users = n_pseudonyms: the token is injective on the observed
    * keys, and a collision would surface here as an inequality).
    * Stateless map + one aggregate — one scan at any scale. */
  val q228 = Q.sql("q228_pseudonymize",
    """WITH p AS (
      |  SELECT event_type, user_id,
      |    'u_' || printf('%x',
      |      CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(ks) + 1),
      |                       c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
      |        (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |        * 1752450205419405103 % 2305843009213693951 AS BIGINT))
      |      AS pseud
      |  FROM (SELECT event_type, user_id,
      |          'pseud:' || CAST(user_id AS VARCHAR) AS ks
      |        FROM events WHERE user_id IS NOT NULL))
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(count(DISTINCT pseud) AS BIGINT) AS n_pseudonyms
      |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    Tables.events(s, d).filter(col("user_id").isNotNull)
      .withColumn("pseud", concat(lit("u_"), lower(hex(Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("pseud:"), col("user_id").cast("string"))),
        Kmv.G)))))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct("user_id").cast("long").as("n_users"),
        countDistinct("pseud").cast("long").as("n_pseudonyms"))
      .orderBy("event_type")
  }

  /** Right-to-erasure impact report — the pre-flight a GDPR deletion
    * batch runs before the purge executes: for a deletion cohort
    * (user_id % 37 = 0 stands in for the request list), per event
    * type the rows leaving, the rows remaining, the metric mass
    * leaving (exact micro sum — finance needs to know what the KPIs
    * lose), and an order-pinned digest of the RETAINED row ids (the
    * q130 postings-md5 device) — the checksum the post-purge verifier
    * compares against, which is what makes the erasure auditable.
    * One scan, one aggregate; the digest rides the same groupBy. */
  val q237 = Q.sql("q237_erasure_impact",
    """SELECT event_type,
      |  CAST(sum(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_deleted,
      |  CAST(sum(CASE WHEN user_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_retained,
      |  CAST(sum(CASE WHEN user_id % 37 = 0
      |        THEN CAST(floor(value * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT)
      |    AS del_value_micro,
      |  md5(array_to_string(list_sort(
      |        list(event_id) FILTER (WHERE user_id % 37 <> 0)), ','))
      |    AS retained_md5
      |FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .withColumn("victim", col("user_id") % 37 === 0)
      .groupBy("event_type")
      .agg(
        sum(when(col("victim"), 1L).otherwise(0L)).cast("long").as("n_deleted"),
        sum(when(!col("victim"), 1L).otherwise(0L)).cast("long").as("n_retained"),
        sum(when(col("victim"), floor(col("value") * 1000000.0).cast("long"))
          .otherwise(0L)).cast("long").as("del_value_micro"),
        md5(array_join(transform(array_sort(
          collect_list(when(!col("victim"), col("event_id")))),
          x => x.cast("string")), ",").cast("binary")).as("retained_md5"))
      .orderBy("event_type")
  }

  /** End-to-end privacy release — the pipeline the privacy trio exists
    * to feed, run as ONE composition gate (the q80/q136 discipline):
    * generalize the quasi-identifier to the level the q239 ladder
    * CHOOSES (the chosen level is a data-dependent scalar — the
    * pipeline reads it, not a constant), suppress groups below k = 5,
    * and publish counts under q213's deterministic two-sided-geometric
    * noise keyed per group. The gate emits true count, noise, and
    * noisy count side by side because it IS the correctness check of
    * the mechanism; the release itself ships only the noisy column.
    * Stage order is pinned by the one chained oracle. */
  val q240 = Q.sql("q240_privacy_release",
    """WITH base AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(floor(value) AS BIGINT) AS vb
      |  FROM events WHERE value IS NOT NULL),
      |l0 AS (SELECT 0 AS lvl, count(*) AS k FROM base GROUP BY event_type, day, vb),
      |l1 AS (SELECT 1 AS lvl, count(*) AS k FROM base GROUP BY event_type, day),
      |l2 AS (SELECT 2 AS lvl, count(*) AS k FROM base GROUP BY event_type),
      |m AS (
      |  SELECT lvl, min(k) AS min_k
      |  FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL SELECT * FROM l2)
      |  GROUP BY 1),
      |ch AS (SELECT min(lvl) AS chosen FROM m WHERE min_k >= 5),
      |gk AS (
      |  SELECT CASE ch.chosen
      |      WHEN 0 THEN event_type || '|' || CAST(day AS VARCHAR)
      |                 || '|' || CAST(vb AS VARCHAR)
      |      WHEN 1 THEN event_type || '|' || CAST(day AS VARCHAR)
      |      ELSE event_type END AS group_key
      |  FROM base CROSS JOIN ch),
      |c AS (
      |  SELECT group_key, CAST(count(*) AS BIGINT) AS k_true
      |  FROM gk GROUP BY 1 HAVING count(*) >= 5),
      |h AS (
      |  SELECT group_key, k_true,
      |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(ks) + 1),
      |                     c -> CAST(ascii(substr(ks, c, 1)) AS HUGEINT))),
      |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS hv
      |  FROM (SELECT group_key, k_true, 'dp:' || group_key AS ks FROM c)),
      |z AS (
      |  SELECT group_key, k_true, hv,
      |    CASE WHEN hv = 0 THEN 0
      |         ELSE length(bin(hv & -hv)) - 1 END AS mag
      |  FROM h)
      |SELECT group_key, k_true,
      |  CAST(((hv >> (mag + 1)) & 1) * 2 - 1 AS BIGINT) * mag AS noise,
      |  k_true + CAST(((hv >> (mag + 1)) & 1) * 2 - 1 AS BIGINT) * mag AS k_noisy
      |FROM z ORDER BY group_key""".stripMargin) { (s, d) =>
    import graft.functions.Exprs
    import graft.operators.Sketches.Kmv
    val base = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        floor(col("value")).cast("long").as("vb"))
      .localCheckpoint(true) // ladder + release read it
    def level(lvl: Int, keys: Seq[String]) =
      base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("k"))
        .select(lit(lvl).as("lvl"), col("k"))
    val ch = level(0, Seq("event_type", "day", "vb"))
      .unionByName(level(1, Seq("event_type", "day")))
      .unionByName(level(2, Seq("event_type")))
      .groupBy("lvl").agg(min("k").as("min_k"))
      .filter(col("min_k") >= 5).agg(min("lvl").as("chosen"))
    base.crossJoin(broadcast(ch))
      .withColumn("group_key",
        when(col("chosen") === 0,
          concat(col("event_type"), lit("|"), col("day").cast("string"),
            lit("|"), col("vb").cast("string")))
          .when(col("chosen") === 1,
            concat(col("event_type"), lit("|"), col("day").cast("string")))
          .otherwise(col("event_type")))
      .groupBy("group_key").agg(count(lit(1)).cast("long").as("k_true"))
      .filter(col("k_true") >= 5)
      .withColumn("hv", Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("dp:"), col("group_key"))), Kmv.G))
      .withColumn("mag",
        when(col("hv") === 0, 0L)
          .otherwise(expr("length(bin(hv & -hv)) - 1").cast("long")))
      .withColumn("noise",
        (expr("shiftright(hv, cast(mag + 1 as int)) & 1") * 2 - 1).cast("long")
          * col("mag"))
      .select(col("group_key"), col("k_true"), col("noise"),
        (col("k_true") + col("noise")).as("k_noisy"))
      .orderBy("group_key")
  }

  val all: Seq[Q] = Seq(q65, q228, q237, q240)
}
