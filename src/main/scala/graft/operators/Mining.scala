package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Pattern-mining operators: co-occurrence (the support-counting core
  * of market-basket / association-rule mining) and edit-distance fuzzy
  * joins (the pairing core of entity resolution). Both are
  * candidate-generation problems whose naive forms are quadratic; the
  * operators here carry their standard sub-quadratic shapes.
  */
object Mining {

  /** Item co-occurrence with minimum support: for basket column `bk`
    * and item column `it`, count baskets containing both items of each
    * unordered pair. The self-join shuffles on the basket key only —
    * pair blowup is bounded by the per-basket item count m (m·(m−1)/2
    * pairs per basket), so a basket-size cap upstream is the knob that
    * keeps 100 TB runs flat; the support filter then collapses the
    * long tail map-side via partial aggregation. */
  def cooccur(items: DataFrame, bk: String, it: String, minSupport: Long): DataFrame = {
    // materialize the distinct (basket, item) table once: both sides of
    // the self-join read it, and without the checkpoint each side
    // re-runs the upstream scan + distinct shuffle (the two projections
    // differ, so ReusedExchange cannot kick in) — r15, guide §1.2.
    // Lazy since r16 (no standalone materialization job; the first
    // consumer stage persists the blocks — r15 verdict item 1).
    val i = items.select(col(bk).as("bk"), col(it).as("item")).distinct()
      .localCheckpoint(false)
    val a = i.select(col("bk"), col("item").as("p1"))
    val b = i.select(col("bk"), col("item").as("p2"))
    a.join(b, Seq("bk")).filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Market-basket gate: parts co-ordered in the same order, support
    * ≥ 2, top-100 by (support, pair) — ties broken by the pair itself
    * so the cutoff is deterministic. */
  val q107 = Q.sql("q107_cooccurrence",
    """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
      |FROM i a JOIN i b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY support DESC, p1, p2 LIMIT 100""".stripMargin) { (s, d) =>
    cooccur(Tables.lineitem(s, d), "l_orderkey", "l_partkey", 2L)
      .orderBy(col("support").desc, col("p1"), col("p2"))
      .limit(100)
  }

  /** Edit-distance self-join on a string column with length-band
    * blocking: `levenshtein(a, b) ≥ |len(a) − len(b)|`, so pairs within
    * distance `maxDist` must fall in the same length band — each left
    * row joins only the 2·maxDist+1 length buckets it could match,
    * turning the all-pairs scan into an equi-join on length. The exact
    * distance predicate then verifies candidates. Each qualifying pair
    * appears once (`a < b` on the value); replication factor is the
    * constant 2·maxDist+1. At 100 TB the length key is usually too
    * coarse alone — the same shape composes with an additional q-gram
    * count key — but band-then-verify is the load-bearing structure. */
  def fuzzySelfJoin(values: DataFrame, c: String, maxDist: Int): DataFrame = {
    val v = values.select(col(c).as("v")).distinct()
      .withColumn("len", length(col("v")))
    val probe = v.withColumn("blen",
      explode(sequence(col("len") - maxDist, col("len") + maxDist)))
    val build = v.select(col("v").as("w"), col("len").as("blen"))
    probe.join(build, Seq("blen"))
      .filter(col("v") < col("w"))
      .withColumn("dist", levenshtein(col("v"), col("w")).cast("long"))
      .filter(col("dist") <= maxDist) // computed once — the DP does not
      .select("v", "w", "dist")       // re-run in a downstream projection
  }

  /** Fuzzy-join gate: distinct part names within edit distance 2,
    * banded by length. Both engines run the textbook Levenshtein. */
  val q109 = Q.sql("q109_fuzzy_join",
    """WITH names AS (SELECT DISTINCT p_name FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM names a JOIN names b
      |  ON a.p_name < b.p_name
      | AND abs(length(a.p_name) - length(b.p_name)) <= 2
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
    fuzzySelfJoin(Tables.part(s, d), "p_name", 2)
      .select(col("v").as("name_a"), col("w").as("name_b"), col("dist"))
      .orderBy("name_a", "name_b")
  }

  /** Event-transition matrix — the Markov-chain view of user journeys
    * (the aggregation under sankey/flow dashboards and next-step
    * prediction baselines). One window pass per user ordered by the µs
    * timestamp with a unique tie-break, then an integer pair count and
    * a per-source probability; the probability is one division of
    * identical integer operands on both engines, so the doubles
    * hash-match without rounding. */
  val q111 = Q.sql("q111_transition_matrix",
    """WITH s AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS dst
      |  FROM events WHERE user_id IS NOT NULL)
      |SELECT src, dst, count(*) AS n,
      |  CAST(count(*) AS DOUBLE)
      |    / sum(count(*)) OVER (PARTITION BY src) AS p
      |FROM s WHERE dst IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    trans
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("src")))
      .orderBy("src", "dst")
  }

  /** Association lift over document token pairs — the normalized form
    * of q107's raw support (lift = P(x,y)/(P(x)P(y))), which is what a
    * curation pipeline actually ranks by: high-support pairs of
    * independently-common tokens score ~1, genuine collocations score
    * ≫ 1. Held INTEGER-exact: lift is scaled to ten-thousandths with
    * one positive-operand floor division (Spark `div` ≡ DuckDB `//`),
    * so ranking and output both hash-match with no float anywhere.
    *
    * Scale shape: the pair build shuffles on doc_id only (per-doc
    * token-set size bounds the blowup, q107's argument); the per-token
    * document frequencies are a vocab-sized table joined in BROADCAST
    * (two hash lookups per surviving pair), and the doc count is a
    * 1-row literal join. The support floor collapses the long tail
    * map-side before any of that. */
  val q169 = Q.sql("q169_pair_lift",
    """WITH t AS MATERIALIZED (
      |  SELECT DISTINCT doc_id,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |cx AS MATERIALIZED (SELECT tok, count(*) AS c FROM t GROUP BY 1),
      |p AS (
      |  SELECT a.tok AS x, b.tok AS y, count(*) AS support
      |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT x, y, support,
      |  CAST((support * n.n_docs * 10000) // (cx1.c * cx2.c) AS BIGINT)
      |    AS lift_q4
      |FROM p
      |JOIN cx cx1 ON cx1.tok = p.x
      |JOIN cx cx2 ON cx2.tok = p.y
      |CROSS JOIN n
      |ORDER BY lift_q4 DESC, x, y LIMIT 100""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val docs = Tables.documents(s, d)
    val t = docs
      .select(col("doc_id"), explode(array_distinct(Text.tokens(col("text")))).as("tok"))
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val cx = t.groupBy("tok").agg(count(lit(1)).as("c"))
    val pairs = cooccur(t, "doc_id", "tok", 5L)
    pairs
      .join(broadcast(cx.select(col("tok").as("p1"), col("c").as("c1"))), "p1")
      .join(broadcast(cx.select(col("tok").as("p2"), col("c").as("c2"))), "p2")
      .crossJoin(broadcast(nDf))
      .select(col("p1").as("x"), col("p2").as("y"), col("support"),
        expr("(support * n_docs * 10000) div (c1 * c2)").as("lift_q4"))
      .orderBy(col("lift_q4").desc, col("x"), col("y"))
      .limit(100)
  }

  /** Item-based collaborative filtering — the recommendation readout
    * built on q107's co-occurrence model: a sampled customer's score
    * for a candidate part is Σ over their basket of the co-order
    * support between owned and candidate part, owned parts excluded,
    * top-5 per customer with (score, partkey) tie-breaks. All counts,
    * so the oracle replays the full rank.
    *
    * Scale: the item-item model is the q107 pair table (items², but
    * support-thresholded and item-vocabulary-sized — the standard CF
    * model footprint); scoring joins each user's basket against the
    * model on the ITEM key, so the recommendation pass shuffles on
    * item, never users × items. */
  val q220 = Q.sql("q220_item_recs",
    """WITH b AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |co AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS support
      |  FROM i a JOIN i b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2),
      |u AS (SELECT cust, part FROM b WHERE cust % 100 = 0),
      |sc AS (
      |  SELECT u.cust, co.p2 AS cand, CAST(sum(co.support) AS BIGINT) AS score
      |  FROM u JOIN co ON co.p1 = u.part
      |  LEFT JOIN u own ON own.cust = u.cust AND own.part = co.p2
      |  WHERE own.part IS NULL
      |  GROUP BY 1, 2)
      |SELECT cust, CAST(rn AS BIGINT) AS rank, cand AS partkey, score FROM (
      |  SELECT cust, cand, score,
      |    row_number() OVER (PARTITION BY cust ORDER BY score DESC, cand) AS rn
      |  FROM sc) WHERE rn <= 5
      |ORDER BY cust, rank""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val baskets = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").as("cust"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("part")),
        "o_orderkey")
      .select("cust", "part").distinct()
      // lazy (r16): sampled users + ownership anti-join read it
      .localCheckpoint(false)
    val i = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      // lazy (r16): both sides of the co-occurrence self-join read it
      .localCheckpoint(false)
    val co = i.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(i.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("p1") =!= col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).cast("long").as("support"))
    val u = baskets.filter(col("cust") % 100 === 0)
    val owned = u.select(col("cust"), col("part").as("cand"))
    u.join(co, col("p1") === col("part"))
      .select(col("cust"), col("p2").as("cand"), col("support"))
      .join(owned, Seq("cust", "cand"), "left_anti")
      .groupBy("cust", "cand").agg(sum("support").cast("long").as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cust").orderBy(col("score").desc, col("cand"))))
      .filter(col("rn") <= 5)
      .select(col("cust"), col("rn").cast("long").as("rank"),
        col("cand").as("partkey"), col("score"))
      .orderBy("cust", "rank")
  }

  /** Sequential path mining — the top event-type TRIGRAM paths users
    * actually walk (q111's first-order transition matrix can't see
    * beyond one hop; path mining is how product analytics finds the
    * real flows): per user the event stream in (ts, event_id) total
    * order, consecutive same-day triples folded to 'a>b>c' path
    * strings, ranked by global count with distinct-user support.
    * Lead windows partition by user, so the scan shuffles once on
    * user_id; the path vocabulary is |types|³-bounded, making the
    * final rank a tiny aggregate at any corpus size. */
  val q225 = Q.sql("q225_event_paths",
    """WITH o AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    lead(event_type) OVER w AS t2,
      |    lead(CAST(ts AS DATE)) OVER w AS d2,
      |    lead(event_type, 2) OVER w AS t3,
      |    lead(CAST(ts AS DATE), 2) OVER w AS d3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (
      |  SELECT user_id, event_type || '>' || t2 || '>' || t3 AS path
      |  FROM o WHERE t3 IS NOT NULL AND day = d2 AND day = d3)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_walks,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM p GROUP BY 1
      |ORDER BY n_walks DESC, path LIMIT 20""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").cast("date").as("day"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("d2", lead("day", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("d3", lead("day", 2).over(w))
      .filter(col("t3").isNotNull && col("day") === col("d2") &&
        col("day") === col("d3"))
      .select(col("user_id"),
        concat(col("event_type"), lit(">"), col("t2"), lit(">"), col("t3"))
          .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).cast("long").as("n_walks"),
        countDistinct("user_id").cast("long").as("n_users"))
      .orderBy(col("n_walks").desc, col("path"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(q107, q109, q111, q169, q220, q225)
}
