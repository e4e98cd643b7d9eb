package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-supervised label propagation (Zhu & Ghahramani's hard-label
  * variant) — the data-LABELING operator of the pipeline: a small seed
  * set carries trusted labels, and every unlabeled vector takes the
  * weighted majority vote of its k nearest neighbors, iterated so
  * labels flow outward one hop per round. This is how a curation stack
  * turns 2% human labels into corpus-wide weak labels for filtering or
  * stratification.
  *
  * Determinism is by construction, not rounding: similarity is the
  * INTEGER dot product of the q162-quantized embeddings (floor(x·10⁸);
  * |dot| ≤ 64·4·10¹⁶ fits a long), the kNN edge is (dot DESC, nb ASC)
  * row-numbered, votes are integer weight sums with (sum DESC, label
  * ASC) tie-breaks — no float ever aggregates, so the oracle replays
  * every round exactly. Dot-product affinity (not cosine) is the
  * standard MIPS formulation; only positive-affinity neighbors vote.
  *
  * Scale: the gate's pair build is the brute broadcast all-pairs (the
  * q30 precedent — the oracle-anchored reference); at 100 TB the
  * candidate stage swaps to the q31/q32 banded/routed generators
  * unchanged, because propagation only consumes (id, nb, w) edges. Each
  * round is one join + one partial-agg'd vote on the k·n edge table,
  * seeds ride as a broadcast. */
object LabelProp {

  val K = 3
  val Rounds = 3
  val SeedMod = 5

  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").as("xq"),
      col("label").cast("long").as("label"))

  /** (id, nb, w): each vector's K nearest positive-affinity neighbors
    * by quantized dot product ([[graft.functions.Exprs.qdot]] — the
    * codegen kernel; the zip_with/aggregate HOF form of the same sum
    * ran 40 s at sf0.1 against ~2 s with the kernel). */
  def knnEdges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = quantized(s, d)
    val a = e.select(col("vec_id").as("id"), col("xq").as("xa"))
    val b = e.select(col("vec_id").as("nb"), col("xq").as("xb"))
    val pairs = a.join(broadcast(b), col("id") =!= col("nb"))
      .withColumn("w", graft.functions.Exprs.qdot(col("xa"), col("xb")))
      .filter(col("w") > 0)
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("w").desc, col("nb"))))
      .filter(col("rn") <= K)
      .select("id", "nb", "w")
  }

  /** Hard-label propagation: seeds (vec_id ≡ 0 mod [[SeedMod]]) are
    * clamped; everyone else takes the weighted vote of its neighbors'
    * current labels each round, −1 = still unlabeled. */
  def propagate(s: SparkSession, d: String): DataFrame =
    propagateOn(s, d, knnEdges(s, d))

  /** The propagation rounds over a supplied (id, nb, w) edge table —
    * shared by the brute (q178) and IVF-routed (q192) candidate
    * generators. */
  def propagateOn(s: SparkSession, d: String, edges0: DataFrame): DataFrame = {
    val e = quantized(s, d)
    val nodes = e.select(col("vec_id").as("id"),
      when(col("vec_id") % SeedMod === 0, col("label")).as("seed"))
      .localCheckpoint(true)
    val edges = edges0.localCheckpoint(true)
    var lab = nodes.select(col("id"), col("seed").as("lab"))
    for (_ <- 1 to Rounds) {
      import org.apache.spark.sql.expressions.Window
      val votes = edges
        .join(lab.select(col("id").as("nb"), col("lab").as("nlab")), "nb")
        .filter(col("nlab").isNotNull)
        .groupBy("id", "nlab").agg(sum("w").as("sw"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(col("sw").desc, col("nlab"))))
        .filter(col("rn") === 1)
        .select(col("id"), col("nlab").as("vote"))
      lab = nodes.join(votes, Seq("id"), "left")
        .select(col("id"), coalesce(col("seed"), col("vote")).as("lab"))
        .localCheckpoint(true)
    }
    lab.select(col("id").as("vec_id"), coalesce(col("lab"), lit(-1L)).as("lab"))
  }

  /** One oracle vote layer over l{t-1}. */
  private def layer(t: Int): String =
    s"""v$t AS MATERIALIZED (
       |  SELECT n.id, coalesce(n.seed, w.vote) AS lab
       |  FROM nodes n LEFT JOIN (
       |    SELECT id, nlab AS vote FROM (
       |      SELECT k.id, l.lab AS nlab, sum(k.w) AS sw,
       |        row_number() OVER (PARTITION BY k.id
       |                           ORDER BY sum(k.w) DESC, l.lab) AS rn
       |      FROM knn k JOIN v${t - 1} l ON l.id = k.nb
       |      WHERE l.lab IS NOT NULL
       |      GROUP BY k.id, l.lab)
       |    WHERE rn = 1) w ON w.id = n.id)""".stripMargin

  val q178 = Q.sql("q178_label_propagation",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |nodes AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
       |  FROM e),
       |p AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS nb,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(a.xq, b.xq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w
       |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
       |knn AS MATERIALIZED (
       |  SELECT id, nb, w FROM (
       |    SELECT id, nb, w,
       |      row_number() OVER (PARTITION BY id ORDER BY w DESC, nb) AS rn
       |    FROM p WHERE w > 0)
       |  WHERE rn <= $K),
       |v0 AS (SELECT id, seed AS lab FROM nodes),
       |${(1 to Rounds).map(layer).mkString(",\n")}
       |SELECT id AS vec_id, coalesce(lab, -1) AS lab FROM v$Rounds
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    propagate(s, d).orderBy("vec_id")
  }

  /** The e/p CTE head every cross-side miner shares: label parity
    * splits the space into two sides, p is the BRUTE all-pairs
    * affinity table (the oracle-anchor candidate generator). */
  private val crossBruteCtes =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
      |    label % 2 AS side
      |  FROM embeddings),
      |p AS MATERIALIZED (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(a.xq, b.xq), q -> q[1] * q[2])),
      |      (x, y) -> x + y) AS w
      |  FROM e a JOIN e b ON a.side = 0 AND b.side = 1)""".stripMargin

  /** Both argmax directions + the mutual join, over whatever candidate
    * table the caller supplies as `p` — the miner itself is candidate-
    * generator-agnostic (it only ever reads (id_a, id_b, w)). */
  private val mutualTailSql =
    """ab AS (
      |  SELECT id_a, id_b, w FROM (
      |    SELECT id_a, id_b, w,
      |      row_number() OVER (PARTITION BY id_a ORDER BY w DESC, id_b) AS rn
      |    FROM p) WHERE rn = 1),
      |ba AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT id_a, id_b,
      |      row_number() OVER (PARTITION BY id_b ORDER BY w DESC, id_a) AS rn
      |    FROM p) WHERE rn = 1)
      |SELECT ab.id_a AS id_a, ab.id_b AS id_b, ab.w AS w
      |FROM ab JOIN ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
      |ORDER BY ab.id_a""".stripMargin

  /** The Spark twin of [[mutualTailSql]]: argmax in each direction over
    * a supplied (id_a, id_b, w) pair table, keep the mutual pairs.
    * Shared by the brute (q179) and IVF-routed (q279) generators —
    * landing the scaladoc promise that the miner consumes only
    * affinity triples. */
  private def mutualFromPairs(p0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = p0.localCheckpoint(true) // both argmax directions read it
    val ab = p.withColumn("rn", row_number().over(
        Window.partitionBy("id_a").orderBy(col("w").desc, col("id_b"))))
      .filter(col("rn") === 1).select("id_a", "id_b", "w")
    val ba = p.withColumn("rn", row_number().over(
        Window.partitionBy("id_b").orderBy(col("w").desc, col("id_a"))))
      .filter(col("rn") === 1).select(col("id_a").as("ba_a"), col("id_b").as("ba_b"))
    ab.join(ba, col("id_a") === col("ba_a") && col("id_b") === col("ba_b"))
      .select("id_a", "id_b", "w")
      .orderBy("id_a")
  }

  /** The cross-side brute pair table (side 0 × side 1, integer qdot) —
    * q179/q203's oracle-anchor candidate generator. */
  private def bruteCrossPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").as("xq"), (col("label") % 2).as("side"))
    val a = e.filter(col("side") === 0).select(col("vec_id").as("id_a"), col("xq").as("xa"))
    val b = e.filter(col("side") === 1).select(col("vec_id").as("id_b"), col("xq").as("xb"))
    a.join(broadcast(b), lit(true))
      .withColumn("w", graft.functions.Exprs.qdot(col("xa"), col("xb")))
      .select("id_a", "id_b", "w")
  }

  /** Mutual-nearest-neighbor pair mining (the margin-free core of
    * bitext/parallel-corpus mining, Artetxe & Schwenk's shape): split
    * the space into two sides (label parity stands in for the two
    * languages), take each vector's top-1 cross-side neighbor by the
    * same integer dot product, and keep exactly the pairs where the
    * choice is MUTUAL — the standard high-precision alignment rule,
    * because a one-directional hub match fails the reverse test.
    * Integer affinities end to end (q178's quantization), ties by
    * neighbor id; the oracle replays both argmax directions. Scale:
    * this gate is the brute ORACLE ANCHOR; q279 is the deployable
    * IVF-routed twin over the identical mutual ranker. */
  val q179 = Q.sql("q179_mutual_nn",
    s"""$crossBruteCtes,
       |$mutualTailSql""".stripMargin) { (s, d) =>
    mutualFromPairs(bruteCrossPairs(s, d))
  }

  val IvfLists = 8
  val IvfProbes = 2

  /** The SCALE twin of q178 (the q150→q152 discipline): identical
    * propagation, sub-quadratic candidate generation. Vectors assign to
    * [[IvfLists]] coarse lists by integer-dot argmax against the first
    * 8 vectors (q139's deterministic centroid choice); each vector
    * probes its top-[[IvfProbes]] lists and meets only co-listed
    * vectors — candidate volume n²·probes/lists instead of n², and at
    * 100 TB the list count grows ∝ √N so the per-list join stays flat.
    * Everything stays integer (assignment, probe ranking, and edge
    * weights are all the qdot kernel), so the oracle replays routing
    * and votes exactly. Coverage loses only what routing hides
    * (vectors whose true neighbors live in unprobed lists keep −1 a
    * round longer) — the recall-for-cost trade every IVF stage makes. */
  val q192 = Q.sql("q192_label_prop_ivf",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |nodes AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
       |  FROM e),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, xq AS cq FROM e ORDER BY vec_id LIMIT $IvfLists),
       |ac AS MATERIALIZED (
       |  SELECT e.vec_id, c.cent_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |        (x, y) -> x + y) DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cent_id AS lst FROM ac WHERE rn = 1),
       |prb AS (SELECT vec_id, cent_id AS lst FROM ac WHERE rn <= $IvfProbes),
       |p AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS nb,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(ea.xq, eb.xq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w
       |  FROM prb a JOIN asg b ON a.lst = b.lst AND a.vec_id <> b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id),
       |knn AS MATERIALIZED (
       |  SELECT id, nb, w FROM (
       |    SELECT id, nb, w,
       |      row_number() OVER (PARTITION BY id ORDER BY w DESC, nb) AS rn
       |    FROM (SELECT DISTINCT id, nb, w FROM p) WHERE w > 0)
       |  WHERE rn <= $K),
       |v0 AS (SELECT id, seed AS lab FROM nodes),
       |${(1 to Rounds).map(layer).mkString(",\n")}
       |SELECT id AS vec_id, coalesce(lab, -1) AS lab FROM v$Rounds
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Exprs
    val e = quantized(s, d).localCheckpoint(true)
    val cents = e.orderBy("vec_id").limit(IvfLists)
      .select(col("vec_id").as("cent_id"), col("xq").as("cq"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray)) // ≤8 rows — the q139 bounded collect
    val ranked = array(cents.map { case (cid, cv) =>
      struct(Exprs.qdot(col("xq"), typedlit(cv.toSeq)).as("w"),
        lit(-cid).as("negid"))
    }: _*)
    // queries = corpus: ONE ranked pass (posexplode keeps the slice
    // position) derives nearest list (rank 1) AND probe lists — the
    // old pair of listsOf calls paid the C-qdot ranking twice (r15,
    // the Similarity.ivfAssignRanked single-pass rationale)
    val asgr = e
      .select(col("vec_id"),
        posexplode(slice(sort_array(ranked, asc = false), 1, IvfProbes)))
      .select(col("vec_id"), (-col("col.negid")).as("lst"), col("pos"))
      .localCheckpoint(false) // lazy: first consumer stage persists it (r16)
    val asg = asgr.filter(col("pos") === 0).select("vec_id", "lst")
    val prb = asgr.select("vec_id", "lst")
    val pairs = prb.select(col("vec_id").as("id"), col("lst"))
      .join(asg.select(col("vec_id").as("nb"), col("lst")), "lst")
      .filter(col("id") =!= col("nb"))
      .select("id", "nb").distinct()
      .join(e.select(col("vec_id").as("id"), col("xq").as("xa")), "id")
      .join(e.select(col("vec_id").as("nb"), col("xq").as("xb")), "nb")
      .withColumn("w", Exprs.qdot(col("xa"), col("xb")))
      .filter(col("w") > 0)
    val edges = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("w").desc, col("nb"))))
      .filter(col("rn") <= K)
      .select("id", "nb", "w")
    propagateOn(s, d, edges).orderBy("vec_id")
  }

  /** The qdot twin of [[Similarity.ivfAssignHof]]: nearest-centroid
    * ranking by INTEGER dot product (the LabelProp family's affinity —
    * not the rounded cosine the ANN family ranks on), with the
    * centroid table riding as one array literal walked by `transform`,
    * so generated code stays constant-size at any list count. Sort
    * key (w DESC, cent_id ASC) — identical to q192's literal idiom. */
  private def qdotAssignHof(df: DataFrame, cents: Seq[(Long, Seq[Float])],
      keep: Int): DataFrame = {
    import graft.functions.Exprs
    val table = typedlit(cents.map { case (cid, cv) => (-cid, cv) })
    val ranked = transform(table, c =>
      struct(Exprs.qdot(col("xq"), c.getField("_2")).as("w"),
        c.getField("_1").as("negid")))
    // keep=1 assignment pass: O(C) array_max instead of the O(C log C)
    // sort — struct max = (w, negid) lexicographic max = highest w, ties
    // to lowest cent_id, exactly sort-desc-take-1 (Similarity.ivfAssignHof
    // has the same branch; the routed-vs-brute agreement specs cover it).
    // cents.nonEmpty: the explode branch drops all rows on an empty
    // centroid table; array_max would keep them with a null lst (r14
    // advice — unreachable in practice, guarded for the equivalence)
    if (keep == 1 && cents.nonEmpty)
      df.select(col("*"), array_max(ranked).as("c"))
        .withColumn("lst", -col("c.negid"))
        .drop("c")
    else
      df.select(col("*"),
          explode(slice(sort_array(ranked, asc = false), 1, keep)).as("c"))
        .withColumn("lst", -col("c.negid"))
        .drop("c")
  }

  /** The DERIVED-GEOMETRY twin of q192 (closing SCALING_r13's one
    * flagged number: q192's pinned 8-list candidate volume reads above
    * the ×4 decade prediction under spill): identical propagation —
    * [[propagateOn]], the function q178/q192 run — over candidates
    * routed through nlist = clamp(⌈√N⌉, 16, 65536) lists
    * ([[Similarity.autoNlist]], the q281 formula; both engines derive
    * it from the same count), assignment via the constant-codegen-size
    * HOF form. Candidate volume ~probes·N^1.5 instead of N²·probes/8,
    * so the per-round vote join rides a linear edge table at any
    * corpus size. */
  val q285 = Q.sql("q285_label_prop_autonlist",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |nodes AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    CASE WHEN vec_id % $SeedMod = 0 THEN label END AS seed
       |  FROM e),
       |nl AS (SELECT least(${Similarity.AUTO_NLIST_CAP},
       |         greatest(${Similarity.IVF_LISTS},
       |           CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS nlists
       |       FROM e),
       |cents AS MATERIALIZED (
       |  SELECT cent_id, cq FROM (
       |    SELECT vec_id AS cent_id, xq AS cq,
       |      row_number() OVER (ORDER BY vec_id) AS rn FROM e) t
       |  CROSS JOIN nl WHERE t.rn <= nl.nlists),
       |ac AS MATERIALIZED (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |        (x, y) -> x + y) DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cent_id AS lst FROM ac WHERE rn = 1),
       |prb AS (SELECT vec_id, cent_id AS lst FROM ac WHERE rn <= $IvfProbes),
       |p AS MATERIALIZED (
       |  SELECT a.vec_id AS id, b.vec_id AS nb,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(ea.xq, eb.xq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w
       |  FROM prb a JOIN asg b ON a.lst = b.lst AND a.vec_id <> b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id),
       |knn AS MATERIALIZED (
       |  SELECT id, nb, w FROM (
       |    SELECT id, nb, w,
       |      row_number() OVER (PARTITION BY id ORDER BY w DESC, nb) AS rn
       |    FROM (SELECT DISTINCT id, nb, w FROM p) WHERE w > 0)
       |  WHERE rn <= $K),
       |v0 AS (SELECT id, seed AS lab FROM nodes),
       |${(1 to Rounds).map(layer).mkString(",\n")}
       |SELECT id AS vec_id, coalesce(lab, -1) AS lab FROM v$Rounds
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = quantized(s, d).localCheckpoint(true)
    val nl = Similarity.autoNlist(e.count())
    val cents = e.orderBy("vec_id").limit(nl)
      .select(col("vec_id").as("cent_id"), col("xq").as("cq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .sortBy(_._1).toVector // capped by AUTO_NLIST_CAP — bounded collect
    val asg = qdotAssignHof(e.select(col("vec_id"), col("xq")), cents, 1)
    val prb = qdotAssignHof(e.select(col("vec_id"), col("xq")), cents, IvfProbes)
    val pairs = prb.select(col("vec_id").as("id"), col("lst"))
      .join(asg.select(col("vec_id").as("nb"), col("lst")), "lst")
      .filter(col("id") =!= col("nb"))
      .select("id", "nb").distinct()
      .join(e.select(col("vec_id").as("id"), col("xq").as("xa")), "id")
      .join(e.select(col("vec_id").as("nb"), col("xq").as("xb")), "nb")
      .withColumn("w", graft.functions.Exprs.qdot(col("xa"), col("xb")))
      .filter(col("w") > 0)
    val edges = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("w").desc, col("nb"))))
      .filter(col("rn") <= K)
      .select("id", "nb", "w")
    propagateOn(s, d, edges).orderBy("vec_id")
  }

  /** Ratio-margin pair mining (Artetxe & Schwenk's CCMatrix scoring) —
    * q179's mutual-NN rule upgraded to the margin criterion production
    * bitext mining actually ranks by: a pair's affinity divided by the
    * mean of each endpoint's top-[[MarginK]] cross-side affinities.
    * Hub vectors (high affinity to EVERYTHING) get discounted because
    * their own top-k mean is high — the margin keeps only pairs that
    * are mutually exceptional, which mutual-NN alone can't express.
    *
    * Exactness: affinities are the integer qdot; with na/nb the actual
    * top-k sizes, margin = 2·w·na·nb / (Aₖ·nb + Bₖ·na) — both products
    * run in 38-digit decimals (HUGEINT on the oracle side) and cross to
    * DOUBLE through the VARCHAR bridge (operators.Q rule), so the one
    * division is IEEE-identical. Margin > 0 always (w > 0 filter), so
    * no signed-zero seam. Scale: the gate's pair table is the brute
    * oracle anchor (q179's precedent); q280 is the landed IVF-routed
    * twin over the identical margin ranker — the margin math
    * only ever sees (id, id, w) triples. */
  val MarginK = 4

  /** Top-k margin sums, best pair, and the HUGEINT-exact margin ratio
    * over whatever positive-affinity candidate table the caller
    * supplies as `pp` — q203 (brute) and q280 (routed) share it. */
  private val marginTailSql =
    s"""ka AS (
       |  SELECT id_a, CAST(sum(w) AS HUGEINT) AS aw,
       |    CAST(count(*) AS BIGINT) AS na
       |  FROM (SELECT id_a, id_b, w,
       |          row_number() OVER (PARTITION BY id_a ORDER BY w DESC, id_b) AS rn
       |        FROM pp) WHERE rn <= $MarginK GROUP BY 1),
       |kb AS (
       |  SELECT id_b, CAST(sum(w) AS HUGEINT) AS bw,
       |    CAST(count(*) AS BIGINT) AS nb
       |  FROM (SELECT id_a, id_b, w,
       |          row_number() OVER (PARTITION BY id_b ORDER BY w DESC, id_a) AS rn
       |        FROM pp) WHERE rn <= $MarginK GROUP BY 1),
       |best AS (
       |  SELECT id_a, id_b, w FROM (
       |    SELECT id_a, id_b, w,
       |      row_number() OVER (PARTITION BY id_a ORDER BY w DESC, id_b) AS rn
       |    FROM pp) WHERE rn = 1)
       |SELECT best.id_a, best.id_b, best.w,
       |  round(CAST(CAST(CAST(2 AS HUGEINT) * best.w * ka.na * kb.nb AS VARCHAR) AS DOUBLE)
       |        / CAST(CAST(ka.aw * kb.nb + kb.bw * ka.na AS VARCHAR) AS DOUBLE), 4)
       |    AS margin,
       |  round(CAST(CAST(CAST(2 AS HUGEINT) * best.w * ka.na * kb.nb AS VARCHAR) AS DOUBLE)
       |        / CAST(CAST(ka.aw * kb.nb + kb.bw * ka.na AS VARCHAR) AS DOUBLE), 4)
       |    >= 1.0 AS accepted
       |FROM best JOIN ka USING (id_a) JOIN kb USING (id_b)
       |ORDER BY best.id_a""".stripMargin

  /** The Spark twin of [[marginTailSql]]: filters to positive affinity,
    * then top-[[MarginK]] sums each side, best pair per id_a, and the
    * decimal-exact margin ratio — over a supplied (id_a, id_b, w)
    * candidate table. */
  private def marginFromPairs(p0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pp = p0
      .filter(col("w") > 0)
      .select("id_a", "id_b", "w")
      .localCheckpoint(true) // top-k sums + best-pair pass all read it
    val ka = pp.withColumn("rn", row_number().over(
        Window.partitionBy("id_a").orderBy(col("w").desc, col("id_b"))))
      .filter(col("rn") <= MarginK).groupBy("id_a")
      .agg(sum("w").as("aw"), count(lit(1)).cast("long").as("na"))
    val kb = pp.withColumn("rn", row_number().over(
        Window.partitionBy("id_b").orderBy(col("w").desc, col("id_a"))))
      .filter(col("rn") <= MarginK).groupBy("id_b")
      .agg(sum("w").as("bw"), count(lit(1)).cast("long").as("nb"))
    val best = pp.withColumn("rn", row_number().over(
        Window.partitionBy("id_a").orderBy(col("w").desc, col("id_b"))))
      .filter(col("rn") === 1).select("id_a", "id_b", "w")
    best.join(ka, "id_a").join(kb, "id_b")
      .withColumn("margin", round(
        expr("CAST(CAST(2 AS DECIMAL(38,0)) * w * na * nb AS DOUBLE)") /
          expr("CAST(CAST(aw AS DECIMAL(38,0)) * nb + CAST(bw AS DECIMAL(38,0)) * na AS DOUBLE)"),
        4))
      .withColumn("accepted", col("margin") >= 1.0)
      .select("id_a", "id_b", "w", "margin", "accepted")
      .orderBy("id_a")
  }

  val q203 = Q.sql("q203_margin_mining",
    s"""$crossBruteCtes,
       |pp AS MATERIALIZED (SELECT * FROM p WHERE w > 0),
       |$marginTailSql""".stripMargin) { (s, d) =>
    marginFromPairs(bruteCrossPairs(s, d))
  }

  /** The IVF-routed CROSS-SIDE candidate table shared by the routed
    * miners q279/q280 (q192/q270's routing, applied to the two-sided
    * problem): every vector ranks the [[IvfLists]] deterministic
    * centroids (first 8 by vec_id — the q139 pick) by integer qdot;
    * side-0 vectors PROBE their top-[[IvfProbes]] lists, side-1 vectors
    * sit in their ASSIGNED (top-1) list, and a pair is a candidate iff
    * the probe reaches the assignment — candidate volume
    * |A|·|B|·probes/lists instead of |A|·|B| (ScaleSpec pins the
    * fraction; at production scale nlist ∝ √N keeps per-list joins
    * flat, the q281 geometry). Routing is a pure per-row projection
    * (no join, no shuffle) and stays integer end to end, so the oracle
    * replays it exactly. Recall loses only pairs whose true match
    * lives in an unprobed list — the same trade q192/q270 price. */
  def routedCrossSideCandidates(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Exprs
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").as("xq"), (col("label") % 2).as("side"))
      .localCheckpoint(true)
    val cents = e.orderBy("vec_id").limit(IvfLists)
      .select(col("vec_id").as("cent_id"), col("xq").as("cq"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray)) // ≤8 rows — the q139 bounded collect
    val ranked = array(cents.map { case (cid, cv) =>
      struct(Exprs.qdot(col("xq"), typedlit(cv.toSeq)).as("w"),
        lit(-cid).as("negid"))
    }: _*)
    def listsOf(df: DataFrame, keep: Int): DataFrame = df
      .select(col("vec_id"),
        explode(slice(sort_array(ranked, asc = false), 1, keep)).as("c"))
      .select(col("vec_id"), (-col("c.negid")).as("lst"))
    val prb = listsOf(e.filter(col("side") === 0), IvfProbes)
    val asg = listsOf(e.filter(col("side") === 1), 1)
    prb.select(col("vec_id").as("id_a"), col("lst"))
      .join(asg.select(col("vec_id").as("id_b"), col("lst")), "lst")
      .select("id_a", "id_b").distinct()
  }

  /** Routed candidates scored: the (id_a, id_b, w) affinity triples the
    * miners consume, built from [[routedCrossSideCandidates]] instead
    * of the brute cross join — vectors join back by id (slim key
    * shuffles; embeddings never ride the candidate shuffle). */
  def routedCrossPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    routedCrossSideCandidates(s, d)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("xa")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("xb")), "id_b")
      .withColumn("w", graft.functions.Exprs.qdot(col("xa"), col("xb")))
      .select("id_a", "id_b", "w")
  }

  /** The routed-candidate CTE head q279/q280 share: q192's centroid
    * ranking CTEs restricted per side, then the candidate pairs scored
    * — byte-for-byte the contract [[routedCrossSideCandidates]] +
    * [[routedCrossPairs]] execute. */
  private val crossRoutedCtes =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    label % 2 AS side
       |  FROM embeddings),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, xq AS cq FROM e ORDER BY vec_id LIMIT $IvfLists),
       |ac AS MATERIALIZED (
       |  SELECT e.vec_id, e.side, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |        (x, y) -> x + y) DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN cents c),
       |prb AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn <= $IvfProbes AND side = 0),
       |asg AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn = 1 AND side = 1),
       |cand AS (SELECT DISTINCT pr.vec_id AS id_a, a.vec_id AS id_b
       |         FROM prb pr JOIN asg a ON pr.lst = a.lst),
       |p AS MATERIALIZED (
       |  SELECT c.id_a, c.id_b,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(ea.xq, eb.xq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w
       |  FROM cand c JOIN e ea ON ea.vec_id = c.id_a
       |              JOIN e eb ON eb.vec_id = c.id_b)""".stripMargin

  /** The SCALE twin of q179 (round-12 verdict item #1): the identical
    * mutual-NN ranker — [[mutualFromPairs]], the very function q179
    * runs — fed the IVF-routed candidate stream instead of the brute
    * cross join. A pair can only be mutual if it is a candidate, so
    * routing trades recall (a side-0 vector whose true match sits in
    * an unprobed list mines nothing) for the sub-quadratic candidate
    * volume ScaleSpec pins; precision semantics are unchanged. */
  val q279 = Q.sql("q279_mutual_nn_ivf",
    s"""$crossRoutedCtes,
       |$mutualTailSql""".stripMargin) { (s, d) =>
    mutualFromPairs(routedCrossPairs(s, d))
  }

  /** The SCALE twin of q203 (round-12 verdict item #1): the identical
    * margin ranker — [[marginFromPairs]] — over the routed candidate
    * stream. Note the top-[[MarginK]] normalizer sums now run over
    * ROUTED affinities (na/nb can shrink where routing prunes a hub's
    * pair list), exactly how CCMatrix computes margins inside its own
    * ANN candidate graph — the margin is a property of the mined
    * graph, not of the brute one it replaced. */
  val q280 = Q.sql("q280_margin_mining_ivf",
    s"""$crossRoutedCtes,
       |pp AS MATERIALIZED (SELECT * FROM p WHERE w > 0),
       |$marginTailSql""".stripMargin) { (s, d) =>
    marginFromPairs(routedCrossPairs(s, d))
  }

  /** [[routedCrossSideCandidates]] with the DERIVED list count
    * ([[Similarity.autoNlist]] — the q281/q285 formula) and the
    * constant-codegen-size HOF assignment: candidate volume
    * ~|A|·probes·√N-per-list instead of the pinned-8 fraction, the
    * form whose per-list join stays flat at any corpus size. */
  def routedCrossSideCandidatesAuto(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").as("xq"), (col("label") % 2).as("side"))
      .localCheckpoint(true)
    val nl = Similarity.autoNlist(e.count())
    val cents = e.orderBy("vec_id").limit(nl)
      .select(col("vec_id").as("cent_id"), col("xq").as("cq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .sortBy(_._1).toVector // capped by AUTO_NLIST_CAP — bounded collect
    val prb = qdotAssignHof(
      e.filter(col("side") === 0).select(col("vec_id"), col("xq")), cents, IvfProbes)
    val asg = qdotAssignHof(
      e.filter(col("side") === 1).select(col("vec_id"), col("xq")), cents, 1)
    prb.select(col("vec_id").as("id_a"), col("lst"))
      .join(asg.select(col("vec_id").as("id_b"), col("lst")), "lst")
      .select("id_a", "id_b").distinct()
  }

  /** The auto-geometry routed pair triples for q286/q287. */
  def routedCrossPairsAuto(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    routedCrossSideCandidatesAuto(s, d)
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("xa")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("xb")), "id_b")
      .withColumn("w", graft.functions.Exprs.qdot(col("xa"), col("xb")))
      .select("id_a", "id_b", "w")
  }

  /** q279/q280's routed CTE head with the list count DERIVED from
    * count(*) — the q281/q285 oracle spelling applied to the
    * cross-side problem. */
  private val crossRoutedAutoCtes =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    label % 2 AS side
       |  FROM embeddings),
       |nl AS (SELECT least(${Similarity.AUTO_NLIST_CAP},
       |         greatest(${Similarity.IVF_LISTS},
       |           CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS nlists
       |       FROM e),
       |cents AS MATERIALIZED (
       |  SELECT cent_id, cq FROM (
       |    SELECT vec_id AS cent_id, xq AS cq,
       |      row_number() OVER (ORDER BY vec_id) AS rn FROM e) t
       |  CROSS JOIN nl WHERE t.rn <= nl.nlists),
       |ac AS MATERIALIZED (
       |  SELECT e.vec_id, e.side, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |        (x, y) -> x + y) DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN cents c),
       |prb AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn <= $IvfProbes AND side = 0),
       |asg AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn = 1 AND side = 1),
       |cand AS (SELECT DISTINCT pr.vec_id AS id_a, a.vec_id AS id_b
       |         FROM prb pr JOIN asg a ON pr.lst = a.lst),
       |p AS MATERIALIZED (
       |  SELECT c.id_a, c.id_b,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(ea.xq, eb.xq), q -> q[1] * q[2])),
       |      (x, y) -> x + y) AS w
       |  FROM cand c JOIN e ea ON ea.vec_id = c.id_a
       |              JOIN e eb ON eb.vec_id = c.id_b)""".stripMargin

  /** q279 with DERIVED geometry (removing the twins' last pinned
    * constant — SCALING_r13's residual note): the identical
    * [[mutualFromPairs]] ranker over auto-sized routing. */
  val q286 = Q.sql("q286_mutual_nn_autonlist",
    s"""$crossRoutedAutoCtes,
       |$mutualTailSql""".stripMargin) { (s, d) =>
    mutualFromPairs(routedCrossPairsAuto(s, d))
  }

  /** q280 with DERIVED geometry — the identical [[marginFromPairs]]
    * ranker over auto-sized routing. */
  val q287 = Q.sql("q287_margin_mining_autonlist",
    s"""$crossRoutedAutoCtes,
       |pp AS MATERIALIZED (SELECT * FROM p WHERE w > 0),
       |$marginTailSql""".stripMargin) { (s, d) =>
    marginFromPairs(routedCrossPairsAuto(s, d))
  }

  /** k-NN majority-vote classification — the zero-training classifier
    * a labeled embedding store serves (and the evaluation q178's
    * propagation is usually compared against): vectors with
    * vec_id % [[KnnHoldout]] = 0 play the unlabeled holdout, their
    * top-[[KnnK]] labeled neighbors by integer qdot vote, majority
    * wins with ties to the smallest label. The TRUE label rides along,
    * so the output doubles as the accuracy table. Brute pair table as
    * the oracle anchor (q30's precedent) — production swaps in the
    * routed candidate generators. */
  val KnnHoldout = 25
  val KnnK = 5

  val q224 = Q.sql("q224_knn_classify",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, xq AS qx, label AS true_label
       |      FROM e WHERE vec_id % $KnnHoldout = 0),
       |nn AS (
       |  SELECT qid, true_label, label FROM (
       |    SELECT q.qid, q.true_label, e.label,
       |      row_number() OVER (PARTITION BY q.qid ORDER BY
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(list_zip(q.qx, e.xq), z -> z[1] * z[2])),
       |          (x, y) -> x + y) DESC, e.vec_id) AS rn
       |    FROM q JOIN e ON e.vec_id % $KnnHoldout <> 0)
       |  WHERE rn <= $KnnK),
       |v AS (
       |  SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS votes
       |  FROM nn GROUP BY 1, 2, 3)
       |SELECT qid AS vec_id, label AS pred_label, votes, true_label,
       |  label = true_label AS correct
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY votes DESC, label) AS vr FROM v)
       |WHERE vr = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"))
    val q = e.filter(col("vec_id") % KnnHoldout === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qx"),
        col("label").as("true_label"))
    val nn = q.join(broadcast(e.filter(col("vec_id") % KnnHoldout =!= 0)), lit(true))
      .withColumn("w", graft.functions.Exprs.qdot(col("qx"), col("embedding")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("w").desc, col("vec_id"))))
      .filter(col("rn") <= KnnK)
      .select("qid", "true_label", "label")
    nn.groupBy("qid", "true_label", "label")
      .agg(count(lit(1)).cast("long").as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .select(col("qid").as("vec_id"), col("label").as("pred_label"),
        col("votes"), col("true_label"),
        (col("label") === col("true_label")).as("correct"))
      .orderBy("vec_id")
  }

  /** Per-class confusion readout of the k-NN classifier — the table a
    * model card publishes under q246's calibration: for every label
    * appearing as truth or prediction in q224's holdout, exact
    * tp/fp/fn counts and precision / recall / F1 — three
    * finite-decimal-capable integer ratios, rounded half-up in
    * integers (F1 = 2tp/(2tp+fp+fn) is ONE rational, not a float
    * composition). A class never predicted reads precision NULL on
    * both engines rather than a fake 0. Classes-sized output — free
    * after the nested classifier. */
  val q266 = Q.sql("q266_confusion_matrix",
    s"""WITH base AS (SELECT * FROM (${q224.oracle.get}) b),
       |cls AS (
       |  SELECT DISTINCT label FROM (
       |    SELECT true_label AS label FROM base
       |    UNION ALL SELECT pred_label FROM base)),
       |m AS (
       |  SELECT cls.label,
       |    CAST(sum(CASE WHEN b.pred_label = cls.label
       |      AND b.true_label = cls.label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS tp,
       |    CAST(sum(CASE WHEN b.pred_label = cls.label
       |      AND b.true_label <> cls.label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS fp,
       |    CAST(sum(CASE WHEN b.true_label = cls.label
       |      AND b.pred_label <> cls.label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS fn
       |  FROM cls CROSS JOIN base b GROUP BY 1)
       |SELECT label, tp, fp, fn,
       |  CAST((tp * 20000 + (tp + fp)) // (2 * nullif(tp + fp, 0))
       |       AS DOUBLE) / 10000.0 AS precision,
       |  CAST((tp * 20000 + (tp + fn)) // (2 * nullif(tp + fn, 0))
       |       AS DOUBLE) / 10000.0 AS recall,
       |  CAST((2 * tp * 20000 + (2 * tp + fp + fn))
       |       // (2 * nullif(2 * tp + fp + fn, 0)) AS DOUBLE) / 10000.0
       |    AS f1
       |FROM m ORDER BY label""".stripMargin) { (s, d) =>
    val base = q224.fn(s, d).localCheckpoint(true) // class list + cells
    val cls = base.select(col("true_label").as("label"))
      .unionByName(base.select(col("pred_label").as("label")))
      .distinct()
    cls.crossJoin(broadcast(base))
      .groupBy("label")
      .agg(
        sum(when(col("pred_label") === col("label")
          && col("true_label") === col("label"), 1L).otherwise(0L))
          .cast("long").as("tp"),
        sum(when(col("pred_label") === col("label")
          && col("true_label") =!= col("label"), 1L).otherwise(0L))
          .cast("long").as("fp"),
        sum(when(col("true_label") === col("label")
          && col("pred_label") =!= col("label"), 1L).otherwise(0L))
          .cast("long").as("fn"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        // nullif guards: a class never predicted must read NULL, and
        // Spark's ANSI div ERRORS on a zero divisor instead of NULLing
        (expr("CAST((tp * 20000 + (tp + fp)) div (2 * nullif(tp + fp, 0))"
          + " AS DOUBLE)") / 10000.0).as("precision"),
        (expr("CAST((tp * 20000 + (tp + fn)) div (2 * nullif(tp + fn, 0))"
          + " AS DOUBLE)") / 10000.0).as("recall"),
        (expr("CAST((2 * tp * 20000 + (2 * tp + fp + fn))"
          + " div (2 * nullif(2 * tp + fp + fn, 0)) AS DOUBLE)")
          / 10000.0).as("f1"))
      .orderBy("label")
  }

  /** The IVF-routed candidate table for [[q270]]: holdout queries probe
    * their top-[[IvfProbes]] of [[IvfLists]] coarse lists and meet only
    * the labeled vectors ASSIGNED to those lists — candidate volume
    * |q|·|db|·probes/lists instead of |q|·|db| (ScaleSpec pins the
    * fraction). Routing is q192's: centroids are the first 8 vectors by
    * vec_id (the q139 deterministic pick), rankings are the integer
    * qdot, and filter-then-rank ≡ rank-then-filter because each
    * vector's centroid ranking is independent of the rest. */
  def routedKnnCandidates(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Exprs
    val e = quantized(s, d).localCheckpoint(true)
    val cents = e.orderBy("vec_id").limit(IvfLists)
      .select(col("vec_id").as("cent_id"), col("xq").as("cq"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray)) // ≤8 rows — the q139 bounded collect
    val ranked = array(cents.map { case (cid, cv) =>
      struct(Exprs.qdot(col("xq"), typedlit(cv.toSeq)).as("w"),
        lit(-cid).as("negid"))
    }: _*)
    def listsOf(df: DataFrame, keep: Int): DataFrame = df
      .select(col("vec_id"),
        explode(slice(sort_array(ranked, asc = false), 1, keep)).as("c"))
      .select(col("vec_id"), (-col("c.negid")).as("lst"))
    val prb = listsOf(e.filter(col("vec_id") % KnnHoldout === 0), IvfProbes)
    val asg = listsOf(e.filter(col("vec_id") % KnnHoldout =!= 0), 1)
    prb.select(col("vec_id").as("qid"), col("lst"))
      .join(asg.select(col("vec_id").as("nb"), col("lst")), "lst")
      .select("qid", "nb").distinct()
  }

  /** The SCALE twin of q224 (the q178→q192 discipline, applied to the
    * classifier): identical majority-vote math, sub-quadratic candidate
    * generation via [[routedKnnCandidates]]. The vote sees only routed
    * candidates, so a query whose true neighbors live in unprobed lists
    * votes from the next-best co-listed ones — the recall-for-cost
    * trade every IVF serving stage makes, and exactly what q245's
    * recall curve prices. Output schema matches q224 so q266's
    * confusion math drops on top unchanged. */
  val q270 = Q.sql("q270_knn_classify_ivf",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq,
       |    CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cent_id, xq AS cq FROM e ORDER BY vec_id LIMIT $IvfLists),
       |ac AS MATERIALIZED (
       |  SELECT e.vec_id, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_zip(e.xq, c.cq), q -> q[1] * q[2])),
       |        (x, y) -> x + y) DESC, c.cent_id) AS rn
       |  FROM e CROSS JOIN cents c),
       |prb AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn <= $IvfProbes AND vec_id % $KnnHoldout = 0),
       |asg AS (SELECT vec_id, cent_id AS lst FROM ac
       |        WHERE rn = 1 AND vec_id % $KnnHoldout <> 0),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS qid, a.vec_id AS nb
       |  FROM prb p JOIN asg a ON p.lst = a.lst),
       |nn AS (
       |  SELECT qid, true_label, label FROM (
       |    SELECT c.qid, q.label AS true_label, d.label AS label,
       |      row_number() OVER (PARTITION BY c.qid ORDER BY
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(list_zip(q.xq, d.xq), z -> z[1] * z[2])),
       |          (x, y) -> x + y) DESC, c.nb) AS rn
       |    FROM cand c JOIN e q ON q.vec_id = c.qid
       |                JOIN e d ON d.vec_id = c.nb)
       |  WHERE rn <= $KnnK),
       |v AS (
       |  SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS votes
       |  FROM nn GROUP BY 1, 2, 3)
       |SELECT qid AS vec_id, label AS pred_label, votes, true_label,
       |  label = true_label AS correct
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY votes DESC, label) AS vr FROM v)
       |WHERE vr = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = quantized(s, d)
    val nn = routedKnnCandidates(s, d)
      .join(e.select(col("vec_id").as("qid"), col("xq").as("qx"),
        col("label").as("true_label")), "qid")
      .join(e.select(col("vec_id").as("nb"), col("xq").as("nx"),
        col("label").as("label")), "nb")
      .withColumn("w", graft.functions.Exprs.qdot(col("qx"), col("nx")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("w").desc, col("nb"))))
      .filter(col("rn") <= KnnK)
      .select("qid", "true_label", "label")
    nn.groupBy("qid", "true_label", "label")
      .agg(count(lit(1)).cast("long").as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .select(col("qid").as("vec_id"), col("label").as("pred_label"),
        col("votes"), col("true_label"),
        (col("label") === col("true_label")).as("correct"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(q178, q179, q192, q203, q224, q266, q270, q279, q280, q285, q286, q287)
}
