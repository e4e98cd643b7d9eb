package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable sketch aggregates. Spark ships HLL++ (`approx_count_distinct`)
  * and t-digest-style percentiles (`approx_percentile`) natively — those
  * are spec-checked elsewhere — but has no heavy-hitters sketch, so this
  * module adds SpaceSaving (Metwally et al., ICDT'05) as a typed
  * `Aggregator`: the 100 TB primitive for "which keys are hot" (skew
  * detection before salting, hot-domain discovery, top-K dashboards)
  * without an exact full-cardinality groupBy.
  *
  * Guarantees: the error envelope true ≤ est ≤ true + N/k holds
  * inductively under Spark's partial-aggregate merge tree (each merge
  * substitutes the absent side's min counter, which both upper-bounds
  * the untracked true count and is itself ≤ N_side/k — Agarwal et al.'s
  * mergeable-summaries argument). Presence of every item above N/k is
  * exact for a single-stream sketch; under merging the adversarial
  * presence threshold loosens toward 2N/k, so deployments size k a few
  * × above the target rank. Merge order across partitions may reorder
  * ties — the envelope, not exact counter values, is the contract
  * (EngineSpec pins envelope AND presence at N/k on a skewed
  * multi-partition stream).
  */
object Sketches {

  /** One sketch counter: estimated count and its max overestimate. */
  case class Heavy(item: Long, count: Long, err: Long)

  /** SpaceSaving over Long keys with capacity `k`. The buffer is a plain
    * Map encoded with the product encoder — at k ≤ a few thousand the
    * shuffled partial state is KBs. */
  class SpaceSaving(k: Int)
      extends Aggregator[Long, Map[Long, (Long, Long)], Seq[Heavy]] {

    override def zero: Map[Long, (Long, Long)] = Map.empty

    override def reduce(b: Map[Long, (Long, Long)], item: Long): Map[Long, (Long, Long)] =
      b.get(item) match {
        case Some((c, e)) => b.updated(item, (c + 1, e))
        case None if b.size < k => b.updated(item, (1L, 0L))
        case None =>
          // evict the min counter; the newcomer inherits its count as
          // overestimate (the SpaceSaving step)
          val (minItem, (minC, _)) = b.minBy { case (i, (c, _)) => (c, i) }
          (b - minItem).updated(item, (minC + 1, minC))
      }

    override def merge(a: Map[Long, (Long, Long)], b: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // mergeable-summaries merge: an item absent from a full sketch has
      // a count bounded by that sketch's min counter — add it as slack
      val minA = if (a.size < k) 0L else a.values.map(_._1).min
      val minB = if (b.size < k) 0L else b.values.map(_._1).min
      val merged = (a.keySet ++ b.keySet).iterator.map { i =>
        val (ca, ea) = a.getOrElse(i, (minA, minA))
        val (cb, eb) = b.getOrElse(i, (minB, minB))
        i -> (ca + cb, ea + eb)
      }.toMap
      if (merged.size <= k) merged
      else merged.toSeq
        .sortBy { case (i, (c, _)) => (-c, i) }
        .take(k).toMap
    }

    override def finish(b: Map[Long, (Long, Long)]): Seq[Heavy] =
      b.toSeq.map { case (i, (c, e)) => Heavy(i, c, e) }
        .sortBy(h => (-h.count, h.item))

    override def bufferEncoder: Encoder[Map[Long, (Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, (Long, Long)]]()

    override def outputEncoder: Encoder[Seq[Heavy]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Heavy]]()
  }

  /** Top heavy hitters of a Long column: one distributed pass, partial
    * sketches merged map-side like any aggregate, final top-`top` rows. */
  def heavyHitters(spark: SparkSession, items: DataFrame, col0: String,
      k: Int, top: Int): DataFrame = {
    import spark.implicits._
    val agg = new SpaceSaving(k).toColumn
    val sk = items.select(col(col0).cast("long").as("v"))
      .filter(col("v").isNotNull) // nulls (or uncastable keys) would kill
      .as[Long]                   // the primitive-Long encoder at runtime
      .select(agg.name("sk")).as[Seq[Heavy]].head()
    spark.createDataset(sk.take(top)).toDF("item", "count", "err")
  }

  /** KMV output: kept-hash count (= min(k, distinct)), the k-th minimum
    * hash, and the distinct-count estimate. */
  case class KmvSummary(n_kept: Long, kth_hash: Long, est: Long)

  /** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002 /
    * Beyer et al. SIGMOD'07): keep the k smallest DISTINCT hash values
    * seen; if fewer than k survive, the count is exact, else estimate
    * (k−1)·M/h₍k₎ for hashes uniform on [0, M). Fixed k·8-byte state,
    * trivially mergeable (union, re-take k smallest) — so it rides
    * Spark's partial-aggregation tree like any sum, where an exact
    * `countDistinct` must shuffle every distinct value.
    *
    * Spark ships HLL++ for this job; KMV's reason to exist here is that
    * its state is REPLAYABLE: fed with the oracle-replayable poly-131
    * hash, DuckDB recomputes every register and the gate pins the
    * sketch bit-for-bit (estimate floored — floor is engine-portable
    * where round's half-case is not). HLL's estimate can only ever be
    * band-checked. Input is the already-hashed column; nulls must be
    * filtered upstream. The sketch uniformizes its input internally
    * ([[Kmv.mix]]) — callers feed raw poly hashes.
    */
  class Kmv(k: Int) extends Aggregator[Long, Seq[Long], KmvSummary] {
    /** Largest hash value + 1 (poly-131 is mod 2^61−1). */
    val M: Double = Kmv.M.toDouble

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], hRaw: Long): Seq[Long] = Kmv.add(b, hRaw, k)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = Kmv.mrg(a, b, k)

    override def finish(b: Seq[Long]): KmvSummary = {
      val n = b.size.toLong
      val kth = if (b.isEmpty) -1L else b.last
      val est =
        if (n < k) n
        else math.floor((k - 1).toDouble * M / kth.toDouble).toLong
      KmvSummary(n, kth, est)
    }

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[KmvSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvSummary]()
  }

  object Kmv {
    /** Hash modulus (poly-131's 2^61-1) and the uniformizing multiplier.
      * Poly-131 of a SHORT string is far below M (5 ASCII chars reach
      * only ~2^35), so raw hashes are not uniform on [0, M) and the
      * order statistics KMV relies on would be nonsense. One modular
      * multiply by a fixed 61-bit constant (Knuth's MMIX multiplier mod
      * M) is a bijection on [0, M) that spreads any input range across
      * the full modulus, and DuckDB replays it as a single HUGEINT
      * `h * G % M`. */
    val M: Long = 2305843009213693951L
    val G: Long = 1752450205419405103L // 6364136223846793005 mod M

    /** a · G mod M ([[graft.functions.TextKernels.mulMod61]]). */
    def mix(a: Long): Long = graft.functions.TextKernels.mulMod61(a, G)

    /** Insert one raw hash into a sorted k-min buffer. The saturated
      * no-op (h ≥ current k-th min — the overwhelming majority of a
      * long stream) is decided by one comparison before the O(k)
      * duplicate scan: h == last is a kept duplicate, h > last is
      * either too large or an already-evicted duplicate — no-ops all. */
    def add(b: Seq[Long], hRaw: Long, k: Int): Seq[Long] = {
      val h = mix(hRaw)
      if (b.size == k && h >= b.last) b
      else if (b.contains(h)) b
      else if (b.size < k) (b :+ h).sorted
      else (b.init :+ h).sorted
    }

    /** Union two sorted k-min buffers, re-take the k smallest. */
    def mrg(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
  }

  /** The KMV sketch finishing to its k-min SET instead of a summary —
    * the form sketch ALGEBRA needs: two sets union into the sketch of
    * the union stream (associative, order-free), and the min-k
    * intersection estimator reads membership straight off them. Native
    * array expressions (`array_union`/`array_intersect`/`slice`) do the
    * downstream algebra inside codegen — no UDF in the combining path. */
  class KmvSet(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], hRaw: Long): Seq[Long] = Kmv.add(b, hRaw, k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = Kmv.mrg(a, b, k)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group distinct users via a k=64 KMV over poly-131 hashes.
    * sf0.001 has ~15 distinct users (exact path, n_kept < k), sf0.01+
    * have 150+ (estimation path) — the gate exercises both branches
    * across scale factors. DuckDB replays the hash, the k-min set, and
    * the floored estimator. */
  val q103 = Q.sql("q103_kmv_distinct",
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS h
      |  FROM (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
      |        FROM events WHERE user_id IS NOT NULL)),
      |rk AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |k AS (
      |  SELECT event_type, count(*) AS n_kept, max(h) AS kth_hash
      |  FROM rk WHERE rn <= 64 GROUP BY 1)
      |SELECT event_type, n_kept, kth_hash,
      |  CASE WHEN n_kept < 64 THEN n_kept
      |       ELSE CAST(floor(CAST(63 AS DOUBLE)
      |         * CAST(2305843009213693951 AS DOUBLE)
      |         / CAST(kth_hash AS DOUBLE)) AS BIGINT) END AS est
      |FROM k ORDER BY event_type""".stripMargin) { (s, d) =>
    val kmv = udaf(new Kmv(64), Encoders.scalaLong)
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.functions.Exprs.poly_hash(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(kmv(col("h")).as("sk"))
      .select(col("event_type"), col("sk.n_kept").as("n_kept"),
        col("sk.kth_hash").as("kth_hash"), col("sk.est").as("est"))
      .orderBy("event_type")
  }

  /** Sketch-algebra gate: pairwise union/intersection distinct-count
    * estimates across the per-event-type KMV sketches — the "how many
    * distinct users did types A and B reach together / share" question
    * answered from 5 fixed-size sketches instead of a 10-way re-scan of
    * the raw stream. Union sketch = k smallest of the merged k-min
    * sets (exactly the sketch the union stream would have produced);
    * intersection via the min-k estimator |A∩B| ≈ ρ·|A∪B| with
    * ρ = |K(A)∩K(B)∩K(A∪B)|/|K(A∪B)| (Beyer et al. SIGMOD'07), kept in
    * integer arithmetic. sf0.001 (15 users) exercises the exact branch,
    * sf0.01+ (150+) the estimation branch. */
  val q113 = Q.sql("q113_kmv_setops",
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS h
      |  FROM (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
      |        FROM events WHERE user_id IS NOT NULL)),
      |rk AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h),
      |s AS (SELECT event_type, list(h ORDER BY h) AS s
      |      FROM rk WHERE rn <= 64 GROUP BY 1),
      |p AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b,
      |    (list_sort(list_distinct(list_concat(x.s, y.s))))[1:64] AS u,
      |    list_intersect(x.s, y.s) AS xy
      |  FROM s x JOIN s y ON x.event_type < y.event_type),
      |c AS (
      |  SELECT type_a, type_b,
      |    CAST(len(u) AS BIGINT) AS n_union_kept,
      |    u[len(u)] AS kth_union,
      |    CAST(len(list_intersect(xy, u)) AS BIGINT) AS n_inter
      |  FROM p),
      |e AS (
      |  SELECT *, CASE WHEN n_union_kept < 64 THEN n_union_kept
      |    ELSE CAST(floor(CAST(63 AS DOUBLE)
      |      * CAST(2305843009213693951 AS DOUBLE)
      |      / CAST(kth_union AS DOUBLE)) AS BIGINT) END AS est_union
      |  FROM c)
      |SELECT type_a, type_b, n_union_kept, kth_union, est_union, n_inter,
      |  (n_inter * est_union) // n_union_kept AS est_inter
      |FROM e ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    val k = 64
    val kmvset = udaf(new KmvSet(k), Encoders.scalaLong)
    val sk = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.functions.Exprs.poly_hash(col("user_id").cast("string")).as("h"))
      .groupBy("event_type").agg(kmvset(col("h")).as("s"))
    val x = sk.select(col("event_type").as("type_a"), col("s").as("sa"))
    val y = sk.select(col("event_type").as("type_b"), col("s").as("sb"))
    val u = slice(array_sort(array_union(col("sa"), col("sb"))), 1, k)
    val pairs = x.join(y, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("sa"), col("sb"), u.as("u"))
      .select(col("type_a"), col("type_b"),
        size(col("u")).cast("long").as("n_union_kept"),
        element_at(col("u"), size(col("u"))).as("kth_union"),
        size(array_intersect(array_intersect(col("sa"), col("sb")), col("u")))
          .cast("long").as("n_inter"))
    pairs
      .withColumn("est_union",
        when(col("n_union_kept") < k, col("n_union_kept"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(Kmv.M.toDouble)
            / col("kth_union").cast("double")).cast("long")))
      .withColumn("est_inter", expr("(n_inter * est_union) div n_union_kept"))
      .select("type_a", "type_b", "n_union_kept", "kth_union", "est_union",
        "n_inter", "est_inter")
      .orderBy("type_a", "type_b")
  }

  /** Count-Min sketch parameters: depth×width register grid and the
    * per-row multipliers. Row hash i of a poly-131 key h is
    * `(h·Gᵢ mod 2^61−1) mod width` — M is prime so each multiply is a
    * bijection, giving `depth` pairwise-unrelated row hashes from ONE
    * base hash, and DuckDB replays every register with HUGEINT
    * arithmetic. Width 256 × depth 4 = 8 KiB of state. */
  object Cms {
    val Width = 256
    val Depth = 4
    // splitmix64 / murmur finalizer constants reduced mod 2^61−1
    val Gs: Array[Long] = Array(2177342782468422681L, 2258633747088074174L,
      1499779743744070127L, 1650849331375898009L)
    def cell(h: Long, i: Int): Int =
      (graft.functions.TextKernels.mulMod61(h, Gs(i)) % Width).toInt
  }

  /** Count-Min sketch (Cormode & Muthukrishnan '05) over already-hashed
    * keys: `depth` rows of `width` counters, each row incrementing one
    * cell per item; a key's count estimate is the MIN over its `depth`
    * cells, always ≥ the true count. Fixed-size state merged by
    * element-wise sum — rides Spark's partial-aggregation tree, the
    * constant-memory answer to per-key counts when the key domain is
    * too wide to groupBy (the 100 TB regime: frequency estimates over
    * billions of URLs/shingles in one pass, no shuffle of the keys
    * themselves). Like [[Kmv]], its reason to exist next to Spark's
    * built-ins is REPLAYABILITY: the poly-131 + mulmod hash family lets
    * the DuckDB oracle recompute all depth×width registers exactly. */
  class CountMin extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Cms.Depth * Cms.Width)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < Cms.Depth) { b(i * Cms.Width + Cms.cell(h, i)) += 1; i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** CMS point-query gate: sketch all event user_ids in one distributed
    * pass, then report every distinct user's exact count next to its
    * sketch estimate (`over` = est − exact ≥ 0 always, = 0 unless that
    * user collides in all 4 rows). The 8 KiB register array is
    * collect()ed — a constant-size driver ceiling like the lookup
    * fixtures — and re-enters the point-query scan as an array literal,
    * so the probe stays codegen with zero extra shuffle. DuckDB rebuilds
    * the registers from the grouped exact counts and takes the same min. */
  val q104 = Q.sql("q104_countmin",
    """WITH k AS (
      |  SELECT user_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h,
      |    cnt
      |  FROM (SELECT user_id, CAST(user_id AS VARCHAR) AS u,
      |               count(*) AS cnt
      |        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)),
      |d AS (SELECT * FROM (VALUES
      |  (0, 2177342782468422681), (1, 2258633747088074174),
      |  (2, 1499779743744070127), (3, 1650849331375898009)) t(i, g)),
      |c AS (
      |  SELECT user_id, cnt, i,
      |    CAST(CAST(h AS HUGEINT) * CAST(g AS HUGEINT)
      |         % 2305843009213693951 % 256 AS BIGINT) AS cell
      |  FROM k CROSS JOIN d),
      |r AS (SELECT i, cell, CAST(sum(cnt) AS BIGINT) AS reg
      |      FROM c GROUP BY 1, 2)
      |SELECT c.user_id, max(c.cnt) AS exact, min(r.reg) AS est,
      |       min(r.reg) - max(c.cnt) AS over
      |FROM c JOIN r USING (i, cell)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.functions.Exprs.{mulmod61, poly_hash}
    val cms = udaf(new CountMin, Encoders.scalaLong)
    val hashed = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        poly_hash(col("user_id").cast("string")).as("h"))
    // constant 8 KiB sketch → driver → array literal (bounded collect)
    val regs = hashed.agg(cms(col("h")).as("regs")).head().getSeq[Long](0)
    val regLit = lit(regs.toArray)
    val estCol = least((0 until Cms.Depth).map { i =>
      element_at(regLit,
        (lit(i * Cms.Width) +
          pmod(mulmod61(col("h"), Cms.Gs(i)), lit(Cms.Width.toLong)) +
          lit(1)).cast("int"))
    }: _*)
    hashed.groupBy("user_id", "h").agg(count(lit(1)).as("exact"))
      .select(col("user_id"), col("exact"), estCol.as("est"),
        (estCol - col("exact")).as("over"))
      .orderBy("user_id")
  }

  /** Binned-histogram quantiles — the quantile member of the sketch
    * family (distinct = KMV, frequency = CMS, heavy hitters =
    * SpaceSaving): fixed-width value bins, so per-group state is a
    * bounded integer histogram that merges by bin-count addition and
    * rides partial aggregation like any sum; the q-quantile estimate is
    * the lower edge of the first bin whose cumulative count reaches
    * ⌈q·N⌉, off by at most one bin width. Spark's own
    * `approx_percentile` (t-digest-style) estimates tighter but its
    * clusters are order-sensitive and unreplayable; the histogram's
    * integer registers let the oracle pin every count and every edge.
    * Error budget is the bin width — size it from the known value range
    * as here, or log-scale the bins when the range spans decades. */
  val q114 = Q.sql("q114_binned_quantiles",
    """WITH h AS (
      |  SELECT event_type, CAST(floor(value / 4.0) AS BIGINT) AS bin,
      |         count(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, bin, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |    sum(c) OVER (PARTITION BY event_type) AS total
      |  FROM h)
      |SELECT event_type, CAST(max(total) AS BIGINT) AS n,
      |  min(CASE WHEN cum >= ceil(0.50 * total) THEN bin END) * 4.0 AS p50_edge,
      |  min(CASE WHEN cum >= ceil(0.95 * total) THEN bin END) * 4.0 AS p95_edge,
      |  min(CASE WHEN cum >= ceil(0.99 * total) THEN bin END) * 4.0 AS p99_edge
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        floor(col("value") / 4.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type")
    val cum = hist
      .withColumn("cum", sum("c").over(byType.orderBy("bin")))
      .withColumn("total", sum("c").over(byType))
    def edge(q: Double) =
      min(when(col("cum") >= ceil(lit(q) * col("total")), col("bin"))) * 4.0
    cum.groupBy("event_type")
      .agg(max("total").as("n"),
        edge(0.50).as("p50_edge"),
        edge(0.95).as("p95_edge"),
        edge(0.99).as("p99_edge"))
      .orderBy("event_type")
  }

  /** Heavy-hitters gate. Sized EXACT on purpose: with k ≥ the distinct
    * key count (events has 1500 user_ids at sf0.1, k = 2048) no counter
    * is ever evicted, every partial sketch is an exact per-partition
    * count map, merges are exact sums with zero slack — so the sketch
    * provably equals GROUP BY count and DuckDB oracles it. The
    * approximate regime (k ≪ distinct, merge-order-dependent counters)
    * is EngineSpec's ε-N envelope spec, which this gate deliberately
    * does not re-test. */
  val q91 = Q.sql("q91_heavy_hitters",
    """SELECT user_id AS item, count(*) AS count, CAST(0 AS BIGINT) AS err
      |FROM events GROUP BY 1
      |ORDER BY count DESC, item LIMIT 10""".stripMargin) { (s, d) =>
    heavyHitters(s, Tables.events(s, d), "user_id", k = 2048, top = 10)
      .orderBy(col("count").desc, col("item"))
  }

  /** HyperLogLog distinct-count sketch (Flajolet et al. '07) as plain
    * declarative Spark — no custom Aggregator: the sketch IS a 64-cell
    * grid of `max(rho)` registers, so `groupBy(key, bucket).agg(max)`
    * gives mergeability, partial aggregation, and spill-safety from the
    * engine for free. Register: bucket = low 6 hash bits, rho = 1 +
    * LEADING zeros of the remaining 55-bit field, i.e. 56 − bitlen(w)
    * (0 for an empty bucket, 56 when the field is all zero) — computed
    * integer-exactly as length(bin(w)) on both engines. High bits, not
    * trailing: the poly·G multiplicative family mixes its high bits
    * much better than its low ones (trailing-zero rho measured 40%
    * biased on sequential key sets; leading-zero rho sits inside the
    * 1.04/√m envelope — see WebPipelineSpec). Estimate = the raw-HLL harmonic
    * mean α₆₄·m²/Σ2^(−ρ), computed via the all-integer S = Σ2^(56−ρ)
    * (fits: ≤ 64·2^56 = 2^62) and one IEEE double division — the same
    * cross-engine-exact pattern as q103's KMV estimate. The
    * small-range linear-counting correction is a driver-side concern
    * (the raw estimate is what the registers determine); Spark's own
    * approx_count_distinct is the production shortcut but its HLL++
    * registers are unreplayable — these 8 B/bucket registers the
    * oracle pins one by one.
    *
    * Emits the full m-row register grid per key (empty buckets as
    * ρ = 0) with the per-key estimate alongside — the mergeable state
    * AND the answer derived from it.
    *
    * Pieces below: [[hllRowRegs]] (stateless per-row contribution) →
    * max aggregation (batch in q131; Complete-mode streaming in q135)
    * → [[hllFinish]] (grid fill + estimate). */
  /** Stateless per-row HLL register contribution: one (event_type,
    * reg_id, rho) row per input row. Shared by the batch gate (q131)
    * and the streaming variant (q135 — the SAME max-aggregation run in
    * Complete mode maintains the registers incrementally; monotone max
    * state is exactly what the streaming engine merges for free). */
  def hllRowRegs(events: DataFrame): DataFrame = {
    import graft.functions.Exprs
    events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        Exprs.mulmod61(Exprs.poly_hash(col("user_id").cast("string")),
          Kmv.G).as("h"))
      .select(col("event_type"), (col("h") % 64).as("reg_id"),
        expr("h div 64").as("w"))
      .select(col("event_type"), col("reg_id"),
        when(col("w") === 0, 56)
          .otherwise(lit(56) - length(bin(col("w")))).cast("long").as("rho"))
  }

  /** Fill the m=64 grid (empty buckets as ρ=0) and derive the raw-HLL
    * estimate from aggregated (event_type, reg_id, rho) registers. */
  def hllFinish(regs: DataFrame): DataFrame = {
    val grid = regs.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(63L))).as("reg_id"))
      .join(regs, Seq("event_type", "reg_id"), "left")
      .select(col("event_type"), col("reg_id"),
        coalesce(col("rho"), lit(0L)).cast("long").as("rho"))
    val sTab = grid.groupBy("event_type")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(56 - rho AS INT))"))
        .as("s"))
    grid.join(sTab, "event_type")
      .select(col("event_type"), col("reg_id").cast("long").as("reg_id"),
        col("rho").cast("long").as("rho"),
        floor(lit(0.709) * lit(4096) * lit(72057594037927936.0)
          / col("s").cast("double")).cast("long").as("est"))
      .orderBy("event_type", "reg_id")
  }

  /** The q131/q135 oracle — also the streaming gate's: a Complete-mode
    * max aggregation's final state must equal the batch sketch. */
  val HllOracle =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951)
      |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) AS h
      |  FROM (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
      |        FROM events WHERE user_id IS NOT NULL)),
      |r AS (
      |  SELECT event_type, h % 64 AS reg_id, h // 64 AS w FROM h),
      |rho AS (
      |  SELECT event_type, reg_id,
      |    max(CASE WHEN w = 0 THEN 56 ELSE 56 - length(bin(w)) END) AS rho
      |  FROM r GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.reg_id, coalesce(rho.rho, 0) AS rho
      |  FROM (SELECT DISTINCT event_type FROM h) t
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS reg_id) g
      |  LEFT JOIN rho ON rho.event_type = t.event_type
      |               AND rho.reg_id = g.reg_id),
      |s AS (
      |  SELECT event_type,
      |    sum(CAST(1 AS BIGINT) << CAST(56 - rho AS INT)) AS s
      |  FROM grid GROUP BY 1)
      |SELECT g.event_type, CAST(g.reg_id AS BIGINT) AS reg_id,
      |  CAST(g.rho AS BIGINT) AS rho,
      |  CAST(floor(CAST(0.709 AS DOUBLE) * 4096
      |       * CAST(72057594037927936 AS DOUBLE)
      |       / CAST(s.s AS DOUBLE)) AS BIGINT) AS est
      |FROM grid g JOIN s ON g.event_type = s.event_type
      |ORDER BY g.event_type, g.reg_id""".stripMargin

  val q131 = Q.sql("q131_hll_registers", HllOracle) { (s, d) =>
    // Kmv.mix applied explicitly inside hllRowRegs: poly_hash is the
    // RAW poly-131 value (the KMV/CMS aggregators mix internally);
    // bucket/rho need the uniformized bits the oracle replays.
    hllFinish(hllRowRegs(Tables.events(s, d))
      .groupBy("event_type", "reg_id").agg(max("rho").as("rho")))
  }

  /** The AMS sign-hash multipliers: the four CMS rows plus the KMV
    * uniformizer — five independent ±1 families from one poly hash,
    * sign_j(h) = 1 − 2·((h·Gⱼ mod M) mod 2). */
  val AmsGs: Array[Long] = Cms.Gs :+ Kmv.G

  /** AMS second-frequency-moment sketch (Alon-Matias-Szegedy, STOC'96
    * "tug-of-war"): five counters per group, each Zⱼ = Σ_rows signⱼ(key);
    * every Zⱼ² is an unbiased F₂ = Σ_key f(key)² estimate and their
    * floored mean damps the variance to √(2/5)·F₂ (a MEDIAN of single
    * squares would sit at the χ²₁ median ≈ 0.455·F₂ — measured exactly
    * that on this stream — so the mean, not the median, is the right
    * 5-register combine; median-of-means needs d ≥ 3 groups). F₂ IS the
    * self-join size — the quantity a planner wants before deciding to
    * salt a skewed key — and this sketch reads it from five integers per
    * group: constant state, merged by addition, riding the
    * partial-aggregate tree with no per-key shuffle (the exact answer
    * needs groupBy(key), which at 100 TB is the very shuffle being
    * avoided; long Z² saturates around |Z| ~ 3·10⁹ — beyond that,
    * promote the squares to decimal). The all-integer registers (sign =
    * one hash bit) are what DuckDB replays; the gate emits the five Z's,
    * the mean-of-squares estimate, and the exact F₂ side by side. */
  val q160 = Q.sql("q160_ams_f2",
    """WITH k AS (
      |  SELECT event_type,
      |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h,
      |    cnt
      |  FROM (SELECT event_type, CAST(user_id AS VARCHAR) AS u,
      |               count(*) AS cnt
      |        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)),
      |g AS (SELECT * FROM (VALUES
      |  (0, 2177342782468422681), (1, 2258633747088074174),
      |  (2, 1499779743744070127), (3, 1650849331375898009),
      |  (4, 1752450205419405103)) t(j, g)),
      |z AS (
      |  SELECT event_type, j,
      |    CAST(sum(cnt * (1 - 2 * CAST(CAST(h AS HUGEINT) * CAST(g.g AS HUGEINT)
      |      % 2305843009213693951 % 2 AS BIGINT))) AS BIGINT) AS z
      |  FROM k CROSS JOIN g GROUP BY 1, 2),
      |zz AS (
      |  SELECT event_type,
      |    max(CASE WHEN j = 0 THEN z END) AS z0,
      |    max(CASE WHEN j = 1 THEN z END) AS z1,
      |    max(CASE WHEN j = 2 THEN z END) AS z2,
      |    max(CASE WHEN j = 3 THEN z END) AS z3,
      |    max(CASE WHEN j = 4 THEN z END) AS z4,
      |    CAST(sum(z * z) // 5 AS BIGINT) AS est_f2
      |  FROM z GROUP BY 1),
      |x AS (SELECT event_type, CAST(sum(cnt * cnt) AS BIGINT) AS exact_f2
      |      FROM k GROUP BY 1)
      |SELECT zz.event_type, z0, z1, z2, z3, z4, est_f2, exact_f2
      |FROM zz JOIN x USING (event_type)
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    import graft.functions.Exprs.{mulmod61, poly_hash}
    val hashed = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        poly_hash(col("user_id").cast("string")).as("h"))
    val zCols = AmsGs.toSeq.zipWithIndex.map { case (g, j) =>
      sum(lit(1L) - lit(2L) * (mulmod61(col("h"), g) % 2)).as(s"z$j")
    }
    val zs = hashed.groupBy("event_type").agg(zCols.head, zCols.tail: _*)
    val exact = hashed
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      .groupBy("event_type").agg(sum(col("c") * col("c")).as("exact_f2"))
    zs.join(exact, "event_type")
      .select(col("event_type"), col("z0"), col("z1"), col("z2"),
        col("z3"), col("z4"),
        expr(s"(${(0 to 4).map(j => s"z$j * z$j").mkString(" + ")}) div 5")
          .as("est_f2"),
        col("exact_f2"))
      .orderBy("event_type")
  }

  /** CMS-inner-product join-size estimation (AGMS/Cormode-Muthukrishnan
    * §4.2): sketch each side's join key into the [[CountMin]] grid, and
    * Σ_cells rowA·rowB — min over the depth rows — estimates
    * |A ⋈ B| = Σ_key fA(key)·fB(key) without touching the join. This is
    * the planner's pre-shuffle question ("can this date-aligned join
    * explode?") answered from two 8 KiB register arrays: each side is
    * one map-side-combined pass, the inner product is a 1×1-row join
    * over array columns, and the estimate only ever OVERestimates
    * (collision mass is nonnegative, E[over] = N_A·N_B/width). The gate
    * pins all four per-row inner products, their min, and the exact
    * join size, replayed register-by-register in DuckDB. */
  val q161 = Q.sql("q161_cms_join_size",
    """WITH lk AS (
      |  SELECT CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h,
      |    cnt
      |  FROM (SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS u,
      |               count(*) AS cnt
      |        FROM lineitem GROUP BY 1)),
      |ok AS (
      |  SELECT CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(u) + 1),
      |                     c -> CAST(ascii(substr(u, c, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h,
      |    cnt
      |  FROM (SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS u,
      |               count(*) AS cnt
      |        FROM orders GROUP BY 1)),
      |d AS (SELECT * FROM (VALUES
      |  (0, 2177342782468422681), (1, 2258633747088074174),
      |  (2, 1499779743744070127), (3, 1650849331375898009)) t(i, g)),
      |lr AS (
      |  SELECT i, CAST(CAST(h AS HUGEINT) * CAST(g AS HUGEINT)
      |         % 2305843009213693951 % 256 AS BIGINT) AS cell,
      |         CAST(sum(cnt) AS BIGINT) AS reg
      |  FROM lk CROSS JOIN d GROUP BY 1, 2),
      |orr AS (
      |  SELECT i, CAST(CAST(h AS HUGEINT) * CAST(g AS HUGEINT)
      |         % 2305843009213693951 % 256 AS BIGINT) AS cell,
      |         CAST(sum(cnt) AS BIGINT) AS reg
      |  FROM ok CROSS JOIN d GROUP BY 1, 2),
      |ip AS (
      |  SELECT lr.i, CAST(sum(lr.reg * orr.reg) AS BIGINT) AS est
      |  FROM lr JOIN orr USING (i, cell) GROUP BY 1),
      |e AS (
      |  SELECT max(CASE WHEN i = 0 THEN est END) AS est0,
      |         max(CASE WHEN i = 1 THEN est END) AS est1,
      |         max(CASE WHEN i = 2 THEN est END) AS est2,
      |         max(CASE WHEN i = 3 THEN est END) AS est3,
      |         CAST(min(est) AS BIGINT) AS est_join
      |  FROM ip),
      |x AS (
      |  SELECT CAST(coalesce(sum(l.cnt * o.cnt), 0) AS BIGINT) AS exact_join
      |  FROM (SELECT CAST(l_shipdate AS DATE) AS dt, count(*) AS cnt
      |        FROM lineitem GROUP BY 1) l
      |  JOIN (SELECT CAST(o_orderdate AS DATE) AS dt, count(*) AS cnt
      |        FROM orders GROUP BY 1) o USING (dt)),
      |n AS (
      |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_l,
      |         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_o)
      |SELECT n_l, n_o, est0, est1, est2, est3, est_join, exact_join
      |FROM n CROSS JOIN e CROSS JOIN x""".stripMargin) { (s, d) =>
    import graft.functions.Exprs.poly_hash
    val cms = udaf(new CountMin, Encoders.scalaLong)
    def keyed(df: DataFrame, dateCol: String): DataFrame =
      df.select(col(dateCol).cast("date").as("dt"),
        poly_hash(col(dateCol).cast("date").cast("string")).as("h"))
    val li = keyed(Tables.lineitem(s, d), "l_shipdate")
    val or = keyed(Tables.orders(s, d), "o_orderdate")
    val lSk = li.agg(cms(col("h")).as("rl"), count(lit(1)).as("n_l"))
    val oSk = or.agg(cms(col("h")).as("ro"), count(lit(1)).as("n_o"))
    val prod = zip_with(col("rl"), col("ro"), (a, b) => a * b)
    val withEsts = (0 until Cms.Depth).foldLeft(
      lSk.crossJoin(oSk).withColumn("prod", prod)) { (df, i) =>
      df.withColumn(s"est$i",
        aggregate(slice(col("prod"), i * Cms.Width + 1, Cms.Width),
          lit(0L), (acc, x) => acc + x))
    }
    val exact = li.groupBy("dt").agg(count(lit(1)).as("cl"))
      .join(or.groupBy("dt").agg(count(lit(1)).as("co")), "dt")
      .agg(coalesce(sum(col("cl") * col("co")), lit(0L)).as("exact_join"))
    withEsts
      .withColumn("est_join",
        least((0 until Cms.Depth).map(i => col(s"est$i")): _*))
      .crossJoin(exact)
      .select("n_l", "n_o", "est0", "est1", "est2", "est3",
        "est_join", "exact_join")
  }

  /** Histogram-based equi-join cardinality estimation — the other half
    * of the CBO-statistics story whose sketch form is q161's Count-Min
    * inner product: per value bin (q114's equi-width grid), the
    * textbook estimate |A⋈B|ᵦ ≈ cA·cB / max(ndvA, ndvB) with EXACT
    * per-bin distinct counts, next to the TRUE per-bin join size
    * Σₖ cA(k)·cB(k) — so the gate publishes estimate and truth side by
    * side, which is exactly the validation table a planner's stats
    * module regression-tests against. Estimates stay integer
    * (milli-rows via floor division); the true size folds from the
    * key-level count join without materializing the join itself.
    * Scale: histogram-sized everything after the two per-side
    * aggregations. */
  val q227 = Q.sql("q227_join_estimate",
    """WITH a AS (
      |  SELECT CAST(floor(value) AS BIGINT) AS k FROM events
      |  WHERE event_type = 'click' AND value IS NOT NULL),
      |b AS (
      |  SELECT CAST(floor(value) AS BIGINT) AS k FROM events
      |  WHERE event_type = 'view' AND value IS NOT NULL),
      |ka AS (SELECT k, k // 4 AS bin, count(*) AS c FROM a GROUP BY 1),
      |kb AS (SELECT k, k // 4 AS bin, count(*) AS c FROM b GROUP BY 1),
      |ha AS (SELECT bin, CAST(sum(c) AS BIGINT) AS ca,
      |         CAST(count(*) AS BIGINT) AS ndva FROM ka GROUP BY 1),
      |hb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cb,
      |         CAST(count(*) AS BIGINT) AS ndvb FROM kb GROUP BY 1),
      |tr AS (
      |  SELECT ka.bin, CAST(sum(ka.c * kb.c) AS BIGINT) AS actual
      |  FROM ka JOIN kb USING (k) GROUP BY 1)
      |SELECT ha.bin, ha.ca, hb.cb, ha.ndva, hb.ndvb,
      |  CAST(ha.ca * hb.cb * 1000 // greatest(ha.ndva, hb.ndvb) AS BIGINT)
      |    AS est_milli,
      |  CAST(COALESCE(tr.actual, 0) AS BIGINT) AS actual
      |FROM ha JOIN hb USING (bin) LEFT JOIN tr USING (bin)
      |ORDER BY bin""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
    def side(t: String, cn: String, nn: String) =
      ev.filter(col("event_type") === t)
        .select(floor(col("value")).cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .withColumn("bin", expr("k div 4"))
        .localCheckpoint(true) // histogram + true-size join read it
    val ka = side("click", "ca", "ndva")
    val kb = side("view", "cb", "ndvb")
    val ha = ka.groupBy("bin").agg(sum("c").cast("long").as("ca"),
      count(lit(1)).cast("long").as("ndva"))
    val hb = kb.groupBy("bin").agg(sum("c").cast("long").as("cb"),
      count(lit(1)).cast("long").as("ndvb"))
    val tr = ka.select(col("k"), col("bin"), col("c").as("c1"))
      .join(kb.select(col("k"), col("c").as("c2")), "k")
      .groupBy("bin").agg(sum(col("c1") * col("c2")).cast("long").as("actual"))
    ha.join(hb, "bin").join(tr, Seq("bin"), "left")
      .na.fill(0L, Seq("actual"))
      .select(col("bin"), col("ca"), col("cb"), col("ndva"), col("ndvb"),
        expr("ca * cb * 1000 div greatest(ndva, ndvb)").cast("long").as("est_milli"),
        col("actual"))
      .orderBy("bin")
  }

  /** DDSketch-style relative-error quantiles — the log-bucketed
    * quantile sketch (Masson et al. 2019) that complements q114's
    * equi-width bins and q188's exact selection: values bucket by
    * quarter-bits of the integer qlog2 (bucket = qlog2(v) div 256, a
    * dedicated zero bucket), the p50/p90/p99 estimates read the first
    * bucket whose cumulative count reaches the target rank and
    * reconstruct the bucket-midpoint value through the EXACT integer
    * inverse of the piecewise-linear log (2^e·(1024+frac) div 1024) —
    * so the whole sketch is integers and both engines replay it.
    * The exact selection quantiles ride along and the gate PINS the
    * relative-error contract (|est − exact|·4 ≤ exact — quarter-bit
    * width + the 0.0871-bit qlog2 envelope stays well inside 25%).
    * Fixed-size mergeable state per key: the 100 TB quantile path. */
  val q265 = Q.sql("q265_ddsketch_quantiles", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    def inv(b: String) =
      s"CASE WHEN $b = -1 THEN 0 ELSE (CAST(1 AS BIGINT)" +
        s" << (($b * 256 + 128) // 1024))" +
        s" * (1024 + ($b * 256 + 128) % 1024) // 1024 END"
    def okc(est: String, ex: String) =
      s"(($ex = 0 AND $est = 0) OR abs($est - $ex) * 4 <= $ex)"
    s"""WITH v AS (
       |  SELECT event_id, event_type,
       |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq
       |  FROM events WHERE value IS NOT NULL),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type
       |      ORDER BY vq, event_id) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM v),
       |ex AS (
       |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    max(CASE WHEN rn = (50 * n + 99) // 100 THEN vq END) AS e50,
       |    max(CASE WHEN rn = (90 * n + 99) // 100 THEN vq END) AS e90,
       |    max(CASE WHEN rn = (99 * n + 99) // 100 THEN vq END) AS e99
       |  FROM r GROUP BY 1),
       |b AS (
       |  SELECT event_type,
       |    CASE WHEN vq = 0 THEN -1 ELSE ${ql("vq")} // 256 END AS bkt,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM v GROUP BY 1, 2),
       |cb AS (
       |  SELECT event_type, bkt,
       |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bkt)
       |      AS BIGINT) AS cum
       |  FROM b),
       |eb AS (
       |  SELECT cb.event_type,
       |    min(CASE WHEN cum >= (50 * ex.n + 99) // 100 THEN bkt END) AS b50,
       |    min(CASE WHEN cum >= (90 * ex.n + 99) // 100 THEN bkt END) AS b90,
       |    min(CASE WHEN cum >= (99 * ex.n + 99) // 100 THEN bkt END) AS b99
       |  FROM cb JOIN ex USING (event_type) GROUP BY 1)
       |SELECT ex.event_type, ex.n,
       |  ex.e50 AS p50_exact, CAST(${inv("eb.b50")} AS BIGINT) AS p50_est,
       |  ${okc(inv("eb.b50"), "ex.e50")} AS p50_ok,
       |  ex.e90 AS p90_exact, CAST(${inv("eb.b90")} AS BIGINT) AS p90_est,
       |  ${okc(inv("eb.b90"), "ex.e90")} AS p90_ok,
       |  ex.e99 AS p99_exact, CAST(${inv("eb.b99")} AS BIGINT) AS p99_est,
       |  ${okc(inv("eb.b99"), "ex.e99")} AS p99_ok
       |FROM ex JOIN eb USING (event_type)
       |ORDER BY event_type""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 div shiftleft(1L, length(bin($x)) - 1) - 1024)"
    def inv(b: String) =
      s"CASE WHEN $b = -1 THEN 0L ELSE shiftleft(1L," +
        s" cast(($b * 256 + 128) div 1024 as int))" +
        s" * (1024 + ($b * 256 + 128) % 1024) div 1024 END"
    def okc(est: String, ex: String) =
      s"(($ex = 0 AND $est = 0) OR abs($est - $ex) * 4 <= $ex)"
    val v = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
      .localCheckpoint(true) // exact selection + the bucket fold read it
    val byType = Window.partitionBy("event_type")
    val ex = v
      .withColumn("rn", row_number().over(byType.orderBy("vq", "event_id")))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n"),
        max(when(expr("rn = (50 * n + 99) div 100"), col("vq"))).as("e50"),
        max(when(expr("rn = (90 * n + 99) div 100"), col("vq"))).as("e90"),
        max(when(expr("rn = (99 * n + 99) div 100"), col("vq"))).as("e99"))
    val cb = v
      .groupBy(col("event_type"),
        expr(s"CASE WHEN vq = 0 THEN -1L ELSE ${ql("vq")} div 256 END")
          .as("bkt"))
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("cum",
        sum("c").over(byType.orderBy("bkt")).cast("long"))
    val eb = cb.join(broadcast(ex.select("event_type", "n")), "event_type")
      .groupBy("event_type")
      .agg(min(when(expr("cum >= (50 * n + 99) div 100"), col("bkt"))).as("b50"),
        min(when(expr("cum >= (90 * n + 99) div 100"), col("bkt"))).as("b90"),
        min(when(expr("cum >= (99 * n + 99) div 100"), col("bkt"))).as("b99"))
    ex.join(eb, "event_type")
      .select(col("event_type"), col("n"),
        col("e50").as("p50_exact"),
        expr(inv("b50")).cast("long").as("p50_est"),
        expr(okc(inv("b50"), "e50")).as("p50_ok"),
        col("e90").as("p90_exact"),
        expr(inv("b90")).cast("long").as("p90_est"),
        expr(okc(inv("b90"), "e90")).as("p90_ok"),
        col("e99").as("p99_exact"),
        expr(inv("b99")).cast("long").as("p99_est"),
        expr(okc(inv("b99"), "e99")).as("p99_ok"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q91, q103, q104, q113, q114, q131, q160, q161, q227,
    q265)
}
