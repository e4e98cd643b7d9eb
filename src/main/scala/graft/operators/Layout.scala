package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton curve) data layout — multi-dimensional clustering
  * for scan pruning. Sorting a table by the bit-interleaved z-value of
  * two columns before writing makes every output file cover a small
  * rectangle of BOTH dimensions, so parquet min/max statistics prune
  * scans filtered on either column — the standard lakehouse layout
  * trick for tables queried on more than one key.
  *
  * The z-value itself is pure codegen'd bitwise arithmetic (the
  * classic shift-or-mask bit spread), no UDF; `clusterByZ` is a
  * range-repartition + in-partition sort on that value, i.e. exactly
  * the shuffle shape a distributed writer wants: one exchange, sorted
  * output, no driver involvement.
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * mask-shift doubling: 8, 4, 2, 1). */
  private def spread16(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of the low 16 bits of `x` and `y` (x on even
    * bits, y on odd). */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(65535L)))
      .bitwiseOR(shiftleft(spread16(y.cast("long").bitwiseAND(lit(65535L))), 1))

  /** Cluster `df` for writing: range-partition on the z-value of
    * (xCol, yCol) into `partitions` output slices, sorted within each —
    * every slice then covers a contiguous z-range (disjoint across
    * slices, pinned by EngineSpec) and thus a bounded box in (x, y). */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      partitions: Int): DataFrame = {
    val z = df.withColumn("__z", zValue(col(xCol), col(yCol)))
    z.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
  }

  /** Z-order gate: Morton codes of (l_partkey, l_suppkey) rolled up to
    * curve buckets with counts and value bounds — the oracle replays
    * the bit-spread arithmetic in plain integer SQL. */
  val q117 = Q.sql("q117_zorder",
    """WITH z AS (
      |  SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
      |s1 AS (SELECT ((x | (x << 8)) & 16711935) AS x1,
      |              ((y | (y << 8)) & 16711935) AS y1 FROM z),
      |s2 AS (SELECT ((x1 | (x1 << 4)) & 252645135) AS x2,
      |              ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1),
      |s3 AS (SELECT ((x2 | (x2 << 2)) & 858993459) AS x3,
      |              ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
      |s4 AS (SELECT ((x3 | (x3 << 1)) & 1431655765) AS x4,
      |              ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3),
      |zv AS (SELECT (x4 | (y4 << 1)) AS zval FROM s4)
      |SELECT zval >> 14 AS zbucket, count(*) AS n,
      |  min(zval) AS min_z, max(zval) AS max_z
      |FROM zv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
      .groupBy(shiftright(col("zval"), 14).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
      .orderBy("zbucket")
  }

  /** Bucketed tables for the shuffle-free join gate, built once per
    * (warehouse dir, data dir) and ADOPTED by every later JVM:
    * lineitem and orders hash-bucketed AND sorted by their join key
    * into the same bucket count. `bucketBy` needs `saveAsTable`, so
    * each builder writes an EXTERNAL pid-suffixed staging table and
    * rename(2)s its directory into the canonical location (the
    * SuffixArray.suffixRanks discipline) — a second JVM sharing the
    * warehouse dir never deletes files a first JVM is mid-scan over,
    * and a racing builder's loser just discards its staging (the
    * build is deterministic, both copies are equivalent layouts).
    * Adoption re-registers the location as an external bucketed table
    * (CLUSTERED BY DDL — bucket metadata lives in the catalog, the
    * bucket ids ride the part-file names across the move). */
  private val bucketMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  val BucketCount = 8

  private[graft] def bucketedPair(spark: org.apache.spark.sql.SparkSession,
      d: String): (String, String) =
    bucketMemo.computeIfAbsent(d, dir => {
      val key = java.lang.Integer.toHexString(dir.hashCode).replace('-', 'm')
      val li = s"graft_bk_li_$key"
      val ord = s"graft_bk_ord_$key"
      val wh = java.net.URI.create(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      // _SUCCESS gates adoption: a canonical dir can only appear via a
      // completed atomic rename of a finished staging write (partial
      // state lives only under pid-suffixed staging names), but a
      // leftover from the PRE-staging code path could be a crashed
      // in-place write — the committer marker distinguishes them
      def ensure(t: String, ddlCols: String, keyCol: String)
          (build: (String, String) => Unit): Unit = {
        val target = new java.io.File(wh, t)
        def marked = new java.io.File(target, "_SUCCESS").exists()
        // TOCTOU guard: a concurrent JVM's atomic rename can land between
        // any marker check and the delete — re-check immediately before
        // deleting and again before building, so a just-completed table
        // is adopted rather than razed mid-scan
        if (!marked) {
          if (target.exists() && !marked)
            // unmarked pre-staging leftover: rebuild
            org.apache.commons.io.FileUtils.deleteDirectory(target)
        }
        if (!marked) {
          val stT = s"${t}_stage${java.lang.ProcessHandle.current().pid()}"
          val stLoc = new java.io.File(wh, stT)
          spark.sql(s"DROP TABLE IF EXISTS $stT")
          if (stLoc.exists()) // ours: pid-suffixed, safe to clear
            org.apache.commons.io.FileUtils.deleteDirectory(stLoc)
          build(stT, stLoc.getAbsolutePath)
          spark.sql(s"DROP TABLE IF EXISTS $stT") // external: files stay
          try java.nio.file.Files.move(stLoc.toPath, target.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case race @ (_: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.AccessDeniedException |
                 _: java.nio.file.DirectoryNotEmptyException) =>
              org.apache.commons.io.FileUtils.deleteDirectory(stLoc)
              if (!new java.io.File(target, "_SUCCESS").exists()) throw race
          }
        }
        spark.sql(s"DROP TABLE IF EXISTS $t") // same-JVM re-registration
        spark.sql(
          s"""CREATE TABLE $t ($ddlCols) USING PARQUET
             |CLUSTERED BY ($keyCol) SORTED BY ($keyCol)
             |INTO $BucketCount BUCKETS
             |LOCATION '${target.toURI}'""".stripMargin)
      }
      ensure(li, "l_orderkey BIGINT, l_extendedprice DOUBLE, " +
          "l_discount DOUBLE", "l_orderkey") { (stT, stLoc) =>
        Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .write.mode("overwrite").option("path", stLoc)
          .bucketBy(BucketCount, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(stT)
      }
      ensure(ord, "o_orderkey BIGINT, o_orderpriority STRING",
          "o_orderkey") { (stT, stLoc) =>
        Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").option("path", stLoc)
          .bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(stT)
      }
      (li, ord)
    })

  /** Bucket-co-located join: per-order revenue over lineitem ⋈ orders
    * with BOTH sides bucketed+sorted on the join key — the join (and
    * the per-order aggregation, whose keys the bucket hash clusters)
    * runs with ZERO exchanges: the only shuffle in the executed plan is
    * the final presentation sort. This is THE 100 TB fact-to-fact join
    * answer — q101/q149 handle skew when you must shuffle; bucketing
    * removes the shuffle for the joins you run every day (both engines
    * agree on the arithmetic; the oracle doesn't care about layout).
    * PlanSpec pins the no-exchange-under-the-join shape. */
  val q177 = Q.sql("q177_bucketed_join",
    """SELECT l_orderkey AS o_orderkey, o_orderpriority,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
    val (li, ord) = bucketedPair(s, d)
    s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .select(col("l_orderkey").as("o_orderkey"), col("o_orderpriority"),
        col("n_items"), col("revenue"))
      .orderBy("o_orderkey")
  }

  val RingNodes = 4
  val RingVnodes = 4

  /** Consistent-hash ring placement + the rebalancing delta — the data
    * PLACEMENT story behind every shard map: each physical node owns
    * [[RingVnodes]] virtual positions on the poly-131·G hash ring, a
    * document lands on the first vnode clockwise of its own hash
    * (wrapping to the ring minimum), and adding node n+1 must move
    * ONLY the keys that fall into the new vnodes' arcs — ~1/(n+1) of
    * the corpus, nothing else (EngineSpec pins the bound). Ring
    * positions are config, not data: computed once on the driver with
    * the engine's own hash kernels (the q168 sign-matrix precedent)
    * and broadcast as a ≤20-row table; the assignment is one
    * cross-join aggregate per ring. The gate emits per-node counts
    * before/after the fifth node joins plus how many docs each node
    * surrendered. */
  val q194 = Q.sql("q194_consistent_hash", {
    def keysSql(n: Int): String =
      (0 until n).flatMap(k => (0 until RingVnodes).map(v =>
        s"('n$k:$v', $k)")).mkString(", ")
    val poly =
      """CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(range(1, length(k) + 1),
        |                     c -> CAST(ascii(substr(k, c, 1)) AS HUGEINT))),
        |      (a, b) -> (a * 131 + b) % 2305843009213693951) AS HUGEINT)
        |    * 1752450205419405103 % 2305843009213693951""".stripMargin
    def ringSql(name: String, n: Int): String =
      s"""$name AS MATERIALIZED (
         |  SELECT node, CAST($poly AS BIGINT) AS pos
         |  FROM (VALUES ${keysSql(n)}) t(k, node))""".stripMargin
    def asgSql(name: String, ring: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT s.doc_id, r2.node FROM (
         |    SELECT d.doc_id,
         |      coalesce(min(CASE WHEN r.pos >= d.h THEN r.pos END),
         |               min(r.pos)) AS sel
         |    FROM docs d CROSS JOIN $ring r GROUP BY 1) s
         |  JOIN $ring r2 ON r2.pos = s.sel)""".stripMargin
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id, CAST($poly AS BIGINT) AS h
       |  FROM (SELECT doc_id, CAST(doc_id AS VARCHAR) AS k FROM documents)),
       |${ringSql("ring_b", RingNodes)},
       |${ringSql("ring_a", RingNodes + 1)},
       |${asgSql("asg_b", "ring_b")},
       |${asgSql("asg_a", "ring_a")},
       |nodes AS (SELECT unnest(range(0, ${RingNodes + 1})) AS node),
       |cb AS (SELECT node, count(*) AS n FROM asg_b GROUP BY 1),
       |ca AS (SELECT node, count(*) AS n FROM asg_a GROUP BY 1),
       |mv AS (
       |  SELECT b.node, count(*) AS n
       |  FROM asg_b b JOIN asg_a a USING (doc_id)
       |  WHERE b.node <> a.node GROUP BY 1)
       |SELECT CAST(n.node AS BIGINT) AS node,
       |  CAST(coalesce(cb.n, 0) AS BIGINT) AS n_before,
       |  CAST(coalesce(ca.n, 0) AS BIGINT) AS n_after,
       |  CAST(coalesce(mv.n, 0) AS BIGINT) AS moved_away
       |FROM nodes n
       |LEFT JOIN cb ON cb.node = n.node
       |LEFT JOIN ca ON ca.node = n.node
       |LEFT JOIN mv ON mv.node = n.node
       |ORDER BY node""".stripMargin
  }) { (s, d) =>
    import graft.functions.{Exprs, TextKernels}
    import graft.operators.Sketches.Kmv
    def ring(n: Int): Seq[(Long, Long)] =
      for (k <- 0 until n; v <- 0 until RingVnodes) yield {
        val h = TextKernels.polyHash131(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"n$k:$v"))
        (k.toLong, TextKernels.mulMod61(h, Kmv.G))
      }
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"),
        Exprs.mulmod61(Exprs.poly_hash(col("doc_id").cast("string")), Kmv.G).as("h"))
      .localCheckpoint(true) // both ring assignments scan it
    def assign(r: Seq[(Long, Long)], out: String) = {
      val rdf = r.toDF("node", "pos")
      val sel = docs.crossJoin(broadcast(rdf))
        .groupBy("doc_id")
        .agg(coalesce(min(when(col("pos") >= col("h"), col("pos"))),
          min(col("pos"))).as("sel"))
      sel.join(broadcast(rdf), col("pos") === col("sel"))
        .select(col("doc_id"), col("node").as(out))
    }
    val b = assign(ring(RingNodes), "nb")
    val a = assign(ring(RingNodes + 1), "na")
    val j = b.join(a, "doc_id").localCheckpoint(true)
    val nodes = (0L to RingNodes.toLong).toDF("node")
    val cb = j.groupBy(col("nb").as("node")).agg(count(lit(1)).as("n_before"))
    val ca = j.groupBy(col("na").as("node")).agg(count(lit(1)).as("n_after"))
    val mv = j.filter(col("nb") =!= col("na"))
      .groupBy(col("nb").as("node")).agg(count(lit(1)).as("moved_away"))
    nodes.join(cb, Seq("node"), "left").join(ca, Seq("node"), "left")
      .join(mv, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("moved_away"), lit(0L)).as("moved_away"))
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(q117, q177, q194)
}
