package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed linear algebra over the embedding column — the two
  * primitives an embedding-whitening / PCA stage needs before
  * similarity work (decorrelated dims make cosine thresholds
  * meaningful, and the top principal component is the classic
  * "remove the dominant direction" denoiser for sentence embeddings):
  *
  *  - [[covariance]]: the d×d covariance matrix as ONE map-side-light
  *    pass — explode to (vec, dim, value), broadcast-self-join per
  *    vector (the per-vector 64-row slice never shuffles), partial-agg
  *    the d(d+1)/2 upper-triangle sums. Elements are FLOOR-QUANTIZED to
  *    integer 10⁻⁸ units first (`floor(x·10⁸)` — the multiply and floor
  *    are the same IEEE ops on the same double in both engines, and
  *    floor has no tie cases), because NO decimal cast of a raw float
  *    is cross-engine safe: floats populate every dyadic scale, so some
  *    element always lands exactly on a .5 boundary where Spark rounds
  *    HALF_UP and DuckDB half-even (found empirically: sf0.01's vec 264
  *    dim 33 = −0.27392578125 at scale 10). The quantized sums are
  *    exact integers (products ride DECIMAL(38,0)), the quantization
  *    bias (< 10⁻⁸ per element) is orders below covariance's own 1/√n
  *    sampling noise, and the final unit re-scaling is one identical
  *    IEEE division chain per cell.
  *  - [[q163]]: 8 power-iteration steps toward the top eigenvector,
  *    every floating-point operation an IDENTICAL IEEE sequence in both
  *    engines (fixed-order left folds, one sqrt — correctly rounded by
  *    IEEE 754 everywhere — one division per component), so the oracle
  *    replays the iteration bit-for-bit with no rounding tricks, the
  *    q121 z-score pattern scaled up to a matrix recurrence.
  *
  * At 100 TB the covariance pass is the scale path (explode factor d²/2
  * per vector is traded against zero driver state; the alternative — a
  * mapPartitions accumulator matrix — is faster but its merge order
  * makes the sums unpinnable). The iteration itself is driver-cheap by
  * construction: the matrix is d×d = 64×64 regardless of corpus size,
  * so each step is a bounded 64-row job (the BPE-argmax precedent).
  */
object Linalg {

  val D = 64

  /** Quantization: 10⁻⁸ units. Bias < 10⁻⁸ per element; products fit
    * long (|xq| ≤ 2·10⁸ → xq² ≤ 4·10¹⁶), sums ride DECIMAL(38,0). */
  val QScale = 1e8

  /** (i, j, n, cov) for 1 ≤ i ≤ j ≤ D, cov = E[x_i x_j] − E[x_i]E[x_j]
    * over the floor-quantized elements. */
  def covariance(s: SparkSession, d: String): DataFrame = {
    val x = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
        floor(col("xf").cast("double") * QScale).as("xq"))
    val a = x.toDF("vec_id", "i", "xa")
    val b = x.toDF("vec_id", "j", "xb")
    // broadcast the (n·64)-row side: the pair build is shuffle-free and
    // the only exchange in the plan is the 2080-group partial agg
    val prods = a.join(broadcast(b), "vec_id")
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum((col("xa") * col("xb")).cast("decimal(38,0)")).as("sxx"))
    val mu = x.groupBy("i")
      .agg(sum("xq").as("si"), count(lit(1)).as("n"))
    val mi = mu.select(col("i"), col("si"), col("n"))
    val mj = mu.select(col("i").as("j"), col("si").as("sj"))
    prods.join(mi, "i").join(mj, "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"), col("n"),
        ((col("sxx").cast("double") / col("n") / lit(QScale * QScale))
          - ((col("si").cast("double") / col("n") / lit(QScale))
            * (col("sj").cast("double") / col("n") / lit(QScale)))).as("cov"))
  }

  /** The shared oracle prefix. floor(CAST(f AS DOUBLE) · 10⁸) is the
    * same IEEE multiply + floor Spark runs — no rounding, no ties (a
    * raw float→DECIMAL cast is NOT safe: exact-half elements exist at
    * every scale and the engines' tie rules differ; nor is DuckDB's
    * FLOAT→DECIMAL, which scales in float32 — operators.Q rules). The
    * integer sums exceed 15 digits, so they reach DOUBLE through the
    * VARCHAR bridge. */
  private val CovSql =
    """x AS MATERIALIZED (
      |  SELECT vec_id, CAST(g.i AS BIGINT) AS i,
      |         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 100000000.0)
      |              AS BIGINT) AS xq
      |  FROM embeddings CROSS JOIN
      |       (SELECT unnest(range(1, 65)) AS i) g),
      |mu AS MATERIALIZED (
      |  SELECT i, CAST(sum(xq) AS BIGINT) AS si, count(*) AS n
      |  FROM x GROUP BY 1),
      |p AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, sum(CAST(a.xq * b.xq AS HUGEINT)) AS sxx
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |cov AS MATERIALIZED (
      |  SELECT p.i AS dim_i, p.j AS dim_j, CAST(mi.n AS BIGINT) AS n,
      |    CAST(CAST(p.sxx AS VARCHAR) AS DOUBLE) / mi.n / 1e16
      |      - ((CAST(mi.si AS DOUBLE) / mi.n / 1e8)
      |         * (CAST(mj.si AS DOUBLE) / mj.n / 1e8)) AS cov
      |  FROM p JOIN mu mi ON mi.i = p.i JOIN mu mj ON mj.i = p.j)""".stripMargin

  val q162 = Q.sql("q162_embed_covariance",
    s"""WITH $CovSql
      |SELECT dim_i, dim_j, n, cov FROM cov
      |ORDER BY dim_i, dim_j""".stripMargin) { (s, d) =>
    covariance(s, d).orderBy("dim_i", "dim_j")
  }

  /** One DuckDB power-iteration layer: w = C·v (per-row fixed-order
    * fold), λ = √Σw² (i-order fold), v' = w/λ. `it0` must provide
    * column `v`; emits `it$t(v, lam)`. */
  private def layer(t: Int): String = {
    val prev = if (t == 1) "it0" else s"it${t - 1}"
    s"""w$t AS MATERIALIZED (
       |  SELECT m.i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_zip(m.row, $prev.v),
       |                   q -> q[1] * q[2])),
       |    (acc, e) -> acc + e) AS w
       |  FROM m, $prev),
       |n$t AS MATERIALIZED (
       |  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list(w ORDER BY i), e -> e * e)),
       |    (acc, e) -> acc + e)) AS lam,
       |    list(w ORDER BY i) AS wl
       |  FROM w$t),
       |it$t AS MATERIALIZED (
       |  SELECT list_transform(wl, e -> e / lam) AS v, lam FROM n$t)""".stripMargin
  }

  val Iters = 8

  /** The oracle's iteration chain, from the cov CTE to `it$Iters(v, lam)`. */
  private val IterSql =
    s"""full_m AS MATERIALIZED (
      |  SELECT dim_i AS i, dim_j AS j, cov FROM cov
      |  UNION ALL
      |  SELECT dim_j AS i, dim_i AS j, cov FROM cov WHERE dim_i <> dim_j),
      |m AS MATERIALIZED (
      |  SELECT i, list(cov ORDER BY j) AS row FROM full_m GROUP BY 1),
      |it0 AS (SELECT list_transform(range(1, 65),
      |                              e -> CAST(0.125 AS DOUBLE)) AS v),
      |${(1 to Iters).map(layer).mkString(",\n")}""".stripMargin

  /** Run the 8 power-iteration steps: (top eigenvector, its norm λ).
    * Each step is one bounded 64-row job over the localCheckpointed
    * matrix; the corpus is scanned exactly once (the covariance pass). */
  def topEigen(s: SparkSession, d: String): (Array[Double], Double) = {
    val cov = covariance(s, d)
    val full = cov.select(col("dim_i").as("i"), col("dim_j").as("j"), col("cov"))
      .union(cov.filter(col("dim_i") =!= col("dim_j"))
        .select(col("dim_j").as("i"), col("dim_i").as("j"), col("cov")))
    // 64 rows: (i, dense row ordered by j) — pinned once so the 8 tiny
    // per-iteration jobs don't re-run the corpus covariance pass
    val m = full.groupBy("i")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("cov")))),
        e => e.getField("cov")).as("row"))
      .localCheckpoint(true)
    var v = Array.fill(D)(0.125)
    var lam = 0.0
    for (_ <- 1 to Iters) {
      // w = C·v: fixed-order left fold inside the plan (zip_with keeps
      // j order; aggregate starts at 0.0 like the oracle's prepend)
      val w = m.select(col("i"),
        aggregate(zip_with(col("row"), lit(v), (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e).as("w"))
        .orderBy("i").collect().map(_.getDouble(1))
      val sumsq = w.foldLeft(0.0)((acc, e) => acc + e * e)
      lam = math.sqrt(sumsq)
      v = w.map(_ / lam)
    }
    (v, lam)
  }

  val q163 = Q.sql("q163_power_iteration",
    s"""WITH $CovSql,
      |$IterSql
      |SELECT CAST(g.i AS BIGINT) AS dim_i, it$Iters.v[g.i] AS v_i,
      |       it$Iters.lam AS lam
      |FROM (SELECT unnest(range(1, 65)) AS i) g, it$Iters
      |ORDER BY dim_i""".stripMargin) { (s, d) =>
    val (v, lam) = topEigen(s, d)
    import s.implicits._
    v.toSeq.zipWithIndex
      .map { case (vi, p) => ((p + 1).toLong, vi, lam) }
      .toDF("dim_i", "v_i", "lam")
      .orderBy("dim_i")
  }

  /** Principal-component projection — the "remove the dominant
    * direction" denoiser (Arora et al.'s all-but-the-top shape): every
    * vector's scalar projection onto the q163 eigenvector plus its
    * off-component residual norm. One corpus scan with the 64-double
    * eigenvector as a plan literal; score and residual are fixed-order
    * IEEE folds the oracle replays exactly (no rounding anywhere in the
    * chain, like q163). */
  val q164 = Q.sql("q164_pca_projection",
    s"""WITH $CovSql,
      |$IterSql,
      |e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |       FROM embeddings),
      |sc AS MATERIALIZED (
      |  SELECT vec_id, e,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list_zip(e, it$Iters.v), q -> q[1] * q[2])),
      |      (acc, x) -> acc + x) AS score
      |  FROM e2, it$Iters)
      |SELECT sc.vec_id, sc.score,
      |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(list_zip(sc.e, it$Iters.v),
      |      q -> (q[1] - sc.score * q[2]) * (q[1] - sc.score * q[2]))),
      |    (acc, x) -> acc + x)) AS resid
      |FROM sc, it$Iters
      |ORDER BY sc.vec_id""".stripMargin) { (s, d) =>
    val (v, _) = topEigen(s, d)
    val vLit = lit(v)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    e.withColumn("score",
        aggregate(zip_with(col("e"), vLit, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("resid",
        sqrt(aggregate(zip_with(col("e"), vLit,
          (a, b) => (a - col("score") * b) * (a - col("score") * b)),
          lit(0.0), (acc, x) => acc + x)))
      .select("vec_id", "score", "resid")
      .orderBy("vec_id")
  }

  /** Johnson–Lindenstrauss sign projection: project the 64-dim
    * embeddings onto JlK = 16 ±1 random-sign directions (Achlioptas'
    * database-friendly JL variant — signs, not Gaussians, so the
    * transform is pure integer arithmetic over the q162 floor-quantized
    * elements and the gate is hash-exact with no rounding anywhere).
    * E[‖y_a − y_b‖²] = JlK·‖x_a − x_b‖², so distances survive within
    * the JL distortion envelope (EngineSpec measures it) at a quarter
    * of the storage/compute — the standard pre-shrink before a
    * brute-force rerank or a disk-resident index build.
    *
    * The sign matrix is NOT data: each cell is the sketch family's
    * poly-131 → ×G-uniformizer hash of the cell's "i_j" key, computed
    * once on the driver with the SAME kernels the engine uses
    * ([[graft.functions.TextKernels]]) and inlined as 16 plan-literal
    * arrays — so executors touch no hash at all, and the oracle replays
    * the identical family in SQL (q166's CTE shape). The projection
    * itself is 16 fixed-order integer folds per vector: stateless,
    * shuffle-free, whole-stage-codegen'd — the 100 TB cost is exactly
    * one corpus scan. */
  val JlK = 16

  /** jlSigns(j)(i): the ±1 sign for input dim i+1 → output dim j+1. */
  private[graft] val jlSigns: Array[Array[Long]] = {
    import graft.functions.TextKernels
    import graft.operators.Sketches.Kmv
    Array.tabulate(JlK, D) { (j, i) =>
      val h = TextKernels.polyHash131(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"${i + 1}_${j + 1}"))
      1L - 2L * (TextKernels.mulMod61(h, Kmv.G) % 2L)
    }
  }

  /** (vec_id, dim_j, y): the projected integer coordinates, one row per
    * vector × output dim. */
  def jlProject(s: SparkSession, d: String): DataFrame = {
    val xq = transform(col("embedding"),
      e => floor(e.cast("double") * lit(QScale)).cast("long"))
    val ys = (0 until JlK).map { j =>
      aggregate(zip_with(col("xq"), lit(jlSigns(j)), (a, b) => a * b),
        lit(0L), (acc, e) => acc + e)
    }
    Tables.embeddings(s, d)
      .select(col("vec_id"), xq.as("xq"))
      .select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("p", "y")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("dim_j"), col("y"))
  }

  val q168 = Q.sql("q168_jl_projection",
    """WITH x AS MATERIALIZED (
      |  SELECT vec_id, CAST(g.i AS BIGINT) AS i,
      |         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 100000000.0)
      |              AS BIGINT) AS xq
      |  FROM embeddings CROSS JOIN
      |       (SELECT unnest(range(1, 65)) AS i) g),
      |dims AS (
      |  SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
      |         CAST(a.i AS VARCHAR) || '_' || CAST(b.j AS VARCHAR) AS k
      |  FROM (SELECT unnest(range(1, 65)) AS i) a
      |  CROSS JOIN (SELECT unnest(range(1, 17)) AS j) b),
      |sgn AS MATERIALIZED (
      |  SELECT i, j,
      |    1 - 2 * CAST(CAST(h AS HUGEINT) * 1752450205419405103
      |                 % 2305843009213693951 % 2 AS BIGINT) AS s
      |  FROM (
      |    SELECT i, j,
      |      CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(k) + 1),
      |                       c -> CAST(ascii(substr(k, c, 1)) AS HUGEINT))),
      |        (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h
      |    FROM dims))
      |SELECT x.vec_id, sgn.j AS dim_j,
      |       CAST(sum(sgn.s * x.xq) AS BIGINT) AS y
      |FROM x JOIN sgn ON sgn.i = x.i
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    jlProject(s, d).orderBy("vec_id", "dim_j")
  }

  /** JL-shortlist ANN + exact rerank — the composition q168 exists
    * for: distances survive the 16-dim sign projection well enough to
    * SHORTLIST (top-[[JlShort]] by projected integer L2), and the
    * full-dimension exact distance then reranks only the shortlist —
    * 4× less data scanned per candidate at the shortlist stage, exact
    * answers where it matters. Quantization here is 10⁻⁴ units on BOTH
    * stages so every squared distance fits a long (projected coords ≤
    * 64·2·10⁴; full-dim d² ≤ 64·(4·10⁴)²); signs are the q168 matrix.
    * Queries = every 50th vector; ties break by neighbor id at both
    * stages, so the oracle replays shortlist and rerank exactly.
    * EngineSpec pins the composition's DISTANCE RATIO vs brute top-3
    * (≤1.30 worst, ≤1.18 mean) rather than identity recall: the
    * synthetic embeddings' pairwise distances concentrate (1st vs 20th
    * neighbor within a few percent), so near-ties reshuffle freely
    * under JL's ±1/√k distortion while the returned distances stay
    * near-optimal — the guarantee the JL lemma actually gives. */
  val JlShort = 20
  val JlTopK = 3
  val JlQueryMod = 50

  /** Build the q196-family oracle: the shared projection CTEs, an
    * optional extra CTE (the panel), the query-source clause of the
    * shortlist, and the shared rerank tail — one template so the
    * anchor and the panel form cannot drift. */
  private def jlOracleSql(extraCte: String, querySrc: String): String =
    s"""WITH x AS MATERIALIZED (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |                   v -> CAST(floor(v * 10000.0) AS BIGINT)) AS xq
      |  FROM embeddings),
      |dims AS (
      |  SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
      |         CAST(a.i AS VARCHAR) || '_' || CAST(b.j AS VARCHAR) AS k
      |  FROM (SELECT unnest(range(1, 65)) AS i) a
      |  CROSS JOIN (SELECT unnest(range(1, 17)) AS j) b),
      |sgn AS MATERIALIZED (
      |  SELECT i, j,
      |    1 - 2 * CAST(CAST(h AS HUGEINT) * 1752450205419405103
      |                 % 2305843009213693951 % 2 AS BIGINT) AS s
      |  FROM (
      |    SELECT i, j,
      |      CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(k) + 1),
      |                       c -> CAST(ascii(substr(k, c, 1)) AS HUGEINT))),
      |        (a, b) -> (a * 131 + b) % 2305843009213693951) AS BIGINT) AS h
      |    FROM dims)),
      |y AS MATERIALIZED (
      |  SELECT x.vec_id, sgn.j, CAST(sum(sgn.s * x.xq[sgn.i]) AS BIGINT) AS y
      |  FROM x CROSS JOIN sgn GROUP BY 1, 2),
      |yl AS MATERIALIZED (
      |  SELECT vec_id, list(y ORDER BY j) AS yv FROM y GROUP BY 1),$extraCte
      |short AS MATERIALIZED (
      |  SELECT query_id, nb FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS nb,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(list_zip(q.yv, c.yv),
      |                         p -> (p[1]-p[2])*(p[1]-p[2]))),
      |          (a, b) -> a + b), c.vec_id) AS rn
      |    $querySrc) t
      |  WHERE rn <= $JlShort)
      |SELECT query_id, CAST(rn AS BIGINT) AS rank, nb, d2 FROM (
      |  SELECT s.query_id, s.nb,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_zip(xa.xq, xb.xq),
      |                     p -> (p[1]-p[2])*(p[1]-p[2]))),
      |      (a, b) -> a + b) AS d2,
      |    row_number() OVER (PARTITION BY s.query_id ORDER BY
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(list_zip(xa.xq, xb.xq),
      |                       p -> (p[1]-p[2])*(p[1]-p[2]))),
      |        (a, b) -> a + b), s.nb) AS rn
      |  FROM short s
      |  JOIN x xa ON xa.vec_id = s.query_id
      |  JOIN x xb ON xb.vec_id = s.nb) t
      |WHERE rn <= $JlTopK ORDER BY query_id, rank""".stripMargin

  val q196 = Q.sql("q196_jl_ann_rerank",
    jlOracleSql("",
      s"""FROM yl q JOIN yl c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id % $JlQueryMod = 0""".stripMargin)) { (s, d) =>
    val proj = jlProjected(s, d)
    jlShortlistRerank(proj, proj.filter(col("vec_id") % JlQueryMod === 0))
  }

  /** The FIXED-PANEL form of the JL shortlist+rerank evaluation
    * (round-12 verdict item #8): identical projection, shortlist, and
    * exact-rerank math — [[jlShortlistRerank]], the function q196
    * runs — with the query set the [[EvalPanel]] panel instead of a
    * corpus fraction, so the shortlist pair volume is K·N (linear in
    * the corpus): the production shape, where the JL prefilter serves
    * a fixed query workload against a growing index. */
  val q284 = Q.sql("q284_jl_rerank_panel",
    jlOracleSql(
      s"""
         |pnl AS MATERIALIZED (${EvalPanel.panelSql("x")}),""".stripMargin,
      """FROM yl q JOIN pnl ON pnl.vec_id = q.vec_id
        |    JOIN yl c ON c.vec_id <> q.vec_id""".stripMargin)) { (s, d) =>
    val proj = jlProjected(s, d)
    jlShortlistRerank(proj,
      proj.join(broadcast(EvalPanel.panel(proj)), "vec_id"))
  }

  /** The (vec_id, xq, yv) projection frame q196/q284 shortlist over —
    * checkpointed once; queries, candidates, and the rerank all read
    * it. */
  private def jlProjected(s: SparkSession, d: String): DataFrame = {
    val xq = transform(col("embedding"),
      e => floor(e.cast("double") * lit(1e4)).cast("long"))
    val ys = (0 until JlK).map { j =>
      aggregate(zip_with(col("xq"), lit(jlSigns(j)), (a, b) => a * b),
        lit(0L), (acc, e) => acc + e)
    }
    Tables.embeddings(s, d)
      .select(col("vec_id"), xq.as("xq"))
      .select(col("vec_id"), col("xq"), array(ys: _*).as("yv"))
      .localCheckpoint(true)
  }

  /** q196's shortlist + exact-rerank math over an arbitrary query
    * subset of the projection frame — shared verbatim by the
    * fraction anchor (q196) and the fixed-panel form (q284). */
  private def jlShortlistRerank(proj: DataFrame, queries: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pd2(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (p, q) => (p - q) * (p - q)),
        lit(0L), (acc, e) => acc + e)
    val q = queries
      .select(col("vec_id").as("query_id"), col("yv").as("qy"), col("xq").as("qx"))
    val short = q.join(broadcast(proj.select(col("vec_id").as("nb"), col("yv").as("cy"))),
        col("query_id") =!= col("nb"))
      .withColumn("pd", pd2("qy", "cy"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("pd"), col("nb"))))
      .filter(col("rn") <= JlShort)
      .select("query_id", "qx", "nb")
    short
      .join(broadcast(proj.select(col("vec_id").as("nb"), col("xq").as("cx"))), "nb")
      .withColumn("d2", pd2("qx", "cx"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("nb"))).cast("long"))
      .filter(col("rank") <= JlTopK)
      .select("query_id", "rank", "nb", "d2")
      .orderBy("query_id", "rank")
  }

  /** Matryoshka truncation evaluation (Kusupati et al.'s MRL deploy
    * question): how much of the full-dimension top-k survives when
    * retrieval runs on only the first [[MrlDims]] of [[MrlFullDims]]
    * dimensions? Per query, recall@10 of the truncated ranking against
    * the full ranking — the number a vector-store operator reads before
    * flipping storage to the short prefix. Both rankings use the exact
    * integer qdot (q179's quantization) with (score, id) total order,
    * so overlap counts are deterministic.
    *
    * Scale: the gate's pair table is the brute oracle anchor (q30's
    * precedent); production swaps the candidate generator (IVF/SRP) —
    * the recall math joins two (query, neighbor) top-k tables of k
    * rows per query either way. */
  val MrlDims = 16
  val MrlFullDims = 64

  val q210 = Q.sql("q210_matryoshka_recall",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, xq AS qx FROM e WHERE vec_id % 10 = 0),
       |p AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id AS nb,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(q.qx, e.xq), z -> z[1] * z[2])),
       |      (x, y) -> x + y) AS wf,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(q.qx[1:$MrlDims], e.xq[1:$MrlDims]),
       |                     z -> z[1] * z[2])),
       |      (x, y) -> x + y) AS wt
       |  FROM q JOIN e ON e.vec_id <> q.qid),
       |f AS (SELECT qid, nb FROM (
       |  SELECT qid, nb, row_number() OVER (PARTITION BY qid ORDER BY wf DESC, nb) AS rn
       |  FROM p) WHERE rn <= 10),
       |t AS (SELECT qid, nb FROM (
       |  SELECT qid, nb, row_number() OVER (PARTITION BY qid ORDER BY wt DESC, nb) AS rn
       |  FROM p) WHERE rn <= 10)
       |SELECT f.qid AS vec_id, CAST(count(t.nb) AS BIGINT) AS n_overlap,
       |  round(count(t.nb) / 10.0, 4) AS recall_at_10
       |FROM f LEFT JOIN t ON t.qid = f.qid AND t.nb = f.nb
       |GROUP BY 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    mrlRecall(e, e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qx")))
  }

  /** q210's recall math over an arbitrary query frame (qid, qx) —
    * shared verbatim by the whole-fraction anchor (q210) and the
    * fixed-panel form (q282), so the two can differ ONLY in the query
    * set. */
  private def mrlRecall(e: org.apache.spark.sql.DataFrame,
      q: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = q.join(broadcast(e.filter(lit(true))), col("vec_id") =!= col("qid"))
      .withColumn("wf", graft.functions.Exprs.qdot(col("qx"), col("embedding")))
      .withColumn("wt", graft.functions.Exprs.qdot(
        slice(col("qx"), 1, MrlDims), slice(col("embedding"), 1, MrlDims)))
      .select(col("qid"), col("vec_id").as("nb"), col("wf"), col("wt"))
      .localCheckpoint(true) // both rankings read the pair table
    val f = p.withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("wf").desc, col("nb"))))
      .filter(col("rn") <= 10).select("qid", "nb")
    val t = p.withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("wt").desc, col("nb"))))
      .filter(col("rn") <= 10)
      .select(col("qid").as("t_qid"), col("nb").as("t_nb"))
    f.join(t, col("t_qid") === col("qid") && col("t_nb") === col("nb"), "left")
      .groupBy(col("qid").as("vec_id"))
      .agg(count(col("t_nb")).as("n_overlap"),
        round(count(col("t_nb")) / 10.0, 4).as("recall_at_10"))
      .orderBy("vec_id")
  }

  /** The FIXED-PANEL form of the matryoshka evaluation (round-12
    * verdict item #8, the class-C graduation): identical recall math —
    * [[mrlRecall]], the function q210 itself runs — but the query set
    * is the [[EvalPanel]]'s deterministic hash-selected [[EvalPanel.PanelK]]
    * vectors instead of a corpus fraction, so the brute truth table is
    * K·N (LINEAR in the corpus) and models how eval actually runs at
    * 100 TB: a fixed query workload against a growing index. A panel
    * query that q210 also covers gets the IDENTICAL recall row
    * (EngineSpec pins the overlap equality). */
  val q282 = Q.sql("q282_matryoshka_recall_panel",
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   v -> CAST(floor(v * 100000000.0) AS BIGINT)) AS xq
       |  FROM embeddings),
       |pnl AS MATERIALIZED (${EvalPanel.panelSql()}),
       |q AS (SELECT vec_id AS qid, xq AS qx FROM e JOIN pnl USING (vec_id)),
       |p AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id AS nb,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(q.qx, e.xq), z -> z[1] * z[2])),
       |      (x, y) -> x + y) AS wf,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_zip(q.qx[1:$MrlDims], e.xq[1:$MrlDims]),
       |                     z -> z[1] * z[2])),
       |      (x, y) -> x + y) AS wt
       |  FROM q JOIN e ON e.vec_id <> q.qid),
       |f AS (SELECT qid, nb FROM (
       |  SELECT qid, nb, row_number() OVER (PARTITION BY qid ORDER BY wf DESC, nb) AS rn
       |  FROM p) WHERE rn <= 10),
       |t AS (SELECT qid, nb FROM (
       |  SELECT qid, nb, row_number() OVER (PARTITION BY qid ORDER BY wt DESC, nb) AS rn
       |  FROM p) WHERE rn <= 10)
       |SELECT f.qid AS vec_id, CAST(count(t.nb) AS BIGINT) AS n_overlap,
       |  round(count(t.nb) / 10.0, 4) AS recall_at_10
       |FROM f LEFT JOIN t ON t.qid = f.qid AND t.nb = f.nb
       |GROUP BY 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = graft.Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    mrlRecall(e, e.join(broadcast(EvalPanel.panel(e)), "vec_id")
      .select(col("vec_id").as("qid"), col("embedding").as("qx")))
  }

  /** Embedding-norm census — the health check an embedding store runs
    * before anything consumes the vectors (a collapsed encoder shows
    * up as tiny or wildly spread norms; a missed L2-normalization as
    * norms off 1.0): per label, the micro-quantized L2 norm's
    * min/max/mean and the count of vectors whose norm sits more than
    * 1% off unit. The squared-sum folds in PINNED index order on both
    * engines (the q163 device — Spark `aggregate` ≡ DuckDB
    * `list_reduce(list_prepend(0.0, …))`), IEEE sqrt is correctly
    * rounded everywhere, and floor-quantization to micros makes every
    * later stat integer-exact (mean via the q233 half-up device).
    * One stateless scan + a labels-sized aggregate. */
  val q268 = Q.sql("q268_norm_census",
    """WITH v AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST(floor(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
      |      (a, x) -> a + x)) * 1000000.0) AS BIGINT) AS qn
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(qn) AS BIGINT) AS min_norm_micro,
      |  CAST(max(qn) AS BIGINT) AS max_norm_micro,
      |  CAST((CAST(sum(qn) AS BIGINT) + 50 * count(*))
      |       // (100 * count(*)) AS DOUBLE) / 10000.0 AS mean_norm,
      |  CAST(sum(CASE WHEN abs(qn - 1000000) > 10000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_off_unit
      |FROM v GROUP BY 1 ORDER BY label""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        floor(sqrt(aggregate(
          transform(col("embedding"), x => {
            val xd = x.cast("double"); xd * xd
          }),
          lit(0.0), (a, x) => a + x)) * 1000000.0).cast("long").as("qn"))
      .groupBy("label")
      .agg(count(lit(1)).cast("long").as("n"),
        min("qn").cast("long").as("min_norm_micro"),
        max("qn").cast("long").as("max_norm_micro"),
        sum("qn").cast("long").as("sq"),
        sum(when(abs(col("qn") - 1000000L) > 10000L, 1L).otherwise(0L))
          .cast("long").as("n_off_unit"))
      .select(col("label"), col("n"), col("min_norm_micro"),
        col("max_norm_micro"),
        (expr("CAST((sq + 50 * n) div (100 * n) AS DOUBLE)") / 10000.0)
          .as("mean_norm"),
        col("n_off_unit"))
      .orderBy("label")
  }

  val all: Seq[Q] = Seq(q162, q163, q164, q168, q196, q210, q268, q282, q284)
}
