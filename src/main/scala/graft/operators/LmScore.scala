package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Model-based document scoring — the selection stage of a training-data
  * pipeline that sits between the quality fences (WebQuality, TextStats)
  * and the mixing/budget stages (DataSplit, TrainingPipeline):
  *
  *  - q272: CCNet-style language-model cross-entropy filtering (Wenzek et
  *    al., LREC 2020): score every document under a bigram LM trained on
  *    a trusted slice; high perplexity = far from the target distribution.
  *  - q273: TF-IDF keyword extraction (Spärck Jones 1972) — the per-doc
  *    topical fingerprint used for clustering, search, and topic caps.
  *  - q274: DSIR importance weighting (Xie et al., NeurIPS 2023): per-doc
  *    log-likelihood ratio between a target-domain n-gram bag model and
  *    the raw-corpus model; documents that look more like the target than
  *    like the crawl get selected.
  *  - q275: per-source language-mix KL divergence against the corpus mix —
  *    the domain-drift census a crawl operator watches per ingest source.
  *
  * All four keep the arithmetic integer-exact: counts are BIGINT, every
  * log is the piecewise-linear qlog2 in 1/1024-bit units (the q181/q252
  * device — identical closed form in Spark and DuckDB, no libm), and
  * every ratio that must leave integers does so via the sign-aware
  * half-up `(2p ± q) div (2q)` identity pinned by PropertySpec.
  *
  * Scale: the MODELS here are vocabulary-/type-bounded, not corpus-
  * bounded — exactly why this stage works at 100 TB: train on a sample
  * (or trusted slice), prune to the top-M features, broadcast the model
  * table to every executor (CCNet ships its KenLM model to every worker
  * the same way), and scoring is ONE corpus scan with a map-side join.
  * The gate-scale plans below broadcast the unpruned model tables; the
  * corpus-side token/bigram explode never carries text past the explode.
  */
object LmScore {

  /** qlog2 in 1/1024-bit units, engine side: the codegen intrinsic
    * [[graft.functions.Exprs.qlog2]] (value-identical to the SQL
    * `length(bin(x))` device the oracles keep — no per-row string
    * allocation in the scoring loop). */
  private def ql(x: org.apache.spark.sql.Column) = Exprs.qlog2(x)

  /** qlog2 — DuckDB dialect. */
  private def qld(x: String) = s"((length(bin($x)) - 1) * 1024" +
    s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"

  /** The trusted training slice for q272/q274: English documents. */
  val TrainLang = "en"

  /** Shared oracle prefix for q272/q276: the add-one bigram LM's
    * per-document (n_bigrams, sum_qb, xent_qb) table as a WITH chain
    * ending in `agg2`. */
  private val xentOracleCtes =
    s"""tk AS MATERIALIZED (
       |  SELECT doc_id, lang, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents) d,
       |  LATERAL unnest(range(0, len(toks))) AS u(i)),
       |bg AS MATERIALIZED (
       |  SELECT a.doc_id, a.lang, a.tok AS w1, b.tok AS w2
       |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.off = a.off + 1),
       |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy FROM bg
       |       WHERE lang = '$TrainLang' GROUP BY 1, 2),
       |cc AS (SELECT w1, CAST(sum(cxy) AS BIGINT) AS cx FROM cb GROUP BY 1),
       |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tk
       |       WHERE lang = '$TrainLang'),
       |sc AS (
       |  SELECT g.doc_id, coalesce(cb.cxy, 0) + 1 AS num,
       |    coalesce(cc.cx, 0) + vv.v AS den
       |  FROM bg g LEFT JOIN cb ON cb.w1 = g.w1 AND cb.w2 = g.w2
       |    LEFT JOIN cc ON cc.w1 = g.w1 CROSS JOIN vv),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(${qld("den")} - ${qld("num")}) AS BIGINT) AS sum_qb
       |  FROM sc GROUP BY 1),
       |agg2 AS (
       |  SELECT doc_id, n_bigrams, sum_qb,
       |    CAST((2 * sum_qb + n_bigrams) // (2 * n_bigrams) AS BIGINT)
       |      AS xent_qb
       |  FROM agg)""".stripMargin

  /** Shared engine side: the per-document
    * (doc_id, n_bigrams, sum_qb, xent_qb) frame. */
  private def xentFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("lang"),
        col("off").cast("long").as("off"), col("tok"))
    val bg = tk.select(col("doc_id"), col("lang"), col("off"),
        col("tok").as("w1"))
      .join(tk.select(col("doc_id"), (col("off") - 1).as("off"),
        col("tok").as("w2")), Seq("doc_id", "off"))
      .select("doc_id", "lang", "w1", "w2")
      .localCheckpoint(true) // model counts + the scoring pass read it
    val cb = bg.filter(col("lang") === TrainLang)
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("cxy"))
    val cc = cb.groupBy("w1").agg(sum("cxy").cast("long").as("cx"))
    val vv = tk.filter(col("lang") === TrainLang)
      .agg(count_distinct(col("tok")).cast("long").as("v"))
    bg.join(broadcast(cb), Seq("w1", "w2"), "left")
      .join(broadcast(cc), Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .na.fill(0L, Seq("cxy", "cx"))
      .withColumn("num", col("cxy") + 1L)
      .withColumn("den", col("cx") + col("v"))
      .withColumn("cost_qb", ql(col("den")) - ql(col("num")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("cost_qb").cast("long").as("sum_qb"))
      .withColumn("xent_qb",
        expr("CAST((2 * sum_qb + n_bigrams) div (2 * n_bigrams) AS BIGINT)"))
  }

  /** CCNet-style LM cross-entropy filter: add-one-smoothed bigram LM
    * trained on the [[TrainLang]] slice, every document scored as its
    * total and per-bigram average negative log₂-likelihood in qlog2
    * units. Unseen context w1 degrades to the uniform 1/V floor —
    * exactly add-one smoothing with a zero count. Documents with fewer
    * than two tokens carry no bigram evidence and are excluded (both
    * engines derive the roster from the same bigram table).
    *
    * Plan: one token posexplode → one self-join to form bigrams (the
    * q252 shape) → model counts (bigram-type-bounded) → broadcast
    * model back onto the bigram stream → one groupBy(doc_id). At 100 TB
    * the model comes from a sample and is pruned before broadcast; the
    * scoring pass stays a single scan. */
  val q272 = Q.sql("q272_lm_xent",
    s"""WITH $xentOracleCtes
       |SELECT doc_id, n_bigrams, sum_qb, xent_qb
       |FROM agg2 ORDER BY doc_id""".stripMargin) { (s, d) =>
    xentFrame(s, d).orderBy("doc_id")
  }

  /** Curriculum mixing by LM score (Bengio et al.'s curriculum
    * learning applied the way perplexity-ordered pretraining does it):
    * documents are ranked easy→hard by the q272 cross-entropy and cut
    * into [[CurriculumStages]] equal stages (ntile over the
    * (xent_qb, doc_id) total order — deterministic in both engines),
    * and the census reports each (stage, source) cell's document
    * count, token mass, and xent range — the table a training-mix
    * owner reads to see WHICH sources dominate the easy and hard ends
    * of the curriculum. The global ntile ROUTES on the corpus size
    * (round-12 advice, the BroadcastRankCap discipline): at or under
    * [[CurriculumWindowCap]] scored docs it is the single-partition
    * window (cheapest at gate scale); above it,
    * [[globalNtileStages]] — a range-partitioned sort plus a
    * partition-offset global rank, no single-partition stage anywhere
    * — computes the IDENTICAL tile assignment (EngineSpec pins the two
    * routes equal row-for-row). */
  val CurriculumStages = 4

  /** Docs at/below which q276 keeps the one-partition ntile window; a
    * few-million-row slim (doc_id, xent, source) sort on one core is
    * cheaper than the extra pass the distributed route pays. Above it
    * the window would serialize the whole corpus through one task —
    * the route flips to [[globalNtileStages]]. */
  val CurriculumWindowCap = 2000000L

  /** ntile(`tiles`) over a GLOBAL total order without a global window:
    * `orderBy` range-partitions and locally sorts (Spark's distributed
    * sort — no single-partition stage), a first cheap pass collects
    * per-partition row COUNTS (longs, one per partition), and a second
    * pass assigns each row its global rank = partition offset + local
    * position, mapping rank→tile with ntile's exact fence arithmetic
    * (first n mod t tiles get ⌈n/t⌉ rows, the rest ⌊n/t⌋). Value-
    * identical to `ntile(t) OVER (ORDER BY …)` by construction because
    * the order columns are a UNIQUE key (ties don't exist, so range
    * boundary placement can't reorder equal rows). The checkpoint pins
    * the sorted blocks so both passes read the same layout. */
  private[graft] def globalNtileStages(df: org.apache.spark.sql.DataFrame,
      tiles: Int, orderCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*).localCheckpoint(true)
    val counts = sorted.rdd
      // fold in Long: Iterator.size returns Int, and this route is
      // explicitly the >2M-doc path — a >2³¹-row partition would
      // silently overflow and corrupt every rank offset (round-13 advice)
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.foldLeft(0L)((n, _) => n + 1))))
      .collect().sortBy(_._1).map(_._2) // one long per partition
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = counts.sum
    val q = n / tiles; val r = n % tiles
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("stage",
        org.apache.spark.sql.types.LongType, nullable = false))
    val offB = spark.sparkContext.broadcast(offsets)
    val staged = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = offB.value(i)
      it.map { row =>
        rank += 1
        // ntile fence: ranks 1..r·(q+1) fall in the r fat tiles
        val stage =
          if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
          else r + (rank - r * (q + 1) - 1) / q + 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ stage)
      }
    }
    spark.createDataFrame(staged, schema)
  }

  val q276 = Q.sql("q276_curriculum_mix",
    s"""WITH $xentOracleCtes,
       |st AS (
       |  SELECT a.doc_id, a.n_bigrams, a.xent_qb, d.source,
       |    CAST(ntile($CurriculumStages)
       |      OVER (ORDER BY a.xent_qb, a.doc_id) AS BIGINT) AS stage
       |  FROM agg2 a JOIN documents d USING (doc_id))
       |SELECT stage, source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bigrams + 1) AS BIGINT) AS n_tokens,
       |  CAST(min(xent_qb) AS BIGINT) AS xent_min_qb,
       |  CAST(max(xent_qb) AS BIGINT) AS xent_max_qb
       |FROM st GROUP BY 1, 2 ORDER BY stage, source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val x = xentFrame(s, d)
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .localCheckpoint(true) // the route count + staging both read it
    val staged =
      if (x.count() <= CurriculumWindowCap)
        x.withColumn("stage", ntile(CurriculumStages)
          .over(Window.orderBy(col("xent_qb"), col("doc_id"))).cast("long"))
      else
        globalNtileStages(x, CurriculumStages, Seq("xent_qb", "doc_id"))
    staged
      .groupBy("stage", "source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_bigrams") + 1L).cast("long").as("n_tokens"),
        min("xent_qb").cast("long").as("xent_min_qb"),
        max("xent_qb").cast("long").as("xent_max_qb"))
      .orderBy("stage", "source")
  }

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf · (qlog2(N) − qlog2(df)) — an all-integer idf, ties broken by
    * token text. The df table is vocabulary-sized (broadcast at gate
    * scale; at 100 TB the tf→df join shuffles once on the token, the
    * Postings discipline — and df itself is the postings-list length
    * the BM25 family already maintains). */
  val q273 = Q.sql("q273_tfidf_keywords",
    s"""WITH tk AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |       FROM tk GROUP BY 1, 2),
       |df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM tk GROUP BY 1),
       |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tk),
       |sc AS (
       |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
       |    tf.tf * (${qld("nn.n")} - ${qld("df.df")}) AS score_qb
       |  FROM tf JOIN df USING (tok) CROSS JOIN nn),
       |rk AS (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score_qb DESC, tok) AS BIGINT) AS rk
       |  FROM sc)
       |SELECT doc_id, tok, tf, df, score_qb, rk
       |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .localCheckpoint(true) // tf, df, and N all read it
    val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("tf"))
    val dfT = tk.groupBy("tok").agg(count_distinct(col("doc_id")).cast("long").as("df"))
    val nn = tk.agg(count_distinct(col("doc_id")).cast("long").as("n"))
    tf.join(broadcast(dfT), "tok").crossJoin(broadcast(nn))
      .withColumn("score_qb", col("tf") * (ql(col("n")) - ql(col("df"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score_qb").desc, col("tok"))).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "tok", "tf", "df", "score_qb", "rk")
      .orderBy("doc_id", "rk")
  }

  /** DSIR importance weight (Xie et al. 2023): per document, the
    * log-likelihood ratio between an add-one bigram BAG model of the
    * target slice (lang = [[TrainLang]]) and the same model of the raw
    * corpus: w = Σ_g [ql(c_t(g)+1) − ql(c_r(g)+1)] + n·[ql(T_r+V) −
    * ql(T_t+V)]. `selected` = (w_qb > 0) is the deterministic stand-in
    * for DSIR's ∝-weight sampling. Unlike q272 (a conditional LM with
    * per-context normalization) this is the bag-of-features form the
    * paper uses — both models share one explode and one gram-count
    * pass; V is the raw corpus's gram-type count, so the target model
    * is smoothed over the same support. */
  val q274 = Q.sql("q274_dsir_importance",
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents)
       |  WHERE len(toks) >= 2),
       |ct AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM g
       |       WHERE lang = '$TrainLang' GROUP BY 1),
       |cr AS MATERIALIZED (SELECT gram, CAST(count(*) AS BIGINT) AS c
       |       FROM g GROUP BY 1),
       |tt AS (SELECT
       |    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ct) AS t_t,
       |    CAST(sum(c) AS BIGINT) AS t_r, CAST(count(*) AS BIGINT) AS v
       |  FROM cr),
       |sc AS (
       |  SELECT g.doc_id, coalesce(ct.c, 0) + 1 AS nt, cr.c + 1 AS nr
       |  FROM g LEFT JOIN ct USING (gram) JOIN cr USING (gram)),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(${qld("nt")} - ${qld("nr")}) AS BIGINT) AS s
       |  FROM sc GROUP BY 1),
       |fin AS (
       |  SELECT doc_id, n_bigrams,
       |    CAST(s + n_bigrams * (${qld("tt.t_r + tt.v")} - ${qld("tt.t_t + tt.v")})
       |      AS BIGINT) AS w_qb
       |  FROM agg CROSS JOIN tt)
       |SELECT doc_id, n_bigrams, w_qb,
       |  CAST(CASE WHEN w_qb > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
       |FROM fin ORDER BY doc_id""".stripMargin) { (s, d) =>
    val g = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(Text.shingles(Text.tokens(col("text")), 2)).as("gram"))
      .localCheckpoint(true) // both model counts + the scoring pass read it
    val ct = g.filter(col("lang") === TrainLang)
      .groupBy("gram").agg(count(lit(1)).cast("long").as("ct"))
    val cr = g.groupBy("gram").agg(count(lit(1)).cast("long").as("cr"))
      .localCheckpoint(true) // totals + the per-gram join read it
    val tt = cr.agg(sum("cr").cast("long").as("t_r"),
        count(lit(1)).cast("long").as("v"))
      .crossJoin(broadcast(
        ct.agg(coalesce(sum("ct"), lit(0L)).cast("long").as("t_t"))))
    g.join(broadcast(ct), Seq("gram"), "left")
      .join(broadcast(cr), Seq("gram"))
      .na.fill(0L, Seq("ct"))
      .withColumn("nt", col("ct") + 1L)
      .withColumn("nr", col("cr") + 1L)
      .withColumn("contrib_qb", ql(col("nt")) - ql(col("nr")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("contrib_qb").cast("long").as("s"))
      .crossJoin(broadcast(tt))
      .withColumn("w_qb", (col("s") + col("n_bigrams") *
        (ql(col("t_r") + col("v")) - ql(col("t_t") + col("v")))).cast("long"))
      .withColumn("selected",
        expr("CAST(CASE WHEN w_qb > 0 THEN 1 ELSE 0 END AS BIGINT)"))
      .select("doc_id", "n_bigrams", "w_qb", "selected")
      .orderBy("doc_id")
  }

  /** Per-source language-mix drift: KL(source mix ‖ corpus mix) in
    * qlog2 units, averaged per document with the sign-aware half-up
    * device (the qlog2 approximation can take a near-zero KL a hair
    * negative even though true KL ≥ 0). Everything past the one
    * (source, lang) count runs on a |sources|×|langs| table — the
    * census costs one scan at any corpus size.
    *
    * Domain precondition (q252's product caveat applies): the KL terms
    * feed qlog2 the PRODUCTS nsl·n and ns·nl, so the kernel's 2^53
    * ceiling binds at nsl·n ≤ 2^53 — a hard `require` failure, never a
    * silent wrong answer. With cells bounded by n that is n ≤ ~9.5·10⁷
    * docs in the worst (single-cell) case and n ≤ 2^53/max(nsl)
    * generally; past it, divide both log arguments by
    * gcd-or-any-common-factor (qlog2(a·x)−qlog2(b·x) drifts only within
    * the device's 0.0871-bit envelope) or score per-shard censuses and
    * sum — the oracle spelling keeps computing past 2^53, so the engine
    * guards the seam rather than diverging quietly. */
  val q275 = Q.sql("q275_source_lang_kl",
    s"""WITH c AS MATERIALIZED (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS nsl
       |  FROM documents GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(nsl) AS BIGINT) AS ns FROM c GROUP BY 1),
       |lt AS (SELECT lang, CAST(sum(nsl) AS BIGINT) AS nl FROM c GROUP BY 1),
       |nt AS (SELECT CAST(sum(nsl) AS BIGINT) AS n FROM c),
       |sc AS (
       |  SELECT c.source, st.ns,
       |    c.nsl * (${qld("c.nsl * nt.n")} - ${qld("st.ns * lt.nl")}) AS contrib_qb
       |  FROM c JOIN st USING (source) JOIN lt USING (lang) CROSS JOIN nt),
       |agg AS (
       |  SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
       |    CAST(sum(contrib_qb) AS BIGINT) AS sum_qb
       |  FROM sc GROUP BY 1)
       |SELECT source, n_docs, sum_qb,
       |  CAST((2 * sum_qb + CASE WHEN sum_qb < 0 THEN -n_docs ELSE n_docs END)
       |    // (2 * n_docs) AS BIGINT) AS kl_qb
       |FROM agg ORDER BY source""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).cast("long").as("nsl"))
      .localCheckpoint(true) // margins + the contribution join read it
    val st = c.groupBy("source").agg(sum("nsl").cast("long").as("ns"))
    val lt = c.groupBy("lang").agg(sum("nsl").cast("long").as("nl"))
    val nt = c.agg(sum("nsl").cast("long").as("n"))
    c.join(broadcast(st), "source").join(broadcast(lt), "lang")
      .crossJoin(broadcast(nt))
      .withColumn("contrib_qb",
        col("nsl") * (ql(col("nsl") * col("n")) - ql(col("ns") * col("nl"))))
      .groupBy("source")
      .agg(max("ns").cast("long").as("n_docs"),
        sum("contrib_qb").cast("long").as("sum_qb"))
      .withColumn("kl_qb",
        expr("CAST((2 * sum_qb + CASE WHEN sum_qb < 0 THEN -n_docs ELSE n_docs END)"
          + " div (2 * n_docs) AS BIGINT)"))
      .select("source", "n_docs", "sum_qb", "kl_qb")
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(q272, q273, q274, q275, q276)
}
