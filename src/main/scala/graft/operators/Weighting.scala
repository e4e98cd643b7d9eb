package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Corpus-level data-selection operators — the step between a cleaned
  * corpus and the training mix, where docs are SCORED against the whole
  * corpus (or a target domain) and kept, bucketed, or resampled by that
  * score:
  *
  *  - CCNet-style LM-score binning (Wenzek et al., LREC'20): score every
  *    doc under a corpus language model, then cut each language into
  *    head/middle/tail thirds so a mix can oversample the head;
  *  - DSIR hashed-ngram importance weighting (Xie et al., NeurIPS'23):
  *    weight every raw doc by how target-domain-like its hashed n-gram
  *    features are, then resample the raw pool by that weight.
  *
  * Both follow the repo's oracle-determinism rules (operators.Q): no
  * transcendentals — the LM score is the exact mean corpus-frequency of
  * the doc's bigrams (a monotone surrogate for log-likelihood kept in
  * integer arithmetic; the binning machinery is identical), and the DSIR
  * weight uses the scaled LINEAR probability ratio rather than its log
  * (same feature estimator, same ranking for single-bucket docs; the log
  * variant is a one-line swap where bit-replay is not required).
  */
object Weighting {

  /** Leave-one-out target encoding with additive smoothing — the
    * category-to-number feature transform gradient-boosting pipelines
    * apply (CatBoost's ordered variant randomizes; LOO is the
    * deterministic batch form): a row's encoding is the mean target of
    * its OWN category EXCLUDING itself, shrunk toward the global mean
    * by pseudo-count m = 10 — excluding self is what stops the feature
    * from leaking the row's label. encᵢ = (S_c − vᵢ + m·μ)/(n_c − 1 + m).
    *
    * Exactness: targets quantize to integer micros, so S_c and the
    * global sum are exact BIGINTs; μ and the final division are ONE
    * fixed IEEE expression both engines evaluate identically, rounded
    * once (+0.0 on the oracle — encodings can sit near a signed zero).
    * Scale: one aggregate for the category table (broadcast), one
    * stateless map over rows. */
  val q229 = Q.sql("q229_target_encoding",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS vq
      |  FROM events WHERE value IS NOT NULL),
      |c AS (SELECT event_type, CAST(sum(vq) AS BIGINT) AS st,
      |        CAST(count(*) AS BIGINT) AS nt
      |      FROM v GROUP BY 1),
      |g AS (SELECT CAST(sum(vq) AS BIGINT) AS sall,
      |        CAST(count(*) AS BIGINT) AS nall FROM v)
      |SELECT v.event_id, v.event_type,
      |  round((CAST(c.st - v.vq AS DOUBLE)
      |         + 10.0 * (CAST(g.sall AS DOUBLE) / g.nall))
      |        / ((c.nt - 1 + 10) * 1000000.0), 4) + 0.0 AS enc
      |FROM v JOIN c USING (event_type) CROSS JOIN g
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val v = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
    val c = v.groupBy("event_type")
      .agg(sum("vq").cast("long").as("st"), count(lit(1)).cast("long").as("nt"))
    val g = v.agg(sum("vq").cast("long").as("sall"),
      count(lit(1)).cast("long").as("nall"))
    v.join(broadcast(c), "event_type").crossJoin(broadcast(g))
      .select(col("event_id"), col("event_type"),
        round((expr("CAST(st - vq AS DOUBLE)")
          + lit(10.0) * (expr("CAST(sall AS DOUBLE)") / col("nall")))
          / ((col("nt") - 1 + 10) * lit(1000000.0)), 4).as("enc"))
      .orderBy("event_id")
  }

  /** CCNet head/middle/tail buckets. Per doc: mean corpus-frequency of
    * its word bigrams, in exact integer micros (sum of per-gram corpus
    * counts ×1e6, floor-divided by the doc's gram count); then ntile(3)
    * within each language, best score first, doc_id tie-break.
    *
    * Scale shape: one shuffle to count grams, one shuffle-join of the
    * gram stream against the count table (AQE turns it broadcast when
    * the vocabulary is small, as at gate scale), one fold to docs. The
    * per-language ntile is the gate-scale form of the cut; at 100 TB the
    * two cut points per language come from the mergeable binned-quantile
    * sketch (q114's machinery) and bucket assignment becomes a stateless
    * compare — same output up to sketch resolution, no global sort.
    */
  val q123 = Q.sql("q123_ccnet_buckets",
    """WITH t AS (
      |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |                                       i -> toks[i] || ' ' || toks[i+1])) AS g
      |  FROM t),
      |c AS (SELECT g, count(*) AS c FROM g GROUP BY 1),
      |sc AS (
      |  SELECT doc_id, sum(c.c) AS s, count(*) AS n
      |  FROM g JOIN c USING (g) GROUP BY 1),
      |s2 AS (
      |  SELECT t.doc_id, t.lang,
      |    CAST(coalesce((sc.s * 1000000) // sc.n, 0) AS BIGINT) AS score_micro
      |  FROM t LEFT JOIN sc USING (doc_id))
      |SELECT doc_id, lang, score_micro,
      |  CASE ntile(3) OVER (PARTITION BY lang
      |                      ORDER BY score_micro DESC, doc_id)
      |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      |FROM s2 ORDER BY doc_id""".stripMargin) { (s, d) =>
    ccnetBuckets(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** (doc_id, lang, score_micro) for every doc — the scoring pass both
    * bucket assigners share. */
  private def lmScores(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("lang"), col("text"))
    val grams = base.select(col("doc_id"),
      explode(Text.shingles(Text.tokens(col("text")), 2)).as("g"))
    val counts = grams.groupBy("g").agg(count(lit(1)).as("c"))
    val scored = grams.join(counts, "g")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      .select(col("doc_id"),
        expr("(s * 1000000) div n").as("score_micro"))
    base.select("doc_id", "lang")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("score_micro", coalesce(col("score_micro"), lit(0L)))
  }

  /** The q123 rule over any (doc_id, lang, text) frame. */
  def ccnetBuckets(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(col("score_micro").desc, col("doc_id"))
    lmScores(documents)
      .withColumn("bucket",
        when(ntile(3).over(w) === 1, "head")
          .when(ntile(3).over(w) === 2, "middle")
          .otherwise("tail"))
  }

  /** The 100 TB form of [[ccnetBuckets]]: per-language cut points from a
    * binned score histogram (q114's sketch shape — bounded integer
    * state, mergeable under partial aggregation) instead of a
    * per-language global sort. The two cuts per language are the bins
    * where the descending cumulative count first reaches ⌈N/3⌉ and
    * ⌈2N/3⌉; assignment is then a stateless compare against the
    * broadcast cut table. Disagreement with the exact thirds is
    * confined to docs whose score lands IN a cut bin (resolution = bin
    * width; ties at a cut all go to the better bucket) — EngineSpec
    * pins that bound. */
  def ccnetBucketsApprox(documents: DataFrame, binMicros: Long): DataFrame = {
    val scored = lmScores(documents)
      .withColumn("bin", expr(s"score_micro div $binMicros"))
    val hist = scored.groupBy("lang", "bin").agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy("lang")
    val cum = hist
      .withColumn("cum", sum("c").over(byLang.orderBy(col("bin").desc)))
      .withColumn("total", sum("c").over(byLang))
    // descending cumulative ⇒ the crossing bin is the LARGEST bin whose
    // cum has reached the target (q114's ascending form uses min)
    def cut(frac: Double) =
      max(when(col("cum") >= ceil(lit(frac) * col("total")), col("bin")))
    val cuts = cum.groupBy("lang")
      .agg(cut(1.0 / 3).as("head_bin"), cut(2.0 / 3).as("mid_bin"))
    scored.join(broadcast(cuts), "lang")
      .withColumn("bucket",
        when(col("bin") >= col("head_bin"), "head")
          .when(col("bin") >= col("mid_bin"), "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "score_micro", "bucket")
  }

  /** DSIR feature-space size: bigrams hash into this many buckets. The
    * paper uses 10k; 64 keeps the gate's feature table printable while
    * exercising the identical plumbing (the constant appears in the
    * oracle SQL, so changing it is a two-site edit). */
  private[graft] val DSIR_BUCKETS = 64L

  /** Importance weight of every doc against a target domain, plus the
    * resample decision (top-`keep` by weight). Features are bigram
    * counts hashed into [[DSIR_BUCKETS]] buckets with the
    * oracle-replayable poly-131/mod-2^61−1 family (the q26/q28 hashes);
    * the per-gram weight is the add-one-smoothed probability ratio
    *
    *   ((ct[b]+1)/(Nt+B)) / ((cr[b]+1)/(Nr+B))
    *
    * carried as the exact integer `((ct+1)·(Nr+B)·1e6) // ((cr+1)·(Nt+B))`
    * and summed per doc — BIGINT-exact on both engines (the factors stay
    * < 2^63 at gate scale; the 100 TB form lifts the product into
    * DECIMAL(38) or pre-normalizes the ratio table to micros, which is
    * the same 64-row broadcast either way).
    *
    * Scale shape: two scans of the gram stream (bucket counts, then the
    * weight fold) — the feature table is B rows and broadcasts; nothing
    * else shuffles wider than (doc_id, bucket). The global top-`keep`
    * rank is gate-scale; the deployment form is the mergeable bounded
    * heap q30 ranks with.
    */
  val q124 = Q.sql("q124_dsir_weights",
    """WITH t AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(toks)),
      |                                i -> toks[i] || ' ' || toks[i+1])) AS g
      |  FROM t),
      |h AS (
      |  SELECT doc_id, source,
      |    CAST(list_reduce(
      |      list_prepend(CAST(0 AS HUGEINT),
      |        list_transform(range(1, length(g) + 1),
      |                       i -> CAST(ascii(substr(g, i, 1)) AS HUGEINT))),
      |      (a, b) -> (a * 131 + b) % 2305843009213693951) % 64 AS BIGINT) AS b
      |  FROM g),
      |raw AS (SELECT b, count(*) AS cr FROM h GROUP BY 1),
      |tgt AS (SELECT b, count(*) AS ct FROM h
      |        WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
      |tot AS (SELECT count(*) AS nr,
      |          sum(CASE WHEN source IN ('src0', 'src1', 'src2')
      |              THEN 1 ELSE 0 END) AS nt FROM h),
      |term AS (
      |  SELECT h.doc_id,
      |    CAST((CAST(coalesce(tgt.ct, 0) + 1 AS HUGEINT) * (tot.nr + 64) * 1000000)
      |         // (CAST(raw.cr + 1 AS HUGEINT) * (tot.nt + 64)) AS BIGINT) AS term
      |  FROM h JOIN raw USING (b) LEFT JOIN tgt USING (b) CROSS JOIN tot),
      |w AS (SELECT doc_id, sum(term) AS w FROM term GROUP BY 1)
      |SELECT t.doc_id,
      |  CAST(coalesce(w.w, 0) AS BIGINT) AS w_micro,
      |  (row_number() OVER (ORDER BY coalesce(w.w, 0) DESC, t.doc_id)) <= 100 AS kept
      |FROM t LEFT JOIN w USING (doc_id) ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    dsirWeights(Tables.documents(s, d),
      targetSources = Set("src0", "src1", "src2"), keep = 100)
      .orderBy("doc_id")
  }

  /** q124's per-doc weight frame (doc_id, w_micro), i.e. everything
    * below the keep-top rank — split out so the gram-stream join shape
    * stays plan-visible ([[dsirWeights]] routes this frame through
    * ScaleWindows, whose checkpoint truncates the explained plan).
    *
    * `wide = true` forces the wide arithmetic: the per-bucket ratio
    * `(ct+1)(Nr+B)·1e6 // (cr+1)(Nt+B)` overflows BIGINT once
    * `(max ct+1)·(Nr+B)·10⁶` exceeds 2⁶³ — with a target-heavy bucket
    * that can happen at ~10⁷ gram occurrences, far below the "100 TB
    * regime" (the naive ~10¹³ reading ignores that ct GROWS WITH Nr).
    * The wide path collects the B-row count table (bounded driver
    * state — B = 64 rows regardless of corpus size) and computes the
    * terms in BigInt before broadcasting them back. `wide = false` is
    * therefore only a REQUEST: the narrow expression is used only
    * after an exact bound check on the (already materialized) B-row
    * counts proves no term can overflow; otherwise the call
    * auto-upgrades to wide. Identical output wherever the narrow path
    * is safe (spec-pinned). */
  private[graft] def dsirWeightFrame(documents: DataFrame,
      targetSources: Set[String], wide: Boolean): DataFrame = {
    val isTarget = col("source").isin(targetSources.toSeq: _*)
    val base = documents.select(col("doc_id"), col("source"), col("text"))
    def gramBuckets(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("source"),
        explode(Text.shingles(Text.tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"), col("source"),
        pmod(Exprs.poly_hash(col("g")), lit(DSIR_BUCKETS)).as("b"))
    val h = gramBuckets(base)
    // raw and target bucket counts in ONE pass over the gram stream (a
    // conditional sum, not a second scan + shuffle); the B-row table is
    // materialized once (q25/q54's checkpoint pattern) so the totals
    // fold reads it instead of re-running the corpus pass
    val counts = h.groupBy("b").agg(count(lit(1)).as("cr"),
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"))
      .localCheckpoint(true)
    val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // Exact overflow check for the narrow BIGINT expression, over the
    // checkpointed B-row table (one trivial 64-row agg): numerator
    // (ct+1)(nr+B)·1e6 and denominator (cr+1)(nt+B) must both fit 2⁶³.
    val narrowSafe = !wide && {
      val r = counts
        .agg(max(col("ct")).as("mct"), max(col("cr")).as("mcr"),
          sum(col("cr")).as("snr"), sum(col("ct")).as("snt"))
        .collect()(0)
      r.isNullAt(0) || {
        val bB = BigInt(DSIR_BUCKETS)
        val num = (BigInt(r.getLong(0)) + 1) * (BigInt(r.getLong(2)) + bB) * 1000000
        val den = (BigInt(r.getLong(1)) + 1) * (BigInt(r.getLong(3)) + bB)
        num <= BigInt(Long.MaxValue) && den <= BigInt(Long.MaxValue)
      }
    }
    // B rows × (cr, ct, nr, nt) → the per-bucket integer ratio; broadcast
    val terms =
      if (narrowSafe)
        counts.crossJoin(broadcast(tot))
          .select(col("b"),
            expr(s"((ct + 1) * (nr + $DSIR_BUCKETS) * 1000000) div " +
              s"((cr + 1) * (nt + $DSIR_BUCKETS))").as("term"))
      else {
        val spark = documents.sparkSession
        import spark.implicits._
        val rows = counts.select("b", "cr", "ct").collect()
        val nr = BigInt(rows.map(_.getLong(1)).sum)
        val nt = BigInt(rows.map(_.getLong(2)).sum)
        val bB = BigInt(DSIR_BUCKETS)
        rows.toSeq.map { r =>
          val t = (BigInt(r.getLong(2)) + 1) * (nr + bB) * 1000000 /
            ((BigInt(r.getLong(1)) + 1) * (nt + bB))
          (r.getLong(0), t.toLong)
        }.toDF("b", "term")
      }
    val w = h.join(broadcast(terms), "b")
      .groupBy("doc_id").agg(sum(col("term")).as("w"))
    base.select("doc_id")
      .join(w, Seq("doc_id"), "left")
      .withColumn("w_micro", coalesce(col("w"), lit(0L)))
  }

  /** The q124 rule over any (doc_id, source, text) frame. `keep` is the
    * resample budget: the `kept` flag marks the top-`keep` docs by
    * weight (weight desc, doc_id tie-break); see [[dsirWeightFrame]]
    * for the weight arithmetic and the wide/narrow overflow contract. */
  def dsirWeights(documents: DataFrame, targetSources: Set[String],
      keep: Int, wide: Boolean = false): DataFrame =
    // the keep-top rank rides the corpus — routed above GlobalWindowCap
    // (ScaleWindows): a partition-less window here would funnel every
    // document through one task at selection scale. The route's
    // checkpoint-before-count truncates the explained plan, so the
    // gram-join shape is pinned on [[dsirWeightFrame]] (PlanSpec).
    ScaleWindows.globalOrderedScan(
        dsirWeightFrame(documents, targetSources, wide),
        Seq(col("w_micro").desc, col("doc_id")), Some("__rk"))
      .withColumn("kept", col("__rk") <= keep)
      .select("doc_id", "w_micro", "kept")

  /** Unigram^0.75 negative-sampling table + deterministic draws — the
    * word2vec/SGNS sampling-prep step (Mikolov et al.: negatives come
    * from U(w)^¾, flattening the head): per token the ¾-power weight
    * computed as sqrt(n·sqrt(n))·10³ — two IEEE sqrts, each correctly
    * rounded on both engines, so the composition is deterministic —
    * then the cumulative range table, and [[NsDraws]] seeded draws
    * (poly-131·G of 'ns:i' mod the total mass) bucketed into the
    * ranges, so the gate pins BOTH the table build and the draw
    * machinery a trainer's data loader replays. Vocabulary-sized
    * everything (the cum window is over the vocab, not rows); the
    * draw bucketing is a broadcast range join. */
  val NsDraws = 10000L

  val q235 = Q.sql("q235_negative_sampling",
    s"""WITH c AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |    FROM documents) GROUP BY 1),
       |w AS (
       |  SELECT tok, n,
       |    CAST(round(sqrt(n * sqrt(n)) * 1000) AS BIGINT) AS w
       |  FROM c),
       |cw AS (
       |  SELECT tok, n, w,
       |    CAST(sum(w) OVER (ORDER BY tok) AS BIGINT) AS cum
       |  FROM w),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM w),
       |d AS (
       |  SELECT CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |      list_transform(range(1, length('ns:' || CAST(r.i AS VARCHAR)) + 1),
       |        c -> CAST(ascii(substr('ns:' || CAST(r.i AS VARCHAR), c, 1)) AS HUGEINT))),
       |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
       |      * 1752450205419405103 % 2305843009213693951 AS BIGINT) % tot.t AS u
       |  FROM range(0, $NsDraws) r(i) CROSS JOIN tot),
       |j AS (
       |  SELECT cw.tok, CAST(count(*) AS BIGINT) AS n_draws
       |  FROM d JOIN cw ON d.u >= cw.cum - cw.w AND d.u < cw.cum
       |  GROUP BY 1)
       |SELECT cw.tok AS token, cw.n, cw.w AS w_milli,
       |  COALESCE(j.n_draws, 0) AS n_draws
       |FROM cw LEFT JOIN j ON j.tok = cw.tok
       |ORDER BY token""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{Exprs, Text}
    import graft.operators.Sketches.Kmv
    val c = Tables.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("n"))
    val w = c.withColumn("w",
      round(sqrt(col("n") * sqrt(col("n"))) * 1000).cast("long"))
    // the cumulative rides the token VOCABULARY (10⁷–10⁸ types at corpus
    // scale) — routed above GlobalWindowCap like the other global scans
    val cw = ScaleWindows.globalOrderedScan(
        w, Seq(col("tok")), None, Seq("w" -> "cum"))
      .localCheckpoint(true) // the draw join + output both read it
    val tot = cw.agg(sum("w").cast("long").as("t"))
    val draws = s.range(0, NsDraws)
      .crossJoin(broadcast(tot))
      .select(pmod(Exprs.mulmod61(
        Exprs.poly_hash(concat(lit("ns:"), col("id").cast("string"))), Kmv.G),
        col("t")).as("u"))
    val j = draws.join(broadcast(cw),
        col("u") >= col("cum") - col("w") && col("u") < col("cum"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("n_draws"))
    cw.join(j, Seq("tok"), "left").na.fill(0L, Seq("n_draws"))
      .select(col("tok").as("token"), col("n"), col("w").as("w_milli"),
        col("n_draws"))
      .orderBy("token")
  }

  val all: Seq[Q] = Seq(q123, q124, q229, q235)
}
