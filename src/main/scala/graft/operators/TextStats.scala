package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exprs, Text}

/** Corpus-statistics quality filters a training-data pipeline runs
  * before (and after) the heavy dedup stages: character-entropy junk
  * detection and n-gram containment decontamination.
  *
  * Scale: q119 is a stateless one-pass kernel (no shuffle — the filter
  * costs one scan at 100 TB). q120 is the q60/q83 decontamination shape
  * (distinct-gram semi-join, optionally Bloom-prefiltered) extended to a
  * containment RATIO and a drop decision per document.
  */
object TextStats {

  /** Character-entropy quality gate: per-document Shannon entropy over
    * the code-point distribution, plus the distinct/top-char counters it
    * derives from. Encoding junk, base64 blobs, and `aaaa…` padding sit
    * far below natural-language entropy (≈3.5–4.5 bits/char), so the
    * `low_entropy` decision is the cheap first fence of a quality
    * pipeline. The kernel keeps the arithmetic all-integer
    * ([[graft.functions.TextKernels.charStats]]) so DuckDB replays it
    * exactly from a char histogram; since round 11 the log itself is
    * the integer piecewise qlog2 (1/1024-bit units — the q181 device),
    * retiring the last round(log2(n)·10⁶) transcendental quantization
    * in the tree (an ulp disagreement between libm implementations
    * could flip a micro-bit; the integer form cannot).
    */
  val q119 = Q.sql("q119_char_entropy", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
       |h AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
       |st AS (SELECT doc_id,
       |    CAST(sum(cnt) AS BIGINT) AS n_chars,
       |    CAST(count(*) AS BIGINT) AS distinct_chars,
       |    CAST(max(cnt) AS BIGINT) AS top_char_cnt,
       |    CAST(sum(cnt * ${ql("cnt")}) AS BIGINT) AS sclogc
       |  FROM h GROUP BY 1)
       |SELECT doc_id, n_chars, distinct_chars, top_char_cnt,
       |  CAST(((n_chars * ${ql("n_chars")} - sclogc) * 20000
       |        + 1024 * n_chars)
       |       // (2048 * n_chars) AS DOUBLE) / 10000.0 AS entropy_bits,
       |  CAST((top_char_cnt * 20000 + n_chars)
       |       // (2 * n_chars) AS DOUBLE) / 10000.0 AS top_char_frac,
       |  CAST(((n_chars * ${ql("n_chars")} - sclogc) * 20000
       |        + 1024 * n_chars)
       |       // (2048 * n_chars) AS DOUBLE) / 10000.0 < 2.5 AS low_entropy
       |FROM st ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Exprs.char_stats(col("text")).as("cs"))
      .filter(element_at(col("cs"), 1) > 0)
      .select(col("doc_id"),
        element_at(col("cs"), 1).as("n_chars"),
        element_at(col("cs"), 2).as("distinct_chars"),
        element_at(col("cs"), 3).as("top_char_cnt"),
        element_at(col("cs"), 4).as("esc"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      // (esc is the integer 1/1024-bit numerator from the qlog2 kernel,
      // so both quotients are finite-decimal-capable)
      .withColumn("entropy_bits",
        expr("CAST((esc * 20000 + 1024 * n_chars)"
          + " div (2048 * n_chars) AS DOUBLE)") / 10000.0)
      .withColumn("top_char_frac",
        expr("CAST((top_char_cnt * 20000 + n_chars)"
          + " div (2 * n_chars) AS DOUBLE)") / 10000.0)
      .withColumn("low_entropy", col("entropy_bits") < 2.5)
      .drop("esc")
      .orderBy("doc_id")
  }

  /** Containment-ratio decontamination: for each test-split document,
    * the fraction of its distinct 5-grams that occur anywhere in the
    * train split, and the drop decision at 50% containment. q60 counts
    * raw contaminated grams as evidence; this gate is the normalized
    * policy variant an eval-set owner actually applies (the WMT/lm-eval
    * convention: drop when most of the doc's n-grams are in-corpus).
    * All-integer counts, one exact division, rounded before the
    * threshold — fully oracle-replayable.
    *
    * Scale shape: distinct train grams ↘ semi-join probed map-side
    * after a Bloom prefilter at 100 TB (q83's machinery); here the
    * plain left join keeps the gate exact and the plan identical in
    * kind.
    */
  val q120 = Q.sql("q120_overlap_contam",
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN substr(md5(text), 1, 1) < 'c' THEN 'train'
      |         WHEN substr(md5(text), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split,
      |    regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, split,
      |    unnest(list_distinct(list_transform(range(1, len(toks) - 3),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |           toks[i+3] || ' ' || toks[i+4]))) AS g
      |  FROM s),
      |tg AS (SELECT DISTINCT g FROM g WHERE split = 'train'),
      |t AS (
      |  SELECT eg.doc_id,
      |    CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(count(tg.g) AS BIGINT) AS n_hit
      |  FROM g eg LEFT JOIN tg ON eg.g = tg.g
      |  WHERE eg.split = 'test' GROUP BY 1)
      |SELECT doc_id, n_grams, n_hit,
      |  CAST((n_hit * 20000 + n_grams) // (2 * n_grams) AS DOUBLE) / 10000.0
      |    AS containment,
      |  CAST((n_hit * 20000 + n_grams) // (2 * n_grams) AS DOUBLE) / 10000.0
      |    >= 0.5 AS drop_doc
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val split = Tables.documents(s, d)
      .select(col("doc_id"),
        array_distinct(Text.shingles(Text.tokens(col("text")), 5)).as("grams"),
        when(substring(md5(col("text").cast("binary")), 1, 1) < "c", "train")
          .when(substring(md5(col("text").cast("binary")), 1, 1) < "e", "val")
          .otherwise("test").as("split"))
    val trainGrams = split.filter(col("split") === "train")
      .select(explode(col("grams")).as("g")).distinct()
    val testGrams = split.filter(col("split") === "test")
      .select(col("doc_id"), explode(col("grams")).as("g"))
    testGrams
      .join(trainGrams.withColumnRenamed("g", "tg"),
        col("g") === col("tg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("tg")).as("n_hit"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("containment",
        expr("CAST((n_hit * 20000 + n_grams)"
          + " div (2 * n_grams) AS DOUBLE)") / 10000.0)
      .withColumn("drop_doc", col("containment") >= 0.5)
      .orderBy("doc_id")
  }

  /** Bigram LM surprisal — the perplexity-filter shape (CCNet/KenLM's
    * role): train a bigram model ON the corpus (context count c1 =
    * occurrences of w1 as a bigram head, joint count cxy), then score
    * every document's cross-entropy under it: surprisal of a bigram =
    * log2(c1/cxy) bits, so bits/token sits near the corpus' natural
    * rate and spikes on out-of-distribution token sequences — the
    * outlier tail is what a quality pass drops.
    *
    * Exactness: the log is the INTEGER piecewise-linear log2 —
    * qlog2(n) = (blen−1)·1024 + n·1024 div 2^(blen−1) − 1024 with
    * blen = length(bin(n)) — exact in both engines (bit ops and one
    * floor division, no transcendental call), monotone, and within
    * 0.0871 bits of true log2 (0.08607 chord error + the 1/1024
    * quantization step — PropertySpec pins the envelope), which is
    * noise for a filter score. The
    * first build used round(log2(n)·10⁶) (q119's device) and the 5×
    * sweep caught it: Java's log/log(2) and DuckDB's log2 disagree by
    * an ulp on some counts, and one crossing flips a micro-bit —
    * transcendental quantization is only PROBABLY deterministic, the
    * integer form is so by construction. Every aggregation is then an
    * exact BIGINT sum and the one final division is identical IEEE.
    * Scale: two count tables (vocab- and bigram-sized,
    * broadcast-joinable), one token-stream pass to score; the model
    * tables are the only state — the daily-refresh shape. */
  val q181 = Q.sql("q181_lm_surprisal",
    """WITH tk AS MATERIALIZED (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents) d,
      |  LATERAL unnest(range(0, len(toks))) AS u(i)),
      |bg AS MATERIALIZED (
      |  SELECT a.doc_id, a.off, a.tok AS w1, b.tok AS w2
      |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.off = a.off + 1),
      |cxy AS MATERIALIZED (
      |  SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
      |c1 AS MATERIALIZED (
      |  SELECT w1, CAST(sum(n) AS BIGINT) AS n FROM cxy GROUP BY 1),
      |sc AS (
      |  SELECT bg.doc_id,
      |    ((length(bin(c1.n)) - 1) * 1024
      |      + c1.n * 1024 // (1::BIGINT << (length(bin(c1.n)) - 1)) - 1024)
      |    - ((length(bin(cxy.n)) - 1) * 1024
      |      + cxy.n * 1024 // (1::BIGINT << (length(bin(cxy.n)) - 1)) - 1024)
      |      AS ub
      |  FROM bg
      |  JOIN cxy ON cxy.w1 = bg.w1 AND cxy.w2 = bg.w2
      |  JOIN c1 ON c1.w1 = bg.w1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(ub) AS BIGINT) AS surprisal_qb,
      |  CAST((CAST(sum(ub) AS BIGINT) * 20000 + 1024 * count(*))
      |       // (2048 * count(*)) AS DOUBLE) / 10000.0
      |    AS bits_per_token
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val qlog = (name: String) =>
      expr(s"(length(bin($name)) - 1) * 1024" +
        s" + $name * 1024 div shiftleft(1L, length(bin($name)) - 1) - 1024")
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("off").cast("long").as("off"), col("tok"))
    val bg = tk.select(col("doc_id"), col("off"), col("tok").as("w1"))
      .join(tk.select(col("doc_id"), (col("off") - 1).as("off"), col("tok").as("w2")),
        Seq("doc_id", "off"))
      .localCheckpoint(true) // model build + scoring both read the stream
    val cxy = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nxy"))
    val c1 = cxy.groupBy("w1").agg(sum("nxy").as("n1"))
    bg.join(broadcast(cxy), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .select(col("doc_id"), (qlog("n1") - qlog("nxy")).as("ub"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("ub").cast("long").as("surprisal_qb"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("bits_per_token",
        expr("CAST((surprisal_qb * 20000 + 1024 * n_bigrams)"
          + " div (2048 * n_bigrams) AS DOUBLE)") / 10000.0)
      .orderBy("doc_id")
  }

  /** Kneser–Ney smoothed bigram LM scoring — q181's surprisal filter
    * upgraded to the smoothing real perplexity filters (KenLM/CCNet)
    * use: absolute discounting D = 3/4 with the continuation-count
    * backoff, p_kn(w2|w1) = (c(w1w2) − D)/c(w1·) +
    * D·N1+(w1·)/c(w1·) · N1+(·w2)/T. Unlike the MLE form, p_kn scores
    * UNSEEN continuations sensibly, so the filter doesn't saturate on
    * singleton bigrams.
    *
    * Exactness: with quarters as the discount unit the probability is
    * ONE rational — num = (4·c(w1w2) − 3)·T + 3·N1+(w1·)·N1+(·w2),
    * den = 4·c(w1·)·T — and the surprisal is qlog2(den) − qlog2(num)
    * in integer 1/1024-bit units (q181's piecewise log2, exact in both
    * engines). Every aggregate is a BIGINT sum; one IEEE division at
    * the end. Scale: the model is three count tables (vocab-, vocab-,
    * bigram-sized), all broadcast-joinable; scoring is one pass over
    * the token stream. */
  val q202 = Q.sql("q202_kn_bigram_lm",
    """WITH tk AS MATERIALIZED (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents) d,
      |  LATERAL unnest(range(0, len(toks))) AS u(i)),
      |bg AS MATERIALIZED (
      |  SELECT a.doc_id, a.off, a.tok AS w1, b.tok AS w2
      |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.off = a.off + 1),
      |cxy AS MATERIALIZED (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS nxy FROM bg GROUP BY 1, 2),
      |c1 AS MATERIALIZED (
      |  SELECT w1, CAST(sum(nxy) AS BIGINT) AS n1,
      |    CAST(count(*) AS BIGINT) AS f1
      |  FROM cxy GROUP BY 1),
      |cc AS MATERIALIZED (
      |  SELECT w2, CAST(count(*) AS BIGINT) AS cw2 FROM cxy GROUP BY 1),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cxy),
      |sc AS (
      |  SELECT bg.doc_id,
      |    ((length(bin(4 * c1.n1 * tt.t)) - 1) * 1024
      |      + (4 * c1.n1 * tt.t) * 1024
      |        // (1::BIGINT << (length(bin(4 * c1.n1 * tt.t)) - 1)) - 1024)
      |    - ((length(bin((4 * cxy.nxy - 3) * tt.t + 3 * c1.f1 * cc.cw2)) - 1) * 1024
      |      + ((4 * cxy.nxy - 3) * tt.t + 3 * c1.f1 * cc.cw2) * 1024
      |        // (1::BIGINT << (length(bin((4 * cxy.nxy - 3) * tt.t + 3 * c1.f1 * cc.cw2)) - 1)) - 1024)
      |      AS ub
      |  FROM bg
      |  JOIN cxy ON cxy.w1 = bg.w1 AND cxy.w2 = bg.w2
      |  JOIN c1 ON c1.w1 = bg.w1
      |  JOIN cc ON cc.w2 = bg.w2
      |  CROSS JOIN tt)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(ub) AS BIGINT) AS kn_qb,
      |  CAST((CAST(sum(ub) AS BIGINT) * 20000 + 1024 * count(*))
      |       // (2048 * count(*)) AS DOUBLE) / 10000.0
      |    AS kn_bits_per_token
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val qlog = (e: String) =>
      expr(s"(length(bin($e)) - 1) * 1024" +
        s" + ($e) * 1024 div shiftleft(1L, length(bin($e)) - 1) - 1024")
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("off").cast("long").as("off"), col("tok"))
    val bg = tk.select(col("doc_id"), col("off"), col("tok").as("w1"))
      .join(tk.select(col("doc_id"), (col("off") - 1).as("off"), col("tok").as("w2")),
        Seq("doc_id", "off"))
      .localCheckpoint(true) // model build + scoring both read the stream
    val cxy = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nxy"))
    val c1 = cxy.groupBy("w1").agg(sum("nxy").as("n1"), count(lit(1)).as("f1"))
    val cc = cxy.groupBy("w2").agg(count(lit(1)).as("cw2"))
    val tt = cxy.agg(count(lit(1)).cast("long").as("t"))
    bg.join(broadcast(cxy), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(cc), Seq("w2"))
      .crossJoin(broadcast(tt))
      .withColumn("den", expr("4 * n1 * t"))
      .withColumn("num", expr("(4 * nxy - 3) * t + 3 * f1 * cw2"))
      .select(col("doc_id"), (qlog("den") - qlog("num")).as("ub"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("ub").cast("long").as("kn_qb"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      .withColumn("kn_bits_per_token",
        expr("CAST((kn_qb * 20000 + 1024 * n_bigrams)"
          + " div (2048 * n_bigrams) AS DOUBLE)") / 10000.0)
      .orderBy("doc_id")
  }

  /** Greenlist watermark detection (Kirchenbauer et al. 2023) — the
    * corpus-audit pass that flags machine-generated text carrying a
    * statistical watermark: a generator with the watermark biases each
    * token toward a "green" half of the vocabulary seeded by the
    * PREVIOUS token, so a detector recomputes membership — here the
    * parity of the poly-131·G hash of (prev, cur) — and z-tests the
    * green fraction against the unwatermarked null of ½. z =
    * (2g − n)/√n: g and n are exact integers, √n is IEEE
    * correctly-rounded on both engines (q133's sqrt precedent), so the
    * one division is replayed bit-for-bit. Flag at z ≥ 4.
    *
    * Scale: stateless bigram map + one groupBy(doc) — one scan, the
    * same cost class as q119's entropy fence. */
  val q212 = Q.sql("q212_watermark_detect",
    """WITH tk AS MATERIALIZED (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents) d,
      |  LATERAL unnest(range(0, len(toks))) AS u(i)),
      |bg AS (
      |  SELECT a.doc_id, a.tok || '|' || b.tok AS key
      |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.off = a.off + 1),
      |g AS (
      |  SELECT doc_id,
      |    CAST(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(1, length(key) + 1),
      |                     c -> CAST(ascii(substr(key, c, 1)) AS HUGEINT))),
      |      (a, x) -> (a * 131 + x) % 2305843009213693951) AS HUGEINT)
      |      * 1752450205419405103 % 2305843009213693951 % 2 AS BIGINT) AS green
      |  FROM bg),
      |s AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(green) AS BIGINT) AS n_green
      |  FROM g GROUP BY 1)
      |SELECT doc_id, n_bigrams, n_green,
      |  CAST((n_green * 20000 + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
      |    / 10000.0 AS green_frac,
      |  round((2 * n_green - n_bigrams) / sqrt(CAST(n_bigrams AS DOUBLE)), 4)
      |    + 0.0 AS z_score,
      |  round((2 * n_green - n_bigrams) / sqrt(CAST(n_bigrams AS DOUBLE)), 4)
      |    >= 4.0 AS watermarked
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.{Exprs, Text}
    import graft.operators.Sketches.Kmv
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("off").cast("long").as("off"), col("tok"))
    tk.select(col("doc_id"), col("off"), col("tok").as("w1"))
      .join(tk.select(col("doc_id"), (col("off") - 1).as("off"), col("tok").as("w2")),
        Seq("doc_id", "off"))
      .withColumn("green", pmod(Exprs.mulmod61(
        Exprs.poly_hash(concat(col("w1"), lit("|"), col("w2"))), Kmv.G), lit(2L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("green").cast("long").as("n_green"))
      // integer half-up ten-thousandths — the q233 finite-decimal rule
      // (z_score keeps float round: its √n denominator is irrational
      // except at perfect squares, and at those the dyadic numerator
      // can't land on a decimal half boundary with these magnitudes)
      .withColumn("green_frac",
        expr("CAST((n_green * 20000 + n_bigrams)"
          + " div (2 * n_bigrams) AS DOUBLE)") / 10000.0)
      .withColumn("z_score",
        round((lit(2) * col("n_green") - col("n_bigrams")) /
          sqrt(col("n_bigrams").cast("double")), 4))
      .withColumn("watermarked", col("z_score") >= 4.0)
      .orderBy("doc_id")
  }

  /** Cross-source n-gram containment matrix — the inter-source
    * duplication audit a corpus curator reads before mixing sources
    * (q120 asks "is my TEST split inside TRAIN"; this asks the
    * source×source version of the same question): for every source
    * pair, the shared distinct-5-gram count and the containment ratio
    * in each direction. One distinct-gram table, one self-join on the
    * gram key, vocabulary-of-grams-sized everything after.
    *
    * Scale: the gram self-join shuffles on gram; a stopword-like gram
    * shared by every source fans out quadratically in SOURCES (≤
    * |sources|² rows per gram — bounded, unlike a doc-level join), and
    * the production knob is the usual df-cap prefilter dropping
    * non-discriminative grams before the join. */
  val q217 = Q.sql("q217_source_overlap",
    """WITH g AS (
      |  SELECT DISTINCT source, gram FROM (
      |    SELECT source,
      |      unnest(list_transform(range(1, len(toks) - 3),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |             toks[i+3] || ' ' || toks[i+4])) AS gram
      |    FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
      |          FROM documents))),
      |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
      |o AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT o.src_a, o.src_b, o.n_shared,
      |  CAST((o.n_shared * 20000 + na.n) // (2 * na.n) AS DOUBLE) / 10000.0
      |    AS contain_a,
      |  CAST((o.n_shared * 20000 + nb.n) // (2 * nb.n) AS DOUBLE) / 10000.0
      |    AS contain_b
      |FROM o JOIN n na ON na.source = o.src_a
      |JOIN n nb ON nb.source = o.src_b
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    import graft.functions.Text
    val g = Tables.documents(s, d)
      .select(col("source"),
        explode(array_distinct(Text.shingles(Text.tokens(col("text")), 5)))
          .as("gram"))
      .distinct()
      .localCheckpoint(true) // per-source totals + the pair join read it
    val n = g.groupBy("source").agg(count(lit(1)).cast("long").as("n"))
    val ga = g.select(col("source").as("src_a"), col("gram").as("ga"))
    val gb = g.select(col("source").as("src_b"), col("gram").as("gb"))
    val o = ga.join(gb, col("ga") === col("gb") && col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).cast("long").as("n_shared"))
    o.join(broadcast(n.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(n.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        // integer half-up ten-thousandths — the q233 finite-decimal rule
        (expr("CAST((n_shared * 20000 + na) div (2 * na) AS DOUBLE)")
          / 10000.0).as("contain_a"),
        (expr("CAST((n_shared * 20000 + nb) div (2 * nb) AS DOUBLE)")
          / 10000.0).as("contain_b"))
      .orderBy("src_a", "src_b")
  }

  /** Per-source distinctive vocabulary by smoothed log-odds — the
    * "fightin' words" corpus-comparison read (Monroe et al. 2008,
    * Haldane +1 smoothing): for every (source, token), δ =
    * log₂((a+1)/(A−a+1)) − log₂((b+1)/(B−b+1)) with a/A the token and
    * total counts in the source and b/B in the REST of the corpus —
    * positive δ means the token is over-represented in that source.
    * Top-3 per source by (δ DESC, token). The log is q181's integer
    * piecewise-linear qlog2 (1/1024-bit units — exact both engines,
    * no transcendental), so δ is a BIGINT and the gate has no
    * rounding seam. Scale: one token-count pass; the score table is
    * vocab × sources — broadcast-sized totals, nothing re-touches
    * documents. */
  val q249 = Q.sql("q249_token_log_odds", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    s"""WITH tk AS MATERIALIZED (
       |  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |a AS MATERIALIZED (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS a
       |  FROM tk GROUP BY 1, 2),
       |at AS (SELECT source, CAST(sum(a) AS BIGINT) AS ta FROM a GROUP BY 1),
       |g AS (SELECT tok, CAST(sum(a) AS BIGINT) AS gt FROM a GROUP BY 1),
       |tt AS (SELECT CAST(sum(a) AS BIGINT) AS t FROM a),
       |sc AS (
       |  SELECT a.source, a.tok, a.a, (g.gt - a.a) AS b,
       |    ${ql("a.a + 1")} - ${ql("at.ta - a.a + 1")}
       |    - ${ql("g.gt - a.a + 1")}
       |    + ${ql("tt.t - at.ta - (g.gt - a.a) + 1")} AS delta_qb
       |  FROM a JOIN at USING (source) JOIN g USING (tok) CROSS JOIN tt)
       |SELECT source, tok, a AS n_in, b AS n_rest, delta_qb,
       |  CAST(rk AS BIGINT) AS rk
       |FROM (SELECT *, row_number() OVER (PARTITION BY source
       |        ORDER BY delta_qb DESC, tok) AS rk FROM sc) t
       |WHERE rk <= 3 ORDER BY source, rk""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 div shiftleft(1L, length(bin($x)) - 1) - 1024)"
    val tk = Tables.documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
    val a = tk.groupBy("source", "tok")
      .agg(count(lit(1)).cast("long").as("a"))
      .localCheckpoint(true) // all three totals derive from it
    val at = a.groupBy("source").agg(sum("a").cast("long").as("ta"))
    val g = a.groupBy("tok").agg(sum("a").cast("long").as("gt"))
    val tt = a.agg(sum("a").cast("long").as("t"))
    a.join(broadcast(at), "source").join(broadcast(g), "tok")
      .crossJoin(broadcast(tt))
      .withColumn("b", col("gt") - col("a"))
      .withColumn("delta_qb",
        expr(s"${ql("a + 1")} - ${ql("ta - a + 1")}" +
          s" - ${ql("gt - a + 1")} + ${ql("t - ta - (gt - a) + 1")}"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("delta_qb").desc, col("tok"))))
      .filter(col("rk") <= 3)
      .select(col("source"), col("tok"), col("a").as("n_in"),
        col("b").as("n_rest"), col("delta_qb"), col("rk").cast("long").as("rk"))
      .orderBy("source", "rk")
  }

  /** Per-document n-gram novelty — the corpus-growth curve a crawl
    * operator tracks (and the post-dedup audit: a corpus that keeps
    * yielding near-zero-novelty docs has a dedup gap): for each doc in
    * doc_id order, the fraction of its distinct 8-grams never seen in
    * any EARLIER doc. First-occurrence ownership is one min(doc_id)
    * per gram — gram-key shuffle, no window over the stream — and the
    * fraction rounds half-up in integers (the q233 rule). At 100 TB
    * the owner table IS the suffix-style dedup index the pipeline
    * already maintains; novelty is a join against it. */
  val NoveltyN = 8

  val q251 = Q.sql("q251_ngram_novelty",
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(toks) - ${NoveltyN - 2}),
       |      i -> array_to_string(list_slice(toks, i, i + ${NoveltyN - 1}), ' '))))
       |      AS gram
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents)
       |  WHERE len(toks) >= $NoveltyN),
       |own AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY 1),
       |t AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN own.owner = g.doc_id THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_novel
       |  FROM g JOIN own USING (gram) GROUP BY 1)
       |SELECT doc_id, n_grams, n_novel,
       |  CAST((n_novel * 20000 + n_grams) // (2 * n_grams) AS DOUBLE)
       |    / 10000.0 AS novelty
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val g = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(Text.tokens(col("text")), NoveltyN)))
          .as("gram"))
      .localCheckpoint(true) // ownership + the per-doc fold read it
    val own = g.groupBy("gram").agg(min("doc_id").as("owner"))
    g.join(own, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty",
        expr("CAST((n_novel * 20000 + n_grams)"
          + " div (2 * n_grams) AS DOUBLE)") / 10000.0)
      .orderBy("doc_id")
  }

  /** PMI collocations — the classic corpus-linguistics extraction
    * (Church & Hanks 1990) a vocabulary/tokenizer team reads before
    * deciding multi-word units: for bigrams with support ≥
    * [[PmiMinCount]], PMI = log₂(c(xy)·T / (c(x·)·c(·y))) in integer
    * qlog2 1/1024-bit units (q181's piecewise log — exact both
    * engines, no transcendental), top-20 by (PMI DESC, bigram). The
    * count tables are vocab-/bigram-sized; nothing re-touches the
    * corpus after one bigram pass. */
  val PmiMinCount = 5

  val q252 = Q.sql("q252_pmi_collocations", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    s"""WITH tk AS MATERIALIZED (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS off, toks[u.i + 1] AS tok
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents) d,
       |  LATERAL unnest(range(0, len(toks))) AS u(i)),
       |cxy AS MATERIALIZED (
       |  SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS nxy
       |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.off = a.off + 1
       |  GROUP BY 1, 2),
       |cx AS (SELECT w1, CAST(sum(nxy) AS BIGINT) AS nx FROM cxy GROUP BY 1),
       |cy AS (SELECT w2, CAST(sum(nxy) AS BIGINT) AS ny FROM cxy GROUP BY 1),
       |tt AS (SELECT CAST(sum(nxy) AS BIGINT) AS t FROM cxy)
       |SELECT w1, w2, nxy,
       |  ${ql("cxy.nxy * tt.t")} - ${ql("cx.nx * cy.ny")} AS pmi_qb
       |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN tt
       |WHERE nxy >= $PmiMinCount
       |ORDER BY pmi_qb DESC, w1, w2 LIMIT 20""".stripMargin
  }) { (s, d) =>
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 div shiftleft(1L, length(bin($x)) - 1) - 1024)"
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("off", "tok")))
      .select(col("doc_id"), col("off").cast("long").as("off"), col("tok"))
    val cxy = tk.select(col("doc_id"), col("off"), col("tok").as("w1"))
      .join(tk.select(col("doc_id"), (col("off") - 1).as("off"), col("tok").as("w2")),
        Seq("doc_id", "off"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("nxy"))
      .localCheckpoint(true) // margins + total derive from it
    val cx = cxy.groupBy("w1").agg(sum("nxy").cast("long").as("nx"))
    val cy = cxy.groupBy("w2").agg(sum("nxy").cast("long").as("ny"))
    val tt = cxy.agg(sum("nxy").cast("long").as("t"))
    cxy.filter(col("nxy") >= PmiMinCount)
      .join(broadcast(cx), "w1").join(broadcast(cy), "w2")
      .crossJoin(broadcast(tt))
      .withColumn("pmi_qb",
        expr(s"${ql("nxy * t")} - ${ql("nx * ny")}"))
      .select("w1", "w2", "nxy", "pmi_qb")
      .orderBy(col("pmi_qb").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Heaps'-law vocabulary growth — the curve that tells a tokenizer/
    * dedup team whether a corpus is still yielding new material: at
    * each doc-count decile, cumulative 3-gram tokens vs cumulative
    * DISTINCT 3-grams (first-occurrence ownership, q251's device), and
    * the Heaps exponent β as an integer-qlog2 least-squares slope over
    * the 10 (log tokens, log vocab) points (q208's regression device —
    * exact BIGINT sums, one sign-aware half-up division). Everything
    * past the one gram pass runs on rank-histogram-sized tables. */
  val q262 = Q.sql("q262_heaps_law", {
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1)) - 1024)"
    s"""WITH dr AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
       |    AS r
       |  FROM documents),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |g AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM documents)
       |  WHERE len(toks) >= 3),
       |gt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng
       |       FROM g GROUP BY 1),
       |own AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY 1),
       |vo AS (
       |  SELECT dr.r AS ro, CAST(count(*) AS BIGINT) AS v
       |  FROM own JOIN dr ON dr.doc_id = own.owner GROUP BY 1),
       |cum AS (
       |  SELECT dr.r,
       |    CAST(sum(coalesce(gt.ng, 0)) OVER (ORDER BY dr.r) AS BIGINT)
       |      AS ctok,
       |    CAST(sum(coalesce(vo.v, 0)) OVER (ORDER BY dr.r) AS BIGINT)
       |      AS cvoc
       |  FROM dr LEFT JOIN gt USING (doc_id) LEFT JOIN vo ON vo.ro = dr.r),
       |ck AS (
       |  SELECT CAST(u.i AS BIGINT) AS i, (CAST(u.i AS BIGINT) * nd.nd) // 10
       |    AS k
       |  FROM (SELECT unnest(range(1, 11)) AS i) u CROSS JOIN nd),
       |pt AS (
       |  SELECT ck.i, ck.k, cum.ctok, cum.cvoc,
       |    ${ql("cum.ctok")} AS x, ${ql("cum.cvoc")} AS y
       |  FROM ck JOIN cum ON cum.r = ck.k),
       |ft AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM pt)
       |SELECT pt.i AS decile, pt.k AS n_docs, pt.ctok AS n_grams,
       |  pt.cvoc AS vocab,
       |  CAST(((ft.m * ft.sxy - ft.sx * ft.sy) * 20000
       |        + CASE WHEN ft.m * ft.sxy - ft.sx * ft.sy < 0
       |               THEN -(ft.m * ft.sxx - ft.sx * ft.sx)
       |               ELSE ft.m * ft.sxx - ft.sx * ft.sx END)
       |       // (2 * (ft.m * ft.sxx - ft.sx * ft.sx)) AS DOUBLE) / 10000.0
       |    AS beta
       |FROM pt CROSS JOIN ft ORDER BY decile""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def ql(x: String) = s"((length(bin($x)) - 1) * 1024" +
      s" + ($x) * 1024 div shiftleft(1L, length(bin($x)) - 1) - 1024)"
    val docs = Tables.documents(s, d)
    // insertion rank + cumulatives route above GlobalWindowCap to the
    // distributed sort + partition-offset form (ScaleWindows) — a
    // partition-less window here rides the CORPUS, the one frame that
    // must never funnel through a single task
    val dr = ScaleWindows.globalOrderedScan(
        docs.select(col("doc_id")), Seq(col("doc_id")), Some("r"))
      .localCheckpoint(true) // ownership ranks + cumulatives read it
    val g = docs
      .select(col("doc_id"),
        explode(Text.shingles(Text.tokens(col("text")), 3)).as("gram"))
      .localCheckpoint(true) // per-doc counts + first-occurrence read it
    val gt = g.groupBy("doc_id").agg(count(lit(1)).cast("long").as("ng"))
    val vo = g.groupBy("gram").agg(min("doc_id").as("owner"))
      .join(dr.select(col("doc_id").as("owner"), col("r").as("ro")), "owner")
      .groupBy("ro").agg(count(lit(1)).cast("long").as("v"))
    // the left joins preserve dr's row count, and dr is checkpointed —
    // so the cumulative call's routing count is known up front and the
    // dr/gt/vo join is never executed solely to count it (r14 advice)
    val ndl = dr.count()
    val cum = ScaleWindows.globalOrderedScan(
        dr.join(gt, Seq("doc_id"), "left").na.fill(0L, Seq("ng"))
          .join(vo, dr("r") === vo("ro"), "left").na.fill(0L, Seq("v")),
        Seq(col("r")), None, Seq("ng" -> "ctok", "v" -> "cvoc"),
        knownCount = Some(ndl))
      .select("r", "ctok", "cvoc")
    val nd = docs.agg(count(lit(1)).cast("long").as("nd"))
    val ck = nd.select(explode(sequence(lit(1L), lit(10L))).as("i"), col("nd"))
      .withColumn("k", expr("(i * nd) div 10"))
    val pt = ck.join(cum, col("r") === col("k"))
      .withColumn("x", expr(ql("ctok")))
      .withColumn("y", expr(ql("cvoc")))
      .localCheckpoint(true) // the 10-point table feeds rows + the fit
    val ft = pt.agg(count(lit(1)).cast("long").as("m"),
      sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"))
    pt.crossJoin(broadcast(ft))
      .select(col("i").as("decile"), col("k").as("n_docs"),
        col("ctok").as("n_grams"), col("cvoc").as("vocab"),
        (expr("CAST(((m * sxy - sx * sy) * 20000"
          + " + CASE WHEN m * sxy - sx * sy < 0"
          + " THEN -(m * sxx - sx * sx) ELSE m * sxx - sx * sx END)"
          + " div (2 * (m * sxx - sx * sx)) AS DOUBLE)") / 10000.0).as("beta"))
      .orderBy("decile")
  }

  val all: Seq[Q] = Seq(q119, q120, q181, q202, q212, q217, q249, q251, q252,
    q262)
}
