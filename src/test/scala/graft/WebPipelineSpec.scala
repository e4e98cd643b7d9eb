package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MinhashEstimate, Postings, WebQuality}

/** Specs for the web-corpus rule filters (Gopher/C4), the inverted
  * index, and the sketch additions (HLL registers, minhash-coordinate
  * Jaccard estimation, temperature mixture rates) — the edge shapes the
  * sf-corpus oracle can't discriminate (the synthetic corpus has no
  * symbols/bullets, so those rules are exercised on crafted fixtures
  * here) plus scale invariants (partition-invariance, estimate-vs-truth
  * envelopes, shuffle-free plans).
  */
class WebPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- Gopher rules on crafted fixtures --------------------------------

  test("gopher: symbol rule fires on hash/ellipsis-heavy docs") {
    val good = ("w " * 60).trim                       // 60 clean words
    val hashy = (("w " * 50) + ("# " * 10)).trim      // 10 symbols / 60 words
    val r = WebQuality.gopherStats(docs(1L -> good, 2L -> hashy))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("r_symbol"))
    assert(!r(1).getAs[Boolean]("r_symbol"), r(1).toString)
  }

  test("gopher: bullet and ellipsis-end line rules fire on crafted segments") {
    // every 8-token segment starts with "-" → bullet fraction 100% > 90%
    val bullets = Seq.fill(8)("- a b c d e f g").mkString(" ")
    // every segment ends with "..." → ellipsis-end fraction 100% > 30%
    val ells = Seq.fill(8)("a b c d e f g ...").mkString(" ")
    val r = WebQuality.gopherStats(docs(1L -> bullets, 2L -> ells))
      .orderBy("doc_id").collect()
    assert(!r(0).getAs[Boolean]("r_bullet"), r(0).toString)
    assert(r(0).getAs[Boolean]("r_ellipsis_end"))
    assert(r(1).getAs[Boolean]("r_bullet"))
    assert(!r(1).getAs[Boolean]("r_ellipsis_end"), r(1).toString)
  }

  test("gopher: word-count, mean-word-length, alpha and stopword rules") {
    val short = "only four words here"                   // < 50 words
    val numeric = (("12345 " * 30) + ("word " * 30)).trim // 50% alpha < 80%
    val longw = ("pneumonoultramicroscopic " * 60).trim  // mwl 24 > 10
    val stopped = ("the and of to " * 15).trim           // 4 distinct stops
    val r = WebQuality.gopherStats(
      docs(1L -> short, 2L -> numeric, 3L -> longw, 4L -> stopped))
      .orderBy("doc_id").collect()
    assert(!r(0).getAs[Boolean]("r_wordcount"))
    assert(!r(1).getAs[Boolean]("r_alpha"))
    assert(!r(2).getAs[Boolean]("r_meanwordlen"))
    assert(r(3).getAs[Boolean]("r_stopwords") && r(3).getAs[Boolean]("r_wordcount"))
    assert(!r(0).getAs[Boolean]("keep") && !r(1).getAs[Boolean]("keep"))
  }

  test("new gates prune their scans (ReadSchema carries only touched columns)") {
    def readSchema(q: String) = {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    }
    val gopher = readSchema("q128_gopher_rules")
    assert(gopher.contains("text") && !gopher.contains("lang") &&
      !gopher.contains("source"), gopher)
    val mix = readSchema("q133_mixture_rates")
    assert(mix.contains("source") && !mix.contains("text"), mix)
    val inv = readSchema("q130_inverted_index")
    assert(inv.contains("text") && !inv.contains("n_chars"), inv)
  }

  test("gopher + c4 are shuffle-free stateless maps (no exchange in plan)") {
    val g = WebQuality.gopherStats(Tables.documents(spark, sf))
    val c = WebQuality.c4LineFilter(Tables.documents(spark, sf))
    assert(!g.queryExecution.executedPlan.toString.contains("Exchange"),
      "gopherStats shuffles")
    assert(!c.queryExecution.executedPlan.toString.contains("Exchange"),
      "c4LineFilter shuffles")
  }

  // ---- C4 line filter --------------------------------------------------

  test("c4: blocklisted and short lines drop; majority-dropped doc is removed") {
    // 2 segments: one clean, one carrying a blocklist term → 50% kept →
    // NOT dropped (strict < half). 1-of-3 kept → dropped.
    val half = "a b c d e f g h " + "x y slow q w e r t"
    val third = "a b c d e f g h " + "slow b c d e f g h " + "big b c d e f g h"
    val r = WebQuality.c4LineFilter(docs(1L -> half, 2L -> third))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_kept") == 1L && !r(0).getAs[Boolean]("dropped"))
    assert(r(1).getAs[Long]("n_kept") == 1L && r(1).getAs[Boolean]("dropped"))
    // dropped docs digest the empty string, kept docs their kept text
    assert(r(1).getAs[String]("clean_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("c4: a tail segment shorter than 3 words is dropped by the word rule") {
    val r = WebQuality.c4LineFilter(docs(1L -> ("a b c d e f g h " + "i j")))
      .collect()(0)
    assert(r.getAs[Long]("n_lines") == 2L && r.getAs[Long]("n_kept") == 1L)
  }

  // ---- Inverted index --------------------------------------------------

  test("postings: df/tf/digest match a hand-built index") {
    val r = Postings.invertedIndex(
      docs(1L -> "a b a", 2L -> "b c", 3L -> "a"))
      .orderBy("token").collect()
    val byTok = r.map(x => x.getAs[String]("token") ->
      (x.getAs[Long]("df"), x.getAs[Long]("tf"))).toMap
    assert(byTok("a") == (2L, 3L))
    assert(byTok("b") == (2L, 2L))
    assert(byTok("c") == (1L, 1L))
    val md5a = java.security.MessageDigest.getInstance("MD5")
      .digest("1,3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.find(_.getAs[String]("token") == "a").get
      .getAs[String]("postings_md5") == md5a)
  }

  test("postings build partial-aggregates before the token shuffle") {
    val p = Postings.invertedIndex(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  // ---- HLL registers ---------------------------------------------------

  test("hll: registers are partition-invariant (mergeable by max)") {
    val a = SparkEntry.queries("q131_hll_registers")(spark, sf).collect()
    // same rows through a different partitioning must give identical grids
    // (q131 reads only $dir/events.parquet — rewrite it repartitioned)
    val tmp = s"/tmp/hll_repart_${System.nanoTime()}"
    Tables.events(spark, sf).repartition(13)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val b = SparkEntry.queries("q131_hll_registers")(spark, tmp).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("hll: estimate lands within the m=64 error envelope of exact") {
    import spark.implicits._
    // 5000 distinct keys through the same register math as q131
    val n = 5000
    val df = (1 to n).map(i => s"user$i").toDF("u")
      .select(graft.functions.Exprs.mulmod61(
        graft.functions.Exprs.poly_hash(col("u")),
        graft.operators.Sketches.Kmv.G).as("h"))
      .select((col("h") % 64).as("reg_id"), expr("h div 64").as("w"))
      .groupBy("reg_id")
      .agg(max(when(col("w") === 0, 56)
        .otherwise(lit(56) - length(bin(col("w"))))).cast("long").as("rho"))
    val regs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = (0 until 64).map(i => 1L << (56 - regs.getOrElse(i.toLong, 0L))).sum
    val est = math.floor(0.709 * 4096 * math.pow(2, 56) / s.toDouble)
    // raw HLL relative error ~1.04/sqrt(64) = 13%; allow 3σ
    assert(math.abs(est - n) < 0.4 * n, s"est=$est exact=$n")
  }

  test("hll: register aggregation runs partial (map-side max) before the shuffle") {
    val p = graft.operators.Sketches
      .hllRowRegs(Tables.events(spark, sf))
      .groupBy("event_type", "reg_id").agg(max("rho").as("rho"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max"), p)
  }

  test("minhash estimate: candidate join carries only (band, bucket, id) — sigs join back late") {
    // the banded self-join must not ship the 16-coordinate signature
    // arrays through the candidate shuffle; they join back by id after
    // the distinct pair set exists (two slim joins instead of wide rows)
    val plan = MinhashEstimate.estimatePairs(Tables.documents(spark, sf))
      .queryExecution.optimizedPlan.toString
    val bandJoinSide = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("bnd")).getOrElse("")
    assert(!bandJoinSide.contains("sig"), bandJoinSide)
  }

  test("hll: streaming register state equals the batch sketch exactly") {
    val batch = SparkEntry.queries("q131_hll_registers")(spark, sf)
      .collect().map(_.toString).sorted
    val stream = SparkEntry.queries("q135_stream_hll")(spark, sf)
      .collect().map(_.toString).sorted
    assert(batch.sameElements(stream))
  }

  test("cms: streaming register state equals the batch grid exactly") {
    val batch = graft.streaming.Streams
      .cmsRegisters(Tables.events(spark, sf))
      .collect().map(_.toString).sorted
    val stream = SparkEntry.queries("q166_stream_countmin")(spark, sf)
      .collect().map(_.toString).sorted
    assert(batch.sameElements(stream))
  }

  // ---- MinHash coordinate estimation -----------------------------------

  test("minhash estimate tracks exact shingle-jaccard on planted near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 57).map(i => s"tok$i").mkString(" ") + " zzz yyy xxx"
    val far = (100 to 160).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> far)
    val pairs = MinhashEstimate.estimatePairs(d).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("est"))
      .toMap
    // the planted near-dup pair must surface through banding (J ≈ 0.9 →
    // a 4-coordinate band agrees with prob ≈ 1−(1−0.9⁴)^4 ≈ 0.99)
    assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
    // true 2-shingle jaccard = 56/62 ≈ 0.90; K=16 coordinates give
    // σ = sqrt(J(1−J)/16) ≈ 0.075 — allow 4σ below
    val est = pairs((1L, 2L))
    assert(est >= 0.6, s"est=$est far from true J≈0.90")
    // the unrelated doc must not pair with anything
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash signatures are deterministic and length-K") {
    val d = docs(1L -> "a b c d e f")
    val s1 = MinhashEstimate.signatures(d).collect()(0).getSeq[Long](1)
    val s2 = MinhashEstimate.signatures(d).collect()(0).getSeq[Long](1)
    assert(s1 == s2 && s1.length == MinhashEstimate.K)
  }

  test("bm25: rarity, tf, and length normalization order a hand fixture correctly") {
    import graft.operators.Postings
    // 'rare' appears in 1 of 4 docs, 'common' in all; doc 4 repeats
    // 'common' but is long — BM25's length normalization must keep the
    // rare-term doc on top and the padded doc below the short one.
    val d = docs(
      1L -> "rare common x y",
      2L -> "common x y z",
      3L -> "common common x y",
      4L -> ("common common " + ("pad " * 40).trim))
    val r = Postings.bm25(d, Seq("rare", "common"), topK = 4).collect()
    assert(r.head.getAs[Long]("doc_id") == 1L, r.mkString(";"))
    val score = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_micro")).toMap
    assert(score(3L) > score(2L), s"tf ignored: $score")     // tf 2 beats tf 1
    assert(score(3L) > score(4L), s"length ignored: $score") // short beats padded
  }

  test("phrase search: positional intersection counts overlapping and 3-term runs") {
    import graft.operators.Postings
    val d = docs(
      1L -> "a b a b a b",   // 'a b' x3; 'a b a' overlaps: positions 0,2
      2L -> "a a a",         // 'a a' x2 (overlapping); no 'a b'
      3L -> "b a b",         // 'a b' x1
      4L -> "x y z")
    val idx = Postings.positionalIndex(d)
    def hits(p: Seq[String]) = Postings.phraseSearch(idx, p).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences")).toMap
    assert(hits(Seq("a", "b")) == Map(1L -> 3L, 3L -> 1L))
    assert(hits(Seq("a", "a")) == Map(2L -> 2L))            // overlapping runs count
    assert(hits(Seq("a", "b", "a")) == Map(1L -> 2L))       // 3-term, overlapping
    assert(hits(Seq("x", "z")).isEmpty)                     // adjacency, not co-occurrence
  }

  test("proximity ranking: a phrase match outranks an identical bag of words") {
    import graft.operators.Postings
    // docs 1 and 2 carry the SAME bag of words (plain BM25 ties them
    // exactly); only doc 1 has the adjacency — the phrase bonus must
    // break the tie toward it and leave every other score untouched
    val d = docs(
      1L -> "spark table x y",
      2L -> "table spark x y",
      3L -> "spark z w v")
    val terms = Seq("spark", "table")
    val plain = Postings.bm25(d, terms, topK = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(plain(1L) == plain(2L), s"bag-of-words tie expected: $plain")
    val prox = Postings.bm25Proximity(d, terms, Seq("spark", "table"),
      bonusMicro = 250000L, topK = 3).collect()
    assert(prox.head.getAs[Long]("doc_id") == 1L,
      s"phrase doc must rank first: ${prox.mkString(";")}")
    val p = prox.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(p(1L) == plain(1L) + 250000L, s"bonus not one exact increment: $p vs $plain")
    assert(p(2L) == plain(2L) && p(3L) == plain(3L),
      s"non-phrase scores perturbed: $p vs $plain")
  }

  test("bm25 batch: each query's slice equals the query served alone, in order") {
    import graft.operators.Postings
    // cross-query independence: batching N queries (with shared terms)
    // through one corpus pass must not perturb any single query's
    // ranking, scores, or tie-broken order — compare the batch slice
    // against the single-query path PER ROW, order included
    val d = Tables.documents(spark, sf)
    val batch = Postings.bm25Batch(d, Postings.BatchQueries, topK = 10).collect()
    for ((qid, terms) <- Postings.BatchQueries) {
      val slice = batch.filter(_.getAs[Long]("query_id") == qid)
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("n_terms_hit"))).toSeq
      val alone = Postings.bm25(d, terms, topK = 10).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("n_terms_hit"))).toSeq
      assert(slice == alone, s"query $qid diverged:\nbatch=$slice\nalone=$alone")
    }
  }

  test("simhash detector recall vs brute force stays high (the sketch's measured tail)") {
    // q27's oracle pins the banding CONTRACT (hamming-bounded retrieval
    // + exact verify); actual recall against the full J >= 0.8 pair set
    // is an empirical property of the sketch — measure it here against
    // q25 (whose oracle IS brute force, recall pinned 1.0). At sf0.1
    // the sketch misses 4 of 256 pairs (hamming >= 7, no clean block
    // pair) — the tail this floor bounds.
    val brute = SparkEntry.queries("q25_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = SparkEntry.queries("q27_simhash_neardup")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = brute.count(sim).toDouble / brute.size
    assert(recall >= 0.9, s"simhash recall $recall (${sim.size}/${brute.size})")
  }

  test("k-core peel: triangle survives its own k, vanishes above it") {
    import spark.implicits._
    // triangle 1-2-3 plus a pendant 3-4: at k=2 the pendant peels off
    // and the triangle (every degree 2) survives; at k=3 everything goes
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core2 = graft.operators.Graph.kcore(edges, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core2.toString)
    assert(graft.operators.Graph.kcore(edges, k = 3, rounds = 4).count() == 0L)
  }

  test("persisted IVF index serves the same neighbors as the in-memory pipeline") {
    val served = SparkEntry.queries("q139_ann_index_serve")(spark, sf)
      .collect().map(_.toString)
    val inMem = SparkEntry.queries("q32_ann_ivf")(spark, sf)
      .collect().map(_.toString)
    assert(served.sameElements(inMem))
  }

  // ---- Mixture rates ---------------------------------------------------

  test("mixture rates: ppm allocations are sqrt-proportional and sum ≤ 1e6") {
    val r = SparkEntry.queries("q133_mixture_rates")(spark, sf).collect()
    val ppm = r.map(_.getAs[Long]("rate_ppm"))
    assert(ppm.sum <= 1000000L && ppm.sum > 1000000L - r.length)
    // a source with 4× the docs gets ~2× the rate (sqrt flattening)
    val byN = r.map(x => x.getAs[Long]("n_docs").toDouble -> x.getAs[Long]("rate_ppm").toDouble)
    for (Seq((n1, p1), (n2, p2)) <- byN.toSeq.sortBy(_._1).combinations(2).map(_.sortBy(_._1))) {
      val expected = math.sqrt(n2 / n1)
      assert(math.abs(p2 / p1 - expected) < 0.01 * expected + 0.01,
        s"n=$n1→$n2 rate ratio ${p2 / p1} vs sqrt ${expected}")
    }
  }

  // ---- AMS F2 / CMS join size ------------------------------------------

  test("ams f2: emitted estimate is the floored mean of the emitted " +
      "registers' squares and tracks exact on the deterministic stream") {
    val rows = SparkEntry.queries("q160_ams_f2")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val zs = (0 to 4).map(j => r.getAs[Long](s"z$j"))
      val est = r.getAs[Long]("est_f2")
      val exact = r.getAs[Long]("exact_f2")
      assert(est == zs.map(z => z * z).sum / 5,
        s"est_f2 != mean of emitted Z²: $r")
      assert(exact > 0)
      // the mean of 5 unbiased tug-of-war squares has sd = √(2/5)·F2;
      // this deterministic draw must land within a 4x envelope of exact
      // (catches sign-hash or register plumbing breakage — measured
      // ratios on this stream are 0.73..1.22)
      assert(est >= exact / 4 && est <= 4 * exact,
        s"mean-of-5 AMS estimate off: est=$est exact=$exact")
    }
  }

  test("cms join size: every row inner product over-counts the exact " +
      "join size and the min is their floor") {
    val r = SparkEntry.queries("q161_cms_join_size")(spark, sf).head()
    val exact = r.getAs[Long]("exact_join")
    val ests = (0 to 3).map(i => r.getAs[Long](s"est$i"))
    val est = r.getAs[Long]("est_join")
    assert(est == ests.min)
    // collision mass is nonnegative: each row's inner product ≥ exact
    ests.foreach(e => assert(e >= exact, s"CMS inner product $e < exact $exact"))
    // expectation bound E[over] = N_A·N_B/width; allow 8× slack on one draw
    val nl = r.getAs[Long]("n_l"); val no = r.getAs[Long]("n_o")
    assert(est - exact <= 8L * nl * no / 256L,
      s"over=${est - exact} beyond 8x the N_A*N_B/width expectation")
  }

  // ---- Embedding covariance + power iteration ----------------------------

  test("covariance gate matches a naive driver recompute within the " +
      "1e-8 quantization budget") {
    val cov = SparkEntry.queries("q162_embed_covariance")(spark, sf).collect()
      .map(r => (r.getAs[Long]("dim_i").toInt, r.getAs[Long]("dim_j").toInt) ->
        r.getAs[Double]("cov")).toMap
    assert(cov.size == 64 * 65 / 2)
    val vecs = Tables.embeddings(spark, sf).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    def naive(i: Int, j: Int): Double = {
      val sxx = vecs.map(v => v(i - 1) * v(j - 1)).sum
      val si = vecs.map(_(i - 1)).sum; val sj = vecs.map(_(j - 1)).sum
      sxx / n - (si / n) * (sj / n)
    }
    for ((i, j) <- Seq((1, 1), (1, 2), (5, 9), (64, 64), (33, 33)))
      assert(math.abs(cov((i, j)) - naive(i, j)) < 1e-7,
        s"cov($i,$j)=${cov((i, j))} vs naive ${naive(i, j)}")
    // diagonal entries are variances
    (1 to 64).foreach(i => assert(cov((i, i)) > 0))
  }

  test("power iteration: unit vector, positive eigenvalue, small residual") {
    val cov = SparkEntry.queries("q162_embed_covariance")(spark, sf).collect()
    val c = Array.ofDim[Double](64, 64)
    cov.foreach { r =>
      val i = r.getAs[Long]("dim_i").toInt - 1
      val j = r.getAs[Long]("dim_j").toInt - 1
      c(i)(j) = r.getAs[Double]("cov"); c(j)(i) = c(i)(j)
    }
    val rows = SparkEntry.queries("q163_power_iteration")(spark, sf)
      .orderBy("dim_i").collect()
    val v = rows.map(_.getAs[Double]("v_i"))
    val lam = rows.head.getAs[Double]("lam")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "v not unit norm")
    assert(lam > 0)
    // 8 iterations on a nearly-degenerate random spectrum: measured
    // residual/λ is 0.04–0.07 across SFs — pin an order-of-magnitude cap
    val w = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val res = math.sqrt(w.zip(v).map { case (wi, vi) =>
      val d = wi - lam * vi; d * d }.sum)
    assert(res / lam < 0.25, s"residual ${res / lam} — iteration diverged?")
  }

  test("pca projection: score and residual are a Pythagorean split of " +
      "each vector's norm") {
    val rows = SparkEntry.queries("q164_pca_projection")(spark, sf).collect()
    val norms = Tables.embeddings(spark, sf).orderBy("vec_id").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x => x.toDouble * x.toDouble).sum).toMap
    assert(rows.length == norms.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val sc = r.getAs[Double]("score"); val rs = r.getAs[Double]("resid")
      assert(rs >= 0)
      // v is unit-norm, so score² + resid² = ‖e‖² exactly (up to fp)
      assert(math.abs(sc * sc + rs * rs - norms(id)) < 1e-9,
        s"vec $id: ${sc * sc + rs * rs} vs ${norms(id)}")
    }
  }

  test("group split: a near-dup component never straddles splits") {
    val rows = SparkEntry.queries("q165_group_split")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[String]("split")))
    assert(rows.nonEmpty)
    val splitsPerComp = rows.groupBy(_._2).map { case (_, g) =>
      g.map(_._3).distinct.size }
    assert(splitsPerComp.forall(_ == 1), "component straddles splits")
    // sf0.001 has actual dup clusters: at least one multi-doc component,
    // and all three splits occur across components
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
    assert(rows.map(_._3).distinct.toSet == Set("train", "val", "test"))
  }
}
