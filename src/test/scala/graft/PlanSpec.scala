package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the properties that decide whether a
  * plan survives a 100× scale-up, pinned so a refactor can't silently
  * regress them: filter pushdown into the parquet scan, column pruning,
  * broadcast of dimension sides, map-side partial aggregation, and
  * whole-stage codegen over the hot similarity kernels.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may hand back a session another suite configured (e.g.
    // ScaleSpec disables auto-broadcast to force SMJ) — re-pin the confs
    // these plan-shape assertions depend on
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan (PushedFilters non-empty)") {
    val p = plan(Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
      .select("o_orderkey"))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
  }

  test("projection prunes the scan schema (ReadSchema only needed columns)") {
    val p = plan(SparkEntry.queries("q21_token_count")(spark, sf))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    // none of the other document columns ride the scan
    assert(!read.contains("lang") && !read.contains("url"), read)
  }

  test("star join broadcasts the dimension sides (no fact-side shuffle join)") {
    val p = plan(SparkEntry.queries("q05_star_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("wide aggregation runs partial (map-side combine) before the shuffle") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sf))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("incremental layer read prunes partitions, not just rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val layers = pipeline.Governance.runFixture(spark, out)
    val inc = pipeline.Governance.readLayerSince(spark, layers.enriched, "202401")
    val p = plan(inc)
    assert(p.contains("PartitionFilters: [") && p.contains("p_upd"), p)
    // the window really excludes older docs (fixture spans 1991..2026)
    val all = spark.read.parquet(layers.enriched).count()
    val recent = inc.count()
    assert(recent > 0 && recent < all, s"recent=$recent all=$all")
  }

  test("set-similarity join stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q24_jaccard_pairs")(spark, sf)
    df.collect() // finalize the adaptive plan — codegen markers appear then
    val p = plan(df)
    assert(p.contains("*("), p) // whole-stage-codegen stage markers
    // the pair loop is a broadcast nested-loop with the bitmap kernel
    // evaluated inside the join condition — no shuffle of the pair space
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // popcount intersection kernel (the integer-exact Jaccard device)
    assert(p.toLowerCase.contains("bitmapinter"), p)
  }

  test("as-of join is one shuffle on the key — no join operator, no pair blow-up") {
    val events = Tables.events(spark, sf)
    val views = events.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
        col("value").as("p_value"))
    val df = operators.AsofJoin.asof(views, purchases, "user_id", "ts", "ts",
      Seq("p_id", "p_value"))
    df.collect()
    val p = plan(df)
    assert(!p.contains("Join"), p) // union + window, never a join node
    assert(p.contains("Window"), p)
    // exactly one exchange hashes on the key — count only the final
    // adaptive plan (the plan string repeats under "== Initial Plan ==")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val shuffles = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 key shuffle, got $shuffles\n$finalPlan")
  }

  test("repetition filter is a shuffle-free stateless map") {
    val df = SparkEntry.queries("q64_repetition_filter")(spark, sf)
      .limit(5) // drop the gate's global orderBy — the operator itself
    df.collect()
    val p = plan(df)
    assert(p.contains("repetitionstats") || p.contains("RepetitionStats"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("resample locf: two slim exchanges, key partitioning reused for bounds+fill") {
    val df = operators.Resample.locf(
      Tables.events(spark, sf).filter(col("user_id") < 50), 3600000000L)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 2, s"expected 2 exchanges ((key,bucket) rank + key fill), got $shuffles\n$p")
    assert(p.contains("BroadcastExchange"), p) // per-bucket table into the grid join
  }

  test("epoch mixing is broadcast + lazy explode — zero shuffle") {
    import spark.implicits._
    val mix = Seq(("en", 1), ("fr", 3)).toDF("lang", "n")
    val df = operators.TrainingPipeline.epochMix(Tables.documents(spark, sf), mix)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("shard shuffle is one exchange on the shard key") {
    val df = operators.TrainingPipeline.shardShuffle(Tables.documents(spark, sf))
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shard shuffle, got $shuffles\n$p")
  }

  test("bloom decontamination probes train grams BELOW the distinct exchange") {
    val df = operators.DataSplit.decontaminateBloom(spark,
      Tables.documents(spark, sf))
    df.collect()
    val p = plan(df)
    // the bloom probe must sit under the distinct's exchange as a
    // codegen expression (not a UDF): a Filter carrying the
    // bloommightcontain kernel exists, and it feeds a partial aggregate
    // (the distinct's map side)
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("bloommightcontain")), p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("UDF"), p)
  }

  test("shaping passes (quality+langid+pii+repetition) fuse into ONE scan, no shuffle") {
    import graft.functions.{Exprs, Text}
    // all four training-data shaping passes chained over one read: the
    // whole pipeline must collapse to a single parquet scan and zero
    // exchanges — the "one corpus pass" claim in the README, pinned
    val toks = Text.tokens(col("text"))
    val df = Tables.documents(spark, sf)
      .withColumn("quality", Text.qualityScore(col("text")))
      .withColumn("lang_id", Text.langId(col("text")))
      .withColumn("clean", graft.quality.Pii.redact(col("text")))
      .withColumn("rep", Exprs.repetition_stats(toks, 3))
      .select("doc_id", "quality", "lang_id", "clean", "rep")
    df.collect()
    val p = plan(df)
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 1, s"expected 1 scan, got $scans\n$p")
    assert(!p.contains("Exchange"), p)
  }

  test("quality report co-aggregates: one scan per table outside the FK joins (q55 pin)") {
    // the whole co-aggregable battery (uniqueness/completeness/range)
    // folds into ONE agg pass per table; only the two FK anti-joins add
    // scans. customer: 1 agg + 2 FK sides; orders: 1 agg + 1 FK child;
    // lineitem: 1 agg; nation: 1 FK parent = 7 total. The round-9 shape
    // was 10 (one scan PER CHECK: orders 3×, lineitem 2×).
    val p = plan(SparkEntry.queries("q55_data_quality")(spark, sf))
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 7, s"expected 7 scans (3 agg + 4 FK-join sides), got $scans\n$p")
    // every aggregate runs partial (map-side) before its exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("PQ encode is a pure projection; ADC broadcasts the query batch (q154 pin)") {
    import graft.operators.Pq
    val e = Tables.embeddings(spark, sf)
    val en = Pq.normalized(e)
    val codes = Pq.encode(en, Pq.seedCodebook(en))
    // encode: literal-codebook argmax per subspace — no join, no shuffle
    val pEnc = plan(codes)
    assert(!pEnc.contains("Exchange"), pEnc)
    assert(!pEnc.contains("Join"), pEnc)
    // the ADC stage joins the (tiny) query batch INTO the codes stream
    // as a broadcast — the codes side must never shuffle for the join
    val pAdc = plan(Pq.adcShortlist(e))
    assert(pAdc.contains("BroadcastExchange"), pAdc)
    assert(!pAdc.contains("SortMergeJoin"), pAdc)
  }

  test("sketch gates materialize their corpus pass once (q25/q27 scan pin)") {
    // same regression class as q54: banding, bucket pairing, and the
    // exact verify all branch off one checkpointed frame — a dropped
    // checkpoint re-scans the corpus and re-runs the shingle/simhash
    // kernels once per branch
    for (name <- Seq("q25_minhash_lsh", "q27_simhash_neardup",
        "q127_incremental_neardup")) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      val scans = p.linesIterator.count(l =>
        l.contains("FileScan") || l.contains("BatchScan"))
      assert(scans == 0, s"$name re-scans the corpus downstream of the checkpoint:\n$p")
      assert(p.contains("ExistingRDD"), s"$name lost its checkpointed input:\n$p")
    }
  }

  test("dedup decisions materialize the pair join once (q54 regression pin)") {
    // Round-4 regression: the edge symmetrization unioned two projections
    // of the UNCACHED SetSimJoin output, so the whole probe+verify plan
    // executed under each branch (4.6 s → 29 s at sf0.1). decisions()
    // now localCheckpoints the tokenized docs and the pair set, so the
    // final plan must reference materialized RDDs — no pair-join operator
    // (the dense path's broadcast nested loop) and no parquet re-scan of
    // the corpus may survive into the downstream plan.
    val p = plan(operators.DedupClusters.decisions(spark, sf, 0.9))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pair join re-inlined downstream of the checkpoint:\n$p")
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 0, s"corpus re-scanned after tokenize checkpoint:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected checkpointed inputs in the plan:\n$p")
  }

  test("triangle count materializes the co-occurrence graph once (q110 scan pin)") {
    // same class as q54/q25: edges feed degree count + orientation join +
    // wedge closure — without the checkpoints the lineitem self-join
    // would execute once per consumer
    val p = plan(SparkEntry.queries("q110_triangles")(spark, sf))
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 0, s"q110 re-scans lineitem downstream of the edge checkpoint:\n$p")
    assert(p.contains("ExistingRDD"), s"q110 lost its checkpointed edges:\n$p")
  }

  test("int8 ANN rerank broadcasts probes and pushes the probe filter down") {
    val df = SparkEntry.queries("q112_ann_int8")(spark, sf)
    df.collect()
    val p = plan(df)
    // probe side: pruned at the scan, shipped broadcast; candidate side
    // streams through exactly one more scan — no shuffle of the pairs
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LessThan(vec_id,20)"), s"probe filter not pushed:\n$p")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") || l.contains("BatchScan"))
    assert(scans == 2, s"expected probe scan + candidate scan, got $scans\n$finalPlan")
  }

  test("sliding window is slab-replicated — no single-partition-per-key window (q115)") {
    // events has a handful of event types at every SF: a window
    // partitioned by event_type alone funnels each type's entire history
    // through one task. The slab design must survive refactors: the
    // window (and its exchange) partitions on (event_type, __chunk).
    val p = plan(operators.Timeseries.q115.fn(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"q115 lost its window:\n$p")
    assert(winLines.forall(l => l.contains("__chunk")),
      s"q115 window no longer partitions by the slab key:\n${winLines.mkString("\n")}")
    assert(p.contains("hashpartitioning(event_type"),
      s"q115 exchange not keyed on (event_type, __chunk):\n$p")
  }

  test("rolling z-score uses a rows frame, not a range frame (q121)") {
    // a RANGE frame over __us would re-scan equal-timestamp runs and
    // (worse) silently change semantics on ties; the look-back is
    // defined as the previous 20 ROWS
    val p = plan(operators.Timeseries.q121.fn(spark, sf))
    assert(p.contains("RowFrame"), s"q121 lost its rows frame:\n$p")
    assert(!p.contains("RangeFrame"),
      s"q121 window regressed to a range frame:\n$p")
  }

  test("cosine top-k aggregates the pair stream — no window sort over pairs") {
    // q30's 25M-pair brute-force stream must reach the exchange already
    // partial-aggregated to <= k rows per (query, partition) by the
    // TopKSim aggregator; a row_number window would instead shuffle and
    // sort EVERY pair. Pin: no Window exec anywhere, and an aggregate
    // with a partial_topksim below the exchange.
    for (q <- Seq(operators.Similarity.q30, operators.Similarity.q31,
        operators.Similarity.q32)) {
      val p = plan(q.fn(spark, sf))
      assert(p.contains("partial_topksim"),
        s"${q.name} lost the partial top-k aggregate:\n$p")
    }
    // no gate may window ANY stream: q30/q31's pair streams aggregate
    // through TopKSim, and q32's centroid assignment is the map-side
    // literal argmax (sort_array over ≤16 inlined centroids) — zero
    // Exchange/Sort/Window on the assignment path
    for (q <- Seq(operators.Similarity.q30, operators.Similarity.q31,
        operators.Similarity.q32)) {
      val p = plan(q.fn(spark, sf))
      assert(!p.contains("Window"), s"${q.name} still windows a stream:\n$p")
    }
    // and the assignment stream itself (everything below the pair join)
    // must be exchange-free: the only exchanges in q32's whole plan are
    // the pair-join build side broadcast and the top-k aggregation
    val p32 = plan(operators.Similarity.q32.fn(spark, sf))
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p32).map(_.group(1)).toSet
    assert(exchanges.subsetOf(Set("query_id", "qlist", "nlist")),
      s"q32 exchanges on unexpected keys $exchanges:\n$p32")
  }

  test("dsir weight fold joins the gram stream against a BROADCAST feature table") {
    // q124's per-gram weight lookup is a B(=64)-row table: it must reach
    // the gram stream as a broadcast hash join, never an exchange of the
    // gram stream on the bucket key — at 100 TB the gram stream is the
    // corpus ×~wordcount and must not shuffle for a 64-row lookup.
    // Pinned on the weight FRAME: the full gate routes it through
    // ScaleWindows, whose checkpoint-before-count truncates the
    // explained plan above the rank stage (r15 — the routing-count
    // economy change made the truncation unconditional).
    val p = plan(operators.Weighting.dsirWeightFrame(
      Tables.documents(spark, sf),
      targetSources = Set("src0", "src1", "src2"), wide = false))
    assert(p.contains("BroadcastHashJoin"), s"q124 lost the broadcast feature join:\n$p")
    val exchangesOnB = "hashpartitioning\\(b#".r.findAllIn(p).size
    assert(exchangesOnB <= 1, // the bucket-count groupBy is the one legit b-exchange
      s"q124 shuffles the gram stream on the bucket key beyond the count pass:\n$p")
  }

  test("ccnet scoring partial-aggregates the gram stream before both shuffles") {
    // the gram-count pass and the per-doc fold must both run map-side
    // partials; the ntile window is per-language by design (gate-scale
    // exact cut — see the q114-sketch scale note on Weighting)
    val p = plan(SparkEntry.queries("q123_ccnet_buckets")(spark, sf))
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"q123 lost map-side partial aggregation:\n$p")
  }

  test("range join aggregates points to day partials below the join (q102 eager agg)") {
    // the pair stream must carry day-level (count, sum) partials, not raw
    // lineitem rows — without the pushed group-by the bin join emits
    // O(|lineitem| × intervals-per-bin) candidates
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val joins = SparkEntry.queries("q102_range_join")(spark, sf)
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "q102 lost its join")
    assert(joins.exists(j => Seq(j.left, j.right).exists(
      _.collectFirst { case a: Aggregate => a }.isDefined)),
      "no aggregate below the range join — point rows flow raw into the pair stream")
  }

  test("phrase joins 2..n reuse the (doc_id, base) partitioning — one exchange per slot") {
    // a 3-term phrase is two chained equi-joins on (doc_id, base); the
    // second join's left input is the first join's output, which is
    // ALREADY hash-partitioned on exactly those keys — so the plan must
    // carry one (doc_id, base) exchange per phrase SLOT (each slot's
    // posting stream), never one per JOIN, plus the single doc_id
    // exchange for the occurrence count
    // At gate scale AQE broadcast-joins the tiny filtered posting streams
    // (a fine plan, but not the one this pin is about) — force the
    // shuffle-join path so the partitioning-reuse claim is actually
    // exercised, as it would be at 100 TB where no posting stream fits a
    // broadcast.
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeAuto =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val p =
      try {
        val phrase = Seq("fast", "data", "scan")
        val df = operators.Postings.phraseSearch(
          operators.Postings.positionalIndex(Tables.documents(spark, sf)), phrase)
        df.collect()
        plan(df).split("== Initial Plan ==")(0)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
        prevAqeAuto.foreach(
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
        if (prevAqeAuto.isEmpty)
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    val phrase = Seq("fast", "data", "scan")
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    val onDocBase = exchanges.count(l =>
      l.contains("doc_id") && l.contains("base"))
    assert(onDocBase == phrase.size,
      s"expected ${phrase.size} (doc_id, base) exchanges (one per slot, " +
        s"joins reuse the partitioning), got $onDocBase\n$p")
    // each slot additionally carries ONE (token, doc_id) exchange from the
    // positional-index collect_list aggregation (inherent to building the
    // index inline; a persisted index table would drop these), and the
    // final groupBy(doc_id) re-keys once — nothing else may shuffle, and
    // in particular no join may add a re-exchange between slots 2..n
    assert(exchanges.size == 2 * phrase.size + 1,
      s"expected ${2 * phrase.size + 1} total exchanges, got ${exchanges.size}\n$p")
  }

  test("cluster-balanced sample: map-side argmax adds no exchange — two total") {
    // q151's assignment is the literal-centroid argmax (projection +
    // explode, no join, no shuffle); the ONLY exchanges are the
    // per-cluster cap window's hashpartitioning(cluster) and the final
    // orderBy range partition. An assignment that regressed to a
    // join/window would add a third.
    val df = SparkEntry.queries("q151_cluster_sample")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    val exchanges = p1.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    assert(exchanges.size == 2, s"expected 2 exchanges, got ${exchanges.size}\n$p1")
    assert(exchanges.exists(_.contains("cluster")),
      s"no hashpartitioning(cluster) exchange — cap window lost its key\n$p1")
    assert(p1.contains("WindowGroupLimit"),
      s"cap window lost its group-limit pushdown\n$p1")
  }

  test("IVF-routed hard negatives: list join broadcasts, no cartesian, two exchanges") {
    // q152's candidate stream is an equi-join on the probed list id —
    // broadcastable (one row per vector) and never a cartesian/BNLJ;
    // the top-k aggregator re-keys once on query_id and the final sort
    // ranges once. The label filter must ride the join, not a
    // post-join filter stage over a wider stream.
    val df = SparkEntry.queries("q152_hard_negatives_ivf")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"),
      s"routed path degraded to an all-pairs join\n$p1")
    val exchanges = p1.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    assert(exchanges.size <= 2, s"expected <=2 non-broadcast exchanges, got ${exchanges.size}\n$p1")
  }

  test("cross-modal top-k: image side broadcasts, scored stream partial-aggregates with no extra exchange") {
    // q291's 3.6M scored pairs must never shuffle row-wise: the image
    // feature table (corpus/10 rows of decoded dHash signs) is the
    // broadcast side of the deliberate brute cross join, the top-3
    // heap partial-aggregates map-side (partial_topksimlong), and the
    // scored stream inherits the caption build's doc_id partitioning —
    // so NO hashpartitioning(query_id) exchange may appear between the
    // partial and final heap aggregates
    val p = plan(SparkEntry.queries("q291_crossmodal_align")(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q291 lost the broadcast image side of the brute cross join\n$p")
    assert(p.contains("partial_topksimlong"),
      s"q291 top-k lost its map-side partial heap\n$p")
    assert(!p.contains("hashpartitioning(query_id"),
      s"q291 re-shuffles the scored pair stream for the top-k\n$p")
    // q292's routed form: same heap tail, candidates via the list-id
    // equi-join — never a cartesian/BNLJ
    val p2 = plan(SparkEntry.queries("q292_crossmodal_align_ivf")(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"q292's routed candidate join degraded to all-pairs\n$p2")
    assert(p2.contains("partial_topksimlong"),
      s"q292 top-k lost its map-side partial heap\n$p2")
  }

  test("IVF recall curve: probe stages never cartesian; truth side is the broadcast BNLJ") {
    // q245 runs three probe settings plus the brute truth in one plan:
    // the IVF stages must stay equi-joins on the list id (assignment is
    // the literal-argmax projection — no join), and the ONLY
    // nested-loop in the tree is the deliberate broadcast brute truth
    // (q30's designed shape). A CartesianProduct anywhere means a
    // probe stage degraded to all-pairs.
    val df = SparkEntry.queries("q245_ivf_recall_curve")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(!p1.contains("CartesianProduct"),
      s"a probe stage degraded to a cartesian\n$p1")
    assert(p1.contains("BroadcastNestedLoopJoin"),
      s"brute truth side lost its broadcast NLJ shape\n$p1")
  }

  test("source MinHash overlap: one corpus scan, pair join never cartesian") {
    // q269's signature table is 20 rows — the pair join must come out
    // broadcast (BNLJ over the tiny self-join is fine; a shuffle-based
    // CartesianProduct would be the corpus moving instead)
    val df = SparkEntry.queries("q269_source_minhash_overlap")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(!p1.contains("CartesianProduct"),
      s"signature pair join degraded to a shuffled cartesian\n$p1")
    // exactly one parquet scan of documents feeds the signature build
    val scans = p1.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(scans <= 1, s"signature build re-scans documents ($scans)\n$p1")
  }

  test("quantile normalization: no cartesian — rank tables join by position") {
    val df = SparkEntry.queries("q250_quantile_normalize")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(!p1.contains("CartesianProduct"),
      s"rank mapping degraded to a cartesian\n$p1")
  }

  test("brute hard negatives: the all-pairs side is broadcast, not shuffled") {
    // q150 IS the designed brute path: a non-equi self-join must come
    // out as BroadcastNestedLoopJoin over the broadcast neighbor side
    // (the deliberate gate-scale plan) — a shuffle-based cartesian
    // would move the corpus instead of the 26 MB vector table
    val df = SparkEntry.queries("q150_hard_negatives")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(p1.contains("BroadcastNestedLoopJoin"),
      s"brute pair stream is not the broadcast nested-loop plan\n$p1")
    assert(!p1.contains("CartesianProduct"), s"cartesian shuffle crept in\n$p1")
  }

  test("covariance: pair build is broadcast — dim slices never shuffle") {
    // q162's per-vector self-join must be a broadcast hash join (the
    // exploded side is n·64 compact rows); the only non-broadcast
    // exchanges are the 2080-group partial agg, the tiny mean agg, and
    // the output sort. A shuffle-based self-join would move the corpus
    // twice per covariance pass.
    val df = graft.operators.Linalg.covariance(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(p1.contains("BroadcastHashJoin"),
      s"pair build lost its broadcast join\n$p1")
    assert(p1.contains("HashAggregate"), s"partial agg missing\n$p1")
    val shuffles = p1.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).size
    assert(shuffles <= 4, s"covariance plan grew to $shuffles shuffles\n$p1")
  }

  test("LM surprisal scores the token stream against BROADCAST model tables (q181)") {
    // the bigram and context count tables are vocab-sized: scoring must
    // be two broadcast hash joins over the stream, never a shuffle of
    // the corpus onto the model keys
    val df = SparkEntry.queries("q181_lm_surprisal")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(p1.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"model join lost its broadcasts\n$p1")
  }

  test("pair lift joins document frequencies BROADCAST (q169)") {
    val df = SparkEntry.queries("q169_pair_lift")(spark, sf)
    df.collect()
    val p1 = plan(df).split("== Initial Plan ==")(0)
    assert(p1.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"df-table joins lost their broadcasts\n$p1")
    // the pair build itself shuffles on doc_id only — a partial agg
    // must sit below that exchange
    assert(p1.contains("HashAggregate"), p1)
  }

  test("bucketed join: zero exchanges below the presentation sort (q177)") {
    // both sides bucketed+sorted on the join key into the same bucket
    // count: the join AND the per-order aggregation must run on the
    // bucketed scan's distribution — the ONLY shuffle allowed in the
    // whole plan is the final orderBy's range exchange. A second
    // exchange means bucketing metadata was lost and the fact-to-fact
    // join would re-shuffle the corpus at scale.
    // disable auto-broadcast: at fixture scale the optimizer would
    // broadcast the orders side (fine, and also exchange-free), but the
    // property this spec pins is the FACT-TO-FACT case where broadcast
    // is off the table and only bucket co-location avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q177_bucketed_join")(spark, sf)
      df.collect()
      val p1 = plan(df).split("== Initial Plan ==")(0)
      val shuffles = p1.linesIterator
        .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
      assert(shuffles.size == 1 && shuffles.head.contains("rangepartitioning"),
        s"bucketed join must shuffle only for the output sort; got\n" +
          s"${shuffles.mkString("\n")}\n$p1")
      assert(p1.contains("SortMergeJoin"), s"expected a sort-merge join\n$p1")
      assert(p1.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware\n$p1")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hashed classifier plan has NO join — the hashing trick folds the model lookup (q209 pin)") {
    val p = plan(SparkEntry.queries("q209_linear_quality")(spark, sf))
    assert(!p.contains("Join"), s"model lookup leaked into a join:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"doc aggregation must partial-aggregate map-side:\n$p")
  }

  test("PRF two-pass retrieval joins only by broadcast — no fact-side shuffle join (q204 pin)") {
    val p = plan(SparkEntry.queries("q204_prf_expansion")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"a model-side table fell out of broadcast:\n$p")
  }

  test("MaxSim scoring is a single unrolled expression — no Generate/explode in the plan (q219 pin)") {
    val p = plan(SparkEntry.queries("q219_colbert_maxsim")(spark, sf))
    assert(!p.contains("Generate"),
      s"the 4x4 grid must not explode rows:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus side must broadcast at gate scale:\n$p")
  }

  test("trigram verification broadcasts the CANDIDATES into the corpus scan (q205 pin)") {
    val p = plan(SparkEntry.queries("q205_trigram_like")(spark, sf))
    // the contains() verify join must be a broadcast build on the
    // candidate side — a corpus-side shuffle join would invert at
    // 100 TB. (The final 5-row pattern-keyed outer join is free to be
    // whatever — only the doc_id joins touch corpus-sized data.)
    val docJoins = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("doc_id")).toSeq
    assert(docJoins.nonEmpty, p)
    assert(docJoins.forall(_.contains("BroadcastHashJoin")),
      s"corpus-keyed join not broadcast:\n${docJoins.mkString("\n")}\n$p")
  }

  test("pagerank small-|V| branch broadcasts the rank table (q106/q187 pin)") {
    import spark.implicits._
    val e = spark.range(200)
      .select(($"id" % 50).as("src"), (($"id" * 7 + 3) % 50).as("dst"))
      .localCheckpoint()
    val ranks = e.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("deg")).withColumn("r", lit(1000000L))
    val p = plan(operators.Graph.contributionStep(e, ranks, big = false))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("pagerank big-|V| branch: ranks shuffle to PRE-PARTITIONED edges — edges never re-shuffle, nothing broadcasts") {
    import spark.implicits._
    val e = operators.Graph.checkpointPartitionedBy( // once-per-run edge shuffle
      spark.range(200)
        .select(($"id" % 50).as("src"), (($"id" * 7 + 3) % 50).as("dst")),
      "src")
    val ranks = e.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("deg")).withColumn("r", lit(1000000L))
    val p = plan(operators.Graph.contributionStep(e, ranks, big = true))
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastExchange"),
      s"big-|V| branch must not broadcast an O(|V|) table:\n$p")
    // the edge side's HashPartitioning(src) satisfies the join — the
    // only exchanges are the rank side and the dst-sum aggregation
    assert(!p.contains("Exchange hashpartitioning(src"),
      s"edges must not re-shuffle per iteration:\n$p")
  }

  test("routed cross-side miners never build the brute cross join (q279/q280 pin)") {
    // the whole point of the routed twins: candidate generation is a
    // pure projection (centroid ranking inlined as literals) plus a
    // join on the int list id — a CartesianProduct or
    // BroadcastNestedLoopJoin anywhere in the pair build means the
    // brute cross join crept back in
    val p = plan(operators.LabelProp.routedCrossPairs(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"routed pair build degraded to a nested-loop cross join:\n$p")
    // the derived-geometry generator (q286/q287) keeps the same shape
    val pa = plan(operators.LabelProp.routedCrossPairsAuto(spark, sf))
    assert(!pa.contains("CartesianProduct") &&
      !pa.contains("BroadcastNestedLoopJoin"),
      s"auto-geometry pair build degraded to a cross join:\n$pa")
  }

  test("auto-sized IVF stays projection+list-join shaped: no cartesian, no nested loop (q281 pin)") {
    // the N-scaled geometry must keep q32's plan shape: centroid
    // ranking is a per-row projection over an array literal (no join),
    // and the only join is qlist = nlist on the int list id
    val p = plan(SparkEntry.queries("q281_ann_ivf_autonlist")(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"auto-sized IVF degraded to a nested-loop cross join:\n$p")
  }

  test("panel selection is a distributed top-K: TakeOrderedAndProject, no single-partition sort (EvalPanel pin)") {
    // orderBy(h, vec_id).limit(K) must plan as per-partition top-K + a
    // K-row driver merge — a global Sort under the limit would funnel
    // the corpus through one partition at 100 TB
    val p = plan(operators.EvalPanel.panel(Tables.embeddings(spark, sf)))
    assert(p.contains("TakeOrderedAndProject"),
      s"panel selection lost its distributed top-K shape:\n$p")
  }

  test("derived-k SemDeDup keeps the projection+cell-join shape: no cartesian, no nested loop (q288 pin)") {
    // assignment must stay a per-row projection (HOF argmax over the
    // centroid array — constant codegen size at any derived k) and the
    // only join in the pair build a hash join on cent_id
    val df = SparkEntry.queries("q288_semdedup_autok")(spark, sf)
    df.collect() // localCheckpoint + components force execution before explain
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"derived-k SemDeDup degraded to a nested-loop cross join:\n$p")
  }

  test("bloom decontamination: membership is broadcast semi-joins, the corpus side never shuffles on grams (q289 pin)") {
    // the scale contract: the eval side probes the ≤2²¹-position filter
    // via BROADCAST left-semi joins — a shuffle of the gram stream onto
    // the filter (or a cartesian) would move the 100 TB side instead of
    // the 16 MB one
    val df = SparkEntry.queries("q289_bloom_decontam")(spark, sf)
    df.collect() // localCheckpoints force execution before explain
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"bloom membership lost its broadcast semi-join shape:\n$p")
  }

  test("derived-geometry label prop keeps the projection+list-join shape (q285 pin)") {
    val df = SparkEntry.queries("q285_label_prop_autonlist")(spark, sf)
    df.collect() // localCheckpoints inside force execution before explain
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"auto-geometry label prop degraded to a nested-loop cross join:\n$p")
  }

  test("LM scoring: model tables broadcast onto the bigram stream, no cartesian (q272/q274)") {
    // the 100 TB shape: the corpus-side bigram stream is scored by
    // BROADCAST model joins (CCNet ships its LM to every worker the
    // same way) — a shuffle of the corpus onto the model, or a
    // cartesian, would move the 100 TB side instead of the model
    for (name <- Seq("q272_lm_xent", "q274_dsir_importance")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = plan(df).split("== Initial Plan ==")(0)
      assert(!p.contains("CartesianProduct"),
        s"$name: scoring degraded to a cartesian\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$name: model join lost its broadcast shape\n$p")
    }
  }
}
