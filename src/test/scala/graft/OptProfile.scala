package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exprs
import graft.{Tables => GTables}

/** Round-15 optimization A/B harness (dev tool, not a gate): times the
  * OLD shape of each restructured operator against the SHIPPED one in
  * the SAME JVM with interleaved repeats (the DedupProfile discipline —
  * this sandbox shows 10-100x contention spikes across processes, so
  * cross-JVM comparisons are unusable), and asserts ROW IDENTITY
  * (exceptAll both ways) between the two shapes before timing counts.
  *
  * Legacy bodies are verbatim copies of the pre-r15 code, kept HERE
  * (test sources) so src/main carries only the shipped form.
  *
  * Usage: runMain graft.OptProfile [sfDir] [reps]
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def scrub(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- legacy shapes (verbatim pre-r15 bodies) ----

    def legacyIvfAssign(df: DataFrame, cents: Seq[(Long, Seq[Float])],
        vecCol: String, outCol: String, keep: Int): DataFrame = {
      val cands = array(cents.map { case (cid, cv) =>
        struct(
          round(Exprs.cosine_sim(col(vecCol), typedlit(cv)), 4).as("csim"),
          lit(-cid).as("negid"))
      }: _*)
      df.select(col("*"),
          explode(slice(sort_array(cands, asc = false), 1, keep)).as("cand"))
        .withColumn(outCol, -col("cand.negid"))
        .drop("cand")
    }

    def legacyIvfTopK(e: DataFrame, cents: DataFrame,
        probes: Int, topK: Int): DataFrame = {
      val centArr = Similarity.localCents(cents)
      val assigned = legacyIvfAssign(
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb")),
        centArr, "vb", "nlist", 1)
      val qprobes = legacyIvfAssign(
        e.select(col("vec_id").as("query_id"), col("embedding").as("va")),
        centArr, "va", "qlist", probes)
      val pairs = qprobes.join(assigned, col("qlist") === col("nlist"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
      Similarity.topKPerQuery(pairs, topK)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }

    def legacyImageFeatures(s: SparkSession, d: String): DataFrame =
      graft.multimodal.Multimodal.dhashAll(
          graft.multimodal.Multimodal.ppmTable(s, d).filter(col("doc_id") % 10 === 0))
        .toDF()
        .select(col("doc_id").as("image_id"),
          expr("""transform(sequence(0, 63), j -> CAST(
            IF(IF(j < 32, shiftright(dhash_lo, CAST(j AS INT)),
                  shiftright(dhash_hi, CAST(j AS INT) - 32)) % 2 = 1,
               0.125D, -0.125D) AS FLOAT))""").as("img_vec"))

    def legacyQ184(s: SparkSession, d: String): DataFrame = {
      import graft.functions.Text
      import graft.multimodal.Multimodal._
      val qy = graft.Tables.documents(s, d)
        .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
      val dh = dhashAll(ppmTable(s, d)).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
      val au = audioFingerprint(wavTable(s, d)).toDF()
        .groupBy("doc_id").agg(count(lit(1)).as("n_audio_win"))
      val dup = dhashPairs(s, d).select(col("id_b").as("doc_id")).distinct()
        .withColumn("dup_image", lit(true))
      qy.join(dh, "doc_id").join(au, "doc_id")
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality"), col("width"), col("height"),
          col("n_audio_win"),
          coalesce(col("dup_image"), lit(false)).as("dup_image"),
          (col("quality") >= 0.45 && coalesce(col("dup_image"), lit(false)) === false)
            .as("keep"))
        .orderBy("doc_id")
    }

    // optional 3rd arg: comma-separated gate labels (dev loop for a
    // single gate's A/B without re-running the whole sweep); filters
    // both the identity checks and the timing arms
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    def wanted(label: String): Boolean =
      only.forall(_.exists(o => label == o || label.startsWith(o + "/")))
    // fail LOUDLY on a label that matches nothing (r15 advice): a typo'd
    // (or empty) filter would otherwise skip every identity check and
    // timing arm and exit cleanly looking like a pass with zero checks
    val knownLabels = Set(
      "q32/ivfTopK", "q291/imageFeatures", "q184", "q158/ivfPqTopK",
      "q132", "q232", "q107", "q167", "q110", "q220", "q291", "q32",
      "q245", "q158", "q32fat", "ivfstore", "q106", "q106routed",
      "q132banded")
    only.foreach { req =>
      val unknown = req.filterNot(o =>
        knownLabels.exists(l => l == o || l.startsWith(o + "/")))
      require(unknown.isEmpty,
        s"unknown OptProfile label(s): ${unknown.mkString(",")} — " +
          s"known: ${knownLabels.toSeq.sorted.mkString(",")}")
    }

    // ---- row-identity checks (old ≡ new) ----
    def identical(label: String, a: => DataFrame, b: => DataFrame): Unit = {
      if (!wanted(label)) return
      val d1 = a.exceptAll(b).count()
      val d2 = b.exceptAll(a).count()
      require(d1 == 0 && d2 == 0, s"$label old/new diverge: $d1/$d2")
      println(s"[optprof] $label: old ≡ new (sym-diff 0)")
      scrub()
    }

    val e = GTables.embeddings(spark, dir)
    val cents16 = e.orderBy("vec_id").limit(Similarity.IVF_LISTS)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

    identical("q32/ivfTopK",
      legacyIvfTopK(e, cents16, Similarity.IVF_PROBES, 3),
      Similarity.ivfTopK(e, cents16))
    identical("q291/imageFeatures",
      legacyImageFeatures(spark, dir),
      graft.multimodal.Multimodal.imageFeatures(spark, dir))
    identical("q184",
      legacyQ184(spark, dir),
      graft.multimodal.Multimodal.q184.fn(spark, dir))
    def legacyIvfPqTopK(e: DataFrame): DataFrame = {
      val centArr = Similarity.localCents(Similarity.kmeansCentroids(e))
      val nlist = legacyIvfAssign(
        e.select(col("vec_id").as("neighbor_id"), col("embedding")),
        centArr, "embedding", "nlist", 1)
        .select("neighbor_id", "nlist")
      val qlist = legacyIvfAssign(
        e.select(col("vec_id").as("query_id"), col("embedding")),
        centArr, "embedding", "qlist", Similarity.IVF_PROBES)
        .select("query_id", "qlist")
      val en = Pq.normalized(e).localCheckpoint(true)
      val cb = Pq.trainCodebook(en)
      val codes = Pq.encode(en, cb).withColumnRenamed("vec_id", "neighbor_id")
      val qn = en.select(col("vec_id").as("query_id"), col("ne").as("qn"))
      val pairs = qlist.join(nlist, col("qlist") === col("nlist"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .join(codes, "neighbor_id")
        .join(qn, "query_id")
      val adc = Exprs.pq_adc(col("qn"), col("codes"), Pq.flatCb(cb),
        Pq.M, Pq.SUB, Pq.K)
      val short = Similarity.topKPerQueryLong(
        pairs.select(col("query_id"), col("neighbor_id"), adc.as("score")),
        IvfPq.SHORTLIST)
        .select("query_id", "neighbor_id")
      val reranked = short
        .join(e.select(col("vec_id").as("query_id"),
          col("embedding").as("va")), "query_id")
        .join(e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("vb")), "neighbor_id")
        .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
      Similarity.topKPerQuery(
        reranked.select(col("query_id"), col("neighbor_id"), col("sim")), IvfPq.TOPK)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }
    identical("q158/ivfPqTopK",
      legacyIvfPqTopK(e),
      IvfPq.ivfPqTopK(e))

    // legacy (un-checkpointed) shapes of the self-join double-scan fixes
    def legacyCooccur(items: DataFrame, bk: String, it: String,
        minSupport: Long): DataFrame = {
      val i = items.select(col(bk).as("bk"), col(it).as("item")).distinct()
      val a = i.select(col("bk"), col("item").as("p1"))
      val b = i.select(col("bk"), col("item").as("p2"))
      a.join(b, Seq("bk")).filter(col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
    }
    def legacyQ107(s: SparkSession, d: String): DataFrame =
      legacyCooccur(GTables.lineitem(s, d), "l_orderkey", "l_partkey", 2L)
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(100)
    def legacyQ167(s: SparkSession, d: String): DataFrame = {
      val b = GTables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type").as("et"), date_trunc("hour", col("ts")).as("h"),
          col("user_id").as("u"))
        .distinct()
      val hub = b.groupBy("et", "h").agg(min(col("u")).as("mu"))
      val edges = b.join(hub, Seq("et", "h"))
        .filter(col("u") > col("mu"))
        .select(col("u").as("a"), col("mu").as("b"))
        .distinct()
      Graph.twoPhaseCC(edges, Graph.CcRounds).orderBy("node")
    }

    // legacy (un-checkpointed) q132: sig recomputed by every consumer
    def legacyQ132(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Text
      val documents = GTables.documents(s, d)
      val sig = documents
        .select(col("doc_id"),
          explode(array_distinct(
            Text.shingles(Text.tokens(col("text")), 2))).as("tok"))
        .select(col("doc_id"),
          Exprs.mulmod61(Exprs.poly_hash(col("tok")), Sketches.Kmv.G).as("h"))
        .groupBy("doc_id")
        .agg(min(Exprs.mulmod61(col("h"), MinhashEstimate.Gs(0))).as("s0"),
          MinhashEstimate.Gs.zipWithIndex.drop(1).map { case (g, i) =>
            min(Exprs.mulmod61(col("h"), g)).as(s"s$i")
          }.toSeq: _*)
        .select(col("doc_id"),
          array((0 until MinhashEstimate.K).map(i => col(s"s$i")): _*).as("sig"))
      val bandCols = (0 until MinhashEstimate.Bands).map { b =>
        array_join(transform(
          slice(col("sig"), b * MinhashEstimate.Rows + 1, MinhashEstimate.Rows),
          _.cast("string")), ":")
      }
      val banded = sig
        .select(col("doc_id"), posexplode(array(bandCols: _*)))
        .withColumnRenamed("pos", "bnd").withColumnRenamed("col", "bv")
        .withColumn("rn", row_number().over(
          Window.partitionBy("bnd", "bv").orderBy("doc_id")))
        .filter(col("rn") <= MinhashEstimate.BucketCap)
        .drop("rn")
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.bnd") === col("b.bnd") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      cand
        .join(sig.select(col("doc_id").as("id_a"), col("sig").as("siga")), "id_a")
        .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sigb")), "id_b")
        .withColumn("n_match",
          aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => (x === y).cast("int")), lit(0), (a, x) => a + x)
            .cast("long"))
        .select(col("id_a"), col("id_b"), col("n_match"),
          round(col("n_match") / lit(MinhashEstimate.K.toDouble), 4).as("est"))
        .orderBy("id_a", "id_b")
    }

    // legacy q232: raw un-checkpointed (union reads the join+distinct
    // twice) and frontier seeded from `edges` (a third/fourth full
    // execution of the edge build)
    def legacyQ232(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val raw = GTables.orders(s, d)
        .join(GTables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2L).as("c"), (col("l_suppkey") * 2L + 1L).as("sp"))
        .distinct()
      val edges = raw.select(col("c").as("src"), col("sp").as("dst"))
        .unionByName(raw.select(col("sp").as("src"), col("c").as("dst")))
      val adj = edges
        .withColumn("rk", row_number().over(Window.partitionBy("src").orderBy("dst")))
        .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint(true)
      var frontier = edges.filter(col("src") % 20 === 0).select("src").distinct()
        .crossJoin((0 until Graph.WalksPerNode).map(_.toLong).toDF("walk"))
        .select(col("src").as("start"), col("walk"), col("src").as("cur"),
          col("src").cast("string").as("path"))
      for (t <- 1 to Graph.WalkLen) {
        val h = Exprs.mulmod61(Exprs.poly_hash(
          concat(col("start").cast("string"), lit(":"), col("walk").cast("string"),
            lit(":"), lit(t).cast("string"), lit(":"), col("cur").cast("string"))),
          Sketches.Kmv.G)
        frontier = frontier
          .join(adj, col("cur") === col("src"))
          .filter(col("rk") === lit(1) + pmod(h, col("deg")))
          .select(col("start"), col("walk"), col("dst").as("cur"),
            concat(col("path"), lit(">"), col("dst").cast("string")).as("path"))
      }
      frontier.select(col("start"), col("walk").cast("long").as("walk"), col("path"))
        .orderBy("start", "walk")
    }

    identical("q132",
      legacyQ132(spark, dir),
      MinhashEstimate.q132.fn(spark, dir))
    identical("q232",
      legacyQ232(spark, dir),
      Graph.q232.fn(spark, dir))

    // legacy (pre-r16) pagerank loop: EAGER per-iteration localCheckpoint
    // (a blocking materialization job every round; r16 ships the lazy
    // form where materialization rides the next round's first job)
    def legacyPagerank(edges: DataFrame, iters: Int,
        broadcastCap: Long = Graph.BroadcastRankCap): DataFrame = {
      val e0 = edges.select("src", "dst").localCheckpoint()
      val nodes0 = e0.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")).localCheckpoint()
      val n = nodes0.count()
      val r0 = 1000000000000L / n
      val tp = 1000000000000L * 15 / 100 / n
      val big = n > broadcastCap
      val e = if (big) Graph.checkpointPartitionedBy(e0, "src") else e0
      val nodes =
        if (big) Graph.checkpointPartitionedBy(nodes0, "node") else nodes0
      var ranks = nodes.withColumn("r", lit(r0))
      for (_ <- 1 to iters) {
        val joined =
          if (big) e.join(ranks.hint("shuffle_hash"), e("src") === ranks("node"))
          else e.join(broadcast(ranks), e("src") === ranks("node"))
        val contrib = joined
          .select(col("dst").as("node"), expr("r div deg").as("c"))
          .groupBy("node").agg(sum("c").as("s"))
        val next =
          if (big) nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          else nodes.join(broadcast(contrib), Seq("node"), "left")
        ranks = next.select(col("node"), col("deg"),
          (lit(tp) + coalesce(expr("(85 * s) div 100"), lit(0L))).as("r"))
          .localCheckpoint()
      }
      ranks.select("node", "r")
    }
    def q106Edges(s: SparkSession, d: String): DataFrame = {
      val raw = GTables.orders(s, d)
        .join(GTables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2L).as("c"),
          (col("l_suppkey") * 2L + 1L).as("sp"))
        .distinct()
      raw.select(col("c").as("src"), col("sp").as("dst"))
        .unionByName(raw.select(col("sp").as("src"), col("c").as("dst")))
    }

    // candidate shape for verdict item 4: q132 with the BANDED table
    // also materialized (lazy), so the bucket-cap window runs once
    // instead of once per side of the candidate self-join
    def q132BandedMat(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sig = MinhashEstimate.signatures(GTables.documents(s, d))
        .localCheckpoint(false)
      val bandCols = (0 until MinhashEstimate.Bands).map { b =>
        array_join(transform(
          slice(col("sig"), b * MinhashEstimate.Rows + 1, MinhashEstimate.Rows),
          _.cast("string")), ":")
      }
      val banded = sig
        .select(col("doc_id"), posexplode(array(bandCols: _*)))
        .withColumnRenamed("pos", "bnd").withColumnRenamed("col", "bv")
        .withColumn("rn", row_number().over(
          Window.partitionBy("bnd", "bv").orderBy("doc_id")))
        .filter(col("rn") <= MinhashEstimate.BucketCap)
        .drop("rn")
        .localCheckpoint(false)
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.bnd") === col("b.bnd") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      cand
        .join(sig.select(col("doc_id").as("id_a"), col("sig").as("siga")), "id_a")
        .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sigb")), "id_b")
        .withColumn("n_match",
          aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => (x === y).cast("int")), lit(0), (a, x) => a + x)
            .cast("long"))
        .select(col("id_a"), col("id_b"), col("n_match"),
          round(col("n_match") / lit(MinhashEstimate.K.toDouble), 4).as("est"))
        .orderBy("id_a", "id_b")
    }

    // r15 FAT-checkpoint ivfTopK (vectors stored probes× in executor
    // block storage) — the shape r16 slims to (vec_id, lst, crn); kept
    // here so the storage/time A/B has the exact r15 arm to compare
    def fatIvfTopK(e: DataFrame, cents: DataFrame,
        probes: Int, topK: Int): DataFrame = {
      val centArr = Similarity.localCents(cents)
      val asg = Similarity.ivfAssignRanked(
        e.select(col("vec_id"), col("embedding")),
        centArr, "vec_id", "embedding", "lst", probes)
        .localCheckpoint(true)
      val assigned = asg.filter(col("crn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"),
          col("lst").as("nlist"))
      val qprobes = asg
        .select(col("vec_id").as("query_id"), col("embedding").as("va"),
          col("lst").as("qlist"))
      val pairs = qprobes.join(assigned, col("qlist") === col("nlist"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4))
      Similarity.topKPerQuery(pairs, topK)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }
    identical("q32fat",
      fatIvfTopK(e, cents16, Similarity.IVF_PROBES, 3),
      Similarity.ivfTopK(e, cents16))
    identical("q106",
      legacyPagerank(q106Edges(spark, dir), 10).orderBy("node"),
      Graph.q106.fn(spark, dir))
    identical("q106routed",
      legacyPagerank(q106Edges(spark, dir), 10, broadcastCap = 0)
        .orderBy("node"),
      Graph.pagerank(q106Edges(spark, dir), 10, broadcastCap = 0)
        .orderBy("node"))
    identical("q132banded",
      MinhashEstimate.q132.fn(spark, dir),
      q132BandedMat(spark, dir))

    // checkpointed-block storage: materialize the FAT vs SLIM ranked
    // assignment and report executor block-store bytes (guide §5 — the
    // quantity the r15 verdict asked to measure at 10×)
    if (wanted("ivfstore")) {
      def storeBytes(build: => DataFrame): (Long, Long) = {
        scrub()
        val ckpt = build // eager localCheckpoint inside
        ckpt.write.format("noop").mode("overwrite").save()
        val bytes = spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum
        val rows = ckpt.count()
        scrub()
        (bytes, rows)
      }
      val centArr = Similarity.localCents(cents16)
      val (fatB, fatR) = storeBytes(
        Similarity.ivfAssignRanked(
          e.select(col("vec_id"), col("embedding")),
          centArr, "vec_id", "embedding", "lst", Similarity.IVF_PROBES)
          .localCheckpoint(true))
      val (slimB, slimR) = storeBytes(
        Similarity.ivfAssignRanked(
          e.select(col("vec_id"), col("embedding")),
          centArr, "vec_id", "embedding", "lst", Similarity.IVF_PROBES)
          .select("vec_id", "lst", "crn")
          .localCheckpoint(true))
      println(f"[optprof] ivfstore: fat=$fatB%d bytes/$fatR%d rows, " +
        f"slim=$slimB%d bytes/$slimR%d rows, ratio=${fatB.toDouble / slimB}%.1fx")
    }

    // ---- interleaved timing ----
    val arms: Seq[(String, Seq[(String, () => Unit)])] = Seq(
      "q132" -> Seq(
        "old" -> (() => noop(legacyQ132(spark, dir))),
        "new" -> (() => noop(MinhashEstimate.q132.fn(spark, dir)))),
      "q232" -> Seq(
        "old" -> (() => noop(legacyQ232(spark, dir))),
        "new" -> (() => noop(Graph.q232.fn(spark, dir)))),
      "q107" -> Seq(
        "old" -> (() => noop(legacyQ107(spark, dir))),
        "new" -> (() => noop(Mining.q107.fn(spark, dir)))),
      "q167" -> Seq(
        "old" -> (() => noop(legacyQ167(spark, dir))),
        "new" -> (() => noop(Graph.q167.fn(spark, dir)))),
      "q110" -> Seq(
        "old" -> (() => noop({
          val pairs = legacyCooccur(GTables.lineitem(spark, dir),
            "l_orderkey", "l_partkey", 2L)
            .select(col("p1").as("u"), col("p2").as("v"))
          val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
          Graph.triangles(edges)
        })),
        "new" -> (() => noop(Graph.q110.fn(spark, dir)))),
      "q220" -> Seq(
        "old" -> (() => noop({
          import org.apache.spark.sql.expressions.Window
          val baskets = GTables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey").as("cust"))
            .join(GTables.lineitem(spark, dir)
              .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("part")),
              "o_orderkey")
            .select("cust", "part").distinct()
            .localCheckpoint(true)
          val i = GTables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_partkey")).distinct()
          val co = i.select(col("l_orderkey"), col("l_partkey").as("p1"))
            .join(i.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
            .filter(col("p1") =!= col("p2"))
            .groupBy("p1", "p2").agg(count(lit(1)).cast("long").as("support"))
          val u = baskets.filter(col("cust") % 100 === 0)
          val owned = u.select(col("cust"), col("part").as("cand"))
          val sc = u.join(co, col("p1") === col("part"))
            .select(col("cust"), col("p2").as("cand"), col("support"))
            .join(owned, Seq("cust", "cand"), "left_anti")
            .groupBy("cust", "cand").agg(sum("support").cast("long").as("score"))
          sc.withColumn("rank", row_number().over(
              Window.partitionBy("cust").orderBy(col("score").desc, col("cand"))).cast("long"))
            .filter(col("rank") <= 5)
            .select(col("cust"), col("rank"), col("cand").as("partkey"), col("score"))
            .orderBy("cust", "rank")
        })),
        "new" -> (() => noop(Mining.q220.fn(spark, dir)))),
      "q184" -> Seq(
        "old" -> (() => noop(legacyQ184(spark, dir))),
        "new" -> (() => noop(graft.multimodal.Multimodal.q184.fn(spark, dir)))),
      "q291" -> Seq(
        "old" -> (() => noop({
          val scored = graft.multimodal.Multimodal.captionFeatures(spark, dir)
            .crossJoin(broadcast(legacyImageFeatures(spark, dir)))
            .select(col("doc_id").as("query_id"), col("image_id").as("neighbor_id"),
              Exprs.qdot(col("txt_vec"), col("img_vec")).as("score"))
          Similarity.topKPerQueryLongRanked(scored, graft.multimodal.Multimodal.CrossModalTopK)
            .select(col("query_id").as("doc_id"), col("neighbor_id").as("image_id"),
              col("score").as("score_q"), col("rnk"))
            .orderBy("doc_id", "rnk")
        })),
        "new" -> (() => noop(graft.multimodal.Multimodal.q291.fn(spark, dir)))),
      "q32" -> Seq(
        "old" -> (() => noop(legacyIvfTopK(e, cents16, Similarity.IVF_PROBES, 3)
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id")))),
        "new" -> (() => noop(Similarity.q32.fn(spark, dir)))),
      "q32fat" -> Seq(
        "old" -> (() => noop(fatIvfTopK(e, cents16, Similarity.IVF_PROBES, 3))),
        "new" -> (() => noop(Similarity.ivfTopK(e, cents16)))),
      "q106" -> Seq(
        "old" -> (() => noop(legacyPagerank(q106Edges(spark, dir), 10)
          .orderBy("node"))),
        "new" -> (() => noop(Graph.q106.fn(spark, dir)))),
      "q132banded" -> Seq(
        "old" -> (() => noop(MinhashEstimate.q132.fn(spark, dir))),
        "new" -> (() => noop(q132BandedMat(spark, dir)))),
      "q106routed" -> Seq(
        "old" -> (() => noop(legacyPagerank(q106Edges(spark, dir), 10,
          broadcastCap = 0).orderBy("node"))),
        "new" -> (() => noop(Graph.pagerank(q106Edges(spark, dir), 10,
          broadcastCap = 0).orderBy("node")))),
      "q245" -> Seq(
        "old" -> (() => noop({
          // pre-r15 q245: per-p legacy ivfTopK, truth pass identical
          val a = e.repartition(spark.sparkContext.defaultParallelism)
            .select(col("vec_id").as("query_id"), col("embedding").as("va"))
          val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
          val truth = Similarity.topKPerQuery(
              a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
                .withColumn("sim", round(Exprs.cosine_sim(col("va"), col("vb")), 4)), 3)
            .select("query_id", "neighbor_id")
            .localCheckpoint(true)
          val tn = truth.agg(count(lit(1)).cast("long").as("n_truth"))
          Similarity.RecallProbes.map { p =>
            legacyIvfTopK(e, cents16, p, 3)
              .select(col("query_id"), col("neighbor_id"))
              .join(truth, Seq("query_id", "neighbor_id"))
              .agg(count(lit(1)).cast("long").as("n_hits"))
              .select(lit(p.toLong).as("probes"), col("n_hits"))
          }.reduce(_ unionByName _)
            .crossJoin(broadcast(tn))
            .select(col("probes"), col("n_truth"), col("n_hits"),
              (expr("CAST((n_hits * 20000 + n_truth) div (2 * n_truth) AS DOUBLE)")
                / 10000.0).as("recall"))
            .orderBy("probes")
        })),
        "new" -> (() => noop(Similarity.q245.fn(spark, dir)))),
      "q158" -> Seq(
        "old" -> (() => noop(legacyIvfPqTopK(e)
          .orderBy(col("query_id"), col("sim").desc, col("neighbor_id")))),
        "new" -> (() => noop(IvfPq.q158.fn(spark, dir)))))

    for ((label, variants) <- arms if wanted(label)) {
      val times = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (r <- 1 to reps; (vn, f) <- variants) {
        val t = time { f(); scrub() }
        times(vn) = times(vn) :+ t
      }
      for ((vn, _) <- variants)
        println(f"[optprof] $label/$vn: min=${times(vn).min}%.2f " +
          s"all=${times(vn).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
