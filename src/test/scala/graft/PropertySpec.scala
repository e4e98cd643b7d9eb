package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels
import graft.gov.RefTransforms
import graft.ingest.Harvest

/** Property-based invariants (ScalaCheck driven from funsuite — no
  * scalatestplus bridge in the offline cache): normalizer idempotence,
  * kernel-path agreement on random inputs, and harvest-plan coverage.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: $res")
  }

  private def sarr(ts: Seq[String]) =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  test("winnow polynomial hash matches a BigInt model on random tokens") {
    // the kernel's Russian-peasant mulmod and conditional subtracts must
    // agree exactly with unbounded arithmetic — the DuckDB oracle (q28)
    // computes the same chain in HUGEINT, so any drift here is a gate
    // failure at best and a silent fingerprint bias at worst
    val M = BigInt(TextKernels.WinnowMod)
    def modelToken(s: String): BigInt =
      s.codePoints().toArray.foldLeft(BigInt(0))((h, c) => (h * 131 + c) % M)
    def modelGram(ts: Seq[String]): BigInt =
      ts.map(modelToken).foldLeft(BigInt(0))((h, t) => (h * 137 + t) % M)
    check("poly-hash-model", Prop.forAll(
      Gen.listOfN(6, Gen.oneOf(Gen.asciiPrintableStr,
        Gen.oneOf("café", "中文字", "naïve", "", "áé")))) { ts =>
      val toks = ts.take(4)
      if (toks.size < 4) Prop.passed
      else {
        // k = w = 4 over exactly 4 tokens → 1 gram, 1 window, 1 fingerprint
        val out = TextKernels.winnow(sarr(toks), 4, 4)
        Prop(out.numElements() == 1 &&
          BigInt(out.getLong(0)) == modelGram(toks))
      }
    })
  }

  test("mulMod61 matches BigInt multiplication mod 2^61-1 on random operands") {
    // the sketch hash family (KMV mix, CMS rows, q105 sampling keys)
    // rides this kernel; the DuckDB oracles replay it as one HUGEINT
    // multiply, so any doubling-loop drift is a silent gate divergence
    val M = BigInt(TextKernels.WinnowMod)
    check("mulmod61-model", Prop.forAll(
      Gen.chooseNum(0L, TextKernels.WinnowMod - 1),
      Gen.chooseNum(1L, TextKernels.WinnowMod - 1)) { (a, g) =>
      Prop(BigInt(TextKernels.mulMod61(a, g)) == (BigInt(a) * BigInt(g)) % M)
    })
  }

  test("X20 removeDiacritics is idempotent on arbitrary unicode") {
    check("nfkd-idempotent", Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(
      Gen.oneOf("café", "àé", "Ç", "ü", "中文", "á"))) { (a, extra) =>
      val s = a + extra.mkString
      val once = RefTransforms.removeDiacritics(s)
      RefTransforms.removeDiacritics(once) == once
    })
  }

  test("X21 country capitalization is idempotent") {
    val word = Gen.oneOf("de", "DOS", "México", "new-york", "(alto)", "EL",
      "são", "PARA", "Côte-d'Ivoire", "guinea")
    check("caps-idempotent", Prop.forAll(Gen.nonEmptyListOf(word)) { ws =>
      val s = ws.mkString(" ")
      val once = RefTransforms.normalizeCountryName(s)
      RefTransforms.normalizeCountryName(once) == once
    })
  }

  test("bitmap Jaccard equals merge-walk Jaccard on random token sets") {
    val vocab = (0 until 100).map(i => f"tok$i%03d")
    val vmap = new java.util.HashMap[UTF8String, Integer]()
    vocab.zipWithIndex.foreach { case (t, i) =>
      vmap.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    val set = Gen.someOf(vocab).map(_.toSeq.sorted)
    check("bitmap-vs-walk", Prop.forAll(set, set) { (a, b) =>
      val inter = TextKernels.sortedIntersectCount(sarr(a), sarr(b))
      val union = a.size + b.size - inter
      val walk = if (union == 0) -1.0 else inter.toDouble / union
      val bm = TextKernels.bitmapJaccard(
        TextKernels.tokenBitmap(sarr(a), vmap, 2),
        TextKernels.tokenBitmap(sarr(b), vmap, 2))
      bm == walk
    })
  }

  test("wordNgrams emits exactly max(0, n_tokens-n+1) grams of n tokens") {
    val toks = Gen.listOf(Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty))
    val n = Gen.choose(1, 4)
    check("ngram-count", Prop.forAll(toks, n) { (ts, k) =>
      val r = TextKernels.wordNgrams(sarr(ts), k)
      val expected = math.max(0, ts.size - k + 1)
      r.numElements() == expected &&
        (0 until r.numElements()).forall { i =>
          r.getUTF8String(i).toString.split(" ", -1).length == k
        }
    })
  }

  test("repetitionStats counters are consistent with wordNgrams on random input") {
    val toks = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
    val n = Gen.choose(1, 3)
    check("repstats-consistent", Prop.forAll(toks, n) { (ts, k) =>
      val st = TextKernels.repetitionStats(sarr(ts), k)
      val grams = (0 until math.max(0, ts.size - k + 1))
        .map(i => ts.slice(i, i + k).mkString(" "))
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      st.getLong(0) == grams.size &&
        st.getLong(1) == counts.size &&
        st.getLong(2) == (if (grams.isEmpty) 0 else counts.values.max)
    })
  }

  test("chunk geometry covers every token at least once, stride-aligned") {
    // mirrors q68's start rule: starts 0, stride, …; last window reaches
    // the final token; every token belongs to ≥1 and ≤ ceil(size/stride)+1 windows
    val g = for {
      n <- Gen.choose(0, 500)
      size <- Gen.choose(2, 64)
      stride <- Gen.choose(1, 64).suchThat(_ <= 64)
    } yield (n, size, math.min(stride, size)) // overlap requires stride ≤ size
    check("chunk-cover", Prop.forAll(g) { case (n, size, stride) =>
      if (n == 0) true
      else {
        val nChunks = 1 + (if (n > size) (n - size + stride - 1) / stride else 0)
        val starts = (0 until nChunks).map(_ * stride)
        val covered = starts.flatMap(s => s until math.min(s + size, n)).toSet
        covered == (0 until n).toSet
      }
    })
  }

  test("BFD packing: partition, capacity, half-full bound, deterministic") {
    import graft.operators.Chunking
    import graft.operators.Chunking.DocTok
    val budget = 100L
    val lens = Gen.listOf(Gen.choose(1L, 130L))
    check("bfd-invariants", Prop.forAll(lens) { ls =>
      val docs = ls.zipWithIndex.map { case (n, i) => DocTok(i.toLong, "xx", n) }
      val packed = Chunking.bfdStratum("xx", docs.iterator, budget).toVector
      val again = Chunking.bfdStratum("xx", docs.iterator, budget).toVector
      val loads = packed.groupBy(_.bin_id).view.mapValues(_.map(_.n_tokens).sum)
      val singleton = packed.groupBy(_.bin_id).view.mapValues(_.size == 1)
      packed.map(_.doc_id).sorted == docs.indices.map(_.toLong) &&      // partition
        loads.forall { case (b, l) => l <= budget || singleton(b) } &&  // capacity
        // any-fit guarantee: ≤1 bin at most half full (else they'd merge)
        loads.values.count(_ * 2 <= budget) <= 1 &&
        packed == again                                                 // deterministic
    })
  }

  test("mojibake repair round-trips one-pass cp1252 corruption of clean text") {
    import graft.functions.{Text, TextKernels}
    val toBad = Text.MojibakeFixes.map { case (b, g) => g -> b }.toMap
    def corrupt(s: String): String =
      s.flatMap(ch => toBad.getOrElse(ch.toString, ch.toString))
    def repair(s: String): String =
      TextKernels.fixMojibake(UTF8String.fromString(s)).toString
    val goods = Text.MojibakeFixes.map(_._2)
    // adjacent sequences included on purpose: "”“" breaks a naive
    // replace chain (its repair of â€œ manufactures a fresh â€“) — the
    // single-pass longest-match kernel must decode it exactly
    val alphabet = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.oneOf(goods))
    val clean = Gen.listOf(alphabet).map(_.mkString)
    check("moji-roundtrip", Prop.forAll(clean) { s =>
      repair(corrupt(s)) == s
    })
  }

  test("bpe fenced-replace pass equals the naive merge fold on random words") {
    // the Bpe engine applies merge (a,b) as the literal string replace
    // `␟a␟␟b␟ → ␟ab␟` over the fenced symbol string, relying on
    // non-overlapping left-to-right semantics being exactly the BPE pass
    // order; UTF8String.replace is the primitive Spark's replace()
    // executes, so driving it directly pins the production code path.
    // The naive model folds over the symbol list: merge when (last ==
    // a && cur == b), else append — merged output can't re-merge in the
    // same pass because the new symbol a+b differs from a.
    val U = ""
    def wrap(syms: Seq[String]): String = syms.map(U + _ + U).mkString
    def fencedPass(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = UTF8String.fromString(wrap(syms))
        .replace(UTF8String.fromString(s"$U$a$U$U$b$U"),
          UTF8String.fromString(s"$U$a$b$U")).toString
      if (out.isEmpty) Seq.empty
      else out.stripPrefix(U).stripSuffix(U).split(U + U).toSeq
    }
    def naivePass(syms: Seq[String], a: String, b: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, cur) =>
        if (acc.nonEmpty && acc.last == a && cur == b)
          acc.init :+ (a + b)
        else acc :+ cur
      }
    // small alphabet so collisions/adjacent repeats are common, and
    // three chained merges so multi-char symbols get fenced too
    val word = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
    val mergeSeq = Gen.listOfN(3,
      Gen.zip(Gen.oneOf("a", "b", "c", "ab", "ba", "aa", "bc"),
        Gen.oneOf("a", "b", "c", "ab", "ba", "aa", "bc")))
    check("bpe-pass-model", Prop.forAll(Gen.zip(word, mergeSeq)) {
      case (w, merges) =>
        val (f, n) = merges.foldLeft((w: Seq[String], w: Seq[String])) {
          case ((fs, ns), (a, b)) => (fencedPass(fs, a, b), naivePass(ns, a, b))
        }
        Prop(f == n) :| s"fenced=$f naive=$n word=$w merges=$merges"
    })
  }

  test("harvest plan covers [0, total) exactly once for any stripe shape") {
    val g = for {
      total <- Gen.choose(0, 5000)
      limit <- Gen.choose(1, 500)
      workers <- Gen.choose(1, 8)
    } yield (total, limit, workers)
    check("plan-coverage", Prop.forAll(g) { case (total, limit, workers) =>
      val pages = Harvest.planPages(total, limit, workers)
      val offsets = pages.map(_.offset)
      offsets.distinct.size == offsets.size &&
        offsets.sorted == (0 until total by limit).toList
    })
  }

  test("integer piecewise log2 stays within 0.0871 bits of true log2 and is monotone") {
    // the qlog2 device (q181/q202/q208/q216) is load-bearing for every
    // LM/drift gate — pin its error envelope and monotonicity on random
    // positive longs, including the power-of-two exact points
    def qlog2(n: Long): Long = {
      val blen = 64 - java.lang.Long.numberOfLeadingZeros(n)
      (blen - 1) * 1024 + (BigInt(n) * 1024 / (BigInt(1) << (blen - 1))).toLong - 1024
    }
    check("qlog2-envelope", Prop.forAll(Gen.chooseNum(1L, 1L << 50)) { n =>
      // ScalaCheck shrinking can escape chooseNum's range — clamp it
      val m = math.max(1L, n)
      // analytic chord-error max 0.08607 (at frac = 1/ln2 − 1) plus the
      // 1/1024 floor-quantization step
      val err = math.abs(qlog2(m) / 1024.0 - math.log(m.toDouble) / math.log(2.0))
      err <= 0.08607 + 1.0 / 1024 &&
        (m == 1 || qlog2(m) >= qlog2(m - 1)) &&
        (java.lang.Long.bitCount(m) != 1 || qlog2(m) == (63 - java.lang.Long.numberOfLeadingZeros(m)).toLong * 1024)
    })
  }

  test("integer half-up rounding matches BigDecimal HALF_UP on random quotients") {
    // the operators.Q half-boundary rule: (s + 50c) div (100c) must BE
    // half-up rounding of (s/c)/100 to the unit — including exact halves,
    // where float round splits engines (the q233 5x catch)
    val g = for {
      c <- Gen.chooseNum(1L, 100000L)
      s <- Gen.chooseNum(0L, 10000000000L)
    } yield (s, c)
    check("half-up-integer", Prop.forAll(g) { case (s, c) =>
      val got = (s + 50 * c) / (100 * c)
      val expected = (BigDecimal(s) / (BigDecimal(100) * c))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      got == expected
    })
  }

  test("sign-aware (2p±q) div (2q) equals BigDecimal HALF_UP of p/q") {
    // the round-11 generalization: for a possibly-NEGATIVE integer
    // quotient p/q (q > 0), (2p + sign(p)·q) div (2q) under
    // truncate-toward-zero division (Spark `div`, DuckDB `//`, JVM `/`)
    // is exactly half-away-from-zero rounding — what BigDecimal HALF_UP
    // (and both engines' float round) does on signed values. Every
    // integer-rounded ratio gate (jaccard, conversions, chi², KS,
    // zipf slope, mean_w, modularity, ...) rides this identity.
    val g = for {
      q <- Gen.chooseNum(1L, 1000000L)
      p <- Gen.chooseNum(-10000000000L, 10000000000L)
    } yield (p, q)
    check("half-away-sign-aware", Prop.forAll(g) { case (p, q) =>
      val got = (2 * p + (if (p < 0) -q else q)) / (2 * q)
      val expected = (BigDecimal(p) / BigDecimal(q))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      got == expected
    })
  }

  test("Qlog2 intrinsic equals the SQL length(bin(x)) device on random longs") {
    // the codegen intrinsic (TextKernels.lg2q behind Exprs.Qlog2) must
    // be VALUE-identical to the string-built SQL device the DuckDB
    // oracles keep — the device's cross-engine contract is the value.
    check("qlog2-intrinsic", Prop.forAll(Gen.chooseNum(1L, 1L << 53)) { k =>
      val blen = 64 - java.lang.Long.numberOfLeadingZeros(k)
      val sqlDevice = (blen - 1).toLong * 1024 +
        k * 1024 / (1L << (blen - 1)) - 1024 // length(bin(k)) == blen
      graft.functions.TextKernels.lg2q(k) == sqlDevice
    })
    // the domain contract is enforced, not silently wrapped
    intercept[IllegalArgumentException](graft.functions.TextKernels.lg2q(0L))
    intercept[IllegalArgumentException](
      graft.functions.TextKernels.lg2q((1L << 53) + 1))
  }
}
