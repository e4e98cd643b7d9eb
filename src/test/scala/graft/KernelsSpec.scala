package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels

/** Specs for the hash/vector kernels backing the custom Catalyst
  * expressions (no SparkSession needed — kernels operate on ArrayData).
  */
class KernelsSpec extends AnyFunSuite {

  private def arr(ts: String*): GenericArrayData =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
  private def farr(vs: Float*): GenericArrayData =
    new GenericArrayData(vs.toArray[Any])

  test("stripAccents matches DuckDB strip_accents semantics") {
    def sa(s: String) = TextKernels.stripAccents(UTF8String.fromString(s)).toString
    assert(sa("café àé") == "cafe ae")
    assert(sa("plain ascii") == "plain ascii")
    assert(sa("ÀÇÕü") == "ACOu")
  }

  test("simHash64 is deterministic and locality-sensitive") {
    val a = arr("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val b = arr("the", "quick", "brown", "fox", "jumps", "over", "lazy", "cat")
    val c = arr("completely", "different", "words", "entirely", "here", "now")
    val ha = TextKernels.simHash64(a)
    assert(ha == TextKernels.simHash64(arr("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")))
    val dAB = TextKernels.hamming64(ha, TextKernels.simHash64(b))
    val dAC = TextKernels.hamming64(ha, TextKernels.simHash64(c))
    assert(dAB < dAC, s"near-dup hamming $dAB should be < unrelated $dAC")
  }

  test("charStats: all-integer entropy matches a naive recomputation") {
    def ref(s: String): (Long, Long, Long, Long) = {
      val cps = s.codePoints().toArray
      val h = cps.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // the integer piecewise qlog2 (1/1024-bit units) — the round-11
      // replacement for round(log2(k)·1e6)
      def lg(k: Long) = {
        val blen = 64 - java.lang.Long.numberOfLeadingZeros(k)
        (blen - 1).toLong * 1024 + (k * 1024) / (1L << (blen - 1)) - 1024
      }
      val n = cps.length.toLong
      val e = n * lg(n) - h.values.map(c => c * lg(c)).sum
      (n, h.size.toLong, if (h.isEmpty) 0L else h.values.max, e)
    }
    for (s <- Seq("abab", "aaaa", "the quick brown fox", "áé á", "x",
        "mississippi riverbank", "0123456789 9876543210")) {
      val got = TextKernels.charStats(UTF8String.fromString(s))
      val (n, d, t, e) = ref(s)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
        == ((n, d, t, e)), s"for '$s'")
    }
    // analytic anchors: zero entropy for a constant string, exactly
    // 2 bits/char for a uniform 4-symbol string
    val const = TextKernels.charStats(UTF8String.fromString("aaaaaaaa"))
    assert(const.getLong(3) == 0L)
    val uni = TextKernels.charStats(UTF8String.fromString("abcdabcdabcd"))
    // n·2.0 bits in 1/1024 units — the qlog2 chord error cancels
    // exactly for the power-of-two count ratio n/c = 4
    assert(uni.getLong(3) == 12L * 2048L)
    val empty = TextKernels.charStats(UTF8String.fromString(""))
    assert((0 until 4).forall(i => empty.getLong(i) == 0L))
  }

  test("repetitionStats counts n-grams, distincts, and the mode in one pass") {
    // "a b a b a" → bigrams: [a b, b a, a b, b a] → n=4, distinct=2, max=2
    val s2 = TextKernels.repetitionStats(arr("a", "b", "a", "b", "a"), 2)
    assert(s2.getLong(0) == 4 && s2.getLong(1) == 2 && s2.getLong(2) == 2)
    // trigrams of the same: [a b a, b a b, a b a] → n=3, distinct=2, max=2
    val s3 = TextKernels.repetitionStats(arr("a", "b", "a", "b", "a"), 3)
    assert(s3.getLong(0) == 3 && s3.getLong(1) == 2 && s3.getLong(2) == 2)
    // shorter than n → all-zero counters
    val s0 = TextKernels.repetitionStats(arr("only"), 2)
    assert(s0.getLong(0) == 0 && s0.getLong(1) == 0 && s0.getLong(2) == 0)
    // no repetition → max = 1, distinct = n
    val u = TextKernels.repetitionStats(arr("w", "x", "y", "z"), 2)
    assert(u.getLong(0) == 3 && u.getLong(1) == 3 && u.getLong(2) == 1)
  }

  test("minHash signature: length k, MaxValue on empty, order-insensitive") {
    val sig = TextKernels.minHash(arr("a b", "b c", "c d"), 16)
    assert(sig.numElements() == 16)
    val sigPerm = TextKernels.minHash(arr("c d", "a b", "b c"), 16)
    assert((0 until 16).forall(i => sig.getLong(i) == sigPerm.getLong(i)))
    val empty = TextKernels.minHash(arr(), 4)
    assert((0 until 4).forall(i => empty.getLong(i) == Long.MaxValue))
  }

  test("minHash band agreement estimates Jaccard") {
    // two token sets with J = 50/150 ≈ 0.33: matching signature fraction
    // should be in the right neighborhood
    val xs = (1 to 100).map(i => s"tok$i")
    val ys = (51 to 150).map(i => s"tok$i")
    val k = 256
    val sx = TextKernels.minHash(arr(xs: _*), k)
    val sy = TextKernels.minHash(arr(ys: _*), k)
    val agree = (0 until k).count(i => sx.getLong(i) == sy.getLong(i)).toDouble / k
    assert(agree > 0.2 && agree < 0.47, s"minhash agreement $agree vs J=0.333")
  }

  test("winnow: deterministic, shift-invariant core, empty below k") {
    val toks = ("the quick brown fox jumps over the lazy dog again and again " +
      "the quick brown fox returns").split(" ")
    val f1 = TextKernels.winnow(arr(toks: _*), 4, 4)
    val f2 = TextKernels.winnow(arr(toks: _*), 4, 4)
    assert(f1.numElements() == f2.numElements() && f1.numElements() > 0)
    assert(TextKernels.winnow(arr("a", "b"), 4, 4).numElements() == 0)
  }

  test("bitmap kernels: tokenBitmap/bitmapJaccard/bitmapCard exact over a vocab") {
    val vocab = new java.util.HashMap[UTF8String, Integer]()
    Seq("a", "b", "c", "d", "e").zipWithIndex.foreach { case (t, i) =>
      vocab.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    val x = TextKernels.tokenBitmap(arr("a", "b", "c"), vocab, 1)
    val y = TextKernels.tokenBitmap(arr("b", "c", "d"), vocab, 1)
    assert(TextKernels.bitmapCard(x) == 3 && TextKernels.bitmapCard(y) == 3)
    assert(TextKernels.bitmapJaccard(x, y) == 2.0 / 4.0)
    // identical sets -> 1.0; disjoint -> 0.0; unknown tokens ignored
    assert(TextKernels.bitmapJaccard(x, x) == 1.0)
    val z = TextKernels.tokenBitmap(arr("d", "e", "UNKNOWN"), vocab, 1)
    assert(TextKernels.bitmapCard(z) == 2)
    assert(TextKernels.bitmapJaccard(x, z) == 0.0)
    // multi-word bitsets: bit 70 lands in the second long
    val wide = new java.util.HashMap[UTF8String, Integer]()
    wide.put(UTF8String.fromString("lo"), Integer.valueOf(3))
    wide.put(UTF8String.fromString("hi"), Integer.valueOf(70))
    val w1 = TextKernels.tokenBitmap(arr("lo", "hi"), wide, 2)
    val w2 = TextKernels.tokenBitmap(arr("hi"), wide, 2)
    assert(TextKernels.bitmapCard(w1) == 2)
    assert(TextKernels.bitmapJaccard(w1, w2) == 0.5)
    // empty vs empty is sentinel -1.0 (caller-defined semantics)
    val e0 = TextKernels.tokenBitmap(arr(), vocab, 1)
    assert(TextKernels.bitmapJaccard(e0, e0) == -1.0)
  }

  test("wordNgrams matches the HOF shingle semantics") {
    def grams(n: Int, ts: String*): Seq[String] = {
      val r = TextKernels.wordNgrams(arr(ts: _*), n)
      (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
    }
    assert(grams(2, "a", "b", "c") == Seq("a b", "b c"))
    assert(grams(3, "a", "b", "c") == Seq("a b c"))
    assert(grams(2, "solo") == Seq.empty)
    assert(grams(1, "x", "y") == Seq("x", "y"))
  }

  test("sortedIntersectCountLong merge walk equals the string variant") {
    def larr(vs: Long*) = new GenericArrayData(vs.toArray[Any])
    assert(TextKernels.sortedIntersectCountLong(larr(1L, 5L, 9L), larr(5L, 9L, 12L)) == 2)
    assert(TextKernels.sortedIntersectCountLong(larr(), larr(1L)) == 0)
    assert(TextKernels.sortedIntersectCountLong(
      larr(Long.MinValue, 0L, Long.MaxValue), larr(Long.MinValue, Long.MaxValue)) == 2)
  }

  test("scriptStats: partition of the string into the nine classes") {
    def ss(s: String): Seq[Long] =
      TextKernels.scriptStats(UTF8String.fromString(s)).toLongArray().toSeq
    // empty string: zero everywhere
    assert(ss("") == Seq.fill(10)(0L))
    // mixed-script string with known per-class counts
    //           latin  cyr greek arab hang cjk digit space other
    val mixed = "ab" + "дё" + "αβ" + "سم" + "한" + "水か" + "42" + " \t" + "!€"
    val got = ss(mixed)
    assert(got(0) == mixed.codePointCount(0, mixed.length), "n_chars")
    assert(got.drop(1) == Seq(2L, 2L, 2L, 2L, 1L, 2L, 2L, 2L, 2L),
      s"class counts off: $got")
    // classes 1..9 partition the census: they sum to n_chars
    assert(got.drop(1).sum == got(0))
    // × U+00D7 and ÷ U+00F7 sit INSIDE the contiguous latin block —
    // the documented one-branch trade-off, which the oracle must copy
    assert(ss("×÷").drop(1) == Seq(2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    // astral (surrogate-pair) code point: ONE char in the census, lands
    // in `other`, and n_chars counts code points not UTF-16 units
    val astral = new String(Character.toChars(0x1F600))
    assert(ss(astral) == Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(ss("a" + astral + "9").drop(1).sum == 3L)
  }

  test("cosineF/dotF in double, matching sequential fold") {
    assert(math.abs(TextKernels.cosineF(farr(1f, 0f), farr(1f, 1f)) -
      0.7071067811865475) < 1e-12)
    assert(TextKernels.dotF(farr(1f, 2f, 3f), farr(4f, 5f, 6f)) == 32.0)
    assert(TextKernels.cosineF(farr(0f, 0f), farr(1f, 1f)) == 0.0)
  }

  test("round4l equals the BigDecimal HALF_UP reference everywhere") {
    def ref(x: Double): Long = scala.math.BigDecimal(x)
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(4).longValueExact()
    // exact dyadic halves hit the fallback and must round AWAY from 0
    assert(TextKernels.round4l(0.03125) == 313L)   // 312.5 -> 313
    assert(TextKernels.round4l(-0.03125) == -313L) // -312.5 -> -313
    assert(TextKernels.round4l(0.0) == 0L)
    assert(TextKernels.round4l(-0.00002) == 0L)    // Spark round -> +0
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 4.0 // the |x| <= 2 kernel range
      assert(TextKernels.round4l(x) == ref(x), s"x=$x")
    }
    // near-boundary values around every representable n/1e4 knife-edge
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(40001) - 20000
      Seq(-1e-12, 0.0, 1e-12, -1e-10, 1e-10).foreach { eps =>
        val x = (n + 0.5) / 1e4 + eps
        assert(TextKernels.round4l(x) == ref(x), s"x=$x n=$n eps=$eps")
      }
    }
  }
}
