package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernels invoked from the custom Catalyst expressions in
  * [[Exprs]]. Kept as static-style helpers so generated code can call them
  * directly (`graft.functions.TextKernels.stripAccents(...)`) and stay
  * inside whole-stage codegen.
  *
  * Hashing: kernels whose output an oracle must replay (simhash,
  * winnowing, span hashes) use the poly-131 / mod 2^61−1 family that
  * DuckDB reproduces in HUGEINT arithmetic; MinHash keeps xxhash64 over
  * the raw UTF-8 bytes (Spark's own [[XXH64]]) since its gate verifies
  * the detector's PAIR SET, not the signature values. Both are stable
  * across JVMs and partitions.
  */
object TextKernels {

  /** NFD-decompose then drop combining marks — same observable behavior as
    * DuckDB's `strip_accents` on Latin text (reference uses NFKD in
    * `misc.py:33-35`; NFD vs NFKD differ only on compatibility chars which
    * the governance keys never contain — we expose a separate nfkd variant
    * for the J2/J5 join keys).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) {
      if (str.charAt(i) >= 0x80) needs = true
      i += 1
    }
    if (!needs) return s // ASCII fast path: no allocation
    val n = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** NFKD variant used for governance join-key normalization
    * (reference `misc.py:33-35` uses unicodedata.normalize('NFKD')). */
  def stripAccentsNfkd(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def hashToken(t: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, seed)

  /** SimHash bit-mix multipliers: the two classic 64-bit LCG multipliers
    * (Knuth MMIX 6364136223846793005, Lehmer-line 2862933555777941757)
    * reduced mod 2^61−1. With M prime both are bijections on [0, M), so
    * the two products of one token hash give 64 decorrelated vote bits
    * while staying replayable as one HUGEINT `(h*G) % M` each in SQL. */
  val SimHashG1: Long = 1752450205419405103L
  val SimHashG2: Long = 557090546564247806L

  /** 64-bit SimHash over a token array. Per-token vote bits come from
    * the ORACLE-REPLAYABLE polynomial family (the q28 winnowing hashes),
    * not xxhash64: h = poly-131 over code points mod 2^61−1, then bits
    * 0–31 = low half of (h+1)·G1 mod M and bits 32–63 = low half of
    * (h+1)·G2 mod M (the +1 keeps the empty token off the 0 fixed
    * point). Each bit votes ±1 across tokens; sign of the vote becomes
    * the output bit. One pass per row — O(tokens·64) integer ops, no
    * allocation beyond the vote array; DuckDB replays the signature
    * exactly (q26), which xxhash64 could not offer.
    */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = polyTokenHash(tokens.getUTF8String(i))
        val m1 = mulMod61(h + 1, SimHashG1)
        val m2 = mulMod61(h + 1, SimHashG2)
        val bits = (m1 & 0xffffffffL) | ((m2 & 0xffffffffL) << 32)
        var b = 0
        while (b < 64) {
          if (((bits >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** MinHash signature: k independent permutations approximated by k
    * xxhash64 seeds; sig(j) = min over shingles of hash(shingle, j).
    * Returns LongArray(k); empty input yields Long.MaxValue entries so the
    * signature is well-defined (and never collides with real minima in
    * LSH banding).
    */
  def minHash(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val t = shingles.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(
            t.getBaseObject, t.getBaseOffset, t.numBytes, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 2^61 - 1, the Mersenne prime modulus of the winnowing polynomial
    * hash. Chosen over xxhash64 so the DuckDB oracle can replay the hash
    * exactly (HUGEINT `(a*B + b) % M` in a list_reduce); 61 bits of
    * fingerprint keep cross-document collisions at the ~1e-18-per-pair
    * level, ample for a document sketch. */
  val WinnowMod: Long = 2305843009213693951L

  /** a * b mod [[WinnowMod]] for small constant b, via Russian-peasant
    * doubling — every intermediate stays under 2^62, no 128-bit math. */
  private def mulSmallMod(a: Long, b: Int): Long = mulMod61(a, b.toLong)

  /** a·g mod 2^61−1 for arbitrary 61-bit operands, by Russian-peasant
    * doubling over g's bits: every intermediate stays below 2^62, so no
    * 128-bit multiply is needed on the JVM, while DuckDB replays the
    * same product as one HUGEINT `a * g % M`. With M prime, any g ≠ 0
    * is a bijection on [0, M) — the uniformizing step the KMV and
    * Count-Min sketches hang their hash families on. */
  def mulMod61(a: Long, g: Long): Long = {
    var r = 0L; var x = a % WinnowMod; var n = g
    while (n > 0) {
      if ((n & 1L) == 1L) { r += x; if (r >= WinnowMod) r -= WinnowMod }
      x <<= 1; if (x >= WinnowMod) x -= WinnowMod
      n >>= 1
    }
    r
  }

  /** Polynomial hash of a string's code points: h = (h*131 + cp) mod M.
    * Code points (not UTF-8 bytes) so DuckDB's per-character ascii()
    * replays it for any input, not just ASCII. Public: the span-dedup
    * operator hashes whole k-gram strings with it. */
  def polyHash131(t: UTF8String): Long = polyTokenHash(t)

  private def polyTokenHash(t: UTF8String): Long = {
    val s = t.toString
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = mulSmallMod(h, 131) + cp
      if (h >= WinnowMod) h -= WinnowMod
      i += Character.charCount(cp)
    }
    h
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash every
    * k-token shingle, slide a window of w hashes, keep the min of each
    * window (rightmost on ties), dedup. Returns the selected hashes sorted
    * — a compact, position-independent document sketch. Hashes are the
    * oracle-replayable polynomial family above: token h = poly(131) over
    * code points, gram g = poly(137) over the k token hashes.
    */
  def winnow(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val gh = new Array[Long](nGrams)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) 0L else polyTokenHash(tokens.getUTF8String(i))
      i += 1
    }
    i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = mulSmallMod(h, 137) + th(i + j)
        if (h >= WinnowMod) h -= WinnowMod
        j += 1
      }
      gh(i) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var min = gh(0); i = 1
      while (i < nGrams) { if (gh(i) <= min) min = gh(i); i += 1 }
      sel.add(min)
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var min = gh(start)
        var j = start + 1
        while (j < start + w) { if (gh(j) <= min) min = gh(j); j += 1 }
        sel.add(min)
        start += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Dot product of two float vectors accumulated in double (sequential
    * left-to-right, matching DuckDB's list_cosine_similarity order). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Quantized integer dot product of two float vectors: each element
    * floor(x·10⁸) (the q162 quantization — same IEEE multiply+floor in
    * both engines, no tie cases), products summed in a long. |x| ≤ 2 →
    * |element| ≤ 2·10⁸ → |dot| ≤ 64·4·10¹⁶, comfortably in range. The
    * codegen'd single-call form of the zip_with/aggregate HOF chain,
    * which stays outside whole-stage codegen and allocates per pair. */
  def qdotF(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * 1e8).toLong *
        math.floor(b.getFloat(i).toDouble * 1e8).toLong
      i += 1
    }
    acc
  }

  /** Cosine similarity of two float vectors in double precision. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Exact half-up decimal rounding of x to 4 places, as integer
    * ten-thousandths — the value `BigDecimal(x).setScale(4, HALF_UP)`
    * denotes (what Spark's `round(col, 4)` computes on doubles),
    * without a BigDecimal allocation on the hot path. The double
    * detour x·10⁴ carries ≤ ~3e-12 absolute error for the |x| ≤ 2
    * cosines/keys here, so any computed fraction more than 1e-9 from
    * the .5 boundary decides the exact result; only the knife-edge
    * falls back to BigDecimal (which also owns the half-up-vs-half-
    * toward-+inf distinction for negative exact halves). */
  def round4l(x: Double): Long = {
    val scaled = x * 1e4
    val fl = Math.floor(scaled)
    val frac = scaled - fl
    if (frac >= 0.5 + 1e-9) fl.toLong + 1L
    else if (frac <= 0.5 - 1e-9) fl.toLong
    else scala.math.BigDecimal(x)
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(4).longValueExact()
  }

  /** PQ encode — all M codes in one call, packed 4 bits each into a
    * long. Key per (m,k) = round₄(⟨x_m,c_mk⟩ − ‖c_mk‖²/2), with the dot
    * and norm folded sequentially (the dotF order) and round₄ the exact
    * BigDecimal-HALF_UP value Spark's `round` applies to doubles (via
    * [[round4l]], compared as integer ten-thousandths — the map n ↦
    * n·10⁻⁴ is strictly monotone over this range, so long order ≡ the
    * rounded-double order); argmax with strict > keeps the smallest
    * code on ties — identical to the oracle's ORDER BY key DESC, k ASC.
    * Codebook layout: flat floats, (m·K + k)·SUB + i. One kernel call
    * per row replaces M·K unrolled expressions, whose per-plan janino
    * compile dominated the gate. */
  def pqPack(ne: ArrayData, cb: Array[Float], m: Int, sub: Int, kk: Int): Long = {
    var packed = 0L
    var mi = 0
    while (mi < m) {
      var best = Long.MinValue
      var bestK = 0
      var ki = 0
      while (ki < kk) {
        val base = (mi * kk + ki) * sub
        var dot = 0.0; var cc = 0.0
        var i = 0
        while (i < sub) {
          val x = ne.getFloat(mi * sub + i).toDouble
          val c = cb(base + i).toDouble
          dot += x * c; cc += c * c
          i += 1
        }
        val key = round4l(dot - cc / 2.0)
        if (key > best) { best = key; bestK = ki }
        ki += 1
      }
      packed |= bestK.toLong << (4 * mi)
      mi += 1
    }
    packed
  }

  /** PQ asymmetric-distance score: Σ_m ⌊round₄(⟨q_m, cb[m][code_m]⟩)·10⁴⌉
    * as an exact long, codes unpacked from the packed word — the same
    * value as the unrolled round/×10⁴/cast chain (the double that
    * `round(dot, 4)` emits re-scales to within 1e-11 of the integer n,
    * so the second rounding always returns n itself — [[round4l]]
    * computes n directly), one call per (query, neighbor) row. */
  def pqAdc(qn: ArrayData, codes: Long, cb: Array[Float],
      m: Int, sub: Int, kk: Int): Long = {
    var total = 0L
    var mi = 0
    while (mi < m) {
      val code = ((codes >>> (4 * mi)) & 15L).toInt
      val base = (mi * kk + code) * sub
      var dot = 0.0
      var i = 0
      while (i < sub) {
        dot += qn.getFloat(mi * sub + i).toDouble * cb(base + i).toDouble
        i += 1
      }
      total += round4l(dot)
      mi += 1
    }
    total
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Intersection size of two SORTED, DISTINCT string arrays — a single
    * merge walk. Replaces array_intersect+array_union (which build a hash
    * set per invocation) in the O(n²) similarity join hot path:
    * |union| = |a| + |b| - |intersect|.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { cnt += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    cnt
  }

  /** Long variant of [[sortedIntersectCount]] — token sets pre-hashed to
    * sorted 64-bit ids so the per-pair walk compares machine words, not
    * UTF8 byte strings (~10× cheaper in the quadratic join hot path). */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  /** Encode a token array as a fixed-width bitset over a global
    * vocabulary (the dense small-vocab fast path of the set-similarity
    * join). Tokens missing from the vocab are ignored — callers must
    * build the vocab from the same corpus for exact Jaccard. */
  def tokenBitmap(tokens: ArrayData,
      vocab: java.util.HashMap[UTF8String, Integer], words: Int): ArrayData = {
    val out = new Array[Long](words)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val idx = vocab.get(tokens.getUTF8String(i))
        if (idx != null) {
          val b = idx.intValue()
          out(b >>> 6) |= (1L << (b & 63))
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact Jaccard of two equal-width bitsets: popcount(and)/popcount(or).
    * A handful of ALU ops per pair — the whole quadratic verify collapses
    * to this when the vocabulary is dense (≤ a few thousand distinct
    * tokens). Returns -1.0 for two empty sets (caller decides semantics).
    */
  def bitmapJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var inter = 0; var union = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      inter += java.lang.Long.bitCount(x & y)
      union += java.lang.Long.bitCount(x | y)
      i += 1
    }
    if (union == 0) -1.0 else inter.toDouble / union
  }

  /** popcount(a&b) of two equal-width bitsets — the integer
    * intersection count the exact (half-up ten-thousandths) Jaccard
    * derives from; union = |A| + |B| − inter. */
  def bitmapInter(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var inter = 0L
    var i = 0
    while (i < n) {
      inter += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    inter
  }

  /** Word n-grams: every n consecutive tokens joined with a single
    * space. Replaces a transform+slice+array_join higher-order chain
    * (HOFs don't participate in whole-stage codegen and allocate a
    * slice array per gram). */
  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](cnt)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass n-gram repetition statistics over a token array:
    * `[n_grams, distinct_grams, max_gram_count]`. The Gopher-style
    * repetition filters (duplicate-n-gram fraction, top-n-gram fraction)
    * are ratios of these three counters. Exact grams are counted (no
    * hashing) so the result is bit-identical to a SQL
    * unnest-and-count oracle; one HashMap per row, O(tokens) time —
    * a stateless map at 100 TB, no shuffle.
    */
  def repetitionStats(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Int](cnt * 2)
    val window = new Array[UTF8String](n)
    var maxCnt = 0
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(sep, window: _*)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > maxCnt) maxCnt = c
      i += 1
    }
    new GenericArrayData(Array[Any](cnt.toLong, counts.size.toLong, maxCnt.toLong))
  }

  /** Popcount of a bitset (|token set| for the size-band prefilter). */
  def bitmapCard(a: ArrayData): Int = {
    val n = a.numElements()
    var c = 0; var i = 0
    while (i < n) { c += java.lang.Long.bitCount(a.getLong(i)); i += 1 }
    c
  }

  private lazy val mojiBads: Array[String] = Text.MojibakeFixes.map(_._1).toArray
  private lazy val mojiGoods: Array[String] = Text.MojibakeFixes.map(_._2).toArray

  /** Single-pass left-to-right longest-match mojibake repair. A replace
    * CHAIN over [[Text.MojibakeFixes]] cascades on adjacent sequences —
    * repairing "â€œ" directly after a lossy bare "â€" manufactures a
    * fresh "â€“" for a later link to mangle — so the kernel scans once,
    * trying the table longest-first at each position. Over the
    * UTF-8-as-cp1252 code set this greedy decode is exact: no code is a
    * proper prefix of another except the bare close-quote, whose
    * follower can never complete a longer code (PropertySpec pins the
    * round-trip). */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var m = -1
      var j = 0
      while (m < 0 && j < mojiBads.length) {
        if (str.startsWith(mojiBads(j), i)) m = j
        j += 1
      }
      if (m >= 0) { sb.append(mojiGoods(m)); i += mojiBads(m).length }
      else { sb.append(str.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** One-pass character-distribution statistics over a string:
    * `[n_chars, distinct_chars, top_char_count, entropy_scaled]` where
    * `entropy_scaled = n·L(n) − Σ_c cnt_c·L(cnt_c)` and
    * `L(k) = round(log2(k)·1e6)` — i.e. Shannon entropy in units of
    * 1/1024-bit·n units, kept ALL-INTEGER so a SQL oracle can replay
    * it exactly from a character histogram — the log is the integer
    * piecewise qlog2 ([[lg2q]]), so there is no libm in the loop at
    * all. Counts are per Unicode code point. O(len) time, one
    * small HashMap per row — a stateless map at 100 TB, no shuffle.
    */
  def charStats(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return new GenericArrayData(Array[Any](0L, 0L, 0L, 0L))
    val counts = new java.util.HashMap[Integer, Long](64)
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(Integer.valueOf(cp), java.lang.Long.valueOf(1L),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      n += 1
    }
    var top = 0L
    var sumCLogC = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > top) top = c
      sumCLogC += c * lg2q(c)
    }
    val entropyScaled = n * lg2q(n) - sumCLogC
    new GenericArrayData(Array[Any](n, counts.size().toLong, top, entropyScaled))
  }

  /** Integer piecewise-linear log2 in 1/1024-bit units — qlog2(k) =
    * (blen−1)·1024 + k·1024 div 2^(blen−1) − 1024 with blen the bit
    * length of k (k ≥ 1). Exact integer arithmetic on both engines
    * (the q181 device; PropertySpec pins the ≤0.0871-bit envelope).
    * This REPLACED round(log2(k)·1e6): Java's log/log(2) and DuckDB's
    * log2 can disagree by an ulp on some integers, and one crossing
    * flips a micro-bit — transcendental quantization is only PROBABLY
    * deterministic, the integer form is so by construction.
    *
    * Contract: 1 ≤ k ≤ 2^53. Below 1, blen−1 is negative and the shift
    * wraps (lg2q(0) would compute 1L<<63 garbage that also disagrees
    * with the SQL ql(0) = −1024); above 2^53, k·1024 overflows Long.
    * Callers applying the device to count PRODUCTS (q252's nxy·T) must
    * keep the product under the 2^53 ceiling.
    *
    * Public: also the scalar kernel behind [[graft.functions.Exprs.Qlog2]]
    * — the codegen intrinsic form of the SQL `length(bin(x))` device,
    * which allocates a 1–64-char string per row per call; this is a
    * numberOfLeadingZeros and a shift. */
  def lg2q(k: Long): Long = {
    require(k >= 1 && k <= (1L << 53), s"lg2q domain is [1, 2^53], got $k")
    val blen = 64 - java.lang.Long.numberOfLeadingZeros(k)
    (blen - 1).toLong * 1024 + (k * 1024) / (1L << (blen - 1)) - 1024
  }

  /** One-pass Unicode-script census over a string:
    * `[n_chars, latin, cyrillic, greek, arabic, hangul, cjk, digit,
    * space, other]`. Classification is by fixed code-point ranges (NOT
    * `Character.UnicodeScript`, whose tables drift across JDKs and which
    * a SQL oracle could not replay):
    * latin = A–Z, a–z, U+00C0–U+024F (the contiguous Latin-1
    * Supplement/Extended-A/B letter block — NOTE the range deliberately
    * includes its two non-letters, × U+00D7 and ÷ U+00F7, to stay one
    * branch; an oracle must use the numeric bounds, not "letters");
    * cyrillic = U+0400–U+04FF; greek = U+0370–U+03FF;
    * arabic = U+0600–U+06FF; hangul = U+AC00–U+D7AF;
    * cjk = U+4E00–U+9FFF ∪ U+3040–U+30FF (unified ideographs + kana);
    * digit = 0–9; space = {SP, TAB, LF, CR}; other = rest.
    * Ranges are disjoint, so the nine classes partition the string and
    * the oracle's CASE ladder is order-independent. Plain counters, no
    * allocation per char — a stateless codegen map, no shuffle at 100 TB.
    */
  def scriptStats(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](10)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      out(0) += 1
      val cls =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= 0xC0 && cp <= 0x24F)) 1
        else if (cp >= 0x400 && cp <= 0x4FF) 2
        else if (cp >= 0x370 && cp <= 0x3FF) 3
        else if (cp >= 0x600 && cp <= 0x6FF) 4
        else if (cp >= 0xAC00 && cp <= 0xD7AF) 5
        else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF)) 6
        else if (cp >= '0' && cp <= '9') 7
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') 8
        else 9
      out(cls) += 1
    }
    new GenericArrayData(out.map(l => l: Any))
  }
}
