package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for operations Spark's built-in function
  * library can't express efficiently. Each participates in whole-stage
  * codegen via `defineCodeGen` emitting a call into [[TextKernels]] — one
  * virtual call per row, no boxing, no UDF serialization overhead. This is
  * the (b) tier of the build plan: native `functions._` > custom
  * `Expression` > UDF.
  */
object Exprs {

  private val K = "graft.functions.TextKernels"

  /** NFD accent strip (DuckDB `strip_accents` parity). */
  case class StripAccents(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TextKernels.stripAccents(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.stripAccents($c)")
    override protected def withNewChildInternal(c: Expression): StripAccents = copy(c)
  }

  /** NFKD accent strip — governance join-key normalization (X20). */
  case class StripAccentsNfkd(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TextKernels.stripAccentsNfkd(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.stripAccentsNfkd($c)")
    override protected def withNewChildInternal(c: Expression): StripAccentsNfkd = copy(c)
  }

  /** Oracle-replayable polynomial string hash (poly-131 over code
    * points mod 2^61-1, [[TextKernels.polyHash131]]) — the hash the
    * span-dedup operator keys duplicated k-grams on; DuckDB replays it
    * with list_reduce + HUGEINT arithmetic. */
  case class PolyHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.polyHash131(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.polyHash131($c)")
    override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
  }

  /** Integer piecewise-linear log2 in 1/1024-bit units
    * ([[TextKernels.lg2q]] — the q181 qlog2 device) as ONE codegen
    * intrinsic. The SQL-built form `(length(bin(x))−1)·1024 + x·1024
    * div shiftleft(1,…) − 1024` allocates a 1–64-char binary STRING
    * per row per call inside whole-stage codegen; this emits a
    * numberOfLeadingZeros + shift, value-identical by construction
    * (PropertySpec pins equality against the SQL device on random
    * longs). DuckDB oracles keep the `length(bin(x))` spelling —
    * the device's cross-engine contract is the VALUE, not the
    * spelling. Domain [1, 2^53] enforced by the kernel.
    *
    * ImplicitCastInputTypes pins the child to LongType so the analyzer
    * inserts a cast for narrower literals (`graft_qlog2(5)` arrives as
    * INT): without it the interpreted path's `asInstanceOf[Long]`
    * ClassCastExceptions where the codegen path silently widens — the
    * two execution paths must agree (round-12 advice). */
  case class Qlog2(child: Expression)
      extends org.apache.spark.sql.graftshim.LongInputUnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.lg2q(v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.lg2q($c)")
    override protected def withNewChildInternal(c: Expression): Qlog2 =
      copy(child = c)
  }

  /** h·g mod 2^61−1 ([[TextKernels.mulMod61]]) for a fixed multiplier
    * `g` — the uniformizer/bijection the sketch hash families apply on
    * top of [[PolyHash]]. DuckDB replays it as HUGEINT `h * g % M`.
    * LongType pinned like [[Qlog2]] — interpreted/codegen parity. */
  case class MulMod61(child: Expression, g: Long)
      extends org.apache.spark.sql.graftshim.LongInputUnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.mulMod61(v.asInstanceOf[Long], g)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.mulMod61($c, ${g}L)")
    override protected def withNewChildInternal(c: Expression): MulMod61 = copy(child = c)
  }

  /** 64-bit SimHash of an array<string> of tokens. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.simHash64(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.simHash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** MinHash signature (k xxhash64 seeds) of an array<string> of shingles. */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.minHash(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.minHash($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** Winnowing fingerprint set of an array<string> of tokens. */
  case class Winnow(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.winnow(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.winnow($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
  }

  /** Cosine similarity of two array<float> embeddings, double-accumulated.
    * Replaces a non-codegen higher-order `aggregate`/`zip_with` chain with
    * one tight loop — the hot path of brute-force ANN (25M+ pairs at
    * bench scale).
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.cosineF(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.cosineF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Quantized integer dot of two array<float>
    * ([[TextKernels.qdotF]]): Σ floor(aᵢ·10⁸)·floor(bᵢ·10⁸) as long. */
  case class QDotF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.qdotF(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.qdotF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): QDotF =
      copy(left = l, right = r)
  }

  /** Dot product of two array<float>, double-accumulated. */
  case class DotF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.dotF(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.dotF($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
      copy(left = l, right = r)
  }

  /** Intersection size of two sorted distinct string arrays (merge walk,
    * no per-row allocation) — the set-similarity join kernel. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.sortedIntersectCount(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
  }

  /** Long-id variant of [[SortedIntersectCount]] for pre-hashed token sets. */
  case class SortedIntersectCountLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.sortedIntersectCountLong(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.sortedIntersectCountLong($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountLong =
      copy(left = l, right = r)
  }

  /** Token array → fixed-width bitset over a driver-built vocabulary.
    * The vocab ships to executors as a codegen reference object (one
    * HashMap per task, not per row). Dense fast path of the
    * set-similarity join — see operators.SetSimJoin. */
  case class TokenBitmap(child: Expression,
      vocab: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
      words: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.tokenBitmap(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], vocab, words)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("vocab", vocab, "java.util.HashMap")
      defineCodeGen(ctx, ev, c => s"$K.tokenBitmap($c, $ref, $words)")
    }
    override protected def withNewChildInternal(c: Expression): TokenBitmap =
      copy(child = c)
  }

  /** Single-pass longest-match mojibake repair (see
    * [[TextKernels.fixMojibake]] for why a replace chain is unsound). */
  case class FixMojibake(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TextKernels.fixMojibake(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.fixMojibake($c)")
    override protected def withNewChildInternal(c: Expression): FixMojibake =
      copy(c)
  }

  /** Bloom-filter membership probe against a broadcast filter — the
    * codegen form of the decontamination prefilter. The expression
    * carries the Broadcast HANDLE (bytes, not the filter), so the task
    * binary stays small and the filter itself arrives torrent-style
    * once per executor; the probe is one byte-hash per row inside
    * whole-stage codegen. */
  case class BloomMightContain(child: Expression,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any =
      bloom.value.mightContainBinary(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBc", bloom,
        "org.apache.spark.broadcast.Broadcast")
      defineCodeGen(ctx, ev, c =>
        s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainBinary($c.getBytes())")
    }
    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  /** popcount(a&b)/popcount(a|b) of two equal-width bitsets. */
  case class BitmapJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.bitmapJaccard(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.bitmapJaccard($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapJaccard =
      copy(left = l, right = r)
  }

  /** popcount(a&b) of two equal-width bitsets (long count) — feeds the
    * integer-exact Jaccard device. */
  case class BitmapInterCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.bitmapInter(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.bitmapInter($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapInterCount =
      copy(left = l, right = r)
  }

  /** Word n-grams of a token array (codegen shingle generator). */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.wordNgrams(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordNgrams($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordNgrams =
      copy(child = c)
  }

  /** One-pass n-gram repetition counters `[n, distinct, max_count]` —
    * see [[TextKernels.repetitionStats]]. */
  case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.repetitionStats(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.repetitionStats($c, $n)")
    override protected def withNewChildInternal(c: Expression): RepetitionStats =
      copy(child = c)
  }

  /** One-pass character-distribution counters
    * `[n_chars, distinct_chars, top_char_count, entropy_scaled]` —
    * see [[TextKernels.charStats]]. */
  case class CharStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.charStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.charStats($c)")
    override protected def withNewChildInternal(c: Expression): CharStats =
      copy(child = c)
  }

  /** One-pass Unicode-script census
    * `[n, latin, cyrillic, greek, arabic, hangul, cjk, digit, space,
    * other]` — see [[TextKernels.scriptStats]]. */
  case class ScriptStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.scriptStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.scriptStats($c)")
    override protected def withNewChildInternal(c: Expression): ScriptStats =
      copy(child = c)
  }

  /** popcount of a bitset (token-set cardinality). */
  case class BitmapCard(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      TextKernels.bitmapCard(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.bitmapCard($c)")
    override protected def withNewChildInternal(c: Expression): BitmapCard =
      copy(child = c)
  }

  /** All M PQ codes of a normalized vector, packed 4 bits each into
    * one long — a single kernel call per row in place of M·K unrolled
    * candidate expressions (whose per-plan codegen compile dominated
    * the PQ gates). The codebook ships as a codegen reference object. */
  case class PqPack(child: Expression, cb: Array[Float],
      m: Int, sub: Int, k: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernels.pqPack(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        cb, m, sub, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqcb", cb, "float[]")
      defineCodeGen(ctx, ev, c => s"$K.pqPack($c, $ref, $m, $sub, $k)")
    }
    override protected def withNewChildInternal(c: Expression): PqPack =
      copy(child = c)
  }

  /** PQ asymmetric-distance score of a query vector against a packed
    * code word, exact integer ten-thousandths. */
  case class PqAdc(left: Expression, right: Expression, cb: Array[Float],
      m: Int, sub: Int, k: Int) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(q: Any, codes: Any): Any =
      TextKernels.pqAdc(
        q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        codes.asInstanceOf[Long], cb, m, sub, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqcb", cb, "float[]")
      defineCodeGen(ctx, ev, (q, c) => s"$K.pqAdc($q, $c, $ref, $m, $sub, $k)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(left = l, right = r)
  }

  // ---- Column-API wrappers ------------------------------------------------

  private def c(e: Expression): Column = Shim.column(e)
  private def e(col: Column): Expression = Shim.expression(col)

  def strip_accents(col: Column): Column = c(StripAccents(e(col)))
  def strip_accents_nfkd(col: Column): Column = c(StripAccentsNfkd(e(col)))
  def fix_mojibake(col: Column): Column = c(FixMojibake(e(col)))
  def bloom_might_contain(col: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    c(BloomMightContain(e(col), bloom))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def qlog2(x: Column): Column = c(Qlog2(e(x)))
  def minhash_sig(shingles: Column, k: Int): Column = c(MinHashSig(e(shingles), k))
  def winnow_fingerprints(tokens: Column, k: Int, w: Int): Column =
    c(Winnow(e(tokens), k, w))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))
  def qdot(a: Column, b: Column): Column = c(QDotF(e(a), e(b)))
  def dot_f(a: Column, b: Column): Column = c(DotF(e(a), e(b)))
  def pq_pack(v: Column, cb: Array[Float], m: Int, sub: Int, k: Int): Column =
    c(PqPack(e(v), cb, m, sub, k))
  def pq_adc(q: Column, codes: Column, cb: Array[Float],
      m: Int, sub: Int, k: Int): Column =
    c(PqAdc(e(q), e(codes), cb, m, sub, k))
  def sorted_intersect_count(a: Column, b: Column): Column =
    c(SortedIntersectCount(e(a), e(b)))
  def sorted_intersect_count_long(a: Column, b: Column): Column =
    c(SortedIntersectCountLong(e(a), e(b)))
  def token_bitmap(tokens: Column,
      vocab: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
      words: Int): Column = c(TokenBitmap(e(tokens), vocab, words))
  def bitmap_jaccard(a: Column, b: Column): Column = c(BitmapJaccard(e(a), e(b)))
  def bitmap_inter(a: Column, b: Column): Column = c(BitmapInterCount(e(a), e(b)))
  def bitmap_card(a: Column): Column = c(BitmapCard(e(a)))
  def word_ngrams(tokens: Column, n: Int): Column = c(WordNgrams(e(tokens), n))
  def poly_hash(s: Column): Column = c(PolyHash(e(s)))
  def mulmod61(h: Column, g: Long): Column = c(MulMod61(e(h), g))
  def repetition_stats(tokens: Column, n: Int): Column = c(RepetitionStats(e(tokens), n))
  def char_stats(text: Column): Column = c(CharStats(e(text)))
  def script_stats(text: Column): Column = c(ScriptStats(e(text)))
}
