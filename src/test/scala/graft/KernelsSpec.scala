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

  test("cosineF/dotF in double, matching sequential fold") {
    assert(math.abs(TextKernels.cosineF(farr(1f, 0f), farr(1f, 1f)) -
      0.7071067811865475) < 1e-12)
    assert(TextKernels.dotF(farr(1f, 2f, 3f), farr(4f, 5f, 6f)) == 32.0)
    assert(TextKernels.cosineF(farr(0f, 0f), farr(1f, 1f)) == 0.0)
  }
}
