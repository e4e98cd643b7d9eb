package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Ppm

/** The real PPM codec behind the multimodal gates: round-trip, header
  * grammar tolerance (the decoder must read files other tools write,
  * not just its own canonical form), resize sampling, and failure modes
  * that must be loud rather than silently misaligned. */
class PpmSpec extends AnyFunSuite {

  private def img(w: Int, h: Int): Ppm.Image =
    Ppm.Image(w, h, Array.tabulate(w * h * 3)(j => ((j * 31 + 5) % 256).toByte))

  test("encode/decode round-trips geometry and every raster byte") {
    for ((w, h) <- Seq((1, 1), (3, 2), (64, 111), (128, 64))) {
      val orig = img(w, h)
      val back = Ppm.decode(Ppm.encode(orig))
      assert(back.width == w && back.height == h)
      assert(java.util.Arrays.equals(back.raster, orig.raster))
    }
  }

  test("decoder accepts comments and loose whitespace in the header") {
    val orig = img(4, 3)
    val loose = ("P6 # magic comment\n#full line comment\n  4\t3 # dims\n 255\n")
      .getBytes("US-ASCII") ++ orig.raster
    val back = Ppm.decode(loose)
    assert(back.width == 4 && back.height == 3)
    assert(java.util.Arrays.equals(back.raster, orig.raster))
  }

  test("raster may begin with whitespace-looking bytes (single separator rule)") {
    // first raster byte is 0x0A ('\n'): a greedy whitespace skip after
    // maxval would eat it and shift the whole raster by one
    val raster = Array.tabulate(2 * 2 * 3)(i => if (i == 0) '\n'.toByte else i.toByte)
    val bytes = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    assert(java.util.Arrays.equals(Ppm.decode(bytes).raster, raster))
  }

  test("nearest-neighbor downscale samples the (2x, 2y) grid exactly") {
    val orig = img(6, 4)
    val small = Ppm.resizeNearest(orig, 2)
    assert(small.width == 3 && small.height == 2)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      assert(small.raster((y * 3 + x) * 3 + c) ==
        orig.raster(((2 * y) * 6 + 2 * x) * 3 + c))
  }

  test("bad inputs fail loudly: wrong magic, truncated raster, wide maxval") {
    val ok = Ppm.encode(img(2, 2))
    intercept[IllegalArgumentException](Ppm.decode("P5\n2 2\n255\n".getBytes ++ ok.drop(11)))
    intercept[IllegalArgumentException](Ppm.decode(ok.dropRight(1)))
    intercept[IllegalArgumentException](Ppm.decode("P6\n2 2\n65535\n".getBytes ++ ok.drop(11)))
    // hostile dimensions whose w*h*3 overflows Int must not alias a
    // tiny raster size past the truncation check
    intercept[IllegalArgumentException](
      Ppm.decode("P6\n2000000000 2000000000\n255\n".getBytes ++ ok.drop(11)))
  }
}
