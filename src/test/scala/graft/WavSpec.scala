package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Wav

/** The real WAV codec behind the audio gate: round-trip, RIFF
  * chunk-walk tolerance (unknown chunks, odd-size padding, fmt-first
  * not assumed), endianness, and failure modes that must be loud
  * rather than silently mis-sampled. */
class WavSpec extends AnyFunSuite {

  private def clip(n: Int): Wav.Audio =
    Wav.Audio(16000, 1, Array.tabulate(n)(j => ((j * 7919 + 13) % 65536 - 32768).toShort))

  test("encode/decode round-trips rate, channels, and every sample") {
    val a = clip(300)
    val b = Wav.decode(Wav.encode(a))
    assert(b.sampleRate == 16000 && b.channels == 1)
    assert(b.samples.sameElements(a.samples))
  }

  test("negative samples survive the little-endian round trip exactly") {
    val a = Wav.Audio(8000, 1, Array[Short](-32768, -1, 0, 1, 32767, -256, 255))
    assert(Wav.decode(Wav.encode(a)).samples.sameElements(a.samples))
  }

  test("decoder skips unknown chunks (with odd-size pad) before data") {
    val a = clip(10)
    val canon = Wav.encode(a)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = canon.take(fmtEnd) ++ extra ++ canon.drop(fmtEnd)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte
    val b = Wav.decode(spliced)
    assert(b.sampleRate == 16000 && b.samples.sameElements(a.samples))
  }

  test("bad inputs fail loudly: wrong magic, float PCM, truncated data") {
    val good = Wav.encode(clip(10))
    val notRiff = good.clone(); notRiff(0) = 'X'
    intercept[IllegalArgumentException](Wav.decode(notRiff))
    val floatTag = good.clone(); floatTag(20) = 3 // IEEE float fmt tag
    intercept[IllegalArgumentException](Wav.decode(floatTag))
    intercept[IllegalArgumentException](Wav.decode(good.take(good.length - 4)))
  }

  test("hostile chunk size cannot read past the buffer") {
    val good = Wav.encode(clip(4))
    val evil = good.clone()
    // data chunk size field → huge
    evil(40) = -1; evil(41) = -1; evil(42) = 0; evil(43) = 0
    intercept[IllegalArgumentException](Wav.decode(evil))
  }
}
