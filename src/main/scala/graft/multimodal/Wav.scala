package graft.multimodal

/** Minimal real WAV (RIFF/WAVE, PCM16LE) codec — pure JVM, no libraries.
  *
  * Encode writes the canonical 44-byte-header mono PCM16 form
  * (`RIFF<sz>WAVE` + `fmt ` subchunk + `data` subchunk). Decode walks
  * the RIFF subchunk list — skipping unknown chunks (LIST/INFO/fact/…)
  * with the spec's odd-size pad byte — so it reads files other tools
  * write, not just its own; it requires format tag 1 (integer PCM),
  * 16 bits per sample, and accepts any channel count (samples are
  * returned interleaved, as stored).
  *
  * All multi-byte fields are little-endian per RIFF. Chunk sizes are
  * validated against the physical buffer before any copy, so a hostile
  * header can't alias past the payload.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val byteRate = a.sampleRate * a.channels * 2
    val blockAlign = a.channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(a.channels)); out.write(le32(a.sampleRate))
    out.write(le32(byteRate)); out.write(le16(blockAlign)); out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      out.write(s & 0xff); out.write((s >> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Audio = {
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def tag(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    require(bytes.length >= 12, "truncated RIFF header")
    require(tag(0) == "RIFF", s"not a RIFF file (magic '${tag(0)}')")
    require(tag(8) == "WAVE", s"not a WAVE form (type '${tag(8)}')")
    var pos = 12
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || rate < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      require(sz <= bytes.length.toLong - (pos + 8),
        s"chunk '$id' size $sz overruns buffer")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too small ($sz)")
          val fmtTag = u16(body)
          require(fmtTag == 1, s"only integer PCM supported (tag $fmtTag)")
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
          val bits = u16(body + 14)
          require(bits == 16, s"only 16-bit samples supported (got $bits)")
        case "data" =>
          require(sz % 2 == 0, s"odd PCM16 data size $sz")
          val n = (sz / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((bytes(body + 2 * i) & 0xff) |
              ((bytes(body + 2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
          samples = out
        case _ => () // LIST/INFO/fact/bext/… — skip
      }
      pos = body + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
    }
    require(rate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(rate, channels, samples)
  }
}
