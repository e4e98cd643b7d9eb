package graft.multimodal

/** Minimal real PPM (P6, 8-bit) codec — pure JVM, no libraries.
  *
  * Encode writes the canonical `P6\n<w> <h>\n255\n<raster>` form;
  * decode accepts the full P6 grammar (any whitespace between header
  * tokens, `#` comments ending at newline, exactly one whitespace byte
  * after maxval before the raster) so it reads files other tools write,
  * not just its own. Raster is w*h*3 bytes, row-major RGB.
  *
  * Known grammar ambiguity, inherent to P6 itself: a comment placed
  * AFTER the maxval token (`255 #x\n<raster>`) cannot be distinguished
  * from a raster whose first byte is '#' (0x23 is a legal pixel value),
  * so such malformed-but-plausible files decode with the comment bytes
  * as pixels. Spec-conforming writers never emit a comment there.
  */
object Ppm {

  final case class Image(width: Int, height: Int, raster: Array[Byte])

  def encode(img: Image): Array[Byte] = {
    require(img.raster.length == img.width * img.height * 3,
      s"raster ${img.raster.length} != ${img.width}x${img.height}x3")
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.raster, 0, out, header.length, img.raster.length)
    out
  }

  def decode(bytes: Array[Byte]): Image = decodeAt(bytes, 0)._1

  /** Parse ONE P6 image starting at `offset` and return it with the
    * offset one past its raster — the walk primitive for sequential
    * containers (a concatenated-frames "video" file): callers loop
    * `decodeAt` until the returned offset reaches the buffer end. */
  def decodeAt(bytes: Array[Byte], offset: Int): (Image, Int) = {
    var pos = offset
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    // skip whitespace and # comments (comment runs to end of line)
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos)) && bytes(pos) != '#') pos += 1
      require(pos > start, s"truncated PPM header at byte $start")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a P6 PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxval == 255, s"only 8-bit maxval supported, got $maxval")
    // exactly ONE whitespace byte separates maxval from the raster (spec:
    // a raster byte may itself look like whitespace, so no greedy skip)
    require(pos < bytes.length && isWs(bytes(pos)), "missing raster separator")
    pos += 1
    // long arithmetic: a hostile header like "2000000000 2000000000"
    // overflows w*h*3 in Int and could alias a tiny (even negative)
    // raster size past the truncation check
    val need = w.toLong * h * 3
    require(need <= bytes.length.toLong - pos,
      s"raster truncated: need $need, have ${bytes.length - pos}")
    (Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)),
      pos + need.toInt)
  }

  /** Nearest-neighbor integer downscale by `factor`: output pixel (x,y)
    * samples input (factor*x, factor*y). Real resize over a real raster
    * — the gate oracle predicts the exact output bytes from the fixture
    * generator's arithmetic. */
  def resizeNearest(img: Image, factor: Int): Image = {
    val w2 = math.max(1, img.width / factor)
    val h2 = math.max(1, img.height / factor)
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((y * factor) * img.width + (x * factor)) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.raster(src)
        out(dst + 1) = img.raster(src + 1)
        out(dst + 2) = img.raster(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }
}
