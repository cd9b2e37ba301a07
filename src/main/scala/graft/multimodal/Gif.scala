package graft.multimodal

/** From-scratch GIF codec (GIF87a/89a) — the third compression family
  * behind the multimodal seam: LZW, next to PNG's DEFLATE and JPEG's
  * DCT. No external imaging libraries; the block walk, variable-width
  * LZW decoder/encoder, palette resolution, and interlace reordering
  * are hand-written from the published specification.
  *
  * Decode supports the interchange subset: global and local color
  * tables, interlaced and sequential images, extension blocks skipped
  * (GCE transparency is ignored — pixels surface opaque, the same
  * alpha posture as [[Png]]), and the FIRST image frame of an animated
  * stream (a feature pipeline samples frame one; later frames would
  * need GCE disposal compositing, out of scope). The frame surfaces at
  * its own width x height as [[Bmp.Image]].
  *
  * Encode emits a single-frame GIF87a with a palette built from the
  * image's distinct colors — at most 256, the format's hard limit;
  * more fails loudly (lossy quantization belongs to an image pipeline
  * stage, not an interchange codec). Deterministic: palette ordered by
  * first appearance, fixed LZW code emission.
  *
  * Decode errors throw [[IllegalArgumentException]];
  * [[Gif.tryDecode]] converts that to `None` so one corrupt asset
  * cannot kill a pipeline stage.
  */
object Gif {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GIF decode: $msg")

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o + 1 >= b.length) fail(s"truncated at offset $o")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }

  private def byteAt(b: Array[Byte], o: Int): Int = {
    if (o >= b.length) fail(s"truncated at offset $o")
    b(o) & 0xff
  }

  /** interlace pass layout: (first row, step) per pass */
  private val InterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  def decode(bytes: Array[Byte]): Bmp.Image = {
    if (bytes.length < 13) fail(s"file too short (${bytes.length} bytes)")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") fail(s"bad signature '$sig'")
    // logical screen descriptor
    val flags = byteAt(bytes, 10)
    var off = 13
    var globalPalette: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 0x07)
      globalPalette = readPalette(bytes, off, n)
      off += 3 * n
    }

    // block walk to the first image descriptor
    while (true) {
      byteAt(bytes, off) match {
        case 0x3b => fail("trailer before any image data")
        case 0x21 => // extension: label + sub-blocks
          off += 2
          off = skipSubBlocks(bytes, off)
        case 0x2c => // image descriptor
          val w = u16(bytes, off + 5)
          val h = u16(bytes, off + 7)
          val iflags = byteAt(bytes, off + 9)
          if (w < 1 || h < 1 || w.toLong * h > (1L << 26))
            fail(s"bad frame dimensions ${w}x$h")
          off += 10
          var palette = globalPalette
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 0x07)
            palette = readPalette(bytes, off, n)
            off += 3 * n
          }
          if (palette == null) fail("image without any color table")
          val interlaced = (iflags & 0x40) != 0
          val minCode = byteAt(bytes, off)
          off += 1
          val indices = lzwDecode(bytes, off, minCode, w * h)
          val px = new Array[Int](w * h)
          if (interlaced) {
            var src = 0
            InterlacePasses.foreach { case (first, step) =>
              var y = first
              while (y < h) {
                var x = 0
                while (x < w) {
                  val idx = indices(src); src += 1
                  if (idx >= palette.length)
                    fail(s"pixel index $idx >= palette size ${palette.length}")
                  px(y * w + x) = palette(idx)
                  x += 1
                }
                y += step
              }
            }
          } else {
            var i = 0
            while (i < w * h) {
              val idx = indices(i)
              if (idx >= palette.length)
                fail(s"pixel index $idx >= palette size ${palette.length}")
              px(i) = palette(idx)
              i += 1
            }
          }
          return Bmp.Image(w, h, px)
        case other => fail(f"unknown block type $other%02x")
      }
    }
    fail("unreachable")
  }

  def tryDecode(bytes: Array[Byte]): Option[Bmp.Image] =
    try Some(decode(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  private def readPalette(b: Array[Byte], off: Int, n: Int): Array[Int] = {
    if (off + 3 * n > b.length) fail(s"color table overruns file")
    Array.tabulate(n)(i =>
      ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) |
        (b(off + 3 * i + 2) & 0xff))
  }

  private def skipSubBlocks(b: Array[Byte], off0: Int): Int = {
    var off = off0
    var len = byteAt(b, off)
    while (len != 0) {
      off += 1 + len
      len = byteAt(b, off)
    }
    off + 1
  }

  /** Variable-width LZW decode of the image sub-blocks: codes are
    * packed LSB-first; the width grows when the dictionary reaches
    * 1 << width (capped at 12 bits per spec); CLEAR resets. Exactly
    * `expected` pixel indices must come out before END/exhaustion. */
  private def lzwDecode(b: Array[Byte], off0: Int, minCode: Int,
      expected: Int): Array[Int] = {
    if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode")
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary: prefix code + appended index, entries < 4096
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var nextCode = end + 1
    var width = minCode + 1

    val out = new Array[Int](expected)
    var produced = 0

    // bit reader over the sub-block chain
    var off = off0
    var blockLeft = 0
    var acc = 0L
    var nAcc = 0
    def nextCodeWord(): Int = {
      while (nAcc < width) {
        if (blockLeft == 0) {
          blockLeft = byteAt(b, off); off += 1
          if (blockLeft == 0) return -1 // terminator: no more data
        }
        acc |= (byteAt(b, off).toLong << nAcc)
        off += 1; blockLeft -= 1
        nAcc += 8
      }
      val c = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nAcc -= width
      c
    }

    // emit one dictionary chain (reversed on a stack); `limit` is the
    // first UNdefined code — the KwKwK caller passes nextCode + 1
    // because it just provisionally registered entry nextCode itself
    val stack = new Array[Int](4096)
    def emit(code0: Int, limit: Int): Int = { // returns chain's FIRST index
      var sp = 0
      var code = code0
      while (code >= clear + 2) { // composite entry
        if (code >= limit) fail(s"LZW code $code before definition")
        stack(sp) = suffix(code); sp += 1
        code = prefix(code)
      }
      val first = code
      if (produced + sp + 1 > expected)
        fail(s"LZW produced more than $expected pixels")
      out(produced) = code; produced += 1
      while (sp > 0) { sp -= 1; out(produced) = stack(sp); produced += 1 }
      first
    }

    var prev = -1
    var done = false
    while (!done && produced < expected) {
      val code = nextCodeWord()
      if (code < 0) fail(s"LZW data exhausted at $produced of $expected")
      if (code == clear) {
        nextCode = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) fail(s"first code $code after clear not a literal")
        out(produced) = code; produced += 1
        prev = code
      } else {
        val first =
          if (code < nextCode) emit(code, nextCode)
          else if (code == nextCode) { // the KwKwK case
            // chain = prev's chain + its own first index
            if (produced >= expected) fail("LZW overrun in KwKwK")
            val f = firstIndexOf(prev, clear, prefix, suffix)
            // temp-register the entry so emit can walk it
            prefix(nextCode) = prev; suffix(nextCode) = f
            emit(code, nextCode + 1)
          } else fail(s"LZW code $code beyond dictionary $nextCode")
        if (nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (produced != expected)
      fail(s"LZW produced $produced of $expected pixels")
    out
  }

  private def firstIndexOf(code0: Int, clear: Int,
      prefix: Array[Int], suffix: Array[Int]): Int = {
    var code = code0
    while (code >= clear + 2) code = prefix(code)
    code
  }

  // ---- encoder ----

  /** Encode top-down 0xRRGGBB pixels as a single-frame GIF87a. The
    * palette is the image's distinct colors in first-appearance order;
    * more than 256 distinct colors fails loudly (GIF's hard limit). */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff,
      s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    // palette: first-appearance order (deterministic)
    val paletteOrder = new java.util.LinkedHashMap[Int, Int]()
    pixels.foreach { p =>
      val c = p & 0xffffff
      if (!paletteOrder.containsKey(c)) {
        if (paletteOrder.size == 256)
          throw new IllegalArgumentException(
            "GIF encode: more than 256 distinct colors — quantize first")
        paletteOrder.put(c, paletteOrder.size)
      }
    }
    val nColors = paletteOrder.size
    // table size = 2^(k+1) >= max(nColors, 2); minCode >= 2 per spec
    var bits = 1
    while ((1 << bits) < nColors) bits += 1
    bits = math.max(bits, 2)
    val tableSize = 1 << bits

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(width); w16(height)
    out.write(0x80 | (bits - 1)) // global table present, size 2^bits
    out.write(0); out.write(0)   // bg index, aspect
    val colors = new Array[Int](tableSize)
    paletteOrder.forEach((c, i) => colors(i) = c)
    colors.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
      out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(width); w16(height)
    out.write(0) // no local table, not interlaced

    // LZW encode
    val minCode = bits
    out.write(minCode)
    val clear = 1 << minCode
    val end = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    var width_ = minCode + 1
    def putCode(c: Int): Unit = {
      acc |= (c.toLong << nAcc); nAcc += width_
      while (nAcc >= 8) {
        data.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8
      }
    }
    // dictionary: (prefixCode << 8 | index) -> code
    val dict = new java.util.HashMap[Int, Int]()
    var nextCode = end + 1
    putCode(clear)
    val idx = pixels.map(p => paletteOrder.get(p & 0xffffff))
    var prev = idx(0)
    var i = 1
    while (i < idx.length) {
      val k = (prev << 8) | idx(i)
      val hit = dict.getOrDefault(k, -1)
      if (hit >= 0) prev = hit
      else {
        putCode(prev)
        if (nextCode < 4096) {
          dict.put(k, nextCode)
          nextCode += 1
          // the DECODER bumps width after registering the same entry,
          // so the encoder bumps at the same boundary
          if (nextCode == (1 << width_) + 1 && width_ < 12) width_ += 1
        } else {
          putCode(clear)
          dict.clear(); nextCode = end + 1; width_ = minCode + 1
        }
        prev = idx(i)
      }
      i += 1
    }
    putCode(prev)
    putCode(end)
    if (nAcc > 0) data.write((acc & 0xff).toInt)
    // sub-block chain
    val lzw = data.toByteArray
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n); out.write(lzw, o, n)
      o += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Cheap magic sniff — raw byte compares like the sibling codecs
    * (this runs once per row on the map-only decode path). */
  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'
}
