package graft.multimodal

/** From-scratch uncompressed-BMP codec (BITMAPINFOHEADER, 24 bpp) —
  * no external imaging libraries.
  *
  * Supports what an uncompressed interchange BMP actually is: 14-byte
  * file header, 40-byte (or larger — size field honored) info header,
  * BI_RGB compression, 24 bits per pixel, rows padded to 4-byte
  * boundaries, bottom-up (positive height) or top-down (negative
  * height) row order. Pixels are surfaced row-major top-down as packed
  * 0xRRGGBB ints regardless of the stored orientation.
  *
  * Decode errors throw [[IllegalArgumentException]];
  * [[Bmp.tryDecode]] converts that to `None` so one corrupt asset
  * cannot kill a pipeline stage.
  */
object Bmp {

  /** Decoded image: `pixels(y * width + x)` = 0xRRGGBB, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"BMP decode: $msg")

  private def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode top-down 0xRRGGBB pixels as a canonical bottom-up 24-bpp
    * BMP. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val stride = rowSize(width)
    val dataLen = stride * height
    val out = new Array[Byte](54 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54L + dataLen); put32(6, 0L); put32(10, 54L)
    put32(14, 40L)                         // BITMAPINFOHEADER
    put32(18, width.toLong); put32(22, height.toLong)
    put16(26, 1); put16(28, 24)            // planes, bpp
    put32(30, 0L); put32(34, dataLen.toLong)
    put32(38, 2835L); put32(42, 2835L)     // 72 DPI
    put32(46, 0L); put32(50, 0L)
    var y = 0
    while (y < height) {
      // stored bottom-up: file row 0 is image row height-1
      val srcRow = height - 1 - y
      val rowOff = 54 + y * stride
      var x = 0
      while (x < width) {
        val p = pixels(srcRow * width + x)
        out(rowOff + 3 * x) = (p & 0xff).toByte            // B
        out(rowOff + 3 * x + 1) = ((p >> 8) & 0xff).toByte // G
        out(rowOff + 3 * x + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Header-walking 24-bpp decoder. */
  def decode(bytes: Array[Byte]): Image = {
    if (bytes.length < 54) fail(s"file too short (${bytes.length} bytes)")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("missing BM magic")
    val dataOff = u32(bytes, 10)
    val hdrSize = u32(bytes, 14)
    if (hdrSize < 40) fail(s"info header too small ($hdrSize)")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width < 1 || height < 1 || width > (1 << 20) || height > (1 << 20))
      fail(s"bad dimensions ${width}x$rawHeight")
    if (planes != 1) fail(s"planes must be 1, got $planes")
    if (bpp != 24) fail(s"unsupported bit depth $bpp (only 24)")
    if (compression != 0) fail(s"unsupported compression $compression " +
      "(only BI_RGB)")
    val stride = rowSize(width)
    val need = dataOff + stride.toLong * height
    if (dataOff < 54 || need > bytes.length)
      fail(s"pixel array overruns file ($need > ${bytes.length})")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val imgRow = if (topDown) y else height - 1 - y
      val rowOff = dataOff.toInt + y * stride
      var x = 0
      while (x < width) {
        val b = bytes(rowOff + 3 * x) & 0xff
        val g = bytes(rowOff + 3 * x + 1) & 0xff
        val r = bytes(rowOff + 3 * x + 2) & 0xff
        px(imgRow * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }

  def tryDecode(bytes: Array[Byte]): Option[Image] =
    try Some(decode(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  /** Nearest-neighbor resample to `w`x`h` — real pixels, not metadata.
    * Pixel-center mapping (src = floor((dst + 0.5) * srcDim / dstDim),
    * all-integer arithmetic, so the output is bit-deterministic across
    * JVMs and partitions) — the standard NN downsample a training
    * pipeline runs before feature extraction. Upsampling replicates
    * pixels with the same mapping. */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w >= 1 && h >= 1, s"bad target dimensions ${w}x$h")
    if (w == img.width && h == img.height) return img
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      // (2y+1)*srcH / (2h) = floor((y+0.5)*srcH/h); < srcH for y < h
      val sy = ((2L * y + 1) * img.height / (2L * h)).toInt
      var x = 0
      while (x < w) {
        val sx = ((2L * x + 1) * img.width / (2L * w)).toInt
        out(y * w + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Cheap magic sniff. */
  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'
}
