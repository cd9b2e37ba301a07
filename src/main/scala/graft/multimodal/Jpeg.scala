package graft.multimodal

/** From-scratch baseline JPEG codec (ITU-T T.81 sequential DCT, the
  * format ~every web image corpus is dominated by) — no external
  * imaging libraries; everything below (marker walk, canonical Huffman
  * decode, zigzag/dequantize, IDCT, YCbCr conversion, chroma
  * upsampling, and the matching encoder) is hand-written from the
  * published spec. Completes the compressed-image story next to
  * [[Png]]: PNG is lossless DEFLATE, JPEG is the lossy transform codec.
  *
  * Decode supports the baseline interchange subset: SOF0 (sequential
  * DCT, 8-bit precision), 1 component (grayscale, decoded
  * non-interleaved per T.81 A.2.3 whatever sampling factors the
  * header declares) or 3 components (YCbCr) with 4:4:4, 4:2:0, or
  * 4:2:2 sampling, restart intervals (DRI + RSTn, tolerant of fill
  * and stuffed pad bytes), multi-segment DQT/DHT, byte-stuffed
  * entropy data, and skipped APPn/COM metadata. Progressive (SOF2),
  * arithmetic coding, 12-bit precision, and images past a 2^26-pixel
  * area cap (a hostile 25-byte header must not OOM an executor) are
  * refused loudly. Pixels surface as [[Bmp.Image]] so feature
  * extraction and resize compose across all three image codecs.
  *
  * Encode emits 3-component baseline 4:4:4 YCbCr with the spec's
  * own example tables (T.81 Annex K quantization + Huffman) — fixed
  * tables, fixed code paths, so the same pixels always produce the
  * same bytes on any JVM.
  *
  * The IDCT/FDCT are the textbook separable double-precision forms in
  * a fixed loop order: IEEE-deterministic, and exact enough that a
  * DC-only block reconstructs to the hand-computable flat value
  * `round(DC * q / 8) + 128` the golden specs pin.
  *
  * Decode errors throw [[IllegalArgumentException]];
  * [[Jpeg.tryDecode]] converts that to `None` so one corrupt asset
  * cannot kill a pipeline stage.
  */
object Jpeg {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"JPEG decode: $msg")

  /** zigzag index -> (row-major) natural index, T.81 figure 5 */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K example tables (the spec's published defaults) ----

  private[multimodal] val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private[multimodal] val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // (counts per code length 1..16, symbols) — T.81 K.3.3
  private val DcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaSyms = (0 to 11).toArray
  private val DcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaSyms = (0 to 11).toArray
  private val AcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman table in the T.81 F.2.2.3 decode form:
    * per code length, the smallest/largest code and the index of the
    * first symbol of that length. */
  private final class Huff(counts: Array[Int], syms: Array[Int]) {
    require(counts.length == 16)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val symbols: Array[Int] = syms
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        if (counts(l - 1) == 0) maxCode(l) = -1
        else { code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1 }
        code <<= 1
        l += 1
      }
      require(k == syms.length,
        s"huffman table: ${syms.length} symbols for $k codes")
    }
  }

  /** Entropy-coded-segment bit reader: handles FF00 byte stuffing and
    * stops (reporting the marker) at any real FFxx marker. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bits = 0
    private var nBits = 0
    var atMarker: Int = -1 // 0xD0..0xD7 for RSTn, 0xD9 for EOI, ...

    def nextBit(): Int = {
      if (nBits == 0) {
        if (atMarker >= 0) fail("entropy data ended at a marker mid-symbol")
        if (pos >= data.length) fail("entropy data truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) fail("entropy data truncated after FF")
          val m = data(pos) & 0xff; pos += 1
          if (m == 0x00) b = 0xff // stuffed
          else { atMarker = m
            fail(f"marker FF$m%02x inside an entropy-coded symbol") }
        }
        bits = b; nBits = 8
      }
      nBits -= 1
      (bits >> nBits) & 1
    }

    /** Between restart intervals: discard pad bits, then consume the
      * RSTn marker. Spec-legal noise is tolerated — a stuffed FF00
      * whose FF was pure padding (T.81 B.1.1.5) and any number of FF
      * fill bytes before the marker (B.1.1.2). Returns the marker's
      * low byte; fails loudly when what follows is not an RSTn. */
    def consumeRst(): Int = {
      nBits = 0 // byte-align: remaining bits of the last byte are pad
      // B.1.1.2 allows an ARBITRARY number of 0xFF fill bytes before a
      // marker, so the scan is bounded only by the input itself: every
      // iteration advances pos, and exhaustion fails loudly below.
      while (pos + 1 < data.length) {
        val a = data(pos) & 0xff; val b = data(pos + 1) & 0xff
        if (a != 0xff) fail(f"expected RST marker, found $a%02x")
        if (b == 0x00) pos += 2       // stuffed pad byte
        else if (b == 0xff) pos += 1  // fill byte
        else if (b >= 0xd0 && b <= 0xd7) { pos += 2; return b }
        else fail(f"expected RST marker, found FF$b%02x")
      }
      fail("entropy data ended expecting RST")
    }

    def decodeSym(h: Huff): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.symbols(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      fail("invalid huffman code (no symbol within 16 bits)")
    }

    /** RECEIVE + EXTEND (T.81 F.2.2.1): read `size` magnitude bits. */
    def receiveExtend(size: Int): Int = {
      if (size == 0) return 0
      var v = 0
      var i = 0
      while (i < size) { v = (v << 1) | nextBit(); i += 1 }
      if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
    }
  }

  // ---- IDCT / FDCT (separable, double, fixed order) ----

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** 2D IDCT of one dequantized 8x8 block (natural order) -> spatial
    * samples WITHOUT the +128 level shift. */
  private[multimodal] def idct(coef: Array[Int], out: Array[Double],
      tmp: Array[Double] = new Array[Double](64)): Unit = {
    // rows then columns (separable); tmp holds the row pass
    // (callers in per-block loops pass a hoisted tmp — a fresh
    // 512-byte array per 8x8 block is avoidable garbage at scale)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(v * 8 + yy)
          v += 1
        }
        out(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  /** 2D FDCT of one level-shifted 8x8 spatial block -> natural-order
    * coefficients. */
  private[multimodal] def fdct(in: Array[Double], out: Array[Double],
      tmp: Array[Double] = new Array[Double](64)): Unit = {
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosTable(u * 8 + x); x += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        tmp(y * 8 + u) = s * cu / 2.0
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTable(v * 8 + yy); yy += 1 }
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = s * cv / 2.0
        v += 1
      }
      u += 1
    }
  }

  private def clamp8(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  // ---- decoder ----

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0 // DC predictor
  }

  /** Marker-walking baseline decoder. */
  def decode(bytes: Array[Byte]): Bmp.Image = {
    if (bytes.length < 4) fail(s"file too short (${bytes.length} bytes)")
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("missing SOI marker")

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0

    var off = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (off + 4 > bytes.length) fail("truncated marker stream (no SOS)")
      if ((bytes(off) & 0xff) != 0xff)
        fail(f"expected marker, got ${bytes(off)}%02x at offset $off")
      var marker = bytes(off + 1) & 0xff
      off += 2
      // fill bytes: any number of FFs may precede a marker
      while (marker == 0xff && off < bytes.length) {
        marker = bytes(off) & 0xff; off += 1
      }
      marker match {
        case 0xd9 => fail("EOI before SOS (no image data)")
        case m if m >= 0xd0 && m <= 0xd7 => fail("RST marker outside scan")
        case 0x01 => // TEM, standalone
        case _ =>
          if (off + 2 > bytes.length) fail("truncated segment length")
          val segLen = u16(off)
          if (segLen < 2 || off + segLen > bytes.length)
            fail(f"segment FF$marker%02x length $segLen overruns file")
          val body = off + 2
          val bodyLen = segLen - 2
          marker match {
            case 0xdb => // DQT: one or more tables
              var p = body
              while (p < body + bodyLen) {
                val pq = (bytes(p) & 0xff) >> 4
                val tq = bytes(p) & 0x0f
                if (pq != 0) fail("16-bit quantization tables unsupported")
                if (tq > 3) fail(s"quant table id $tq")
                if (p + 1 + 64 > body + bodyLen) fail("DQT overruns segment")
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) {
                  t(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1
                }
                qtabs(tq) = t
                p += 65
              }
            case 0xc4 => // DHT: one or more tables
              var p = body
              while (p < body + bodyLen) {
                val tc = (bytes(p) & 0xff) >> 4
                val th = bytes(p) & 0x0f
                if (tc > 1 || th > 3) fail(s"huffman table class $tc id $th")
                if (p + 17 > body + bodyLen) fail("DHT overruns segment")
                val counts = (0 until 16).map(i => bytes(p + 1 + i) & 0xff)
                  .toArray
                val n = counts.sum
                if (p + 17 + n > body + bodyLen) fail("DHT symbols overrun")
                val syms = (0 until n).map(i => bytes(p + 17 + i) & 0xff)
                  .toArray
                val h = new Huff(counts, syms)
                if (tc == 0) dcTabs(th) = h else acTabs(th) = h
                p += 17 + n
              }
            case 0xc0 => // SOF0: baseline
              if (comps != null) fail("duplicate SOF")
              if (bodyLen < 6) fail(s"SOF0 body too short ($bodyLen bytes)")
              val prec = bytes(body) & 0xff
              if (prec != 8) fail(s"unsupported sample precision $prec")
              height = u16(body + 1); width = u16(body + 3)
              if (width < 1 || height < 1 ||
                  width > (1 << 16) - 1 || height > (1 << 16) - 1)
                fail(s"bad dimensions ${width}x$height")
              // area cap BEFORE any dimension-derived allocation: a
              // 25-byte hostile header must not OOM the executor
              if (width.toLong * height > (1L << 26))
                fail(s"image area ${width}x$height exceeds the " +
                  s"${1 << 26}-pixel decode cap")
              val nc = bytes(body + 5) & 0xff
              if (nc != 1 && nc != 3)
                fail(s"unsupported component count $nc (only 1 or 3)")
              if (bodyLen < 6 + 3 * nc)
                fail(s"SOF0 body $bodyLen bytes for $nc components")
              comps = (0 until nc).map { i =>
                val o = body + 6 + 3 * i
                val id = bytes(o) & 0xff
                val hv = bytes(o + 1) & 0xff
                val tq = bytes(o + 2) & 0xff
                if (tq > 3) fail(s"component $id quant table id $tq")
                Component(id, hv >> 4, hv & 0x0f, tq)
              }.toArray
              if (nc == 1) {
                // a single-component scan is NON-interleaved per
                // T.81 A.2.3: one data unit per MCU in raster order,
                // whatever sampling factors the header declares —
                // normalizing to 1x1 gives exactly that layout (and
                // keeps a declared 0 factor from dividing by zero)
                comps(0) = comps(0).copy(h = 1, v = 1)
              } else {
                val hs = comps.map(_.h).toSeq
                val vs = comps.map(_.v).toSeq
                val ok =
                  (hs == Seq(1, 1, 1) && vs == Seq(1, 1, 1)) || // 4:4:4
                  (hs == Seq(2, 1, 1) && vs == Seq(2, 1, 1)) || // 4:2:0
                  (hs == Seq(2, 1, 1) && vs == Seq(1, 1, 1))    // 4:2:2
                if (!ok) fail(s"unsupported sampling " +
                  comps.map(c => s"${c.h}x${c.v}").mkString(","))
              }
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              fail(f"unsupported SOF type FF$marker%02x " +
                "(only baseline sequential FFC0)")
            case 0xdd => // DRI: Lr=4 -> a 2-byte restart interval body
              if (bodyLen < 2) fail("DRI too short")
              restartInterval = u16(body)
            case 0xda => // SOS
              if (comps == null) fail("SOS before SOF")
              if (bodyLen < 1) fail("SOS body empty")
              val ns = bytes(body) & 0xff
              if (ns != comps.length)
                fail(s"scan has $ns components, frame ${comps.length} " +
                  "(multi-scan images unsupported)")
              if (bodyLen < 1 + 2 * ns + 3)
                fail(s"SOS body $bodyLen bytes for $ns components")
              var i = 0
              while (i < ns) {
                val cid = bytes(body + 1 + 2 * i) & 0xff
                val tt = bytes(body + 2 + 2 * i) & 0xff
                if ((tt >> 4) > 3 || (tt & 0x0f) > 3)
                  fail(s"component $cid huffman table ids ${tt >> 4}/" +
                    s"${tt & 0x0f}")
                val c = comps.find(_.id == cid)
                  .getOrElse(fail(s"scan names unknown component $cid"))
                c.dcTable = tt >> 4; c.acTable = tt & 0x0f
                i += 1
              }
              sosAt = body + 1 + 2 * ns + 3 // skip Ss/Se/Ah/Al
            case _ => // APPn, COM, unknown: skip by declared length
          }
          off = body + bodyLen
      }
    }

    comps.foreach { c =>
      if (qtabs(c.tq) == null) fail(s"component ${c.id} quant table " +
        s"${c.tq} never defined")
      if (dcTabs(c.dcTable) == null || acTabs(c.acTable) == null)
        fail(s"component ${c.id} huffman tables not defined")
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH

    // per-component sample planes at their OWN resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    // cap the TOTAL allocation (planes + output), not just the pixel
    // count: a 3-component image allocates 4x its pixel count in ints,
    // and the guard exists so a hostile header cannot budget
    // hundreds of MB before the first entropy byte is validated.
    // 2^26 ints = 256 MB worst case — a 4096x4096 4:4:4 image fits
    // exactly; anything bigger is not feature-pipeline material.
    val totalInts = comps.indices.map(i =>
      planeW(i).toLong * planeH(i)).sum + width.toLong * height
    if (totalInts > (1L << 26))
      fail(s"decode would allocate $totalInts ints for " +
        s"${width}x$height x${comps.length} (cap ${1L << 26})")
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray

    val br = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64)
    val spatial = new Array[Double](64)
    val dctTmp = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.consumeRst()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qtabs(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // decode one block
            java.util.Arrays.fill(coef, 0)
            val t = br.decodeSym(dcTabs(c.dcTable))
            if (t > 11) fail(s"DC size $t out of range")
            c.pred += br.receiveExtend(t)
            coef(0) = c.pred * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decodeSym(acTabs(c.acTable))
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64          // EOB
              } else {
                k += r
                if (k > 63) fail("AC run past end of block")
                coef(Zigzag(k)) = br.receiveExtend(s) * q(Zigzag(k))
                k += 1
              }
            }
            idct(coef, spatial, dctTmp)
            // place into the component plane (level shift here)
            val x0 = (mx * c.h + bx) * 8
            val y0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((y0 + yy) * pw + (x0 + xx)) =
                  clamp8(spatial(yy * 8 + xx) + 128.0)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // color conversion + chroma upsampling (sample replication)
    val px = new Array[Int](width * height)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          px(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val yw = planeW(0)
      val cw = planeW(1)
      val sx = hMax / comps(1).h // chroma subsample factors
      val sy = vMax / comps(1).v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)(y * yw + x).toDouble
          val cb = planes(1)((y / sy) * cw + (x / sx)) - 128.0
          val cr = planes(2)((y / sy) * cw + (x / sx)) - 128.0
          val r = clamp8(yy + 1.402 * cr)
          val g = clamp8(yy - 0.344136 * cb - 0.714136 * cr)
          val b = clamp8(yy + 1.772 * cb)
          px(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    Bmp.Image(width, height, px)
  }

  def tryDecode(bytes: Array[Byte]): Option[Bmp.Image] =
    try Some(decode(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  // ---- encoder (baseline 4:4:4, Annex K tables) ----

  /** Canonical Huffman ENCODE table: symbol -> (code, length). */
  private final class HuffEnc(counts: Array[Int], syms: Array[Int]) {
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          codeOf(syms(k)) = code; sizeOf(syms(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private lazy val dcLumaEnc = new HuffEnc(DcLumaCounts, DcLumaSyms)
  private lazy val acLumaEnc = new HuffEnc(AcLumaCounts, AcLumaSyms)
  private lazy val dcChromaEnc = new HuffEnc(DcChromaCounts, DcChromaSyms)
  private lazy val acChromaEnc = new HuffEnc(AcChromaCounts, AcChromaSyms)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      if (n > 0) {
        acc <<= (8 - n)
        acc |= (1 << (8 - n)) - 1 // pad with 1s per spec
        out.write(acc & 0xff)
        if ((acc & 0xff) == 0xff) out.write(0x00)
        acc = 0; n = 0
      }
    }
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one level-shifted spatial block against (q, dc, ac);
    * returns the new DC predictor. */
  private def encodeBlock(block: Array[Double], q: Array[Int], pred: Int,
      dc: HuffEnc, ac: HuffEnc, bw: BitWriter,
      f: Array[Double], zz: Array[Int], tmp: Array[Double]): Int = {
    fdct(block, f, tmp)
    var i = 0
    while (i < 64) {
      val nat = Zigzag(i)
      zz(i) = math.round(f(nat) / q(nat)).toInt
      i += 1
    }
    val diff = zz(0) - pred
    val s = magnitude(diff)
    bw.put(dc.codeOf(s), dc.sizeOf(s))
    if (s > 0) {
      val bits = if (diff < 0) diff + (1 << s) - 1 else diff
      bw.put(bits, s)
    }
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.put(ac.codeOf(0xf0), ac.sizeOf(0xf0)); run -= 16 }
        val sz = magnitude(zz(k))
        val rs = (run << 4) | sz
        bw.put(ac.codeOf(rs), ac.sizeOf(rs))
        val bits = if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k)
        bw.put(bits, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.codeOf(0x00), ac.sizeOf(0x00)) // EOB
    zz(0)
  }

  /** Encode top-down 0xRRGGBB pixels as baseline 4:4:4 YCbCr JPEG with
    * the Annex K tables. Deterministic: fixed tables, fixed loops. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width >= 1 && height >= 1 && width < (1 << 16) &&
      height < (1 << 16), s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }

    m(0xd8) // SOI
    // DQT x2
    m(0xdb); u16(2 + 65)
    out.write(0x00) // pq=0, tq=0
    var i = 0
    while (i < 64) { out.write(QLuma(Zigzag(i))); i += 1 }
    m(0xdb); u16(2 + 65)
    out.write(0x01)
    i = 0
    while (i < 64) { out.write(QChroma(Zigzag(i))); i += 1 }
    // SOF0: 3 components, all 1x1 (4:4:4)
    m(0xc0); u16(8 + 3 * 3)
    out.write(8); u16(height); u16(width); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y, q0
    out.write(2); out.write(0x11); out.write(1) // Cb, q1
    out.write(3); out.write(0x11); out.write(1) // Cr, q1
    // DHT x4
    def dht(tc: Int, th: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + syms.length)
      out.write((tc << 4) | th)
      counts.foreach(out.write)
      syms.foreach(out.write)
    }
    dht(0, 0, DcLumaCounts, DcLumaSyms)
    dht(1, 0, AcLumaCounts, AcLumaSyms)
    dht(0, 1, DcChromaCounts, DcChromaSyms)
    dht(1, 1, AcChromaCounts, AcChromaSyms)
    // SOS
    m(0xda); u16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl

    // entropy-coded data: 4:4:4 MCU = one block per component
    val bw = new BitWriter(out)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val yB = new Array[Double](64)
    val cbB = new Array[Double](64)
    val crB = new Array[Double](64)
    val f = new Array[Double](64)
    val zz = new Array[Int](64)
    val tmp = new Array[Double](64)
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            // edge blocks replicate the last row/column (standard pad)
            val sy = math.min(my * 8 + yy, height - 1)
            val sx = math.min(mx * 8 + xx, width - 1)
            val p = pixels(sy * width + sx)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
            val b = p & 0xff
            val o = yy * 8 + xx
            yB(o) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbB(o) = -0.168736 * r - 0.331264 * g + 0.5 * b
            crB(o) = 0.5 * r - 0.418688 * g - 0.081312 * b
            xx += 1
          }
          yy += 1
        }
        predY = encodeBlock(yB, QLuma, predY, dcLumaEnc, acLumaEnc, bw,
          f, zz, tmp)
        predCb = encodeBlock(cbB, QChroma, predCb, dcChromaEnc,
          acChromaEnc, bw, f, zz, tmp)
        predCr = encodeBlock(crB, QChroma, predCr, dcChromaEnc,
          acChromaEnc, bw, f, zz, tmp)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Cheap magic sniff: SOI followed by another marker byte. */
  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff
}
