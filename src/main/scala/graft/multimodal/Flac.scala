package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** From-scratch FLAC codec — the LOSSLESS-AUDIO compression family
  * behind the `looksLike`/`tryDecode` seam (the fourth family beside
  * DEFLATE/PNG, DCT/JPEG, LZW/GIF, and ADPCM/WAV): linear prediction +
  * Golomb-Rice entropy coding, implemented from the published format
  * (RFC 9639 / the classic flac format spec). Chosen over MPEG-1
  * Layer II deliberately: FLAC is fully ALGORITHMIC — fixed-predictor
  * coefficients, Rice coding, UTF-8-style frame numbers, and both CRCs
  * are all formulas, so every constant in this file is derivable from
  * the spec text; Layer II's polyphase synthesis window is a 512-entry
  * published TABLE that cannot be reproduced from first principles,
  * and a hand-typed table without the document at hand is exactly the
  * fabricated-constant risk this codebase refuses.
  *
  * Decode supports the interchange subset the pipeline meets: 16-bit
  * samples, 1-2 channels, all four channel assignments (independent,
  * left/side, right/side, mid/side), CONSTANT / VERBATIM / FIXED
  * (orders 0-4) / LPC subframes, both Rice methods with escape
  * partitions, wasted bits, fixed and variable blocking strategies.
  * Every frame's CRC-8 (header) and CRC-16 (frame) is verified, as is
  * the streaminfo declared sample count when present. Decoded audio
  * surfaces as [[Wav.Audio]] so [[Multimodal.audioFeatures]] and
  * [[Wav.sampleEveryK]] compose unchanged across audio codecs.
  *
  * Encode emits a canonical minimal writer: streaminfo + 4096-sample
  * frames, per channel the cheapest of CONSTANT / FIXED order-2 with
  * one Rice partition / VERBATIM — deterministic (no RNG, no float),
  * so repeated encodes are byte-identical and payload-derived hashes
  * are stable across partitions.
  *
  * Decode errors throw [[IllegalArgumentException]] naming the
  * offending structure; [[Flac.tryDecode]] maps that to `None`.
  */
object Flac {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"FLAC decode: $msg")

  /** total-sample allocation budget, same posture as the image codecs'
    * 2^26-pixel cap: a tiny hostile header must not provoke a
    * multi-GB allocation */
  private val MaxTotalSamples = 1 << 26

  // ---- CRCs (MSB-first, init 0): CRC-8 poly x^8+x^2+x+1 = 0x07,
  // CRC-16 poly x^16+x^15+x^2+1 = 0x8005 ----

  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- big-endian bit reader ----

  private final class BitReader(val data: Array[Byte], var pos: Int) {
    var bitPos = 0 // bits consumed of data(pos), MSB first

    def bytePosition: Int = pos

    def aligned: Boolean = bitPos == 0

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }

    def readBit(): Int = {
      if (pos >= data.length) fail("bitstream truncated")
      val bit = (data(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      bit
    }

    /** n <= 32 unsigned bits */
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** n-bit two's-complement signed value (n >= 1) */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 32) v
      else if ((v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }

    /** unary: zeros terminated by a one, returns the zero count */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (data.length.toLong * 8)) fail("runaway unary code")
      }
      q
    }
  }

  // ---- decode ----

  private val Magic = Array[Byte]('f', 'L', 'a', 'C')

  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  private final case class StreamInfo(sampleRate: Int, channels: Int,
      bps: Int, totalSamples: Long)

  private def readStreamInfo(bytes: Array[Byte]): (StreamInfo, Int) = {
    if (bytes.length < 4) fail("file too short")
    if (!looksLike(bytes)) fail("missing fLaC magic")
    var off = 4
    var si: StreamInfo = null
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) fail("truncated metadata block header")
      val h = bytes(off) & 0xff
      last = (h & 0x80) != 0
      val blockType = h & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      off += 4
      // Long arithmetic: for a ~2 GB payload, off + len can wrap Int
      // and the overrun check would pass with a negative off (AIOOBE
      // escaping tryDecode's contract — r14 review finding)
      if (off.toLong + len > bytes.length)
        fail(s"metadata block overruns file ($len bytes at $off)")
      if (blockType == 0) {
        if (si != null) fail("duplicate STREAMINFO")
        if (len != 34) fail(s"STREAMINFO length $len, expected 34")
        val br = new BitReader(bytes, off)
        br.readBits(16) // min block size
        br.readBits(16) // max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        val rate = br.readBits(20)
        val channels = br.readBits(3) + 1
        val bps = br.readBits(5) + 1
        val total = br.readBitsLong(36)
        if (rate == 0) fail("sample rate 0")
        si = StreamInfo(rate, channels, bps, total)
      } else if (blockType == 127) fail("invalid metadata block type 127")
      off += len
    }
    if (si == null) fail("no STREAMINFO block")
    (si, off)
  }

  /** blockSize-code resolution; codes 6 and 7 read trailing bytes */
  private def blockSizeOf(code: Int, br: BitReader): Int = code match {
    case 0 => fail("reserved block size code 0")
    case 1 => 192
    case n if n >= 2 && n <= 5 => 576 << (n - 2)
    case 6 => br.readBits(8) + 1
    case 7 => br.readBits(16) + 1
    case n => 256 << (n - 8)
  }

  private def sampleRateOf(code: Int, si: StreamInfo, br: BitReader): Int =
    code match {
      case 0 => si.sampleRate
      case 1 => 88200
      case 2 => 176400
      case 3 => 192000
      case 4 => 8000
      case 5 => 16000
      case 6 => 22050
      case 7 => 24000
      case 8 => 32000
      case 9 => 44100
      case 10 => 48000
      case 11 => 96000
      case 12 => br.readBits(8) * 1000
      case 13 => br.readBits(16)
      case 14 => br.readBits(16) * 10
      case _ => fail("invalid sample rate code 15")
    }

  private def sampleSizeOf(code: Int, si: StreamInfo): Int = code match {
    case 0 => si.bps
    case 1 => 8
    case 2 => 12
    case 4 => 16
    case 5 => 20
    case 6 => 24
    case 7 => 32
    case _ => fail(s"reserved sample size code $code")
  }

  /** the UTF-8-style coded frame/sample number (up to 36 bits) */
  private def readCodedNumber(br: BitReader): Long = {
    val b0 = br.readBits(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var cont = 0
    var probe = b0
    while ((probe & 0x40) != 0) { cont += 1; probe <<= 1 }
    if (cont == 0 || cont > 6) fail(f"malformed coded number lead $b0%02x")
    var v = (b0 & (0x3f >> cont)).toLong
    var i = 0
    while (i < cont) {
      val b = br.readBits(8)
      if ((b & 0xc0) != 0x80) fail(f"malformed coded number byte $b%02x")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  /** one channel's subframe: `bps` already includes any inter-channel
    * side-channel bit */
  private def readSubframe(br: BitReader, blockSize: Int,
      bps0: Int): Array[Int] = {
    if (br.readBit() != 0) fail("subframe padding bit set")
    val tpe = br.readBits(6)
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1
      else 0
    if (wasted >= bps0) fail(s"wasted bits $wasted >= bit depth $bps0")
    val bps = bps0 - wasted
    val out = new Array[Int](blockSize)

    def readResidual(order: Int): Unit = {
      val method = br.readBits(2)
      if (method > 1) fail(s"reserved residual coding method $method")
      val paramBits = if (method == 0) 4 else 5
      val escape = if (method == 0) 0xf else 0x1f
      val partOrder = br.readBits(4)
      val parts = 1 << partOrder
      if (blockSize % parts != 0)
        fail(s"block size $blockSize not divisible into $parts partitions")
      val perPart = blockSize >> partOrder
      var p = 0
      var idx = order
      while (p < parts) {
        val n = if (p == 0) perPart - order else perPart
        if (n < 0) fail("first partition shorter than predictor order")
        val param = br.readBits(paramBits)
        if (param == escape) {
          val raw = br.readBits(5)
          var i = 0
          while (i < n) {
            out(idx) = if (raw == 0) 0 else br.readSigned(raw)
            idx += 1; i += 1
          }
        } else {
          var i = 0
          while (i < n) {
            val q = br.readUnary()
            val rem = if (param == 0) 0 else br.readBits(param)
            val u = (q.toLong << param) | rem
            // zigzag: even -> u/2, odd -> -(u+1)/2
            val v = ((u >>> 1) ^ -(u & 1L)).toInt
            out(idx) = v
            idx += 1; i += 1
          }
        }
        p += 1
      }
    }

    if (tpe == 0) { // CONSTANT
      val v = br.readSigned(bps)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.readSigned(bps); i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // FIXED, order 0-4
      val order = tpe - 8
      if (order > blockSize) fail(s"fixed order $order > block $blockSize")
      var i = 0
      while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      readResidual(order)
      // fixed-predictor reconstruction: the classic difference formulas
      i = order
      while (i < blockSize) {
        val pred = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case 4 => 4L * out(i - 1) - 6L * out(i - 2) +
            4L * out(i - 3) - out(i - 4)
        }
        out(i) = (out(i) + pred).toInt
        i += 1
      }
    } else if (tpe >= 32) { // LPC, order 1-32
      val order = (tpe & 0x1f) + 1
      if (order > blockSize) fail(s"LPC order $order > block $blockSize")
      var i = 0
      while (i < order) { out(i) = br.readSigned(bps); i += 1 }
      val precM1 = br.readBits(4)
      if (precM1 == 0xf) fail("invalid LPC precision code 15")
      val precision = precM1 + 1
      val shift = br.readSigned(5)
      if (shift < 0) fail(s"negative LPC shift $shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      readResidual(order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) {
          acc += coefs(j).toLong * out(i - 1 - j)
          j += 1
        }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else fail(s"reserved subframe type $tpe")

    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Header-walking, CRC-verified decoder (16-bit, mono/stereo). */
  def decode(bytes: Array[Byte]): Wav.Audio = {
    val (si, firstFrame) = readStreamInfo(bytes)
    if (si.bps != 16)
      fail(s"unsupported bit depth ${si.bps} (the pipeline's PCM is 16-bit)")
    if (si.channels < 1 || si.channels > 2)
      fail(s"unsupported channel count ${si.channels} (1-2)")
    if (si.totalSamples > MaxTotalSamples.toLong)
      fail(s"declared ${si.totalSamples} samples exceeds the " +
        s"$MaxTotalSamples-sample decode cap")

    val acc = new ArrayBuffer[Short]()
    var off = firstFrame
    var frameIdx = 0L       // fixed-blocksize strategy: expected frame number
    var samplePos = 0L      // variable strategy: expected first-sample number
    while (off < bytes.length) {
      val frameStart = off
      val br = new BitReader(bytes, off)
      // frame header
      val sync = br.readBits(14)
      if (sync != 0x3ffe) fail(f"bad frame sync $sync%04x at byte $off")
      if (br.readBit() != 0) fail("frame header reserved bit set")
      val variableBlocking = br.readBit() == 1
      val bsCode = br.readBits(4)
      val srCode = br.readBits(4)
      val chAssign = br.readBits(4)
      val ssCode = br.readBits(3)
      if (br.readBit() != 0) fail("frame header reserved bit 2 set")
      // the coded frame/sample number must match the decode position:
      // a duplicated, dropped, or reordered frame was previously only
      // caught indirectly by the streaminfo total-sample equality — and
      // not at all when streaminfo declares totalSamples = 0 (r14
      // ADVICE). Fixed strategy codes the frame INDEX, variable codes
      // the frame's first SAMPLE number (RFC 9639 §9.1.5).
      val codedNumber = readCodedNumber(br)
      val expectedNumber = if (variableBlocking) samplePos else frameIdx
      if (codedNumber != expectedNumber)
        fail(s"frame ${if (variableBlocking) "sample" else "frame"} " +
          s"number $codedNumber, expected $expectedNumber " +
          s"(duplicated/dropped/reordered frame)")
      val blockSize = blockSizeOf(bsCode, br)
      sampleRateOf(srCode, si, br)
      val bps = sampleSizeOf(ssCode, si)
      if (bps != 16) fail(s"frame bit depth $bps != streaminfo 16")
      if (!br.aligned) fail("frame header not byte-aligned before CRC-8")
      val declaredCrc8 = br.readBits(8)
      val gotCrc8 = crc8(bytes, frameStart, br.bytePosition - 1)
      if (declaredCrc8 != gotCrc8)
        fail(f"frame header CRC-8 mismatch (stored $declaredCrc8%02x, " +
          f"computed $gotCrc8%02x)")

      val channels = chAssign match {
        case n if n <= 7 => n + 1
        case 8 | 9 | 10 => 2
        case n => fail(s"reserved channel assignment $n")
      }
      if (channels != si.channels)
        fail(s"frame channels $channels != streaminfo ${si.channels}")
      if (acc.length.toLong + blockSize.toLong * channels > MaxTotalSamples)
        fail(s"decoded samples exceed the $MaxTotalSamples-sample cap")

      // subframes: side channels carry one extra bit
      val chans = Array.tabulate(channels) { c =>
        val extra = chAssign match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // right/side: side first
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        readSubframe(br, blockSize, 16 + extra)
      }
      // stereo decorrelation
      chAssign match {
        case 8 => // ch0 = left, ch1 = side = L - R
          var i = 0
          while (i < blockSize) {
            chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
          }
        case 9 => // ch0 = side = L - R, ch1 = right
          var i = 0
          while (i < blockSize) {
            val r = chans(1)(i)
            chans(1)(i) = r
            chans(0)(i) = r + chans(0)(i)
            i += 1
          }
        case 10 => // ch0 = mid = (L+R)>>1, ch1 = side = L - R
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            val mid = (chans(0)(i) << 1) | (side & 1)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }

      br.alignToByte()
      if (br.bytePosition + 2 > bytes.length) fail("frame footer truncated")
      val declaredCrc16 = ((bytes(br.bytePosition) & 0xff) << 8) |
        (bytes(br.bytePosition + 1) & 0xff)
      val gotCrc16 = crc16(bytes, frameStart, br.bytePosition)
      if (declaredCrc16 != gotCrc16)
        fail(f"frame CRC-16 mismatch (stored $declaredCrc16%04x, " +
          f"computed $gotCrc16%04x)")
      off = br.bytePosition + 2

      // interleave and range-check: a decoded value outside 16-bit
      // range is a corrupt stream, not a clampable nuisance
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < channels) {
          val v = chans(c)(i)
          if (v < Short.MinValue || v > Short.MaxValue)
            fail(s"sample $v outside 16-bit range")
          acc += v.toShort
          c += 1
        }
        i += 1
      }
      frameIdx += 1
      samplePos += blockSize.toLong
    }

    if (si.totalSamples > 0 &&
        acc.length.toLong != si.totalSamples * si.channels)
      fail(s"decoded ${acc.length / si.channels} frames, streaminfo " +
        s"declares ${si.totalSamples}")
    if (acc.isEmpty) fail("no audio frames")
    Wav.Audio(si.sampleRate, si.channels, 16, acc.toArray)
  }

  def tryDecode(bytes: Array[Byte]): Option[Wav.Audio] =
    try Some(decode(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  // ---- encode ----

  private final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }

    def alignZero(): Unit = while (nBits != 0) writeBit(0)

    def bytes: Array[Byte] = { alignZero(); out.toArray }
  }

  private def riceCost(residual: Array[Int], from: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < residual.length) {
      val v = residual(i)
      val u = (v.toLong << 1) ^ (v.toLong >> 63)
      bits += (u >>> k) + 1 + k
      i += 1
    }
    bits
  }

  /** Encode interleaved 16-bit PCM as a canonical FLAC: streaminfo +
    * 4096-sample frames, per channel CONSTANT / FIXED-order-2 (one
    * Rice partition, best k in 0..14) / VERBATIM, whichever is
    * smallest. Deterministic byte output. */
  def encode(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels (1-2)")
    require(sampleRate > 0 && sampleRate < (1 << 20),
      s"bad sample rate $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val frames = samples.length / channels
    require(frames > 0, "no samples")
    // same budget as decode's cap; also keeps frameIdx < 2^14, far
    // inside the 1-3 byte coded-number forms written below (the
    // 4-byte+ forms are not implemented — r14 review finding)
    require(frames.toLong * channels <= MaxTotalSamples,
      s"$frames frames x $channels channels exceeds the " +
        s"$MaxTotalSamples-sample encode cap (decode's budget)")

    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    // STREAMINFO as the single, last metadata block
    val siw = new BitWriter
    val blockSamples = 4096
    // declared min/max block size stays 4096 even for short streams:
    // the format floor for these fields is 16, and the spec excludes
    // the (permitted-shorter) last frame from the minimum — declaring
    // min(4096, frames) would write a nonconformant value for tiny
    // inputs (r14 review finding)
    siw.writeBits(blockSamples.toLong, 16) // min block
    siw.writeBits(blockSamples.toLong, 16) // max block
    siw.writeBits(0L, 24); siw.writeBits(0L, 24) // frame sizes unknown
    siw.writeBits(sampleRate.toLong, 20)
    siw.writeBits((channels - 1).toLong, 3)
    siw.writeBits(15L, 5) // bps - 1
    siw.writeBits(frames.toLong, 36)
    siw.writeBits(0L, 64); siw.writeBits(0L, 64) // md5 unset (zeros)
    val siBytes = siw.bytes
    out.write(0x80) // last block, type 0
    out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)

    var frameIdx = 0
    var start = 0
    while (start < frames) {
      val n = math.min(blockSamples, frames - start)
      val fw = new BitWriter
      fw.writeBits(0x3ffe, 14) // sync
      fw.writeBit(0) // reserved
      fw.writeBit(0) // fixed blocking strategy
      fw.writeBits(7, 4) // block size: 16-bit at end
      fw.writeBits(0, 4) // sample rate: streaminfo
      fw.writeBits((channels - 1).toLong, 4) // independent channels
      fw.writeBits(4, 3) // sample size 16
      fw.writeBit(0) // reserved
      // UTF-8-coded frame number
      if (frameIdx < 0x80) fw.writeBits(frameIdx.toLong, 8)
      else if (frameIdx < 0x800) {
        fw.writeBits(0xc0L | (frameIdx >> 6), 8)
        fw.writeBits(0x80L | (frameIdx & 0x3f), 8)
      } else {
        fw.writeBits(0xe0L | (frameIdx >> 12), 8)
        fw.writeBits(0x80L | ((frameIdx >> 6) & 0x3f), 8)
        fw.writeBits(0x80L | (frameIdx & 0x3f), 8)
      }
      fw.writeBits((n - 1).toLong, 16) // block size minus 1
      val headerSoFar = fw.bytes
      val hdrCrc = crc8(headerSoFar, 0, headerSoFar.length)

      val body = new BitWriter
      var c = 0
      while (c < channels) {
        val ch = new Array[Int](n)
        var i = 0
        while (i < n) { ch(i) = samples((start + i) * channels + c); i += 1 }
        writeSubframe(body, ch)
        c += 1
      }
      val bodyBytes = body.bytes // zero-padded to byte boundary per spec

      val frameBytes = new java.io.ByteArrayOutputStream()
      frameBytes.write(headerSoFar, 0, headerSoFar.length)
      frameBytes.write(hdrCrc)
      frameBytes.write(bodyBytes, 0, bodyBytes.length)
      val fb = frameBytes.toByteArray
      val fCrc = crc16(fb, 0, fb.length)
      out.write(fb, 0, fb.length)
      out.write((fCrc >> 8) & 0xff); out.write(fCrc & 0xff)

      frameIdx += 1
      start += n
    }
    out.toByteArray
  }

  private def writeSubframe(w: BitWriter, ch: Array[Int]): Unit = {
    val n = ch.length
    var allSame = true
    var i = 1
    while (i < n && allSame) { allSame = ch(i) == ch(0); i += 1 }
    if (allSame) {
      w.writeBit(0); w.writeBits(0, 6); w.writeBit(0) // CONSTANT, no waste
      w.writeBits((ch(0) & 0xffff).toLong, 16)
      return
    }
    // fixed order-2 residual (order falls back below block size)
    val order = if (n > 2) 2 else 0
    val res = new Array[Int](n)
    i = order
    while (i < n) {
      val pred = if (order == 2) 2L * ch(i - 1) - ch(i - 2) else 0L
      val d = ch(i) - pred
      if (d < Int.MinValue.toLong || d > Int.MaxValue.toLong)
        return writeVerbatim(w, ch)
      res(i) = d.toInt
      i += 1
    }
    var bestK = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val cost = riceCost(res, order, k)
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    val fixedBits = 2L + 6 + 16L * order + 2 + 4 + 4 + bestCost
    if (fixedBits >= 8L + 16L * n) return writeVerbatim(w, ch)
    w.writeBit(0); w.writeBits((8 + order).toLong, 6); w.writeBit(0)
    i = 0
    while (i < order) { w.writeBits((ch(i) & 0xffff).toLong, 16); i += 1 }
    w.writeBits(0, 2) // rice method 0 (4-bit params)
    w.writeBits(0, 4) // partition order 0
    w.writeBits(bestK.toLong, 4)
    i = order
    while (i < n) {
      val v = res(i)
      val u = (v.toLong << 1) ^ (v.toLong >> 63)
      val q = (u >>> bestK).toInt
      var j = 0
      while (j < q) { w.writeBit(0); j += 1 }
      w.writeBit(1)
      if (bestK > 0) w.writeBits(u & ((1L << bestK) - 1), bestK)
      i += 1
    }
  }

  private def writeVerbatim(w: BitWriter, ch: Array[Int]): Unit = {
    w.writeBit(0); w.writeBits(1, 6); w.writeBit(0)
    var i = 0
    while (i < ch.length) { w.writeBits((ch(i) & 0xffff).toLong, 16); i += 1 }
  }
}
