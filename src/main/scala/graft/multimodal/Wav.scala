package graft.multimodal

/** From-scratch RIFF/WAVE codec — no external media libraries.
  *
  * Supports the formats a training-data audio pipeline actually stores:
  * uncompressed PCM (format tag 1), 8-bit unsigned or 16-bit signed
  * little-endian, any channel count and sample rate — plus COMPRESSED
  * 4-bit IMA ADPCM (format tag 17) via the from-scratch [[ImaAdpcm]]
  * block codec, with `fact`-chunk frame trimming. The decoder is a
  * proper chunk walk (skips unknown chunks such as LIST/INFO, honors
  * the spec's even-byte chunk padding), not a fixed-offset read —
  * real-world WAV files routinely carry metadata chunks before `data`.
  *
  * All samples are surfaced as 16-bit signed (8-bit input is expanded
  * with `((b & 0xff) - 128) << 8`), so downstream feature math is
  * width-independent.
  *
  * Decode errors throw [[IllegalArgumentException]] with a message
  * naming the offending structure; [[Wav.tryDecode]] converts that to
  * `None` for pipelines where one corrupt asset must not kill the job.
  */
object Wav {

  /** Decoded PCM audio: interleaved 16-bit samples. `frames` =
    * samples.length / channels. */
  final case class Audio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Short]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WAV decode: $msg")

  // little-endian header writers shared by the PCM and ADPCM encoders
  private def putTag(out: Array[Byte], o: Int, s: String): Unit = {
    val a = s.getBytes("US-ASCII"); System.arraycopy(a, 0, out, o, 4)
  }
  private def put16(out: Array[Byte], o: Int, v: Int): Unit = {
    out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put32(out: Array[Byte], o: Int, v: Long): Unit = {
    out(o) = (v & 0xff).toByte
    out(o + 1) = ((v >> 8) & 0xff).toByte
    out(o + 2) = ((v >> 16) & 0xff).toByte
    out(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Encode interleaved 16-bit PCM as a canonical 44-byte-header WAV. */
  def encode(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF"); put32(out, 4, 36L + dataLen); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); put32(out, 16, 16L)
    put16(out, 20, 1); put16(out, 22, channels); put32(out, 24, sampleRate.toLong)
    put32(out, 28, sampleRate.toLong * channels * 2)  // byte rate
    put16(out, 32, channels * 2)                      // block align
    put16(out, 34, 16)                                // bits per sample
    putTag(out, 36, "data"); put32(out, 40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Encode interleaved 16-bit PCM as a compressed IMA ADPCM WAV
    * (format tag 17, 4 bits/sample — 4x smaller than [[encode]]'s PCM
    * output): fmt chunk with the ADPCM extension (cbSize +
    * samplesPerBlock), a `fact` chunk carrying the true frame count
    * (so decode trims the final block's pad frames), then the block
    * data from [[ImaAdpcm.encode]]. */
  def encodeAdpcm(samples: Array[Short], sampleRate: Int,
      channels: Int, framesPerBlock: Int = 505): Array[Byte] = {
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    // both land in u16 fmt fields — an unchecked overflow would wrap
    // silently and emit a self-undecodable header
    require(framesPerBlock <= 0xffff,
      s"framesPerBlock $framesPerBlock exceeds the fmt chunk's u16 field")
    val (blocks, blockAlign, totalFrames) =
      ImaAdpcm.encode(samples, channels, framesPerBlock)
    require(blockAlign <= 0xffff,
      s"block align $blockAlign ($channels channel(s) x $framesPerBlock " +
        "frames/block) exceeds the fmt chunk's u16 field")
    val out = new Array[Byte](12 + 28 + 12 + 8 + blocks.length)
    putTag(out, 0, "RIFF"); put32(out, 4, (out.length - 8).toLong); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); put32(out, 16, 20L)           // 16 base + 2 cbSize + 2 ext
    put16(out, 20, 17); put16(out, 22, channels)           // IMA ADPCM
    put32(out, 24, sampleRate.toLong)
    // average byte rate: one block of blockAlign bytes per
    // framesPerBlock frames (integer approximation, informational)
    put32(out, 28, sampleRate.toLong * blockAlign / framesPerBlock)
    put16(out, 32, blockAlign)
    put16(out, 34, 4)                                 // bits per sample
    put16(out, 36, 2)                                 // cbSize
    put16(out, 38, framesPerBlock)                    // samplesPerBlock
    putTag(out, 40, "fact"); put32(out, 44, 4L); put32(out, 48, totalFrames.toLong)
    putTag(out, 52, "data"); put32(out, 56, blocks.length.toLong)
    System.arraycopy(blocks, 0, out, 60, blocks.length)
    out
  }

  /** Chunk-walking PCM decoder. */
  def decode(bytes: Array[Byte]): Audio = {
    if (bytes.length < 12) fail(s"file too short (${bytes.length} bytes)")
    if (tag(bytes, 0) != "RIFF") fail("missing RIFF magic")
    if (tag(bytes, 8) != "WAVE") fail("missing WAVE form type")
    var off = 12
    var fmtSeen = false
    var audioFormat = 0
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var blockAlign = 0
    var factFrames = -1
    var data: Array[Byte] = null
    // PCM stops at the data chunk (trailing bytes after it are common
    // and harmless); a compressed stream keeps walking until the fact
    // chunk is found — some writers place it AFTER data, and without
    // it the final block's pad frames would leak into the output
    def walkDone: Boolean =
      data != null && (audioFormat != 17 || factFrames >= 0)
    while (off + 8 <= bytes.length && !walkDone) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      if (size > Int.MaxValue || off + 8 + size > bytes.length)
        fail(s"chunk '$id' size $size overruns file (${bytes.length} bytes)")
      val body = off + 8
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size bytes)")
          audioFormat = u16(bytes, body)
          channels = u16(bytes, body + 2)
          sampleRate = u32(bytes, body + 4).toInt
          blockAlign = u16(bytes, body + 12)
          bits = u16(bytes, body + 14)
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt chunk")
          data = java.util.Arrays.copyOfRange(bytes, body,
            body + size.toInt)
        case "fact" =>
          // total frame count — compressed formats use it to mark where
          // the final block's padding starts
          if (size < 4) fail(s"fact chunk too short ($size bytes)")
          val n = u32(bytes, body)
          if (n > Int.MaxValue) fail(s"fact frame count $n too large")
          factFrames = n.toInt
        case _ => // LIST, INFO, ... — skip
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off = body + size.toInt + (size.toInt & 1)
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    if (audioFormat != 1 && audioFormat != 17)
      fail(s"unsupported format tag $audioFormat (only PCM=1, IMA ADPCM=17)")
    if (channels < 1) fail(s"invalid channel count $channels")
    if (sampleRate < 1) fail(s"invalid sample rate $sampleRate")
    if (audioFormat == 17) {
      // compressed path: 4-bit IMA ADPCM blocks -> 16-bit PCM
      if (bits != 4) fail(s"IMA ADPCM requires 4 bits per sample, got $bits")
      val samples =
        try ImaAdpcm.decode(data, channels, blockAlign, factFrames)
        catch {
          case e: IllegalArgumentException =>
            fail(e.getMessage.stripPrefix("ADPCM decode: "))
        }
      return Audio(sampleRate, channels, 4, samples)
    }
    bits match {
      case 16 =>
        if (data.length % 2 != 0) fail("odd data length for 16-bit PCM")
        val n = data.length / 2
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          s(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
          i += 1
        }
        Audio(sampleRate, channels, 16, s)
      case 8 =>
        val s = new Array[Short](data.length)
        var i = 0
        while (i < data.length) {
          s(i) = (((data(i) & 0xff) - 128) << 8).toShort
          i += 1
        }
        Audio(sampleRate, channels, 8, s)
      case b => fail(s"unsupported bit depth $b (only 8/16)")
    }
  }

  def tryDecode(bytes: Array[Byte]): Option[Audio] =
    try Some(decode(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  /** Fixed-stride frame sampler — real samples, not metadata: keeps
    * frames 0, k, 2k, … with ALL channels of each kept frame
    * (interleaving preserved). This is decimation without an
    * anti-alias filter — the frame-exemplar shape a training pipeline
    * wants, not a hi-fi resampler — so the declared sample rate scales
    * down by the same stride (floored at 1). Deterministic: pure index
    * arithmetic, no float math. */
  def sampleEveryK(a: Audio, k: Int): Audio = {
    require(k >= 1, s"stride must be >= 1, got $k")
    val ch = math.max(a.channels, 1)
    if (k == 1) {
      // decode accepts a data chunk that does not divide into whole
      // frames; a partial trailing frame is not a frame to keep, and
      // encode (rightly) refuses misaligned sample arrays — normalize
      // here so the k=1 path cannot leak the tail downstream
      return if (a.samples.length % ch == 0) a
      else Audio(a.sampleRate, a.channels, a.bitsPerSample,
        java.util.Arrays.copyOf(a.samples, a.frames * ch))
    }
    val kept = (a.frames + k - 1) / k
    val out = new Array[Short](kept * ch)
    var f = 0
    while (f < kept) {
      System.arraycopy(a.samples, f * k * ch, out, f * ch, ch)
      f += 1
    }
    Audio(math.max(1, a.sampleRate / k), a.channels, a.bitsPerSample, out)
  }

  /** True if the payload carries the RIFF/WAVE magic — a cheap sniff
    * that avoids the exception path for clearly-non-WAV payloads. */
  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE"
}
