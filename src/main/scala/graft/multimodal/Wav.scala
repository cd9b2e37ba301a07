package graft.multimodal

/** From-scratch RIFF/WAVE PCM codec — no external media libraries.
  *
  * Supports the format a training-data audio pipeline actually stores:
  * uncompressed PCM (format tag 1), 8-bit unsigned or 16-bit signed
  * little-endian, any channel count and sample rate. The decoder is a
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

  /** Encode interleaved 16-bit PCM as a canonical 44-byte-header WAV. */
  def encode(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(o: Int, s: String): Unit = {
      val a = s.getBytes("US-ASCII"); System.arraycopy(a, 0, out, o, 4)
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putTag(0, "RIFF"); put32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2)  // byte rate
    put16(32, channels * 2)                      // block align
    put16(34, 16)                                // bits per sample
    putTag(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
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
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && data == null) {
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
          bits = u16(bytes, body + 14)
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt chunk")
          data = java.util.Arrays.copyOfRange(bytes, body,
            body + size.toInt)
        case _ => // LIST, INFO, fact, ... — skip
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off = body + size.toInt + (size.toInt & 1)
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    if (audioFormat != 1) fail(s"unsupported format tag $audioFormat " +
      "(only PCM=1)")
    if (channels < 1) fail(s"invalid channel count $channels")
    if (sampleRate < 1) fail(s"invalid sample rate $sampleRate")
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
