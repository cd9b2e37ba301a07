package graft.multimodal

/** From-scratch IMA/DVI ADPCM codec (WAV format tag 0x11) — the
  * COMPRESSED audio format the multimodal seam was missing, as [[Png]]
  * is for images. 4 bits per sample (4x smaller than 16-bit PCM), the
  * interchange ADPCM flavor WAV containers actually carry. Pure
  * integer arithmetic from the published IMA spec — step-size and
  * index tables, `diff = step>>3 (+step>>2 +step>>1 +step by nibble
  * bits)` expansion — so decode is bit-deterministic across JVMs and
  * partitions. No external audio libraries.
  *
  * Block layout (per the Microsoft WAVE registration of the IMA
  * format): each block of `blockAlign` bytes opens with a 4-byte
  * per-channel header — initial predictor (int16 LE, which is ALSO the
  * block's first output sample), step index (u8), reserved byte — then
  * nibble data in 4-byte per-channel groups (8 nibbles per group,
  * low nibble first; stereo alternates ch0/ch1 groups). A final block
  * shorter than `blockAlign` is accepted when it is structurally whole
  * (headers + whole per-channel rows) — real writers stop at the
  * `fact` frame count rather than padding.
  *
  * The encoder is the matching compressor (same tables, quantize the
  * delta to the 4-bit code whose expansion lands nearest): lossy by
  * design, so specs pin golden DECODE vectors exactly and roundtrip
  * within quantization tolerance.
  */
object ImaAdpcm {

  /** IMA step-size table (89 entries, published constant). */
  private[multimodal] val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** index adjustment per 3-bit magnitude (published constant) */
  private[multimodal] val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ADPCM decode: $msg")

  private def clampIdx(i: Int): Int =
    if (i < 0) 0 else if (i > 88) 88 else i

  private def clamp16(v: Int): Int =
    if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** Expand one 4-bit code against (predictor, stepIndex); returns the
    * new (predictor, stepIndex). The canonical IMA arithmetic:
    * delta = step/8 + step/4*b0 + step/2*b1 + step*b2, sign bit b3. */
  private[multimodal] def step(nibble: Int, predictor: Int,
      stepIndex: Int): (Int, Int) = {
    val st = StepTable(stepIndex)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    val next =
      if ((nibble & 8) != 0) clamp16(predictor - diff)
      else clamp16(predictor + diff)
    (next, clampIdx(stepIndex + IndexTable(nibble & 7)))
  }

  /** Decode IMA ADPCM block data to interleaved 16-bit PCM.
    *
    * @param data        raw block bytes (the WAV `data` chunk payload)
    * @param channels    channel count (>= 1)
    * @param blockAlign  bytes per block (from the fmt chunk)
    * @param totalFrames frames promised by the container's `fact`
    *                    chunk, or -1 to emit every decoded frame
    */
  def decode(data: Array[Byte], channels: Int, blockAlign: Int,
      totalFrames: Int = -1): Array[Short] = {
    if (channels < 1) fail(s"invalid channel count $channels")
    if (blockAlign < 4 * channels + 4 || (blockAlign - 4 * channels) % (4 * channels) != 0)
      fail(s"block align $blockAlign invalid for $channels channel(s): " +
        "need 4 header bytes + whole 4-byte nibble groups per channel")
    // a FINAL block may be shorter than blockAlign (writers that stop
    // at the fact frame count rather than padding), as long as it is
    // structurally whole: per-channel headers + whole nibble ROWS (one
    // 4-byte group per channel), so no channel's data ends mid-row
    val rem = data.length % blockAlign
    if (rem != 0 &&
        (rem < 4 * channels || (rem - 4 * channels) % (4 * channels) != 0))
      fail(s"final partial block of $rem bytes is not whole rows for " +
        s"$channels channel(s) (block align $blockAlign)")

    // frames per block: 1 (header predictor) + 2 nibbles/byte of the
    // per-channel share of the nibble area
    def framesIn(blockLen: Int): Int =
      1 + (blockLen - 4 * channels) / channels * 2
    val framesPerBlock = framesIn(blockAlign)
    val nFull = data.length / blockAlign
    val nBlocks = nFull + (if (rem != 0) 1 else 0)
    val decodedFrames =
      nFull * framesPerBlock + (if (rem != 0) framesIn(rem) else 0)
    val keepFrames =
      if (totalFrames < 0) decodedFrames
      else if (totalFrames > decodedFrames)
        fail(s"fact chunk promises $totalFrames frames, " +
          s"blocks hold only $decodedFrames")
      else totalFrames

    val out = new Array[Short](keepFrames * channels)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var block = 0
    while (block < nBlocks) {
      val base = block * blockAlign
      val blockLen = if (block < nFull) blockAlign else rem
      val frame0 = block * framesPerBlock
      // per-channel 4-byte headers
      var c = 0
      while (c < channels) {
        val o = base + 4 * c
        pred(c) = ((data(o) & 0xff) | (data(o + 1) << 8)).toShort.toInt
        idx(c) = data(o + 2) & 0xff
        if (idx(c) > 88) fail(s"step index ${idx(c)} > 88 in block $block")
        if (frame0 < keepFrames)
          out(frame0 * channels + c) = pred(c).toShort
        c += 1
      }
      // nibble area: 4-byte groups rotate across channels
      val nibbleBase = base + 4 * channels
      val groupsPerRow = channels // one 4-byte group per channel per row
      val nGroups = (blockLen - 4 * channels) / 4
      var g = 0
      while (g < nGroups) {
        val ch = g % groupsPerRow
        val row = g / groupsPerRow // row of 8 frames within the channel
        var b = 0
        while (b < 4) {
          val byte = data(nibbleBase + g * 4 + b) & 0xff
          var half = 0
          while (half < 2) {
            val nib = if (half == 0) byte & 0x0f else byte >> 4
            val (p, i2) = step(nib, pred(ch), idx(ch))
            pred(ch) = p; idx(ch) = i2
            // frame index within block: header frame + row*8 + position
            val f = frame0 + 1 + row * 8 + b * 2 + half
            if (f < keepFrames)
              out(f * channels + ch) = p.toShort
            half += 1
          }
          b += 1
        }
        g += 1
      }
      block += 1
    }
    out
  }

  /** Encode interleaved 16-bit PCM as IMA ADPCM blocks. The standard
    * greedy compressor: quantize each delta against the current step
    * (the same bit-test cascade as decode, so encoder and decoder
    * predictors stay in lockstep), carry predictor/index across blocks
    * within a channel, re-seed each block header from the running
    * state. The final partial block is zero-padded with repeated last
    * samples (silence extension), which the `fact` frame count lets
    * the decoder trim.
    *
    * @return (block bytes, blockAlign, totalFrames)
    */
  def encode(samples: Array[Short], channels: Int,
      framesPerBlock: Int = 505): (Array[Byte], Int, Int) = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    require(framesPerBlock >= 9 && (framesPerBlock - 1) % 8 == 0,
      s"framesPerBlock must be 1 + multiple of 8, got $framesPerBlock")
    val totalFrames = samples.length / channels
    if (totalFrames == 0) return (Array.emptyByteArray,
      4 * channels + (framesPerBlock - 1) / 2 * channels, 0)
    val blockAlign = 4 * channels + (framesPerBlock - 1) / 2 * channels
    val nBlocks = (totalFrames + framesPerBlock - 1) / framesPerBlock
    val out = new Array[Byte](nBlocks * blockAlign)

    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var c = 0

    def sampleAt(f: Int, ch: Int): Int =
      if (f < totalFrames) samples(f * channels + ch).toInt
      else samples((totalFrames - 1) * channels + ch).toInt // pad: hold last

    /** pick the 4-bit code whose expansion tracks `target` */
    def quantize(target: Int, ch: Int): Int = {
      val st = StepTable(idx(ch))
      var delta = target - pred(ch)
      var code = 0
      if (delta < 0) { code = 8; delta = -delta }
      if (delta >= st) { code |= 4; delta -= st }
      if (delta >= (st >> 1)) { code |= 2; delta -= st >> 1 }
      if (delta >= (st >> 2)) code |= 1
      val (p, i2) = step(code, pred(ch), idx(ch))
      pred(ch) = p; idx(ch) = i2
      code
    }

    var block = 0
    while (block < nBlocks) {
      val base = block * blockAlign
      val frame0 = block * framesPerBlock
      c = 0
      while (c < channels) {
        // header: re-seed predictor to the actual first frame sample
        pred(c) = sampleAt(frame0, c)
        val o = base + 4 * c
        out(o) = (pred(c) & 0xff).toByte
        out(o + 1) = ((pred(c) >> 8) & 0xff).toByte
        out(o + 2) = idx(c).toByte
        out(o + 3) = 0
        c += 1
      }
      val nibbleBase = base + 4 * channels
      val nGroups = (blockAlign - 4 * channels) / 4
      var g = 0
      while (g < nGroups) {
        val ch = g % channels
        val row = g / channels
        var b = 0
        while (b < 4) {
          val f = frame0 + 1 + row * 8 + b * 2
          val lo = quantize(sampleAt(f, ch), ch)
          val hi = quantize(sampleAt(f + 1, ch), ch)
          out(nibbleBase + g * 4 + b) = ((hi << 4) | lo).toByte
          b += 1
        }
        g += 1
      }
      block += 1
    }
    (out, blockAlign, totalFrames)
  }
}
