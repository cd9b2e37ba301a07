package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Flac, Multimodal, Wav}

/** Golden-vector contract for the from-scratch FLAC codec — every
  * stream below is hand-built bit by bit (the `bits` helper mirrors
  * JpegSpec's) with expected PCM computed on paper from the published
  * decode rules: fixed-predictor difference formulas, Rice/zigzag
  * arithmetic, stereo decorrelation identities, wasted-bit shifts.
  * CRCs are appended with the codec's own exposed crc8/crc16 (format
  * logic, like Png.zlibStored) — corruption tests then flip bytes to
  * prove they are actually verified. */
class FlacSpec extends AnyFunSuite {

  /** bits("1010 0011") -> packed bytes, MSB first, zero-padded */
  private def bits(s: String): Array[Byte] = {
    val b = s.filter(c => c == '0' || c == '1')
    val out = new Array[Byte]((b.length + 7) / 8)
    b.zipWithIndex.foreach { case (c, i) =>
      if (c == '1') out(i / 8) = (out(i / 8) | (0x80 >> (i % 8))).toByte
    }
    out
  }

  private def bin(v: Long, n: Int): String =
    (n - 1 to 0 by -1).map(i => ((v >> i) & 1).toString).mkString

  /** 34-byte STREAMINFO + fLaC magic, single last metadata block */
  private def streaminfo(rate: Int, channels: Int, totalFrames: Long,
      blockSize: Int): Array[Byte] = {
    val body = bits(
      bin(blockSize, 16) + bin(blockSize, 16) + // min/max block
        bin(0, 24) + bin(0, 24) +               // min/max frame size
        bin(rate, 20) + bin(channels - 1, 3) + bin(15, 5) + // bps 16
        bin(totalFrames, 36) + "0" * 128)       // total + md5 zeros
    assert(body.length == 34)
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ body
  }

  /** frame header through the 8-bit block-size field (bsCode 6),
    * CRC-8 appended; frameNo must fit the 1- or 2-byte coded form.
    * `variable = true` writes the variable-blocking strategy bit, in
    * which case frameNo codes the frame's first SAMPLE number. */
  private def frameHeader(blockSize: Int, chAssign: Int,
      frameNo: Int = 0, variable: Boolean = false): Array[Byte] = {
    val no =
      if (frameNo < 0x80) bin(frameNo, 8)
      else bin(0xc0 | (frameNo >> 6), 8) + bin(0x80 | (frameNo & 0x3f), 8)
    val hdr = bits(
      "11111111111110" + "0" + (if (variable) "1" else "0") + // sync, res, strategy
        bin(6, 4) +                    // block size: 8-bit at end
        bin(0, 4) +                    // sample rate: streaminfo
        bin(chAssign, 4) + bin(4, 3) + "0" + // 16-bit, reserved
        no + bin(blockSize - 1, 8))
    hdr :+ Flac.crc8(hdr, 0, hdr.length).toByte
  }

  /** header + body bits -> complete frame with CRC-16 */
  private def frame(header: Array[Byte], bodyBits: String): Array[Byte] = {
    val f = header ++ bits(bodyBits)
    f ++ Array[Byte](((Flac.crc16(f, 0, f.length) >> 8) & 0xff).toByte,
      (Flac.crc16(f, 0, f.length) & 0xff).toByte)
  }

  private def decodeAll(parts: Array[Byte]*): Wav.Audio =
    Flac.decode(parts.reduce(_ ++ _))

  // ---- golden decodes ----

  test("golden: CONSTANT subframe repeats its value") {
    val a = decodeAll(streaminfo(16000, 1, 4, 4),
      frame(frameHeader(4, 0), "0 000000 0 " + bin(100, 16)))
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.samples.toSeq == Seq[Short](100, 100, 100, 100))
  }

  test("golden: VERBATIM subframe is literal (incl. negative), 2-byte sample number") {
    // -2 as 16-bit two's complement = 0xFFFE. Variable blocking
    // strategy: the coded number is the frame's first SAMPLE, so a
    // 200-sample first frame makes the second frame code 200 — the
    // 0xC3 0x88 two-byte form, exercising the multi-byte reader while
    // satisfying the r15 position check (a lone frame numbered 200
    // would now rightly be rejected as 200 dropped frames).
    val a = decodeAll(streaminfo(8000, 1, 203, 200),
      frame(frameHeader(200, 0, frameNo = 0, variable = true),
        "0 000000 0 " + bin(7, 16)),
      frame(frameHeader(3, 0, frameNo = 200, variable = true),
        "0 000001 0 " + bin(1, 16) + bin(0xFFFE, 16) + bin(300, 16)))
    assert(a.samples.length == 203)
    assert(a.samples.take(200).forall(_ == 7))
    assert(a.samples.takeRight(3).toSeq == Seq[Short](1, -2, 300))
  }

  test("duplicated, dropped, or reordered frames fail on the coded number") {
    // two frames both numbered 0: the old totals check passes (3 + 3
    // decoded = 6 declared) — only the position check catches it
    val dup = streaminfo(16000, 1, 6, 3) ++
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(1, 16)) ++
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(2, 16))
    val e1 = intercept[IllegalArgumentException](Flac.decode(dup))
    assert(e1.getMessage.contains("expected"))
    // totalSamples = 0 (unknown) gated the old indirect check off
    // entirely (r14 ADVICE) — the position check still fires
    val dup0 = streaminfo(16000, 1, 0, 3) ++
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(1, 16)) ++
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(2, 16))
    val e2 = intercept[IllegalArgumentException](Flac.decode(dup0))
    assert(e2.getMessage.contains("expected"))
    // a skipped frame number (0 then 2) = a dropped frame
    val gap = streaminfo(16000, 1, 6, 3) ++
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(1, 16)) ++
      frame(frameHeader(3, 0, frameNo = 2), "0 000000 0 " + bin(2, 16))
    val e3 = intercept[IllegalArgumentException](Flac.decode(gap))
    assert(e3.getMessage.contains("expected"))
    // variable strategy: second frame must code first-sample 3, not 1
    val badPos = streaminfo(16000, 1, 6, 3) ++
      frame(frameHeader(3, 0, frameNo = 0, variable = true),
        "0 000000 0 " + bin(1, 16)) ++
      frame(frameHeader(3, 0, frameNo = 1, variable = true),
        "0 000000 0 " + bin(2, 16))
    val e4 = intercept[IllegalArgumentException](Flac.decode(badPos))
    assert(e4.getMessage.contains("expected"))
  }

  test("golden: FIXED order-2 reconstructs s[i] = 2s[i-1] - s[i-2] + r") {
    // warmup [10, 13]; residuals [+1, -2]:
    //   s2 = 2*13 - 10 + 1 = 17;  s3 = 2*17 - 13 - 2 = 19
    // Rice k=1: zigzag(+1)=2 -> q=1 rem 0 -> "01 0"; zigzag(-2)=3 ->
    // q=1 rem 1 -> "01 1"
    val a = decodeAll(streaminfo(16000, 1, 4, 4),
      frame(frameHeader(4, 0),
        "0 001010 0 " + bin(10, 16) + bin(13, 16) +
          "00 0000 " + bin(1, 4) + "010 011"))
    assert(a.samples.toSeq == Seq[Short](10, 13, 17, 19))
  }

  test("golden: FIXED order-1 with Rice partition order 1 and an escape partition") {
    // blockSize 4, order 1, 2 partitions of 2: first holds 2-1=1
    // residual (rice k=0: zigzag(+2)=4 -> "0000 1"), second is an
    // ESCAPED partition (param 1111, raw width 3) holding [-1, +3]
    // raw 3-bit two's complement: 111, 011.
    //   warmup [5]; s1 = 5 + 2 = 7; s2 = 7 - 1 = 6; s3 = 6 + 3 = 9
    val a = decodeAll(streaminfo(16000, 1, 4, 4),
      frame(frameHeader(4, 0),
        "0 001001 0 " + bin(5, 16) +
          "00 0001 " + bin(0, 4) + "00001 " +
          "1111 " + bin(3, 5) + "111 011"))
    assert(a.samples.toSeq == Seq[Short](5, 7, 6, 9))
  }

  test("golden: LPC order-1 applies (coef * prev) >> shift") {
    // warmup [8]; precision 4 (precM1=3), shift 1, coef [3];
    // residual [+2] rice k=2: zigzag(2)=4 -> q=1 rem 00 -> "01 00"
    //   s1 = ((3*8) >> 1) + 2 = 12 + 2 = 14
    val a = decodeAll(streaminfo(16000, 1, 2, 2),
      frame(frameHeader(2, 0),
        "0 100000 0 " + bin(8, 16) +
          bin(3, 4) + bin(1, 5) + bin(3, 4) +
          "00 0000 " + bin(2, 4) + "01 00"))
    assert(a.samples.toSeq == Seq[Short](8, 14))
  }

  test("golden: left/side stereo — right = left - side (side is 17-bit)") {
    val a = decodeAll(streaminfo(16000, 2, 2, 2),
      frame(frameHeader(2, 8),
        "0 000000 0 " + bin(500, 16) +     // left CONSTANT 500
          "0 000000 0 " + bin(100, 17)))   // side CONSTANT 100 (17-bit)
    assert(a.channels == 2)
    // interleaved L R L R
    assert(a.samples.toSeq == Seq[Short](500, 400, 500, 400))
  }

  test("golden: right/side stereo — left = right + side (side channel first)") {
    val a = decodeAll(streaminfo(16000, 2, 2, 2),
      frame(frameHeader(2, 9),
        "0 000000 0 " + bin(100, 17) +     // side CONSTANT 100 (17-bit)
          "0 000000 0 " + bin(400, 16)))   // right CONSTANT 400
    assert(a.samples.toSeq == Seq[Short](500, 400, 500, 400))
  }

  test("golden: mid/side stereo reconstructs L,R exactly (odd sum)") {
    // L=7, R=3: mid = (7+3)>>1 = 5, side = 4
    // decode: mid' = (5<<1)|(4&1) = 10; L = (10+4)>>1 = 7; R = 3
    val a = decodeAll(streaminfo(16000, 2, 1, 1),
      frame(frameHeader(1, 10),
        "0 000000 0 " + bin(5, 16) +
          "0 000000 0 " + bin(4, 17)))
    assert(a.samples.toSeq == Seq[Short](7, 3))
    // odd L+R: L=8, R=3 -> mid=(11)>>1=5, side=5; mid'=(5<<1)|1=11;
    // L=(11+5)>>1=8; R=(11-5)>>1=3 — the |1 carry is what makes
    // mid/side lossless
    val b = decodeAll(streaminfo(16000, 2, 1, 1),
      frame(frameHeader(1, 10),
        "0 000000 0 " + bin(5, 16) +
          "0 000000 0 " + bin(5, 17)))
    assert(b.samples.toSeq == Seq[Short](8, 3))
  }

  test("golden: wasted bits shift the decoded values back up") {
    // wasted flag 1 + unary 1 (zero further zeros) = 1 wasted bit;
    // CONSTANT at 15-bit precision value 50 -> output 50 << 1 = 100
    val a = decodeAll(streaminfo(16000, 1, 2, 2),
      frame(frameHeader(2, 0),
        "0 000000 1 1 " + bin(50, 15)))
    assert(a.samples.toSeq == Seq[Short](100, 100))
  }

  test("multiple frames concatenate in order") {
    val a = decodeAll(streaminfo(16000, 1, 6, 3),
      frame(frameHeader(3, 0, frameNo = 0), "0 000000 0 " + bin(1, 16)),
      frame(frameHeader(3, 0, frameNo = 1), "0 000000 0 " + bin(2, 16)))
    assert(a.samples.toSeq == Seq[Short](1, 1, 1, 2, 2, 2))
  }

  // ---- loud failures ----

  test("header CRC-8 and frame CRC-16 are verified; totals are checked") {
    val good = streaminfo(16000, 1, 4, 4) ++
      frame(frameHeader(4, 0), "0 000000 0 " + bin(100, 16))
    assert(Flac.decode(good).samples.length == 4) // sanity
    // flip the channel-assignment nibble -> header CRC-8 must catch it
    val badHdr = good.clone()
    badHdr(42 + 3) = (badHdr(42 + 3) ^ 0x10).toByte
    val e1 = intercept[IllegalArgumentException](Flac.decode(badHdr))
    assert(e1.getMessage.contains("CRC-8") || e1.getMessage.contains("sync"))
    // flip a body byte -> frame CRC-16 must catch it
    val badBody = good.clone()
    badBody(good.length - 3) = (badBody(good.length - 3) ^ 0x40).toByte
    val e2 = intercept[IllegalArgumentException](Flac.decode(badBody))
    assert(e2.getMessage.contains("CRC-16"))
    // streaminfo declares 5 frames, stream carries 4
    val short = streaminfo(16000, 1, 5, 4) ++
      frame(frameHeader(4, 0), "0 000000 0 " + bin(100, 16))
    val e3 = intercept[IllegalArgumentException](Flac.decode(short))
    assert(e3.getMessage.contains("declares"))
    // truncation anywhere fails, never partial audio
    assert(Flac.tryDecode(good.take(good.length - 1)).isEmpty)
    assert(Flac.tryDecode(good.take(40)).isEmpty)
  }

  test("unsupported shapes are refused loudly") {
    // 8-bit depth (bps code in streaminfo)
    val si8 = {
      val body = bits(bin(4, 16) + bin(4, 16) + bin(0, 24) + bin(0, 24) +
        bin(16000, 20) + bin(0, 3) + bin(7, 5) + bin(4, 36) + "0" * 128)
      "fLaC".getBytes("US-ASCII") ++
        Array[Byte](0x80.toByte, 0, 0, 34) ++ body
    }
    val e = intercept[IllegalArgumentException](Flac.decode(si8))
    assert(e.getMessage.contains("bit depth"))
    // hostile declared total past the allocation cap fails pre-frame
    val huge = streaminfo(16000, 1, (1L << 35), 4)
    val e2 = intercept[IllegalArgumentException](Flac.decode(huge))
    assert(e2.getMessage.contains("cap"))
    assert(Flac.tryDecode(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
  }

  test("looksLike sniffs the magic only") {
    assert(Flac.looksLike("fLaC____".getBytes("US-ASCII")))
    assert(!Flac.looksLike("flaC____".getBytes("US-ASCII")))
    assert(!Flac.looksLike(Array[Byte](1, 2)))
  }

  // ---- encoder ----

  test("encode/decode roundtrip is sample-exact (mono and stereo)") {
    val rnd = new scala.util.Random(91)
    // smooth-ish signal: the content FIXED order-2 predicts well
    var phase = 0.0
    val mono = Array.tabulate[Short](5000) { i =>
      phase += 0.02 + rnd.nextDouble() * 0.001
      (math.sin(phase) * 9000 + rnd.nextInt(21) - 10).toShort
    }
    val am = Flac.decode(Flac.encode(mono, 16000, 1))
    assert(am.sampleRate == 16000 && am.channels == 1)
    assert(am.samples.toSeq == mono.toSeq)
    val stereo = Array.tabulate[Short](6000) { i =>
      ((i / 2 % 997) * 7 - 3000 + (i % 2) * 100).toShort
    }
    val as = Flac.decode(Flac.encode(stereo, 44100, 2))
    assert(as.sampleRate == 44100 && as.channels == 2)
    assert(as.samples.toSeq == stereo.toSeq)
    // multi-frame: > 4096 frames per channel exercised above (5000, 3000)
  }

  test("encode is deterministic and compresses a smooth signal") {
    val smooth = Array.tabulate[Short](8000)(i => (i % 1000).toShort)
    val a = Flac.encode(smooth, 16000, 1)
    val b = Flac.encode(smooth, 16000, 1)
    assert(a.toSeq == b.toSeq, "same samples must encode byte-identically")
    assert(a.length < smooth.length, // < half the 16-bit raw size
      s"ramp signal did not compress: ${a.length} vs raw ${smooth.length * 2}")
    // constant signal collapses to CONSTANT subframes
    val const = Array.fill[Short](8000)(1234)
    val c = Flac.encode(const, 16000, 1)
    assert(c.length < 200, s"constant signal still ${c.length} bytes")
    assert(Flac.decode(c).samples.toSeq == const.toSeq)
  }

  test("audioFeatures agree between WAV and FLAC encodings of the same PCM") {
    val rnd = new scala.util.Random(17)
    val pcm = Array.fill[Short](2400)((rnd.nextInt(16000) - 8000).toShort)
    val viaWav = Multimodal.decode(Wav.encode(pcm, 16000, 2))
    val viaFlac = Multimodal.decode(Flac.encode(pcm, 16000, 2))
    assert(viaWav.toSeq == viaFlac.toSeq,
      "lossless codecs must featurize identically")
  }

  test("Multimodal.samplePcmFrames keeps FLAC assets FLAC") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pcm = Array.tabulate[Short](1600)(i => (i * 3 % 2000).toShort)
    val media = Seq(
      (1L, "audio", Flac.encode(pcm, 16000, 1), (0, 0, 16000, 1600)),
      (2L, "audio", Array[Byte](9, 9, 9), (0, 0, 0, 0)))
      .toDF("media_id", "kind", "payload", "meta")
      .selectExpr("media_id", "kind", "payload",
        "named_struct('width', meta._1, 'height', meta._2, " +
          "'sample_rate', meta._3, 'n_frames', meta._4) as meta")
    val out = Multimodal.samplePcmFrames(media, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val kept = out(1L).getAs[Array[Byte]]("payload")
    assert(Flac.looksLike(kept), "FLAC asset must stay FLAC after resample")
    val dec = Flac.decode(kept)
    assert(dec.frames == 400 && dec.sampleRate == 4000)
    assert(dec.samples.toSeq ==
      Wav.sampleEveryK(Wav.Audio(16000, 1, 16, pcm), 4).samples.toSeq)
    assert(out(2L).getAs[Array[Byte]]("payload").toSeq ==
      Seq[Byte](9, 9, 9), "non-media payload must pass through")
  }
}
