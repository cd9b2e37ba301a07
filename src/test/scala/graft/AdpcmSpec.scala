package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImaAdpcm, Multimodal, Wav}

/** IMA ADPCM codec contract: golden DECODE vectors hand-computed from
  * the published step/index tables (the arithmetic is shown in the
  * comments), container wiring through the WAV chunk walk (format tag
  * 17 + fact-chunk trim), channel de-interleave, block-state carry,
  * structural robustness, and the lossy-roundtrip quality bound. */
class AdpcmSpec extends AnyFunSuite {

  /** mono block: 4-byte header (pred, idx, reserved) + nibble bytes */
  private def monoBlock(pred: Int, idx: Int, nibbles: Int*): Array[Byte] = {
    require(nibbles.length % 8 == 0)
    val out = new Array[Byte](4 + nibbles.length / 2)
    out(0) = (pred & 0xff).toByte; out(1) = ((pred >> 8) & 0xff).toByte
    out(2) = idx.toByte; out(3) = 0
    var i = 0
    while (i < nibbles.length / 2) {
      out(4 + i) = ((nibbles(2 * i + 1) << 4) | nibbles(2 * i)).toByte
      i += 1
    }
    out
  }

  test("golden: mono block, hand-computed IMA expansion") {
    // pred=0, idx=0 (step 7); nibbles 1,7,8,0,3,3,15,9:
    //  1: d=7/8+7/4=0+1=1        -> 1,   idx 0-1 -> 0
    //  7: d=0+1+3+7=11           -> 12,  idx 0+8 -> 8 (step 16)
    //  8: d=16/8=2, sign         -> 10,  idx 8-1 -> 7 (step 14)
    //  0: d=14/8=1               -> 11,  idx 7-1 -> 6 (step 13)
    //  3: d=1+3+6=10             -> 21,  idx 6-1 -> 5 (step 12)
    //  3: d=1+3+6=10             -> 31,  idx 5-1 -> 4 (step 11)
    // 15: d=1+2+5+11=19, sign    -> 12,  idx 4+8 -> 12 (step 23)
    //  9: d=2+5=7, sign          -> 5,   idx 12-1 -> 11
    val data = monoBlock(0, 0, 1, 7, 8, 0, 3, 3, 15, 9)
    val pcm = ImaAdpcm.decode(data, channels = 1, blockAlign = 8)
    assert(pcm.toSeq == Seq[Short](0, 1, 12, 10, 11, 21, 31, 12, 5))
  }

  test("golden: predictor clamps at int16 bounds") {
    // pred=32760, idx=88 (step 32767); nibble 7: d=4095+8191+16383+32767
    // = 61436 -> clamp 32767; then nibble 15 from there: sign, d same
    // magnitude class -> large negative step, clamp applies symmetric
    val data = monoBlock(32760, 88, 7, 7, 15, 15, 0, 0, 0, 0)
    val pcm = ImaAdpcm.decode(data, 1, 8)
    assert(pcm(0) == 32760.toShort)
    assert(pcm(1) == 32767.toShort) // clamped up
    assert(pcm.forall(s => s >= -32768 && s <= 32767))
  }

  test("golden: stereo nibble groups de-interleave per channel") {
    // ch0: pred 100, nibbles 1,0,0,0,0,0,0,0 -> f1 = 101 (d=7/4=1), then
    //      flat (nibble 0 at step 7 has d=0)
    // ch1: pred -100, nibbles 2,0,...,0 -> f1 = -97 (d=7/2=3), then flat
    val header0 = Array[Byte](100, 0, 0, 0)
    val header1 = Array[Byte](0x9c.toByte, 0xff.toByte, 0, 0) // -100
    val group0 = Array[Byte](0x01, 0, 0, 0)
    val group1 = Array[Byte](0x02, 0, 0, 0)
    val data = header0 ++ header1 ++ group0 ++ group1
    val pcm = ImaAdpcm.decode(data, channels = 2, blockAlign = 16)
    assert(pcm.length == 18) // 9 frames x 2 channels
    assert(pcm(0) == 100 && pcm(1) == -100) // header frame
    assert(pcm(2) == 101 && pcm(3) == -97)  // first nibble frame
    assert(pcm(16) == 101 && pcm(17) == -97) // flat tail
  }

  test("fact frame count trims final-block padding") {
    val data = monoBlock(5, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(ImaAdpcm.decode(data, 1, 8).length == 9)
    assert(ImaAdpcm.decode(data, 1, 8, totalFrames = 5).length == 5)
    assert(ImaAdpcm.decode(data, 1, 8, totalFrames = 5).toSeq ==
      Seq[Short](5, 5, 5, 5, 5))
  }

  test("structural errors are loud: align, length, index, fact") {
    val ok = monoBlock(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    intercept[IllegalArgumentException](ImaAdpcm.decode(ok, 1, 7))
    intercept[IllegalArgumentException](ImaAdpcm.decode(ok, 2, 8))
    intercept[IllegalArgumentException](
      ImaAdpcm.decode(ok.dropRight(1), 1, 8))
    val badIdx = monoBlock(0, 89, 0, 0, 0, 0, 0, 0, 0, 0)
    intercept[IllegalArgumentException](ImaAdpcm.decode(badIdx, 1, 8))
    intercept[IllegalArgumentException](
      ImaAdpcm.decode(ok, 1, 8, totalFrames = 10))
  }

  test("a whole-row truncated FINAL block decodes (real writers do this)") {
    // declared align 12 (mono: header + two 4-byte rows = 17 frames),
    // but the final (only) block carries just ONE row -> 9 frames
    val partial = monoBlock(5, 0, 1, 0, 0, 0, 0, 0, 0, 0) // 8 bytes
    val pcm = ImaAdpcm.decode(partial, channels = 1, blockAlign = 12)
    assert(pcm.length == 9)
    assert(pcm(0) == 5 && pcm(1) == 6) // nibble 1 at step 7: +1
    // a full block followed by a whole-row partial block
    val full = monoBlock(0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0) // 12 bytes, 17 frames
    val both = full ++ partial
    assert(ImaAdpcm.decode(both, 1, 12).length == (17 + 9))
    // mid-row truncation is still refused
    intercept[IllegalArgumentException](
      ImaAdpcm.decode(both.dropRight(2), 1, 12))
  }

  test("fact chunk AFTER the data chunk still trims pad frames") {
    val wav = Wav.encodeAdpcm(Array.tabulate[Short](500)(_.toShort), 8000, 1)
    // surgically move fact (12 bytes at offset 40) behind data
    val fact = wav.slice(40, 52)
    val rest = wav.take(40) ++ wav.drop(52)
    val moved = rest ++ fact
    // fix the RIFF size (unchanged length, so already right) and decode
    val a = Wav.decode(moved)
    assert(a.frames == 500) // without the fix: 505 (block padding leaks)
  }

  // ---- container wiring (format tag 17 through the WAV chunk walk) ----

  test("ADPCM WAV roundtrips through the container: exact re-decode") {
    val rnd = new scala.util.Random(17)
    var v = 0.0
    val samples = Array.fill[Short](1013) { // spans 3 blocks at 505/block
      v += rnd.nextGaussian() * 200
      math.max(-30000, math.min(30000, v)).toShort
    }
    val wav = Wav.encodeAdpcm(samples, 16000, 1)
    assert(Wav.looksLike(wav))
    val a = Wav.decode(wav)
    assert(a.sampleRate == 16000 && a.channels == 1 && a.bitsPerSample == 4)
    assert(a.frames == 1013) // fact chunk trimmed the pad frames
    // container determinism: same input, same bytes, same decode
    assert(Wav.encodeAdpcm(samples, 16000, 1).toSeq == wav.toSeq)
    assert(Wav.decode(wav).samples.toSeq == a.samples.toSeq)
  }

  test("lossy roundtrip tracks a smooth signal (quantization bound)") {
    val n = 2048
    val samples = Array.tabulate[Short](n)(i =>
      (8000 * math.sin(2 * math.Pi * i * 440.0 / 16000)).toShort)
    val decoded = Wav.decode(Wav.encodeAdpcm(samples, 16000, 1)).samples
    assert(decoded.length == n)
    val errs = samples.indices.map(i => math.abs(decoded(i) - samples(i)))
    val mean = errs.sum.toDouble / n
    assert(mean < 300, s"mean abs error $mean")
    // the first few dozen samples are the adaptation transient (the
    // step table opens at 7 while this sine's slope is ~1380/sample;
    // the index needs ~8 max-magnitude codes to catch up) — steady
    // state is what the bound pins
    assert(errs.drop(64).max < 3000, s"steady-state max ${errs.drop(64).max}")
  }

  test("stereo lossy roundtrip keeps channels independent") {
    val n = 1008 // 504 frames x 2 channels
    val samples = new Array[Short](n)
    var i = 0
    while (i < n / 2) {
      samples(2 * i) = (4000 * math.sin(2 * math.Pi * i / 50.0)).toShort
      samples(2 * i + 1) = (-2000 * math.sin(2 * math.Pi * i / 31.0)).toShort
      i += 1
    }
    val a = Wav.decode(Wav.encodeAdpcm(samples, 8000, 2))
    assert(a.channels == 2 && a.frames == 504)
    // each channel must track ITS signal: cross-assign would explode error
    var err0 = 0.0; var err1 = 0.0
    i = 0
    while (i < n / 2) {
      err0 += math.abs(a.samples(2 * i) - samples(2 * i))
      err1 += math.abs(a.samples(2 * i + 1) - samples(2 * i + 1))
      i += 1
    }
    assert(err0 / (n / 2) < 300, s"ch0 mean err ${err0 / (n / 2)}")
    assert(err1 / (n / 2) < 300, s"ch1 mean err ${err1 / (n / 2)}")
  }

  test("Multimodal.decode surfaces ADPCM audio as real audio features") {
    val samples = Array.tabulate[Short](505)(i =>
      (3000 * math.sin(i / 10.0)).toShort)
    val feats = Multimodal.decode(Wav.encodeAdpcm(samples, 16000, 1))
    assert(feats(0) == 1f)      // channels
    assert(feats(1) == 16f)     // sampleRate / 1000
    assert(feats(2) == 505f)    // frames — fact-trimmed, not block-padded
    val pcmFeats = Multimodal.decode(Wav.encode(samples, 16000, 1))
    // lossy but close: rms within 5% of the PCM path
    assert(math.abs(feats(4) - pcmFeats(4)) < 0.05 * math.abs(pcmFeats(4)))
  }

  test("corrupt ADPCM payload falls back to opaque features") {
    val wav = Wav.encodeAdpcm(Array.tabulate[Short](505)(_.toShort), 8000, 1)
    val bad = wav.clone()
    bad(56) = 1 // data chunk size no longer a block-align multiple
    assert(Multimodal.decode(bad).toSeq ==
      Multimodal.opaqueFeatures(bad).toSeq)
  }

  test("samplePcmFrames keeps ADPCM assets ADPCM (no silent transcode)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.Row
    val samples = Array.tabulate[Short](1013)(i =>
      (2000 * math.sin(i / 20.0)).toShort)
    val adpcm = Wav.encodeAdpcm(samples, 16000, 1)
    val pcm = Wav.encode(samples, 16000, 1)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "audio", adpcm, Row(0, 0, 16000, 1013)),
        Row(2L, "audio", pcm, Row(0, 0, 16000, 1013))), 2),
      Multimodal.mediaSchema)
    val out = Multimodal.samplePcmFrames(media, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val outAdpcm = out(1L).getAs[Array[Byte]]("payload")
    val outPcm = out(2L).getAs[Array[Byte]]("payload")
    // format preserved on both branches
    val aA = Wav.decode(outAdpcm)
    val aP = Wav.decode(outPcm)
    assert(aA.bitsPerSample == 4, "ADPCM input must re-encode as ADPCM")
    assert(aP.bitsPerSample == 16, "PCM input must re-encode as PCM")
    assert(aA.frames == aP.frames && aA.frames == (1013 + 3) / 4)
    // compressed really is smaller for the same frame count (not the
    // full 4x here: 254 frames still occupy one whole 505-frame block)
    assert(outAdpcm.length < outPcm.length)
  }

  test("sampleEveryK composes with the decompressed ADPCM stream") {
    val samples = Array.tabulate[Short](505)(i => (i * 13 % 2000).toShort)
    val a = Wav.decode(Wav.encodeAdpcm(samples, 16000, 1))
    val s = Wav.sampleEveryK(a, 5)
    assert(s.frames == 101 && s.sampleRate == 3200)
    assert(s.samples(1) == a.samples(5))
  }
}
