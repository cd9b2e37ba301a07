package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Bmp, Flac, Gif, Jpeg, Mp4, Multimodal, Png, Wav}

/** Adversarial robustness law for every codec behind the multimodal
  * dispatch: `tryDecode` returns an Option for ANY byte string — the
  * only exception a decoder may throw is IllegalArgumentException
  * (which tryDecode absorbs), because anything else (AIOOBE, NPE,
  * ArithmeticException, negative-size allocation) escapes the seam
  * and kills the Spark task a corrupt asset must not kill.
  *
  * Three deterministic attacks per codec, no real-time randomness
  * (fixed seeds): exhaustive truncation of a valid asset at every
  * length, seeded single/multi-byte mutations of a valid asset (the
  * bit-rot/corrupt-object-store model), and seeded garbage with a
  * valid magic prefix (the mislabeled-payload model). */
class CodecFuzzSpec extends AnyFunSuite {

  private def px(seed: Int, n: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(1 << 24))
  }
  private def pcm(seed: Int, n: Int): Array[Short] = {
    val rnd = new scala.util.Random(seed)
    Array.fill[Short](n)((rnd.nextInt(20000) - 10000).toShort)
  }

  /** run one decode attempt; only IAE may escape (tryDecode absorbs
    * it), so any OTHER throwable is a finding */
  private def mustNotCrash(name: String, decode: () => Option[_]): Unit =
    try { decode(); () } catch {
      case e: Throwable =>
        fail(s"$name: ${e.getClass.getName} escaped tryDecode: " +
          s"${e.getMessage}")
    }

  private def attack(name: String, valid: Array[Byte],
      decode: Array[Byte] => Option[_]): Unit = {
    // 1. exhaustive truncation
    (0 until valid.length).foreach { len =>
      mustNotCrash(s"$name truncated to $len",
        () => decode(valid.take(len)))
    }
    // 2. seeded byte mutations (1-4 flips per trial)
    val rnd = new scala.util.Random(0xFADE ^ name.hashCode)
    (0 until 400).foreach { trial =>
      val mutated = valid.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      mustNotCrash(s"$name mutation trial $trial", () => decode(mutated))
    }
    // 3. magic prefix + seeded garbage of assorted lengths
    val magic = valid.take(12)
    (0 until 100).foreach { trial =>
      val tail = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(tail)
      mustNotCrash(s"$name garbage trial $trial",
        () => decode(magic ++ tail))
    }
  }

  test("PNG survives truncation, mutation, and garbage") {
    attack("png", Png.encode(9, 7, px(1, 63)), Png.tryDecode)
  }

  test("JPEG survives truncation, mutation, and garbage") {
    attack("jpeg", Jpeg.encode(17, 9, px(2, 153)), Jpeg.tryDecode)
  }

  test("BMP survives truncation, mutation, and garbage") {
    attack("bmp", Bmp.encode(9, 7, px(3, 63)), Bmp.tryDecode)
  }

  test("GIF survives truncation, mutation, and garbage") {
    // 16 colors so the LZW dictionary really grows before the attacks
    val rnd = new scala.util.Random(16)
    val colors = Array.fill(16)(rnd.nextInt(1 << 24))
    val gifPx = Array.fill(12 * 9)(colors(rnd.nextInt(16)))
    attack("gif", Gif.encode(12, 9, gifPx), Gif.tryDecode)
  }

  test("WAV (PCM and ADPCM) survives truncation, mutation, and garbage") {
    attack("wav-pcm", Wav.encode(pcm(4, 600), 16000, 2), Wav.tryDecode)
    attack("wav-adpcm", Wav.encodeAdpcm(pcm(5, 1013), 16000, 1),
      Wav.tryDecode)
  }

  test("FLAC survives truncation, mutation, and garbage") {
    attack("flac", Flac.encode(pcm(11, 700), 16000, 2), Flac.tryDecode)
  }

  test("MP4 box walk survives truncation, mutation, and garbage") {
    attack("mp4", TestMp4.sample()._1, Mp4.tryParse)
  }

  test("Multimodal.decode (the dispatch seam) never throws on any input") {
    val rnd = new scala.util.Random(0xD15A)
    val valids = Seq(
      Png.encode(5, 5, px(6, 25)), Jpeg.encode(8, 8, px(7, 64)),
      Bmp.encode(5, 5, px(8, 25)), Wav.encode(pcm(9, 100), 8000, 1),
      Flac.encode(pcm(10, 150), 8000, 1))
    (0 until 300).foreach { trial =>
      val base = valids(trial % valids.length)
      val mutated = base.clone()
      (0 to rnd.nextInt(5)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val feats = Multimodal.decode(mutated) // must ALWAYS return
      assert(feats.length == 8, s"trial $trial: ${feats.length} features")
    }
  }
}
