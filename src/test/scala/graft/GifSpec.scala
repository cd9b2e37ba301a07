package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Gif, Multimodal}

/** GIF codec contract. Golden vectors are hand-built byte streams
  * whose LZW payload uses the clear-before-every-literal form (the
  * "uncompressed GIF" trick): the dictionary never grows, the code
  * width never changes, so the expected bits are decoder-variant-proof
  * and every code VALUE below is hand-specified. Dictionary growth,
  * width bumps, and the KwKwK case are pinned by encoder roundtrips
  * (the encoder exercises the real LZW both ways). */
class GifSpec extends AnyFunSuite {

  // ---- hand-rolled builders ----

  /** pack LZW code VALUES (hand-specified) LSB-first at fixed width,
    * wrap in one data sub-block chain */
  private def lzwBlocks(width: Int, codes: Int*): Array[Byte] = {
    var acc = 0L; var n = 0
    val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    codes.foreach { c =>
      acc |= (c.toLong << n); n += width
      while (n >= 8) { bytes += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
    }
    if (n > 0) bytes += (acc & 0xff).toByte
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    bytes.grouped(255).foreach { g =>
      out += g.length.toByte; out ++= g
    }
    out += 0 // terminator
    out.toArray
  }

  private def header(w: Int, h: Int, paletteBits: Int,
      palette: Seq[Int]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "GIF87a".getBytes("US-ASCII")
    out += (w & 0xff).toByte; out += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte; out += ((h >> 8) & 0xff).toByte
    out += (0x80 | (paletteBits - 1)).toByte // global table, 2^bits
    out += 0; out += 0
    palette.padTo(1 << paletteBits, 0).foreach { c =>
      out += ((c >> 16) & 0xff).toByte
      out += ((c >> 8) & 0xff).toByte
      out += (c & 0xff).toByte
    }
    out.toArray
  }

  private def imageDesc(w: Int, h: Int, interlaced: Boolean,
      minCode: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte](0x2c)
    out += 0; out += 0; out += 0; out += 0 // left, top
    out += (w & 0xff).toByte; out += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte; out += ((h >> 8) & 0xff).toByte
    out += (if (interlaced) 0x40 else 0x00).toByte
    out += minCode.toByte
    out.toArray
  }

  private val trailer = Array[Byte](0x3b)

  test("golden: 2x2 via the clear-per-literal stream") {
    // palette 0=red 1=green 2=blue; pixels (0,1 / 2,1); minCode 2:
    // clear=4 end=5, width stays 3 — codes hand-specified
    val gif = header(2, 2, 2, Seq(0xff0000, 0x00ff00, 0x0000ff)) ++
      imageDesc(2, 2, interlaced = false, minCode = 2) ++
      lzwBlocks(3, 4, 0, 4, 1, 4, 2, 4, 1, 5) ++ trailer
    val img = Gif.decode(gif)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0x00ff00))
  }

  test("golden: interlaced rows land in pass order 0,4 | 2,6 | odd") {
    // 1x8 column, palette = 8 grays; stored literal order is the
    // INTERLACE order 0,4,2,6,1,3,5,7 — decoded image must be the
    // gray ramp in natural row order
    val grays = (0 until 8).map(i => i * 0x111111)
    val interlaceOrder = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val codes = Seq(8) ++ // clear (minCode 3 -> clear 8, end 9)
      interlaceOrder.flatMap(i => Seq(i, 8)).dropRight(1) :+ 9
    val gif = header(1, 8, 3, grays) ++
      imageDesc(1, 8, interlaced = true, minCode = 3) ++
      lzwBlocks(4, codes: _*) ++ trailer
    val img = Gif.decode(gif)
    assert(img.width == 1 && img.height == 8)
    assert(img.pixels.toSeq == grays)
  }

  test("golden: GIF89a extensions (GCE, comment) are skipped") {
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val comment = Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)
    val base = header(2, 1, 2, Seq(0x102030, 0x405060))
    val gif89 = ("GIF89a".getBytes("US-ASCII") ++ base.drop(6)) ++
      gce ++ comment ++
      imageDesc(2, 1, interlaced = false, minCode = 2) ++
      lzwBlocks(3, 4, 0, 4, 1, 5) ++ trailer
    assert(Gif.decode(gif89).pixels.toSeq == Seq(0x102030, 0x405060))
  }

  test("roundtrip: dictionary growth, width bumps, 16-color image") {
    val rnd = new scala.util.Random(87)
    for ((w, h) <- Seq((1, 1), (7, 3), (40, 30), (64, 64))) {
      val colors = Array.fill(16)(rnd.nextInt(1 << 24))
      val px = Array.fill(w * h)(colors(rnd.nextInt(16)))
      val dec = Gif.decode(Gif.encode(w, h, px))
      assert(dec.width == w && dec.height == h)
      assert(dec.pixels.toSeq == px.toSeq, s"${w}x$h roundtrip")
    }
  }

  test("roundtrip: constant image (the KwKwK-heavy shape) and 256 colors") {
    val flat = Array.fill(50 * 40)(0xa0b0c0)
    assert(Gif.decode(Gif.encode(50, 40, flat)).pixels.toSeq == flat.toSeq)
    // exactly 256 distinct colors: the format's limit, must roundtrip
    val px256 = Array.tabulate(16 * 16)(i => i * 0x010101)
    assert(Gif.decode(Gif.encode(16, 16, px256)).pixels.toSeq ==
      px256.toSeq)
    // a dictionary-reset-inducing image (>4096 entries): noisy 2-color
    val rnd = new scala.util.Random(1)
    val noisy = Array.fill(200 * 100)(if (rnd.nextBoolean()) 0 else 0xffffff)
    assert(Gif.decode(Gif.encode(200, 100, noisy)).pixels.toSeq ==
      noisy.toSeq)
  }

  test("encode is deterministic and really compresses; >256 colors loud") {
    val flat = Array.fill(64 * 64)(0x123456)
    val e = Gif.encode(64, 64, flat)
    assert(e.toSeq == Gif.encode(64, 64, flat).toSeq)
    assert(e.length < 64 * 64 / 4, s"flat 64x64 encoded to ${e.length}")
    assert(Gif.looksLike(e))
    val many = Array.tabulate(17 * 17)(i => i) // 289 distinct colors
    intercept[IllegalArgumentException](Gif.encode(17, 17, many))
  }

  test("structural errors are loud, tryDecode absorbs them") {
    assert(Gif.tryDecode("GIF87a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.tryDecode("not a gif at all".getBytes("US-ASCII")).isEmpty)
    // trailer before image
    assert(Gif.tryDecode(header(1, 1, 2, Seq(0)) ++ trailer).isEmpty)
    // pixel index past the palette
    val bad = header(1, 1, 2, Seq(0x111111)) ++
      imageDesc(1, 1, interlaced = false, minCode = 2) ++
      lzwBlocks(3, 4, 3, 5) ++ trailer // index 3, palette has 4 slots
    assert(Gif.tryDecode(bad).isDefined) // slot exists (padded to 4)...
    val bad2 = header(1, 1, 2, Seq(0x111111)) ++
      imageDesc(1, 1, interlaced = false, minCode = 2) ++
      lzwBlocks(3, 4, 5) ++ trailer // END before any pixel
    assert(Gif.tryDecode(bad2).isEmpty)
    // truncated mid-subblock
    val good = Gif.encode(8, 8, Array.fill(64)(0x010203))
    (0 until good.length).foreach { len =>
      try Gif.tryDecode(good.take(len)) catch {
        case e: Throwable => fail(s"truncation $len: ${e.getClass}")
      }
    }
  }

  test("Multimodal dispatch and resize keep GIF as GIF") {
    val px = Array.tabulate(8 * 8)(i => ((i % 4) * 0x333333))
    val gif = Gif.encode(8, 8, px)
    val feats = Multimodal.decode(gif)
    assert(feats(0) == 8f && feats(1) == 8f)
    val spark = TestSpark.spark
    import org.apache.spark.sql.Row
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "image", gif, Row(8, 8, 0, 0))), 1),
      Multimodal.mediaSchema)
    val out = Multimodal.resizePayloads(media, 4, 4).collect().head
    val p = out.getAs[Array[Byte]]("payload")
    assert(Gif.looksLike(p))
    assert(Gif.decode(p).width == 4)
  }
}
