package graft

import java.util.zip.CRC32

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Bmp, Multimodal, Png, Wav}

/** PNG codec contract: golden vectors for every filter type and color
  * type (the compressed scanlines are hand-built STORED-block DEFLATE
  * streams via [[Png.zlibStored]], so every byte of the input PNG is
  * hand-specified — no encoder in the loop), CRC/structure robustness,
  * encode determinism + roundtrip, and the Multimodal dispatch and
  * resize seams. Expected pixels are computed BY HAND from RFC 2083 §6
  * (the filter math comments show the arithmetic). */
class PngSpec extends AnyFunSuite {

  // ---- hand-rolled PNG builders (CRC via the JDK's public CRC32) ----

  private def chunk(name: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length.toLong)
    val nb = name.getBytes("US-ASCII")
    out.write(nb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32(); crc.update(nb, 0, 4); crc.update(data, 0, data.length)
    be32(crc.getValue)
    out.toByteArray
  }

  private val signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def ihdr(w: Int, h: Int, depth: Int, colorType: Int,
      interlace: Int = 0): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = ((w >> 24) & 0xff).toByte; d(1) = ((w >> 16) & 0xff).toByte
    d(2) = ((w >> 8) & 0xff).toByte; d(3) = (w & 0xff).toByte
    d(4) = ((h >> 24) & 0xff).toByte; d(5) = ((h >> 16) & 0xff).toByte
    d(6) = ((h >> 8) & 0xff).toByte; d(7) = (h & 0xff).toByte
    d(8) = depth.toByte; d(9) = colorType.toByte
    d(10) = 0; d(11) = 0; d(12) = interlace.toByte
    chunk("IHDR", d)
  }

  private def png(parts: Array[Byte]*): Array[Byte] =
    signature ++ parts.flatten

  /** filtered scanlines → one stored-block IDAT */
  private def idatOf(scanlines: Int*): Array[Byte] =
    chunk("IDAT", Png.zlibStored(scanlines.map(_.toByte).toArray))

  private val iend = chunk("IEND", Array.emptyByteArray)

  // ---- golden vectors: one per filter type ----

  test("golden: filter 0 (None), grayscale 2x2") {
    val bytes = png(ihdr(2, 2, 8, 0),
      idatOf(0, 50, 60, /*row1*/ 0, 70, 80), iend)
    val img = Png.decode(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0x323232, 0x3c3c3c, 0x464646, 0x505050)) // 50,60,70,80 gray
  }

  test("golden: filter 1 (Sub), RGB 3x1") {
    // recon: px0 = (10,20,30); px1 = px0 + (5,5,5) = (15,25,35);
    // px2 = px1 + (1,2,3) = (16,27,38)
    val bytes = png(ihdr(3, 1, 8, 2),
      idatOf(1, 10, 20, 30, 5, 5, 5, 1, 2, 3), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0x0a141e, 0x0f1923, 0x101b26))
  }

  test("golden: filter 2 (Up), grayscale 2x2 with mod-256 wrap") {
    // row0 = 50,60 (None); row1 = (5+50, 250+60 mod 256) = 55, 54
    val bytes = png(ihdr(2, 2, 8, 0),
      idatOf(0, 50, 60, 2, 5, 250), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0x323232, 0x3c3c3c, 0x373737, 0x363636))
  }

  test("golden: filter 3 (Average), grayscale 2x2") {
    // row0: x0 avg(0,0)=0 -> 100; x1 avg(100,0)=50 -> 70
    // row1: x0 avg(0,100)=50 -> 60; x1 avg(60,70)=65 -> 76
    val bytes = png(ihdr(2, 2, 8, 0),
      idatOf(3, 100, 20, 3, 10, 11), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0x646464, 0x464646, 0x3c3c3c, 0x4c4c4c))
  }

  test("golden: filter 4 (Paeth), grayscale 2x2") {
    // row0: x0 pred 0 -> 100; x1 pred(100,0,0)=100 -> 110
    // row1: x0 pred(0,100,0)=100 -> 120; x1 pred(120,110,100): p=130,
    //       pa=10 pb=20 pc=30 -> left 120 -> 150
    val bytes = png(ihdr(2, 2, 8, 0),
      idatOf(4, 100, 10, 4, 20, 30), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0x646464, 0x6e6e6e, 0x787878, 0x969696))
  }

  // ---- golden vectors: color types ----

  test("golden: palette (color type 3) resolves PLTE triples") {
    val plte = chunk("PLTE", Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte))
    val bytes = png(ihdr(2, 2, 8, 3), plte,
      idatOf(0, 0, 1, 0, 2, 1), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0x00ff00))
  }

  test("golden: RGBA (color type 6) ignores alpha") {
    val bytes = png(ihdr(2, 1, 8, 6),
      idatOf(0, 1, 2, 3, 255, 4, 5, 6, 0), iend)
    assert(Png.decode(bytes).pixels.toSeq == Seq(0x010203, 0x040506))
  }

  test("golden: gray+alpha (color type 4) ignores alpha") {
    val bytes = png(ihdr(2, 1, 8, 4),
      idatOf(0, 7, 128, 9, 0), iend)
    assert(Png.decode(bytes).pixels.toSeq == Seq(0x070707, 0x090909))
  }

  // ---- chunk-walk robustness ----

  test("multiple IDAT chunks concatenate per spec") {
    val z = Png.zlibStored(Array[Byte](0, 50, 60, 0, 70, 80))
    val (z1, z2) = z.splitAt(z.length / 2)
    val bytes = png(ihdr(2, 2, 8, 0),
      chunk("IDAT", z1), chunk("IDAT", z2), iend)
    assert(Png.decode(bytes).pixels.toSeq ==
      Seq(0x323232, 0x3c3c3c, 0x464646, 0x505050))
  }

  test("ancillary chunks (tEXt) are skipped") {
    val bytes = png(ihdr(2, 1, 8, 0),
      chunk("tEXt", "Comment\u0000hand-built".getBytes("US-ASCII")),
      idatOf(0, 1, 2), iend)
    assert(Png.decode(bytes).pixels.toSeq == Seq(0x010101, 0x020202))
  }

  test("corrupt chunk CRC fails decode, tryDecode yields None") {
    val good = png(ihdr(2, 1, 8, 0), idatOf(0, 1, 2), iend)
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte // IEND CRC
    assert(Png.tryDecode(good).isDefined)
    assert(Png.tryDecode(bad).isEmpty)
  }

  test("flipped pixel byte breaks the IDAT CRC (corruption is caught)") {
    val good = png(ihdr(2, 1, 8, 0), idatOf(0, 1, 2), iend)
    // locate the stored-block pixel byte (value 1) inside IDAT and flip it
    val z = Png.zlibStored(Array[Byte](0, 1, 2))
    val idatStart = signature.length + ihdr(2, 1, 8, 0).length + 8
    val bad = good.clone()
    bad(idatStart + z.length - 6) = 99 // one of the stored payload bytes
    assert(Png.tryDecode(bad).isEmpty)
  }

  test("truncated IDAT stream fails loudly (never partial pixels)") {
    // declare 2x2 but supply one row of scanline data
    val bytes = png(ihdr(2, 2, 8, 0), idatOf(0, 50, 60), iend)
    assert(Png.tryDecode(bytes).isEmpty)
  }

  test("unsupported shapes are refused: interlace, 16-bit, bad filter") {
    val interlaced = png(ihdr(2, 1, 8, 0, interlace = 1),
      idatOf(0, 1, 2), iend)
    assert(Png.tryDecode(interlaced).isEmpty)
    val deep = png(ihdr(1, 1, 16, 0), idatOf(0, 1, 2), iend)
    assert(Png.tryDecode(deep).isEmpty)
    val badFilter = png(ihdr(2, 1, 8, 0), idatOf(9, 1, 2), iend)
    assert(Png.tryDecode(badFilter).isEmpty)
  }

  test("FDICT-flagged zlib stream fails fast instead of spinning") {
    // CMF 0x78, FLG 0x20: FDICT bit set, (0x78*256+0x20) % 31 == 0 so
    // the header is valid — Inflater then reports needsDictionary and
    // returns 0 from inflate() forever; decode must fail, not hang
    val fdictIdat = chunk("IDAT",
      Array[Byte](0x78, 0x20, 0, 0, 0, 1))
    val bytes = png(ihdr(2, 1, 8, 0), fdictIdat, iend)
    assert(Png.tryDecode(bytes).isEmpty)
  }

  test("hostile tiny file declaring huge geometry is refused pre-allocation") {
    // 2^19 x 2^19 = 2^38 pixels passes the per-axis 2^20 bound but
    // would need a ~2 TB pixel array; the 2^26-pixel budget must
    // refuse it from the 33-byte header alone (no multi-GB allocation,
    // no OutOfMemoryError escaping tryDecode)
    val bytes = png(ihdr(1 << 19, 1 << 19, 8, 0), idatOf(0, 1), iend)
    val ex = intercept[IllegalArgumentException](Png.decode(bytes))
    assert(ex.getMessage.contains("decode cap"))
    assert(Png.tryDecode(bytes).isEmpty)
    // exactly at the cap boundary: 2^13 x 2^13 = 2^26 is allowed
    // (truncated IDAT fails later, proving we got past the cap check)
    val atCap = png(ihdr(1 << 13, 1 << 13, 8, 0), idatOf(0, 1), iend)
    val ex2 = intercept[IllegalArgumentException](Png.decode(atCap))
    assert(ex2.getMessage.contains("truncated"))
  }

  test("IDAT inflating past the declared geometry fails loudly") {
    // 1x1 grayscale needs 2 raw bytes; supply 4 — a mislabeled payload
    // must not silently decode a prefix
    val over = chunk("IDAT", Png.zlibStored(Array[Byte](0, 7, 0, 9)))
    val bytes = png(ihdr(1, 1, 8, 0), over, iend)
    val ex = intercept[IllegalArgumentException](Png.decode(bytes))
    assert(ex.getMessage.contains("past the declared"))
    assert(Png.tryDecode(bytes).isEmpty)
    // exact-size stream still decodes (the probe is not over-eager)
    val exact = png(ihdr(1, 1, 8, 0), idatOf(0, 7), iend)
    assert(Png.decode(exact).pixels.toSeq == Seq(0x070707))
  }

  test("zlib stream with no final block fails even at exact geometry") {
    // the stream inflates to EXACTLY the declared 2 raw bytes but its
    // stored block is marked non-final and the trailer is gone — a
    // truncation at a block boundary the over-run probe alone cannot
    // see (extra inflate returns 0 needing input; r14 ADVICE). Must
    // fail like every other truncation.
    val z = Png.zlibStored(Array[Byte](0, 7))
    val noFinal = z.clone().dropRight(4) // drop adler trailer
    noFinal(2) = 0 // BFINAL = 0 on the (only) stored block
    val bytes = png(ihdr(1, 1, 8, 0), chunk("IDAT", noFinal), iend)
    val ex = intercept[IllegalArgumentException](Png.decode(bytes))
    assert(ex.getMessage.contains("final block"))
    assert(Png.tryDecode(bytes).isEmpty)
  }

  test("palette index past PLTE size is refused") {
    val plte = chunk("PLTE", Array[Byte](1, 2, 3)) // one entry
    val bytes = png(ihdr(1, 1, 8, 3), plte, idatOf(0, 5), iend)
    assert(Png.tryDecode(bytes).isEmpty)
  }

  test("missing IEND / missing PLTE on palette / empty IDAT are refused") {
    assert(Png.tryDecode(png(ihdr(1, 1, 8, 0), idatOf(0, 1))).isEmpty)
    assert(Png.tryDecode(png(ihdr(1, 1, 8, 3), idatOf(0, 0), iend)).isEmpty)
    assert(Png.tryDecode(png(ihdr(1, 1, 8, 0), iend)).isEmpty)
  }

  test("looksLike sniffs the signature only") {
    assert(Png.looksLike(png(ihdr(1, 1, 8, 0), idatOf(0, 1), iend)))
    assert(!Png.looksLike("plain text".getBytes("UTF-8")))
    assert(!Png.looksLike(Array[Byte](0x89.toByte, 'P', 'N')))
    assert(!Png.looksLike(Bmp.encode(1, 1, Array(0x123456))))
  }

  // ---- encoder ----

  test("encode/decode roundtrip is pixel-exact (incl. non-trivial sizes)") {
    val rnd = new scala.util.Random(0xC0DEC)
    for ((w, h) <- Seq((1, 1), (3, 2), (17, 5), (64, 64))) {
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val decoded = Png.decode(Png.encode(w, h, px))
      assert(decoded.width == w && decoded.height == h)
      assert(decoded.pixels.toSeq == px.toSeq, s"${w}x$h roundtrip")
    }
  }

  test("encode is deterministic and really compresses redundant pixels") {
    val px = Array.fill(64 * 64)(0xa0b0c0)
    val e1 = Png.encode(64, 64, px)
    val e2 = Png.encode(64, 64, px)
    assert(e1.toSeq == e2.toSeq)
    // 64*64 RGB raw = 12,288 bytes of pixel data; a constant image
    // must compress far below that (this is what separates PNG from
    // the uncompressed BMP path)
    assert(e1.length < 1000, s"constant image encoded to ${e1.length} bytes")
    assert(Png.looksLike(e1))
  }

  test("decode accepts a Deflater-compressed stream (not just stored)") {
    // encode() uses real zlib compression; golden tests use stored
    // blocks — this pins that BOTH RFC 1951 block families decode
    val px = Array.tabulate(8 * 4)(i => (i * 0x010203) & 0xffffff)
    assert(Png.decode(Png.encode(8, 4, px)).pixels.toSeq == px.toSeq)
  }

  // ---- Multimodal seam ----

  test("Multimodal.decode dispatches PNG to the real image features") {
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val payload = Png.encode(2, 2, px)
    val feats = Multimodal.decode(payload)
    assert(feats.toSeq ==
      Multimodal.imageFeatures(Bmp.Image(2, 2, px)).toSeq)
    assert(feats(0) == 2f && feats(1) == 2f) // width, height
  }

  test("corrupt PNG falls back to opaque features, never throws") {
    val bad = signature ++ Array[Byte](1, 2, 3, 4)
    assert(Multimodal.decode(bad).toSeq ==
      Multimodal.opaqueFeatures(bad).toSeq)
  }

  test("PNG and BMP of the same pixels yield identical image features") {
    val rnd = new scala.util.Random(7)
    val px = Array.fill(5 * 3)(rnd.nextInt(1 << 24))
    assert(Multimodal.decode(Png.encode(5, 3, px)).toSeq ==
      Multimodal.decode(Bmp.encode(5, 3, px)).toSeq)
  }

  test("resizePayloads keeps PNG assets PNG and updates their meta") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.Row
    val px = Array.tabulate(4 * 4)(i => i * 0x111111 & 0xffffff)
    val rows = Seq(
      Row(1L, "image", Png.encode(4, 4, px), Row(4, 4, 0, 0)),
      Row(2L, "image", Bmp.encode(4, 4, px), Row(4, 4, 0, 0)),
      Row(3L, "audio", Wav.encode(Array[Short](1, 2, 3, 4), 8000, 1),
        Row(0, 0, 8000, 4)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val out = Multimodal.resizePayloads(media, 2, 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    val pngOut = out(1L).getAs[Array[Byte]]("payload")
    assert(Png.looksLike(pngOut) && !Bmp.looksLike(pngOut))
    val pngImg = Png.decode(pngOut)
    assert(pngImg.width == 2 && pngImg.height == 2)
    assert(pngImg.pixels.toSeq ==
      Bmp.resizeNearest(Bmp.Image(4, 4, px), 2, 2).pixels.toSeq)
    assert(out(1L).getAs[Row]("meta").getInt(0) == 2)

    val bmpOut = out(2L).getAs[Array[Byte]]("payload")
    assert(Bmp.looksLike(bmpOut))
    assert(Bmp.decode(bmpOut).pixels.toSeq == pngImg.pixels.toSeq)

    // non-image passes through byte-identical, meta untouched
    assert(out(3L).getAs[Array[Byte]]("payload").toSeq ==
      rows(2).getAs[Array[Byte]](2).toSeq)
    assert(out(3L).getAs[Row]("meta").getInt(2) == 8000)
  }

  test("zlibStored streams inflate with the JDK inflater (self-check)") {
    // covers the >65535 multi-block path too
    val data = Array.tabulate(70000)(i => (i % 251).toByte)
    val inf = new java.util.zip.Inflater()
    inf.setInput(Png.zlibStored(data))
    val out = new Array[Byte](data.length)
    var got = 0
    while (got < out.length && !inf.finished())
      got += inf.inflate(out, got, out.length - got)
    inf.end()
    assert(got == data.length && out.toSeq == data.toSeq)
  }
}
