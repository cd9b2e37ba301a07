package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal contract: schema, batch shape, partition-count
  * invariance, and the real from-scratch WAV/BMP codecs (golden
  * vectors, round trips, chunk/header-walk robustness, dispatch). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.multimodal.{Bmp, Multimodal, Wav}

  private def media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, TestSpark.sf0001))

  test("media table carries opaque payload + typed metadata") {
    val m = media
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction yields fixed-width vectors, schema stable") {
    val f = Multimodal.extractFeatures(media)
    assert(f.schema == Multimodal.featureSchema)
    val rows = f.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.getSeq[Float](3).length == 8))
    // n_bytes must equal the payload byte length
    val joined = f.join(media, "media_id")
      .select(col("n_bytes"), length(col("payload")).as("pl"))
      .collect()
    assert(joined.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("decode is partition-count invariant (codec init per partition)") {
    def run(parts: Int) =
      Multimodal.extractFeatures(media.repartition(parts))
        .orderBy("media_id").collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  test("frame sampling keeps every k-th index within n_frames") {
    val s = Multimodal.sampleFrames(media, everyK = 7)
      .groupBy("media_id").agg(max("frame_idx").as("mx"),
        count(lit(1)).as("n"))
      .join(media.select(col("media_id"), col("meta.n_frames").as("nf")),
        "media_id")
      .collect()
    assert(s.forall(r => r.getAs[Int]("mx") < r.getAs[Int]("nf")))
    assert(s.forall(r =>
      r.getAs[Long]("n") == (r.getAs[Int]("nf") + 6) / 7))
  }

  test("resize rewrites metadata without touching payload") {
    val r = Multimodal.resizeMeta(media, 32, 32)
    val row = r.select(col("meta.width"), col("meta.height"),
      length(col("payload"))).head()
    assert(row.getInt(0) == 32 && row.getInt(1) == 32)
    assert(r.count() == media.count())
  }

  // ---- WAV codec -------------------------------------------------------

  test("WAV 16-bit round trip is bit-exact") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7, -1)
    // 7 samples, 1 channel — also exercises the odd-data-length pad math
    val bytes = Wav.encode(samples, sampleRate = 16000, channels = 1)
    val a = Wav.decode(bytes)
    assert(a.sampleRate == 16000 && a.channels == 1 &&
      a.bitsPerSample == 16 && a.frames == 7)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("WAV stereo frames = samples / channels") {
    val samples = Array[Short](1, 2, 3, 4, 5, 6) // 3 frames x 2 channels
    val a = Wav.decode(Wav.encode(samples, 44100, channels = 2))
    assert(a.channels == 2 && a.frames == 3)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("zero-crossings count within a channel, not across interleave") {
    import graft.multimodal.Multimodal
    // stereo: L constant +1000, R constant -1000 — neither channel ever
    // crosses zero, but ADJACENT interleaved samples alternate sign at
    // every boundary (the bug this test pins: counting those would give
    // samples.length - 1 = 7)
    val steady = Wav.Audio(16000, 2, 16,
      Array[Short](1000, -1000, 1000, -1000, 1000, -1000, 1000, -1000))
    assert(Multimodal.audioFeatures(steady)(7) == 0f,
      "constant-sign channels must have zero crossings")
    // stereo where EACH channel alternates sign every frame: 3 true
    // crossings per channel = 6 total
    val alt = Wav.Audio(16000, 2, 16,
      Array[Short](1000, 500, -1000, -500, 1000, 500, -1000, -500))
    assert(Multimodal.audioFeatures(alt)(7) == 6f)
    // mono stays the consecutive-sample count (golden value unchanged):
    // signs + - + - → 3 crossings
    val mono = Wav.Audio(8000, 1, 16, Array[Short](5, -5, 5, -5))
    assert(Multimodal.audioFeatures(mono)(7) == 3f)
  }

  test("WAV golden header bytes (canonical 44-byte PCM header)") {
    val b = Wav.encode(Array[Short](258), 16000, 1)
    assert(b.length == 46)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") == "fmt ")
    assert((b(20) & 0xff) == 1 && (b(34) & 0xff) == 16)  // PCM, 16-bit
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    // 258 = 0x0102 little-endian
    assert((b(44) & 0xff) == 0x02 && (b(45) & 0xff) == 0x01)
  }

  test("WAV chunk walk skips unknown chunks (odd size padded)") {
    val base = Wav.encode(Array[Short](5, -5), 8000, 1)
    // splice a 3-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    val a = Wav.decode(spliced)
    assert(a.samples.toSeq == Seq[Short](5, -5))
  }

  test("WAV 8-bit PCM expands to centered 16-bit") {
    val base = Wav.encode(Array[Short](0, 0), 8000, 1)
    // rewrite: bits=8, data chunk = two unsigned bytes 128 (silence), 255
    val b = base.clone()
    b(34) = 8                        // bitsPerSample
    b(40) = 2; b(41) = 0; b(42) = 0; b(43) = 0  // data size 2
    b(44) = 128.toByte; b(45) = 255.toByte
    val a = Wav.decode(java.util.Arrays.copyOf(b, 46))
    assert(a.bitsPerSample == 8)
    assert(a.samples.toSeq == Seq[Short](0, ((255 - 128) << 8).toShort))
  }

  test("WAV corrupt inputs throw / tryDecode yields None") {
    val good = Wav.encode(Array[Short](1), 8000, 1)
    val truncated = good.slice(0, good.length - 1) // data overruns file
    intercept[IllegalArgumentException](Wav.decode(truncated))
    assert(Wav.tryDecode(truncated).isEmpty)
    assert(Wav.tryDecode("RIFFxxxxWAVE".getBytes).isEmpty)  // no chunks
    assert(Wav.tryDecode(Array[Byte](1, 2, 3)).isEmpty)
    // non-PCM format tag rejected
    val g2 = good.clone(); g2(20) = 3
    assert(Wav.tryDecode(g2).isEmpty)
  }

  // ---- BMP codec -------------------------------------------------------

  test("BMP round trip is bit-exact incl. row padding (width 3)") {
    // width 3 → row 9 bytes → 3 pad bytes per row
    val px = Array(0xff0000, 0x00ff00, 0x0000ff,
                   0x102030, 0xffffff, 0x000000)
    val img = Bmp.decode(Bmp.encode(3, 2, px))
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("BMP golden bytes: bottom-up BGR with 72-DPI header") {
    val b = Bmp.encode(1, 2, Array(0x112233, 0x445566))
    assert(b(0) == 'B' && b(1) == 'M')
    assert((b(28) & 0xff) == 24)
    // bottom row first: pixel (y=1) = 0x445566 stored B,G,R
    assert((b(54) & 0xff) == 0x66 && (b(55) & 0xff) == 0x55 &&
      (b(56) & 0xff) == 0x44)
    // second stored row = image row 0
    assert((b(58) & 0xff) == 0x33 && (b(59) & 0xff) == 0x22 &&
      (b(60) & 0xff) == 0x11)
  }

  test("BMP top-down (negative height) decodes to the same image") {
    val px = Array(0xaabbcc, 0x010203)
    val b = Bmp.encode(1, 2, px)
    // flip to top-down: height = -2, and swap the two stored rows
    val td = b.clone()
    val h = -2
    td(22) = (h & 0xff).toByte; td(23) = ((h >> 8) & 0xff).toByte
    td(24) = ((h >> 16) & 0xff).toByte; td(25) = ((h >> 24) & 0xff).toByte
    val stride = 4
    for (i <- 0 until stride) {
      td(54 + i) = b(54 + stride + i); td(54 + stride + i) = b(54 + i)
    }
    assert(Bmp.decode(td).pixels.toSeq == px.toSeq)
  }

  test("BMP corrupt inputs throw / tryDecode yields None") {
    val good = Bmp.encode(2, 2, Array(1, 2, 3, 4))
    intercept[IllegalArgumentException](
      Bmp.decode(good.slice(0, good.length - 1)))
    assert(Bmp.tryDecode(Array[Byte]('B', 'M', 0)).isEmpty)
    val comp = good.clone(); comp(30) = 1   // BI_RLE8
    assert(Bmp.tryDecode(comp).isEmpty)
    val bpp = good.clone(); bpp(28) = 32
    assert(Bmp.tryDecode(bpp).isEmpty)
  }

  // ---- dispatch + features --------------------------------------------

  test("decode dispatches by magic; golden feature vectors") {
    // audio: 4 samples [0.25, -0.25, 0.25, -0.25] at 16 kHz mono
    val q = (0.25 * 32768).toShort
    val wav = Wav.encode(Array[Short](q, (-q).toShort, q, (-q).toShort),
      16000, 1)
    val af = Multimodal.decode(wav)
    assert(af(0) == 1f && af(1) == 16f && af(2) == 4f)
    assert(math.abs(af(3)) < 1e-4f)              // mean ~ 0
    assert(math.abs(af(4) - 0.25f) < 1e-3f)      // rms = 0.25
    assert(af(7) == 3f)                          // 3 zero crossings
    // image: 2x1 pure red + pure green
    val bmp = Bmp.encode(2, 1, Array(0xff0000, 0x00ff00))
    val imf = Multimodal.decode(bmp)
    assert(imf(0) == 2f && imf(1) == 1f)
    assert(math.abs(imf(2) - 0.5f) < 1e-6f)      // meanR
    assert(math.abs(imf(3) - 0.5f) < 1e-6f)      // meanG
    assert(imf(4) == 0f)                         // meanB
    // opaque: not a container → byte-fold fallback, unchanged behavior
    val text = "hello world".getBytes("UTF-8")
    assert(Multimodal.decode(text).toSeq ==
      Multimodal.opaqueFeatures(text).toSeq)
    // starts like BMP but structurally invalid → falls back, no throw
    val fakeBm = "BMnot really a bitmap at all, just text bytes ..."
      .getBytes("UTF-8")
    assert(Multimodal.decode(fakeBm).toSeq ==
      Multimodal.opaqueFeatures(fakeBm).toSeq)
  }

  test("extractFeatures runs real codecs through the Spark path") {
    import spark.implicits._
    val wav = Wav.encode(Array[Short](1000, -1000), 8000, 1)
    val bmp = Bmp.encode(1, 1, Array(0x808080))
    val df = Seq(
      (1L, "audio", wav),
      (2L, "image", bmp),
      (3L, "video", "opaque".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val f = Multimodal.extractFeatures(df).orderBy("media_id").collect()
    assert(f(0).getSeq[Float](3) sameElements Multimodal.decode(wav))
    assert(f(1).getSeq[Float](3)(0) == 1f)       // width from real decode
    assert(f(2).getSeq[Float](3) sameElements
      Multimodal.opaqueFeatures("opaque".getBytes("UTF-8")))
    assert(f.forall(_.getInt(2) > 0))            // n_bytes carried
  }

  test("BMP nearest-neighbor resize: golden 4x4 -> 2x2 pixels") {
    // distinct pixel per cell so the mapping is unambiguous: with
    // pixel-center mapping floor((d+0.5)*4/2) the 2x2 picks sources
    // (1,1) (3,1) (1,3) (3,3)
    val px = (0 until 16).map(i => 0x010101 * (i + 1)).toArray
    val img = Bmp.Image(4, 4, px)
    val small = Bmp.resizeNearest(img, 2, 2)
    assert(small.width == 2 && small.height == 2)
    assert(small.pixels.toSeq == Seq(px(1 * 4 + 1), px(1 * 4 + 3),
      px(3 * 4 + 1), px(3 * 4 + 3)))
    // identity is a no-op; upsample replicates deterministically
    assert(Bmp.resizeNearest(img, 4, 4) eq img)
    val up = Bmp.resizeNearest(Bmp.Image(1, 1, Array(0xABCDEF)), 3, 2)
    assert(up.pixels.toSeq == Seq.fill(6)(0xABCDEF))
    // golden through the BYTES: encode -> resize -> encode is stable
    val viaBytes = Bmp.decode(Bmp.encode(4, 4, px))
    assert(Bmp.resizeNearest(viaBytes, 2, 2).pixels.toSeq ==
      small.pixels.toSeq)
  }

  test("WAV fixed-stride frame sampling: golden stereo stride 3") {
    // 7 stereo frames; stride 3 keeps frames 0, 3, 6 with BOTH channels
    val samples = (0 until 14).map(i => i.toShort).toArray // L,R pairs
    val a = Wav.Audio(48000, 2, 16, samples)
    val s = Wav.sampleEveryK(a, 3)
    assert(s.channels == 2 && s.frames == 3)
    assert(s.samples.toSeq == Seq[Short](0, 1, 6, 7, 12, 13))
    assert(s.sampleRate == 16000, "decimation scales the declared rate")
    // stride 1 is a no-op; a stride past the end keeps frame 0 only
    assert(Wav.sampleEveryK(a, 1) eq a)
    assert(Wav.sampleEveryK(a, 100).samples.toSeq == Seq[Short](0, 1))
  }

  test("resizePayloads rewrites real pixels through the Spark path") {
    import spark.implicits._
    val px = (0 until 16).map(i => 0x010101 * (i + 1)).toArray
    val bmp = Bmp.encode(4, 4, px)
    val df = Seq(
      (1L, "image", bmp, (4, 4, 0, 0)),
      (2L, "video", "not media".getBytes("UTF-8"), (0, 0, 0, 9)))
      .toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames"))
          .as("meta"))
    val out = Multimodal.resizePayloads(df, 2, 2)
      .orderBy("media_id").collect()
    // the image payload is a REAL re-encoded 2x2 BMP with the golden
    // nearest-neighbor pixels, and the metadata follows
    val dec = Bmp.decode(out(0).getAs[Array[Byte]]("payload"))
    assert(dec.width == 2 && dec.height == 2)
    assert(dec.pixels.toSeq == Seq(px(5), px(7), px(13), px(15)))
    assert(out(0).getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 2)
    // non-BMP passes through byte-identical, metadata UNTOUCHED — meta
    // follows the payload (an audio row must not acquire image dims;
    // resizeMeta is the all-rows planner stamp for callers that want it)
    assert(out(1).getAs[Array[Byte]]("payload").toSeq ==
      "not media".getBytes("UTF-8").toSeq)
    val m1 = out(1).getAs[org.apache.spark.sql.Row]("meta")
    assert(m1.getInt(0) == 0 && m1.getInt(3) == 9)
    // and the downstream decode sees the NEW dimensions
    val feats = Multimodal.extractFeatures(
      Multimodal.resizePayloads(df, 2, 2)).orderBy("media_id").collect()
    assert(feats(0).getSeq[Float](3)(0) == 2f)
    assert(feats(0).getSeq[Float](3)(1) == 2f)
  }

  test("samplePcmFrames rewrites real PCM through the Spark path") {
    import spark.implicits._
    val samples = (0 until 14).map(i => i.toShort).toArray
    val wav = Wav.encode(samples, 48000, 2)
    val df = Seq(
      (1L, "audio", wav, (0, 0, 48000, 7)),
      (2L, "video", "not media".getBytes("UTF-8"), (0, 0, 0, 9)))
      .toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames"))
          .as("meta"))
    val out = Multimodal.samplePcmFrames(df, 3)
      .orderBy("media_id").collect()
    val dec = Wav.decode(out(0).getAs[Array[Byte]]("payload"))
    assert(dec.samples.toSeq == Seq[Short](0, 1, 6, 7, 12, 13))
    assert(dec.sampleRate == 16000 && dec.channels == 2)
    val m0 = out(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(m0.getInt(2) == 16000 && m0.getInt(3) == 3,
      "meta must follow the DECODED resample, not the old values")
    // non-WAV passes through byte-identical, metadata untouched
    assert(out(1).getAs[Array[Byte]]("payload").toSeq ==
      "not media".getBytes("UTF-8").toSeq)
    assert(out(1).getAs[org.apache.spark.sql.Row]("meta").getInt(3) == 9)
  }

  test("one misaligned WAV cannot kill samplePcmFrames, even at k=1") {
    import spark.implicits._
    // a structurally valid WAV whose data chunk does NOT divide into
    // whole stereo frames (3 samples, 2 channels): decode accepts it,
    // and the k=1 shortcut used to hand the misaligned array straight
    // to encode, whose alignment require threw INSIDE the task —
    // violating the stage's never-kill-the-stage rule
    val aligned = Wav.encode(Array[Short](1, 2, 3, 4), 8000, 2)
    val misaligned = java.util.Arrays.copyOf(aligned, aligned.length - 2)
    // patch RIFF + data chunk sizes for the 2 bytes we cut
    def put32(b: Array[Byte], o: Int, v: Int): Unit = (0 until 4)
      .foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    put32(misaligned, 4, misaligned.length - 8)
    put32(misaligned, 40, 6)
    assert(Wav.tryDecode(misaligned).exists(_.samples.length == 3))
    val df = Seq((1L, "audio", misaligned, (0, 0, 8000, 1)))
      .toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames"))
          .as("meta"))
    Seq(1, 2).foreach { k =>
      val out = Multimodal.samplePcmFrames(df, k).collect()
      val dec = Wav.decode(out(0).getAs[Array[Byte]]("payload"))
      // the partial trailing frame is dropped, whole frames survive
      assert(dec.samples.toSeq == Seq[Short](1, 2), s"k=$k")
    }
    // and aligned input at k=1 stays the identity
    val a = Wav.decode(aligned)
    assert(Wav.sampleEveryK(a, 1) eq a)
  }

  test("resizePayloads rejects bad target dimensions at plan time") {
    import spark.implicits._
    val df = Seq((1L, "image", Array[Byte](1, 2)))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit(1).as("width"), lit(1).as("height"),
        lit(0).as("sample_rate"), lit(0).as("n_frames")))
    intercept[IllegalArgumentException] {
      Multimodal.resizePayloads(df, 0, 5)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizePayloads(df, 5, -1)
    }
  }

  test("codec media: image rows are real PNG/BMP/GIF/JPEG at imageDims") {
    import spark.implicits._
    import graft.multimodal.{Flac, Gif, Jpeg, Mp4, Png}
    val text = "The quick brown fox jumps over the lazy dog 0123456789"
    // doc_id % 3 == 0 -> image; sub-dispatch pmod(doc_id, 12):
    // 0 PNG, 3 BMP, 6 GIF, 9 JPEG; 12 wraps back to PNG
    val docs = Seq(0L, 3L, 6L, 9L, 12L, 1L, 2L)
      .map(id => (id, text, text.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val payloads = Multimodal.mediaFromDocumentsCodec(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
      .toMap
    val (w, h) = Multimodal.imageDims(text.length)
    assert(Png.looksLike(payloads(0L)))
    val png = Png.decode(payloads(0L))
    assert((png.width, png.height) == (w, h))
    // grayscale fold of the text bytes: pixel i cycles the source
    assert(png.pixels(0) == 0x010101 * text.charAt(0).toInt)
    assert(Bmp.looksLike(payloads(3L)))
    val bmp = Bmp.decode(payloads(3L))
    assert((bmp.width, bmp.height) == (w, h))
    assert(bmp.pixels.toSeq == png.pixels.toSeq) // same synthesis
    assert(Gif.looksLike(payloads(6L)))
    val gif = Gif.decode(payloads(6L))
    assert((gif.width, gif.height) == (w, h))
    assert(gif.pixels.toSeq == png.pixels.toSeq) // GIF is lossless here
    assert(Jpeg.looksLike(payloads(9L)))
    val jpg = Jpeg.decode(payloads(9L))
    assert((jpg.width, jpg.height) == (w, h)) // geometry survives lossy
    assert(Png.looksLike(payloads(12L)))      // dispatch wraps mod 12
    assert(Flac.looksLike(payloads(1L)))      // audio unchanged by r16
    assert(Mp4.looksLike(payloads(2L)))       // video unchanged by r16
  }

  test("codec media: degenerate text takes the fallback, never throws") {
    import spark.implicits._
    // ADVICE r15: Flac.encode requires frames > 0 and the image
    // encoders require a pixel source — one empty-text document must
    // not kill the stage. The fallback's decoded units are 0 (byte-
    // fold of zero bytes), exactly what the oracle's n_chars = 0 rows
    // compute on the image and audio kinds.
    val docs = Seq((0L, "", 0L), (1L, "", 0L), (2L, "", 0L),
        (4L, null.asInstanceOf[String], 0L))
      .toDF("doc_id", "text", "n_chars")
    val feats = Multimodal.extractFeatures(
        Multimodal.mediaFromDocumentsCodec(docs))
      .orderBy("media_id").collect()
    assert(feats.length == 4)
    assert(feats(0).getSeq[Float](3).forall(_ == 0f)) // image fallback
    assert(feats(1).getSeq[Float](3).forall(_ == 0f)) // audio fallback
    // video never reads the text: a real 1-frame MP4 (0 % 100 + 1)
    assert(feats(2).getSeq[Float](3)(4) == 1f)
    assert(feats(3).getSeq[Float](3).forall(_ == 0f)) // NULL-text audio
  }
}
