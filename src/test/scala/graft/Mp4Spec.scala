package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp4, Multimodal}

/** Hand-built golden assets for every Mp4Spec / CodecFuzzSpec probe:
  * minimal but structurally complete ISO-BMFF files whose sample
  * tables are laid out on paper, so the expected per-frame
  * (offset, size, dts) records are hand-computed, not round-tripped. */
object TestMp4 {

  def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
  }

  def full(tpe: String, version: Int, payload: Array[Byte]*): Array[Byte] =
    box(tpe, (Array[Byte](version.toByte, 0, 0, 0) +: payload): _*)

  /** One video track, 4 samples in 2 chunks:
    *  - mdat payload carries 26 recognizable bytes
    *  - stts: one run of 4 samples, delta 100 ticks
    *  - stsz: per-sample sizes [5, 7, 6, 8]
    *  - stsc: chunk 1 holds 2 samples, chunk 2 holds the rest
    *  - stco: chunk offsets computed from the assembled layout
    * The expected frames are therefore:
    *  #0 (off mdat+0,  5, dts 0),   #1 (off mdat+5,  7, dts 100),
    *  #2 (off mdat+12, 6, dts 200), #3 (off mdat+18, 8, dts 300)
    */
  def sample(stscOverride: Option[Array[Byte]] = None): (Array[Byte], Long) = {
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isommp42".getBytes)
    val mdatBody = Array.tabulate[Byte](26)(i => (i + 1).toByte)
    val mdatOff = ftyp.length + 8L // payload starts after mdat header
    val mdat = box("mdat", mdatBody)

    val tkhd = full("tkhd", 0,
      be32(0), be32(0),          // creation, modification
      be32(7),                   // track id
      be32(0), be32(4000),       // reserved, duration
      new Array[Byte](8),        // reserved
      be32(0), be32(0),          // layer/group, volume/reserved
      // identity matrix (9 x 32-bit)
      be32(0x10000), be32(0), be32(0),
      be32(0), be32(0x10000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      be32(640L << 16), be32(480L << 16)) // width, height 16.16
    val mdhd = full("mdhd", 0,
      be32(0), be32(0), be32(1000), be32(400), be32(0x55C40000L >> 16))
    val hdlr = full("hdlr", 0,
      be32(0), "vide".getBytes, new Array[Byte](12), Array[Byte](0))
    val stsd = full("stsd", 0, be32(1),
      box("avc1", new Array[Byte](8))) // format fourcc is the contract
    val stts = full("stts", 0, be32(1), be32(4), be32(100))
    val stsz = full("stsz", 0, be32(0), be32(4),
      be32(5), be32(7), be32(6), be32(8))
    val stsc = stscOverride.getOrElse(full("stsc", 0, be32(2),
      be32(1), be32(2), be32(1),   // from chunk 1: 2 samples per chunk
      be32(2), be32(2), be32(1)))  // from chunk 2: 2 samples per chunk
    val stco = full("stco", 0, be32(2),
      be32(mdatOff), be32(mdatOff + 12)) // chunk 2 after samples 0+1
    val stbl = box("stbl", stsd, stts, stsz, stsc, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val mvhd = full("mvhd", 0,
      be32(0), be32(0), be32(600), be32(1200),
      new Array[Byte](80)) // rate..matrix..next_track_id
    val moov = box("moov", mvhd, trak)
    (ftyp ++ mdat ++ moov, mdatOff)
  }
}

class Mp4Spec extends AnyFunSuite {

  test("golden: box walk demuxes samples to hand-computed (offset, size, dts)") {
    val (bytes, mdatOff) = TestMp4.sample()
    val m = Mp4.parse(bytes)
    assert(m.brand == "isom")
    assert(m.timescale == 600 && m.duration == 1200)
    assert(m.durationSeconds == 2.0)
    assert(m.tracks.size == 1)
    val t = m.tracks.head
    assert(t.id == 7 && t.handler == "vide" && t.codec == "avc1")
    assert(t.timescale == 1000 && t.duration == 400)
    assert(t.width == 640 && t.height == 480)
    assert(t.frames.map(f => (f.offset - mdatOff, f.size, f.dts)) ==
      IndexedSeq((0L, 5L, 0L), (5L, 7L, 100L), (12L, 6L, 200L),
        (18L, 8L, 300L)))
    // the byte ranges really address the mdat payload laid down above
    val f2 = t.frames(2)
    assert(bytes.slice(f2.offset.toInt, (f2.offset + f2.size).toInt).toSeq ==
      Seq[Byte](13, 14, 15, 16, 17, 18))
  }

  test("uniform stsz and co64 offsets resolve identically") {
    import TestMp4._
    val ftyp = box("ftyp", "mp42".getBytes, be32(0))
    val mdatBody = Array.fill[Byte](12)(9)
    val mdatOff = ftyp.length + 8L
    val mdat = box("mdat", mdatBody)
    val mdhd = full("mdhd", 0, be32(0), be32(0), be32(90000), be32(0),
      be32(0))
    val hdlr = full("hdlr", 0, be32(0), "soun".getBytes,
      new Array[Byte](12), Array[Byte](0))
    val stbl = box("stbl",
      full("stsd", 0, be32(1), box("mp4a", new Array[Byte](8))),
      full("stts", 0, be32(1), be32(3), be32(1024)),
      full("stsz", 0, be32(4), be32(3)), // uniform size 4
      full("stsc", 0, be32(1), be32(1), be32(3), be32(1)),
      box("co64", Array[Byte](0, 0, 0, 0), be32(1),
        be32(0) ++ be32(mdatOff))) // one 64-bit offset
    val trak = box("trak",
      full("tkhd", 0, new Array[Byte](80)),
      box("mdia", mdhd, hdlr, box("minf", stbl)))
    val moov = box("moov",
      full("mvhd", 0, be32(0), be32(0), be32(600), be32(600),
        new Array[Byte](80)), trak)
    val m = Mp4.parse(ftyp ++ mdat ++ moov)
    val t = m.tracks.head
    assert(t.handler == "soun" && t.codec == "mp4a")
    assert(t.frames.map(f => (f.offset - mdatOff, f.size, f.dts)) ==
      IndexedSeq((0L, 4L, 0L), (4L, 4L, 1024L), (8L, 4L, 2048L)))
  }

  test("structural corruption fails loudly; tryParse absorbs it") {
    val (bytes, _) = TestMp4.sample()
    assert(Mp4.parse(bytes).tracks.nonEmpty) // sanity
    // a sample byte range outside the file must be refused
    val (short, _) = TestMp4.sample()
    val truncated = short.take(short.length - 40) // cuts into moov
    assert(Mp4.tryParse(truncated).isEmpty)
    // a box whose declared size overruns its container
    val bad = bytes.clone()
    bad(0) = 0x7f // ftyp size becomes enormous
    assert(Mp4.tryParse(bad).isEmpty)
    // no moov / no tracks
    val noMoov = TestMp4.box("ftyp", "isom".getBytes, TestMp4.be32(0))
    assert(Mp4.tryParse(noMoov).isEmpty)
    assert(Mp4.tryParse(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("hostile sample counts are capped before allocation") {
    import TestMp4._
    val ftyp = box("ftyp", "isom".getBytes, be32(0))
    val stbl = box("stbl",
      full("stsz", 0, be32(0), be32(0x40000000L))) // a billion samples
    val trak = box("trak", box("mdia", box("minf", stbl)))
    val moov = box("moov", trak)
    val e = intercept[IllegalArgumentException](Mp4.parse(ftyp ++ moov))
    assert(e.getMessage.contains("declares"))
  }

  test("encode round-trips through parse: frames, sizes, dts, geometry") {
    val bytes = Mp4.encode(100, frameSize = 3)
    val m = Mp4.parse(bytes)
    assert(m.brand == "isom")
    assert(m.timescale == 1000 && m.duration == 100)
    assert(m.tracks.size == 1)
    val t = m.tracks.head
    assert(t.id == 1 && t.handler == "vide" && t.codec == "raw ")
    assert(t.width == 64 && t.height == 64)
    assert(t.timescale == 1000 && t.duration == 100)
    assert(t.frames.size == 100)
    assert(t.frames.zipWithIndex.forall { case (f, i) =>
      f.index == i && f.size == 3 && f.dts == i })
    // frames tile the mdat payload contiguously and address real bytes
    assert(t.frames.head.offset == t.frames(1).offset - 3)
    val f0 = t.frames.head
    assert(bytes.slice(f0.offset.toInt, f0.offset.toInt + 3).toSeq ==
      Seq[Byte](0, 1, 2))
    // containerFeatures sees the demuxed totals
    val feats = Mp4.containerFeatures(m)
    assert(feats(4) == 100f && feats(5) == 3f && feats(6) == 64f)
    // deterministic bytes
    assert(Mp4.encode(100, frameSize = 3).toSeq == bytes.toSeq)
    // hostile sizes fail BEFORE allocation: nFrames * frameSize would
    // wrap Int and request a negative mdat
    val e = intercept[IllegalArgumentException](
      Mp4.encode(1 << 22, frameSize = 1 << 20))
    assert(e.getMessage.contains("budget"))
  }

  test("table header fields are bounded by their OWN box, not the file") {
    import TestMp4._
    def movieWith(tables: Array[Byte]*): Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes, be32(0))
      val trak = box("trak", box("mdia",
        box("minf", box("stbl", tables: _*))))
      ftyp ++ box("moov", trak)
    }
    // stsz whose declared size ends before its uniform/count header:
    // previously read the NEXT SIBLING's bytes as the count (r14 ADVICE)
    val sibling = full("stco", 0, be32(0))
    val e1 = intercept[IllegalArgumentException](
      Mp4.parse(movieWith(full("stsz", 0), sibling)))
    assert(e1.getMessage.contains("stsz"))
    // stsd whose declared size ends before its entry count
    val e2 = intercept[IllegalArgumentException](
      Mp4.parse(movieWith(full("stsd", 0), sibling)))
    assert(e2.getMessage.contains("stsd"))
    // a full-box whose declared size ends before its own version field
    val e3 = intercept[IllegalArgumentException](
      Mp4.parse(movieWith(box("stts", Array[Byte](0, 0)), sibling)))
    assert(e3.getMessage.contains("full-box"))
  }

  test("malformed stsc fails loudly: first_chunk != 1, non-increasing") {
    import TestMp4._
    // first entry claims chunk 2: early chunks would silently take
    // entry 0's samples-per-chunk (r14 ADVICE) — must fail instead
    val bad1 = sample(Some(full("stsc", 0, be32(2),
      be32(2), be32(2), be32(1),
      be32(3), be32(2), be32(1))))._1
    val e1 = intercept[IllegalArgumentException](Mp4.parse(bad1))
    assert(e1.getMessage.contains("not 1"))
    // non-increasing first_chunk values
    val bad2 = sample(Some(full("stsc", 0, be32(2),
      be32(1), be32(2), be32(1),
      be32(1), be32(2), be32(1))))._1
    val e2 = intercept[IllegalArgumentException](Mp4.parse(bad2))
    assert(e2.getMessage.contains("increasing"))
  }

  test("looksLike sniffs ftyp at offset 4 only") {
    val (bytes, _) = TestMp4.sample()
    assert(Mp4.looksLike(bytes))
    assert(!Mp4.looksLike("ftypisom".getBytes)) // wrong offset
    assert(!Mp4.looksLike(Array[Byte](1, 2, 3)))
  }

  test("Multimodal.decode featurizes the container without decoding frames") {
    val (bytes, _) = TestMp4.sample()
    val feats = Multimodal.decode(bytes)
    // [n_tracks, duration_s, n_video, n_audio, total_frames,
    //  mean_frame_bytes, width, height]
    assert(feats.toSeq == Seq[Float](1f, 2f, 1f, 0f, 4f, 6.5f, 640f, 480f))
    // corrupt container falls back to the opaque fold, never throws
    val bad = bytes.clone()
    bad(bytes.length - 10) = 0x7f
    val fb = Multimodal.decode(bad)
    assert(fb.length == 8)
  }
}
