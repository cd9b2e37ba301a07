package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** From-scratch ISO-BMFF (MP4) box walk — codec-agnostic DEMUX to
  * typed frame metadata, the container half of the video story (the
  * per-frame pixel decode behind it would be a further codec pair;
  * the container walk is what a training pipeline needs to SAMPLE
  * frames, size shards, and route payloads without decoding them).
  * Implemented from the published ISO base-media file format layout
  * (ISO/IEC 14496-12): length-prefixed box tree, full-box
  * version/flags, and the sample tables — stts (decode timing), stsz
  * (sample sizes), stsc (sample-to-chunk), stco/co64 (chunk offsets)
  * — joined into per-frame (offset, size, dts) records exactly the
  * way a demuxer resolves a sample's byte range.
  *
  * Everything is bounds-checked against the payload; per-track sample
  * counts are capped (the image codecs' hostile-header posture) and
  * box recursion is depth-limited. Parse errors throw
  * [[IllegalArgumentException]]; [[tryParse]] maps them to `None`.
  */
object Mp4 {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MP4 parse: $msg")

  /** per-track demuxed-sample budget (a 16-byte stsz must not declare
    * a billion samples and provoke a giant allocation) */
  private val MaxSamples = 1 << 22
  private val MaxDepth = 8

  /** one demuxed sample: byte range within the file + decode time in
    * the track's timescale ticks */
  final case class Frame(index: Int, offset: Long, size: Long, dts: Long)

  final case class Track(id: Long, handler: String, codec: String,
      timescale: Long, duration: Long, width: Int, height: Int,
      frames: IndexedSeq[Frame])

  final case class Movie(brand: String, timescale: Long, duration: Long,
      tracks: IndexedSeq[Track]) {
    def durationSeconds: Double =
      if (timescale == 0) 0.0 else duration.toDouble / timescale
  }

  def looksLike(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], o: Int): Long = {
    if (o + 4 > b.length) fail(s"u32 read past end at $o")
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private def u64(b: Array[Byte], o: Int): Long = {
    if (o + 8 > b.length) fail(s"u64 read past end at $o")
    (u32(b, o) << 32) | u32(b, o + 4)
  }

  private def fourcc(b: Array[Byte], o: Int): String = {
    if (o + 4 > b.length) fail(s"fourcc read past end at $o")
    new String(b, o, 4, "US-ASCII")
  }

  /** (type, payloadStart, payloadEnd, nextBox) for the box at `off` */
  private def boxAt(b: Array[Byte], off: Int,
      limit: Int): (String, Int, Int, Int) = {
    if (off + 8 > limit) fail(s"truncated box header at $off")
    val size32 = u32(b, off)
    val tpe = fourcc(b, off + 4)
    var payload = off + 8
    val size: Long =
      if (size32 == 1) { val s = u64(b, off + 8); payload += 8; s }
      else if (size32 == 0) (limit - off).toLong // box extends to limit
      else size32
    if (size < (payload - off).toLong)
      fail(s"box '$tpe' size $size smaller than its header")
    val end = off.toLong + size
    if (end > limit) fail(s"box '$tpe' overruns its container " +
      s"($size bytes at $off, limit $limit)")
    (tpe, payload, end.toInt, end.toInt)
  }

  /** full-box: returns (version, payloadStartAfterVersionFlags).
    * Bounded by the ENCLOSING box `end`, not the file: a box whose
    * declared size stops before its own version/flags field must fail
    * loudly, never read sibling-box bytes (r14 ADVICE). */
  private def fullBox(b: Array[Byte], payload: Int, end: Int): (Int, Int) = {
    if (payload + 4 > end) fail("truncated full-box header")
    if (payload + 4 > b.length) fail("truncated full-box header")
    ((b(payload) & 0xff), payload + 4)
  }

  // sample-table accumulators for the track being parsed
  private final class Stbl {
    var codec: String = ""
    var sttsRuns: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty
    var uniformSize: Long = -1
    var sizes: Array[Long] = null
    var sampleCount: Int = -1
    var stsc: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty // (firstChunk, perChunk)
    var chunkOffsets: Array[Long] = null
  }

  private def parseStbl(b: Array[Byte], from: Int, until: Int,
      st: Stbl, depth: Int): Unit = {
    var off = from
    while (off < until) {
      val (tpe, payload, end, next) = boxAt(b, off, until)
      // every table read below is bounded by ITS OWN box `end`, not
      // the file: a truncated table must fail loudly, never silently
      // consume sibling-box bytes as entries (r14 review finding)
      def need(from: Int, bytesNeeded: Long, what: String): Unit =
        if (from.toLong + bytesNeeded > end)
          fail(s"$what needs $bytesNeeded bytes, box '$tpe' ends at $end")
      tpe match {
        case "stsd" =>
          val (_, p) = fullBox(b, payload, end)
          need(p, 4, "stsd entry count")
          val entries = u32(b, p)
          if (entries >= 1) {
            // first sample entry: 32-bit size + fourcc format
            if (p + 12 <= end) st.codec = fourcc(b, p + 8)
          }
        case "stts" =>
          val (_, p) = fullBox(b, payload, end)
          need(p, 4, "stts run count")
          val n = u32(b, p)
          if (n > MaxSamples) fail(s"stts declares $n runs")
          need(p + 4, n * 8, s"$n stts runs")
          var i = 0
          var o = p + 4
          while (i < n) {
            st.sttsRuns += ((u32(b, o), u32(b, o + 4)))
            o += 8; i += 1
          }
        case "stsz" =>
          val (_, p) = fullBox(b, payload, end)
          need(p, 8, "stsz uniform-size and sample-count header")
          val uniform = u32(b, p)
          val count = u32(b, p + 4)
          if (count > MaxSamples) fail(s"stsz declares $count samples")
          st.sampleCount = count.toInt
          if (uniform != 0) st.uniformSize = uniform
          else {
            need(p + 8, count * 4, s"$count stsz sizes")
            st.sizes = new Array[Long](count.toInt)
            var i = 0
            var o = p + 8
            while (i < count) { st.sizes(i) = u32(b, o); o += 4; i += 1 }
          }
        case "stsc" =>
          val (_, p) = fullBox(b, payload, end)
          need(p, 4, "stsc entry count")
          val n = u32(b, p)
          if (n > MaxSamples) fail(s"stsc declares $n entries")
          need(p + 4, n * 12, s"$n stsc entries")
          var i = 0
          var o = p + 4
          while (i < n) {
            // (first_chunk, samples_per_chunk); description index unused
            st.stsc += ((u32(b, o), u32(b, o + 4)))
            o += 12; i += 1
          }
        case "stco" | "co64" =>
          val (_, p) = fullBox(b, payload, end)
          need(p, 4, s"$tpe chunk count")
          val n = u32(b, p)
          if (n > MaxSamples) fail(s"$tpe declares $n chunks")
          val width = if (tpe == "stco") 4 else 8
          need(p + 4, n * width, s"$n $tpe offsets")
          st.chunkOffsets = new Array[Long](n.toInt)
          var i = 0
          var o = p + 4
          while (i < n) {
            st.chunkOffsets(i) = if (tpe == "stco") u32(b, o) else u64(b, o)
            o += width
            i += 1
          }
        case _ => () // ctts, stss, sgpd, ... — not needed for demux
      }
      off = next
    }
  }

  /** resolve the three sample tables into per-frame byte ranges +
    * decode timestamps — the demux join */
  private def resolveFrames(b: Array[Byte], st: Stbl): IndexedSeq[Frame] = {
    val count = math.max(st.sampleCount, 0)
    if (count == 0 || st.chunkOffsets == null || st.stsc.isEmpty)
      return IndexedSeq.empty
    // a malformed stsc whose first run does not start at chunk 1, or
    // whose first_chunk values are not strictly increasing, would be
    // silently mis-attributed to the wrong run below — fail loudly
    // like every other structural-corruption path (r14 ADVICE)
    if (st.stsc.head._1 != 1L)
      fail(s"stsc first entry covers chunk ${st.stsc.head._1}, not 1")
    locally {
      var k = 1
      while (k < st.stsc.length) {
        if (st.stsc(k)._1 <= st.stsc(k - 1)._1)
          fail(s"stsc first_chunk not strictly increasing at entry $k " +
            s"(${st.stsc(k - 1)._1} then ${st.stsc(k)._1})")
        k += 1
      }
    }
    def sizeOf(i: Int): Long =
      if (st.uniformSize >= 0) st.uniformSize
      else if (st.sizes != null && i < st.sizes.length) st.sizes(i)
      else fail(s"no size for sample $i")
    // dts from stts runs
    val dts = new Array[Long](count)
    locally {
      var t = 0L
      var i = 0
      st.sttsRuns.foreach { case (n, delta) =>
        var j = 0L
        while (j < n && i < count) { dts(i) = t; t += delta; i += 1; j += 1 }
      }
      while (i < count) { dts(i) = t; i += 1 } // stts shorter than stsz
    }
    // stsc: expand (firstChunk, perChunk) runs across the chunk list
    val frames = new ArrayBuffer[Frame](count)
    val nChunks = st.chunkOffsets.length
    var sample = 0
    var run = 0
    var chunk = 1 // 1-based per spec
    while (chunk <= nChunks && sample < count) {
      while (run + 1 < st.stsc.length && st.stsc(run + 1)._1 <= chunk)
        run += 1
      val perChunk = st.stsc(run)._2
      var off = st.chunkOffsets(chunk - 1)
      var j = 0L
      while (j < perChunk && sample < count) {
        val sz = sizeOf(sample)
        // overflow-proof: off + sz can wrap for a hostile co64 offset
        // near Long.MaxValue, so compare against the remaining length
        if (off < 0 || sz < 0 || off > b.length || sz > b.length - off)
          fail(s"sample $sample byte range [$off, +$sz) outside " +
            s"the ${b.length}-byte file")
        frames += Frame(sample, off, sz, dts(sample))
        off += sz
        sample += 1
        j += 1
      }
      chunk += 1
    }
    if (sample < count)
      fail(s"chunk list exhausted at sample $sample of $count")
    frames.toIndexedSeq
  }

  private def parseTrak(b: Array[Byte], from: Int, until: Int,
      depth: Int): Track = {
    var id = 0L
    var handler = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    val st = new Stbl

    def walk(f: Int, u: Int, d: Int): Unit = {
      if (d > MaxDepth) fail("box nesting too deep")
      var off = f
      while (off < u) {
        val (tpe, payload, end, next) = boxAt(b, off, u)
        def need(from: Int, n: Int): Unit =
          if (from + n > end)
            fail(s"box '$tpe' too short for its declared version")
        tpe match {
          case "tkhd" =>
            val (v, p) = fullBox(b, payload, end)
            // v0: creation(4) mod(4) id(4); v1: 8+8 then id
            id = if (v == 1) { need(p + 16, 4); u32(b, p + 16) }
                 else { need(p + 8, 4); u32(b, p + 8) }
            // width/height: 16.16 fixed point at the end of the box
            if (end - 8 >= p) {
              width = (u32(b, end - 8) >> 16).toInt
              height = (u32(b, end - 4) >> 16).toInt
            }
          case "mdhd" =>
            val (v, p) = fullBox(b, payload, end)
            if (v == 1) {
              need(p + 16, 12)
              timescale = u32(b, p + 16)
              duration = u64(b, p + 20)
            } else {
              need(p + 8, 8)
              timescale = u32(b, p + 8)
              duration = u32(b, p + 12)
            }
          case "hdlr" =>
            val (_, p) = fullBox(b, payload, end)
            need(p + 4, 4)
            handler = fourcc(b, p + 4) // after pre_defined
          case "mdia" | "minf" => walk(payload, end, d + 1)
          case "stbl" => parseStbl(b, payload, end, st, d + 1)
          case _ => ()
        }
        off = next
      }
    }
    walk(from, until, depth)
    Track(id, handler, st.codec, timescale, duration, width, height,
      resolveFrames(b, st))
  }

  /** Walk the whole file: ftyp brand + moov(mvhd, trak*). */
  def parse(bytes: Array[Byte]): Movie = {
    if (!looksLike(bytes)) fail("no ftyp box at offset 4")
    var brand = ""
    var timescale = 0L
    var duration = 0L
    val tracks = ArrayBuffer.empty[Track]
    var off = 0
    while (off < bytes.length) {
      val (tpe, payload, end, next) = boxAt(bytes, off, bytes.length)
      tpe match {
        case "ftyp" =>
          brand = fourcc(bytes, payload)
        case "moov" =>
          var o2 = payload
          while (o2 < end) {
            val (t2, p2, e2, n2) = boxAt(bytes, o2, end)
            t2 match {
              case "mvhd" =>
                val (v, p) = fullBox(bytes, p2, e2)
                if (v == 1) {
                  if (p + 28 > e2) fail("mvhd v1 too short")
                  timescale = u32(bytes, p + 16)
                  duration = u64(bytes, p + 20)
                } else {
                  if (p + 16 > e2) fail("mvhd v0 too short")
                  timescale = u32(bytes, p + 8)
                  duration = u32(bytes, p + 12)
                }
              case "trak" => tracks += parseTrak(bytes, p2, e2, 1)
              case _ => ()
            }
            o2 = n2
          }
        case _ => () // mdat, free, ...
      }
      off = next
    }
    if (brand.isEmpty) fail("no ftyp box")
    if (tracks.isEmpty) fail("no trak boxes in moov")
    Movie(brand, timescale, duration, tracks.toIndexedSeq)
  }

  def tryParse(bytes: Array[Byte]): Option[Movie] =
    try Some(parse(bytes)) catch {
      case _: IllegalArgumentException => None
    }

  // ---- encode ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def boxBytes(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val n = 8L + payloads.map(_.length.toLong).sum
    require(n <= Int.MaxValue, s"box '$tpe' too large")
    be32(n) ++ tpe.getBytes("US-ASCII") ++ payloads.toArray.flatten
  }

  /** Minimal conformant ISO-BMFF writer — the container-level inverse
    * of [[parse]]: one 'vide' track of `nFrames` uniform
    * `frameSize`-byte samples in a single chunk (stsz uniform form,
    * one stts run of 1-tick deltas, one stsc entry, one stco offset),
    * layout ftyp + mdat + moov. Every byte derives from the published
    * ISO/IEC 14496-12 field layout — no codec payload is implied (the
    * sample entry format is 'raw '); this exists so the demux walk's
    * integer outputs can be driven from deterministic synthetic assets
    * (the graded q_multimodal_pipeline fixture). Round-trip contract:
    * `parse(encode(n, sz)).tracks.head.frames.size == n`, each frame
    * `sz` bytes at the right mdat offset (Mp4Spec). */
  def encode(nFrames: Int, frameSize: Int = 1, width: Int = 64,
      height: Int = 64, timescale: Long = 1000L): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= MaxSamples,
      s"nFrames $nFrames outside [1, $MaxSamples]")
    require(frameSize >= 1, s"frameSize $frameSize < 1")
    // Long math BEFORE the allocation: nFrames * frameSize can wrap
    // Int and request a negative (or tiny, silently-wrong) mdat
    require(nFrames.toLong * frameSize <= MaxSamples.toLong,
      s"mdat payload ${nFrames.toLong * frameSize} bytes exceeds the " +
        s"$MaxSamples-byte encode budget")
    val verFlags = new Array[Byte](4)
    val duration = nFrames.toLong // 1 tick per frame
    val ftyp = boxBytes("ftyp",
      "isom".getBytes("US-ASCII"), be32(0), "isom".getBytes("US-ASCII"))
    // mdat directly after ftyp so the chunk offset is known up front
    val mdatPayload = new Array[Byte](nFrames * frameSize)
    locally {
      var i = 0
      while (i < mdatPayload.length) {
        mdatPayload(i) = (i % 251).toByte; i += 1
      }
    }
    val mdat = boxBytes("mdat", mdatPayload)
    val chunkOffset = ftyp.length.toLong + 8L
    val mvhd = boxBytes("mvhd", verFlags,
      be32(0), be32(0),                       // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000L), Array[Byte](1, 0),   // rate 1.0, volume 1.0
      new Array[Byte](2 + 8),                 // reserved
      // unity matrix per §8.2.2.3
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](4 * 6),                 // pre_defined
      be32(2))                                // next_track_ID
    val tkhd = boxBytes("tkhd", Array[Byte](0, 0, 0, 7), // enabled|in-movie
      be32(0), be32(0),                       // creation, modification
      be32(1), be32(0), be32(duration),       // track_ID, reserved, duration
      new Array[Byte](8),                     // reserved
      new Array[Byte](2 + 2 + 2 + 2),         // layer, alt_group, volume, res
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mdhd = boxBytes("mdhd", verFlags,
      be32(0), be32(0), be32(timescale), be32(duration),
      Array[Byte](0x55.toByte, 0xc4.toByte),  // language 'und'
      new Array[Byte](2))                     // pre_defined
    val hdlr = boxBytes("hdlr", verFlags,
      be32(0), "vide".getBytes("US-ASCII"),
      new Array[Byte](12), Array[Byte](0))    // reserved, empty name
    val stsd = boxBytes("stsd", verFlags, be32(1),
      // one 16-byte sample entry: size, format, reserved(6), dri(2)
      be32(16), "raw ".getBytes("US-ASCII"),
      new Array[Byte](6), Array[Byte](0, 1))
    val stts = boxBytes("stts", verFlags, be32(1),
      be32(nFrames.toLong), be32(1))
    val stsz = boxBytes("stsz", verFlags,
      be32(frameSize.toLong), be32(nFrames.toLong))
    val stsc = boxBytes("stsc", verFlags, be32(1),
      be32(1), be32(nFrames.toLong), be32(1))
    val stco = boxBytes("stco", verFlags, be32(1), be32(chunkOffset))
    val stbl = boxBytes("stbl", stsd, stts, stsc, stsz, stco)
    val minf = boxBytes("minf", stbl)
    val mdia = boxBytes("mdia", mdhd, hdlr, minf)
    val trak = boxBytes("trak", tkhd, mdia)
    val moov = boxBytes("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** 8-dim container feature vector: [n_tracks, duration_s, n_video,
    * n_audio, total_frames, mean_frame_bytes, width, height] — the
    * metadata-level featurization routing/sharding needs without
    * decoding a single frame. */
  def containerFeatures(m: Movie): Array[Float] = {
    val nFrames = m.tracks.map(_.frames.size.toLong).sum
    val bytesTotal = m.tracks.map(_.frames.map(_.size).sum).sum
    val v = m.tracks.find(_.handler == "vide")
    Array(
      m.tracks.size.toFloat,
      m.durationSeconds.toFloat,
      m.tracks.count(_.handler == "vide").toFloat,
      m.tracks.count(_.handler == "soun").toFloat,
      nFrames.toFloat,
      if (nFrames == 0) 0f else (bytesTotal.toDouble / nFrames).toFloat,
      v.map(_.width).getOrElse(0).toFloat,
      v.map(_.height).getOrElse(0).toFloat)
  }
}
