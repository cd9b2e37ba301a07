package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distinct counting as a mergeable BITMAP aggregate.
  *
  * COUNT(DISTINCT key) is the one aggregate Catalyst cannot run as a
  * plain partial+final combine: it plans an Expand + two-stage
  * aggregation whose shuffle carries every distinct VALUE. For a
  * bounded integer key domain (user ids, fact surrogate keys — the
  * common case in a warehouse) the classic engine answer (ClickHouse
  * groupBitmap, Druid/Iceberg bitmap indexes) is a bitmap per group:
  * set bit `key`, OR bitmaps on merge, popcount at the end. The
  * partial state is ceil(domain/8) bytes REGARDLESS of row count, the
  * shuffle carries one bitmap per group instead of one row per
  * distinct value, and — unlike HLL (q_agg_approx_hll) — the count is
  * EXACT, so this query is oracle-checked against COUNT(DISTINCT)
  * itself, not a ScalaTest error gate.
  *
  * The same buffer serves two aggregation levels: `bitmapOf` builds a
  * bitmap from raw keys; `bitmapMerge` ORs already-built bitmaps — the
  * REAGGREGATION path (per-partition/per-day bitmaps rolled up to
  * global without touching raw data) that makes bitmap columns a
  * storable distinct-count index. Both are associative/commutative and
  * value-deterministic (the bitmap is a pure function of the key SET).
  *
  * Bounds: words grow lazily to the highest key seen; require() caps
  * the domain at 2^26 (8 MiB worst-case per group) — beyond that,
  * switch to HLL or hash-partition the domain. Negative keys are
  * rejected loudly (a bitmap index needs a dense non-negative domain;
  * remap surrogate keys first — q_etl_surrogate_keys is that op).
  */
object BitmapDistinct {

  /** Growable little-endian word bitmap. Serializable state = words. */
  final class Bitmap extends Serializable {
    var words: Array[Long] = new Array[Long](4)

    private def ensure(wi: Int): Unit = {
      if (wi >= words.length) {
        var n = words.length
        while (n <= wi) n *= 2
        val w = new Array[Long](n)
        System.arraycopy(words, 0, w, 0, words.length)
        words = w
      }
    }

    def set(key: Long): Unit = {
      require(key >= 0 && key < (1L << 26),
        s"bitmapDistinct: key $key outside dense domain [0, 2^26) — " +
          "remap through a surrogate key or use approx HLL")
      val wi = (key >> 6).toInt
      ensure(wi)
      words(wi) |= 1L << (key & 63)
    }

    def or(o: Array[Long]): Unit = {
      // the same 2^26 domain cap set() enforces, applied to MERGED
      // state: the reaggregation path accepts arbitrary BINARY (a
      // corrupt value, or a non-bitmap sketch column picked by
      // mistake), and without this guard a 512 MiB garbage value
      // would balloon the per-group buffer toward OOM and then count
      // out-of-domain bits into a plausible-but-wrong answer
      require(o.length <= (1 << 20),
        s"bitmapDistinct: merged bitmap spans ${o.length} words — " +
          "beyond the 2^26-key dense domain; the binary input is not " +
          "a bitmapOf() product")
      ensure(math.max(o.length - 1, 0))
      var i = 0
      while (i < o.length) { words(i) |= o(i); i += 1 }
    }

    def cardinality: Long = {
      var c = 0L; var i = 0
      while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      c
    }

    /** Canonical bytes: words truncated to the highest set word, so
      * equal SETS give byte-equal payloads whatever the growth path. */
    def toBytes: Array[Byte] = {
      var hi = words.length - 1
      while (hi >= 0 && words(hi) == 0L) hi -= 1
      val bb = java.nio.ByteBuffer.allocate((hi + 1) * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i <= hi) { bb.putLong(words(i)); i += 1 }
      bb.array()
    }
  }

  private def fromBytes(b: Array[Byte]): Array[Long] = {
    // a bitmap is always whole 8-byte words; a trailing fragment means
    // a truncated/corrupt value, and silently dropping it would merge
    // into a plausible-but-wrong distinct count (r14 review)
    require(b.length % 8 == 0,
      s"bitmap payload of ${b.length} bytes is not whole 8-byte words " +
        "— truncated or not produced by bitmapOf()")
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](b.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  // boxed input + null skip: COUNT(DISTINCT) ignores NULL keys, and a
  // stored bitmap column can legitimately be NULL through an outer
  // join — a primitive-Long encoder would instead fail the whole task
  // in the deserializer (the null-guard rule CountMin cites from
  // ADVICE r4, applied to both aggregation levels here)
  val buildAgg: Aggregator[java.lang.Long, Bitmap, Array[Byte]] =
    new Aggregator[java.lang.Long, Bitmap, Array[Byte]] {
      override def zero: Bitmap = new Bitmap
      override def reduce(b: Bitmap, key: java.lang.Long): Bitmap = {
        if (key != null) b.set(key.longValue())
        b
      }
      override def merge(a: Bitmap, b: Bitmap): Bitmap = {
        a.or(b.words); a
      }
      override def finish(b: Bitmap): Array[Byte] = b.toBytes
      override def bufferEncoder: Encoder[Bitmap] =
        Encoders.javaSerialization[Bitmap]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  val mergeAgg: Aggregator[Array[Byte], Bitmap, Long] =
    new Aggregator[Array[Byte], Bitmap, Long] {
      override def zero: Bitmap = new Bitmap
      override def reduce(b: Bitmap, bytes: Array[Byte]): Bitmap = {
        if (bytes != null) b.or(fromBytes(bytes))
        b
      }
      override def merge(a: Bitmap, b: Bitmap): Bitmap = {
        a.or(b.words); a
      }
      override def finish(b: Bitmap): Long = b.cardinality
      override def bufferEncoder: Encoder[Bitmap] =
        Encoders.javaSerialization[Bitmap]
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** bitmapOf(key): BINARY — bitmap of the group's distinct keys. */
  def bitmapOf(key: Column): Column =
    udaf(buildAgg, Encoders.LONG).apply(key)

  /** bitmapCardinality(bitmap): BIGINT — distinct count of the UNION
    * of already-built bitmaps (the reaggregation path). */
  def bitmapCardinality(bitmap: Column): Column =
    udaf(mergeAgg, ExpressionEncoder[Array[Byte]]()).apply(bitmap)
}
